"""Classic ML parity: NMF vs reference C, Viterbi vs reference C, HMM
self-consistency (train raises likelihood; decode matches viterbi)."""

import numpy as np
import pytest

from audioflux_tpu.classic import HMM, NMF, nmf, viterbi


def test_nmf_kl(goldens):
    g = goldens("classic")
    W, H = nmf(g["V"], 4, w_arr=g["W0"], h_arr=g["H0"], max_iter=100,
               tp=0, thresh=1e-4, norm=0)
    W, H = np.asarray(W), np.asarray(H)
    # multiplicative updates compound float32 differences; compare the
    # reconstruction quality and factor closeness
    np.testing.assert_allclose(W, g["W"], atol=2e-2)
    np.testing.assert_allclose(H, g["H"], atol=2e-1)
    rec_ours = np.abs(g["V"] - W @ H).mean()
    rec_ref = np.abs(g["V"] - g["W"] @ g["H"]).mean()
    assert rec_ours <= rec_ref * 1.05


@pytest.mark.parametrize("tp", [1, 2])
def test_nmf_types_reduce_error(goldens, tp):
    g = goldens("classic")
    V = g["V"]
    W, H = nmf(V, 4, w_arr=g["W0"], h_arr=g["H0"], max_iter=150, tp=tp,
               thresh=1e-5, norm=0)
    before = np.abs(V - g["W0"] @ g["H0"]).mean()
    after = np.abs(V - np.asarray(W) @ np.asarray(H)).mean()
    assert after < before


def test_viterbi(goldens):
    g = goldens("classic")
    s, p, probs = viterbi(g["pi"], g["A"], g["B"], g["o"])
    np.testing.assert_array_equal(np.asarray(s), g["vit_s"])
    np.testing.assert_allclose(float(p), g["vit_prob"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), g["vit_m"], rtol=1e-5)


def test_viterbi_log(goldens):
    g = goldens("classic")
    s, p, _ = viterbi(g["pi"], g["A"], g["B"], g["o"], is_log=True)
    np.testing.assert_array_equal(np.asarray(s), g["vit_s"])


def test_hmm_train_and_decode(goldens):
    g = goldens("classic")
    h = HMM(3, 3, seed=1)
    h.init(g["pi"], g["A"], g["B"])
    o = np.array([0, 0, 1, 2, 2, 2, 1, 0, 0, 1, 2, 2], np.int64)
    before = h.predict(o)
    h.train(o, max_iter=30)
    after = h.predict(o)
    assert after >= before
    s, p = h.decode(o)
    assert s.shape == o.shape and p > 0


def test_hmm_generate():
    h = HMM(3, 4, seed=2)
    obs, states = h.generate(20, seed=3)
    assert obs.shape == (20,) and states.shape == (20,)
    assert obs.max() < 4 and states.max() < 3


# ---------------------------------------------------------------------------
# HMM golden parity vs the C (src/classic/hmm.c, driven via ctypes in
# gen_goldens: single-iteration Baum-Welch trajectory with error=0, forward
# likelihood after each step, and Viterbi decode of the TRAINED model —
# hmmObj_init swaps the caller's buffers in, so the C trains in place)
# ---------------------------------------------------------------------------

def _hmm_from_goldens(g):
    h = HMM(3, 3, seed=0)
    h.init(g["hmm_pi0"], g["hmm_A0"], g["hmm_B0"])
    return h, np.asarray(g["hmm_o"], np.int64)


def test_hmm_predict_golden(goldens):
    g = goldens("classic")
    h, o = _hmm_from_goldens(g)
    np.testing.assert_allclose(h.predict(o), g["hmm_p0"], rtol=1e-5)


def test_hmm_train_trajectory_golden(goldens):
    """Per-iteration Baum-Welch parity: 10 single-step trains match the
    C's (pi, A, B) trajectory and forward likelihood (hmm.c:182-345).
    Measured drift over 10 float32 iterations is <= 2.4e-7 on the
    matrices; the bound below is 20x that."""
    g = goldens("classic")
    h, o = _hmm_from_goldens(g)
    for i in range(g["hmm_traj_A"].shape[0]):
        h.train(o, max_iter=1, error=0.0)
        np.testing.assert_allclose(h.pi, g["hmm_traj_pi"][i], atol=5e-6)
        np.testing.assert_allclose(h.A, g["hmm_traj_A"][i], atol=5e-6)
        np.testing.assert_allclose(h.B, g["hmm_traj_B"][i], atol=5e-6)
        np.testing.assert_allclose(h.predict(o), g["hmm_traj_p"][i],
                                   rtol=1e-4)


def test_hmm_decode_trained_golden(goldens):
    """Viterbi decode of the trained model: exact state path vs the C."""
    g = goldens("classic")
    h, o = _hmm_from_goldens(g)
    for _ in range(g["hmm_traj_A"].shape[0]):
        h.train(o, max_iter=1, error=0.0)
    s, prob = h.decode(o)
    np.testing.assert_array_equal(s, g["hmm_dec_s"])
    np.testing.assert_allclose(prob, g["hmm_dec_prob"], rtol=1e-4)
