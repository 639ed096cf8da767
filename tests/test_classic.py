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
