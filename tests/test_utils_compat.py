"""Reference-wrapper compat surface in utils (names + behavior).

Covers the helpers the reference exposes under ``audioflux.utils`` that are
thin or renamed here: array-contiguity helpers, audio-length check,
temporal dB stats (``util_temproal``, flux_util.c:652-684), scaler/weight
aliases, and the ``queue_fre2/3`` wrappers over the fuzz-exact _queue
ports.
"""

import warnings

import numpy as np
import pytest

import audioflux_tpu.utils as u


def test_ascontiguous_helpers():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    t = u.ascontiguous_T(x)
    assert t.shape == (4, 3) and t.flags.c_contiguous
    assert np.array_equal(t, x.T)
    s = u.ascontiguous_swapaxex(np.arange(24).reshape(2, 3, 4), 0, 2)
    assert s.shape == (4, 3, 2) and s.flags.c_contiguous


def test_check_audio_length_pad_and_truncate():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        short = u.check_audio_length(np.ones(100, np.float32), 8)
        assert short.shape == (256,) and short[99] == 1 and short[100] == 0
        long_ = u.check_audio_length(np.ones((2, 300), np.float32), 8)
        assert long_.shape == (2, 256)
    exact = u.check_audio_length(np.ones(256, np.float32), 8)
    assert exact.shape == (256,)


def test_temproal_db_matches_c_formula():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000) * 0.05).astype(np.float32)
    mx, avg, pct = u.temproal_db(x)
    v = np.maximum(20 * np.log10(np.abs(x) + np.float32(1e-8)), -36.0)
    assert mx == pytest.approx(float(np.max(v)), rel=1e-6)
    assert avg == pytest.approx(float(np.sum(v) / len(v)), rel=1e-6)
    assert pct == pytest.approx(float(np.mean(v <= -18.0)), abs=1e-6)
    # silence floors at -36 dB and is 100% below -18
    mx0, avg0, pct0 = u.temproal_db(np.zeros(10, np.float32))
    assert mx0 == pytest.approx(-36.0) and pct0 == 1.0


def test_reference_name_aliases():
    fre = np.array([100.0, 1000.0, 10000.0], np.float32)
    assert np.allclose(u.auditory_weight_a(fre), u.weight_a(fre))
    assert np.allclose(u.auditory_weight_d(fre), u.weight_d(fre))
    X = np.random.default_rng(1).standard_normal((16, 3)).astype(np.float32)
    assert np.allclose(u.stand_scale(X), u.standard_scale(X))


def test_queue_fre_wrappers_reference_order():
    # golden tuples captured from the C __queue_fre2/3 (test_queue_util)
    k1, k2, n = u.queue_fre2(110.0, 220.5)
    assert (k1, k2) == (1, 2) and n == pytest.approx(110.0)
    k1, k2, n = u.queue_fre2(100.0, 373.0)
    assert (k1, k2, n) == (0, 0, 0.0)
    s1, s2, k1, k2, k3, n = u.queue_fre3(110.0, 220.0, 330.5)
    assert (s1, s2, k1, k2, k3) == (1, 1, 1, 2, 3)
    assert n == pytest.approx(110.0)
