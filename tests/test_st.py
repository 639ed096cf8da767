"""ST / FST parity vs reference C goldens."""

import numpy as np

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.st import ST
from audioflux_tpu.transforms.fst import FST


def test_st(goldens, signals):
    g = goldens("st")
    x = signals["chord"][:1024]
    st = ST(radix2_exp=10, min_index=1, max_index=511)
    C = np.asarray(st.st(x))
    ref = g["st_re"] + 1j * g["st_im"]
    assert_close_to_golden(C.real, ref.real, 5e-5, "st_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "st_im")


def test_st_params(goldens, signals):
    g = goldens("st")
    x = signals["chord"][:1024]
    st = ST(radix2_exp=10, min_index=10, max_index=100, factor=2.0, norm=0.8)
    C = np.asarray(st.st(x))
    ref = g["st2_re"] + 1j * g["st2_im"]
    assert_close_to_golden(C.real, ref.real, 5e-5, "st2_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "st2_im")


def test_fst(goldens, signals):
    g = goldens("st")
    x = signals["chord"][:1024]
    fst = FST(radix2_exp=10)
    C = np.asarray(fst.fst(x, 1, 511))
    ref = g["fst_re"] + 1j * g["fst_im"]
    assert_close_to_golden(C.real, ref.real, 5e-5, "fst_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "fst_im")
    C2 = np.asarray(fst.fst(x, 5, 100))
    ref2 = g["fst2_re"] + 1j * g["fst2_im"]
    assert_close_to_golden(C2.real, ref2.real, 5e-5, "fst2_re")


def test_st_batched(signals):
    x = signals["chord"][:1024]
    st = ST(radix2_exp=10, min_index=1, max_index=64)
    out = np.asarray(st.st(np.stack([x, 0.5 * x])))
    single = np.asarray(st.st(x))
    assert out.shape == (2, 64, 1024)
    np.testing.assert_allclose(out[0], single, rtol=1e-6, atol=1e-8)


def test_fst_batched(signals):
    x = signals["chord"][:1024]
    fst = FST(radix2_exp=10)
    out = np.asarray(fst.fst(np.stack([x, 0.5 * x]), 1, 64))
    single = np.asarray(fst.fst(x, 1, 64))
    assert out.shape == (2, 64, 1024)
    np.testing.assert_allclose(out[0], single, rtol=1e-6, atol=1e-8)
