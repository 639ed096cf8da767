"""Synsq / WSST parity vs reference C goldens.

Synchrosqueezing scatters each cell to a bin chosen by rounding a float32
atan2/log2 chain; ULP-level libm-vs-XLA differences flip a small fraction of
boundary cells to a neighboring bin. Acceptance: >=99.5% of cells bit-match
within 1e-4 and total scattered energy matches to 1e-4 relative.
"""

import numpy as np
import pytest

from audioflux_tpu.transforms.synsq import Synsq
from audioflux_tpu.transforms.wsst import WSST
from audioflux_tpu.types import (SpectralFilterBankScaleType as S,
                                 WaveletContinueType as W)


def assert_scatter_close(ours, ref, name, cell_frac=0.995, energy_rtol=1e-3):
    ours, ref = np.asarray(ours), np.asarray(ref)
    assert ours.shape == ref.shape
    match = np.abs(ours - ref) <= 1e-4 * max(np.abs(ref).max(), 1e-20)
    frac = match.mean()
    assert frac >= cell_frac, f"{name}: only {frac:.4%} of cells match"
    # flipped cells interfere, so energy is only approximately conserved
    e1 = (np.abs(ours) ** 2).sum()
    e2 = (np.abs(ref) ** 2).sum()
    assert abs(e1 - e2) <= energy_rtol * e2, f"{name}: energy {e1} vs {e2}"


def test_synsq(goldens):
    g = goldens("synsq")
    C = g["in_re"] + 1j * g["in_im"]
    sq = Synsq(num=84, radix2_exp=12, samplate=32000)
    R = sq.synsq(C, S.OCTAVE, g["in_fre"])
    assert_scatter_close(R, g["synsq_re"] + 1j * g["synsq_im"], "synsq")


def test_wsst(goldens, signals):
    g = goldens("synsq")
    ws = WSST(num=84, radix2_exp=12, samplate=32000,
              wavelet_type=W.MORSE, scale_type=S.OCTAVE)
    A, B = ws.wsst(signals["chord"][:4096])
    refB = g["wsst_cwt_re"] + 1j * g["wsst_cwt_im"]
    np.testing.assert_allclose(np.asarray(B), refB, atol=1e-4)
    assert_scatter_close(A, g["wsst_sq_re"] + 1j * g["wsst_sq_im"], "wsst_sq",
                         cell_frac=0.999)


def test_synsq_batched(goldens):
    g = goldens("synsq")
    C = g["in_re"] + 1j * g["in_im"]
    sq = Synsq(num=84, radix2_exp=12, samplate=32000)
    single = np.asarray(sq.synsq(C, S.OCTAVE, g["in_fre"]))
    batch = np.asarray(sq.synsq(np.stack([C, C]), S.OCTAVE, g["in_fre"]))
    assert batch.shape == (2, 84, 4096)
    np.testing.assert_allclose(batch[0], single, atol=1e-6)
