"""Degenerate-signal crash sweep over the host-state-machine pipelines.

The MIR pitch stack runs branchy per-frame Python (candidate chains +
queue strategies ported statement-level from the C); degenerate audio
produces short/empty candidate sets that golden fixtures (voice/tones)
never exercise — a chirp once crashed queue_fast this way (reads past
the logical length that the C serves from calloc'd zeros).  This sweep
pins crash-freedom; exactness is covered by the oracle fuzz rigs.
"""

import numpy as np
import pytest

import audioflux_tpu as af

SR = 32000
_rng = np.random.default_rng(7)

SIGNALS = {
    "silence": np.zeros(8192, np.float32),
    "dc": np.full(8192, 0.5, np.float32),
    "click": np.eye(1, 8192, 4096, dtype=np.float32).ravel(),
    "noise": _rng.standard_normal(8192).astype(np.float32),
    "chirp": np.asarray(af.chirp(50, 15000, 8192 / SR, samplate=SR),
                        np.float32),
}


@pytest.fixture(params=sorted(SIGNALS), ids=sorted(SIGNALS))
def edge_signal(request):
    return SIGNALS[request.param]


def test_pitch_ffp_edge(edge_signal):
    p = af.PitchFFP(samplate=SR, radix2_exp=12, slide_length=1024)
    fre, db = p.pitch(edge_signal)
    assert np.all(np.isfinite(np.asarray(fre)))
    assert len(fre) == p.cal_time_length(len(edge_signal))


@pytest.mark.parametrize("cls", [af.PitchYIN, af.PitchSTFT, af.PitchNCF,
                                 af.PitchCEP, af.PitchHPS, af.PitchLHS,
                                 af.PitchPEF])
def test_pitch_detectors_edge(cls, edge_signal):
    out = cls(samplate=SR, radix2_exp=12, slide_length=1024).pitch(
        edge_signal)
    fre = np.asarray(out[0] if isinstance(out, tuple) else out)
    assert np.all(np.isfinite(fre))


def test_stretch_shift_harmonic_edge(edge_signal):
    y = af.TimeStretch(radix2_exp=12, slide_length=1024).time_stretch(
        edge_signal, 1.3)
    assert np.all(np.isfinite(np.asarray(y)))
    y = af.PitchShift(radix2_exp=12, slide_length=1024).pitch_shift(
        edge_signal, 3)
    assert np.all(np.isfinite(np.asarray(y)))
    counts = af.mir.harmonic.Harmonic(
        samplate=SR, radix2_exp=12).harmonic_count(edge_signal, 80, 2000)
    assert np.all(np.asarray(counts) >= 0)
    h, p = af.HPSS(radix2_exp=11).hpss(edge_signal)
    assert np.all(np.isfinite(np.asarray(h)))
