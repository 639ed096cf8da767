"""Chip-vs-CPU sweep of the public surface — run after TPU-path changes.

Runs every major public transform/feature/MIR entry point on the default
(TPU) backend and again under ``jax.default_device(cpu)``, comparing
magnitudes.  Each case carries the tolerance of its documented accuracy
class (README "On-chip accuracy tiers"):

* fast-path transforms: ~1e-5 kernel contract (tol 1e-3 headroom);
* scatter transforms (synsq/wsst/reassign): knife-edge bin flips with
  conserved mass — compared on flip fraction + mass, not cellwise;
* log-cepstral consumers: pinned exact, so tight;
* NMF-family: iterative fixed-point — chip and CPU converge to
  different local optima from the same init (backend matmul rounding
  compounds); only shapes/finiteness are checked.

The r4 run of this sweep found a real crash (pitch_shift's 890/999
resample plan in the banded FIR).  Exits nonzero on any unexpected
failure.  Usage: ``python tools/chip_sweep.py`` (TPU backend; ~10 min
of compiles on a cold cache).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import audioflux_tpu as af  # noqa: E402
from audioflux_tpu.types import (ResampleQualityType, SpectralDataType,  # noqa: E402
                                 SpectralFilterBankScaleType,
                                 WaveletDiscreteType)

SR = 32000
FAILURES = []


def _mags(out):
    vals = out if isinstance(out, (tuple, list)) else (out,)
    return [np.asarray(jnp.abs(v)) for v in vals if hasattr(v, "shape")]


def both(fn):
    a = _mags(fn())
    with jax.default_device(jax.devices("cpu")[0]):
        b = _mags(fn())
    return a, b


def check_rel(name, fn, tol=1e-3, joint=False):
    """``joint`` normalizes every output by the max over ALL outputs —
    for pipelines where one output can be legitimately ~zero (HPSSNMF's
    percussive channel on a near-pure-harmonic test tone sits at the
    kernel noise floor; dividing by its own 5e-7 max read as rel=125)."""
    try:
        a, b = both(fn)
        scale = (max(np.max(np.abs(v)) for v in b) if joint else None)
        worst = max(float(np.max(np.abs(u.astype(np.float64)
                                        - v.astype(np.float64)))
                          / ((scale if joint else np.max(np.abs(v)))
                             + 1e-12))
                    for u, v in zip(a, b))
        ok = worst < tol
        print(f"{'OK ' if ok else 'DIFF'} {name:26s} rel {worst:.2e}"
              f"{'' if ok else f'  (tol {tol})'}")
        if not ok:
            FAILURES.append(name)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name:26s} {type(e).__name__}: {str(e)[:110]}")
        FAILURES.append(name)


def check_scatter(name, fn, flip_tol=0.05, mass_tol=1e-3):
    """Scatter class: bounded flip fraction + conserved mass."""
    try:
        a, b = both(fn)
        u, v = a[0], b[0]
        mass = abs(float(u.sum()) / max(float(v.sum()), 1e-30) - 1)
        flips = float(np.mean(np.abs(u - v) > 1e-3 * v.max()))
        ok = flips < flip_tol and mass < mass_tol
        print(f"{'OK ' if ok else 'DIFF'} {name:26s} flips {flips:.3f} "
              f"mass {mass:.1e}")
        if not ok:
            FAILURES.append(name)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name:26s} {type(e).__name__}: {str(e)[:110]}")
        FAILURES.append(name)


def check_runs(name, fn):
    """Fixed-point class: shapes + finiteness only."""
    try:
        a = _mags(fn())
        ok = all(np.isfinite(v).all() for v in a)
        print(f"{'OK ' if ok else 'FAIL'} {name:26s} (runs, finite)")
        if not ok:
            FAILURES.append(name)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name:26s} {type(e).__name__}: {str(e)[:110]}")
        FAILURES.append(name)


def main():
    rng = np.random.default_rng(9)
    t = np.arange(SR, dtype=np.float32) / SR
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 523.25 * t)
         + 0.03 * rng.standard_normal(SR)).astype(np.float32)
    x4096, x2048 = x[:4096], x[:2048]
    S = SpectralFilterBankScaleType

    mel = af.MelSpectrogram(num=128, samplate=SR, radix2_exp=11,
                            slide_length=512)
    check_rel("mel spectrogram", lambda: mel.spectrogram(x))
    check_rel("mel+mfcc fused T=1",
              lambda: mel.spectrogram_mfcc_fused(x2048[None].repeat(3, 0),
                                                 tile=1))
    st_obj = af.STFT(radix2_exp=11, slide_length=512)
    check_rel("stft/istft roundtrip", lambda: st_obj.istft(st_obj.stft(x)),
              tol=2e-3)  # istft edges divide by near-clamp window sums
    check_rel("CWT", lambda: af.CWT(num=28, radix2_exp=12,
                                    samplate=SR).cwt(x4096))
    check_rel("PWT", lambda: af.PWT(num=28, radix2_exp=12,
                                    samplate=SR).pwt(x4096), tol=2e-3)
    check_rel("NSGT", lambda: af.NSGT(num=28, radix2_exp=12,
                                      samplate=SR).nsgt(x4096))
    check_rel("ST", lambda: af.ST(radix2_exp=11, samplate=SR, min_index=1,
                                  max_index=60).st(x2048))
    check_rel("FST", lambda: af.FST(radix2_exp=11, samplate=SR, min_index=1,
                                    max_index=60).fst(x2048))
    check_rel("DWT", lambda: af.DWT(num=4, wavelet_type=WaveletDiscreteType.DB,
                                    t1=4).dwt(x4096))
    check_rel("WPT", lambda: af.WPT(num=3, radix2_exp=12).wpt(x4096))
    check_rel("SWT", lambda: af.SWT(3, 4096).swt(x4096))
    cw = af.CWT(num=28, radix2_exp=12, samplate=SR)
    sq = af.Synsq(num=28, radix2_exp=12, samplate=SR)
    check_scatter("Synsq", lambda: jnp.abs(
        sq.synsq(cw.cwt(x4096), S.OCTAVE, cw.get_fre_band_arr())))
    check_scatter("WSST", lambda: jnp.abs(
        af.WSST(num=28, radix2_exp=12, samplate=SR).wsst(x4096)[0]))
    check_scatter("Reassign", lambda: jnp.abs(af.Reassign(
        radix2_exp=11, samplate=SR, slide_length=512).reassign(x)))
    # long-recording class: T*m past the radix budget — TPU takes the
    # blocked halo+tail scatter (ops/scatter.py), CPU the flat path
    xlong = np.concatenate([x] * 10)  # 10 s -> T ~ 311, out ~ 319k
    check_scatter("Reassign long (blocked)", lambda: jnp.abs(af.Reassign(
        radix2_exp=11, samplate=SR, slide_length=1024).reassign(xlong)))
    cq = af.CQT(num=84, samplate=SR, slide_length=1024)
    check_rel("CQT chroma", lambda: cq.chroma(cq.cqt(x[:8192])))
    check_rel("VQT", lambda: af.VQT(num=84, samplate=SR,
                                    slide_length=1024).cqt(x[:8192]))
    check_rel("Cepstrogram", lambda: af.Cepstrogram(
        radix2_exp=12, samplate=SR).cepstrogram(x))
    check_rel("Temporal", lambda: af.Temporal(
        frame_length=2048, slide_length=512).temporal(x))
    bft = af.BFT(num=128, radix2_exp=11, samplate=SR,
                 scale_type=S.MEL, data_type=SpectralDataType.POWER)
    check_rel("BFT mel POWER", lambda: bft.bft(x, result_type=1))
    check_rel("Deconv", lambda: af.Deconv(bft.num).deconv(
        jnp.abs(bft.bft(x, result_type=1))))
    for name, cls in [("PitchNCF", af.PitchNCF), ("PitchHPS", af.PitchHPS),
                      ("PitchLHS", af.PitchLHS), ("PitchCEP", af.PitchCEP),
                      ("PitchSTFT", af.PitchSTFT)]:
        check_rel(name, lambda c=cls: c(samplate=SR).pitch(x))
    check_rel("PitchYIN", lambda: af.PitchYIN(samplate=SR).pitch(x))
    check_rel("PitchFFP", lambda: af.PitchFFP(
        samplate=SR, radix2_exp=12, slide_length=1024).pitch(x))
    check_rel("TuneTrack", lambda: af.TuneTrack(
        samplate=SR, radix2_exp=12, slide_length=1024).tune(x))
    check_rel("HarmonicRatio", lambda: af.HarmonicRatio(
        samplate=SR).harmonic_ratio(x))
    check_rel("HPSS", lambda: af.HPSS(radix2_exp=11, slide_length=512,
                                      h_order=21, p_order=31).hpss(x),
              tol=2e-3)
    check_rel("TimeStretch interior", lambda: af.TimeStretch(
        radix2_exp=11).time_stretch(x, 1.2)[2048:-2048], tol=2e-3)
    check_rel("PitchShift", lambda: af.PitchShift(
        radix2_exp=11).pitch_shift(x[:16000], 2)[2048:-2048], tol=5e-3)
    # r5: multiplicative updates run at Precision.HIGHEST (classic/nmf.py
    # _mm) — chip-vs-CPU factors measured <= 1e-6 rel even at 300
    # iterations (they diverged to different local optima at default MXU
    # precision; the r4 sweep had downgraded this to finiteness-only)
    Vnmf = np.abs(rng.standard_normal((64, 100)).astype(np.float32))
    check_rel("NMF", lambda: af.NMF(8, max_iter=30).nmf(Vnmf), tol=1e-4)
    check_rel("HPSSNMF", lambda: af.HPSSNMF(
        radix2_exp=11, slide_length=512, k=4, max_iter=20).hpss(x),
        tol=2e-3, joint=True)
    check_rel("Xcorr", lambda: af.Xcorr().xcorr(x4096))
    rs = af.Resample(ResampleQualityType.BEST)
    rs.set_samplate(32000, 44100)
    check_rel("Resample 32k->44.1k", lambda: rs.resample(x))

    print(f"\n{len(FAILURES)} unexpected: {FAILURES}" if FAILURES
          else "\nall classes within contract")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
