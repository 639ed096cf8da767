"""Measure the compiled reference C library on this box for the BASELINE
configs that have no published number (BASELINE.json configs 1/4/5), giving
local anchors for the corresponding bench.py --matrix rows.

Each workload runs in its own subprocess (the reference corrupts its
allocator across calls in one process). Numbers are single-machine,
single-socket (this box exposes few cores; the C library's OMP threading
uses what it gets) — anchors, not cross-hardware comparisons; the metric
names in bench.py mark them "local-C base".

Usage:
    python tools/bench_ref.py            # run all workloads, print JSON
    python tools/bench_ref.py <name>     # run one workload in-process
Workloads: stft_linear cwt_synsq mir_pipeline reassign
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 32000


def _setup_reference():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "soundfile", os.path.join(ROOT, ".ref", "soundfile_stub.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sys.modules["soundfile"] = m
    sys.path.insert(0, os.path.join(ROOT, ".ref", "pkg"))
    import warnings
    warnings.filterwarnings("ignore")
    import audioflux as af
    return af


def _clip(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    return x


def _time_loop(fn, reps, min_wall=2.0):
    fn()  # warm-up (plans, caches)
    t0 = time.perf_counter()
    n = 0
    while True:
        for _ in range(reps):
            fn()
        n += reps
        el = time.perf_counter() - t0
        if el >= min_wall:
            return el / n


def stft_linear():
    """BASELINE config 1: linear STFT spectrogram, 10s clip, 1024/256 hann."""
    af = _setup_reference()
    x = _clip(10.0)
    obj = af.BFT(num=513, radix2_exp=10, samplate=SR, slide_length=256,
                 window_type=af.type.WindowType.HANN,
                 scale_type=af.type.SpectralFilterBankScaleType.LINEAR,
                 data_type=af.type.SpectralDataType.POWER)
    return {"seconds_per_clip": _time_loop(
        lambda: np.abs(obj.bft(x, result_type=1)), reps=3),
        "clip_seconds": 10.0}


def cwt_synsq():
    """BASELINE config 4: CWT morlet 84 scales + synsq.

    The reference segfaults at radix2_exp>=17 even in a fresh process
    (measured on this box; r2e=15 is its largest working size here), so
    the anchor clip is 2^15 samples = 1.024 s — per-audio-second cost is
    what the row compares anyway.
    """
    af = _setup_reference()
    n = 1 << 15
    x = _clip(n / SR)[:n]
    S = af.type.SpectralFilterBankScaleType
    W = af.type.WaveletContinueType
    cwt = af.CWT(num=84, radix2_exp=15, samplate=SR,
                 wavelet_type=W.MORLET, scale_type=S.OCTAVE)
    fre = cwt.get_fre_band_arr()
    sq = af.Synsq(num=84, radix2_exp=15, samplate=SR)

    def run():
        C = cwt.cwt(x)
        return sq.synsq(C, S.OCTAVE, fre)

    return {"seconds_per_clip": _time_loop(run, reps=1),
            "clip_seconds": n / SR}


def mir_pipeline():
    """BASELINE config 5: YIN pitch + mel-flux onset + HPSS, 30s clip."""
    af = _setup_reference()
    x = _clip(30.0)
    yin = af.PitchYIN(samplate=SR, radix2_exp=12, slide_length=1024)
    hp = af.HPSS(radix2_exp=11, window_type=af.type.WindowType.HAMM,
                 slide_length=512, h_order=21, p_order=31)
    bft = af.BFT(num=128, radix2_exp=11, samplate=SR, slide_length=512,
                 scale_type=af.type.SpectralFilterBankScaleType.MEL,
                 data_type=af.type.SpectralDataType.POWER)
    n_frames = (x.size - 2048) // 512 + 1
    on = af.Onset(time_length=n_frames, fre_length=128, slide_length=512,
                  samplate=SR, novelty_type=af.type.NoveltyType.FLUX)

    def run():
        yin.pitch(x)
        spec = np.abs(bft.bft(x, result_type=1))
        on.onset(spec)
        hp.hpss(x)

    return {"seconds_per_clip": _time_loop(run, reps=1),
            "clip_seconds": 30.0}


def reassign():
    """Existing matrix row's anchor: reassign spectrogram, 128ms clip."""
    af = _setup_reference()
    x = _clip(4096 / SR)
    bft = af.BFT(num=128, radix2_exp=12, samplate=SR, slide_length=1024,
                 scale_type=af.type.SpectralFilterBankScaleType.LINEAR,
                 data_type=af.type.SpectralDataType.POWER, is_reassign=True)
    return {"seconds_per_clip": _time_loop(
        lambda: np.abs(bft.bft(x, result_type=1)), reps=100),
        "clip_seconds": 4096 / SR}


def reassign_long():
    """r5 row's anchor: whole-recording reassignment (the reference's
    own use case — _reassignObj_rearrage over timeLength x (fft/2+1),
    reassign_algorithm.c:258), 30 s clip at 4096/1024."""
    af = _setup_reference()
    x = _clip(30.0)
    obj = af.Reassign(radix2_exp=12, samplate=SR, slide_length=1024,
                      re_type=af.type.ReassignType.ALL, is_padding=False)
    return {"seconds_per_clip": _time_loop(
        lambda: np.abs(obj.reassign(x)), reps=1),
        "clip_seconds": 30.0}


WORKLOADS = {"stft_linear": stft_linear, "cwt_synsq": cwt_synsq,
             "mir_pipeline": mir_pipeline, "reassign": reassign,
             "reassign_long": reassign_long}


def main():
    if len(sys.argv) > 1:
        name = sys.argv[1]
        out = WORKLOADS[name]()
        out["audio_hours_per_sec"] = round(
            out["clip_seconds"] / out["seconds_per_clip"] / 3600.0, 5)
        print(json.dumps({name: out}))
        return
    results = {}
    for name in WORKLOADS:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), name],
                           capture_output=True, text=True, timeout=1800)
        if r.returncode == 0 and r.stdout.strip():
            results.update(json.loads(r.stdout.strip().splitlines()[-1]))
        else:
            results[name] = {"error": r.stderr[-500:]}
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
