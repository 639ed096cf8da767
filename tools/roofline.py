"""MXU roofline accounting for the fused fs4 mel+MFCC kernel.

Counts the MXU passes the fs4 kernel actually issues (from the plan's
constant shapes, mirroring ``ops/pallas_spectrogram.py::_kernel_fs4``)
and converts a measured wall into executed TFLOP/s vs the chip peak.

Two FLOP notions are reported:

* **executed** — what the MXU really multiplies: every bf16 pass of every
  hi/lo-split dot (the bf16x3 scheme issues 3 passes per f32-accurate
  product; that 3x is the *price of the accuracy contract*, not waste).
* **useful** — the algorithmic cost of the math being answered
  (split-radix rfft + mel projection + log-DCT at fp32), i.e. the number
  a naive "MFU" would use.

Usage::

    python tools/roofline.py [--seconds S --frames N]

Defaults to the headline bench shape (fft 2048, slide 512, 128 mel,
13 cc, 1000 clips x 1000 frames) and the wall recorded in
``BENCH_MATRIX.json`` if present.

Peak anchors: 118 TFLOP/s bf16 was *measured* on this chip (8k matmul,
see CLAUDE.md); the v5e datasheet number is 197 TFLOP/s.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MEASURED_PEAK_TFLOPS = 118.0
DATASHEET_PEAK_TFLOPS = 197.0


def fs4_executed_flops_per_frame(plan) -> dict:
    """MXU flops per audio frame, by kernel stage (fs4 path)."""
    Q, FL = plan.fs2_q, plan.fs2_fl
    blk4, fpu = plan.fs4_blk, plan.fs4_fpu  # fpu frames per row-unit
    R = FL * Q                               # rows per plane per unit

    # stage A (gather+pair-pack+Q-DFT): 3 passes of (2R, 2*blk4)@(2*blk4,128)
    a = 3 * (2 * R) * (2 * blk4) * 128 * 2
    # stage C (separable 128-DFT): 4 real products x 3 passes on (R,128)@(128,128)
    c = 12 * R * 128 * 128 * 2
    # mel fold: 2 parities x 3 passes of (FL, ngrp*128)@(ngrp*128, mel_pad)
    ngrp = Q // 2 + 1
    mel = 2 * 3 * FL * (ngrp * 128) * plan.mel_pad * 2
    # log-DCT: (2*FL, mel_pad)@(mel_pad, cc_pad), fp32 (6 passes on MXU)
    dct = 6 * (2 * FL) * plan.mel_pad * plan.cc_pad * 2
    per_unit = {"stage_a": a, "stage_c": c, "mel_fold": mel, "dct": dct}
    return {k: v / fpu for k, v in per_unit.items()}


def useful_flops_per_frame(plan) -> float:
    """fp32 algorithmic cost: split-radix rfft + dense mel + power + DCT."""
    n = plan.n_fft
    n_bins = n // 2 + 1
    rfft = 2.5 * n * np.log2(n)          # split-radix real-input FFT
    power = 3 * n_bins
    mel = 2 * n_bins * plan.num_mel
    dct = 2 * plan.num_mel * plan.cc_num + plan.num_mel  # + log10
    return rfft + power + mel + dct


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=None,
                    help="measured wall for --frames frames")
    ap.add_argument("--frames", type=float, default=1e6)
    args = ap.parse_args()

    from audioflux_tpu.transforms.spectrogram import MelSpectrogram
    from audioflux_tpu.ops.pallas_spectrogram import FusedMelPlan

    m = MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                       slide_length=512)
    plan = FusedMelPlan(m.window, m.filter_bank, m._dct[:13], 512)
    assert plan.fs4_ok

    seconds = args.seconds
    if seconds is None:
        try:
            with open(os.path.join(os.path.dirname(__file__), "..",
                                   "BENCH_MATRIX.json")) as f:
                rows = json.load(f)
            row = next(r for r in rows if "T=1000" in r["metric"])
            seconds = row["seconds"]
        except (OSError, StopIteration):
            print("no BENCH_MATRIX.json row; pass --seconds", file=sys.stderr)
            return 1

    stages = fs4_executed_flops_per_frame(plan)
    executed = sum(stages.values())
    useful = useful_flops_per_frame(plan)
    fps = args.frames / seconds
    tflops_exec = executed * fps / 1e12
    tflops_useful = useful * fps / 1e12

    audio_hps = fps * (plan.slide / 32000.0) / 3600.0
    out = {
        "frames_per_s": round(fps / 1e6, 3),
        "audio_hours_per_s": round(audio_hps, 2),
        "executed_mxu_flops_per_frame": {k: round(v / 1e3, 1)
                                         for k, v in stages.items()},
        "executed_total_kflops_per_frame": round(executed / 1e3, 1),
        "useful_kflops_per_frame": round(useful / 1e3, 1),
        "executed_TFLOPs": round(tflops_exec, 1),
        "useful_TFLOPs": round(tflops_useful, 1),
        "pct_of_measured_peak_118": round(100 * tflops_exec
                                          / MEASURED_PEAK_TFLOPS, 1),
        "pct_of_datasheet_peak_197": round(100 * tflops_exec
                                           / DATASHEET_PEAK_TFLOPS, 1),
        "accuracy_multiplier": round(executed / useful, 1),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
