"""Benchmark: mel spectrogram + MFCC throughput on one chip.

Mirrors the reference benchmark protocol (``benchmark/run_audioflux.py``:
num=128, fft_len=2048, slide=512, sr=32000; 1000 samples of TimeStep frames,
warm-up excluded, plan construction excluded), with TimeStep=1000.

Runs the fused Pallas kernel (``ops/pallas_spectrogram.py``): framing,
window, DFT, power, mel and log-DCT in one VMEM-resident kernel with bf16x3
MXU dots (~2e-6 relative error vs the fp32 reference path; verified
against the exact path below before timing).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares audio-hours/sec against the reference C library on a
32-core AMD TR 3970X (BASELINE.md: 1.43854 s for the same 1000-sample mel
workload => 4.458 audio-hours / 1.43854 s = 3.099 audio-h/s; we additionally
compute MFCC-13 in the same pass, which the C number does not include).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

SR = 32000
NUM = 128
R2E = 11  # fft 2048
SLIDE = 512
TIME_STEP = 1000
N_SAMPLES = 1000
TILE = 200  # frames per Pallas grid step

# audioFlux C mel-only, same workload (BASELINE.md, AMD TR 3970X)
BASELINE_S = 1.43854


def main():
    from audioflux_tpu.transforms.spectrogram import MelSpectrogram

    clip_len = TIME_STEP * SLIDE + (1 << R2E) - SLIDE  # 513536 samples
    audio_seconds = N_SAMPLES * clip_len / SR
    audio_hours = audio_seconds / 3600.0
    baseline_hps = audio_hours / BASELINE_S

    plan = MelSpectrogram(num=NUM, samplate=SR, radix2_exp=R2E,
                          slide_length=SLIDE)

    @jax.jit
    def synth(seed):
        key = jax.random.PRNGKey(seed)
        return 0.2 * jax.random.normal(key, (N_SAMPLES, clip_len),
                                       jnp.float32)

    # data resident in HBM before timing (reference protocol also excludes
    # data generation)
    xs = synth(0)
    xs.block_until_ready()

    # accuracy gate: fused-fast vs exact fp32 reference path on 2 clips
    mel_ref = plan.spectrogram(xs[:2])
    mel_fast, _ = plan.spectrogram_mfcc_fused(xs[:2], tile=TILE)
    rel = float(jnp.max(jnp.abs(mel_fast - mel_ref))
                / jnp.max(jnp.abs(mel_ref)))
    if rel > 1e-4:
        print(f"accuracy gate failed: rel err {rel:.3e}", file=sys.stderr)
        sys.exit(1)

    # warm-up / compile
    m, c = plan.spectrogram_mfcc_fused(xs, tile=TILE)
    jax.block_until_ready((m, c))

    t0 = time.perf_counter()
    m, c = plan.spectrogram_mfcc_fused(xs, tile=TILE)
    jax.block_until_ready((m, c))
    elapsed = time.perf_counter() - t0

    hps = audio_hours / elapsed
    print(json.dumps({
        "metric": "mel+mfcc audio-hours/sec/chip (1000x T=1000, 32kHz)",
        "value": round(hps, 3),
        "unit": "audio-hours/sec",
        "vs_baseline": round(hps / baseline_hps, 3),
    }))


if __name__ == "__main__":
    main()
