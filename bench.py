"""Benchmark: mel spectrogram + MFCC throughput on one chip.

Mirrors the reference benchmark protocol (``benchmark/run_audioflux.py``:
num=128, fft_len=2048, slide=512, sr=32000; 1000 samples of TimeStep frames,
warm-up excluded, plan construction excluded), with TimeStep=1000.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares audio-hours/sec against the reference C library on a
32-core AMD TR 3970X (BASELINE.md: 1.43854 s for the same 1000-sample mel
workload => 4.458 audio-hours / 1.43854 s = 3.099 audio-h/s; we additionally
compute MFCC-13 in the same pass, which the C number does not include).
"""

import json
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
CHUNK = 250  # clips per jit call (tunnel round-trips dominate at small chunks)

# audioFlux C mel-only, same workload (BASELINE.md, AMD TR 3970X)
BASELINE_S = 1.43854


def main():
    from audioflux_tpu.transforms.spectrogram import MelSpectrogram

    clip_len = TIME_STEP * SLIDE + (1 << R2E) - SLIDE  # 512512 samples
    audio_seconds = N_SAMPLES * clip_len / SR
    audio_hours = audio_seconds / 3600.0
    baseline_hps = audio_hours / BASELINE_S

    plan = MelSpectrogram(num=NUM, samplate=SR, radix2_exp=R2E,
                          slide_length=SLIDE)
    dct = jnp.asarray(plan._dct[:13])
    fb = jnp.asarray(plan.filter_bank)
    window = jnp.asarray(plan.window)
    hp = jax.lax.Precision.HIGHEST

    from audioflux_tpu.ops.frame import frame_signal

    @jax.jit
    def mel_mfcc(x):  # (B, n) -> ((B, NUM, T), (B, 13, T))
        frames = frame_signal(x, 1 << R2E, SLIDE)
        spec = jnp.fft.rfft(frames * window, axis=-1)
        re, im = jnp.real(spec), jnp.imag(spec)
        S = re * re + im * im
        mel = jnp.einsum("btf,nf->btn", S, fb, precision=hp)
        cc = jnp.einsum("btn,kn->btk", jnp.log10(jnp.maximum(mel, 1e-8)),
                        dct, precision=hp)
        return jnp.swapaxes(mel, -1, -2), jnp.swapaxes(cc, -1, -2)

    @jax.jit
    def synth(seed):
        key = jax.random.PRNGKey(seed)
        return 0.2 * jax.random.normal(key, (CHUNK, clip_len), jnp.float32)

    # data resident in HBM before timing (reference protocol also excludes
    # data generation)
    chunks = [synth(i) for i in range(N_SAMPLES // CHUNK)]
    for c in chunks:
        c.block_until_ready()

    # warm-up / compile
    m, c = mel_mfcc(chunks[0])
    c.block_until_ready()

    t0 = time.perf_counter()
    acc = None
    for ch in chunks:
        m, c = mel_mfcc(ch)
    c.block_until_ready()
    m.block_until_ready()
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
