"""Tile-size sweep for the fused mel+MFCC kernel on the real TPU.

Runs the headline workload (1000 clips, T=1000 frames) at several frame
tiles and prints wall seconds + audio-h/s per tile.  Tunnel dispatch cost
is amortized the same way bench.py does (3 reps, 1-element host fetch as
the fence).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

SR = 32000
NUM = 128
R2E = 11
SLIDE = 512
TIME_STEP = 1000
N_SAMPLES = 1000


def _sync(y):
    for leaf in jax.tree_util.tree_leaves(y):
        leaf.block_until_ready()
    np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])


def _time(fn, *args, reps=3):
    y = fn(*args)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    _sync(y)
    return (time.perf_counter() - t0) / reps


def main():
    from audioflux_tpu.transforms.spectrogram import MelSpectrogram

    clip_len = TIME_STEP * SLIDE + (1 << R2E) - SLIDE
    audio_hours = N_SAMPLES * clip_len / SR / 3600.0
    plan = MelSpectrogram(num=NUM, samplate=SR, radix2_exp=R2E,
                          slide_length=SLIDE)

    key = jax.random.PRNGKey(0)
    xs = 0.2 * jax.random.normal(key, (N_SAMPLES, clip_len), jnp.float32)
    xs.block_until_ready()

    tiles = [int(t) for t in sys.argv[1:]] or [104, 200, 304, 400, 504, 1000]
    for tile in tiles:
        try:
            el = _time(lambda x, t=tile: plan.spectrogram_mfcc_fused(
                x, tile=t), xs)
            print(f"tile={tile:5d}  {el:.4f}s  {audio_hours/el:7.2f} audio-h/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile:5d}  FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
