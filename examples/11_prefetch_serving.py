"""Serving loop: async native prefetch feeding a jitted feature pipeline.

The native worker pool (``native/wavio.cpp``) decodes the NEXT batches of
WAV files on C++ threads while the device computes features for the
CURRENT one — the standard accelerator input-pipeline shape.  The
reference's streaming reader (``python/audioflux/audio.py`` WaveReader)
is synchronous; this is its production-serving counterpart.
"""

import _util  # noqa: F401  (CPU forcing + path setup)
import os
import tempfile

import numpy as np
import jax

from audioflux_tpu.io import native
from audioflux_tpu.transforms.spectrogram import MelSpectrogram

SR = _util.SR
CLIP = 2 * SR          # 2 s clips
BATCH = 4

if not native.available():
    print("native IO unavailable (no g++); skipping")
    raise SystemExit(0)

# synthesize a small "dataset" of WAV files
tmp = tempfile.mkdtemp(prefix="af_serve_")
paths = []
rng = np.random.default_rng(0)
for i in range(12):
    f0 = 110.0 * (2 ** (i / 12))
    t = np.arange(CLIP) / SR
    x = (0.4 * np.sin(2 * np.pi * f0 * t)
         + 0.05 * rng.standard_normal(CLIP)).astype(np.float32)
    p = os.path.join(tmp, f"clip{i:02d}.wav")
    native.wav_write(p, x, SR)
    paths.append(p)

plan = MelSpectrogram(num=64, samplate=SR, radix2_exp=11, slide_length=512)
pipeline = jax.jit(plan.spectrogram)

n_batches = 0
with native.PrefetchLoader(paths, batch_size=BATCH, length=CLIP,
                           num_threads=4, depth=2) as loader:
    for batch, good in loader:
        mel = pipeline(batch)          # device compute overlaps the next
        n_batches += 1                 # batch's background decode
        print(f"batch {n_batches}: decoded {good}/{batch.shape[0]}, "
              f"mel {tuple(mel.shape)}")

assert n_batches == len(paths) // BATCH
print("serving loop done")
