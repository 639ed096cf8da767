"""Distributed extraction over a device mesh (a capability the reference
C library has no equivalent of — audioflux_tpu.parallel).

Runs on real TPU chips when present; headless CI mode uses 8 virtual CPU
devices so the sharding/collective paths execute for real.
"""
import os

if os.environ.get("AF_FORCE_CPU") == "1":
    # must be set before the first jax import to get 8 virtual devices
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import _util  # noqa: F401  (CPU forcing for CI)
from _util import SR, sample_220

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

import audioflux_tpu as af
from audioflux_tpu import parallel

n_dev = len(jax.devices())
data = 2 if n_dev % 2 == 0 and n_dev >= 2 else 1
time = max(n_dev // data, 1)
mesh = parallel.make_mesh(data=data, time=time)
print(f"mesh: {dict(mesh.shape)} over {n_dev} device(s)")

# a batch of clips: batch dim sharded over 'data', samples over 'time'
plan = af.MelSpectrogram(num=128, samplate=SR, radix2_exp=11,
                         slide_length=512)
block = 8 * plan.slide_length
clip = np.tile(sample_220(seconds=block * time / SR), (2 * data, 1))
clip += 0.01 * np.random.default_rng(0).standard_normal(
    clip.shape).astype(np.float32)
xs = jax.device_put(clip, NamedSharding(mesh, P("data", "time")))

fn = parallel.sharded_spectrogram_fn(plan, mesh, with_xxcc=13)
spec, cc = fn(xs)
print("sharded mel:", spec.shape, "mfcc:", cc.shape)

# the sharded result equals the single-device transform exactly
ref_spec = plan.spectrogram(clip)
assert np.allclose(np.asarray(spec), np.asarray(ref_spec)), "mismatch"
print("matches unsharded output exactly")

# global feature statistics via psum/pmax over the time axis
stats_fn = parallel.sharded_spectral_stats_fn(mesh)
t4 = 4 * (spec.shape[-1] // 4)
stats = stats_fn(spec[..., :t4])
print("per-band mean/max:", stats["mean"].shape, stats["max"].shape)
