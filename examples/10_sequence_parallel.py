"""Sequence-parallel full-signal transforms on a device mesh.

The STFT family shards over frame blocks (see 09_sharded_mesh.py); the
full-signal-FFT transforms (CWT/ST/NSGT/CQT) use the band-/frame-
partitioned paths in ``audioflux_tpu.parallel.sharded_full``, and a long
recording streams through the mesh time-sharded via ``sharded_ccwt_fn``.
Run with 8 virtual CPU devices (``_util`` sets XLA_FLAGS) or on a real
TPU slice unchanged.
"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("AF_FORCE_CPU", "1")  # mesh demo: 8 virtual devices
import _util  # noqa: F401,E402  (CPU forcing)
import jax  # noqa: E402
import numpy as np  # noqa: E402
import audioflux_tpu as af  # noqa: E402
from audioflux_tpu.parallel import (make_mesh, sharded_batch_fn,  # noqa: E402
                                    sharded_ccwt_fn, sharded_cwt_fn,
                                    sharded_synsq_fn)

SR = 32000
n_dev = len(jax.devices())
data = 2 if n_dev % 2 == 0 and n_dev >= 2 else 1
time = max(n_dev // data, 1)
mesh = make_mesh(data=data, time=time)
print(f"mesh: {dict(mesh.shape)} over {n_dev} device(s)")

# band-parallel CWT + synchrosqueeze of a batch of clips
cwt = af.CWT(num=28, radix2_exp=11, samplate=SR)
sq = af.Synsq(num=28, radix2_exp=11, samplate=SR)
rng = np.random.default_rng(0)
x = (0.2 * rng.standard_normal((4, 2048))).astype(np.float32)
W = np.asarray(sharded_cwt_fn(cwt, mesh)(x))
S = np.asarray(sharded_synsq_fn(cwt, sq, mesh)(x))
print("sharded cwt:", W.shape, "synsq:", S.shape)

# time-sharded continuous CWT of one long recording (each shard computes
# only its own splice windows; ppermute halos)
step = cwt.fft_length // 2
xl = (0.2 * rng.standard_normal((2, time * 2 * step))).astype(np.float32)
C = np.asarray(sharded_ccwt_fn(cwt, mesh)(xl))
print("sharded ccwt:", C.shape, "==", np.asarray(cwt.ccwt(xl)).shape)

# time-sharded continuous S-transform (same splice scheme as ccwt) and
# the band-partitioned FST expansion
st = af.ST(radix2_exp=9, samplate=SR, min_index=1, max_index=64)
from audioflux_tpu.parallel import sharded_cst_fn, sharded_fst_fn  # noqa: E402
xs = (0.2 * rng.standard_normal((2, time * 2 * (st.fft_length // 2)))
      ).astype(np.float32)
print("sharded cst:", np.asarray(sharded_cst_fn(st, mesh)(xs)).shape)
fst = af.FST(radix2_exp=9, samplate=SR, min_index=1, max_index=64)
xf = (0.2 * rng.standard_normal((2, 512))).astype(np.float32)
print("sharded fst:", np.asarray(sharded_fst_fn(fst, mesh)(xf)).shape)

# batch-of-files data parallelism for any transform
cq = af.CQT(num=24, samplate=SR, low_fre=220.0)
batch = (0.2 * rng.standard_normal((8, 4096))).astype(np.float32)
fn = sharded_batch_fn(lambda v: cq._cqt_run(v, cq._scale_vec()), mesh)
print("batched cqt over data axis:", np.asarray(fn(batch)).shape)

# shard_map kernel-tier twin (r5): mode="shard_map" partitions the band
# axis explicitly so each shard runs the single-chip Pallas kernel path
# on its own bands (on TPU, mode="auto" picks this whenever the kernel
# tier is available; interpret=True demonstrates the kernel on CPU)
cw_k = af.CWT(num=12, radix2_exp=14, samplate=SR)
xk = (0.2 * rng.standard_normal((2, 16384))).astype(np.float32)
Wk = np.asarray(sharded_cwt_fn(cw_k, mesh, mode="shard_map",
                               interpret=True)(xk))
print("shard_map kernel twin cwt:", Wk.shape)
