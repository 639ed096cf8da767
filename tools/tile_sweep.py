"""One-off: time fs4 at several tile sizes + T=3000 chunking variants."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from audioflux_tpu.transforms.spectrogram import MelSpectrogram

SR, SLIDE, R2E = 32000, 512, 11

def sync(y):
    for leaf in jax.tree_util.tree_leaves(y):
        leaf.block_until_ready()
    np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])

def timeit(fn, *a, reps=10):
    y = fn(*a); sync(y)
    t0 = time.perf_counter()
    for _ in range(reps): y = fn(*a)
    sync(y)
    return (time.perf_counter() - t0) / reps

plan = MelSpectrogram(num=128, samplate=SR, radix2_exp=R2E, slide_length=SLIDE)

# headline shape, tile sweep
T = 1000
clip = T * SLIDE + 2048 - SLIDE
xs = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (1000, clip), jnp.float32)
xs.block_until_ready()
for tile in (1000, 504, 248, 120):
    el = timeit(lambda x, t=tile: plan.spectrogram_mfcc_fused(x, tile=t), xs)
    print(f"T=1000 tile={tile}: {el*1000:.2f} ms  ({1000*clip/SR/3600/el:.1f} h/s)")

# T=3000 chunking variants
T = 3000
clip = T * SLIDE + 2048 - SLIDE
for n_chunks in (4, 2, 1):
    b = 1000 // n_chunks
    xs3 = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (b, clip), jnp.float32)
    xs3.block_until_ready()
    def run(x, reps=n_chunks):
        out = None
        for _ in range(reps):
            out = plan.spectrogram_mfcc_fused(x, tile=1000)
        return out
    try:
        el = timeit(run, xs3)
        print(f"T=3000 chunks={n_chunks}: {el*1000:.2f} ms ({1000*clip/SR/3600/el:.1f} h/s)")
    except Exception as e:
        print(f"T=3000 chunks={n_chunks}: FAILED {type(e).__name__}: {str(e)[:120]}")
