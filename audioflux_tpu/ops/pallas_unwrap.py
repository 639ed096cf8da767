"""Fused C-style phase unwrap + backward diff in one HBM pass.

``synsq_algorithm.c`` unwraps each band's phase (flux_vector.c:__vunwrap)
and then differentiates it along time.  The XLA expression of that
(``transforms/synsq.py:_c_unwrap``) is a ``jnp.cumsum`` of per-step wrap
counts — log2(T) relayout passes over the (rows, T) matrix — plus
separate diff/concat passes.  This kernel does the whole chain in a
single pass:

* the wrap count k[j] in {-1, 0, +1} is computed on the VPU from the
  local principal difference (float32 expressions identical to the XLA
  path, so the counts agree bit-for-bit off the documented knife edges);
* the in-block inclusive cumsum runs as one MXU dot with a 0/1 upper-
  triangular matrix — k and the triangle are exact in bfloat16 and the
  MXU accumulates in float32, so the integer prefix sums are EXACT
  (|c| < 2^24);
* a (rows_block, 128) VMEM scratch carries {last x, last c, last y}
  across sequential time blocks, giving the global recurrence;
* the unwrapped y = x + c * 2pi and the backward diff e[j] = y[j] -
  y[j-1] (e[0] = 0) use the same float32 phrases as the XLA path; the
  wrap counts agree exactly, but a compiler may contract the final
  mul/add into an FMA, making individual cells differ from the cumsum
  formulation by <= 1 ulp OF THE UNWRAPPED PHASE — the same knife-edge
  tolerance class as the documented cross-libm scatter-bin drift.
  Measured: the XLA:CPU interpret path DOES contract (the tests bound
  it); the real-chip Mosaic lowering does NOT — bench.py's synsq gate
  compares a genuinely separate ``force_xla_unwrap=True`` compilation
  and observes bit-equality (flips 0, mass error 0).  bitcast and
  optimization_barrier fences are unavailable/ineffective in Mosaic, so
  the bound is asserted rather than fenced.

HBM traffic: read phase + write diff (2 passes total) instead of the
~log2(T)+3 passes of the cumsum formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["unwrap_diff", "supports"]

_TWO_PI = np.float32(2 * np.pi)
_PI = np.float32(np.pi)


def supports(rows: int, t: int) -> bool:
    """Kernel applicability: 8 | rows and a >=128 lane block divides t."""
    return rows % 8 == 0 and any(t % tb == 0 for tb in (512, 256, 128)) \
        and t >= 128


def _pick_blocks(rows: int, t: int):
    tb = next(b for b in (512, 256, 128) if t % b == 0)
    rb = 8
    for cand in range(8, 257, 8):
        if rows % cand == 0:
            rb = cand
    return rb, tb


def _kernel(x_ref, tri_ref, o_ref, carry, *, tb: int):
    j = pl.program_id(1)
    xb = x_ref[...]                                   # (rb, tb)
    lane = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
    first_lane = lane == 0
    xprev = pltpu.roll(xb, 1, 1)
    xprev = jnp.where(first_lane, carry[:, 0:1], xprev)

    # wrap count (float32 phrases == transforms/synsq.py:_c_unwrap)
    sub = jnp.abs(xb - xprev)
    t = jnp.floor(sub / _TWO_PI)
    mod = sub - t * _TWO_PI
    t = t + (mod > _PI).astype(jnp.float32)
    k = jnp.where(sub < _PI, 0.0, jnp.where(xb > xprev, -t, t))
    k = jnp.where(first_lane & (j == 0), 0.0, k)

    # exact integer inclusive prefix sum on the MXU (k, tri exact in bf16;
    # float32 accumulate)
    csum = jax.lax.dot(k.astype(jnp.bfloat16), tri_ref[...],
                       preferred_element_type=jnp.float32)
    c = csum + jnp.where(j == 0, 0.0, carry[:, 1:2])

    y = xb + c * _TWO_PI
    yprev = pltpu.roll(y, 1, 1)
    yprev = jnp.where(first_lane, carry[:, 2:3], yprev)
    e = y - yprev
    e = jnp.where(first_lane & (j == 0), 0.0, e)
    o_ref[...] = e

    carry[:, 0:1] = xb[:, tb - 1:tb]
    carry[:, 1:2] = c[:, tb - 1:tb]
    carry[:, 2:3] = y[:, tb - 1:tb]


@functools.partial(jax.jit, static_argnames=("interpret",))
def unwrap_diff(phase, *, interpret: bool = False):
    """(rows, T) float32 phase -> (rows, T) float32 e with e[..., 0] = 0
    and e[..., j] = unwrap(phase)[..., j] - unwrap(phase)[..., j-1]
    (C __vunwrap semantics), in one fused Pallas pass."""
    rows, t = phase.shape
    rb, tb = _pick_blocks(rows, t)
    tri = jnp.asarray(np.triu(np.ones((tb, tb), np.float32)),
                      jnp.bfloat16)  # tri[u, v] = 1 for u <= v
    return pl.pallas_call(
        functools.partial(_kernel, tb=tb),
        grid=(rows // rb, t // tb),
        in_specs=[
            pl.BlockSpec((rb, tb), lambda i, j: (i, j)),
            pl.BlockSpec((tb, tb), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, tb), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((rows, t), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rb, 128), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(phase, tri)
