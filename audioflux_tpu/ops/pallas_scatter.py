"""Pallas TPU kernel: columnar reassignment scatter-add.

**MEASURED DEAD END — NOT ROUTED** (r4; kept as evidence + CPU-testable
reference).  The synchrosqueezing scatter ``out[f, t] = sum_i
[fi[i,t]==f] * v[i,t]`` (synsq_algorithm.c:201-217) runs as an XLA
one-hot einsum (``ops/scatter.py columnar_scatter_add``) at ~half VPU
peak on the one-hot generation, and the hypothesis was that a VMEM-
resident kernel sharing one mask between the re/im accumulations would
beat it.  Three kernel formulations were benchmarked on the real v5e at
the bench shape (B=16, R=F=84, T=32768), against XLA's 17.8 ms
standalone:

* THIS kernel (input-row loop, sublane-broadcast of ``fi[i,:]`` against
  an f-iota): 22.7 ms — the per-row sublane broadcasts are relayouts
  that eat the shared-mask saving;
* output-bin loop (scalar ``fi == f`` compares, full-width selects,
  sublane-reduce, per-row stores): 22.2 ms — the 84 cross-sublane
  reductions serialize on the VPU;
* same with 8-row grouped stores: 21.8 ms.

All ≥22 % slower than the XLA einsum: the MXU dot amortizes the one-hot
contraction better than any VPU-side reduce, and the generation work
(out_size × in × T compares, irreducible for a dense one-hot — radix
splits measured slower still, see ops/scatter.py) is the shared floor.
~Half VPU peak on generation IS the ceiling for this algorithm shape on
this hardware; only an algorithm with sub-dense compare count could
beat it, and both known candidates (radix split, shared-one-hot einsum)
measured slower in XLA form too.

Dropped cells are encoded as ``fi == out_size`` (matches no iota value),
exactly like the XLA path's trash bin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["supports", "columnar_scatter_pallas"]

_TB = 2048  # time lanes per grid step (VMEM: ~5 arrays x F x TB x 4B)
_MAX_ROWS = 512


def supports(n_rows: int, out_size: int, T: int) -> bool:
    """Kernel applicability: static unroll over rows stays compile-cheap,
    block shapes stay (sublane, 128k-lane)-mappable."""
    return (n_rows <= _MAX_ROWS and out_size <= _MAX_ROWS
            and T % 128 == 0 and T >= 128)


def _kernel(fi_ref, vre_ref, vim_ref, ore_ref, oim_ref, *, R, F):
    fi = fi_ref[0]    # (R, Tb) int32
    vre = vre_ref[0]  # (R, Tb) f32
    vim = vim_ref[0]
    Tb = fi.shape[-1]
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (F, Tb), 0)
    acc_re = jnp.zeros((F, Tb), jnp.float32)
    acc_im = jnp.zeros((F, Tb), jnp.float32)
    for i in range(R):
        cmp = iota_f == fi[i:i + 1, :]          # (F, Tb), one compare
        acc_re = acc_re + jnp.where(cmp, vre[i:i + 1, :], 0.0)
        acc_im = acc_im + jnp.where(cmp, vim[i:i + 1, :], 0.0)
    ore_ref[0] = acc_re
    oim_ref[0] = acc_im


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def columnar_scatter_pallas(values, fi, out_size: int, interpret=False):
    """Complex per-column scatter-add on TPU.

    values: complex (..., R, T); fi: int32 (..., R, T) with ``out_size``
    as the drop value.  Returns complex64 (..., out_size, T).
    Caller must check ``supports()`` first.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = values.shape[:-2]
    R, T = values.shape[-2:]
    B = 1
    for d in batch_shape:
        B *= d
    vre = jnp.real(values).reshape(B, R, T).astype(jnp.float32)
    vim = jnp.imag(values).reshape(B, R, T).astype(jnp.float32)
    fi3 = fi.reshape(B, R, T).astype(jnp.int32)

    tb = min(_TB, T)
    grid = (B, T // tb)
    in_spec = pl.BlockSpec((1, R, tb), lambda b, t: (b, 0, t),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, out_size, tb), lambda b, t: (b, 0, t),
                            memory_space=pltpu.VMEM)
    ore, oim = pl.pallas_call(
        functools.partial(_kernel, R=R, F=out_size),
        out_shape=[jax.ShapeDtypeStruct((B, out_size, T), jnp.float32),
                   jax.ShapeDtypeStruct((B, out_size, T), jnp.float32)],
        grid=grid,
        in_specs=[in_spec, in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        interpret=interpret,
    )(fi3, vre, vim)
    out = ore + 1j * oim
    return out.reshape(batch_shape + (out_size, T))
