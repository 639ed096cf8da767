"""Pallas TPU kernel: columnar reassignment scatter-add.

The synchrosqueezing scatter ``out[f, t] = sum_i [fi[i,t]==f] * v[i,t]``
(synsq_algorithm.c:201-217) is the one measured bottleneck left on the
cwt+synsq bench row.  The XLA formulation (``ops/scatter.py
columnar_scatter_add``) contracts a fused one-hot on the MXU but pays the
one-hot *generation* twice on the VPU — once fused into each of the re/im
einsums — and runs at ~half VPU peak.

This kernel flips the loop to the input rows: for each band i (static,
unrolled — R is ~84), one ``(F, Tb)`` compare of the f-iota against
``fi[i, :]`` yields the membership mask, and BOTH the re and im rows
accumulate through that one mask into VMEM-resident ``(F, Tb)``
accumulators.  Per element the work is 1 compare + 2 select-adds (shared
mask), versus XLA's 2 compares + 2 converts + 2 dot passes — and no
intermediate can fall out to HBM, so the bf16-fusion-break failure mode
of the einsum form cannot occur.

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
