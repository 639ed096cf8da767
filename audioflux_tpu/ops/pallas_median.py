"""Pallas TPU kernel: sliding median filter along the last axis.

The HPSS masks need per-cell medians over 21/31-tap windows
(hpss_algorithm.c:233-234). The jnp fallback materializes a
(rows, cols, order) window tensor in HBM and sorts it; this kernel instead
streams row tiles through VMEM and computes the median in-register with an
odd-even transposition sorting network over the (static, small) window
axis — one HBM read + one write per element.

Zero padding of order//2 per side matches the reference
(flux_vector.c:__vmedianfilter). Falls back to ops.filter.median_filter on
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["median_filter_last_axis"]


def _median_kernel(order):
    half = order // 2

    def kernel(in_ref, out_ref):
        x = in_ref[:]  # (TILE, cols + 2*half) zero-padded rows
        cols = out_ref.shape[1]
        # gather the window lanes: taps[j] has shape (TILE, cols)
        taps = [x[:, j:j + cols] for j in range(order)]
        # odd-even transposition sort over the taps (static network)
        for p in range(order):
            start = p % 2
            for j in range(start, order - 1, 2):
                lo = jnp.minimum(taps[j], taps[j + 1])
                hi = jnp.maximum(taps[j], taps[j + 1])
                taps[j], taps[j + 1] = lo, hi
        out_ref[:] = taps[half]

    return kernel


@functools.partial(jax.jit, static_argnames=("order", "interpret"))
def _median_pallas_2d(x, *, order, interpret=False):
    """x: (rows, cols) -> median-filtered along axis -1."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = x.shape
    half = order // 2
    TILE = 8
    pad_rows = (-rows) % TILE
    xp = jnp.pad(x, ((0, pad_rows), (half, half)))
    grid = (xp.shape[0] // TILE,)

    out = pl.pallas_call(
        _median_kernel(order),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], cols), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, cols + 2 * half),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp)
    return out[:rows]


def median_filter_last_axis(x, order: int, interpret: bool = False):
    """Median filter along the last axis (odd order, zero padding).

    Uses the Pallas kernel on TPU backends (or with interpret=True);
    otherwise defers to the jnp implementation.
    """
    if order < 2 or order % 2 == 0:
        return jnp.asarray(x)
    x = jnp.asarray(x)
    backend = jax.default_backend()
    if backend != "tpu" and not interpret:
        from audioflux_tpu.ops.filter import median_filter
        return median_filter(x, order, axis=-1)
    shape = x.shape
    flat = x.reshape((-1, shape[-1]))
    out = _median_pallas_2d(flat, order=order, interpret=interpret)
    return out.reshape(shape)
