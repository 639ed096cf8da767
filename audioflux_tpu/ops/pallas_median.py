"""Pallas TPU kernel: sliding median filter along the last axis.

The HPSS masks need per-cell medians over 21/31-tap windows
(hpss_algorithm.c:233-234). The jnp fallback materializes a
(rows, cols, order) window tensor in HBM and sorts it; this kernel instead
streams row tiles through VMEM and computes the median in-register with a
**pruned Batcher odd-even-merge selection network** over the (static,
small) window axis — one HBM read + one write per element.

The network is Batcher's odd-even mergesort on the window padded to the
next power of two with +inf wires, backward-pruned to only the compare-
exchanges that can influence the median wire: 149 CEs for order 21 and
157 for order 31, versus 220/480 for the odd-even *transposition* sort
the kernel first shipped with (3.1x fewer min/max ops at order 31;
measured win on the HPSS row).  The selected element is the exact k-th
order statistic — output bit-identical to the full sort.

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


@functools.lru_cache(maxsize=None)
def _pruned_median_ces(order: int):
    """(pad_n, ces) — Batcher odd-even mergesort of the pow2-padded
    window, backward-pruned to the CEs that can reach the median wire."""
    n = 1 << (order - 1).bit_length()
    ces = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        ces.append((i + j, i + j + k))
            k //= 2
        p *= 2
    needed = {order // 2}  # +inf pad sorts to the top: median wire is k//2
    kept = []
    for a, b in reversed(ces):
        if a in needed or b in needed:
            kept.append((a, b))
            needed.add(a)
            needed.add(b)
    return n, tuple(reversed(kept))


def _median_kernel(order):
    half = order // 2
    n_pad, ces = _pruned_median_ces(order)

    def kernel(in_ref, out_ref):
        x = in_ref[:]  # (TILE, cols + 2*half) zero-padded rows
        cols = out_ref.shape[1]
        # gather the window lanes: taps[j] has shape (TILE, cols)
        taps = [x[:, j:j + cols] for j in range(order)]
        if n_pad > order:
            inf = jnp.full_like(taps[0], jnp.inf)
            taps = taps + [inf] * (n_pad - order)
        for a, b in ces:
            lo = jnp.minimum(taps[a], taps[b])
            hi = jnp.maximum(taps[a], taps[b])
            taps[a], taps[b] = lo, hi
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
    from audioflux_tpu.ops.backend import effective_backend
    backend = effective_backend()
    if backend != "tpu" and not interpret:
        from audioflux_tpu.ops.filter import median_filter
        return median_filter(x, order, axis=-1)
    shape = x.shape
    flat = x.reshape((-1, shape[-1]))
    out = _median_pallas_2d(flat, order=order, interpret=interpret)
    return out.reshape(shape)
