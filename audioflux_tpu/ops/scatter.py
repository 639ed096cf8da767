"""Batched flat scatter-add used by reassign/synsq/wsst.

``x.at[..., idx].add(v)`` with a batched ``idx`` performs an outer gather
(every batch scatters into every batch), so batched reassignment needs
explicit per-batch index offsets into one flattened buffer with a trash
slot per batch for dropped cells.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["batched_scatter_add", "columnar_scatter_add"]


def columnar_scatter_add(values, fi, out_size: int):
    """Per-column scatter-add: ``out[..., f, t] = sum over i with
    fi[..., i, t] == f of values[..., i, t]``; out-of-range rows drop.

    TPU-friendly form of the synchrosqueezing reassignment: XLA's
    ``scatter-add`` serializes duplicate indices on TPU, while this
    contracts a one-hot membership tensor on the MXU.  Intended for
    moderate ``out_size`` (the one-hot is out_size x n per column).
    """
    hp = jax.lax.Precision.HIGHEST
    oh = (fi[..., None, :, :] == jnp.arange(out_size)[:, None, None])
    if jnp.iscomplexobj(values):
        ohf = oh.astype(jnp.float32)
        re = jnp.einsum("...fit,...it->...ft", ohf, jnp.real(values),
                        precision=hp)
        im = jnp.einsum("...fit,...it->...ft", ohf, jnp.imag(values),
                        precision=hp)
        return re + 1j * im
    ohf = oh.astype(values.dtype)
    return jnp.einsum("...fit,...it->...ft", ohf, values, precision=hp)


def batched_scatter_add(values, flat_idx, out_size: int):
    """Scatter-add ``values`` into per-batch buffers of ``out_size`` slots.

    values, flat_idx: (..., n); indices equal to ``out_size`` are dropped.
    Returns (..., out_size).

    Complex values scatter as two float32 passes: TPU's complex64
    scatter-add lowers ~10x slower than float32 (measured 2.08 s vs
    2 x 0.21 s on the reassign workload).
    """
    if jnp.iscomplexobj(values):
        re = batched_scatter_add(jnp.real(values), flat_idx, out_size)
        im = batched_scatter_add(jnp.imag(values), flat_idx, out_size)
        return re + 1j * im
    batch_shape = values.shape[:-1]
    n = values.shape[-1]
    v = values.reshape(-1, n)
    i = flat_idx.reshape(-1, n)
    nb = v.shape[0]
    stride = out_size + 1  # one trash slot per batch
    offs = jnp.arange(nb, dtype=i.dtype)[:, None] * stride
    flat = jnp.zeros((nb * stride,), values.dtype)
    flat = flat.at[(i + offs).reshape(-1)].add(v.reshape(-1))
    out = flat.reshape(nb, stride)[:, :out_size]
    return out.reshape(batch_shape + (out_size,))
