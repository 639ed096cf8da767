"""Sharded feature reductions — psum/pmean global statistics.

SURVEY §2.10 "Feature reductions": spectral statistics over a recording
whose frames are sharded across the 'time' mesh axis need all-reduce
(``jax.lax.psum``) to agree with the single-chip result. These helpers
compute the Spectral global stats (sum / mean / max over frames, frame-wise
features stay local) with one collective per statistic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["sharded_spectral_stats_fn"]


def sharded_spectral_stats_fn(mesh: Mesh, batch_axis: str = "data",
                              time_axis: str = "time"):
    """Build a shard_map'd global-stats reducer over a (batch, num, T)
    spectrogram sharded (batch->data, T->time).

    Returns {'mean','max','sum','var'} per (batch, num), each replicated
    over the time axis — equal to the unsharded reduction.
    """

    def local_stats(S_loc):  # (B_loc, num, T_loc)
        n_loc = S_loc.shape[-1]
        s = jax.lax.psum(jnp.sum(S_loc, axis=-1), time_axis)
        n = jax.lax.psum(jnp.asarray(n_loc, jnp.float32), time_axis)
        mean = s / n
        mx = jax.lax.pmax(jnp.max(S_loc, axis=-1), time_axis)
        sq = jax.lax.psum(jnp.sum(S_loc * S_loc, axis=-1), time_axis)
        var = sq / n - mean * mean
        return {"sum": s, "mean": mean, "max": mx, "var": var}

    return jax.jit(jax.shard_map(
        local_stats, mesh=mesh,
        in_specs=P(batch_axis, None, time_axis),
        out_specs={k: P(batch_axis, None) for k in
                   ("sum", "mean", "max", "var")}))
