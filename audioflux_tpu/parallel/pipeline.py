"""Pipeline parallelism: stage an op chain across devices on a mesh axis.

SURVEY.md §2.10's optional distribution row: the reference has no
equivalent (its only parallelism is intra-process OpenMP over frames,
``src/stft_algorithm.c:773-780``); on TPU an analysis chain such as
frame -> DFT -> power -> filterbank can instead be *staged* across the
chips of a mesh axis, GPipe-style:

- stage ``i`` of the chain lives on device ``i`` of the ``pipe`` axis;
- the batch is split into microbatches that stream through the stages;
- hand-offs ride ``jax.lax.ppermute`` (ICI neighbor transfer), so at
  steady state every chip computes its stage while the wires carry one
  microbatch boundary — the TPU analogue of the "double-buffered DMA"
  staging sketched in the survey.

Because every device traces the *same* program under ``shard_map``, the
stage bodies are dispatched with ``lax.switch`` on the device's pipe
index, and activations travel in a fixed-size float32 carrier buffer
(each stage unflattens its input from, and flattens its output into,
``max_elems`` lanes).  All stage shapes are static, so one compile
serves the whole schedule: ``n_micro + n_stage - 1`` ticks of
``lax.scan``.

Useful when a chain's stages are individually heavy (large filterbank
gemms, CWT banks) and the batch is long: throughput approaches one
microbatch per tick with each chip holding only its own stage's
constants, instead of every chip holding all of them (data parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pipeline_chain_fn"]


def _flatten_pad(y, max_elems):
    flat = y.reshape(y.shape[0], -1).astype(jnp.float32)
    pad = max_elems - flat.shape[1]
    if pad < 0:
        raise ValueError("stage output exceeds carrier buffer")
    return jnp.pad(flat, ((0, 0), (0, pad)))


def pipeline_chain_fn(stage_fns, stage_shapes, mesh: Mesh,
                      axis: str = "time", n_micro: int = None):
    """Build a pipelined executor for a chain of per-microbatch stages.

    stage_fns: list of S pure functions; stage ``k`` maps an array of
        shape ``(mb,) + stage_shapes[k]`` to ``(mb,) + stage_shapes[k+1]``
        (microbatch dim leading, float32 in/out).
    stage_shapes: list of S+1 per-example shapes — chain input first,
        then each stage's output shape.
    mesh, axis: the pipe axis; its size must equal ``len(stage_fns)``.
    n_micro: number of microbatches (defaults to the pipe size).

    Returns a jitted ``run(x)`` taking ``(batch,) + stage_shapes[0]``
    with ``batch`` divisible by ``n_micro``; returns the chain output
    ``(batch,) + stage_shapes[-1]``, equal to composing the stages
    directly (float32 elementwise order preserved per stage).
    """
    n_stage = len(stage_fns)
    if mesh.shape[axis] != n_stage:
        raise ValueError(f"mesh axis '{axis}' has {mesh.shape[axis]} "
                         f"devices, chain has {n_stage} stages")
    if len(stage_shapes) != n_stage + 1:
        raise ValueError("need len(stage_fns)+1 stage_shapes")
    if n_micro is None:
        n_micro = n_stage
    max_elems = max(int(np.prod(s)) if s else 1 for s in stage_shapes)
    out_shape = tuple(stage_shapes[-1])
    in_shape = tuple(stage_shapes[0])

    def _stage_branch(k):
        shp_in = tuple(stage_shapes[k])
        fn = stage_fns[k]

        def body(buf):
            mb = buf.shape[0]
            x = buf[:, :int(np.prod(shp_in) or 1)].reshape((mb,) + shp_in)
            return _flatten_pad(fn(x), max_elems)

        return body

    branches = [_stage_branch(k) for k in range(n_stage)]
    right = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def _pipe(xs):
        # xs: (1, n_micro, mb, max_elems) local to each pipe device
        # (every device receives the full microbatch queue; only stage 0
        # reads it — the carrier state does the actual streaming)
        idx = jax.lax.axis_index(axis)
        xs = xs[0]
        mb = xs.shape[1]
        buf0 = jnp.zeros((mb, max_elems), jnp.float32)
        outs0 = jnp.zeros((n_micro, mb, max_elems), jnp.float32)

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t; others use the handed-off buf
            feed = jnp.where(t < n_micro, t, 0)
            buf = jnp.where(idx == 0, xs[feed], buf)
            live = (t >= idx) & (t - idx < n_micro)
            y = jax.lax.switch(idx, branches, buf)
            y = jnp.where(live, y, buf)
            # last stage records microbatch t - (S-1); everyone hands right
            slot = jnp.clip(t - (n_stage - 1), 0, n_micro - 1)
            done = (idx == n_stage - 1) & (t >= n_stage - 1)
            outs = jnp.where(done, outs.at[slot].set(y), outs)
            y = jax.lax.ppermute(y, axis, right)
            return (y, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(n_micro + n_stage - 1))
        # only the last pipe device holds real outputs; psum broadcasts
        # them so the unsharded result is identical on every device
        outs = jnp.where(idx == n_stage - 1, outs, 0.0)
        outs = jax.lax.psum(outs, axis)
        return outs[None]

    spec_in = P(axis, *([None] * 3))

    pipe = jax.shard_map(_pipe, mesh=mesh,
                         in_specs=(spec_in,), out_specs=spec_in,
                         check_vma=False)

    def run(x):
        x = jnp.asarray(x, jnp.float32)
        batch = x.shape[0]
        if batch % n_micro:
            raise ValueError(f"batch {batch} not divisible by {n_micro}")
        mb = batch // n_micro
        xs = _flatten_pad(x, max_elems).reshape(n_micro, mb, max_elems)
        # replicate the queue over the pipe axis (stage 0 reads it)
        xs = jnp.broadcast_to(xs[None], (n_stage,) + xs.shape)
        xs = jax.device_put(xs, NamedSharding(mesh, spec_in))
        outs = pipe(xs)  # (S, n_micro, mb, max_elems), replicated content
        flat = outs[0].reshape(batch, max_elems)
        n_out = int(np.prod(out_shape) or 1)
        return flat[:, :n_out].reshape((batch,) + out_shape)

    return jax.jit(run)
