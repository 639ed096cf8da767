"""Sequence-parallel paths for the full-signal-FFT transforms.

The STFT family shards cleanly over frame blocks (``parallel/sharded.py``),
but CWT/ST/NSGT compute one FFT of the whole 2**radix2_exp-sample signal and
then per-band inverse transforms (reference ``cwt_algorithm.c:418-456``,
``st_algorithm.c:262-286``, ``nsgt_algorithm.c:542-620``), and CQT runs a
multirate octave recursion over the whole signal (``cqt_algorithm.c:993-1000``).
Their TPU-first decomposition follows where the FLOPs are:

* the forward FFT is one L*log(L) pass over a signal that is at most
  2**radix2_exp samples — replicating it costs less than communicating it;
* the per-band inverse transforms are ``num`` independent L-point IFFTs —
  an embarrassingly parallel batch, partitioned across the mesh;
* the result is redistributed to time-sharding with one all-to-all on ICI.

Everything is expressed as ``jax.lax.with_sharding_constraint`` annotations
on the existing op graphs — XLA GSPMD inserts the all_gather / all_to_all
collectives (the scaling-book recipe: pick a mesh, annotate, let XLA place
the collectives).  Because the partitioned graphs are the *same* graphs as
the single-chip transforms, outputs match the unsharded transforms to float
rounding; the only reduction whose order changes is the synsq bin
accumulation (<= num terms per bin).

For recordings much longer than 2**radix2_exp samples, ``sharded_ccwt_fn``
is the genuinely time-sharded path: it distributes the reference's ccwt
window splice (``python/audioflux/cwt.py:280-320``) across the mesh with a
``ppermute`` halo exchange, each shard computing only its own windows —
input, compute, and output all stay sharded over time, so signals that do
not fit one chip's HBM stream through the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioflux_tpu.ops import fft as afft

__all__ = ["sharded_cwt_fn", "sharded_pwt_fn", "sharded_synsq_fn",
           "sharded_wsst_fn", "sharded_st_fn", "sharded_fst_fn",
           "sharded_nsgt_fn", "sharded_cqt_fn", "sharded_ccwt_fn",
           "sharded_cst_fn", "sharded_batch_fn", "sharded_batch_map_fn"]

_HIGHEST = jax.lax.Precision.HIGHEST


def _ns(mesh: Mesh, *spec):
    return NamedSharding(mesh, P(*spec))

def _pin_native_fft(fn):
    """Trace the wrapped graph with ops.fft pinned to the native XLA FFT
    (GSPMD partitions the FFT HLO; it may replicate a pallas_call —
    see ops/backend.py native_fft_scope).

    CAVEAT (trace-order hazard, not a correctness one): the pin is
    thread-local state read at trace time, not part of jit cache keys.
    A callable that was ALREADY traced outside the pin (e.g. a
    per-instance ``@jax.jit`` hit earlier in the process) reuses its
    cached jaxpr — pallas custom calls and all — inside the pinned
    graph; results stay correct but GSPMD may replicate those kernels
    on a real pod.  Callables handed to the GSPMD wrappers should be
    un-jitted graph builders (every wrapper in this module passes raw
    bodies); for kernel-bearing pipelines prefer the ``shard_map``
    forms, which need no pin at all."""
    def wrapped(*a, **k):
        from audioflux_tpu.ops.backend import native_fft_scope
        with native_fft_scope():
            return fn(*a, **k)
    return wrapped


# ---------------------------------------------------------------------------
# shard_map kernel-tier twins
#
# GSPMD treats a ``pallas_call`` as an opaque custom call it may replicate
# (all-gathering the operand), so the GSPMD wrappers below pin the native
# fft tier while tracing — losing the Pallas kernel tiers (the four-step
# fft kernel, the fused CWT bank kernel) on exactly the multi-chip paths.
# The ``shard_map`` twins partition the band/bin axis EXPLICITLY: each
# shard executes the single-chip kernel path on its own band slice, so the
# kernel tiers stay enabled with guaranteed per-shard execution (the
# sharded_batch_map_fn / sharded_ccwt_fn pattern).  ``mode``:
#   "auto"      — shard_map twin when the kernel tier is available
#                 (TPU backend + size support), GSPMD otherwise;
#   "gspmd"     — force the sharding-constraint form (native fft tier);
#   "shard_map" — force the twin (tests drive it on the CPU mesh with
#                 ``interpret=True``).
# Replacing the reference's per-thread plan parallelism
# (src/stft_algorithm.c:773-788) with mesh-partitioned kernel batches.
# ---------------------------------------------------------------------------


def _pick_smap(mode: str, kernel_ok: bool) -> bool:
    if mode not in ("auto", "gspmd", "shard_map"):
        raise ValueError(f"mode must be auto/gspmd/shard_map, got {mode!r}")
    return mode == "shard_map" or (mode == "auto" and kernel_ok)


def _twin_or_auto(mode: str, smap_run, gspmd_thunk, n_div: int):
    """``mode="shard_map"``: the twin, strict (raises on bad batches).
    ``mode="auto"``: dispatch per call — the twin for (B, n) batches
    divisible by the mesh, else the GSPMD form (built lazily, once), so
    auto mode never rejects an input the GSPMD wrappers accept."""
    if mode == "shard_map":
        return smap_run
    box = []

    def run(x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 2 and x.shape[0] % n_div == 0:
            return smap_run(x)
        if not box:
            box.append(gspmd_thunk())
        return box[0](x)

    return run


def _band_pad(arr: np.ndarray, nshard: int) -> np.ndarray:
    """Zero-pad the leading (band) axis to a multiple of ``nshard``."""
    padn = (-arr.shape[0]) % nshard
    if not padn:
        return arr
    pads = [(0, padn)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pads)


def _check_batch(x, n_b: int, what: str):
    """Twin input contract — NOT stricter than the GSPMD forms': their
    ``in_shardings=(batch_axis, time_axis)`` already require a 2-D input
    with B % data == 0 AND n % time == 0 (pjit rejects non-divisible
    explicit shardings — verified empirically), while the cwt-family
    twins need only B % data (samples replicate per band shard) and the
    synsq/wsst twins exactly match (their psum_scatter needs n % time,
    as the GSPMD input sharding did).  Only the CQT twin is stricter
    (whole-mesh batch), and its auto mode dispatches per call via
    ``_twin_or_auto``."""
    if x.ndim != 2:
        raise ValueError(f"{what} expects (B, n) input, got {x.shape}")
    if x.shape[0] % n_b:
        raise ValueError(f"batch {x.shape[0]} must divide the batch mesh "
                         f"axis ({n_b}) in shard_map mode")


def _cwt_kernel_ok(obj, interpret: bool) -> bool:
    from audioflux_tpu.ops import pallas_cwt as pcwt
    from audioflux_tpu.ops.backend import on_tpu
    w_len = obj.data_length + 2 * obj.pad_length
    return (pcwt.supports(w_len, obj.pad_length, obj.data_length)
            and (on_tpu() or interpret))


def _uniform_row_h(bank_p: np.ndarray, w_len: int, nshard: int):
    """Static stage-1 support counts, uniform across band shards.

    shard_map traces ONE program for all shards, so the fused kernel's
    static bucketing cannot differ per shard: take the elementwise max
    over the shard slices.  Exact (extra rows only contract bank entries
    that are exactly zero) and free in wall clock (SPMD runs in
    lockstep; the widest shard's counts bound the step anyway)."""
    from audioflux_tpu.ops import pallas_cwt as pcwt
    rh = np.asarray(pcwt.band_row_counts(bank_p, w_len),
                    np.int64).reshape(nshard, -1)
    return tuple(int(v) for v in rh.max(axis=0))


def _smap_cwt_like(obj, mesh: Mesh, batch_axis: str, band_axis: str, *,
                   det: bool, interpret: bool):
    """Band-sharded CWT/PWT with the fused kernel per shard.

    Each shard replicates the forward FFT (one L·log L pass — cheaper
    than communicating it, same argument as the GSPMD form) and runs the
    fused bank-multiply + four-step IFFT kernel on only its own bands.
    Output arrives band-sharded over ``band_axis``."""
    from audioflux_tpu.transforms.cwt import _cwt_conv_body
    if det:
        obj.enable_det(True)
    bank_np = np.asarray(obj._det_bank if det else obj._bank, np.float32)
    num = bank_np.shape[0]
    p_len, L = obj.pad_length, obj.data_length
    w_len = L + 2 * p_len
    nshard = int(mesh.shape[band_axis])
    n_b = int(mesh.shape[batch_axis])
    bank_p = _band_pad(bank_np, nshard)
    use_k = _cwt_kernel_ok(obj, interpret)
    row_h = _uniform_row_h(bank_p, w_len, nshard) if use_k else None
    bank_j = jnp.asarray(bank_p)

    def local(x_loc, bank_loc):
        return _cwt_conv_body(x_loc, bank_loc, det=det, pad_length=p_len,
                              data_length=L, row_h=row_h,
                              force_kernel=use_k, interpret=interpret)

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None), P(band_axis, None)),
        out_specs=P(batch_axis, band_axis, None),
        check_vma=False)  # Pallas outputs carry no vma info

    @jax.jit
    def run(x):
        x = jnp.asarray(x, jnp.float32)
        _check_batch(x, n_b, "sharded cwt/pwt")
        return smapped(x, bank_j)[..., :num, :]

    return run


def _smap_squeeze(cwt_obj, mesh: Mesh, batch_axis: str, band_axis: str, *,
                  interpret: bool, kind: str, num_out: int, samplate: float,
                  thresh: float, order: int, with_det: bool):
    """Band-sharded CWT(+det) -> per-cell bin map -> partial scatter ->
    reduce_scatter: the synsq/wsst twin body builder.

    The bin map is band-local; the order>1 composition needs every
    band's map (it looks up OTHER bands' targets), so it all-gathers the
    small int32 map, composes, and slices back.  Each shard's scatter
    produces its bands' partial bin sums; ``psum_scatter`` completes the
    sum over ICI and leaves the output time-sharded.  Padding bands
    contribute nothing (zero bank rows -> zero power -> thresholded
    out).  Returns ``run(x)`` -> squeezed (+ cwt when ``with_det``)."""
    from audioflux_tpu.transforms.cwt import _cwt_conv_body
    from audioflux_tpu.transforms.synsq import (_compose_order,
                                                _reassign_scatter,
                                                _synsq_map)
    from audioflux_tpu.transforms.wsst import _wsst_map

    bank_np = np.asarray(cwt_obj._bank, np.float32)
    num = bank_np.shape[0]
    p_len, L = cwt_obj.pad_length, cwt_obj.data_length
    w_len = L + 2 * p_len
    nshard = int(mesh.shape[band_axis])
    n_b = int(mesh.shape[batch_axis])
    bank_p = _band_pad(bank_np, nshard)
    nloc = bank_p.shape[0] // nshard
    use_k = _cwt_kernel_ok(cwt_obj, interpret)
    row_h = _uniform_row_h(bank_p, w_len, nshard) if use_k else None
    bank_j = jnp.asarray(bank_p)
    operands = [bank_j]
    row_h_det = None
    if with_det:
        cwt_obj.enable_det(True)
        det_p = _band_pad(np.asarray(cwt_obj._det_bank, np.float32), nshard)
        row_h_det = _uniform_row_h(det_p, w_len, nshard) if use_k else None
        operands.append(jnp.asarray(det_p))
    fre_full = jnp.asarray(cwt_obj.fre_band_arr, jnp.float32)

    def _localize_fi(fi):
        """order>1 composition across the band shards."""
        if order <= 1:
            return fi
        fi_full = jax.lax.all_gather(fi, band_axis, axis=fi.ndim - 2,
                                     tiled=True)
        comp = _compose_order(fi_full[..., :num, :], num_out, order)
        padn = fi_full.shape[-2] - num
        if padn:  # pad rows re-marked as drops before the local re-slice
            fill = jnp.full(comp.shape[:-2] + (padn, comp.shape[-1]), -1,
                            jnp.int32)
            comp = jnp.concatenate([comp, fill], axis=-2)
        j = jax.lax.axis_index(band_axis)
        return jax.lax.dynamic_slice_in_dim(comp, j * nloc, nloc,
                                            axis=comp.ndim - 2)

    def local(x_loc, bank_loc, *det_loc):
        D = _cwt_conv_body(x_loc, bank_loc, det=False, pad_length=p_len,
                           data_length=L, row_h=row_h, force_kernel=use_k,
                           interpret=interpret)
        if with_det:
            dD = _cwt_conv_body(x_loc, det_loc[0], det=True,
                                pad_length=p_len, data_length=L,
                                row_h=row_h_det, force_kernel=use_k,
                                interpret=interpret)
            fi = _wsst_map(D, dD, fre_full, scale_kind=kind, num=num_out,
                          samplate=samplate)
        else:
            fi = _synsq_map(D, fre_full, scale_kind=kind, num=num_out,
                            samplate=samplate)
        fi = _localize_fi(fi)
        partial = _reassign_scatter(D, fi, num=num_out, thresh=thresh)
        # reduce_scatter rides f32 pairs: the TPU X64-rewrite pass has no
        # c64 reduce-scatter lowering (found compiling on the real chip —
        # the CPU mesh accepts c64 and hid it)
        ps = lambda a: jax.lax.psum_scatter(  # noqa: E731
            a, band_axis, scatter_dimension=a.ndim - 1, tiled=True)
        sq = jax.lax.complex(ps(jnp.real(partial)), ps(jnp.imag(partial)))
        return (sq, D) if with_det else sq

    out_sq = P(batch_axis, None, band_axis)
    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None),) + (P(band_axis, None),) * len(operands),
        out_specs=(out_sq, P(batch_axis, band_axis, None)) if with_det
        else out_sq,
        check_vma=False)

    @jax.jit
    def run(x):
        x = jnp.asarray(x, jnp.float32)
        _check_batch(x, n_b, "sharded synsq/wsst")
        out = smapped(x, *operands)
        if with_det:
            sq, D = out
            return sq, D[..., :num, :]
        return out

    return run


def _smap_st(obj, mesh: Mesh, batch_axis: str, band_axis: str):
    """Bin-sharded ST: each shard IFFTs only its own gaussian-windowed
    shifted spectra through the single-chip body — the fft kernel tier
    stays enabled per shard (no GSPMD pin)."""
    from audioflux_tpu.transforms.st import _st_body
    nshard = int(mesh.shape[band_axis])
    n_b = int(mesh.shape[batch_axis])
    nbins = len(obj.bin_arr)
    win_j = jnp.asarray(_band_pad(np.asarray(obj._windows, np.float32),
                                  nshard))
    # pad bins with 0: _st_body routes bin 0 to the (cheap) mean row,
    # sliced off below
    bins_j = jnp.asarray(_band_pad(np.asarray(obj.bin_arr, np.int32),
                                   nshard))

    def local(x_loc, win_loc, bins_loc):
        return _st_body(x_loc, win_loc, bins_loc, obj.fft_length)

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None), P(band_axis, None), P(band_axis)),
        out_specs=P(batch_axis, band_axis, None),
        check_vma=False)

    @jax.jit
    def run(x):
        x = jnp.asarray(x, jnp.float32)
        _check_batch(x, n_b, "sharded st")
        return smapped(x, win_j, bins_j)[..., :nbins, :]

    return run


def _smap_nsgt(obj, mesh: Mesh, batch_axis: str, band_axis: str):
    """Band-sharded NSGT Bluestein pipeline; complex per-band constants
    travel as f32 real/imag pairs (axon cannot move complex64 across the
    host<->device boundary) and recombine on device."""
    (gather, weight, chirp, post, Bf, expand, max_ln, Lc) = \
        _nsgt_bluestein_consts(obj)
    nshard = int(mesh.shape[band_axis])
    n_b = int(mesh.shape[batch_axis])
    num = obj.num
    pad = lambda a: _band_pad(np.asarray(a), nshard)  # noqa: E731
    ops = [jnp.asarray(pad(gather).astype(np.int32)),
           jnp.asarray(pad(weight))]
    for c in (chirp, post, Bf):
        cp = pad(c)
        ops += [jnp.asarray(np.real(cp).astype(np.float32)),
                jnp.asarray(np.imag(cp).astype(np.float32))]
    ops.append(jnp.asarray(pad(expand).astype(np.int32)))
    jk = np.arange(Lc)[:, None] * np.arange(max_ln)[None, :]
    inv_r = (np.cos(2 * np.pi * jk / Lc) / Lc).astype(np.float32)
    inv_i = (np.sin(2 * np.pi * jk / Lc) / Lc).astype(np.float32)

    def local(x_loc, g_loc, w_loc, cr, ci, pr, pi, br, bi, e_loc):
        F = afft.fft(x_loc, axis=-1)
        v = F[..., g_loc] * w_loc                  # (B_loc, num_loc, max_ln)
        u = v * jax.lax.complex(cr, ci)
        U = afft.fft(u, n=Lc, axis=-1)
        inv_dft = jax.lax.complex(jnp.asarray(inv_r), jnp.asarray(inv_i))
        conv = jnp.einsum("...l,lk->...k", U * jax.lax.complex(br, bi),
                          inv_dft, precision=_HIGHEST)
        cells = conv * jax.lax.complex(pr, pi)
        return jnp.take_along_axis(
            cells, jnp.broadcast_to(e_loc, cells.shape[:-2] + e_loc.shape),
            axis=-1)

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None),) + (P(band_axis, None),) * len(ops),
        out_specs=P(batch_axis, band_axis, None),
        check_vma=False)

    @jax.jit
    def run(x):
        x = jnp.asarray(x, jnp.float32)
        _check_batch(x, n_b, "sharded nsgt")
        return smapped(x, *ops)[..., :num, :]

    return run


def _smap_fst(obj, mesh: Mesh, batch_axis: str, band_axis: str,
              min_index: int, max_index: int):
    """Band-sharded FST: the ~L-sample segment chain replicates per shard
    (its dyadic FFTs are negligible — see the GSPMD form's docstring);
    each shard gathers only its own bands of the (nbins, L) expansion."""
    nshard = int(mesh.shape[band_axis])
    n_b = int(mesh.shape[batch_axis])
    gather = obj._gather_rows(min_index, max_index).astype(np.int32)
    nbins = gather.shape[0]
    gather_j = jnp.asarray(_band_pad(gather, nshard))

    def local(x_loc, g_loc):
        return obj._fst_chain(x_loc)[..., g_loc]

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None), P(band_axis, None)),
        out_specs=P(batch_axis, band_axis, None),
        check_vma=False)

    @jax.jit
    def run(x):
        x = jnp.asarray(x, jnp.float32)
        _check_batch(x, n_b, "sharded fst")
        return smapped(x, gather_j)[..., :nbins, :]

    return run


def _smap_cqt_batch(obj, mesh: Mesh, batch_axis: str, time_axis: str):
    """Batch-sharded CQT over the WHOLE mesh (both axes flattened): each
    shard runs the full single-chip octave recursion — kernel tiers and
    all — on its local clips.  The frame-parallel GSPMD form stays the
    single-signal scale-out path; its small-fft octave plans (< 2048 =
    matmul-DFT einsums, plain HLO) lose nothing to GSPMD anyway — only
    low-min_fre plans whose top-octave fft reaches the Pallas tier
    benefit here, and those are exactly the plans `mode="auto"` routes
    this way."""
    n_tot = int(mesh.shape[batch_axis]) * int(mesh.shape[time_axis])

    def local(x_loc, sv):
        return obj._cqt_impl(x_loc, sv)

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P((batch_axis, time_axis)), P(None)),
        out_specs=P((batch_axis, time_axis)),
        check_vma=False)

    jitted = jax.jit(smapped)

    def run(x):
        x = jnp.asarray(x, jnp.float32)
        _check_batch(x, n_tot, "sharded cqt (shard_map)")
        return jitted(x, jnp.asarray(obj._scale_vec()))

    return run


# ---------------------------------------------------------------------------
# CWT: band-parallel IFFT bank, time-sharded output
# ---------------------------------------------------------------------------

def _cwt_body(obj, x, bank, det, batch_axis, time_axis, mesh):
    """The CWT._run graph with GSPMD partitioning annotations."""
    x = jax.lax.with_sharding_constraint(x, _ns(mesh, batch_axis, None))
    p = obj.pad_length
    if p:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(p, p)], mode="symmetric")
    F = afft.fft(x, axis=-1)
    prod = bank * F[..., None, :]
    if det:
        prod = prod * 1j
    # band axis partitioned: num independent L-point IFFTs spread over the
    # mesh (this is where the FLOPs are)
    prod = jax.lax.with_sharding_constraint(
        prod, _ns(mesh, batch_axis, time_axis, None))
    out = afft.ifft(prod, axis=-1)
    if p:
        out = out[..., p:p + obj.data_length]
    return out  # bank rows pre-flipped to ascending frequency at build


def sharded_cwt_fn(obj, mesh: Mesh, batch_axis: str = "data",
                   time_axis: str = "time", det: bool = False,
                   mode: str = "auto", interpret: bool = False):
    """Mesh-parallel CWT: (B, 2**radix2_exp) -> complex64 (B, num, L).

    Input arrives sharded (batch over ``batch_axis``, samples over
    ``time_axis``); the output's time axis is sharded over ``time_axis``
    (GSPMD mode) or the band axis over ``time_axis`` (shard_map mode).
    Equal to ``obj.cwt`` / ``obj.cwt_det`` to float rounding.  ``mode``:
    see the shard_map-twin section header — "auto" picks the shard_map
    twin (fused kernel per band shard) whenever the kernel tier is
    available, else the GSPMD form with the native fft tier.
    """
    if _pick_smap(mode, _cwt_kernel_ok(obj, interpret)):
        return _smap_cwt_like(obj, mesh, batch_axis, time_axis, det=det,
                              interpret=interpret)
    if det:
        obj.enable_det(True)
    bank = jnp.asarray(obj._det_bank if det else obj._bank)

    def run(x):
        out = _cwt_body(obj, x, bank, det, batch_axis, time_axis, mesh)
        return jax.lax.with_sharding_constraint(
            out, _ns(mesh, batch_axis, None, time_axis))

    return jax.jit(_pin_native_fft(run),
        in_shardings=_ns(mesh, batch_axis, time_axis),
        out_shardings=_ns(mesh, batch_axis, None, time_axis))


def sharded_pwt_fn(obj, mesh: Mesh, batch_axis: str = "data",
                   time_axis: str = "time", mode: str = "auto",
                   interpret: bool = False):
    """Mesh-parallel PWT: (B, data_length) -> complex64 (B, num, L).

    The PWT is the same full-signal pad -> FFT -> bank multiply ->
    per-band IFFT pipeline as the CWT (``pwt_algorithm.c``), so it
    shares ``_cwt_body`` (GSPMD) / ``_smap_cwt_like`` (shard_map twin,
    fused kernel per band shard): bands partition over the mesh for the
    IFFT flops.  Equal to ``obj.pwt`` to float rounding.
    """
    if _pick_smap(mode, _cwt_kernel_ok(obj, interpret)):
        return _smap_cwt_like(obj, mesh, batch_axis, time_axis, det=False,
                              interpret=interpret)
    bank = jnp.asarray(obj._bank)

    def run(x):
        out = _cwt_body(obj, x, bank, False, batch_axis, time_axis, mesh)
        return jax.lax.with_sharding_constraint(
            out, _ns(mesh, batch_axis, None, time_axis))

    return jax.jit(_pin_native_fft(run),
        in_shardings=_ns(mesh, batch_axis, time_axis),
        out_shardings=_ns(mesh, batch_axis, None, time_axis))


def sharded_synsq_fn(cwt_obj, synsq_obj, mesh: Mesh,
                     batch_axis: str = "data", time_axis: str = "time",
                     mode: str = "auto", interpret: bool = False):
    """Mesh-parallel CWT + synchrosqueeze: (B, L) -> complex64 (B, num, L).

    One jit runs the band-partitioned CWT and the synsq pipeline — the
    phase rate comes from the CWT matrix itself (finite-difference
    unwrap, like the reference ``synsq_algorithm.c``; no derivative bank
    is involved), stays band-partitioned (elementwise over bands), and
    the bin accumulation contracts over the sharded band axis (GSPMD:
    XLA inserts the psum; shard_map twin: explicit partial scatters +
    ``psum_scatter`` over ICI).  Matches ``Synsq.synsq(cwt, ..)`` up to
    the reduction-order of each output bin's <= num-term sum.
    """
    from audioflux_tpu.transforms.synsq import scale_kind
    kind = scale_kind(cwt_obj.scale_type)
    if _pick_smap(mode, _cwt_kernel_ok(cwt_obj, interpret)):
        return _smap_squeeze(cwt_obj, mesh, batch_axis, time_axis,
                             interpret=interpret, kind=kind,
                             num_out=synsq_obj.num,
                             samplate=float(synsq_obj.samplate),
                             thresh=synsq_obj.thresh,
                             order=synsq_obj.order, with_det=False)
    from audioflux_tpu.transforms.synsq import _synsq_impl
    bank = jnp.asarray(cwt_obj._bank)
    fre_arr = jnp.asarray(cwt_obj.fre_band_arr, jnp.float32)

    def run(x):
        W = _cwt_body(cwt_obj, x, bank, False, batch_axis, time_axis, mesh)
        out = _synsq_impl(W, fre_arr, scale_kind=kind, num=synsq_obj.num,
                          samplate=float(synsq_obj.samplate),
                          thresh=synsq_obj.thresh, order=synsq_obj.order)
        return jax.lax.with_sharding_constraint(
            out, _ns(mesh, batch_axis, None, time_axis))

    return jax.jit(_pin_native_fft(run),
        in_shardings=_ns(mesh, batch_axis, time_axis),
        out_shardings=_ns(mesh, batch_axis, None, time_axis))


def sharded_wsst_fn(wsst_obj, mesh: Mesh,
                    batch_axis: str = "data", time_axis: str = "time",
                    mode: str = "auto", interpret: bool = False):
    """Mesh-parallel WSST: (B, L) -> (squeezed, cwt), both (B, num, L).

    One jit shares the forward FFT between the plain and the derivative
    wavelet banks (the WSST's instantaneous frequency is the analytic
    Im(dCWT/CWT), ``wsst_algorithm.c``), keeps the whole squeeze pipeline
    band-partitioned, and re-shards over time.  Matches
    ``wsst_obj.wsst`` up to each output bin's reduction order.  In
    shard_map mode the squeezed output arrives time-sharded and the raw
    cwt band-sharded (both over ``time_axis``).
    """
    from audioflux_tpu.transforms.synsq import scale_kind
    kind = scale_kind(wsst_obj.scale_type)
    if _pick_smap(mode, _cwt_kernel_ok(wsst_obj._cwt, interpret)):
        return _smap_squeeze(wsst_obj._cwt, mesh, batch_axis, time_axis,
                             interpret=interpret, kind=kind,
                             num_out=wsst_obj.num,
                             samplate=float(wsst_obj.samplate),
                             thresh=wsst_obj.thresh,
                             order=wsst_obj.order, with_det=True)
    from audioflux_tpu.transforms.wsst import _squeeze
    cwt_obj = wsst_obj._cwt
    cwt_obj.enable_det(True)
    bank = jnp.asarray(cwt_obj._bank)
    det_bank = jnp.asarray(cwt_obj._det_bank)
    fre_arr = jnp.asarray(cwt_obj.fre_band_arr, jnp.float32)

    def run(x):
        D = _cwt_body(cwt_obj, x, bank, False, batch_axis, time_axis, mesh)
        dD = _cwt_body(cwt_obj, x, det_bank, True, batch_axis, time_axis,
                       mesh)
        sq = _squeeze(D, dD, fre_arr, scale_kind=kind, num=wsst_obj.num,
                      samplate=float(wsst_obj.samplate),
                      thresh=wsst_obj.thresh, order=wsst_obj.order)
        out_s = _ns(mesh, batch_axis, None, time_axis)
        return (jax.lax.with_sharding_constraint(sq, out_s),
                jax.lax.with_sharding_constraint(D, out_s))

    return jax.jit(_pin_native_fft(run),
        in_shardings=_ns(mesh, batch_axis, time_axis),
        out_shardings=(_ns(mesh, batch_axis, None, time_axis),
                       _ns(mesh, batch_axis, None, time_axis)))


# ---------------------------------------------------------------------------
# ST: bin-parallel gaussian-window IFFTs
# ---------------------------------------------------------------------------

def sharded_st_fn(obj, mesh: Mesh, batch_axis: str = "data",
                  time_axis: str = "time", mode: str = "auto"):
    """Mesh-parallel Stockwell transform: (B, L) -> (B, nbins, L).

    The per-bin shifted-spectrum IFFTs (``st_algorithm.c:262-286``) are
    partitioned over the bin axis; output time axis re-sharded over
    ``time_axis`` (GSPMD) or bin-sharded (shard_map twin, which keeps
    the four-step fft kernel tier enabled per shard).  Equal to
    ``obj.st`` to float rounding.
    """
    from audioflux_tpu.ops import pallas_fft as pfft
    if _pick_smap(mode, pfft.supports(obj.fft_length)):
        return _smap_st(obj, mesh, batch_axis, time_axis)
    from audioflux_tpu.transforms.st import _st_body
    windows = jnp.asarray(obj._windows)
    bins = jnp.asarray(obj.bin_arr)

    specs = {"in": (batch_axis, None),
             "bands": (batch_axis, time_axis, None),
             "out": (batch_axis, None, time_axis)}

    def annot(a, tag):
        return jax.lax.with_sharding_constraint(a, _ns(mesh, *specs[tag]))

    def run(x):
        return _st_body(x, windows, bins, obj.fft_length, annot=annot)

    return jax.jit(_pin_native_fft(run),
        in_shardings=_ns(mesh, batch_axis, time_axis),
        out_shardings=_ns(mesh, batch_axis, None, time_axis))


# ---------------------------------------------------------------------------
# FST: band-partitioned expansion (segment chain replicated by design)
# ---------------------------------------------------------------------------

def sharded_fst_fn(obj, mesh: Mesh, batch_axis: str = "data",
                   time_axis: str = "time", min_index: int = None,
                   max_index: int = None, mode: str = "auto"):
    """Mesh-parallel fast S-transform: (B, L) -> (B, nbins, L).

    Where the bytes are: the FST's compute is two FFT passes whose ragged
    dyadic segments SUM to L samples (``fst_algorithm.c:16-18`` — the
    2*radix2_exp segment lengths are 1,2,4,..,2^(R-1); total = L), so the
    whole segment chain is ~L complex values — replicating it costs less
    than one collective over it, and a uniform-length Bluestein rewrite
    (the NSGT treatment) would inflate its FLOPs by ~radix2_exp x (every
    segment padded to 2^(R-1)) to parallelize work that is already
    negligible.  The memory giant is the (nbins, L) reassignment
    expansion — its rows are independent band gathers, so THAT is what
    partitions over the mesh: each shard expands only its own bands, and
    the output arrives band-sharded over ``time_axis``.  Equal to
    ``obj.fst`` to float rounding (gather rows are disjoint; nothing
    reorders).
    """
    if min_index is None:
        min_index = obj.min_index
    if max_index is None:
        max_index = obj.max_index
    from audioflux_tpu.ops import pallas_fft as pfft
    if _pick_smap(mode, pfft.supports(obj.fft_length)):
        # shard_map twin: forward fft at L rides the kernel tier
        return _smap_fst(obj, mesh, batch_axis, time_axis,
                         min_index, max_index)

    specs = {"in": (batch_axis, None),
             "out": (batch_axis, time_axis, None)}

    def annot(a, tag):
        return jax.lax.with_sharding_constraint(a, _ns(mesh, *specs[tag]))

    def run(x):
        return obj._fst_impl(x, min_index=min_index, max_index=max_index,
                             annot=annot)

    return jax.jit(_pin_native_fft(run), in_shardings=_ns(mesh, batch_axis, time_axis),
                   out_shardings=_ns(mesh, batch_axis, time_axis, None))


# ---------------------------------------------------------------------------
# NSGT: uniform Bluestein band IDFTs (SPMD needs one shape for all bands)
# ---------------------------------------------------------------------------

def _nsgt_bluestein_consts(obj):
    """Per-band constants turning the ragged band IDFTs into one uniform
    batched pipeline.

    The single-chip NSGT buckets bands by window length and runs one
    ``ifft`` per distinct length — ragged shapes that SPMD cannot
    partition.  Rewriting each band's ln-point IDFT as a Bluestein chirp-z
    at one common power-of-two length gives every band the same shape, so
    the band axis becomes a plain batch axis for the mesh.
    """
    num = obj.num
    L = obj.fft_length
    lens = np.asarray(obj._lens, np.int64)
    max_ln = int(lens.max())
    Lc = 1
    while Lc < 2 * max_ln - 1:
        Lc *= 2

    # inverse-DFT Bluestein: e^{+2pi i km/ln} = chirp[k] chirp[m] b[m-k]
    # with chirp[k] = e^{+i pi k^2/ln}, b[j] = e^{-i pi j^2/ln}; so
    # cell = (chirp/ln) * ifft(fft(v * chirp, Lc) * fft(b_circ))[:max_ln]
    gather = np.zeros((num, max_ln), np.int64)
    weight = np.zeros((num, max_ln), np.float32)
    chirp = np.zeros((num, max_ln), np.complex64)
    post = np.zeros((num, max_ln), np.complex64)
    Bf = np.zeros((num, Lc), np.complex64)
    for i in range(num):
        ln = int(lens[i])
        off = obj._offsets[i]
        k = np.arange(ln)
        rolled = (k + ln // 2) % ln  # fold the center-to-bin-0 roll in
        gather[i, :ln] = np.clip(off + rolled, 0, L - 1)
        weight[i, :ln] = np.asarray(obj._windows[i])[rolled]
        c = np.exp(1j * np.pi * k * k / ln)
        chirp[i, :ln] = c
        post[i, :ln] = c / ln
        b = np.zeros(Lc, np.complex128)
        b[k] = np.conj(np.exp(1j * np.pi * k * k / ln))
        b[Lc - k[1:]] = b[k[1:]]  # b[-j] = b[j]
        Bf[i] = np.fft.fft(b).astype(np.complex64)
    expand = np.asarray(obj._expand, np.int64)
    # NUMPY, deliberately: eager jnp.asarray of the complex tables is a
    # host->device complex64 transfer, which the axon runtime cannot do
    # (found on chip — the consts builder crashed before any compute).
    # Callers fold them into traces (constants) or split real/imag.
    return gather, weight, chirp, post, Bf, expand, max_ln, Lc


def sharded_nsgt_fn(obj, mesh: Mesh, batch_axis: str = "data",
                    time_axis: str = "time", mode: str = "auto"):
    """Mesh-parallel NSGT: (B, 2**radix2_exp) -> (B, num, max_time_length).

    Band IDFTs run as uniform Bluestein chirp-z transforms partitioned over
    the band axis (see ``_nsgt_bluestein_consts``); the previous-sample-hold
    expansion (``nsgt_algorithm.c:578-600``) is a batched gather.  Matches
    ``obj.nsgt`` to Bluestein-vs-FFT float rounding (~1e-6 relative).

    Input replication is by design, not a residue: the NSGT consumes at
    most ``2**radix2_exp`` samples per call (its whole-signal FFT fixes
    that), i.e. <= 4 MB of f32 at the largest radix this backend's FFT
    takes — replicating it costs less than one collective over it, while
    the (B, num, max_ln) band matrix, which is num x larger, is what
    partitions.  Recordings longer than one window go through
    ``sharded_batch_fn`` over windows or the spliced schemes
    (``sharded_ccwt_fn``/``sharded_cst_fn``).
    """
    from audioflux_tpu.ops import pallas_fft as pfft
    # the twin pays off when either the signal fft at L or the batched
    # Bluestein band ffts at Lc (next pow2 >= 2*max_ln - 1) ride the
    # kernel tier per shard
    max_ln = int(np.max(np.asarray(obj._lens)))
    Lc = 1
    while Lc < 2 * max_ln - 1:
        Lc *= 2
    if _pick_smap(mode, pfft.supports(obj.fft_length)
                  or pfft.supports(Lc)):
        return _smap_nsgt(obj, mesh, batch_axis, time_axis)
    (gather, weight, chirp, post, Bf, expand, max_ln, Lc) = \
        _nsgt_bluestein_consts(obj)
    # The Bluestein inverse step needs only the first max_ln of the Lc
    # circular-convolution outputs, so it is a thin (Lc, max_ln) inverse-DFT
    # contraction — one MXU matmul on TPU instead of a second FFT pass (and
    # XLA:CPU's fft thunk RET_CHECKs on the layouts GSPMD feeds a chained
    # fft->elementwise->fft anyway).  All complex tables enter the trace
    # as f32 real/imag halves recombined in-graph (axon cannot move
    # complex64 across the host<->device boundary).
    jk = np.arange(Lc)[:, None] * np.arange(max_ln)[None, :]
    inv_r = (np.cos(2 * np.pi * jk / Lc) / Lc).astype(np.float32)
    inv_i = (np.sin(2 * np.pi * jk / Lc) / Lc).astype(np.float32)
    cpx = lambda a: jax.lax.complex(  # noqa: E731
        jnp.asarray(np.real(a).astype(np.float32)),
        jnp.asarray(np.imag(a).astype(np.float32)))

    def run(x):
        x = jax.lax.with_sharding_constraint(x, _ns(mesh, batch_axis, None))
        F = afft.fft(x, axis=-1)
        v = F[..., gather] * weight          # (B, num, max_ln)
        u = v * cpx(chirp)
        u = jax.lax.with_sharding_constraint(
            u, _ns(mesh, batch_axis, time_axis, None))
        U = afft.fft(u, n=Lc, axis=-1)
        conv = jnp.einsum("...l,lk->...k", U * cpx(Bf),
                          jax.lax.complex(jnp.asarray(inv_r),
                                          jnp.asarray(inv_i)),
                          precision=_HIGHEST)
        cells = conv * cpx(post)             # (B, num, max_ln)
        rows = jnp.take_along_axis(
            cells, jnp.broadcast_to(expand, cells.shape[:-2] + expand.shape),
            axis=-1)
        return jax.lax.with_sharding_constraint(
            rows, _ns(mesh, batch_axis, time_axis, None))

    return jax.jit(_pin_native_fft(run),
        in_shardings=_ns(mesh, batch_axis, time_axis),
        out_shardings=_ns(mesh, batch_axis, time_axis, None))


# ---------------------------------------------------------------------------
# CQT: frame-parallel octave recursion
# ---------------------------------------------------------------------------

def sharded_cqt_fn(obj, mesh: Mesh, batch_axis: str = "data",
                   time_axis: str = "time", mode: str = "auto"):
    """Mesh-parallel CQT/VQT: (B, n) -> complex64 (B, num, T).

    The multirate downsample chain (log2(octaves) sequential resamples of
    the whole signal) is replicated — it is a tiny sinc filter; the per-
    octave frame rfft + complex kernel einsum, where the FLOPs live, is
    partitioned over the frame axis.  Output time axis sharded over
    ``time_axis``.  Equal to ``obj.cqt`` to float rounding (the einsum is
    batched per frame, so partitioning does not reorder any reduction).

    Signal replication is deliberate: per chip it costs n f32 samples
    (an hour of 32 kHz audio = 0.46 GB against 16 GB v5e HBM), while the
    framed expansion — fft_length/slide_length x larger, the actual
    memory giant — stays sharded.  Communicating the signal instead
    would trade one broadcast for per-octave halo exchanges at every
    level of the downsample chain.
    """
    if obj.is_continue:
        raise ValueError("sharded_cqt_fn does not support is_continue mode")
    from audioflux_tpu.ops import pallas_fft as pfft
    if _pick_smap(mode, pfft.supports(obj.fft_length)):
        return _twin_or_auto(
            mode, _smap_cqt_batch(obj, mesh, batch_axis, time_axis),
            lambda: sharded_cqt_fn(obj, mesh, batch_axis, time_axis,
                                   mode="gspmd"),
            int(mesh.shape[batch_axis]) * int(mesh.shape[time_axis]))

    # the exact single-chip graph (CQTBase._cqt_impl), annotated: the
    # per-octave frame rfft + kernel einsum (where the FLOPs live)
    # partitions over the frame axis; the tiny resample chain replicates.
    # Output sharded by constraint, not out_shardings — CQT frame counts
    # are rarely divisible by the mesh (GSPMD pads internally).
    specs = {"signal": (batch_axis, None),
             "frames": (batch_axis, time_axis, None),
             "out": (batch_axis, None, time_axis)}

    def annot(a, tag):
        return jax.lax.with_sharding_constraint(a, _ns(mesh, *specs[tag]))

    jitted = jax.jit(
        _pin_native_fft(lambda x, sv: obj._cqt_impl(x, sv, annot=annot)),
        in_shardings=(_ns(mesh, batch_axis, time_axis), None))

    # scale_vec enters as a traced operand evaluated per call, so a later
    # obj.set_scale() toggle is honored exactly like CQT.cqt (no retrace)
    return lambda x: jitted(jnp.asarray(x, jnp.float32),
                            jnp.asarray(obj._scale_vec()))


# ---------------------------------------------------------------------------
# ccwt: genuinely time-sharded long-recording CWT (ppermute halo windows)
# ---------------------------------------------------------------------------

def _spliced_sharded_fn(transform, L, mesh: Mesh, batch_axis: str,
                        time_axis: str):
    """Time-sharded half-overlap window splice (the ccwt scheme), generic
    over the per-window transform.

    ``transform`` maps windows (B?, W, L) -> (B?, W, num, L); the splice
    keeps each window's middle half (first head / last tail).  Each time
    shard owns ``m = block/step`` windows; the two windows straddling its
    block edges need ``step = L/2`` samples of left halo and ``L - step``
    of right halo, fetched over ICI with ``ppermute`` — input, per-window
    compute, and the (num, n) output all stay sharded over time, so
    recordings that do not fit one chip's HBM stream through the mesh.

    Constraint: the per-shard block length n // P must be a multiple of
    ``step``.
    """
    win_len = L // 4
    step = win_len * 2
    n_time = int(mesh.shape[time_axis])

    def local(x_loc):  # (B?, M)
        M = x_loc.shape[-1]
        if M % step:
            raise ValueError(f"per-shard length {M} must be a multiple of "
                             f"fft_length//2 = {step}")
        m = M // step
        if n_time * m < 2:
            # match ccwt's own minimum (cwt.py ccwt: win_count >= 1 needs
            # n >= 2*step); clipping below would silently splice the
            # wrap-around halo instead
            raise ValueError(
                f"signal too short for sharded ccwt: {n_time * M} samples "
                f"< {2 * step}")
        # halos: window jm-1 starts one step left of the block; window
        # jm+m-1 extends fft-step past its right edge
        perm_l = [((i + 1) % n_time, i) for i in range(n_time)]
        perm_r = [(i, (i + 1) % n_time) for i in range(n_time)]
        left = jax.lax.ppermute(x_loc[..., -step:], time_axis, perm_r)
        right = jax.lax.ppermute(x_loc[..., :L - step], time_axis, perm_l)
        ext = jnp.concatenate([left, x_loc, right], axis=-1)  # (B?, M + L)

        j = jax.lax.axis_index(time_axis)
        jm = j * m
        wc = n_time * m - 1  # global window count (ccwt: n // step - 1)
        t_idx = jnp.arange(m + 1)
        g = jnp.clip(jm - 1 + t_idx, 0, wc - 1)  # global window ids
        offs = (g - (jm - 1)) * step             # start in ext

        # gather the m+1 windows: (B?, m+1, L)
        base = offs[:, None] + jnp.arange(L)[None, :]
        frames = ext[..., base]
        spec = transform(frames)  # (B?, m+1, num, L)

        first = jnp.where(j == 0, spec[..., 0, :, 0:win_len],
                          spec[..., 0, :, 2 * win_len:3 * win_len])
        last = jnp.where(j == n_time - 1,
                         spec[..., m, :, 3 * win_len:4 * win_len],
                         spec[..., m, :, win_len:2 * win_len])
        mid = spec[..., 1:m, :, win_len:3 * win_len]  # (B?, m-1, num, 2win)
        mid = jnp.moveaxis(mid, -3, -2)               # (B?, num, m-1, 2win)
        mid = mid.reshape(mid.shape[:-2] + (-1,))     # (B?, num, (m-1)*2win)
        return jnp.concatenate([first, mid, last], axis=-1)  # (B?, num, M)

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(batch_axis, time_axis),
        out_specs=P(batch_axis, None, time_axis),
        check_vma=False)  # the per-window transform may run a Pallas
        # kernel on TPU, whose outputs carry no vma info

    # shard_map body: each shard executes its own kernels — no GSPMD
    # partitioning question, so the fft kernel tier stays enabled
    return jax.jit(smapped)


def sharded_ccwt_fn(obj, mesh: Mesh, batch_axis: str = "data",
                    time_axis: str = "time"):
    """Time-sharded continuous CWT over long recordings.

    The reference splices half-overlapped fft-length CWT windows
    (``python/audioflux/cwt.py:280-320``; ``ccwt`` here mirrors it) —
    see ``_spliced_sharded_fn`` for the distribution scheme.  Equal to
    ``obj.ccwt`` up to float rounding (the same windows are computed,
    just distributed; edge shards recompute one window instead of
    branching).
    """
    bank = jnp.asarray(obj._bank)
    return _spliced_sharded_fn(
        lambda frames: obj._run(frames, bank, det=False),
        obj.fft_length, mesh, batch_axis, time_axis)


def sharded_cst_fn(obj, mesh: Mesh, batch_axis: str = "data",
                   time_axis: str = "time"):
    """Time-sharded continuous Stockwell transform over long recordings.

    The exact single-window ST is inherently global — its gaussian
    frequency windows act on the FFT of the *whole* window
    (``st_algorithm.c:31-39``), so a lone ST window cannot be computed
    from a fragment of it.  For recordings longer than one window this
    applies the same half-overlap splice as the long-signal CWT to the
    fft-length ST (``ST.cst``), distributed so input, per-window compute,
    and output all stay time-sharded — an S-transform for recordings
    larger than one chip's HBM.  Equal to ``obj.cst`` up to float
    rounding; the bin-0 mean row is the per-window mean (cst semantics).
    """
    from audioflux_tpu.transforms.st import _st_body
    windows = jnp.asarray(obj._windows)
    bins = jnp.asarray(obj.bin_arr)
    return _spliced_sharded_fn(
        lambda frames: _st_body(frames, windows, bins, obj.fft_length),
        obj.fft_length, mesh, batch_axis, time_axis)


# ---------------------------------------------------------------------------
# generic batch-of-files data parallelism
# ---------------------------------------------------------------------------

def sharded_batch_fn(fn, mesh: Mesh, batch_axis: str = "data"):
    """Shard any leading-batch transform over the ``data`` mesh axis.

    ``fn`` maps (B, ...) -> pytree of arrays whose leading axis is B (every
    transform and MIR pipeline here is batched by construction).  The
    returned callable runs it with the batch partitioned across
    ``batch_axis`` — the batch-of-files configuration (SURVEY §2.10 row 1).
    Bit-equal to the unsharded ``fn``: partitioning a batch axis reorders
    nothing.

    Pass an UN-jitted graph builder: this wrapper traces ``fn`` under the
    native-fft pin (see ``_pin_native_fft``); a callable that was already
    traced elsewhere reuses its cached jaxpr — Pallas custom calls and
    all — and GSPMD may replicate those kernels on a real pod.  For
    kernel-bearing pipelines prefer :func:`sharded_batch_map_fn`, which
    needs no pin at all.
    """
    def run(x):
        x = jax.lax.with_sharding_constraint(
            x, _ns(mesh, *([batch_axis] + [None] * (x.ndim - 1))))
        out = fn(x)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, _ns(mesh, *([batch_axis] + [None] * (a.ndim - 1)))), out)

    return jax.jit(_pin_native_fft(run))


def sharded_batch_map_fn(fn, mesh: Mesh, batch_axis: str = "data"):
    """``sharded_batch_fn`` via ``shard_map``: ``fn`` runs once per shard
    on its local batch slice.

    Prefer this form when ``fn``'s TPU path contains Pallas kernels
    (the fused spectrogram, the four-step fft family, medians): GSPMD
    treats a ``pallas_call`` as an opaque custom call and may replicate
    it — all-gathering the operand — whereas ``shard_map`` guarantees
    each chip executes the kernel on exactly its own batch slice.
    Requires the leading batch to divide the mesh's ``batch_axis`` size;
    bit-equal to the unsharded ``fn`` (batch partitioning reorders
    nothing).
    """
    n_b = int(mesh.shape[batch_axis])

    def run(x):
        if x.shape[0] % n_b:
            raise ValueError(f"batch {x.shape[0]} must divide the "
                             f"'{batch_axis}' mesh axis ({n_b})")
        smapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=P(batch_axis),
            out_specs=P(batch_axis),
            check_vma=False)  # Pallas outputs carry no vma info
        return smapped(x)

    # shard_map body: kernels run per shard by construction
    return jax.jit(run)
