"""Batched flat scatter-add used by reassign/synsq/wsst.

``x.at[..., idx].add(v)`` with a batched ``idx`` performs an outer gather
(every batch scatters into every batch), so batched reassignment needs
explicit per-batch index offsets into one flattened buffer with a trash
slot per batch for dropped cells.

On TPU, XLA lowers duplicate-index ``scatter-add`` to a *serialized*
update loop (~36 ms for a 1000x2049 reassignment batch; a sort+
segmented-scan alternative measured 10x worse — TPU sorts are slow).
For moderate grids ``batched_scatter_add`` instead bins on the MXU via a
radix split of the target index: f = 32*hi + lo, out2d[hi, lo] =
sum_j v_j [hi_j==hi][lo_j==lo], computed as 32 masked value lanes
contracted against one shared hi one-hot — dense, parallel, exact in
float32 (the one-hot is 0/1 so bf16 storage loses nothing).  Large grids
fall back to the XLA scatter.

Layout note (measured r4, 8000x2049 -> 2049 bins on chip): the one-hot is
generated TRANSPOSED, (n_hi, j) with n_hi on the 8-padded sublane dim and
the contracted j on lanes.  The natural (j, n_hi) layout puts n_hi on the
128-padded LANE dim — at radix 16 that's 129 -> 256 lanes, half the
generation work wasted on pad.  Radix sweep at that shape (transposed,
bf16 one-hot, HIGHEST): R16 18.5 ms, R32 14.0, R64 15.9, R128 47.6 —
radix 32 balances one-hot generation (n*n_hi compares) against the
masked-lane selects (radix*n per payload).  bf16 vs f32 one-hot is
bit-identical under HIGHEST (0/1 is exact in bf16) and slightly faster.
A bf16x3 manual value split (3 MXU passes instead of HIGHEST's 6) is NOT
safe here: XLA's algebraic simplifier elides the f32->bf16->f32 convert
round-trip, collapsing the residual chunks to zero (measured 2.1e-3 rel
err — the same simplifier behavior CLAUDE.md records for FMA fences).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batched_scatter_add", "columnar_scatter_add",
           "reassign_blocked_scatter_add"]

_RADIX = 32  # shift derived in _radix_bin_add (int(log2(radix)))
# grid sizes above this use the XLA scatter fallback: the hi one-hot is
# (batch, out_size/32, n) and stops paying for itself once it spills HBM
_RADIX_MAX_OUT = 8192


def columnar_scatter_add(values, fi, out_size: int):
    """Per-column scatter-add: ``out[..., f, t] = sum over i with
    fi[..., i, t] == f of values[..., i, t]``; out-of-range rows drop.

    TPU-friendly form of the synchrosqueezing reassignment: XLA's
    ``scatter-add`` serializes duplicate indices on TPU, while this
    contracts a one-hot membership tensor on the MXU.  Intended for
    moderate ``out_size`` (the one-hot is out_size x n per column).
    """
    # NOTE (measured, don't retry): a bf16 one-hot + bf16x3 value split
    # looks cheaper on paper (3 MXU passes vs HIGHEST's 6) but the dtype
    # convert breaks XLA's producer fusion of the one-hot into the dot —
    # the (out, in, T) one-hot materializes to HBM and the synsq bench row
    # got 3x SLOWER.  Dropping to Precision.HIGH (BF16_3X: 2-term splits
    # of BOTH operands, ~2^-16 relative) was also measured: it saved only
    # ~0.1 ms end-to-end (the one-hot generation VPU work dominates, not
    # the MXU passes) while costing ~7 bits of accumulation accuracy the
    # CPU-forced tests cannot see — keep full HIGHEST.
    # NOTE (measured, don't retry): contracting re/im in ONE einsum over a
    # trailing component axis ("...fit,...itc->...ftc" on stacked values)
    # to share the one-hot generation made the synsq bench row 1.5x
    # SLOWER (19.6 -> 30.4 ms) — the stack/relayout plus the 2-wide
    # batched dot cost more than the saved second one-hot pass.  A radix
    # split (f = 8*hi + lo, "...hit,...qit->...hqt" with a lo-masked
    # value tensor) promises 4x less one-hot generation but measured 2x
    # SLOWER (16.1 vs 8.6 ms/payload): the (B, 8, in, T) masked
    # intermediate materializes and only one of the two data-dependent
    # producers fuses into the dot.  (r5) An offset-banded decomposition
    # (out = sum_d shift(v*[fi-band == d], d) — elementwise, no MXU
    # passes; the trick that won for long-recording reassignment below)
    # needs the band->bin map near-diagonal, and the synsq map on the
    # bench's NOISE clips is not: 23% of scattered cells land beyond
    # +-2 bands, 8.3% beyond +-4 (instantaneous frequency of noise is
    # broadband), so the exact rank-compacted tail (serialized cost
    # ∝ outliers, ~3.5M updates at the bench shape) would cost ~5x the
    # einsum it replaces.  Viable only for tonal content; not routed.  The current form runs at ~half VPU
    # peak on the compare/select generation — near-roofline for this
    # algorithm.  (r4) Three Pallas VMEM-resident kernel forms also
    # measured 22-27% SLOWER than this einsum on the real chip — see
    # ops/pallas_scatter.py's dead-end note; this path is final.
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


def _radix_bin_add(payloads, idx, out_size: int, radix: int = _RADIX):
    """MXU binning of flat indices (module docstring). payloads: list of
    (nb, n) float32; idx: (nb, n) int32 with out_size as the trash value.
    Returns list of (nb, out_size).  ``radix`` trades one-hot generation
    (n_hi = out/radix rows of compares) against masked-lane selects
    (radix per payload) — 32 won the r4 sweep at out 2049; wider local
    grids (the blocked reassign halo, out ~18k) shift the balance.

    NOTE (measured r5, don't retry): packing BOTH payloads' masked lanes
    into one dot (concat on q -> 2*radix output lanes, sharing the lane
    mask) looked like a 2x lane-fill win for the two big halo einsums
    (trace: 14.9 ms each at R64, lanes only half full), but R32-packed
    measured 83.7 ms vs 76.5 separate-R64 end-to-end, and R64/R128
    packed consistently CRASH the axon remote compiler (HTTP 500) — the
    sublane concat materializes and breaks the one-hot producer fusion,
    the same class as r3's stacked re/im columnar regression."""
    n_hi = (out_size + radix) // radix  # ceil over grid incl. trash slot
    grid = n_hi * radix
    lo = idx & (radix - 1)
    hi = idx >> int(np.log2(radix))
    # transposed one-hot (n_hi on sublanes, contracted j on lanes) — see
    # the module docstring's layout note for the measured sweep
    oh_hi = (hi[..., None, :] == jnp.arange(n_hi, dtype=idx.dtype)[:, None]
             ).astype(jnp.bfloat16)  # (nb, n_hi, n), 0/1 exact in bf16
    lanes = lo[..., None, :] == jnp.arange(radix, dtype=idx.dtype)[:, None]
    outs = []
    for v in payloads:
        s = jnp.where(lanes, v[..., None, :], 0.0)  # (nb, RADIX, n)
        out2d = jnp.einsum("...qj,...aj->...aq", s, oh_hi,
                           precision=jax.lax.Precision.HIGHEST)
        outs.append(out2d.reshape(v.shape[0], grid)[:, :out_size])
    return outs


def _xla_scatter_add(payloads, idx, out_size: int):
    """Duplicate-index XLA scatter fallback (serialized on TPU, but the
    only static-shape option once the radix one-hot outgrows HBM)."""
    nb, n = idx.shape
    stride = out_size + 1  # one trash slot per batch
    offs = jnp.arange(nb, dtype=idx.dtype)[:, None] * stride
    flat_i = (idx + offs).reshape(-1)
    outs = []
    for v in payloads:
        flat = jnp.zeros((nb * stride,), v.dtype)
        flat = flat.at[flat_i].add(v.reshape(-1))
        outs.append(flat.reshape(nb, stride)[:, :out_size])
    return outs


# --- long-recording reassignment scatter -----------------------------------
#
# A 30 s recording reassigns into T*m ~ 2M bins — far past _RADIX_MAX_OUT,
# where the flat path falls back to the serialized XLA loop.  But the
# reassignment index is NEAR-DIAGONAL in time: the time correction is the
# local group delay, bounded by the window half-length (fft/(2*slide) ~ 2
# frames) for well-conditioned cells.  Measured on 30 s clips (chirp+tone+
# noise / pure noise / impulse trains): >= 99.2% of cells land within +-4
# frames of home; the rest (low-power cells whose Sth/Sh ratio blows up,
# 0.6-0.8%) scatter arbitrarily far.
#
# The blocked path is EXACT and exploits this:
#  1. per home frame, cells within the +-W halo radix-bin into a local
#     (2W+1)*m grid (n_hi ~ (2W+1)*m/RADIX one-hot rows per frame — bounded
#     regardless of T) and overlap-add into the global grid with 2W+1
#     shifted adds;
#  2. tail cells compact by per-frame RANK — itself a tiny radix pass
#     (ranks are unique per frame, so each of the K slots receives exactly
#     one cell; the flat target index rides along as two exact-in-f32
#     payloads hi=idx>>12 / lo=idx&4095) — and the <= T*K compacted updates
#     go through the serialized scatter at ~1/60 of the full update count;
#  3. if any frame overflows the K-slot budget (never observed below K=256,
#     impulse trains peak at 192), a lax.cond falls back to the serialized
#     scatter over the full tail — exactness never depends on the budget.
#  W sweep (chip, (8, 934, 2049) with the measured offset mix + 0.8%
#  far outliers, R64): W=2/4/6/8 = 92.8/76.5/94.0/110.4 ms — W=2's
#  narrower halo loses more to its 3x outlier tail than it saves in
#  one-hot generation; W>=6 pays pure generation for cells that do not
#  exist.  W=4 is the optimum and matches the group-delay bound
#  (fft/(2*slide) = 2 frames) with 2x slack.
_REASSIGN_W = 4
_REASSIGN_K = 256


def reassign_blocked_scatter_add(values, ti, fi, ok, *, T: int, m: int,
                                 W: int = _REASSIGN_W, K: int = _REASSIGN_K,
                                 halo_radix: int = 64):
    # halo_radix=64: measured on chip at (8, 934, 2049) — the halo grid
    # ((2W+1)*m ~ 18k bins) is 9x wider than the flat path's 2049, which
    # shifts the generation/select balance one radix step up: R32/64/128
    # = 88.7/76.5/93.8 ms standalone (the flat batched_scatter_add keeps
    # its measured R32).  The clean (no-outlier) path measured 52.5 ms —
    # the lax.cond tail skip is worth ~24 ms when every cell is in-halo.
    """Exact (T, m)-grid scatter-add for near-diagonal time indices.

    values: (..., T, C) complex64 or float32 cells grouped by home frame;
    ti/fi: int32 target frame/bin per cell; ok: bool scatter mask.
    Returns (..., T, m).  Identical sums to the flat scatter up to
    addition order (the halo pass accumulates on the MXU at HIGHEST).
    """
    batch = values.shape[:-2]
    C = values.shape[-1]
    nb = int(np.prod(batch)) if batch else 1
    cpx = jnp.iscomplexobj(values)
    pay = ([jnp.real(values), jnp.imag(values)] if cpx
           else [values.astype(jnp.float32)])
    pay = [p.reshape(nb, T, C).astype(jnp.float32) for p in pay]
    ti = ti.reshape(nb, T, C)
    fi = fi.reshape(nb, T, C)
    ok = (ok.reshape(nb, T, C) & (ti >= 0) & (ti < T)
          & (fi >= 0) & (fi < m))

    d = ti - jnp.arange(T, dtype=ti.dtype)[:, None]
    inl = ok & (jnp.abs(d) <= W)
    Lg = (2 * W + 1) * m

    # 1. halo pass: per-frame local radix bins, then 2W+1 shifted adds
    li = jnp.where(inl, (d + W) * m + fi, Lg)
    loc = _radix_bin_add([p.reshape(nb * T, C) for p in pay],
                         li.reshape(nb * T, C), Lg, radix=halo_radix)
    loc = [l.reshape(nb, T, 2 * W + 1, m) for l in loc]

    def _ola(l):
        out = l[:, :, W]  # d = 0 plane
        for p in range(2 * W + 1):
            ds = p - W
            if ds == 0 or abs(ds) >= T:
                continue
            src = l[:, :, p]
            if ds > 0:   # contributions of frame t to frame t+ds
                out = out + jnp.pad(src[:, :T - ds],
                                    ((0, 0), (ds, 0), (0, 0)))
            else:
                out = out + jnp.pad(src[:, -ds:],
                                    ((0, 0), (0, -ds), (0, 0)))
        return out

    outs = [_ola(l) for l in loc]

    # 2. tail: rank-compact the outliers (ranks are unique per frame, so
    # the compaction is itself a tiny radix pass), then a SECOND grouped
    # compaction squeezes the per-frame slot waste (avg outliers/frame
    # ~16 << K) before the serialized scatter — measured: the first
    # chip run spent ~40 ms of its 136 ms scattering mostly-empty K
    # slots; grouped level 2 cuts tail updates ~8x
    outl = ok & (jnp.abs(d) > W)
    gidx = ti * m + fi

    def _with_tail(_):
        cnt = jnp.cumsum(outl.astype(jnp.int32), axis=-1)
        overflow = jnp.any(cnt[..., -1] > K)
        rank = jnp.where(outl, cnt - 1, K)  # K = trash slot
        hi = (gidx >> 12).astype(jnp.float32)
        lo = (gidx & 4095).astype(jnp.float32)
        comp = _radix_bin_add(
            [p.reshape(nb * T, C) for p in pay]
            + [hi.reshape(nb * T, C), lo.reshape(nb * T, C)],
            rank.reshape(nb * T, C), K)
        # every slot holds exactly <= 1 cell, so the f32 index payloads
        # are exact integers (hi < T*m/4096 and lo < 4096, both << 2**24)

        # level 2: re-rank the used slots within groups of G frames
        # (budget K2 slots per group — linear in T, unlike one global
        # rank).  A slot whose value payloads are all exactly zero
        # contributes nothing and may drop.
        G, K2 = 64, 2048
        ng = -(-T // G)
        padn = ng * G * K - T * K

        def _grp(a):
            a = a.reshape(nb, T * K)
            if padn:
                a = jnp.pad(a, ((0, 0), (0, padn)))
            return a.reshape(nb * ng, G * K)

        comp_g = [_grp(c) for c in comp]
        used = jnp.zeros_like(comp_g[0], bool)
        for c in comp_g[:-2]:
            used = used | (c != 0.0)
        cnt2 = jnp.cumsum(used.astype(jnp.int32), axis=-1)
        overflow2 = jnp.any(cnt2[..., -1] > K2)
        rank2 = jnp.where(used, cnt2 - 1, K2)
        comp2 = _radix_bin_add(comp_g, rank2, K2)
        cidx2 = ((comp2[-2].astype(jnp.int32) << 12)
                 | comp2[-1].astype(jnp.int32))
        # empty slots carry value 0 at index 0 — a harmless += 0.0

        def _tail2(_):
            return tuple(_xla_scatter_add(
                [c.reshape(nb, ng * K2) for c in comp2[:-2]],
                cidx2.reshape(nb, ng * K2), T * m))

        def _tail1(_):
            cidx = ((comp[-2].astype(jnp.int32) << 12)
                    | comp[-1].astype(jnp.int32))
            return tuple(_xla_scatter_add(
                [c.reshape(nb, T * K) for c in comp[:-2]],
                cidx.reshape(nb, T * K), T * m))

        def _full_tail(_):
            idxo = jnp.where(outl, gidx, T * m).reshape(nb, T * C)
            return tuple(_xla_scatter_add(
                [jnp.where(outl, p, 0.0).reshape(nb, T * C) for p in pay],
                idxo, T * m))

        def _compacted(_):
            return jax.lax.cond(overflow2, _tail1, _tail2, None)

        ts = jax.lax.cond(overflow, _full_tail, _compacted, None)
        return tuple(o + t.reshape(nb, T, m) for o, t in zip(outs, ts))

    # zero-outlier fast path (steady-state audio: every cell inside the
    # halo) skips the whole compaction+serialized tail
    outs = jax.lax.cond(jnp.any(outl), _with_tail,
                        lambda _: tuple(outs), None)

    out = outs[0] + 1j * outs[1] if cpx else outs[0].astype(values.dtype)
    return out.reshape(batch + (T, m))


def batched_scatter_add(values, flat_idx, out_size: int):
    """Scatter-add ``values`` into per-batch buffers of ``out_size`` slots.

    values, flat_idx: (..., n); indices outside [0, out_size) are dropped.
    Returns (..., out_size).

    Complex values ride the same index tensor as two float32 payloads:
    TPU's complex64 scatter lowers ~10x slower than float32, and the
    radix-matmul path is real-valued by construction.
    """
    batch_shape = values.shape[:-1]
    n = values.shape[-1]
    idx = flat_idx.reshape(-1, n).astype(jnp.int32)
    # out-of-range -> trash slot
    idx = jnp.where((idx >= 0) & (idx < out_size), idx, out_size)
    if jnp.iscomplexobj(values):
        payloads = [jnp.real(values).reshape(-1, n).astype(jnp.float32),
                    jnp.imag(values).reshape(-1, n).astype(jnp.float32)]
    else:
        payloads = [values.reshape(-1, n).astype(jnp.float32)]

    if out_size <= _RADIX_MAX_OUT:
        outs = _radix_bin_add(payloads, idx, out_size)
    else:
        outs = _xla_scatter_add(payloads, idx, out_size)

    if jnp.iscomplexobj(values):
        out = outs[0] + 1j * outs[1]
    else:
        out = outs[0].astype(values.dtype)
    return out.reshape(batch_shape + (out_size,))
