"""Batched four-step FFT kernels for mid-size transforms (n = n1 * 128).

XLA's native TPU FFT custom-call runs far off the HBM roofline at the
batched mid sizes this library lives on (measured r4 on the v5e: 15000
rfft-2048 ≈ 8 ms of real kernel time for ~250 MB of traffic — ~20x off
the ~615 GB/s streaming rate, and the four-step as plain XLA einsums is
no better because every stage round-trips HBM).  This module computes the
same transforms as two MXU matmul stages entirely in VMEM, the same
recipe as ``ops/pallas_cwt.py`` (Karatsuba complex products, bf16x3 dots,
~2e-6 relative accuracy — the fused-kernel contract).

Factorization (n = n1 * n2, n2 = 128 lanes, W = e^{-2pi i/n}):

    t = 128*t1 + t2,  k = k1 + n1*k2
    X[k1 + n1*k2] = sum_t2 E2[t2,k2] * TW[k1,t2] * sum_t1 E1[k1,t1] x2[t1,t2]

with x2 = the free (n1, 128) reshape of the natural row.  The output
arrives as D[k1, k2] — the **T-layout**: bin k1 + n1*k2 at [k1, k2].
The matching inverse core contracts lanes first and returns natural
order, so fft -> elementwise -> ifft round trips (YIN autocorrelation,
HPSS mask resynthesis, reassignment corrections) never pay an XLA
transpose in either direction; only consumers that need natural bin
order call :func:`t_to_natural` (one (…, 128, n1) relayout).

Exposed entry points (all shapes (..., n) / (..., n1, 128)):

* ``fft4_fwd(xr, xi=None)``        natural -> T-layout spectrum
* ``fft4_inv(yr, yi, out_imag=)``  T-layout spectrum -> natural signal
  (the exact inverse of ``fft4_fwd``; 1/n folded into the constants)
* ``t_to_natural / natural_to_t``  layout converters (XLA transpose)
* ``supports(n)``                  pow2, 2048 <= n <= 32768, TPU backend

Gated to the TPU backend; CPU callers keep ``jnp.fft`` so golden
fixtures are unaffected (reference: the transforms that ride this —
``src/mir/hpss_algorithm.c:233-330``, ``src/mir/_pitch_yin.c:330-430``,
``src/reassign_algorithm.c`` — hold their documented tolerances).

Multi-chip note: a ``pallas_call`` inside a GSPMD-constrained graph is
an opaque custom call — XLA partitions it along dims it can infer and
otherwise replicates (correct, but it all-gathers the operand).  The
``parallel/`` wrappers that need guaranteed partitioning run their
kernels inside ``shard_map`` bodies (the ccwt/cst pattern); the
GSPMD-constraint wrappers are batch-sharded on the kernel's leading
grid dim, which XLA propagates through custom-call batch dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fft4_fwd", "fft4_inv", "t_to_natural", "natural_to_t",
           "supports"]

_N2 = 128

# test hook: when True every kernel invocation runs in Pallas interpret
# mode (CPU-executable), letting the CPU test suite drive the generic
# ops/fft.py glue (hermitian extension, layout converters, axis moves)
# through the kernel path.  Only read at trace time by EAGER calls —
# production callers sit inside jits that resolve supports() instead.
# ACCURACY CAVEAT: the ~5e-5 contract holds for interpret mode on the
# XLA:CPU backend and for the real Mosaic kernel on chip.  Interpret mode
# lowered FOR the TPU/axon backend degrades to bf16-level error (~3e-3
# rel, measured) — XLA's simplifier elides the manual bf16 hi/lo splits.
# Tests force the CPU backend (conftest); don't set this on a TPU host.
FORCE_INTERPRET = False


def supports(n: int) -> bool:
    """pow2 n in [2048, 32768] on the TPU backend (n1 = n/128 >= 16
    keeps the sublane stage MXU-shaped; 65536+ belongs to the CWT-style
    per-band kernels)."""
    if n & (n - 1) or not (2048 <= n <= 32768):
        return False
    from audioflux_tpu.ops.backend import on_tpu
    return on_tpu()


def _tile(n1: int) -> int:
    # VMEM per row ~ n1*128*4B per component; keep a tile ~2-4 MB/comp
    return max(8, 4096 // n1)


def _pick_tile_b(B: int, t0: int) -> int:
    """Batch tile: prefer an exact divisor of B near the VMEM target.

    A non-dividing tile costs a pad + per-output slice around the
    pallas_call — measured on a device trace at (8000, 4096): the kernel
    itself ran 0.72 ms (at the max(MXU, HBM) floor) while pad + 2 output
    slices + copy burned ~1.6 ms, 70% of the dispatch.  A divisor in
    [t0/2, t0] keeps VMEM within target and deletes all four relayouts;
    B <= t0 runs as one block (padding small batches UP to the tile was
    pure wasted kernel work)."""
    if B <= t0:
        return B
    if B % t0 == 0:
        return t0
    for t in range(t0 - 1, max(8, t0 // 2) - 1, -1):
        if B % t == 0:
            return t
    return t0  # no divisor in range: keep the pad path


@functools.lru_cache(maxsize=None)
def _consts(n: int, inverse: bool):
    """numpy constants (never jnp — module caches must not hold tracers):
    E1 (n1, n1), TW (n1, 128), E2 (128, 128), each split bf16 hi/lo."""
    import ml_dtypes

    n1 = n // _N2
    sgn = 2.0 * np.pi if inverse else -2.0 * np.pi
    a1 = sgn * np.outer(np.arange(n1), np.arange(n1)) / n1
    at = sgn * np.outer(np.arange(n1), np.arange(_N2)) / n
    a2 = sgn * np.outer(np.arange(_N2), np.arange(_N2)) / _N2
    e1r, e1i = np.cos(a1), np.sin(a1)
    e2r, e2i = np.cos(a2), np.sin(a2)
    if inverse:
        e2r, e2i = e2r / n, e2i / n  # 1/n on the lane stage
    twr = np.cos(at).astype(np.float32)
    twi = np.sin(at).astype(np.float32)

    def split(a):
        a32 = a.astype(np.float32)
        hi = a32.astype(ml_dtypes.bfloat16)
        lo = (a32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return hi, lo

    e1 = [*split(e1r), *split(e1i), *split(e1r + e1i)]
    e2 = [*split(e2r), *split(e2i), *split(e2r + e2i)]
    return n1, e1, e2, twr, twi


def _split_rt(x):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _dotM(ah, al, x, n1):
    """Middle-dim contraction G[b,k,l] = sum_t A[k,t] x[b,t,l]; the
    constant is broadcast across the tile (folded into the dot by
    Mosaic), runtime operand split bf16x2 -> 3 dots (bf16x3 contract)."""
    b = x.shape[0]
    xh, xl = _split_rt(x)
    abh = jnp.broadcast_to(ah[...], (b,) + ah.shape)
    abl = jnp.broadcast_to(al[...], (b,) + al.shape)
    dn = (((2,), (1,)), ((0,), (0,)))
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          preferred_element_type=jnp.float32)
    return d(abh, xh) + d(abh, xl) + d(abl, xh)


def _dotL(x, bh, bl):
    """Lane contraction D[r,m] = sum_l x[r,l] B[l,m] on merged rows."""
    sh = x.shape
    x2 = x.reshape(-1, sh[-1])
    xh, xl = _split_rt(x2)
    d = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)
    out = d(xh, bh[...]) + d(xl, bh[...]) + d(xh, bl[...])
    return out.reshape(sh[:-1] + (out.shape[-1],))


def _cmul3(fr_, fi_, fs_, xr, xi, dot):
    """Karatsuba complex product via three real contractions.
    fr_/fi_/fs_ are (hi, lo) constant pairs for Re, Im, Re+Im."""
    t1 = dot(fr_, xr)
    t2 = dot(fi_, xi)
    t3 = dot(fs_, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _kernel(*refs, n1: int, in_complex: bool, out_imag: bool,
            core_a: bool):
    n_out = 2 if out_imag else 1
    if in_complex:
        xr_ref, xi_ref = refs[0], refs[1]
        consts = refs[2:len(refs) - n_out]
        xr, xi = xr_ref[...], xi_ref[...]
    else:
        xr_ref = refs[0]
        consts = refs[1:len(refs) - n_out]
        xr, xi = xr_ref[...], None
    (e1rh, e1rl, e1ih, e1il, e1sh, e1sl,
     e2rh, e2rl, e2ih, e2il, e2sh, e2sl, twr_ref, twi_ref) = consts

    dM = lambda c, v: _dotM(c[0], c[1], v, n1)
    dL = lambda c, v: _dotL(v, c[0], c[1])
    e1r, e1i, e1s = (e1rh, e1rl), (e1ih, e1il), (e1sh, e1sl)
    e2r, e2i, e2s = (e2rh, e2rl), (e2ih, e2il), (e2sh, e2sl)
    twr, twi = twr_ref[...], twi_ref[...]

    if core_a:
        # stage 1: sublane (t1) contraction with E1
        if in_complex:
            gr, gi = _cmul3(e1r, e1i, e1s, xr, xi, dM)
        else:
            gr = dM(e1r, xr)
            gi = dM(e1i, xr)
        # twiddle
        hr = gr * twr - gi * twi
        hi = gr * twi + gi * twr
        # stage 2: lane (t2) contraction with E2
        if out_imag:
            dr, di = _cmul3(e2r, e2i, e2s, hr, hi, dL)
        else:  # Re only: cr*hr - ci*hi, two products instead of three
            dr = dL(e2r, hr) - dL(e2i, hi)
    else:
        # inverse core: lane (k2) contraction first, then twiddle, then
        # the sublane (k1) stage — returns natural order
        gr, gi = _cmul3(e2r, e2i, e2s, xr, xi, dL)
        hr = gr * twr - gi * twi
        hi = gr * twi + gi * twr
        if out_imag:
            dr, di = _cmul3(e1r, e1i, e1s, hr, hi, dM)
        else:
            dr = dM(e1r, hr) - dM(e1i, hi)

    refs[len(refs) - n_out][...] = dr
    if out_imag:
        refs[len(refs) - 1][...] = di


def _kernel_autocorr(*refs, n1: int):
    """Fused round trip: 0.5*Im(ifft(fft(x + i*y)^2)) in one VMEM pass.

    YIN's packed autocorrelation (``Im(ifft(Z^2))/2`` = the x (*) y
    circular convolution) is an fft -> elementwise -> ifft chain whose
    middle never needs HBM: forward core A, complex square, inverse
    core B, imaginary output only — one HBM read of the operands and
    one write of the result instead of the two-kernel form's four."""
    xr_ref, xi_ref = refs[0], refs[1]
    (f1rh, f1rl, f1ih, f1il, f1sh, f1sl,
     f2rh, f2rl, f2ih, f2il, f2sh, f2sl, ftwr_ref, ftwi_ref,
     b1rh, b1rl, b1ih, b1il, b1sh, b1sl,
     b2rh, b2rl, b2ih, b2il, b2sh, b2sl, btwr_ref, btwi_ref) = refs[2:-1]
    out_ref = refs[-1]

    dM = lambda c, v: _dotM(c[0], c[1], v, n1)
    dL = lambda c, v: _dotL(v, c[0], c[1])

    # forward (core A): natural -> T-layout spectrum
    gr, gi = _cmul3((f1rh, f1rl), (f1ih, f1il), (f1sh, f1sl),
                    xr_ref[...], xi_ref[...], dM)
    twr, twi = ftwr_ref[...], ftwi_ref[...]
    hr = gr * twr - gi * twi
    hi = gr * twi + gi * twr
    dr, di = _cmul3((f2rh, f2rl), (f2ih, f2il), (f2sh, f2sl), hr, hi, dL)

    # elementwise middle: Z^2
    sr = dr * dr - di * di
    si = 2.0 * dr * di

    # inverse (core B): T-layout -> natural, imaginary part only
    gr, gi = _cmul3((b2rh, b2rl), (b2ih, b2il), (b2sh, b2sl), sr, si, dL)
    twr, twi = btwr_ref[...], btwi_ref[...]
    hr = gr * twr - gi * twi
    hi = gr * twi + gi * twr
    out_ref[...] = 0.5 * (dM((b1ih, b1il), hr) + dM((b1rh, b1rl), hi))


def fft4_autocorr(xr, xi, *, interpret: bool = False):
    """(..., n) real pair -> 0.5 * Im(ifft(fft(xr + i*xi)^2)) (..., n),
    the packed circular autocorrelation, as ONE fused kernel."""
    interpret_ = interpret or FORCE_INTERPRET
    n = xr.shape[-1]
    n1, ef1, ef2, ftwr, ftwi = _consts(n, False)
    _, eb1, eb2, btwr, btwi = _consts(n, True)
    lead = xr.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    ops = [xr.reshape(B, n1, _N2), xi.reshape(B, n1, _N2)]
    # both directions' buffers live in VMEM -> half the usual target
    tile = _pick_tile_b(B, max(8, _tile(n1) // 2))
    Bp = -(-B // tile) * tile
    if Bp != B:
        ops = [jnp.pad(o, [(0, Bp - B), (0, 0), (0, 0)]) for o in ops]
    consts = ([jnp.asarray(c) for c in ef1] + [jnp.asarray(c) for c in ef2]
              + [jnp.asarray(ftwr), jnp.asarray(ftwi)]
              + [jnp.asarray(c) for c in eb1] + [jnp.asarray(c) for c in eb2]
              + [jnp.asarray(btwr), jnp.asarray(btwi)])
    out = pl.pallas_call(
        functools.partial(_kernel_autocorr, n1=n1),
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((tile, n1, _N2), lambda i: (i, 0, 0))
                  for _ in ops]
        + [pl.BlockSpec(c.shape, functools.partial(
            lambda nd, i: (0,) * nd, c.ndim)) for c in consts],
        out_specs=pl.BlockSpec((tile, n1, _N2), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, n1, _N2), jnp.float32),
        interpret=interpret_,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(*ops, *consts)
    return out[:B].reshape(lead + (n,))


def _run(xr, xi, n: int, *, inverse: bool, out_imag: bool,
         interpret: bool = False):
    interpret = interpret or FORCE_INTERPRET
    n1, e1, e2, twr, twi = _consts(n, inverse)
    in_complex = xi is not None
    lead = xr.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    xr2 = xr.reshape(B, n1, _N2)
    ops = [xr2]
    if in_complex:
        ops.append(xi.reshape(B, n1, _N2))
    tile = _pick_tile_b(B, _tile(n1))
    Bp = -(-B // tile) * tile
    if Bp != B:
        pad = [(0, Bp - B), (0, 0), (0, 0)]
        ops = [jnp.pad(o, pad) for o in ops]

    consts = ([jnp.asarray(c) for c in e1] + [jnp.asarray(c) for c in e2]
              + [jnp.asarray(twr), jnp.asarray(twi)])

    def _const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

    n_out = 2 if out_imag else 1
    outs = pl.pallas_call(
        functools.partial(_kernel, n1=n1, in_complex=in_complex,
                          out_imag=out_imag, core_a=not inverse),
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((tile, n1, _N2), lambda i: (i, 0, 0))
                  for _ in ops]
        + [_const_spec(c) for c in consts],
        out_specs=[pl.BlockSpec((tile, n1, _N2), lambda i: (i, 0, 0))
                   for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((Bp, n1, _N2), jnp.float32)
                   for _ in range(n_out)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(*ops, *consts)
    outr = outs[0][:B].reshape(lead + (n1, _N2))
    outi = (outs[1][:B].reshape(lead + (n1, _N2)) if out_imag else None)
    return outr, outi


def fft4_fwd(xr, xi=None, *, interpret: bool = False):
    """Forward fft of natural-order rows (..., n) -> T-layout
    (..., n1, 128) spectrum pair (bin k1 + n1*k2 at [..., k1, k2]).
    ``xi=None`` means real input (the imag stage-1 products are skipped;
    the full hermitian spectrum still comes back — slice after
    :func:`t_to_natural` if only n//2+1 bins are wanted)."""
    n = xr.shape[-1]
    xr3 = xr.reshape(xr.shape[:-1] + (n // _N2, _N2))
    xi3 = (None if xi is None
           else xi.reshape(xi.shape[:-1] + (n // _N2, _N2)))
    return _run(xr3, xi3, n, inverse=False, out_imag=True,
                interpret=interpret)


def fft4_inv(yr, yi, *, out_imag: bool = True, interpret: bool = False):
    """Inverse fft of a T-layout (..., n1, 128) spectrum -> natural
    (..., n) signal pair.  Exact inverse of :func:`fft4_fwd` (1/n
    included).  ``out_imag=False`` skips the imaginary output's lane
    stage (use when the result is known real)."""
    n = yr.shape[-1] * yr.shape[-2]
    outr, outi = _run(yr, yi, n, inverse=True, out_imag=out_imag,
                      interpret=interpret)
    lead = yr.shape[:-2]
    outr = outr.reshape(lead + (n,))
    outi = outi.reshape(lead + (n,)) if out_imag else None
    return outr, outi


def _selftest(n=2048, b=3, seed=0):
    """Manual numpy cross-check (interpret mode) — a REPL smoke helper;
    the real coverage lives in tests/test_pallas_fft.py."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n)).astype(np.float32)
    y = rng.standard_normal((b, n)).astype(np.float32)
    ref = np.fft.fft(x + 1j * y)
    yr, yi = fft4_fwd(jnp.asarray(x), jnp.asarray(y), interpret=True)
    got = np.asarray(t_to_natural(yr)) + 1j * np.asarray(t_to_natural(yi))
    err_f = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    xr2, xi2 = fft4_inv(yr, yi, interpret=True)
    err_rt = max(np.max(np.abs(np.asarray(xr2) - x)),
                 np.max(np.abs(np.asarray(xi2) - y)))
    return err_f, err_rt


def t_to_natural(y):
    """(..., n1, 128) T-layout -> (..., n) natural bin order."""
    n1, n2 = y.shape[-2], y.shape[-1]
    return jnp.swapaxes(y, -1, -2).reshape(y.shape[:-2] + (n1 * n2,))


def natural_to_t(x, n1: int):
    """(..., n) natural -> (..., n1, 128) T-layout."""
    n = x.shape[-1]
    return jnp.swapaxes(
        x.reshape(x.shape[:-1] + (n // n1, n1)), -1, -2)


def permute_bins_t(mat, n: int):
    """Permute a (num, m) bin-indexed matrix (m = n//2+1 half-spectrum or
    full n) into the T-layout flat bin order, zero-padding the hermitian
    mirror half.

    A filterbank contraction ``sum_k fb[b, k] P[k]`` over a natural
    power spectrum equals ``sum_j fbT[b, j] P_T[j]`` over the T-layout
    FULL spectrum when ``fbT[:, k1*128 + k2] = fb_full[:, k1 + n1*k2]``
    with zeros over bins >= m (for real input those mirror bins carry
    duplicate power that must not be double-counted) — so banked scales
    consume the kernel's output with no bin-order transpose at all.
    numpy in / numpy out (host-side constant building).
    """
    mat = np.asarray(mat, np.float32)
    n1 = n // _N2
    full = np.zeros((mat.shape[0], n), np.float32)
    full[:, :mat.shape[1]] = mat[:, :n]
    kk = (np.arange(n1)[:, None] + n1 * np.arange(_N2)[None, :]).reshape(-1)
    return np.ascontiguousarray(full[:, kk])
