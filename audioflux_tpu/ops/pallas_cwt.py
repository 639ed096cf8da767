"""Fused CWT filterbank convolution: bank multiply + four-step IFFT.

The CWT applies a (num, N) real frequency-domain wavelet bank to the
padded signal's spectrum and inverse-FFTs every band
(``cwt_algorithm.c:418-456``; N = 2**radix2_exp * 2 with symmetric
padding).  XLA's native FFT walks log2(N) HBM passes over the
(batch, num, N) product matrix — at the bench config (16 x 84 x 65536
complex) that is the dominant cost of the whole cwt+synsq pipeline.

This kernel computes each band's IFFT as a four-step factorization
N = R*C entirely in VMEM:

    out[n1 + R*n2] = sum_k2 E2[k2, n2] * (T[n1, k2]
                     * sum_k1 E1[n1, k1] * X[k1*C + k2])

* stage 1 and stage 2 are (R x H) @ (H x C) and (R x C) @ (C x C')
  MXU matmuls — Karatsuba complex products (3 real matmuls), each a
  bf16x3 triplet (~2e-6 relative accuracy, the fs-kernel contract);
* the twiddle T is one VPU elementwise complex multiply;
* the symmetric-padding slice [p : p+L) is folded into stage 2: with
  R | p it is a pure n2-column subrange of E2, halving that stage;
* HBM traffic is input-spectrum + bank + output only (one pass);
* **support slicing**: the wavelet bank is analytic (zero for omega <= 0,
  ``cwt_filterBank.c`` keeps x > 0 only) and each band is a contiguous
  bump [1, hi_j] — in the (R, C) row-major reshape only the first
  ``ceil((hi_j+1)/C)`` rows of X are nonzero, so stage 1 contracts just
  those rows.  ``band_row_counts`` measures the exact f32 support per
  band; bands are bucketed by the power-of-two-quantized row count and
  each bucket runs as its own pallas_call with H = its quantum.  Only
  exact zeros are dropped, so the result is bit-identical to the full
  contraction.  At the bench config (84 morlet octave bands, N = 65536)
  this cuts executed MXU FLOPs ~2.3x (stage 1: 1410 -> ~210 MMAC).

Gated to the TPU backend for N >= 2**14 with R | p; everything else
uses the jnp path (CPU goldens are unaffected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cwt_ifft_bank", "supports", "band_row_counts"]


def band_row_counts(bank, n: int):
    """Static per-band stage-1 row counts for the support-sliced kernel.

    ``bank`` is the (num, n) float32 frequency-domain bank as built on the
    host; returns a tuple of per-band leading-row counts (multiples of 8)
    in the kernel's (R, C) reshape covering every nonzero entry.  Bands
    whose support is not a leading prefix fall back to all R rows (still
    exact — slicing only ever drops exact zeros).
    """
    bank = np.asarray(bank)
    e = n.bit_length() - 1
    R = 1 << ((e + 1) // 2)
    C = n // R
    b3 = bank.reshape(bank.shape[0], R, C)
    nz = (b3 != 0).any(axis=2)                    # (num, R)
    any_ = nz.any(axis=1)
    last = R - 1 - np.argmax(nz[:, ::-1], axis=1)  # last nonzero row
    rows = np.where(any_, last + 1, 1)
    return tuple(int(v) for v in np.minimum(-(-rows // 8) * 8, R))


def _quantize_rows(row_h, R: int):
    """Power-of-two quantization (8, 16, 32, ... R) of per-band row
    counts; keeps bucket count small while padding <2x."""
    out = []
    for h in row_h:
        q = 8
        while q < h:
            q *= 2
        out.append(min(q, R))
    return out


def supports(n: int, pad: int, length: int) -> bool:
    """Kernel applicability: pow2 N >= 16384 whose R divides pad/length."""
    if n < (1 << 14) or (n & (n - 1)):
        return False
    r = 1 << ((n.bit_length() - 1 + 1) // 2)  # R = 2^ceil(e/2)
    return pad % r == 0 and length % r == 0


@functools.lru_cache(maxsize=8)
def _consts(n: int, pad: int, length: int):
    e = n.bit_length() - 1
    R = 1 << ((e + 1) // 2)
    C = n // R
    n2_lo = pad // R
    C2 = length // R

    import ml_dtypes

    def split(a):  # pure numpy (the cache must not capture trace constants)
        a32 = a.astype(np.float32)
        hi = a32.astype(ml_dtypes.bfloat16)
        lo = (a32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return hi, lo

    # stage 1: E1[n1, k1] = e^{+2pi i n1 k1 / R}; contracted as
    # G[n1, k2] = sum_k1 E1[n1, k1] X[k1, k2]  ->  dot(E1, X)
    a1 = 2 * np.pi * np.outer(np.arange(R), np.arange(R)) / R
    e1r, e1i = np.cos(a1), np.sin(a1)
    # stage 2: E2[k2, n2] = e^{+2pi i k2 (n2_lo + j) / C} / N, j < C2
    n2 = n2_lo + np.arange(C2)
    a2 = 2 * np.pi * np.outer(np.arange(C), n2 % C) / C
    e2r, e2i = np.cos(a2) / n, np.sin(a2) / n
    # twiddle: T[n1, k2] = e^{+2pi i n1 k2 / N}
    at = 2 * np.pi * np.outer(np.arange(R), np.arange(C)) / n
    twr = np.cos(at).astype(np.float32)
    twi = np.sin(at).astype(np.float32)

    e1 = [*split(e1r), *split(e1i), *split(e1r + e1i)]
    e2 = [*split(e2r), *split(e2i), *split(e2r + e2i)]
    return R, C, C2, e1, e2, twr, twi


def _kernel(fr_ref, fi_ref, bank_ref,
            e1rh, e1rl, e1ih, e1il, e1sh, e1sl,
            twr_ref, twi_ref,
            e2rh, e2rl, e2ih, e2il, e2sh, e2sl,
            or_ref, oi_ref, *, R: int, C: int, C2: int, det: bool):
    b = bank_ref[0]                                  # (R, C)
    pr = fr_ref[0] * b                               # X[k1, k2]
    pi = fi_ref[0] * b

    def dot3l(ah_ref, al_ref, x):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jax.lax.dot,
                              preferred_element_type=jnp.float32)
        return (d(ah_ref[...], xh) + d(ah_ref[...], xl)
                + d(al_ref[...], xh))

    # stage 1 (Karatsuba complex: 3 real matmuls, constants on the left)
    t1 = dot3l(e1rh, e1rl, pr)
    t2 = dot3l(e1ih, e1il, pi)
    t3 = dot3l(e1sh, e1sl, pr + pi)
    gr = t1 - t2                                     # (R, C)
    gi = t3 - t1 - t2

    # twiddle (VPU complex multiply)
    twr, twi = twr_ref[...], twi_ref[...]
    hr = gr * twr - gi * twi
    hi = gr * twi + gi * twr

    def dot3(x, bh_ref, bl_ref):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jax.lax.dot,
                              preferred_element_type=jnp.float32)
        return (d(xh, bh_ref[...]) + d(xl, bh_ref[...])
                + d(xh, bl_ref[...]))

    # stage 2 (runtime on the left, sliced E2 on the right)
    u1 = dot3(hr, e2rh, e2rl)
    u2 = dot3(hi, e2ih, e2il)
    u3 = dot3(hr + hi, e2sh, e2sl)
    outr = u1 - u2                                   # (R, C2)
    outi = u3 - u1 - u2

    # out[n1 + R*n2]: transpose to (C2, R); the caller flattens
    outr = outr.T
    outi = outi.T
    if det:  # derivative bank: W_det = i * ifft(bank_d * F)
        or_ref[0, 0] = -outi
        oi_ref[0, 0] = outr
    else:
        or_ref[0, 0] = outr
        oi_ref[0, 0] = outi


@functools.partial(jax.jit, static_argnames=("pad", "length", "det",
                                             "row_h", "interpret"))
def cwt_ifft_bank(F, bank, *, pad: int, length: int, det: bool = False,
                  row_h: tuple = None, interpret: bool = False):
    """(B, N) complex spectrum x (num, N) real bank -> (B, num, length)
    complex64: per-band ``ifft(bank * F)[pad : pad+length]`` (times ``i``
    when ``det``), as one fused Pallas pass per support bucket.

    ``row_h`` (static, from :func:`band_row_counts`) gives each band's
    stage-1 row count; consecutive bands with the same power-of-two
    quantum share one pallas_call.  ``None`` means the full R rows.
    """
    B, n = F.shape
    num = bank.shape[0]
    R, C, C2, e1, e2, twr, twi = _consts(n, pad, length)
    # expose (R, C) as the trailing dims (Mosaic block alignment)
    fr = jnp.real(F).astype(jnp.float32).reshape(B, R, C)
    fi = jnp.imag(F).astype(jnp.float32).reshape(B, R, C)
    bank3 = jnp.asarray(bank, jnp.float32).reshape(num, R, C)

    qrows = _quantize_rows(row_h, R) if row_h is not None else [R] * num
    # consecutive-band buckets of equal quantum
    buckets = []
    for j, q in enumerate(qrows):
        if buckets and buckets[-1][2] == q:
            buckets[-1][1] = j + 1
        else:
            buckets.append([j, j + 1, q])

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * arr.ndim)

    tw = [jnp.asarray(twr), jnp.asarray(twi)]
    e2c = [jnp.asarray(c) for c in e2]
    parts = []
    for g0, g1, H in buckets:
        ng = g1 - g0
        e1c = [jnp.asarray(np.ascontiguousarray(c[:, :H])) for c in e1]
        consts = [*e1c, *tw, *e2c]
        outr, outi = pl.pallas_call(
            functools.partial(_kernel, R=R, C=C, C2=C2, det=det),
            grid=(B, ng),
            in_specs=[
                pl.BlockSpec((1, H, C), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, H, C), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, H, C), lambda i, j: (j, 0, 0)),
            ] + [_const(c) for c in consts],
            out_specs=[
                pl.BlockSpec((1, 1, C2, R), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, C2, R), lambda i, j: (i, j, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, ng, C2, R), jnp.float32),
                jax.ShapeDtypeStruct((B, ng, C2, R), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(fr, fi, bank3[g0:g1], *consts)
        parts.append((outr + 1j * outi).reshape(B, ng, C2 * R))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=1)
