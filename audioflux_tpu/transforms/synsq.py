"""Synchrosqueezing of CWT-family output.

Reference ``src/synsq_algorithm.c``: per-cell instantaneous frequency from
the unwrapped phase derivative, mapped to an output bin by the band layout
(log / linear / nearest-neighbor), then a scatter-add of the complex values
above threshold. The reference's per-cell loops become one vectorized
pipeline + a single ``.at[].add(mode='drop')`` scatter; the C unwrap
(flux_vector.c:__vunwrap — direction picked from the *wrapped* previous
sample) is reproduced exactly with a ``lax.scan`` over time.
"""

from __future__ import annotations

from functools import partial

import jax
from audioflux_tpu.ops.backend import on_tpu as _on_tpu
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.ops.scatter import (batched_scatter_add,
                                        columnar_scatter_add)
from audioflux_tpu.types import SpectralFilterBankScaleType

__all__ = ["Synsq"]


def scale_kind(scale_type) -> str:
    """Bin-mapping family for a filter-bank scale (synsq_algorithm.c's
    three index formulas).  Shared by Synsq/WSST and their sharded
    twins so the mapping can never drift between paths."""
    S = SpectralFilterBankScaleType
    st = S(scale_type)
    if st > S.LOG:
        raise ValueError(f"unsupported scale {st.name}")
    if st in (S.OCTAVE, S.LOG):
        return "log"
    if st in (S.LINEAR, S.LINSPACE):
        return "linear"
    return "nearest"


def _c_unwrap(x):
    """Reference __vunwrap along the last axis (flux_vector.c:__vunwrap
    with vArr2=NULL).

    The C runs in place, comparing each sample against the *unwrapped*
    previous one — but every step recomputes y from the fresh wrapped
    sample plus an integer multiple of 2pi, so the sequential recurrence
    is a cumsum of per-step wrap counts: y[j] = x[j] + 2pi * cumsum(k),
    with k in {-1, 0, +1} from the local principal difference.  That
    turns a T-step ``lax.scan`` (latency-bound: 32k sequential steps of
    tiny elementwise work at radix2_exp=15) into one parallel prefix sum;
    the float32 expressions match the C's (verified bit-equal to the scan
    form on wrapping/drifting/steady phases — counts can differ only on
    knife-edge cells, the documented libm-class tolerance)."""
    two_pi = 2 * np.pi
    sub = jnp.abs(x[..., 1:] - x[..., :-1])
    t = jnp.floor(sub / two_pi)
    mod = sub - t * two_pi
    t = t + (mod > np.pi)
    k = jnp.where(sub < np.pi, 0.0,
                  jnp.where(x[..., 1:] > x[..., :-1], -t, t))
    # plain cumsum: associative_scan measured 2.5x SLOWER here (its
    # odd/even interleaving lowers to strided relayouts, the known
    # 1/6-HBM-bandwidth path on this backend)
    c = jnp.cumsum(k, axis=-1)
    c = jnp.concatenate([jnp.zeros_like(c[..., :1]), c], axis=-1)
    return x + c * two_pi


def _synsq_map(D, fre_arr, *, scale_kind, num, samplate,
               force_xla_unwrap: bool = False):
    """Per-cell target-bin map (int32, same shape as D).

    Band-local by construction — phase, unwrap (along time within each
    band row) and the bin mapping touch no other band, so the band-sharded
    shard_map twin (``parallel/sharded_full.py``) runs this on its local
    band slice with the FULL ``fre_arr`` (the mapping reads the global
    f[0]/f[num-1] edges)."""
    # 1-3. phase (atan2(REAL, IMAG) — reference argument order,
    # synsq_algorithm.c:155), C unwrap, forward diff / 2pi
    T = D.shape[-1]
    phase = jnp.arctan2(jnp.real(D), jnp.imag(D))
    from audioflux_tpu.ops.pallas_unwrap import supports, unwrap_diff
    rows = int(np.prod(phase.shape[:-1]))
    if (not force_xla_unwrap and _on_tpu()
            and supports(rows, T)):
        # fused unwrap+diff kernel (ops/pallas_unwrap.py): one HBM pass,
        # same f32 phrases as the cumsum formulation below with exact
        # integer prefix sums on the MXU (possible FMA-contraction ulps
        # are bounded by the bench gate)
        e = unwrap_diff(phase.reshape(rows, T)).reshape(phase.shape)
        d = jnp.concatenate([e[..., :-1], e[..., -2:-1]],
                            axis=-1) / (2 * np.pi)
    else:
        ph = _c_unwrap(phase)
        # backward diff stored at j, first column 0 (__mdiff2 axis=1
        # semantics); the C then overwrites the LAST column with the
        # second-to-last (synsq_algorithm.c:191-193), so the final two
        # phase-rate columns are identical
        d = ph[..., 1:] - ph[..., :-1]
        d = jnp.concatenate([jnp.zeros_like(d[..., :1]),
                             d[..., :-1], d[..., -2:-1]],
                            axis=-1) / (2 * np.pi)

    v = jnp.abs(d)
    f = fre_arr / samplate
    if scale_kind == "log":
        fmin, fmax = f[0], f[num - 1]
        fi = jnp.floor((jnp.log2(v) - jnp.log2(fmin)) * num
                       / (jnp.log2(fmax) - jnp.log2(fmin)) + 0.5)
    elif scale_kind == "linear":
        fmin, fmax = f[0], f[num - 1]
        fi = jnp.floor(jnp.abs(d - fmin) * num / (fmax - fmin) + 0.5)
    else:  # nearest band (mel/bark/erb, __arr_roundIndex)
        idx = jnp.clip(jnp.searchsorted(f, v, side="right") - 1, 0, num - 2)
        in_range = (v >= f[0]) & (v < f[num - 1])
        left = v - f[idx]
        right = f[idx + 1] - v
        fi = jnp.where(left < right, idx, idx + 1)
        fi = jnp.where(in_range, fi, -1)
    return fi.astype(jnp.int32)


def _compose_order(fi, num: int, order: int):
    """Order composition over the transposed flat view
    (synsq_algorithm.c:222-238 indexes [t*num+j]).  Cross-band: each
    cell looks up the target bin OF ANOTHER BAND at the same time step,
    so ``fi`` must carry all ``num`` bands (the band-sharded twin
    all-gathers before calling this)."""
    T = fi.shape[-1]
    for _ in range(max(order, 1) - 1):
        flat = fi.reshape(fi.shape[:-2] + (T, num))
        valid = (flat >= 0) & (flat < num)
        g = jnp.take_along_axis(flat, jnp.clip(flat, 0, num - 1), axis=-1)
        flat = jnp.where(valid, g, 0)
        fi = flat.reshape(fi.shape)
    return fi


def _reassign_scatter(D, fi, *, num: int, thresh: float):
    """Threshold + complex scatter-add into ``num`` output bins.

    Shared by synsq and wsst (the reference duplicates the loop,
    synsq_algorithm.c:240-258 / wsst_algorithm.c).  Summing a band
    SUBSET of D with the matching fi rows yields that subset's partial
    bin sums — the band-sharded twin psums partials across shards."""
    T = D.shape[-1]
    power = jnp.real(D) ** 2 + jnp.imag(D) ** 2
    ok = (fi >= 0) & (fi < num) & (power > thresh * thresh)
    if num <= 512:
        # columnar reassignment: one-hot MXU contraction beats TPU
        # scatter-add (which serializes duplicate bins).  Pallas kernel
        # forms measured SLOWER (ops/pallas_scatter.py dead-end note).
        fi_d = jnp.where(ok, fi, num)  # out-of-range drops
        return columnar_scatter_add(D, fi_d, num)
    j = jnp.broadcast_to(jnp.arange(T), fi.shape)
    flat_idx = jnp.where(ok, fi * T + j, num * T)

    out = batched_scatter_add(D.reshape(D.shape[:-2] + (-1,)),
                              flat_idx.reshape(flat_idx.shape[:-2] + (-1,)),
                              num * T)
    return out.reshape(D.shape[:-2] + (num, T))


@partial(jax.jit, static_argnames=("scale_kind", "num", "order",
                                   "force_xla_unwrap"))
def _synsq_impl(D, fre_arr, *, scale_kind, num, samplate, thresh, order,
                force_xla_unwrap: bool = False):
    # ``force_xla_unwrap`` pins the cumsum unwrap even on TPU; it is a
    # STATIC arg so accuracy gates get a genuinely separate compilation
    # (monkeypatching ``supports`` cannot evict the jit cache).
    fi = _synsq_map(D, fre_arr, scale_kind=scale_kind, num=num,
                    samplate=samplate, force_xla_unwrap=force_xla_unwrap)
    fi = _compose_order(fi, num, order)
    return _reassign_scatter(D, fi, num=num, thresh=thresh)


class Synsq:
    """API mirrors ``python/audioflux/synsq.py``."""

    def __init__(self, num: int, radix2_exp: int, samplate: int = 32000,
                 order: int = 1, thresh: float = 0.001):
        self.num = int(num)
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.samplate = samplate
        self.order = max(int(order), 1)
        self.thresh = float(thresh)

    def synsq(self, m_data_arr, filter_bank_type, fre_arr,
              force_xla_unwrap: bool = False):
        """m_data_arr: complex (..., num, time) CWT-family output;
        fre_arr: (num,) ascending band frequencies.
        ``force_xla_unwrap`` pins the cumsum unwrap (accuracy gates)."""
        kind = scale_kind(filter_bank_type)
        return _synsq_impl(jnp.asarray(m_data_arr),
                           jnp.asarray(fre_arr, jnp.float32),
                           scale_kind=kind, num=self.num,
                           samplate=float(self.samplate),
                           thresh=self.thresh, order=self.order,
                           force_xla_unwrap=force_xla_unwrap)
