"""Fused columnar scatter kernel (ops/pallas_scatter.py) vs the XLA
einsum form (ops/scatter.py columnar_scatter_add).  Interpret mode on
CPU; the TPU path is the same program.

Both paths sum the same cells per output bin in the same row order
(ascending i), so the float32 accumulation is bit-identical — assert
exact equality, not a tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from audioflux_tpu.ops.pallas_scatter import supports, columnar_scatter_pallas
from audioflux_tpu.ops.scatter import columnar_scatter_add


def test_matches_xla_columnar():
    rng = np.random.default_rng(0)
    B, R, T, F = 3, 84, 256, 84
    v = (rng.standard_normal((B, R, T))
         + 1j * rng.standard_normal((B, R, T))).astype(np.complex64)
    # indices include the drop bin F and heavy duplicates
    fi = rng.integers(0, F + 1, (B, R, T)).astype(np.int32)
    ref = np.asarray(columnar_scatter_add(jnp.asarray(v), jnp.asarray(fi), F))
    got = np.asarray(columnar_scatter_pallas(jnp.asarray(v), jnp.asarray(fi),
                                             F, interpret=True))
    assert np.array_equal(ref, got)


def test_rect_out_size():
    rng = np.random.default_rng(1)
    R, T, F = 16, 128, 40  # out bins != in rows
    v = (rng.standard_normal((R, T))
         + 1j * rng.standard_normal((R, T))).astype(np.complex64)
    fi = rng.integers(0, F + 1, (R, T)).astype(np.int32)
    ref = np.asarray(columnar_scatter_add(jnp.asarray(v), jnp.asarray(fi), F))
    got = np.asarray(columnar_scatter_pallas(jnp.asarray(v), jnp.asarray(fi),
                                             F, interpret=True))
    assert np.array_equal(ref, got)


def test_all_dropped():
    R, T, F = 8, 128, 8
    v = np.ones((R, T), np.complex64)
    fi = np.full((R, T), F, np.int32)  # every cell in the trash bin
    got = np.asarray(columnar_scatter_pallas(jnp.asarray(v), jnp.asarray(fi),
                                             F, interpret=True))
    assert np.all(got == 0)


def test_supports_gate():
    assert supports(84, 84, 32768)
    assert not supports(84, 84, 100)      # T not 128-aligned
    assert not supports(600, 84, 32768)   # too many rows to unroll
    assert not supports(84, 600, 32768)   # too many out bins


# ---------------------------------------------------------------------------
# blocked near-diagonal scatter for long-recording reassignment (r5)
# ---------------------------------------------------------------------------

def _np_scatter_ref(vals, ti, fi, ok, T, m):
    out = np.zeros(vals.shape[:-2] + (T, m), vals.dtype)
    it = np.ndindex(vals.shape)
    for idx in it:
        if ok[idx] and 0 <= ti[idx] < T and 0 <= fi[idx] < m:
            out[idx[:-2] + (ti[idx], fi[idx])] += vals[idx]
    return out


def _blocked_case(seed, T, m, C, spread, K=256, W=4, cpx=True):
    from audioflux_tpu.ops.scatter import reassign_blocked_scatter_add
    rng = np.random.default_rng(seed)
    shape = (2, T, C)
    vals = rng.standard_normal(shape).astype(np.float32)
    if cpx:
        vals = vals + 1j * rng.standard_normal(shape).astype(np.float32)
        vals = vals.astype(np.complex64)
    home = np.broadcast_to(np.arange(T)[:, None], shape[1:])
    d = rng.integers(-spread, spread + 1, shape)
    ti = (home + d).astype(np.int32)          # some out of range -> dropped
    fi = rng.integers(-2, m + 2, shape).astype(np.int32)  # some dropped
    ok = rng.random(shape) > 0.1
    got = np.asarray(reassign_blocked_scatter_add(
        jnp.asarray(vals), jnp.asarray(ti), jnp.asarray(fi),
        jnp.asarray(ok), T=T, m=m, W=W, K=K))
    ok_full = ok & (ti >= 0) & (ti < T) & (fi >= 0) & (fi < m)
    want = _np_scatter_ref(vals, ti, fi, ok_full, T, m)
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=3e-6 * max(np.abs(want).max(), 1.0))


def test_blocked_scatter_near_diagonal():
    """All cells inside the halo: pure MXU path."""
    _blocked_case(0, T=37, m=65, C=80, spread=3)


def test_blocked_scatter_with_tail():
    """~30% of cells beyond the W=4 halo: rank-compacted tail pass."""
    _blocked_case(1, T=29, m=65, C=48, spread=12)


def test_blocked_scatter_tail_overflow_fallback():
    """K smaller than the per-frame outlier count: the lax.cond full
    serialized fallback must keep the result exact."""
    _blocked_case(2, T=17, m=33, C=64, spread=14, K=8)


def test_blocked_scatter_real_payload():
    _blocked_case(3, T=23, m=49, C=40, spread=9, cpx=False)


def test_reassign_long_blocked_equals_flat():
    """Reassign with force_blocked_scatter == the flat-scatter graph on a
    signal long enough that T*m exceeds the radix budget."""
    import audioflux_tpu as af
    from audioflux_tpu.transforms.reassign import _reassign_impl
    rs = af.Reassign(radix2_exp=9, samplate=8000, slide_length=128)
    n = 8000 * 2  # T ~ 126, m = 257 -> T*m ~ 32k > 8192
    rng = np.random.default_rng(5)
    t = np.arange(n) / 8000
    x = (np.sin(2 * np.pi * 440 * t) * 0.5
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    kw = dict(fft_length=rs.fft_length, slide_length=rs.slide_length,
              samplate=rs.samplate, thresh=rs.thresh,
              re_type=int(rs.re_type), order=1, result_type=0,
              is_padding=False)
    o0, s0 = _reassign_impl(jnp.asarray(x), jnp.asarray(rs._wins), **kw)
    o1, s1 = _reassign_impl(jnp.asarray(x), jnp.asarray(rs._wins),
                            force_blocked_scatter=True, **kw)
    assert int((np.asarray(s1) != np.asarray(s0)).sum()) == 0
    sc = np.abs(np.asarray(o0)).max()
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=3e-6 * sc)


@pytest.mark.parametrize("re_type,order,result_type,is_padding", [
    (0, 1, 0, False),   # ALL
    (1, 1, 0, True),    # FRE only, center-padded
    (2, 1, 1, False),   # TIME only, |S| scatter
    (0, 2, 0, False),   # order-2 composition
    (0, 1, 1, True),
])
def test_reassign_blocked_config_sweep(re_type, order, result_type,
                                       is_padding):
    """Blocked == flat across the reassign configuration space (the
    blocked path is re_type/order-agnostic: it only replaces the final
    scatter)."""
    import audioflux_tpu as af
    from audioflux_tpu.transforms.reassign import _reassign_impl
    rs = af.Reassign(radix2_exp=9, samplate=8000, slide_length=64)
    rng = np.random.default_rng(40 + re_type * 7 + order)
    n = 12000  # T*m ~ 48k > radix budget at slide 64
    t = np.arange(n) / 8000
    x = (np.sin(2 * np.pi * (300 + 200 * t) * t) * 0.4
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    kw = dict(fft_length=rs.fft_length, slide_length=rs.slide_length,
              samplate=rs.samplate, thresh=rs.thresh, re_type=re_type,
              order=order, result_type=result_type, is_padding=is_padding)
    o0, s0 = _reassign_impl(jnp.asarray(x), jnp.asarray(rs._wins),
                            force_blocked_scatter=False, **kw)
    o1, s1 = _reassign_impl(jnp.asarray(x), jnp.asarray(rs._wins),
                            force_blocked_scatter=True, **kw)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
    sc = max(float(np.abs(np.asarray(jnp.real(o0))).max()), 1.0)
    np.testing.assert_allclose(np.asarray(jnp.real(o1)),
                               np.asarray(jnp.real(o0)), atol=5e-6 * sc)
    np.testing.assert_allclose(np.asarray(jnp.imag(o1)),
                               np.asarray(jnp.imag(o0)), atol=5e-6 * sc)


def test_blocked_scatter_tiny_T():
    """T smaller than the halo width (2W+1): the shifted-add planes whose
    offset exceeds T must drop cleanly (the guard in _ola)."""
    _blocked_case(7, T=3, m=41, C=60, spread=2, W=4)
    _blocked_case(8, T=1, m=33, C=40, spread=0, W=4)
