"""Fused columnar scatter kernel (ops/pallas_scatter.py) vs the XLA
einsum form (ops/scatter.py columnar_scatter_add).  Interpret mode on
CPU; the TPU path is the same program.

Both paths sum the same cells per output bin in the same row order
(ascending i), so the float32 accumulation is bit-identical — assert
exact equality, not a tolerance.
"""

import numpy as np
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
