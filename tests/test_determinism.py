"""Determinism guards (SURVEY §5): repeated runs are bit-identical.

XLA reductions and matmuls on a fixed device/topology must produce the
same bits run-to-run (no atomics/nondeterministic accumulation in this
framework); these tests pin that contract for the hot paths, including
the sharded psum reductions.
"""

import numpy as np
import pytest

import jax


def test_spectrogram_bit_deterministic(signals):
    import audioflux_tpu as af
    x = np.asarray(signals["chirp"][:16384], np.float32)
    obj = af.MelSpectrogram(num=64, samplate=32000, radix2_exp=11,
                            slide_length=512)
    a = np.asarray(obj.spectrogram(x))
    b = np.asarray(obj.spectrogram(x))
    np.testing.assert_array_equal(a, b)
    cc_a = np.asarray(obj.mfcc(a, 13))
    cc_b = np.asarray(obj.mfcc(b, 13))
    np.testing.assert_array_equal(cc_a, cc_b)


def test_fused_kernel_bit_deterministic(signals):
    import audioflux_tpu as af
    obj = af.MelSpectrogram(num=64, samplate=32000, radix2_exp=11,
                            slide_length=512)
    x = np.tile(np.asarray(signals["chirp"][:16 * 512 + 1536],
                           np.float32)[None], (2, 1))
    m1, c1 = obj.spectrogram_mfcc_fused(x, tile=8)
    m2, c2 = obj.spectrogram_mfcc_fused(x, tile=8)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_reductions_deterministic():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from audioflux_tpu.parallel import make_mesh, sharded_spectral_stats_fn
    mesh = make_mesh(data=2, time=4)
    rng = np.random.default_rng(0)
    S = rng.random((4, 16, 64)).astype(np.float32)
    fn = sharded_spectral_stats_fn(mesh)
    Sd = jax.device_put(S, NamedSharding(mesh, P("data", None, "time")))
    a = fn(Sd)
    b = fn(Sd)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
