"""Observability: profiler traces carry named stages; metrics registry."""

import glob
import os

import numpy as np


def test_trace_contains_named_stages(tmp_path):
    import audioflux_tpu as af

    obj = af.MelSpectrogram(num=32, samplate=32000, radix2_exp=10,
                            slide_length=256)
    x = (np.random.default_rng(0).standard_normal(8192) * 0.2
         ).astype(np.float32)
    obj.spectrogram(x)  # compile outside the trace
    with af.observe.trace(str(tmp_path)):
        spec = obj.spectrogram(x)
        np.asarray(spec)
    files = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert files, "no trace written"
    blob = b"".join(open(f, "rb").read() for f in files)
    assert b"af.power_spec" in blob or b"af.frame" in blob, \
        "named stages missing from trace"


def test_metrics_registry():
    from audioflux_tpu.observe import Metrics

    m = Metrics()
    m.count("clips", 3)
    m.count("clips", 2)
    with m.timer("stage"):
        pass
    rep = m.report()
    assert rep["clips"] == 5
    assert rep["stage.calls"] == 1
    assert rep["stage.seconds"] >= 0
    m.reset()
    assert m.report() == {}


def test_summarize_trace(tmp_path):
    """Profiler trace capture + per-op summary on the CPU backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audioflux_tpu import observe

    f = jax.jit(lambda a: jnp.sin(a) @ a.T)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((64, 64)).astype(np.float32))
    f(x).block_until_ready()
    d = str(tmp_path / "tr")
    with observe.trace(d):
        f(x).block_until_ready()
    rows = observe.summarize_trace(d, top=10)
    assert rows and all(len(r) == 3 for r in rows)
    assert all(us >= 0 and c >= 1 for _, us, c in rows)
    # host events excluded by default, included on demand
    with_host = observe.summarize_trace(d, top=50, include_host=True)
    assert len(with_host) >= len(rows)
