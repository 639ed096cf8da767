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
