"""Attributing time inside a TPU dispatch with device-side traces.

Tunnel/host wall clocks carry multi-ms noise; the profiler's device
durations do not.  ``observe.trace`` captures a TensorBoard/perfetto
trace and ``observe.summarize_trace`` reduces it to per-op totals —
this is how round 5 found that the four-step fft kernel was already at
its roofline while batch-tile padding glue burned 70% of the dispatch
(see README Performance).  Works on any backend; on CPU the "device"
is the XLA:CPU stream.
"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("AF_FORCE_CPU", "1")
import _util  # noqa: F401,E402  (CPU forcing off-TPU)
import tempfile  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

import audioflux_tpu as af  # noqa: E402
from audioflux_tpu import observe  # noqa: E402

SR = 32000
mel = af.MelSpectrogram(num=128, samplate=SR, radix2_exp=11,
                        slide_length=512)
x = af.chirp(100, 8000, 2.0, samplate=SR)
spec = mel.spectrogram(x)          # compile outside the trace —
np.asarray(spec.ravel()[:1])       # including the fence's tiny jits,
# or the capture fills with backend_compile events instead of compute

logdir = tempfile.mkdtemp(prefix="af_trace_")
with observe.trace(logdir):
    for _ in range(3):
        spec = mel.spectrogram(x)
    np.asarray(spec.ravel()[:1])   # the only reliable fence over axon

print(f"trace written to {logdir} (tensorboard --logdir {logdir})")
print("top ops by device time (3 calls, us summed):")
for name, us, count in observe.summarize_trace(logdir, top=8):
    print(f"  {us/1e3:9.3f} ms  x{count:3d}  {name[:60]}")
