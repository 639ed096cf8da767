"""Shared helpers for the example recipes.

Each example runs headless by default (compute + printed shapes); set
``AF_EXAMPLES_PLOT=1`` to also save PNG figures next to the script.
Mirrors the reference's ``docs/examples.md`` recipes, which read a
220 Hz sample file — we synthesize an equivalent tone + harmonics.
"""

import os

# CPU forcing must happen before any JAX backend use (the axon TPU plugin
# ignores JAX_PLATFORMS set from the environment) — import _util first.
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("AF_FORCE_CPU") == "1":
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

SR = 32000


def sample_220(seconds: float = 1.0, sr: int = SR) -> np.ndarray:
    """A 220 Hz tone with a few harmonics and a soft onset, like the
    reference's bundled ``220.wav`` guitar pluck."""
    t = np.arange(int(seconds * sr)) / sr
    env = np.minimum(t / 0.02, 1.0) * np.exp(-1.5 * t)
    x = (0.6 * np.sin(2 * np.pi * 220 * t)
         + 0.25 * np.sin(2 * np.pi * 440 * t)
         + 0.12 * np.sin(2 * np.pi * 660 * t)
         + 0.05 * np.sin(2 * np.pi * 880 * t))
    return (x * env).astype(np.float32)


def plotting() -> bool:
    return os.environ.get("AF_EXAMPLES_PLOT", "") == "1"


def maybe_save(fig, name: str):
    if plotting():
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           name + ".png")
        fig.savefig(out, dpi=100)
        print("saved", out)
