"""FFT-backend introspection compat (reference ``python/audioflux/fftlib.py``).

The reference lets users point its ctypes layer at different compiled FFT
libraries (FFTW/vDSP/...).  Here the backend is XLA: there is exactly one
"library" and it is whatever `jax` lowers to for the active platform, so
the setters are no-ops kept only so migration code importing these names
keeps running.
"""

import hashlib

__all__ = ["get_fft_lib", "get_fft_lib_fp", "get_fft_lib_name",
           "get_lib_md5", "set_fft_lib"]


def get_fft_lib_name(system=None, lib_ext=None) -> str:
    """Active compute backend name (e.g. 'tpu', 'cpu').  ``system`` and
    ``lib_ext`` (the reference's dylib-picking arguments) are accepted
    and ignored: XLA is the only backend here."""
    import jax
    return jax.default_backend()


def get_fft_lib():
    """The module providing FFTs (jax.numpy.fft; the reference returns its
    loaded CDLL)."""
    import jax.numpy as jnp
    return jnp.fft


def get_fft_lib_fp() -> str:
    """Path of the compute library (libtpu/XLA plugin location)."""
    import jax
    return jax.__file__


def get_lib_md5() -> str:
    """MD5 of the backing library identity (here: jax version + backend)."""
    import jax
    key = f"jax-{jax.__version__}-{get_fft_lib_name()}"
    return hashlib.md5(key.encode()).hexdigest()


def set_fft_lib(system=None, *, lib_ext=None, path=None):
    """No-op: the XLA backend is fixed per platform.  Accepts and ignores
    the reference's dylib-picking arguments so migration code keeps
    working."""
    return None
