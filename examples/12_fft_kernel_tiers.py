"""The TPU FFT tiers and the four-step kernel's T-layout round trip.

Every FFT in the package goes through ``audioflux_tpu.ops.fft``:

* n < 2048            -> dense DFT matmul on the MXU (exact-class);
* 2048 <= n <= 32768  -> the batched four-step Pallas kernel
                         (``ops/pallas_fft.py``, bf16x3, ~1e-5 class);
* larger / non-pow2   -> the native XLA FFT.

Round-trip pipelines (fft -> elementwise -> ifft) can call the kernel
directly and stay in its transposed "T-layout" bin order — zero layout
relayouts in either direction.  This recipe demonstrates both entries
(CPU CI runs the kernel in interpret mode; on a TPU it engages
automatically inside YIN, HPSS, reassignment, the ISTFT family, and
the banked spectrogram scales).
"""
import _util  # noqa: F401  (first: CPU forcing for CI)
import numpy as np
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
from audioflux_tpu.ops import pallas_fft as pf

rng = np.random.default_rng(0)
x = rng.standard_normal((4, 4096)).astype(np.float32)

# 1) generic entry points — tier selection is automatic per backend
X = np.asarray(afft.rfft(jnp.asarray(x)))
print("rfft:", X.shape, X.dtype)

# 2) the kernel's T-layout round trip (interpret mode works anywhere):
#    forward emits bin k1 + n1*k2 at [..., k1, k2]; elementwise work is
#    layout-blind; the inverse consumes T-layout and returns natural
#    sample order — no transposes anywhere.
yr, yi = pf.fft4_fwd(jnp.asarray(x), interpret=True)
print("T-layout spectrum blocks:", yr.shape)           # (4, 32, 128)
power_T = yr * yr + yi * yi                            # elementwise in T
sr, si = yr * power_T, yi * power_T                    # |X|^2 * X
back, _ = pf.fft4_inv(sr, si, out_imag=False, interpret=True)
print("natural-order result:", back.shape)             # (4, 4096)

# 3) natural bin order when a consumer needs it: one relayout
mag_natural = np.asarray(pf.t_to_natural(jnp.sqrt(power_T)))[:, :2049]
ref = np.abs(np.fft.rfft(x))
rel = np.max(np.abs(mag_natural - ref)) / ref.max()
print(f"kernel vs numpy |rfft| rel err: {rel:.2e}")
assert rel < 5e-5

# 4) a fused round trip: YIN's packed autocorrelation in ONE kernel
rev = x[:, ::-1].copy()
acf = np.asarray(pf.fft4_autocorr(jnp.asarray(x), jnp.asarray(rev),
                                  interpret=True))
Z = np.fft.fft(x + 1j * rev)
ref_acf = 0.5 * np.imag(np.fft.ifft(Z * Z))
rel = np.max(np.abs(acf - ref_acf)) / np.max(np.abs(ref_acf))
print(f"fused autocorr rel err: {rel:.2e}")
assert rel < 5e-5
print("ok")
