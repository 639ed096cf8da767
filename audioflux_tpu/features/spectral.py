"""Spectral features — 30+ frame-wise reductions over any band spectrogram.

TPU-first re-design of the reference ``SpectralObj``
(src/feature/spectral_algorithm.c + src/flux_spectral.c): instead of cached
per-frame C loops, every feature is a pure jnp reduction over the band axis,
batched over arbitrary leading dims (channels/files) in one XLA fusion — the
reference's per-channel Python loop (feature/spectral.py:186-196) disappears.

Layout convention matches the reference Python API: inputs are
``(..., fre, time)``; outputs ``(..., time)``. Internally we reduce over the
last axis of ``(..., time, fre)``.

Band subsets (``set_edge`` / ``set_edge_arr``, spectral_algorithm.c:163-218)
are static index arrays applied as an up-front gather, so XLA sees a fixed
shape. Weight-by-original-index semantics (hfc/decrease/rolloff) keep the
*original* band indices, exactly as the C kernels do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Spectral"]


def _prep(m_data_arr, idx):
    """(..., fre, time) -> gathered (..., time, sub) float32."""
    x = jnp.swapaxes(jnp.asarray(m_data_arr, jnp.float32), -1, -2)
    if idx is not None:
        x = x[..., idx]
    return x


def _safe_div(n, d):
    return jnp.where(d != 0, n / jnp.where(d == 0, 1.0, d), 0.0)


class Spectral:
    """Spectral feature extractor over ``num`` bands at ``fre_band_arr`` Hz.

    API mirrors ``python/audioflux/feature/spectral.py:15-2645``;
    ``set_time_length`` is retained as a no-op for drop-in compatibility
    (shapes are discovered from the data here).
    """

    def __init__(self, num: int, fre_band_arr):
        if num < 2:
            raise ValueError("num must be >= 2")
        self.num = int(num)
        self.fre_band_arr = np.asarray(fre_band_arr, np.float32)
        self._idx = np.arange(self.num)

    # -- band subset ---------------------------------------------------------
    def set_time_length(self, time_length: int):  # compat no-op
        pass

    def set_edge(self, start: int, end: int):
        """Restrict features to band indices [start, end] (inclusive)."""
        if 0 <= start < end <= self.num - 1:
            self._idx = np.arange(start, end + 1)

    def set_edge_arr(self, index_arr):
        index_arr = np.asarray(index_arr, np.int64)
        if np.all((index_arr >= 0) & (index_arr <= self.num - 1)):
            self._idx = index_arr

    # -- internals ------------------------------------------------------------
    @property
    def _fre(self):
        return self.fre_band_arr[self._idx]

    @property
    def _wix(self):
        """Original band indices as float weights (hfc/decrease)."""
        return self._idx.astype(np.float32)

    # -- features -------------------------------------------------------------
    def flatness(self, m_data_arr):
        """exp(mean log(x+2e-16)) / mean(x); 0 where mean(x)==0
        (flux_spectral.c:21-52)."""
        x = _prep(m_data_arr, self._idx)
        g = jnp.exp(jnp.mean(jnp.log(x + 2.0e-16), axis=-1))
        m = jnp.mean(x, axis=-1)
        return _safe_div(g, m)

    def flux(self, m_data_arr, step: int = 1, p: float = 2,
             is_positive: bool = False, is_exp: bool = False, tp: int = 0):
        """sum(|x_t - x_{t-step}|^p) (optionally ^1/p, mean, positive-only);
        first ``step`` frames are 0 (flux_spectral.c:55-105)."""
        x = _prep(m_data_arr, self._idx)
        step = max(int(step), 1)
        d = x[..., step:, :] - x[..., :-step, :]
        d = jnp.maximum(d, 0.0) if is_positive else jnp.abs(d)
        d = d * d if p == 2.0 else jnp.power(d, p)
        v = jnp.sum(d, axis=-1)
        if tp:
            v = v / x.shape[-1]
        if is_exp:
            v = jnp.power(v, 1.0 / p)
        pad = [(0, 0)] * (v.ndim - 1) + [(step, 0)]
        return jnp.pad(v, pad)

    def rolloff(self, m_data_arr, threshold: float = 0.95):
        """Frequency below which ``threshold`` of |x|'s cumulative sum lies.

        The reference scales the *signed* band sum by threshold but
        accumulates |x| (flux_spectral.c:107-147): first original index where
        cumsum(|x|) >= threshold*sum(x)."""
        x = _prep(m_data_arr, self._idx)
        target = jnp.sum(x, axis=-1, keepdims=True) * threshold
        c = jnp.cumsum(jnp.abs(x), axis=-1)
        hit = c >= target
        pos = jnp.argmax(hit, axis=-1)  # first True; 0 if none (C keeps idx 0)
        any_hit = jnp.any(hit, axis=-1)
        pos = jnp.where(any_hit, pos, 0)
        return jnp.asarray(self._fre)[pos]

    def centroid(self, m_data_arr):
        """sum(f*x)/sum(x) (flux_spectral.c:149-173)."""
        x = _prep(m_data_arr, self._idx)
        f = jnp.asarray(self._fre)
        return _safe_div(jnp.sum(f * x, axis=-1), jnp.sum(x, axis=-1))

    def spread(self, m_data_arr):
        """sqrt(sum((f-c)^2 x)/sum(x)) (flux_spectral.c:175-201)."""
        x = _prep(m_data_arr, self._idx)
        f = jnp.asarray(self._fre)
        s = jnp.sum(x, axis=-1)
        c = _safe_div(jnp.sum(f * x, axis=-1), s)
        n = jnp.sum((f - c[..., None]) ** 2 * x, axis=-1)
        return jnp.sqrt(_safe_div(n, s))

    def _c12(self, x):
        f = jnp.asarray(self._fre)
        s = jnp.sum(x, axis=-1)
        c1 = _safe_div(jnp.sum(f * x, axis=-1), s)
        c2 = jnp.sqrt(_safe_div(
            jnp.sum((f - c1[..., None]) ** 2 * x, axis=-1), s))
        return f, s, c1, c2

    def skewness(self, m_data_arr):
        """Third central moment / (spread^3 * sum) (flux_spectral.c:203-229)."""
        x = _prep(m_data_arr, self._idx)
        f, s, c1, c2 = self._c12(x)
        n = jnp.sum((f - c1[..., None]) ** 3 * x, axis=-1)
        return _safe_div(n, c2 ** 3 * s)

    def kurtosis(self, m_data_arr):
        """Fourth central moment / (spread^4 * sum) (flux_spectral.c:231-257)."""
        x = _prep(m_data_arr, self._idx)
        f, s, c1, c2 = self._c12(x)
        n = jnp.sum((f - c1[..., None]) ** 4 * x, axis=-1)
        return _safe_div(n, c2 ** 4 * s)

    def entropy(self, m_data_arr, is_norm: bool = False):
        """-sum(p log2(p+1e-16)), p = x/sum(x); /log2(len) if is_norm
        (flux_spectral.c:259-290)."""
        x = _prep(m_data_arr, self._idx)
        p = x / jnp.sum(x, axis=-1, keepdims=True)
        n = -jnp.sum(p * jnp.log2(p + 1e-16), axis=-1)
        if is_norm:
            n = n / np.log2(len(self._idx))
        return n

    def crest(self, m_data_arr):
        """max(x) / mean(x) (flux_spectral.c:292-319)."""
        x = _prep(m_data_arr, self._idx)
        return _safe_div(jnp.max(x, axis=-1), jnp.mean(x, axis=-1))

    def slope(self, m_data_arr):
        """Least-squares slope of x over f (flux_spectral.c:321-347)."""
        x = _prep(m_data_arr, self._idx)
        f = jnp.asarray(self._fre)
        df = f - jnp.mean(f)
        n = jnp.sum(df * (x - jnp.mean(x, axis=-1, keepdims=True)), axis=-1)
        return _safe_div(n, jnp.sum(df * df))

    def decrease(self, m_data_arr):
        """sum_{k>0}((x_k-x_0)/index_k) / (sum(x)-x_0); index is the ORIGINAL
        band index (flux_spectral.c:349-373)."""
        x = _prep(m_data_arr, self._idx)
        x0 = x[..., :1]
        w = jnp.asarray(self._wix[1:])
        n = jnp.sum((x[..., 1:] - x0) / w, axis=-1)
        m = jnp.sum(x, axis=-1) - x0[..., 0]
        return _safe_div(n, m)

    def band_width(self, m_data_arr, p: float = 2):
        """(sum(x*(f-c)^p))^(1/p) (flux_spectral.c:375-410)."""
        x = _prep(m_data_arr, self._idx)
        f = jnp.asarray(self._fre)
        s = jnp.sum(x, axis=-1)
        c = _safe_div(jnp.sum(f * x, axis=-1), s)
        d = f - c[..., None]
        d = d * d if p == 2.0 else jnp.power(d, p)
        v = jnp.sum(x * d, axis=-1)
        if p != 1.0:
            v = jnp.power(v, 1.0 / p)
        return v

    def rms(self, m_data_arr):
        """sqrt(2*sum(x^2 with half-weight DC/Nyquist)/num^2)
        (flux_spectral.c:412-438)."""
        x = _prep(m_data_arr, self._idx)
        w = np.ones(len(self._idx), np.float32)
        w[self._idx == 0] = 0.5
        if self.num % 2 == 0:
            w[self._idx == self.num - 1] = 0.5
        v = jnp.sum(x * x * jnp.asarray(w), axis=-1)
        return jnp.sqrt(2.0 * v / float(self.num) ** 2)

    def energy(self, m_data_arr, is_log: bool = False, gamma: float = 10.0):
        """mean over bands of x^2 (optionally log(1+gamma*x^2))
        (flux_spectral.c:787-823; driver passes isPower=0)."""
        x = _prep(m_data_arr, self._idx)
        v = x * x
        if is_log:
            if gamma <= 0:
                gamma = 10.0
            v = jnp.log(1.0 + gamma * v)
        return jnp.mean(v, axis=-1)

    def hfc(self, m_data_arr):
        """sum(x * original_band_index) (flux_spectral.c:441-462)."""
        x = _prep(m_data_arr, self._idx)
        return jnp.sum(x * jnp.asarray(self._wix), axis=-1)

    def sd(self, m_data_arr, step: int = 1, is_positive: bool = False):
        """flux with p=1 (flux_spectral.c:465-495)."""
        return self.flux(m_data_arr, step=step, p=1.0,
                         is_positive=is_positive)

    def sf(self, m_data_arr, step: int = 1, is_positive: bool = False):
        """flux with p=2 (flux_spectral.c:498-525)."""
        return self.flux(m_data_arr, step=step, p=2.0,
                         is_positive=is_positive)

    def mkl(self, m_data_arr, tp: int = 0):
        """sum(log(1 + x_t/(x_{t-1}+1e-16))); frame 0 is 0
        (flux_spectral.c:528-553)."""
        x = _prep(m_data_arr, self._idx)
        r = jnp.log1p(x[..., 1:, :] / (x[..., :-1, :] + 1e-16))
        v = jnp.sum(r, axis=-1)
        if tp:
            v = v / x.shape[-1]
        pad = [(0, 0)] * (v.ndim - 1) + [(1, 0)]
        return jnp.pad(v, pad)

    # -- phase-based ----------------------------------------------------------
    def _pd(self, m_spec_arr, m_phase_arr, is_weight, is_norm):
        """mean |phi_t - 2 phi_{t-1} + phi_{t-2}| (optionally spec-weighted /
        spec-mean-normalized); frames 0,1 are 0 (flux_spectral.c:556-653)."""
        s = _prep(m_spec_arr, self._idx)
        ph = _prep(m_phase_arr, self._idx)
        d = jnp.abs(ph[..., 2:, :] - 2 * ph[..., 1:-1, :] + ph[..., :-2, :])
        if is_weight or is_norm:
            d = d * s[..., 2:, :]
        v = jnp.mean(d, axis=-1)
        if is_norm:
            m = jnp.mean(s[..., 2:, :], axis=-1)
            v = v / (m + 1e-16)
        pad = [(0, 0)] * (v.ndim - 1) + [(2, 0)]
        return jnp.pad(v, pad)

    def pd(self, m_data_arr, m_phase_arr):
        return self._pd(m_data_arr, m_phase_arr, False, False)

    def wpd(self, m_data_arr, m_phase_arr):
        return self._pd(m_data_arr, m_phase_arr, True, False)

    def nwpd(self, m_data_arr, m_phase_arr):
        return self._pd(m_data_arr, m_phase_arr, False, True)

    def _cd(self, m_spec_arr, m_phase_arr, is_rectify):
        """Complex-domain deviation |S_t e^{i phi_t} - S_{t-1} e^{i(2phi_{t-1}
        - phi_{t-2})}|; frame 0 is 0, frame 1 has no prediction term
        (flux_spectral.c:656-730)."""
        s = _prep(m_spec_arr, self._idx)
        ph = _prep(m_phase_arr, self._idx)
        T = s.shape[-2]
        cur = s * jnp.exp(1j * ph.astype(jnp.complex64))
        # predicted previous-frame target: 2*phi_{t-1} - phi_{t-2}
        tgt_ph = 2 * ph[..., 1:-1, :] - ph[..., :-2, :]
        pred = s[..., 1:-1, :] * jnp.exp(1j * tgt_ph.astype(jnp.complex64))
        diff1 = jnp.abs(cur[..., 1:2, :])  # i == 1: no subtraction
        diffs = jnp.abs(cur[..., 2:, :] - pred)
        d = jnp.concatenate([diff1, diffs], axis=-2) if T > 1 else diffs
        if is_rectify:
            keep = s[..., 1:, :] > s[..., :-1, :]
            d = jnp.where(keep, d, 0.0)
        v = jnp.sum(d, axis=-1)
        pad = [(0, 0)] * (v.ndim - 1) + [(1, 0)]
        return jnp.pad(v, pad)

    def cd(self, m_data_arr, m_phase_arr):
        return self._cd(m_data_arr, m_phase_arr, False)

    def rcd(self, m_data_arr, m_phase_arr):
        return self._cd(m_data_arr, m_phase_arr, True)

    def broadband(self, m_data_arr, threshold: float = 0):
        """count of bands with 10*log10(x_t/x_{t-1}) > threshold; frame 0 is 0
        (flux_spectral.c:733-751)."""
        x = _prep(m_data_arr, self._idx)
        r = 10.0 * jnp.log10(x[..., 1:, :] / x[..., :-1, :])
        v = jnp.sum((r > threshold).astype(jnp.float32), axis=-1)
        pad = [(0, 0)] * (v.ndim - 1) + [(1, 0)]
        return jnp.pad(v, pad)

    def novelty(self, m_data_arr, step: int = 1, threshold: float = 0.0,
                method_type=0, data_type=0):
        """Novelty via sub/entroy/KL/IS distance, value-sum or count above
        threshold (flux_spectral.c:754-833)."""
        from audioflux_tpu.types import (SpectralNoveltyMethodType,
                                         SpectralNoveltyDataType)
        mt = SpectralNoveltyMethodType(method_type)
        dt = SpectralNoveltyDataType(data_type)
        x = _prep(m_data_arr, self._idx)
        step = max(int(step), 1)
        cur, pre = x[..., step:, :], x[..., :-step, :]
        if mt == SpectralNoveltyMethodType.SUB:
            d = cur - pre
        elif mt == SpectralNoveltyMethodType.ENTROY:
            d = jnp.log(cur / (pre + 1e-16))
        elif mt == SpectralNoveltyMethodType.KL:
            d = cur * jnp.log(cur / (pre + 1e-16))
        else:  # IS
            r = cur / (pre + 1e-16)
            d = r - jnp.log(r) - 1.0
        mask = d > threshold
        if dt == SpectralNoveltyDataType.VALUE:
            v = jnp.sum(jnp.where(mask, d, 0.0), axis=-1)
        else:
            v = jnp.sum(mask.astype(jnp.float32), axis=-1)
        pad = [(0, 0)] * (v.ndim - 1) + [(step, 0)]
        return jnp.pad(v, pad)

    def eef(self, m_data_arr, is_norm: bool = False):
        """sqrt(1+|energy*entropy|) (spectral_algorithm.c:757-816)."""
        e = self.energy(m_data_arr)
        h = self.entropy(m_data_arr, is_norm)
        return jnp.sqrt(1.0 + jnp.abs(e * h))

    def eer(self, m_data_arr, is_norm: bool = False, gamma: float = 1.0):
        """sqrt(1+|log(1+gamma*energy)/entropy|)
        (spectral_algorithm.c:818-871)."""
        e = self.energy(m_data_arr)
        h = self.entropy(m_data_arr, is_norm)
        return jnp.sqrt(1.0 + jnp.abs(jnp.log1p(gamma * e) / h))

    # -- statistics ------------------------------------------------------------
    def max(self, m_data_arr):
        """(max value, freq of max) per frame (spectral_algorithm.c:874-917)."""
        x = _prep(m_data_arr, self._idx)
        pos = jnp.argmax(x, axis=-1)
        return jnp.max(x, axis=-1), jnp.asarray(self._fre)[pos]

    def mean(self, m_data_arr):
        """(mean value, mean band freq) per frame
        (spectral_algorithm.c:919-927)."""
        x = _prep(m_data_arr, self._idx)
        v = jnp.mean(x, axis=-1)
        f = jnp.full(v.shape, float(np.mean(self._fre)), jnp.float32)
        return v, f

    def var(self, m_data_arr):
        """(sample variance of values, of band freqs) per frame, ddof=1
        (spectral_algorithm.c:929-987)."""
        x = _prep(m_data_arr, self._idx)
        n = len(self._idx)
        v = jnp.var(x, axis=-1, ddof=1)
        fvar = float(np.var(self._fre.astype(np.float64), ddof=1))
        return v, jnp.full(v.shape, fvar, jnp.float32)
