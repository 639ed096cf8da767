"""Fused Pallas mel-spectrogram + MFCC kernel.

The hot path of the framework (reference benchmark: mel spectrogram + MFCC,
``benchmark/`` in the reference repo) is HBM-bound when expressed as
separate XLA ops: the framed tile (frames x fft = ~4x data expansion), the
FFT intermediates and the power spectrum each round-trip HBM.  This kernel
fuses the whole pipeline in VMEM:

    audio rows -> overlapped framing -> window -> real-DFT (MXU matmul)
    -> power -> mel filterbank matmul -> log10 -> DCT (MFCC)

HBM traffic becomes audio-in + (mel, mfcc)-out only, and all the FLOPs run
as large MXU matmuls.  The DFT is the dense real-input transform
``frames @ [cos|sin]`` over the n_fft//2+1 non-mirrored bins — more FLOPs
than an FFT, but on the MXU it is faster than XLA's HBM-streaming FFT and
it fuses with the mel projection.

Mosaic layout rules shape the framing: in-kernel overlapped slicing of one
audio block concatenates vectors at different sublane offsets (unsupported),
so the caller passes ``k = n_fft//slide`` slide-shifted *views* of the row-
reshaped audio and the kernel concatenates them along the lane dimension
(zero sublane offset for every operand).

The generic (XLA-fft) path in ``transforms.spectrogram`` remains the
default and handles every shape; this kernel is the TPU fast path used by
``bench.py`` and ``MelSpectrogram.spectrogram_fused``.  It works for any
power-domain filterbank (mel/bark/erb/linear...), requires slide | n_fft,
128 | slide, and frame count divisible by the frame tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedMelPlan", "fused_mel_mfcc"]


class FusedMelPlan:
    """Precomputed constants for the fused kernel.

    Parameters mirror ``MelSpectrogram``: ``window`` (n_fft,), ``mel_fb``
    (num_mel, n_fft//2+1) power-domain filterbank, ``dct`` (cc_num, num_mel)
    MFCC matrix (type-II, as in the reference's xxcc path).
    """

    def __init__(self, window, mel_fb, dct, slide_length: int):
        window = np.asarray(window, np.float32)
        mel_fb = np.asarray(mel_fb, np.float32)
        dct = np.asarray(dct, np.float32)
        self.n_fft = int(window.shape[0])
        self.slide = int(slide_length)
        assert self.n_fft % self.slide == 0, "fused kernel needs slide | fft"
        assert self.slide % 128 == 0, "fused kernel needs 128 | slide"
        self.k = self.n_fft // self.slide
        self.num_mel = int(mel_fb.shape[0])
        self.cc_num = int(dct.shape[0])

        n_bins = self.n_fft // 2 + 1
        nb_pad = -n_bins % 128
        self.n_bins_pad = n_bins + nb_pad
        n = np.arange(self.n_fft)[:, None]
        kk = np.arange(self.n_bins_pad)[None, :]
        ang = -2.0 * np.pi * n * kk / self.n_fft
        dr = np.cos(ang)
        di = np.sin(ang)
        dr[:, n_bins:] = 0.0
        di[:, n_bins:] = 0.0
        self.dr = dr.astype(np.float32)
        self.di = di.astype(np.float32)
        # bf16 hi/lo splits for the fast (bf16x3) path: x@D ~ xh@Dh + xh@Dl
        # + xl@Dh, three single-pass MXU dots instead of six fp32 passes.
        import ml_dtypes
        for name in ("dr", "di"):
            full = getattr(self, name)
            hi = full.astype(ml_dtypes.bfloat16)
            lo = (full - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            setattr(self, name + "_hi", hi)
            setattr(self, name + "_lo", lo)
        self.window = window.reshape(1, self.n_fft)

        mel_pad = -self.num_mel % 128
        self.mel_pad = self.num_mel + mel_pad
        mel_p = np.zeros((self.n_bins_pad, self.mel_pad), np.float32)
        mel_p[:n_bins, :self.num_mel] = mel_fb.T
        self.mel_p = mel_p
        cc_pad = -self.cc_num % 8
        dct_t = np.zeros((self.mel_pad, self.cc_num + cc_pad), np.float32)
        dct_t[:self.num_mel, :self.cc_num] = dct.T
        self.dct_t = dct_t
        self.cc_pad = self.cc_num + cc_pad

        # --- four-step (Cooley-Tukey N = n1*128) constants -------------
        # x reshaped (frames, n1, 128) with n = n1_idx*128 + n2; with bin
        # index k = k1 + n1*k2:
        #   A[k1,f,n2] = sum_q W_n1[k1,q] x[f,q,n2]          (thin matmul)
        #   B = A * W_N^(k1*n2)                              (twiddle)
        #   X[k1,f,k2] = sum_n2 B[k1,f,n2] W_128[k2,n2]      (MXU matmul)
        # ~4.5x fewer MACs than the dense real-DFT; the k = k1 + n1*k2
        # permutation is folded into a per-k1 stack of mel matrices.
        n1 = self.n_fft // 128
        self.fs_n1 = n1 if (n1 >= 2 and self.n_fft == n1 * 128) else 0
        if self.fs_n1:
            import ml_dtypes
            w1 = np.exp(-2j * np.pi * np.outer(np.arange(n1),
                                               np.arange(n1)) / n1)
            tw = np.exp(-2j * np.pi * np.outer(np.arange(n1),
                                               np.arange(128)) / self.n_fft)
            w2 = np.exp(-2j * np.pi * np.outer(np.arange(128),
                                               np.arange(128)) / 128)
            self.fs_w1r = w1.real.astype(np.float32)
            self.fs_w1i = w1.imag.astype(np.float32)
            self.fs_twr = tw.real.astype(np.float32).reshape(n1, 1, 128)
            self.fs_twi = tw.imag.astype(np.float32).reshape(n1, 1, 128)
            self.fs_w2r = w2.real.astype(np.float32)
            self.fs_w2i = w2.imag.astype(np.float32)
            # Karatsuba third matrix for the fast path: wr + wi
            self.fs_w2s = (w2.real + w2.imag).astype(np.float32)
            for name in ("fs_w2r", "fs_w2i", "fs_w2s"):
                full = getattr(self, name)
                hi = full.astype(ml_dtypes.bfloat16)
                lo = (full - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
                setattr(self, name + "_hi", hi)
                setattr(self, name + "_lo", lo)
            self.fs_win = window.reshape(n1, 1, 128)
            melp4 = np.zeros((n1, 128, self.mel_pad), np.float32)
            for k1 in range(n1):
                for k2 in range(128):
                    kbin = k1 + n1 * k2
                    if kbin < n_bins:
                        melp4[k1, k2, :self.num_mel] = mel_fb[:, kbin]
            self.fs_melp = melp4
            hi = melp4.astype(ml_dtypes.bfloat16)
            lo = (melp4 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            self.fs_melp_hi, self.fs_melp_lo = hi, lo

        # --- fs2: natural-row four-step with in-kernel gather ----------
        # n = 128*q + n2, k = k1 + Q*k2 (k1 in [0,Q), k2 in [0,128)):
        #   X[k] = sum_n2 W128[n2,k2] * tw[k1,n2] * sum_q W_Q[k1,q] x[q,n2]
        # Rows packed (f_lo, q), FL = 128//Q frames per row-block; frames
        # are gathered from plain row-reshaped audio by a 0/1 selection
        # matmul inside the kernel (no XLA-side framing copies at all).
        Q = self.n_fft // 128
        FL = (128 // Q) if Q and 128 % Q == 0 else 0
        fr = self.slide // 128
        blk = FL * fr
        off_max = (FL - 1) * fr + Q - 1 if FL else 0
        ok2 = (Q >= 2 and self.n_fft == Q * 128 and FL
               and self.slide % 128 == 0 and off_max < 2 * blk)
        self.fs2_q = Q if ok2 else 0
        self.fs4_ok = False
        self.fsk_taps = None
        self.fs3_taps = None
        if ok2:
            import ml_dtypes
            self.fs2_fl, self.fs2_fr, self.fs2_blk = FL, fr, blk
            N = self.n_fft
            g = np.zeros((128, 2 * blk), np.float32)
            for f_lo in range(FL):
                for qi in range(Q):
                    g[f_lo * Q + qi, fr * f_lo + qi] = 1.0
            self.fs2_g = g.astype(ml_dtypes.bfloat16)  # exact (0/1)
            q_of_r = (np.arange(128) % Q)
            n2_idx = np.arange(128)
            self.fs2_win = window[(q_of_r[:, None] * 128
                                   + n2_idx[None, :])].astype(np.float32)
            wq = np.exp(-2j * np.pi * np.outer(np.arange(Q),
                                               np.arange(Q)) / Q)
            bd = np.kron(np.eye(FL), wq)       # rows (f_lo,k1) x (f_lo,q)
            k1_sub = np.tile(np.arange(Q), FL)
            tw = np.exp(-2j * np.pi * np.outer(k1_sub, n2_idx) / N)
            w128 = np.exp(-2j * np.pi * np.outer(n2_idx, n2_idx) / 128)
            mats = {"bdr": bd.real, "bdi": bd.imag,
                    "wr": w128.real, "wi": w128.imag,
                    "ws": w128.real + w128.imag}
            for name, full in mats.items():
                full = full.astype(np.float32)
                hi = full.astype(ml_dtypes.bfloat16)
                lo = (full - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
                setattr(self, "fs2_" + name + "_hi", hi)
                setattr(self, "fs2_" + name + "_lo", lo)
            self.fs2_twr = tw.real.astype(np.float32)
            self.fs2_twi = tw.imag.astype(np.float32)
            # mirror-folded filterbank: |X[N-k]|^2 == |X[k]|^2 for real
            # input, so bins living in rows k1 > Q/2 are folded into their
            # mirror cell (Q-k1, 127-k2) — the mel stage only touches
            # Q/2 + 1 of the Q row groups
            n_k1 = Q // 2 + 1
            self.fs2_nk1 = n_k1
            fbs = np.zeros((n_k1, 128, self.mel_pad), np.float32)
            for k1 in range(Q):
                for k2 in range(128):
                    kbin = k1 + Q * k2
                    if kbin < n_bins:
                        if k1 <= Q // 2:
                            fbs[k1, k2, :self.num_mel] += mel_fb[:, kbin]
                        else:
                            fbs[Q - k1, 127 - k2,
                                :self.num_mel] += mel_fb[:, kbin]
            hi = fbs.astype(ml_dtypes.bfloat16)
            lo = (fbs - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            self.fs2_fb_hi, self.fs2_fb_lo = hi, lo

            # spectral cosine-sum windows:
            # win[n] = c0 + sum_m 2*c_m*cos(2 pi m n / N)  <=>  DFT-domain
            # taps (c_M .. c_1, c0, c1 .. c_M) — lets the kernel skip
            # time-domain windowing entirely, which in turn lets the frame
            # gather fold into the stage-A matrix (BD @ G, one combined
            # matmul).  M <= 1 covers rect/hann/hamm (fs2/fs3 kernels);
            # fs4 additionally takes blackman (M=2), blackman-harris /
            # blackman-nuttall (M=3) and flattop (M=4) — any m < Q is
            # still at most a +-1 lane borrow, so the same roll + phase
            # ramp stencil applies per tap pair.
            nn = np.arange(N)
            c0 = float(np.mean(window))
            m_max = min(4, Q - 1)
            cos_m = [np.cos(2 * np.pi * m * nn / N)
                     for m in range(1, m_max + 1)]
            cms = [float(np.mean(window * c)) for c in cos_m]
            fit = c0 + sum(2 * cm * c for cm, c in zip(cms, cos_m))
            self.fsk_taps = None
            if np.max(np.abs(fit - window)) < 1e-6 * max(
                    1.0, np.max(np.abs(window))):
                # trim cosine orders whose coefficient is numerical
                # residue of the float32 window (each contributes less
                # than the 1e-6 fit criterion itself)
                m_used = m_max
                tap_floor = 1e-7 * max(1.0, float(np.max(np.abs(window))))
                while m_used and abs(cms[m_used - 1]) < tap_floor:
                    m_used -= 1
                self.fsk_taps = (c0,) + tuple(cms[:m_used])
            if self.fsk_taps is not None and len(self.fsk_taps) <= 2:
                c1 = cms[0] if cms else 0.0
                self.fs3_taps = (c0, c1)
                # all Q row groups, ROTATED one position (k1(p) = p-1 mod
                # Q): every mel-read group (k1 <= Q/2, at p = k1+1) then
                # has both its 3-tap neighbors at p +- 1, so the taps are
                # plain sublane rolls with no edge masking.  (Restricting
                # to fewer groups measured slower — Mosaic pads M to 128.)
                k1_list = [(p - 1) % Q for p in range(Q)]
                self.fs3_ngrp = Q
                bd3 = np.kron(np.eye(FL), wq[k1_list, :])
                bdg = bd3 @ g.astype(np.float64)       # (nrows, 2*blk)
                for name, full in (("bdgr", bdg.real), ("bdgi", bdg.imag)):
                    full = full.astype(np.float32)
                    hi = full.astype(ml_dtypes.bfloat16)
                    lo = (full - hi.astype(np.float32)).astype(
                        ml_dtypes.bfloat16)
                    setattr(self, "fs3_" + name + "_hi", hi)
                    setattr(self, "fs3_" + name + "_lo", lo)
                k1_sub3 = np.tile(np.asarray(k1_list), FL)
                tw3 = np.exp(-2j * np.pi * np.outer(k1_sub3, n2_idx) / N)
                # the k1=0 rows' up-neighbor (k1=Q-1) lives one k2 lane
                # to the left; pre-shift that row group by folding the
                # lane shift into its twiddle as a phase ramp
                ngrp = len(k1_list)
                shift_phase = np.exp(+2j * np.pi * n2_idx / 128)
                for f_lo in range(FL):
                    tw3[f_lo * ngrp] *= shift_phase
                self.fs3_twr = tw3.real.astype(np.float32)
                self.fs3_twi = tw3.imag.astype(np.float32)
            else:
                self.fs3_taps = None

            # --- fs4: frame-pair packing (two frames per complex DFT) --
            # z = frame_2j + i*frame_{2j+1}: one complex four-step DFT
            # serves two real frames.  Stage C is computed SEPARABLY
            # (Fr = DFT128(Re B), Fi = DFT128(Im B): 4 real dots x bf16x3
            # = 12 passes per 16 frames vs Karatsuba's 18), because the
            # real-vector conjugate identity then yields the lane-mirror
            # Xlm[p,k2] = X[p,(-k2)%128] = conj(Fr)+i*conj(Fi) for free —
            # and the frame unpack |X_a|^2, |X_b|^2 needs Z[-k].  Rows use
            # an INTERLEAVED group order [0,1,Q-1,2,Q-2,...,Q/2] so the
            # row part of the mirror (k1 -> -k1) is a +-1 sublane roll;
            # each cosine order m of the spectral window becomes a
            # per-row roll stencil with lane-borrow rows (tables below).
            self.fs4_ok = (self.fsk_taps is not None and Q % 2 == 0
                           and Q >= 4)
            if self.fs4_ok:
                blk4 = 2 * FL * fr
                self.fs4_blk = blk4
                self.fs4_fpu = 2 * FL  # frames per unit
                order = [0]
                for c in range(1, Q // 2):
                    order += [c, Q - c]
                order += [Q // 2]
                pos = np.zeros(Q, np.int64)
                for p, k1 in enumerate(order):
                    pos[k1] = p
                self.fs4_order = order
                # stage A: gather + Q-DFT + pair-packing folded into two
                # real matrices over the 2-block row window
                wqc = np.exp(-2j * np.pi * np.outer(np.arange(Q),
                                                    np.arange(Q)) / Q)
                m4 = np.zeros((FL * Q, 2 * blk4), np.complex128)
                for j in range(FL):
                    for p in range(Q):
                        row = j * Q + p
                        for qq in range(Q):
                            m4[row, (2 * j) * fr + qq] += wqc[order[p], qq]
                            m4[row, (2 * j + 1) * fr + qq] += (
                                1j * wqc[order[p], qq])
                # real/imag parts row-stacked into ONE matrix so stage A
                # is a single (2R,C) dot chain instead of two (R,C) ones
                m_all = np.concatenate([m4.real, m4.imag],
                                       axis=0).astype(np.float32)
                hi = m_all.astype(ml_dtypes.bfloat16)
                lo = (m_all - hi.astype(np.float32)).astype(
                    ml_dtypes.bfloat16)
                self.fs4_m_hi, self.fs4_m_lo = hi, lo
                tw4 = np.exp(-2j * np.pi * np.outer(
                    np.tile(np.asarray(order), FL), n2_idx) / N)
                self.fs4_twr = tw4.real.astype(np.float32)
                self.fs4_twi = tw4.imag.astype(np.float32)
                # +1 lane-borrow phase ramp: X[p,k2+1] =
                # DFT128(B[p,n2] * exp(-2i*pi*n2/128))[k2]; the -1
                # borrow uses its conjugate (kernel flips rampi's sign)
                ramp = np.exp(-2j * np.pi * n2_idx / 128)
                self.fs4_rampr = ramp.real.astype(np.float32).reshape(1, 128)
                self.fs4_rampi = ramp.imag.astype(np.float32).reshape(1, 128)
                # tap read tables, one (du, lu, dd, ld) quad per cosine
                # order m: for tensor row position p (k1 = order[p]), bin
                # k+m lives at row p+du[p] lane k2+lu[p], bin k-m at
                # p+dd[p] lane k2+ld[p].  Since m < Q the k1 wrap carries
                # at most one k2 lane, and both positions of any roll live
                # inside the same Q-row block by construction of the
                # interleave.
                tabs = []
                for m in range(1, len(self.fsk_taps)):
                    du = np.zeros(Q, np.int64); lu = np.zeros(Q, np.int64)
                    dd = np.zeros(Q, np.int64); ld = np.zeros(Q, np.int64)
                    for p in range(Q):
                        k1 = order[p]
                        nk = k1 + m
                        if nk >= Q:
                            du[p] = pos[nk - Q] - p; lu[p] = 1
                        else:
                            du[p] = pos[nk] - p
                        pk = k1 - m
                        if pk < 0:
                            dd[p] = pos[pk + Q] - p; ld[p] = -1
                        else:
                            dd[p] = pos[pk] - p
                    tabs.append((du, lu, dd, ld))
                self.fs4_tap_tables = tuple(tabs)
                # mel reads group k1 at row position pos[k1]
                self.fs4_melpos = [int(pos[k1]) for k1 in range(Q // 2 + 1)]

        # --- flip factorization (N = Q*128, full-MXU stages) -----------
        # n = q + Q*n2 (q in [0,Q), n2 in [0,128)), k = k1 + 128*k2:
        #   stage 1:  A[q, k1] = sum_n2 x[q + Q*n2] W128[n2, k1]
        #             -> contracts the LANE dim: (rows,128)@(128,128)
        #   stage 2:  B = A * exp(-2i pi q k1 / N)            (twiddle)
        #   stage 3:  X[k2, k1] = sum_q WQ[k2, q] B[q, k1]
        # Rows are packed (f_lo, q) with FL = 128//Q frames per row-block,
        # so stage 3 is one block-diagonal (I_FL kron WQ) 128x128 matmul —
        # both DFT stages hit the full 128-wide MXU (the four-step above
        # runs its Q-DFT as a 16x16 dot that idles >85% of the array).
        # Conjugate symmetry: mel only needs bins k <= N/2, i.e. row
        # groups k2 <= Q/2 — the mel stage skips the mirror half.
        Q = self.n_fft // 128
        ok = (Q >= 2 and self.n_fft == Q * 128 and 128 % Q == 0
              and self.slide % Q == 0
              and (128 // Q) * (self.slide // Q) >= 128)
        self.flip_q = Q if ok else 0
        if ok:
            import ml_dtypes
            FL = 128 // Q
            self.flip_fl = FL
            N = self.n_fft
            # windowing in the (row=(f_lo,q), lane=n2) layout
            q_idx = np.arange(128) % Q
            n2_idx = np.arange(128)
            self.flip_win = window[(q_idx[:, None] + Q * n2_idx[None, :])
                                   ].astype(np.float32)
            w128 = np.exp(-2j * np.pi * np.outer(np.arange(128),
                                                 np.arange(128)) / 128)
            tw = np.exp(-2j * np.pi * np.outer(q_idx, np.arange(128)) / N)
            self.flip_twr = tw.real.astype(np.float32)
            self.flip_twi = tw.imag.astype(np.float32)
            wq = np.exp(-2j * np.pi * np.outer(np.arange(Q),
                                               np.arange(Q)) / Q)
            bd = np.kron(np.eye(FL), wq)          # rows (f_lo,k2) x (f_lo,q)
            mats = {"w1r": w128.real, "w1i": w128.imag,
                    "bdr": bd.real, "bdi": bd.imag,
                    "bds": bd.real + bd.imag}
            for name, full in mats.items():
                full = full.astype(np.float32)
                hi = full.astype(ml_dtypes.bfloat16)
                lo = (full - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
                setattr(self, "flip_" + name + "_hi", hi)
                setattr(self, "flip_" + name + "_lo", lo)
            n_k2 = Q // 2 + 1
            self.flip_nk2 = n_k2
            fbs = np.zeros((n_k2, 128, self.mel_pad), np.float32)
            for k2 in range(n_k2):
                for k1 in range(128):
                    kbin = k1 + 128 * k2
                    if kbin < n_bins:
                        fbs[k2, k1, :self.num_mel] = mel_fb[:, kbin]
            hi = fbs.astype(ml_dtypes.bfloat16)
            lo = (fbs - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            self.flip_fb_hi, self.flip_fb_lo = hi, lo
            self.flip_fb = fbs


def _kernel(*refs, n_shift: int, log_floor: float, precision, fast: bool):
    if fast:
        (win_ref, drh_ref, drl_ref, dih_ref, dil_ref, melp_ref,
         dct_ref) = refs[n_shift:n_shift + 7]
        mel_out, cc_out = refs[n_shift + 7:]
    else:
        (win_ref, dr_ref, di_ref, melp_ref,
         dct_ref) = refs[n_shift:n_shift + 5]
        mel_out, cc_out = refs[n_shift + 5:]
    # framing: concat the k slide-shifted row views along lanes
    frames = jnp.concatenate([refs[q][0] for q in range(n_shift)], axis=1)
    frames = frames * win_ref[0]
    if fast:
        # bf16x3: one rounding split of the frames, pre-split D matrices
        fh = frames.astype(jnp.bfloat16)
        fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot3(h_ref, l_ref):
            d = functools.partial(jax.lax.dot,
                                  preferred_element_type=jnp.float32)
            return d(fh, h_ref[...]) + d(fh, l_ref[...]) + d(fl, h_ref[...])

        xr = dot3(drh_ref, drl_ref)
        xi = dot3(dih_ref, dil_ref)
    else:
        xr = jax.lax.dot(frames, dr_ref[...], precision=precision)
        xi = jax.lax.dot(frames, di_ref[...], precision=precision)
    power = xr * xr + xi * xi
    mel = jax.lax.dot(power, melp_ref[...], precision=precision)
    mel_out[0, :, :] = mel
    logm = jnp.log10(jnp.maximum(mel, log_floor))
    cc_out[0, :, :] = jax.lax.dot(logm, dct_ref[...], precision=precision)


def _bf16x3(a, b_hi_ref, b_lo_ref, contract=None):
    """fp32-accurate matmul from three single-pass bf16 MXU dots."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh, bl = b_hi_ref, b_lo_ref
    if contract is None:
        d = functools.partial(jax.lax.dot,
                              preferred_element_type=jnp.float32)
    else:
        d = functools.partial(jax.lax.dot_general,
                              dimension_numbers=contract,
                              preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _kernel4(*refs, n1: int, tile: int, log_floor: float, precision,
             fast: bool):
    idx = n1
    win_ref = refs[idx]
    w1r_ref, w1i_ref, twr_ref, twi_ref = refs[idx + 1:idx + 5]
    idx += 5
    if fast:
        (w2rh_ref, w2rl_ref, w2ih_ref, w2il_ref, w2sh_ref,
         w2sl_ref) = refs[idx:idx + 6]
        melph_ref, melpl_ref, dct_ref = refs[idx + 6:idx + 9]
        idx += 9
    else:
        w2r_ref, w2i_ref = refs[idx:idx + 2]
        melp_ref, dct_ref = refs[idx + 2:idx + 4]
        idx += 4
    mel_out, cc_out = refs[idx:]

    # framing: stack the n1 128-wide row views along a leading axis
    x = jnp.concatenate([refs[q][...] for q in range(n1)], axis=0)
    x = x * win_ref[...]  # (n1, tile, 128) windowed pieces

    # stage 1: thin DFT over the n1 pieces -> A[k1, f, n2]
    cd_first = (((1,), (0,)), ((), ()))
    ar = jax.lax.dot_general(w1r_ref[...], x, cd_first, precision=precision)
    ai = jax.lax.dot_general(w1i_ref[...], x, cd_first, precision=precision)
    # stage 2: twiddle
    br = (ar * twr_ref[...] - ai * twi_ref[...]).reshape(n1 * tile, 128)
    bi = (ar * twi_ref[...] + ai * twr_ref[...]).reshape(n1 * tile, 128)
    # stage 3: DFT-128 over lanes (the dominant matmul)
    cd_last = (((1,), (1,)), ((), ()))
    if fast:
        # Karatsuba: 3 complex-product matmuls instead of 4
        #   t1 = br@wr, t2 = bi@wi, t3 = (br+bi)@(wr+wi)
        #   xr = t1 - t2,  xi = t3 - t1 - t2
        t1 = _bf16x3(br, w2rh_ref[...], w2rl_ref[...], cd_last)
        t2 = _bf16x3(bi, w2ih_ref[...], w2il_ref[...], cd_last)
        t3 = _bf16x3(br + bi, w2sh_ref[...], w2sl_ref[...], cd_last)
        xr = t1 - t2
        xi = t3 - t1 - t2
    else:
        xr = (jax.lax.dot_general(br, w2r_ref[...], cd_last,
                                  precision=precision)
              - jax.lax.dot_general(bi, w2i_ref[...], cd_last,
                                    precision=precision))
        xi = (jax.lax.dot_general(br, w2i_ref[...], cd_last,
                                  precision=precision)
              + jax.lax.dot_general(bi, w2r_ref[...], cd_last,
                                    precision=precision))
    power = xr * xr + xi * xi  # (n1*tile, 128) = [k1, f, k2]

    # mel: per-k1 accumulating matmuls (bin permutation inside the matrices)
    mel = None
    for k1 in range(n1):
        p_k = power[k1 * tile:(k1 + 1) * tile]
        if fast:
            m_k = _bf16x3(p_k, melph_ref[k1], melpl_ref[k1])
        else:
            m_k = jax.lax.dot(p_k, melp_ref[k1], precision=precision)
        mel = m_k if mel is None else mel + m_k
    mel_out[0, :, :] = mel
    logm = jnp.log10(jnp.maximum(mel, log_floor))
    cc_out[0, :, :] = jax.lax.dot(logm, dct_ref[...], precision=precision)


def _kernel_fs2(main_ref, halo_ref, g_ref, win_ref, bdrh, bdrl, bdih, bdil,
                twr_ref, twi_ref, wrh, wrl, wih, wil, wsh, wsl, fbh, fbl,
                dct_ref, mel_out, cc_out, *, t8: int, blk: int, fl: int,
                q: int, log_floor: float, precision):
    """Natural-row four-step: in-kernel frame gather + full-MXU DFT stages.

    Input is the plain row-reshaped audio (no XLA-side framing or comb
    relayout — XLA strided-slice framing runs at ~1/6 of HBM bandwidth
    and dominated the older kernels' wall time).  Per grid step:

      window rows -> 0/1 gather matmul (exact: two bf16 passes select
      disjoint hi/lo parts) -> rows (f_lo, q) -> block-diag I_FL (x) W_Q
      row-DFT -> twiddle -> 128-DFT over lanes (Karatsuba complex x
      bf16x3) -> power -> per-k1 mel accumulation -> log10 -> DCT.

    Layout is u-major (t8 leading) throughout, so the output needs no
    final transpose: out rows flatten directly to frame order.
    """
    x3 = main_ref[0].reshape(t8, blk, 128)
    h3 = halo_ref[0].reshape(1, blk, 128)
    full = jnp.concatenate([x3, h3], axis=0)          # (t8+1, blk, 128)
    w = jnp.concatenate([jax.lax.slice_in_dim(full, 0, t8, axis=0),
                         jax.lax.slice_in_dim(full, 1, t8 + 1, axis=0)],
                        axis=1)                        # (t8, 2*blk, 128)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    g = g_ref[...]                                     # (128, 2*blk) bf16
    gb = jnp.broadcast_to(g, (t8, 128, 2 * blk))
    cd_b = (((2,), (1,)), ((0,), (0,)))

    def bdot(a, b):
        return jax.lax.dot_general(a, b, cd_b,
                                   preferred_element_type=jnp.float32)

    # exact gather: the hi/lo parts are selected separately and recombined
    xg = bdot(gb, wh) + bdot(gb, wl)                   # (t8, 128r, 128n2)
    xw = xg * win_ref[...][None, :, :]

    # stage A: block-diagonal Q-point DFT over the row (q) dim; only the
    # k1 <= Q/2 row groups exist (the mirror-folded mel never reads more)
    ah = xw.astype(jnp.bfloat16)
    al = (xw - ah.astype(jnp.float32)).astype(jnp.bfloat16)

    def adot(m_hi, m_lo):
        mh = jnp.broadcast_to(m_hi[...], (t8,) + m_hi.shape)
        ml = jnp.broadcast_to(m_lo[...], (t8,) + m_lo.shape)
        return bdot(mh, ah) + bdot(ml, ah) + bdot(mh, al)

    ar = adot(bdrh, bdrl)
    ai = adot(bdih, bdil)
    # stage B: twiddle (VPU); tw depends on (k1, n2) only
    twr = twr_ref[...][None]
    twi = twi_ref[...][None]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # stage C: 128-DFT over the lane (n2) dim; Karatsuba x bf16x3
    cd_l = (((2,), (0,)), ((), ()))

    def ldot3(a, m_hi, m_lo):
        h = a.astype(jnp.bfloat16)
        lo = (a - h.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jax.lax.dot_general, dimension_numbers=cd_l,
                              preferred_element_type=jnp.float32)
        return (d(h, m_hi[...]) + d(h, m_lo[...]) + d(lo, m_hi[...]))

    t1 = ldot3(br, wrh, wrl)
    t2 = ldot3(bi, wih, wil)
    t3 = ldot3(br + bi, wsh, wsl)
    xr = t1 - t2
    xi = t3 - t1 - t2
    power = xr * xr + xi * xi                          # (t8, (f_lo,k1), k2)

    _mel_dct_store(power, fbh, fbl, dct_ref, mel_out, cc_out,
                   t8=t8, fl=fl, off=0, log_floor=log_floor,
                   precision=precision)


def _mel_dct_store(power, fbh, fbl, dct_ref, mel_out, cc_out, *,
                   t8, fl, off, log_floor, precision):
    """Mirror-folded mel accumulation + log-DCT + band-major stores.

    ``fbh/fbl`` carry Q//2 + 1 folded slices (bins in rows k1 > Q/2 are
    pre-added at their mirror cell — real input has |X[N-k]| = |X[k]|);
    ``off`` is the row-group position of k1 = 0 in ``power``.  The
    band-major in-kernel transpose replaces what would otherwise be an
    XLA relayout of the full (B, T, num) output (which costs more than
    the whole DFT at these shapes).
    """
    cd_l = (((2,), (0,)), ((), ()))
    grp = power.shape[1] // fl
    p4 = power.reshape(t8, fl, grp, 128)
    ph = p4.astype(jnp.bfloat16)
    plo = (p4 - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jax.lax.dot_general, dimension_numbers=cd_l,
                          preferred_element_type=jnp.float32)
    mel = None
    for k1 in range(fbh.shape[0]):
        p = k1 + off
        m_k = (d(ph[:, :, p], fbh[k1]) + d(ph[:, :, p], fbl[k1])
               + d(plo[:, :, p], fbh[k1]))
        mel = m_k if mel is None else mel + m_k
    mel_out[0] = mel.reshape(t8 * fl, -1).T            # (mel_pad, t8*FL)
    logm = jnp.log10(jnp.maximum(mel, log_floor))
    cc = jax.lax.dot_general(logm, dct_ref[...],
                             dimension_numbers=cd_l,
                             precision=precision)
    cc_out[0] = cc.reshape(t8 * fl, -1).T              # (cc_pad, t8*FL)


def _kernel_fs3(main_ref, halo_ref, bdgrh, bdgrl, bdgih, bdgil,
                twr_ref, twi_ref, wrh, wrl, wih, wil, wsh, wsl, fbh, fbl,
                dct_ref, mel_out, cc_out, *, t8: int, blk: int, fl: int,
                q: int, c0: float, c1: float, log_floor: float, precision):
    """fs2 variant for 3-tap (periodic cosine) windows.

    The time-domain window multiply disappears: a periodic Hann/Hamm is
    exactly (c0, c1, c1) taps in the DFT domain, applied after stage C
    with sublane/lane rolls.  With no window between them, the frame
    gather folds into the stage-A matrix (one precomputed BD @ G complex
    matmul over the 2-block row window) — replacing gather (1 unit) +
    stage A (6 units) with 3 half-width units.
    """
    x3 = main_ref[0].reshape(t8, blk, 128)
    h3 = halo_ref[0].reshape(1, blk, 128)
    full = jnp.concatenate([x3, h3], axis=0)
    w = jnp.concatenate([jax.lax.slice_in_dim(full, 0, t8, axis=0),
                         jax.lax.slice_in_dim(full, 1, t8 + 1, axis=0)],
                        axis=1)                        # (t8, 2*blk, 128)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    cd_b = (((2,), (1,)), ((0,), (0,)))

    def bdot(m, b):
        return jax.lax.dot_general(
            jnp.broadcast_to(m[...], (t8,) + m.shape), b, cd_b,
            preferred_element_type=jnp.float32)

    # fused gather + stage A: rows (f_lo, k1) directly from audio rows.
    # Row groups are {Q-1, 0, 1, ..., Q/2+1}: the Q/2+1 groups the
    # folded mel reads plus one tap neighbor on each side, so the 3-tap
    # below needs no edge handling at all (its garbage edge rows are
    # never read).
    ar = bdot(bdgrh, wh) + bdot(bdgrl, wh) + bdot(bdgrh, wl)
    ai = bdot(bdgih, wh) + bdot(bdgil, wh) + bdot(bdgih, wl)
    twr = twr_ref[...][None]
    twi = twi_ref[...][None]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    cd_l = (((2,), (0,)), ((), ()))

    def ldot3(a, m_hi, m_lo):
        h = a.astype(jnp.bfloat16)
        lo = (a - h.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jax.lax.dot_general, dimension_numbers=cd_l,
                              preferred_element_type=jnp.float32)
        return (d(h, m_hi[...]) + d(h, m_lo[...]) + d(lo, m_hi[...]))

    t1 = ldot3(br, wrh, wrl)
    t2 = ldot3(bi, wih, wil)
    t3 = ldot3(br + bi, wsh, wsl)
    xr = t1 - t2
    xi = t3 - t1 - t2                                  # unwindowed X[k]

    # spectral 3-tap window: Xw[k] = c0 X[k] + c1 (X[k-1] + X[k+1]);
    # k +- 1 is one step along the row-group axis (neighbors exist by
    # construction of the row set)
    nrows = xr.shape[1]

    def tap3(v):
        up = pltpu.roll(v, 1, 1)
        dn = pltpu.roll(v, nrows - 1, 1)
        return c0 * v + c1 * (up + dn)

    xr = tap3(xr)
    xi = tap3(xi)
    power = xr * xr + xi * xi
    _mel_dct_store(power, fbh, fbl, dct_ref, mel_out, cc_out,
                   t8=t8, fl=fl, off=1, log_floor=log_floor,
                   precision=precision)


def _kernel_fs4(main_ref, halo_ref, mah, mal, twr_ref, twi_ref,
                rampr_ref, rampi_ref,
                wrh, wrl, wih, wil, fbh, fbl, dct_ref, mel_out, cc_out, *,
                t8: int, blk4: int, fl: int, q: int, coefs,
                tap_tables, melpos, log_floor: float, precision):
    """Frame-pair four-step: two real frames per complex DFT.

    z = frame_2j + i*frame_{2j+1} rides one complex DFT; stage C runs
    separably (4 real products, 12 bf16 passes per 16 frames vs
    Karatsuba's 18) so the real-vector conjugate identity gives the
    lane-mirror Xlm[p,k2] = X[p,(-k2)%128] as VPU sign flips.  The
    interleaved row order puts each group's mirror partner one sublane
    away, making the full bin-mirror Z[-k] (needed to unpack |X_a|^2,
    |X_b|^2) a roll + select; the spectral cosine-sum window (one tap
    pair per cosine order — hann/hamm M=1 through flattop M=4) is a
    per-row roll stencil from the precomputed tables, with roll results
    cached across tap orders.  Real/imag planes ride ROW-STACKED
    (t8, 2R, 128) tensors throughout: stage A is 3 dots, stage C 6, and
    the tap/mirror rolls run once over both planes.
    See FusedMelPlan's fs4 section for the algebra.
    """
    x3 = main_ref[0].reshape(t8, blk4, 128)
    h3 = halo_ref[0].reshape(1, blk4, 128)
    full = jnp.concatenate([x3, h3], axis=0)
    w = jnp.concatenate([jax.lax.slice_in_dim(full, 0, t8, axis=0),
                         jax.lax.slice_in_dim(full, 1, t8 + 1, axis=0)],
                        axis=1)                        # (t8, 2*blk4, 128)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    cd_b = (((2,), (1,)), ((0,), (0,)))

    def bdot(m, b):
        return jax.lax.dot_general(
            jnp.broadcast_to(m[...], (t8,) + m.shape), b, cd_b,
            preferred_element_type=jnp.float32)

    # fused gather + pair packing + stage A; rows = [re(slot,pos),
    # im(slot,pos)] stacked into one dot chain, then sliced (slices at
    # 0/R are tile-aligned views — no relayout)
    a_all = bdot(mah, wh) + bdot(mal, wh) + bdot(mah, wl)
    nr = a_all.shape[1] // 2
    ar = a_all[:, :nr]
    ai = a_all[:, nr:]
    twr = twr_ref[...][None]
    twi = twi_ref[...][None]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    nrows = br.shape[1]
    piota = jax.lax.broadcasted_iota(jnp.int32, br.shape, 1) % q

    def rollp(v, dr):
        """result[.., p, :] = v[.., p+dr, :] (correct within Q-blocks;
        the tables never read across a block edge)."""
        return pltpu.roll(v, (-dr) % nrows, 1)

    def rolll(v, dl):
        """result[.., k2] = v[.., k2+dl] (circular — bin wrap is the
        correct DFT semantics for the spectral taps)."""
        return pltpu.roll(v, (-dl) % 128, 2)

    # 3-tap window applied on B (pre-DFT): a k2-lane borrow in X-space is
    # a phase ramp in n2-space (X[p', k2+l] = DFT(B[p'] * ramp_l)[k2]),
    # so the whole stencil costs rolls + masked ramp multiplies on TWO
    # tensors instead of roll/select chains on the four post-DFT ones.
    rampr = rampr_ref[...][None]
    rampi = rampi_ref[...][None]
    cache_r, cache_i = {}, {}

    def tapreadB(drow, dlane):
        combos = {}
        for p in range(q):
            key = (int(drow[p]), int(dlane[p]))
            combos.setdefault(key, []).append(p)
        outr = outi = None
        for (dr, dl), ps in combos.items():
            rr = cache_r.get(dr)
            if rr is None:
                rr = rollp(br, dr)
                cache_r[dr] = rr
            ri = cache_i.get(dr)
            if ri is None:
                ri = rollp(bi, dr)
                cache_i[dr] = ri
            if dl:
                sr, si = (rampr, rampi) if dl > 0 else (rampr, -rampi)
                tr = rr * sr - ri * si
                ti = rr * si + ri * sr
            else:
                tr, ti = rr, ri
            if outr is None:
                outr, outi = tr, ti
            else:
                mask = piota == ps[0]
                for p in ps[1:]:
                    mask = mask | (piota == p)
                outr = jnp.where(mask, tr, outr)
                outi = jnp.where(mask, ti, outi)
        return outr, outi

    brw = coefs[0] * br
    biw = coefs[0] * bi
    for cm, (du, lu, dd, ld) in zip(coefs[1:], tap_tables):
        ur, ui = tapreadB(du, lu)
        dr_, di_ = tapreadB(dd, ld)
        brw = brw + cm * (ur + dr_)
        biw = biw + cm * (ui + di_)

    # stage C, separable: Frw = DFT128(brw), Fiw = DFT128(biw)
    cd_l = (((2,), (0,)), ((), ()))

    def split(a):
        h = a.astype(jnp.bfloat16)
        return h, (a - h.astype(jnp.float32)).astype(jnp.bfloat16)

    def d3(h_, l_, m_hi, m_lo):
        d = functools.partial(jax.lax.dot_general, dimension_numbers=cd_l,
                              preferred_element_type=jnp.float32)
        return d(h_, m_hi[...]) + d(h_, m_lo[...]) + d(l_, m_hi[...])

    brh, brl = split(brw)
    bih, bil = split(biw)
    frr = d3(brh, brl, wrh, wrl)
    fri = d3(brh, brl, wih, wil)
    fir = d3(bih, bil, wrh, wrl)
    fii = d3(bih, bil, wih, wil)
    xwr = frr - fii                                    # tapped X
    xwi = fri + fir
    xlwr = frr + fii                                   # tapped lane-mirror
    xlwi = fir - fri                                   # conj(Fr)+i*conj(Fi)

    # full mirror M[p,k2] = Zw[-k]: pair-row select + lane step
    odd = (piota % 2) == 1
    selfp = (piota == 0) | (piota == q - 1)
    p0 = piota == 0

    def mirror(v):
        pv = jnp.where(odd, rollp(v, 1), rollp(v, -1))
        pv = jnp.where(selfp, v, pv)
        return jnp.where(p0, pv, rolll(pv, 1))

    mwr = mirror(xlwr)
    mwi = mirror(xlwi)

    # unpack the two frames' power spectra
    har = (xwr + mwr) * 0.5
    hai = (xwi - mwi) * 0.5
    pa = har * har + hai * hai
    hbr = xwr - mwr
    hbi = xwi + mwi
    pb = (hbr * hbr + hbi * hbi) * 0.25

    # mirror-folded mel per frame parity, then interleave (slot, parity):
    # gather the used row groups lane-concatenated so the whole fold is
    # one wide dot (contraction (Q/2+1)*128) instead of a chain of
    # 128-contraction dots
    ngrp = fbh.shape[0]
    fbh_w = fbh[...].reshape(ngrp * 128, -1)
    fbl_w = fbl[...].reshape(ngrp * 128, -1)
    d_w = functools.partial(jax.lax.dot_general, dimension_numbers=cd_l,
                            preferred_element_type=jnp.float32)

    def melfold(power):
        # roll-align each used row group to sublane offset 0 before the
        # lane concat (Mosaic requires equal sublane offsets on concat
        # operands); reads only hit rows = 0 mod q after the shift
        parts = []
        for k1 in range(ngrp):
            p = melpos[k1]
            r = pltpu.roll(power, (-p) % (fl * q), 1) if p else power
            parts.append(r.reshape(t8, fl, q, 128)[:, :, 0])
        gath = jnp.concatenate(parts, axis=-1)        # (t8, fl, ngrp*128)
        gh = gath.astype(jnp.bfloat16)
        gl = (gath - gh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (d_w(gh, fbh_w) + d_w(gh, fbl_w)
                + d_w(gl, fbh_w))                      # (t8, fl, mel_pad)

    mel_a = melfold(pa)
    mel_b = melfold(pb)
    mel = jnp.stack([mel_a, mel_b], axis=2).reshape(t8, 2 * fl, -1)
    mel_out[0] = mel.reshape(t8 * 2 * fl, -1).T        # (mel_pad, frames)
    logm = jnp.log10(jnp.maximum(mel, log_floor))
    cc = jax.lax.dot_general(logm, dct_ref[...], dimension_numbers=cd_l,
                             precision=precision)
    cc_out[0] = cc.reshape(t8 * 2 * fl, -1).T


def _kernel_flip(x_ref, win_ref, w1rh, w1rl, w1ih, w1il, twr_ref, twi_ref,
                 bdrh, bdrl, bdih, bdil, bdsh, bdsl, fbh, fbl, dct_ref,
                 mel_out, cc_out, *, fl: int, q: int, n_k2: int,
                 log_floor: float, precision):
    xw = x_ref[0] * win_ref[...][:, None, :]     # (128=(f_lo,q), T8, 128=n2)

    def dot3(a, bh_ref, bl_ref, contract):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jax.lax.dot_general, dimension_numbers=contract,
                              preferred_element_type=jnp.float32)
        return (d(ah, bh_ref[...]) + d(ah, bl_ref[...])
                + d(al, bh_ref[...]))

    def dot3l(ah_ref, al_ref, b, contract):
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jax.lax.dot_general, dimension_numbers=contract,
                              preferred_element_type=jnp.float32)
        return (d(ah_ref[...], bh) + d(ah_ref[...], bl)
                + d(al_ref[...], bh))

    # stage 1: 128-point DFT over the lane (n2) dim — full-MXU dots
    cd_lane = (((2,), (0,)), ((), ()))
    ar = dot3(xw, w1rh, w1rl, cd_lane)
    ai = dot3(xw, w1ih, w1il, cd_lane)
    # stage 2: twiddle (VPU)
    twr = twr_ref[...][:, None, :]
    twi = twi_ref[...][:, None, :]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # stage 3: block-diagonal Q-point DFT over the row (q) dim; Karatsuba
    # complex product (3 matmuls), each as a bf16x3 triplet
    cd_row = (((1,), (0,)), ((), ()))
    t1 = dot3l(bdrh, bdrl, br, cd_row)
    t2 = dot3l(bdih, bdil, bi, cd_row)
    t3 = dot3l(bdsh, bdsl, br + bi, cd_row)
    xr = t1 - t2
    xi = t3 - t1 - t2
    power = xr * xr + xi * xi                    # rows (f_lo, k2)
    # mel: accumulate per-k2 row-group projections; mirror half (k2 > Q/2)
    # never contributes
    t8 = power.shape[1]
    p4 = power.reshape(fl, q, t8, 128)
    ph = p4.astype(jnp.bfloat16)
    plo = (p4 - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    mel = None
    d = functools.partial(jax.lax.dot_general, dimension_numbers=cd_lane,
                          preferred_element_type=jnp.float32)
    for k2 in range(n_k2):
        m_k = (d(ph[:, k2], fbh[k2]) + d(ph[:, k2], fbl[k2])
               + d(plo[:, k2], fbh[k2]))
        mel = m_k if mel is None else mel + m_k
    mel_out[0] = mel                             # (FL, T8, mel_pad)
    logm = jnp.log10(jnp.maximum(mel, log_floor))
    cc_out[0] = jax.lax.dot_general(logm, dct_ref[...],
                                    dimension_numbers=cd_lane,
                                    precision=precision)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _fused_call_fs2(plan: FusedMelPlan, x, n_frames: int, tile: int,
                    precision, interpret: bool):
    b = x.shape[0]
    Q, FL, blk = plan.fs2_q, plan.fs2_fl, plan.fs2_blk
    u_needed = -(-n_frames // FL)
    if tile >= n_frames and (u_needed * blk) % 8 == 0:
        # single-tile mode: whole clip per grid step — no frame padding
        # and no post-kernel slice copy (out block == full output)
        t8 = u_needed
    else:
        t8 = max(8, -(-(tile // FL) // 8) * 8)
    u_total = -(-u_needed // t8) * t8
    t_pad = u_total * FL
    n_tiles = u_total // t8
    rows_needed = u_total * blk + blk  # + one halo block for the last tile
    need = rows_needed * 128
    if x.shape[1] >= need:
        x = x[:, :need]
    else:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    rows = x.reshape(b, rows_needed, 128)

    if plan.fs3_taps is not None:
        c0, c1 = plan.fs3_taps
        kern = functools.partial(_kernel_fs3, t8=t8, blk=blk, fl=FL, q=Q,
                                 c0=c0, c1=c1, log_floor=1e-8,
                                 precision=precision)
        consts = [plan.fs3_bdgr_hi, plan.fs3_bdgr_lo,
                  plan.fs3_bdgi_hi, plan.fs3_bdgi_lo,
                  plan.fs3_twr, plan.fs3_twi,
                  plan.fs2_wr_hi, plan.fs2_wr_lo,
                  plan.fs2_wi_hi, plan.fs2_wi_lo,
                  plan.fs2_ws_hi, plan.fs2_ws_lo,
                  plan.fs2_fb_hi, plan.fs2_fb_lo, plan.dct_t]
    else:
        kern = functools.partial(_kernel_fs2, t8=t8, blk=blk, fl=FL, q=Q,
                                 log_floor=1e-8, precision=precision)
        consts = [plan.fs2_g, plan.fs2_win,
                  plan.fs2_bdr_hi, plan.fs2_bdr_lo,
                  plan.fs2_bdi_hi, plan.fs2_bdi_lo,
                  plan.fs2_twr, plan.fs2_twi,
                  plan.fs2_wr_hi, plan.fs2_wr_lo,
                  plan.fs2_wi_hi, plan.fs2_wi_lo,
                  plan.fs2_ws_hi, plan.fs2_ws_lo,
                  plan.fs2_fb_hi, plan.fs2_fb_lo, plan.dct_t]

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, t: (0,) * arr.ndim)
    main_spec = pl.BlockSpec((1, t8 * blk, 128),
                             lambda i, t: (i, t, 0))
    halo_spec = pl.BlockSpec((1, blk, 128),
                             lambda i, t: (i, (t + 1) * t8, 0))
    mel, cc = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[main_spec, halo_spec] + [_const(c) for c in consts],
        out_specs=[
            pl.BlockSpec((1, plan.mel_pad, t8 * FL), lambda i, t: (i, 0, t)),
            pl.BlockSpec((1, plan.cc_pad, t8 * FL), lambda i, t: (i, 0, t)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, plan.mel_pad, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, plan.cc_pad, t_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rows, rows, *[jnp.asarray(c) for c in consts])
    # outputs are already band-major (in-kernel transpose)
    return (mel[:, :plan.num_mel, :n_frames],
            cc[:, :plan.cc_num, :n_frames])


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _fused_call_fs4(plan: FusedMelPlan, x, n_frames: int, tile: int,
                    precision, interpret: bool):
    b = x.shape[0]
    Q, FL = plan.fs2_q, plan.fs2_fl
    blk4, fpu = plan.fs4_blk, plan.fs4_fpu
    u_needed = -(-n_frames // fpu)
    if tile >= n_frames and (u_needed * blk4) % 8 == 0:
        t8 = u_needed
    else:
        t8 = max(8, -(-(tile // fpu) // 8) * 8)
    u_total = -(-u_needed // t8) * t8
    t_pad = u_total * fpu
    n_tiles = u_total // t8
    rows_needed = u_total * blk4 + blk4
    need = rows_needed * 128
    if x.shape[1] >= need:
        x = x[:, :need]
    else:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    rows = x.reshape(b, rows_needed, 128)

    coefs = tuple(float(c) for c in plan.fsk_taps)
    tap_tables = tuple(tuple(tuple(int(v) for v in t) for t in tab)
                       for tab in plan.fs4_tap_tables)
    kern = functools.partial(_kernel_fs4, t8=t8, blk4=blk4, fl=FL, q=Q,
                             coefs=coefs, tap_tables=tap_tables,
                             melpos=tuple(plan.fs4_melpos),
                             log_floor=1e-8, precision=precision)
    consts = [plan.fs4_m_hi, plan.fs4_m_lo,
              plan.fs4_twr, plan.fs4_twi,
              plan.fs4_rampr, plan.fs4_rampi,
              plan.fs2_wr_hi, plan.fs2_wr_lo,
              plan.fs2_wi_hi, plan.fs2_wi_lo,
              plan.fs2_fb_hi, plan.fs2_fb_lo, plan.dct_t]

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, t: (0,) * arr.ndim)
    main_spec = pl.BlockSpec((1, t8 * blk4, 128),
                             lambda i, t: (i, t, 0))
    halo_spec = pl.BlockSpec((1, blk4, 128),
                             lambda i, t: (i, (t + 1) * t8, 0))
    mel, cc = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[main_spec, halo_spec] + [_const(c) for c in consts],
        out_specs=[
            pl.BlockSpec((1, plan.mel_pad, t8 * fpu), lambda i, t: (i, 0, t)),
            pl.BlockSpec((1, plan.cc_pad, t8 * fpu), lambda i, t: (i, 0, t)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, plan.mel_pad, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, plan.cc_pad, t_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rows, rows, *[jnp.asarray(c) for c in consts])
    return (mel[:, :plan.num_mel, :n_frames],
            cc[:, :plan.cc_num, :n_frames])


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _fused_call_flip(plan: FusedMelPlan, x, n_frames: int, tile: int,
                     precision, interpret: bool):
    b = x.shape[0]
    Q, FL = plan.flip_q, plan.flip_fl
    # Mosaic needs the block's sublane dim (t8) divisible by 8; round the
    # requested tile up and zero-pad the frame count to a whole grid
    t8 = max(8, -(-(tile // FL) // 8) * 8)
    u_needed = -(-n_frames // FL)
    u_total = -(-u_needed // t8) * t8
    t_pad = u_total * FL
    n_tiles = u_total // t8
    hs = plan.slide // Q
    # data used ends at comb element (T-1)*hs + 128; the row-reshape trick
    # below additionally touches (then discards) up to FL*hs - 128 trailing
    # elements in the last row — zero-pad the comb so slices stay in bounds
    m = max((t_pad - 1) * hs + 128, (t_pad - 1 + FL) * hs)
    need = m * Q
    if x.shape[1] >= need:
        x = x[:, :need]
    else:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    # comb relayout: audT[b, q, j] = x[b, j*Q + q]
    audt = jnp.swapaxes(x.reshape(b, m, Q), 1, 2)
    views = []
    for f_lo in range(FL):
        for qi in range(Q):
            sq = jax.lax.slice(audt, (0, qi, f_lo * hs),
                               (b, qi + 1, f_lo * hs + u_total * FL * hs))
            views.append(sq.reshape(b, u_total, FL * hs)[:, :, :128])
    xs = jnp.stack(views, axis=1)                # (b, 128, U, 128)

    kern = functools.partial(_kernel_flip, fl=FL, q=Q, n_k2=plan.flip_nk2,
                             log_floor=1e-8, precision=precision)

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, t: (0,) * arr.ndim)

    consts = [plan.flip_win, plan.flip_w1r_hi, plan.flip_w1r_lo,
              plan.flip_w1i_hi, plan.flip_w1i_lo,
              plan.flip_twr, plan.flip_twi,
              plan.flip_bdr_hi, plan.flip_bdr_lo,
              plan.flip_bdi_hi, plan.flip_bdi_lo,
              plan.flip_bds_hi, plan.flip_bds_lo,
              plan.flip_fb_hi, plan.flip_fb_lo, plan.dct_t]
    mel, cc = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, 128, t8, 128), lambda i, t: (i, 0, t, 0))]
        + [_const(c) for c in consts],
        out_specs=[
            pl.BlockSpec((1, FL, t8, plan.mel_pad), lambda i, t: (i, 0, t, 0)),
            pl.BlockSpec((1, FL, t8, plan.cc_pad), lambda i, t: (i, 0, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, FL, u_total, plan.mel_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, FL, u_total, plan.cc_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, *[jnp.asarray(c) for c in consts])
    # rows are (f_lo, u) with frame f = u*FL + f_lo -> (b, T, band)
    mel = jnp.swapaxes(mel, 1, 2).reshape(b, t_pad, plan.mel_pad)
    cc = jnp.swapaxes(cc, 1, 2).reshape(b, t_pad, plan.cc_pad)
    return (mel[:, :n_frames, :plan.num_mel],
            cc[:, :n_frames, :plan.cc_num])


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def _fused_call4(plan: FusedMelPlan, x, n_frames: int, tile: int,
                 precision, interpret: bool, fast: bool):
    b = x.shape[0]
    n1 = plan.fs_n1
    n_tiles = n_frames // tile
    s_rows = plan.slide // 128
    n_rows = x.shape[1] // 128
    rows = x[:, :n_rows * 128].reshape(b, n_rows, 128)
    shifts = [jax.lax.slice(rows, (0, q, 0),
                            (b, q + s_rows * (n_frames - 1) + 1, 128),
                            (1, s_rows, 1))
              for q in range(n1)]
    kern = functools.partial(_kernel4, n1=n1, tile=tile, log_floor=1e-8,
                             precision=precision, fast=fast)

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, t: (0,) * arr.ndim)

    if fast:
        consts = [plan.fs_win, plan.fs_w1r, plan.fs_w1i, plan.fs_twr,
                  plan.fs_twi, plan.fs_w2r_hi, plan.fs_w2r_lo,
                  plan.fs_w2i_hi, plan.fs_w2i_lo,
                  plan.fs_w2s_hi, plan.fs_w2s_lo,
                  plan.fs_melp_hi, plan.fs_melp_lo, plan.dct_t]
    else:
        consts = [plan.fs_win, plan.fs_w1r, plan.fs_w1i, plan.fs_twr,
                  plan.fs_twi, plan.fs_w2r, plan.fs_w2i,
                  plan.fs_melp, plan.dct_t]
    shift_spec = pl.BlockSpec((1, tile, 128), lambda i, t: (i, t, 0))
    mel, cc = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[shift_spec] * n1 + [_const(c) for c in consts],
        out_specs=[
            pl.BlockSpec((1, tile, plan.mel_pad), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, tile, plan.cc_pad), lambda i, t: (i, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_frames, plan.mel_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n_frames, plan.cc_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*shifts, *[jnp.asarray(c) for c in consts])
    return mel[..., :plan.num_mel], cc[..., :plan.cc_num]


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def _fused_call(plan: FusedMelPlan, x, n_frames: int, tile: int,
                precision, interpret: bool, fast: bool):
    b = x.shape[0]
    n_tiles = n_frames // tile
    rows = x[:, :(n_frames + plan.k - 1) * plan.slide].reshape(
        b, n_frames + plan.k - 1, plan.slide)
    shifts = [jax.lax.slice_in_dim(rows, q, q + n_frames, axis=1)
              for q in range(plan.k)]
    kern = functools.partial(_kernel, n_shift=plan.k, log_floor=1e-8,
                             precision=precision, fast=fast)

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, t: (0,) * arr.ndim)

    if fast:
        d_consts = [plan.dr_hi, plan.dr_lo, plan.di_hi, plan.di_lo]
    else:
        d_consts = [plan.dr, plan.di]
    consts = ([plan.window] + d_consts + [plan.mel_p, plan.dct_t])
    shift_spec = pl.BlockSpec((1, tile, plan.slide), lambda i, t: (i, t, 0))
    mel, cc = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[shift_spec] * plan.k + [_const(c) for c in consts],
        out_specs=[
            pl.BlockSpec((1, tile, plan.mel_pad), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, tile, plan.cc_pad), lambda i, t: (i, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_frames, plan.mel_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n_frames, plan.cc_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*shifts, *[jnp.asarray(c) for c in consts])
    return mel[..., :plan.num_mel], cc[..., :plan.cc_num]


def fused_mel_mfcc(plan: FusedMelPlan, x, tile: int = 200,
                   precision=jax.lax.Precision.HIGHEST,
                   interpret: bool | None = None, fast: bool = False,
                   algo: str = "auto"):
    """(B, n) audio -> (B, num_mel, T), (B, cc_num, T).

    ``n`` must be at least ``T*slide + (fft - slide)`` with ``T`` divisible
    by ``tile`` (tile a multiple of 8).  Callers with other lengths should
    pad (the generic path has no such restriction).  ``algo`` picks the
    kernel: "fs4" (frame-pair packing, the fastest), "fs2", "flip",
    "fourstep", "dense", or "auto" (fs4 when the shape + window allow,
    else fs2, else flip, else fourstep, else dense).
    """
    x = jnp.asarray(x, jnp.float32)
    if interpret is None:  # Mosaic kernels only compile for TPU
        from audioflux_tpu.ops.backend import on_tpu
        interpret = not on_tpu()
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    else:
        squeeze = False
    n = x.shape[-1]
    n_frames = (n - plan.n_fft) // plan.slide + 1
    use_fs4 = bool(plan.fs4_ok) and algo in ("auto", "fs4")
    if algo == "fs4" and not use_fs4:
        raise ValueError("fs4 kernel needs the fs2 shape constraints plus "
                         "a cosine-sum window (rect/hann/hamm/blackman/"
                         "blackman-harris/blackman-nuttall/flattop, "
                         "periodic form)")
    if use_fs4:
        mel, cc = _fused_call_fs4(plan, x, n_frames, tile, precision,
                                  interpret)
        if squeeze:
            mel, cc = mel[0], cc[0]
        return mel, cc
    use_fs2 = bool(plan.fs2_q) and algo in ("auto", "fs2")
    use_flip = (not use_fs2) and bool(plan.flip_q) and (
        algo == "flip"
        or (algo == "auto" and (not plan.fs_n1 or n_frames % tile)))
    if algo == "fs2" and not use_fs2:
        raise ValueError("fs2 kernel needs fft = Q*128 with Q | 128, "
                         "128 | slide and a 2-block gather window")
    if algo == "flip" and not use_flip:
        raise ValueError("flip kernel needs fft = Q*128 with Q | 128, "
                         "Q | slide and 8*slide >= fft")
    if use_fs2:
        # fs2 emits band-major (B, num, T) directly (in-kernel transpose)
        mel, cc = _fused_call_fs2(plan, x, n_frames, tile, precision,
                                  interpret)
        if squeeze:
            mel, cc = mel[0], cc[0]
        return mel, cc
    if use_flip:
        mel, cc = _fused_call_flip(plan, x, n_frames, tile, precision,
                                   interpret)
    else:
        if n_frames % tile:
            raise ValueError(f"frame count {n_frames} not divisible by tile "
                             f"{tile}; pad the input")
        call = (_fused_call4 if (algo in ("auto", "fourstep") and plan.fs_n1)
                else _fused_call)
        mel, cc = call(plan, x, n_frames, tile, precision, interpret, fast)
    mel = jnp.swapaxes(mel, -1, -2)
    cc = jnp.swapaxes(cc, -1, -2)
    if squeeze:
        mel, cc = mel[0], cc[0]
    return mel, cc
