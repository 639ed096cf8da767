"""MXU roofline accounting for the fused CWT IFFT kernel.

Counts the MXU passes ``ops/pallas_cwt.py`` issues per grid step (from
the four-step factorization's constant shapes) and converts a measured
wall into executed TFLOP/s vs the chip peak, next to the HBM traffic the
kernel replaced.

Two FLOP notions (same convention as ``tools/roofline.py``):

* **executed** — every bf16 pass of every Karatsuba/bf16x3 dot (3 real
  matmuls per complex product, 3 bf16 passes each: the accuracy price);
* **useful** — the algorithmic cost a split-radix complex ifft of the
  same batch would charge (5 N log2 N flops per transform).

Usage::

    python tools/roofline_cwt.py [--seconds S]

Defaults to the bench config-4 shape (16 clips x 84 bands x N=65536) and
a wall of 10.1 ms (the measured `cwt only` stage at the 0.16 audio-h/s
run; the jnp/XLA fft path measured 25 ms on the same shape).
"""

import argparse

PEAK_MEASURED = 118e12  # bf16 TFLOP/s measured on this chip (CLAUDE.md)
HBM_BW = 819e9          # v5e datasheet HBM bandwidth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.1e-3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bands", type=int, default=84)
    ap.add_argument("--n", type=int, default=65536)
    a = ap.parse_args()

    e = a.n.bit_length() - 1
    R = 1 << ((e + 1) // 2)
    C = a.n // R
    C2 = C // 2  # pad slice keeps half the output columns
    rows = a.batch * a.bands

    # per row: stage 1 (R,H)@(H,C) + stage 2 (R,C)@(C,C2), Karatsuba
    # complex (3 real matmuls) x bf16x3 (3 passes) = 9 bf16 passes each.
    # Stage-1 H is the per-band support row count (power-of-two bucketed,
    # ops/pallas_cwt.py band_row_counts); build the actual bench bank to
    # sum it, falling back to the full R if the import is unavailable.
    try:
        import os
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from audioflux_tpu.ops.pallas_cwt import (band_row_counts,
                                                  _quantize_rows)
        from audioflux_tpu.transforms.cwt import CWT
        from audioflux_tpu.types import (WaveletContinueType,
                                         SpectralFilterBankScaleType)
        cwt = CWT(num=a.bands, radix2_exp=e - 1, samplate=32000,
                  wavelet_type=WaveletContinueType.MORLET,
                  scale_type=SpectralFilterBankScaleType.OCTAVE)
        h_sum = sum(_quantize_rows(band_row_counts(cwt._bank, a.n), R))
        print(f"stage-1 support rows (bucketed): {h_sum} of {a.bands * R}")
    except Exception as ex:  # pragma: no cover - accounting fallback
        print(f"(bank build unavailable: {ex}; assuming full R rows)")
        h_sum = a.bands * R
    mac_s1 = a.batch * h_sum * R * C  # summed over bands already
    mac_s2 = rows * R * C * C2
    executed = (mac_s1 + mac_s2) * 9 * 2  # FLOP = 2*MAC
    useful = rows * 5 * a.n * (e)                # split-radix complex ifft

    tflops = executed / a.seconds / 1e12
    print(f"shape: {a.batch}x{a.bands} rows, N={a.n} = {R}x{C}, "
          f"slice keeps {C2} of {C} output columns")
    print(f"executed: {executed/1e9:.1f} GFLOP "
          f"({executed/useful:.1f}x the split-radix ifft cost — the "
          f"matmul-DFT + bf16x3 accuracy price)")
    print(f"wall {a.seconds*1e3:.1f} ms -> {tflops:.1f} TFLOP/s executed "
          f"= {tflops/ (PEAK_MEASURED/1e12) :.0%} of the measured "
          f"{PEAK_MEASURED/1e12:.0f} TFLOP/s bf16 peak")

    # HBM view: the kernel streams spectrum + bank + output once; XLA's
    # fft instead walks log2(N) passes over the (rows, N) complex matrix
    out_bytes = rows * C2 * R * 8
    in_bytes = a.batch * a.n * 8 + a.bands * a.n * 4
    print(f"kernel HBM traffic: {(in_bytes + out_bytes)/1e6:.0f} MB "
          f"(vs ~{rows * a.n * 8 * 2 * e / 1e9:.1f} GB for {e} "
          f"read+write fft sweeps)")


if __name__ == "__main__":
    main()
