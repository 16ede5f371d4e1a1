"""Measured hardware ceilings + per-stage roofline accounting.

VERDICT round-2 item 7b: report every stage as a fraction of the
hardware ceiling it is bound by, so optimization rounds target the
chip, not prior rounds. Ceilings are MEASURED on the target v5e
(RESULTS.md / CLAUDE.md platform facts), not datasheet numbers:

  bf16 MXU pair-gemm      ~80   TF/s (measured 76-83)
  f32 'highest' gemm      ~25   TF/s (3-pass bf16)
  emulated f64 dot        ~1.7  TF/s (1.4-1.9)
  ozaki effective f64     ~4.5  TF/s (the slice-REUSED refinement
                          sweep, measured from the round-3 stage table;
                          a standalone 48-bit product pays full slicing
                          and reaches ~2.5)
  HBM stream (XLA ops)    ~680  GB/s
  single Pallas DMA       ~71   GB/s per stream
"""

from __future__ import annotations

CEILINGS = {
    "bf16": 80e12,
    "f32": 25e12,
    "f64": 1.7e12,
    "ozaki": 4.5e12,
    "hbm": 680e9,
}


def stage_roofline(ms, flops=0.0, prec="f32", bytes_hbm=0.0):
    """Return (mxu_pct, hbm_pct, bound) for a stage.

    flops: real floating-point operations executed at precision ``prec``
    (use the effective-f64 count with prec='ozaki' for ozaki gemms).
    bytes_hbm: HBM bytes moved (reads + writes) by the stage's
    bandwidth-bound part.
    """
    t = ms * 1e-3
    mxu = 100.0 * flops / CEILINGS[prec] / t if flops else 0.0
    hbm = 100.0 * bytes_hbm / CEILINGS["hbm"] / t if bytes_hbm else 0.0
    bound = "MXU" if mxu >= hbm else "HBM"
    return mxu, hbm, bound


def format_row(name, ms, flops=0.0, prec="f32", bytes_hbm=0.0):
    mxu, hbm, bound = stage_roofline(ms, flops, prec, bytes_hbm)
    return (
        f"  {name:14s}: {ms:9.1f} ms  "
        f"MXU({prec}) {mxu:5.1f}%  HBM {hbm:5.1f}%  [{bound}-bound]"
    )
