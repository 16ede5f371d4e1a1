"""Solver configuration.

The reference hard-codes its tuning constants (SURVEY.md §5.6): nb=448 for
sygst (dsygvdx_gpu.F90:142), nb1=32 tridiag / nb2=64 back-transform blocks
(dsyevd_gpu.F90:63-64), and kernel geometry BX=32/BY=8/NTILES=4
(dsymv_gpu.F90:29-31). The TPU build replaces those with one explicit,
hashable config object whose defaults are retuned for the MXU (128-aligned
blocks) and which participates in jit static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static tuning and policy knobs for the generalized eigensolver.

    Attributes:
      nb_sygst: block size for the blocked reduction to standard form
        (reference uses 448, dsygvdx_gpu.F90:142; we default to 512 --
        a multiple of the 128-wide MXU tile).
      nb_tridiag: panel width for the blocked Householder
        tridiagonalization (reference nb1=32, dsyevd_gpu.F90:63).
      nb_back: block size for the WY back-transformation (reference
        nb2=64, dsyevd_gpu.F90:64; we default to 128 for MXU alignment).
      stedc_leaf: size at which divide-and-conquer recursion bottoms out
        and a direct (batched Jacobi / XLA eigh) solver is used.
      stedc_backend: 'dc' = on-device divide & conquer (replaces the
        reference's CPU zstedc escape hatch, dsyevd_gpu.F90:99);
        'xla' = jnp.linalg.eigh of the tridiagonal matrix (debug fallback).
      sygst_mode: 'blocked' = reference-style blocked recurrence;
        'full' = whole-matrix two-sided triangular solve (v0 path).
      compute_dtype: None = inputs' dtype end to end; 'float32' = run the
        tridiagonalization in fp32 and refine results in fp64
        (BASELINE.md config 5 fast path).
      refine_iters: Rayleigh-quotient refinement sweeps applied when
        compute_dtype is lower precision than the I/O dtype.
    """

    nb_sygst: int = 512
    nb_tridiag: int = 32
    nb_back: int = 128
    stedc_leaf: int = 64
    stedc_backend: str = "dc"
    sygst_mode: str = "full"
    compute_dtype: Optional[str] = None
    refine_iters: int = 2
    use_pallas: bool = False

    def __post_init__(self):
        if self.stedc_backend not in ("dc", "xla"):
            raise ValueError(f"unknown stedc_backend {self.stedc_backend!r}")
        if self.sygst_mode not in ("blocked", "full"):
            raise ValueError(f"unknown sygst_mode {self.sygst_mode!r}")
        if self.nb_tridiag < 1 or self.nb_back < 1 or self.nb_sygst < 1:
            raise ValueError("block sizes must be positive")


DEFAULT_CONFIG = SolverConfig()
