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
      sygst_mode: 'full' = whole-matrix two-sided triangular solve
        (auto-swapped per dtype/size: fp32 pipelines take 'inv', fp64 at
        n >= 8192 takes 'blocked'); 'blocked' = reference-style blocked
        recurrence; 'inv' = inverse-diagonal blocked solves
        (ops/sygst.sygst_inv, fp32 pipelines only); 'trinv' = ONE full
        block-doubled inv(U) reused by phases 2 and 4 as plain gemms
        (the sharded path's scheme; fp32 pipelines with n = 512 * 2^k
        only, falls back to 'full' otherwise).
      compute_dtype: None = inputs' dtype end to end; 'float32' = run the
        tridiagonalization in fp32 and refine results in fp64
        (BASELINE.md config 5 fast path).
      refine_iters: Rayleigh-quotient refinement sweeps applied when
        compute_dtype is lower precision than the I/O dtype.
      tridiag_mode: 'one' = blocked one-stage Householder (ops/sytrd.py,
        the reference's dsytrd_gpu.F90 role); 'two' = two-stage SBR
        (dense -> band via ops/sbrd.py, band -> tridiagonal bulge chase
        via ops/sb2st.py) which moves the O(n^3) flops into panel gemms;
        'auto' = 'two' only for real fp64-compute matrices with
        n >= two_stage_min_n (measured crossover; see
        models/syevdx._use_two_stage).
      band: stage-1 band half-width for the two-stage reduction.
      two_stage_min_n: 'auto' switches to the two-stage reduction at
        this matrix size (below it the one-stage loop's lower constant
        wins).
      planar_two_stage_min_n: 'auto' crossover for the PLANAR complex
        driver's two-stage reduction (models/zhegvdx_planar.py), fp32
        pipeline on TPU only. Measured on-chip (round 5,
        benchmarks/two_stage_planar.py): one-stage keeps n=4096
        (477.8 vs 534.6 ms) but two-stage wins 1.28x at n=8192
        (2961.9 vs 3783.9 ms) -> default 8192. 0 = never; an explicit
        tridiag_mode='two' always engages it.
      replay_g: group size (sweeps per compact-WY window) for the
        bulge-chase replay apply_q2. 0 = auto: 3*band for fp32 compute
        (l_win = band+g-1 = 127 fills the 128-lane MXU tile; valid for
        any g, see ops/sb2st.apply_q2) and band for fp64 (the emulated
        dot gains nothing from tile fill, and g=b minimizes qform
        flops).
      refine_margin: cluster-guard margin (columns each side) added to
        the selected range il..iu for the mixed-precision refinement
        sweeps. The reference back-transforms only the NZ selected
        columns (dsyevd_gpu.F90:108,119-128); here refinement likewise
        runs on the selected block only -- the margin keeps eigenvalue
        clusters that straddle the selection cut inside the block where
        accurate in-block Rayleigh quotients are available.
      refine_extra_max: upper bound on AUTO-ESCALATED extra fp64
        refinement sweeps: when the in-hand grams show marginal pairs
        whose first-order coupling exceeds the residual contract, more
        sweeps run automatically (replaces the manual refine_iters=4
        escape hatch for tight-cluster spectra). 0 disables.
      mosaic_kernels: allow the compiled Mosaic (Pallas) kernels where
        the per-site gates would select them. The SPMD partitioner
        cannot shard Pallas calls, so the sharded/batched-sharded
        entries (parallel/sharded.py) force this off for their inner
        solves; selection additionally passes through the per-kernel
        toolchain probe (utils/kernel_guard.kernel_ok) so a Mosaic
        rejection degrades to the XLA path instead of failing the
        solve.
      planar_solve_mode: triangular-solve scheme for the planar fp32
        pipeline's phases 2/4 (fp64 always substitutes).  'blockinv' =
        batched-inverted diagonal blocks + ~30-step blocked substitution
        (ops/planar.ptrsm_left_lower_inv, the round-2 measured best);
        'trinv' = ONE full block-doubled inv(L) reused by all three
        solves as planar gemms (faster standalone, measured 40 ms
        slower end-to-end in the ROUND-2 pipeline -- re-measure before
        defaulting); 'subst' = pure blocked substitution.
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
    tridiag_mode: str = "auto"
    band: int = 32
    two_stage_min_n: int = 4096
    planar_two_stage_min_n: int = 8192
    replay_g: int = 0
    refine_margin: int = 32
    refine_extra_max: int = 2
    planar_solve_mode: str = "blockinv"
    mosaic_kernels: bool = True

    def __post_init__(self):
        if self.planar_solve_mode not in ("blockinv", "trinv", "subst"):
            raise ValueError(
                f"unknown planar_solve_mode {self.planar_solve_mode!r}"
            )
        if self.stedc_backend not in ("dc", "xla"):
            raise ValueError(f"unknown stedc_backend {self.stedc_backend!r}")
        if self.sygst_mode not in ("blocked", "full", "inv", "trinv"):
            raise ValueError(f"unknown sygst_mode {self.sygst_mode!r}")
        if self.tridiag_mode not in ("one", "two", "auto"):
            raise ValueError(f"unknown tridiag_mode {self.tridiag_mode!r}")
        if self.nb_tridiag < 1 or self.nb_back < 1 or self.nb_sygst < 1:
            raise ValueError("block sizes must be positive")
        if self.band < 2:
            raise ValueError("band must be >= 2")


DEFAULT_CONFIG = SolverConfig()
