"""Generalized eigensolver drivers: ``A x = lambda B x`` (ITYPE=1,
JOBZ='V', RANGE='I', UPLO irrelevant -- full matrices in, functional out).

Mirrors the reference's entire public API -- ``dsygvdx_gpu``
(dsygvdx_gpu.F90:71) and ``zhegvdx_gpu`` (zhegvdx_gpu.F90:75) -- with the
same 5-phase pipeline (zhegvdx_gpu.F90:131-180):

  1. Cholesky  B = U^H U                      (ops/cholesky.py)
  2. reduce to standard form C = U^{-H} A U^{-1}   (ops/sygst.py)
  3. standard eigensolve of C, select il..iu  (models/syevdx.py)
  4. back-substitute x = U^{-1} y             (triangular_solve)
  5. (reference: D2H copy -- irrelevant here; results are device arrays)

API re-design for TPU/JAX: no caller-allocated device/pinned workspaces
(the reference takes 10+ workspace arguments with documented minimums,
zhegvdx_gpu.F90:44-54 -- XLA owns all buffers); il/iu are static arguments
so the selected shapes compile; info is returned as a device scalar
instead of printing and returning without setting info (the reference's
contract gap, SURVEY.md §5.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.models.syevdx import syevdx
from eigensolver_gpu_tpu.ops.cholesky import cholesky_upper
from eigensolver_gpu_tpu.ops.sygst import sygst
from eigensolver_gpu_tpu.utils.config import DEFAULT_CONFIG, SolverConfig
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


class SygvdxResult(NamedTuple):
    w: jax.Array  # (m,) real eigenvalues, ascending, m = iu - il + 1
    z: jax.Array  # (n, m) B-orthonormal eigenvectors
    info: jax.Array  # int32: 0 ok, >0 B not positive definite


def _from_upper(a):
    """Rebuild the symmetric/Hermitian matrix from its upper triangle --
    the reference's UPLO='U' contract (zhegvdx_gpu.F90:58: only A's upper
    triangle is read; the lower may hold anything)."""
    up = jnp.triu(a, 1)
    diag = jnp.real(jnp.diagonal(a)).astype(a.dtype)
    return up + jnp.conj(up).T + jnp.diag(diag)


@highest_precision
@functools.partial(jax.jit, static_argnames=("il", "iu", "cfg"))
def sygvdx(a, b, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Solve A x = lambda B x for eigenpairs il..iu (1-based, ascending).

    Only the upper triangles of A and B are read (LAPACK UPLO='U'
    semantics, matching the reference's contract)."""
    n = a.shape[0]
    if a.shape != (n, n) or b.shape != (n, n):
        raise ValueError(f"A and B must be square and equal shape, got {a.shape}, {b.shape}")
    if iu is None:
        iu = n
    # Validate the index range on EVERY path (the reference validates
    # workspace sizes but lets bad il/iu through, zhegvdx_gpu.F90:106-127;
    # round-3 gap: the mixed branch silently clamped out-of-range iu via
    # slicing and returned fewer columns than requested).
    if not (1 <= il <= iu <= n):
        raise ValueError(f"need 1 <= il <= iu <= n, got il={il}, iu={iu}, n={n}")
    a = _from_upper(a)
    b = _from_upper(b)

    mixed = cfg.compute_dtype == "float32" and a.dtype == jnp.float64
    if mixed:
        # Full-fp32 generalized pipeline + fp64 generalized Ogita-
        # Aishima refinement (ops/refine.refine_gevp) -- the real twin
        # of the planar mixed driver.  Previously only phase 3 ran in
        # fp32 while Cholesky/sygst/back-substitution paid the emulated
        # fp64 rate; refining the generalized pair directly moves every
        # O(n^3) stage onto the fp32 MXU path.
        from eigensolver_gpu_tpu.ops.refine import refine_gevp

        inner = SolverConfig(
            nb_sygst=cfg.nb_sygst, nb_tridiag=cfg.nb_tridiag,
            nb_back=cfg.nb_back, stedc_leaf=cfg.stedc_leaf,
            stedc_backend=cfg.stedc_backend,
            sygst_mode=cfg.sygst_mode, use_pallas=cfg.use_pallas,
            tridiag_mode=cfg.tridiag_mode, band=cfg.band,
            two_stage_min_n=cfg.two_stage_min_n, replay_g=cfg.replay_g,
        )
        w32, z32, info = sygvdx(
            a.astype(jnp.float32), b.astype(jnp.float32), il=1, iu=n, cfg=inner
        )
        chunk = 2048 if n >= 8192 else None
        # selected-range economy (reference back-transforms only the NZ
        # selected columns, dsyevd_gpu.F90:108,119-128): refine only the
        # il..iu block + cluster-guard margin against the full fp32
        # basis; per-sweep gemms shrink from n^3 to n^2*ms
        sel0 = max(0, il - 1 - cfg.refine_margin)
        sel1 = min(n, iu + cfg.refine_margin)
        w, z = refine_gevp(
            a, b, z32.astype(a.dtype), sweeps=cfg.refine_iters, chunk=chunk,
            sel=(sel0, sel1 - sel0), w0=w32.astype(a.dtype),
            extra_max=cfg.refine_extra_max,
        )
        order = jnp.argsort(w)
        w = w[order]
        z = z[:, order]
        lo = il - 1 - sel0
        return SygvdxResult(
            w=w[lo : lo + (iu - il + 1)], z=z[:, lo : lo + (iu - il + 1)],
            info=info,
        )

    # XLA's whole-matrix triangular solve keeps O(n) full-width block
    # temps alive, which OOMs a single chip at n >= 8192 (measured);
    # the blocked recurrence is memory-frugal there.  fp32 pipelines
    # (refinement absorbs the block-inverse forward error) use the
    # static-sliced inverse-diagonal solves instead -- partitionable
    # gemms, no full-width solve temps (ops/sygst.sygst_inv).
    sygst_mode = cfg.sygst_mode
    if sygst_mode == "trinv":
        # Full block-doubled inv(U) reused for phases 2 AND 4 (the
        # sharded path's SPMD-first scheme, parallel/sharded.py:84-104,
        # brought to the single chip as an A/B against 'inv'):
        # log-depth partitionable gemms, no sequential solve steps at
        # all.  Forward error ~eps * kappa(U) -- fp32 pipelines only
        # (the fp64 refinement absorbs it); falls back when n is not
        # 512 * 2^k or the dtype carries the accuracy contract.
        trinv_ok = (
            a.dtype in (jnp.float32, jnp.complex64)
            and n % 512 == 0
            and (n // 512) & (n // 512 - 1) == 0
        )
        if trinv_ok:
            from eigensolver_gpu_tpu.ops.trsm import trinv_upper_full

            with trace_range("sygvdx"):
                u, info = cholesky_upper(b)
                inv = trinv_upper_full(u, base=512)
                c = jnp.conj(inv.T) @ (a @ inv)
                c = (c + jnp.conj(c.T)) / 2
                w, y = syevdx(c, il=il, iu=iu, cfg=cfg)
                z = inv @ y
                return SygvdxResult(w=w, z=z, info=info)
        sygst_mode = "full"
    if sygst_mode == "full":
        # 'inv' is only valid when the batched block inversion can run:
        # nb must divide n and be base*2^j with base=16 (ops/trsm.py
        # _trinv_lower_batched); incompatible nb (e.g. the reference's
        # 448) falls through to 'full'/'blocked' instead of raising.
        nbs = cfg.nb_sygst
        nb_ok = (
            n % nbs == 0 and nbs % 16 == 0 and (nbs // 16) & (nbs // 16 - 1) == 0
        )
        if a.dtype in (jnp.float32, jnp.complex64) and nb_ok and n >= 1024:
            sygst_mode = "inv"
        elif n >= 8192:
            sygst_mode = "blocked"

    with trace_range("sygvdx"):
        u, info = cholesky_upper(b)  # PHASE 1 (zhegvdx_gpu.F90:135)
        c = sygst(a, u, mode=sygst_mode, nb=cfg.nb_sygst)  # PHASE 2 (:158)
        w, y = syevdx(c, il=il, iu=iu, cfg=cfg)  # PHASE 3 (:163)
        # PHASE 4: x = U^{-1} y (cublasZtrsm, zhegvdx_gpu.F90:169);
        # fp32 pipelines use the inverse-diagonal blocked solve
        # (ops/trsm.py), fp64 keeps exact substitution
        from eigensolver_gpu_tpu.ops.trsm import trsm_phase4

        z = trsm_phase4(u, y)
        return SygvdxResult(w=w, z=z, info=info)


def dsygvdx(a, b, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Real driver (dsygvdx_gpu.F90:71). A symmetric, B SPD, float32/64."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if not jnp.issubdtype(a.dtype, jnp.floating):
        raise TypeError(f"dsygvdx expects real input, got {a.dtype}")
    return sygvdx(a, b, il=il, iu=iu, cfg=cfg)


def zhegvdx(a, b, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Complex driver (zhegvdx_gpu.F90:75). A Hermitian, B HPD."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if not jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise TypeError(f"zhegvdx expects complex input, got {a.dtype}")
    return sygvdx(a, b, il=il, iu=iu, cfg=cfg)
