"""Sharded generalized eigensolves over a TPU mesh.

TPU-native 'scale the big axis' story (SURVEY.md §5.7): the reference has
no distribution at all, so these are capability extensions designed for
ICI, not translations.

Strategy (round 2+):
  * tensor parallel ('tp'): A, B, C, Z are sharded over matrix rows with
    NamedSharding; XLA inserts all_gather/psum/collective-matmul over ICI
    under pjit semantics for EVERY dominant stage -- the two-sided
    triangular-solve reduction to standard form, the tridiagonalization
    panel products (ops/sytrd.py takes ``mesh``), the stedc merge
    batches/assembly gemms, the WY back-transform, the refinement gemms
    (ops/refine.py takes ``mesh``), and the eigenvector back-substitution.
    models/syevdx.syevdx threads ``mesh`` through all of them;
    tests/test_parallel.py asserts the collectives are present in the
    compiled module. Only the latency-bound band chase (two-stage path)
    deliberately stays replicated-small.
  * data parallel ('dp'): a batch of independent (A_k, B_k) solves
    (Quantum ESPRESSO k-points) vmapped over the batch axis and sharded
    over 'dp' -- each device runs whole solves, zero collectives inside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

import dataclasses

from eigensolver_gpu_tpu.models.sygvdx import SygvdxResult, _from_upper, sygvdx
from eigensolver_gpu_tpu.utils.config import DEFAULT_CONFIG, SolverConfig
from eigensolver_gpu_tpu.models.syevdx import syevdx
from eigensolver_gpu_tpu.ops.cholesky import cholesky_upper


def _no_mosaic(cfg: SolverConfig) -> SolverConfig:
    """Config with the Mosaic kernels forced off (sharded batch axes)."""
    if not cfg.mosaic_kernels:
        return cfg
    return dataclasses.replace(cfg, mosaic_kernels=False)


@functools.partial(jax.jit, static_argnames=("mesh", "il", "iu", "cfg"))
def _sharded_step(a, b, mesh, il, iu, cfg):
    # matmul precision 'highest' INSIDE the traced body (not a wrapper
    # around the jit): the trinv phase-2/4 gemms below are raw jnp
    # matmuls in this function's own body (not inside an internally
    # decorated op), and a bare fp32 matmul on TPU is a 1-pass bf16 MXU
    # gemm -- fatal to the refinement's starting basis
    # (utils/precision.py). An outer wrapper would also hide jit's
    # .lower(), which benchmarks/config5_artifact.py AOT-compiles.
    with jax.default_matmul_precision("highest"):
        return _sharded_step_body(a, b, mesh, il, iu, cfg)


def _sharded_step_body(a, b, mesh, il, iu, cfg):
    row = NamedSharding(mesh, P("tp", None))
    n = a.shape[0]
    # UPLO='U' contract, same normalization as the unsharded driver
    a = _from_upper(a)
    b = _from_upper(b)

    mixed = cfg.compute_dtype == "float32" and a.dtype == jnp.float64
    if mixed:
        # full-fp32 sharded pipeline + sharded selected-range fp64
        # generalized refinement -- the same scheme as the single-chip
        # mixed driver (models/sygvdx.py). Running only phase 3 in fp32
        # would leave Cholesky/sygst/back-substitution on the emulated
        # fp64 path AND double the per-device memory plan (measured:
        # the fp64 sygst_blocked alone plans ~9 GB/device at n=16384).
        from eigensolver_gpu_tpu.ops.refine import refine_gevp

        # the trinv (explicit full-inverse) phases 2+4 are an fp32-inner
        # economy whose eps32*kappa(U) forward error the fp64 refinement
        # absorbs -- opt the INNER solve into it here (unless the user
        # pinned 'blocked'); a direct fp32/complex64 entry has no
        # refinement behind it and keeps backward-stable solves unless
        # the user explicitly asks for sygst_mode='trinv'.
        inv_ok = n % 512 == 0 and (n // 512) & (n // 512 - 1) == 0
        inner_sygst = (
            "trinv" if inv_ok and cfg.sygst_mode != "blocked"
            else cfg.sygst_mode
        )
        inner = SolverConfig(
            nb_sygst=cfg.nb_sygst, nb_tridiag=cfg.nb_tridiag,
            nb_back=cfg.nb_back, stedc_leaf=cfg.stedc_leaf,
            stedc_backend=cfg.stedc_backend,
            sygst_mode=inner_sygst, use_pallas=cfg.use_pallas,
            tridiag_mode=cfg.tridiag_mode, band=cfg.band,
            two_stage_min_n=cfg.two_stage_min_n, replay_g=cfg.replay_g,
            mosaic_kernels=cfg.mosaic_kernels,
        )
        r32 = _sharded_step(
            a.astype(jnp.float32), b.astype(jnp.float32), mesh, 1, n, inner
        )
        sel0 = max(0, il - 1 - cfg.refine_margin)
        sel1 = min(n, iu + cfg.refine_margin)
        w, z = refine_gevp(
            a, b, r32.z.astype(a.dtype), sweeps=cfg.refine_iters,
            chunk=2048 if n >= 8192 else None,
            sel=(sel0, sel1 - sel0), w0=r32.w.astype(a.dtype),
            extra_max=cfg.refine_extra_max, mesh=mesh,
        )
        order = jnp.argsort(w)
        w = w[order]
        z = lax.with_sharding_constraint(z[:, order], row)
        lo = il - 1 - sel0
        return SygvdxResult(
            w=w[lo : lo + (iu - il + 1)], z=z[:, lo : lo + (iu - il + 1)],
            info=r32.info,
        )

    u, info = cholesky_upper(b)
    # SPMD-first phases 2 and 4 for the fp32 inner pipeline (round 4,
    # VERDICT #4): compute inv(U) ONCE by batched block doubling --
    # log2(n/512) levels of partitionable gemms, no sequential solve
    # chain for the partitioner to serialize -- then phase 2 is two
    # gemms C = inv^H A inv and phase 4 one gemm Z = inv Y.  Replaces
    # both of the round-3 memory-plan offenders (fp32 sygst_blocked
    # 4.65 GB/device; phase-4 whole-matrix trsm 3.0 GB + collective
    # chain).  Forward error ~eps32 * kappa(U) is absorbed by the fp64
    # refinement (defect-gated escalation guards the contract).
    # History: per-block sygst_inv was tried round 3 and REGRESSED the
    # plan 8.2 -> 12.3 GB/device (unrolled full-width update chains on
    # the sharded buffer); the full inverse has no such chains.
    lowprec = a.dtype in (jnp.float32, jnp.complex64)
    inv_ok = n % 512 == 0 and (n // 512) & (n // 512 - 1) == 0
    # trinv requires an explicit opt-in ('trinv'): the mixed path above
    # sets it on its inner fp32 solve (refinement absorbs the
    # eps32*kappa(U) explicit-inverse forward error); a DIRECT
    # fp32/complex64 entry has no refinement, so it keeps the
    # backward-stable triangular solves unless the caller asks.
    if lowprec and inv_ok and cfg.sygst_mode == "trinv":
        from eigensolver_gpu_tpu.ops.trsm import trinv_upper_full

        inv = lax.with_sharding_constraint(trinv_upper_full(u, base=512), row)
        c = jnp.conj(inv.T) @ lax.with_sharding_constraint(a @ inv, row)
        c = (c + jnp.conj(c.T)) / 2
    else:
        inv = None
        if n >= 8192 or cfg.sygst_mode == "blocked":
            from eigensolver_gpu_tpu.ops.sygst import sygst_blocked

            c = sygst_blocked(a, u, nb=cfg.nb_sygst)
        else:
            x = lax.linalg.triangular_solve(
                u, a, left_side=True, lower=False, transpose_a=True,
                conjugate_a=True,
            )
            c = lax.linalg.triangular_solve(u, x, left_side=False, lower=False)
            c = (c + jnp.conj(c.T)) / 2
    # standard solve with the dominant stages sharded over 'tp'
    # (tridiagonalization, stedc merges, back-transform, refinement)
    c = lax.with_sharding_constraint(c, row)
    w, y = syevdx(c, il=il, iu=iu, cfg=cfg, mesh=mesh)
    y = lax.with_sharding_constraint(y, row)
    if inv is not None:
        z = inv @ y  # phase 4: one partitionable gemm, inv reused
    else:
        from eigensolver_gpu_tpu.ops.trsm import trsm_phase4

        z = trsm_phase4(u, y)
    z = lax.with_sharding_constraint(z, row)
    return SygvdxResult(w=w, z=z, info=info)


def sygvdx_sharded(a, b, mesh, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Tensor-parallel generalized solve: rows of A/B/Z sharded over 'tp'."""
    n = a.shape[0]
    if iu is None:
        iu = n
    row_sharded = NamedSharding(mesh, P("tp", None))
    a = jax.device_put(a, row_sharded)
    b = jax.device_put(b, row_sharded)
    return _sharded_step(a, b, mesh, il, iu, cfg)


def sygvdx_batched(a, b, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """vmap over a batch of (A_k, B_k) pairs (BASELINE.md config 4)."""
    fn = functools.partial(sygvdx, il=il, iu=iu, cfg=cfg)
    return jax.vmap(fn)(a, b)


def sygvdx_batched_sharded(
    a, b, mesh, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG
):
    """Batched solves with the batch axis sharded over 'dp' x 'tp'.

    Every device owns batch/n_devices whole solves -- the QE k-point
    pattern. Flattens the mesh so all devices participate.
    """
    ndev = mesh.devices.size
    if a.shape[0] % ndev != 0:
        raise ValueError(f"batch {a.shape[0]} not divisible by {ndev} devices")
    batch_sharded = NamedSharding(mesh, P(("dp", "tp"), None, None))
    a = jax.device_put(a, batch_sharded)
    b = jax.device_put(b, batch_sharded)
    # Pallas calls are not SPMD-partitionable: the vmapped inner solves
    # run over a sharded batch axis, so force the XLA forms
    return _batched_step(a, b, il, iu, _no_mosaic(cfg))


@functools.partial(jax.jit, static_argnames=("il", "iu", "cfg"))
def _batched_step(a, b, il, iu, cfg):
    fn = functools.partial(sygvdx, il=il, iu=iu, cfg=cfg)
    return jax.vmap(fn)(a, b)


def zhegvdx_planar_batched_sharded(
    ar, ai, br, bi, mesh, il=1, iu=None,
    cfg: SolverConfig = DEFAULT_CONFIG, chunk=None,
):
    """Batched PLANAR complex solves with the batch axis sharded over
    the mesh: the multi-chip form of BASELINE config 4 (QE k-point
    batches are Hermitian, so production batching is complex-first).

    Each device owns batch/n_devices whole planar solves (re,im planes,
    models/zhegvdx_planar.py) -- zero collectives inside a solve, the
    'dp' pattern of sygvdx_batched_sharded at native complex flop count.
    ``chunk`` bounds the per-device live set exactly as in
    zhegvdx_planar_batched (the emulated-fp64 refinement dot expands 8x
    in memory); it chunks the GLOBAL batch, so keep it a multiple of the
    device count or leave None when the per-device share already fits.
    """
    from eigensolver_gpu_tpu.models.zhegvdx_planar import (
        zhegvdx_planar_batched,
    )

    ndev = mesh.devices.size
    batch = ar.shape[0]
    if batch % ndev != 0:
        raise ValueError(f"batch {batch} not divisible by {ndev} devices")
    batch_sharded = NamedSharding(mesh, P(("dp", "tp"), None, None))
    ar, ai, br, bi = (
        jax.device_put(x, batch_sharded) for x in (ar, ai, br, bi)
    )
    # Pallas calls are not SPMD-partitionable (the pchol/chase/replay/ql
    # kernel gates default ON for fp32 TPU runs): force the XLA forms
    # for the vmapped-over-sharded-batch inner solves (ADVICE r4 medium)
    return zhegvdx_planar_batched(ar, ai, br, bi, il=il, iu=iu,
                                  cfg=_no_mosaic(cfg), chunk=chunk)
