"""Planar complex generalized eigensolver: zhegvdx at native complex flop
count on a TPU stack without complex dtypes.

The full 5-phase reference pipeline (zhegvdx_gpu.F90:131-180) in planar
(re, im) arithmetic:

  1. B = L L^H               planar blocked Cholesky (ops/planar.py)
  2. C = L^{-1} A L^{-H}     two planar triangular solves
  3. hetrd_planar -> real (d, e) -> stedc (real!) -> select il..iu
     -> unmtr_planar back-transform
  4. x = L^{-H} y            planar upper solve
  5. results stay on device as planar pairs

Half the flops of the 2n real embedding (ops/complex_embed.py); exact
LAPACK zhegvdx semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.planar import (
    pcholesky_lower,
    pH,
    pmatmul,
    ptrsm_left_lower,
)
from eigensolver_gpu_tpu.ops.stedc import stedc
from eigensolver_gpu_tpu.ops.sytrd_planar import hetrd_planar
from eigensolver_gpu_tpu.ops.unmtr_planar import unmtr_planar
from eigensolver_gpu_tpu.utils.config import DEFAULT_CONFIG, SolverConfig
from eigensolver_gpu_tpu.utils.kernel_guard import kernel_ok
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


class PlanarResult(NamedTuple):
    w: jax.Array
    zr: jax.Array
    zi: jax.Array
    info: jax.Array


def _want_two_stage_planar(tridiag_mode, min_n, n, is_f32, backend):
    """Planar two-stage gate: 'two' always engages it; 'auto' engages it
    for fp32 TPU runs at n >= cfg.planar_two_stage_min_n (0 = never).
    Crossover measured on-chip round 5 (benchmarks/two_stage_planar.py,
    final kernels): one-stage keeps n=4096 (477.8 vs 534.6 ms);
    two-stage wins 1.28x at n=8192 (2961.9 vs 3783.9 ms: psbrd 1213 +
    chase 530 + q2 809 + q1 410 vs hetrd 3371 + unmtr 413) -> the
    default min_n is 8192 (utils/config.py)."""
    return tridiag_mode == "two" or (
        tridiag_mode == "auto"
        and min_n > 0
        and n >= min_n
        and is_f32
        and backend == "tpu"
    )


def _from_upper_planar(xr, xi):
    """Rebuild the Hermitian planar pair from its upper triangle — LAPACK
    UPLO='U' semantics (zhegvdx_gpu.F90:58: only the upper triangle is
    read; the strict lower may hold anything). Real part symmetric with
    the stored diagonal; imaginary part antisymmetric with zero diagonal."""
    upr = jnp.triu(xr, 1)
    upi = jnp.triu(xi, 1)
    return (
        upr + upr.T + jnp.diag(jnp.diagonal(xr)),
        upi - upi.T,
    )


def _pad_planar(ar, ai, npad):
    n = ar.shape[0]
    if npad == n:
        return ar, ai
    bound = jnp.max(jnp.sum(jnp.sqrt(ar * ar + ai * ai), axis=1)) + 1.0
    k = npad - n
    # tight spacing (see models/syevdx._pad_decoupled): wide ramps
    # inflate stedc's fp32 deflation thresholds via orgnrm scaling
    padvals = bound * (2.0 + jnp.arange(k, dtype=ar.dtype) * (1.0 / 256.0))
    out_r = jnp.zeros((npad, npad), ar.dtype)
    out_r = out_r.at[:n, :n].set(ar)
    out_r = out_r.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(padvals)
    out_i = jnp.zeros((npad, npad), ai.dtype)
    out_i = out_i.at[:n, :n].set(ai)
    return out_r, out_i


def _tri_eigh(d, e, cfg):
    """Tridiagonal eigensolve per cfg.stedc_backend: 'dc' = on-device
    divide & conquer (ops/stedc.py); 'xla' = jnp.linalg.eigh of the
    dense real tridiagonal (the debug fallback utils/config.py
    documents -- previously ignored by this driver)."""
    if cfg.stedc_backend == "xla":
        t = jnp.diag(d) + jnp.diag(e, 1) + jnp.diag(e, -1)
        return jnp.linalg.eigh(t)
    return stedc(d, e, leaf=cfg.stedc_leaf)


@highest_precision
@functools.partial(jax.jit, static_argnames=("il", "iu", "cfg"))
def zhegvdx_planar(ar, ai, br, bi, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Planar A x = lambda B x, eigenpairs il..iu (1-based)."""
    n = ar.shape[0]
    if iu is None:
        iu = n
    if not (1 <= il <= iu <= n):
        raise ValueError(f"require 1 <= il <= iu <= n, got il={il}, iu={iu}, n={n}")
    nb_chol = min(128, n)

    # UPLO='U' contract: only the upper triangles are read.
    ar, ai = _from_upper_planar(ar, ai)
    br, bi = _from_upper_planar(br, bi)

    mixed = cfg.compute_dtype == "float32" and ar.dtype == jnp.float64
    if mixed:
        # fp32 full-spectrum pipeline + fp64 generalized Ogita-Aishima
        # refinement (ops/refine_planar.py) -- the planar analogue of the
        # real mixed path in models/syevdx.py.
        from eigensolver_gpu_tpu.ops.refine_planar import refine_gevp_planar

        f32 = lambda v: v.astype(jnp.float32)
        w32, zr32, zi32, info = zhegvdx_planar(
            f32(ar), f32(ai), f32(br), f32(bi), il=1, iu=n,
            cfg=SolverConfig(
                nb_tridiag=cfg.nb_tridiag, nb_back=cfg.nb_back,
                stedc_leaf=cfg.stedc_leaf,
                stedc_backend=cfg.stedc_backend,
                use_pallas=cfg.use_pallas,
                tridiag_mode=cfg.tridiag_mode, band=cfg.band,
                replay_g=cfg.replay_g,
                planar_solve_mode=cfg.planar_solve_mode,
                mosaic_kernels=cfg.mosaic_kernels,
            ),
        )
        x64 = (zr32.astype(ar.dtype), zi32.astype(ar.dtype))
        # chunk the fp64 gemms at large n (operand expansion OOMs otherwise)
        chunk = 2048 if n >= 8192 else None
        # selected-range economy + cluster-guard margin (see
        # ops/refine_planar.py; mirrors the reference's NZ-column
        # back-transform, zhegvdx_gpu.F90:169)
        sel0 = max(0, il - 1 - cfg.refine_margin)
        sel1 = min(n, iu + cfg.refine_margin)
        w, (zr, zi) = refine_gevp_planar(
            (ar, ai), (br, bi), x64, sweeps=cfg.refine_iters, chunk=chunk,
            sel=(sel0, sel1 - sel0), w0=w32.astype(ar.dtype),
            extra_max=cfg.refine_extra_max,
        )
        order = jnp.argsort(w)
        w = w[order]
        zr = zr[:, order]
        zi = zi[:, order]
        lo = il - 1 - sel0
        hi = lo + (iu - il + 1)
        return PlanarResult(
            w=w[lo:hi], zr=zr[:, lo:hi], zi=zi[:, lo:hi], info=info,
        )

    # fp32 pipeline: diagonal-block-inverted solves (~30 sequential steps
    # vs n row steps; the fp64 refinement absorbs the eps*kappa forward
    # error). fp64 path keeps pure substitution.  NEGATIVE RESULT
    # (round 2): replacing the three solves with a full ptrinv_lower +
    # planar gemm applies measures FASTER standalone (46 ms vs 143 ms)
    # but 40 ms SLOWER end-to-end in this pipeline (1440 vs 1400 ms
    # headline) -- the inverse's concat-assembled temporaries break
    # XLA's cross-stage scheduling. Do not re-wire without measuring
    # the full pipeline.
    trinv_ok = (
        cfg.planar_solve_mode == "trinv"
        and ar.dtype == jnp.float32
        and n % 128 == 0
        and (n // 128) & (n // 128 - 1) == 0
    )
    if ar.dtype == jnp.float32 and cfg.planar_solve_mode != "subst":
        from eigensolver_gpu_tpu.ops.planar import ptrsm_left_lower_inv as _solve_l
    else:
        _solve_l = ptrsm_left_lower

    def _solve_u(u, rhs, nb):
        fl = lambda mm: jnp.flip(mm, axis=(0, 1))
        flv = lambda mm: jnp.flip(mm, axis=0)
        xr_, xi_ = _solve_l((fl(u[0]), fl(u[1])), (flv(rhs[0]), flv(rhs[1])), nb=nb)
        return flv(xr_), flv(xi_)

    with trace_range("zhegvdx_planar"):
        l, info = pcholesky_lower(
            (br, bi), nb=nb_chol, block_kernel=cfg.mosaic_kernels
        )  # PHASE 1
        if trinv_ok:
            # 'trinv' A/B (queued re-measure of the round-2 negative
            # result above -- the pipeline around it changed): ONE full
            # block-doubled planar inv(L) (ops/planar.ptrinv_lower)
            # turns all three solves into planar Karatsuba gemms.
            from eigensolver_gpu_tpu.ops.planar import ptrinv_lower

            linv = ptrinv_lower(l)
            _solve_l = lambda l_, rhs, nb: pmatmul(linv, rhs)
            # phase 4 solves L^H x = y, so x = inv(L)^H y
            _solve_u = lambda u_, rhs, nb: pmatmul(pH(linv), rhs)
        # PHASE 2: C = L^{-1} A L^{-H} = L^{-1} (L^{-1} A^H)^H
        x = _solve_l(l, (ar, ai), nb=nb_chol)
        y = _solve_l(l, pH(x), nb=nb_chol)
        cr, ci = pH(y)
        cr = (cr + cr.T) / 2
        ci = (ci - ci.T) / 2

        # PHASE 3: tridiagonalize -> real D&C -> back-transform
        nbt = cfg.nb_tridiag
        npad = -(-n // nbt) * nbt
        cr_p, ci_p = _pad_planar(cr, ci, npad)
        want_two = _want_two_stage_planar(
            cfg.tridiag_mode, cfg.planar_two_stage_min_n, n,
            ar.dtype == jnp.float32, jax.default_backend(),
        )
        two_stage = (
            want_two
            and npad % cfg.band == 0
            and npad >= 3 * cfg.band
        )
        if two_stage:
            # Planar two-stage reduction (round 4, VERDICT missing #1):
            # the one-stage hetrd column loop is at its HBM roofline
            # (549 ms at n=4096 fp32, RESULTS.md) -- stage 1 moves the
            # O(n^3) into planar Karatsuba gemms, the chase eliminates
            # the band, and the complex subdiagonal is phase-rotated
            # real so the real stedc applies unchanged.
            from eigensolver_gpu_tpu.ops.sb2st import dense_to_band
            from eigensolver_gpu_tpu.ops.sb2st_planar import (
                apply_q2_planar,
                bulge_chase_planar,
                phase_normalize,
            )
            from eigensolver_gpu_tpu.ops.sbrd_planar import (
                apply_q1_planar,
                psbrd,
            )

            (abr, abi), vs, ts = psbrd(cr_p, ci_p, band=cfg.band, bucket=512,
                                       panel_kernel=cfg.mosaic_kernels)
            band_r = dense_to_band(abr, cfg.band)
            band_i = dense_to_band(abi, cfg.band)
            # Mosaic planar chase on fp32 TPU runs (single kernel per
            # phase, strided-roll shears); XLA chase everywhere else
            if (
                ar.dtype == jnp.float32
                and cfg.mosaic_kernels
                and (3 * cfg.band) % 8 == 0
                and kernel_ok("chase_planar")
            ):
                import os as _os

                from eigensolver_gpu_tpu.ops.chase_pallas import (
                    bulge_chase_planar_pallas,
                )

                # EIGSOLVE_CHASE_BATCH3=1: vmax-batched kernel (one band
                # round trip per 3 timesteps per plane, bit-identical
                # outputs) -- A/B lever, default off until measured
                b3 = bool(_os.environ.get("EIGSOLVE_CHASE_BATCH3")) and (
                    cfg.band % 8 == 0
                )
                d, (e_r, e_i), vt, taut = bulge_chase_planar_pallas(
                    band_r, band_i, cfg.band, batch3=b3
                )
            else:
                d, (e_r, e_i), vt, taut = bulge_chase_planar(
                    band_r, band_i, cfg.band
                )
            (p_r, p_i), e_abs = phase_normalize(e_r, e_i)
            w_all, q_tri = _tri_eigh(d, e_abs, cfg)
            w = w_all[il - 1 : iu]
            z0 = q_tri[:, il - 1 : iu]
            # eigvec chain: z = Q1 Q2 D z_tri (D from phase_normalize)
            zr0 = z0 * p_r[:, None]
            zi0 = z0 * p_i[:, None]
            g = cfg.replay_g or (
                3 * cfg.band if ar.dtype == jnp.float32 else cfg.band
            )
            use_kernel = (
                ar.dtype == jnp.float32
                and cfg.mosaic_kernels
                and g % 8 == 0
                and cfg.band % 8 == 0
                and cfg.band + g - 1 <= 128
                and kernel_ok("replay_planar")
            )
            if use_kernel:
                from eigensolver_gpu_tpu.ops.replay_pallas import (
                    apply_q2_planar_pallas,
                )

                yr, yi = apply_q2_planar_pallas(
                    vt, taut, (zr0, zi0), npad, cfg.band, g=g
                )
            else:
                yr, yi = apply_q2_planar(
                    vt, taut, (zr0, zi0), npad, cfg.band, g=g
                )
            yr, yi = apply_q1_planar(vs, ts, (yr, yi))
        else:
            (pr, pi), d, e, (taur, taui) = hetrd_planar(
                cr_p, ci_p, nb=nbt, bucket=128, use_pallas=cfg.use_pallas
            )
            w_all, q_tri = _tri_eigh(d, e, cfg)
            w = w_all[il - 1 : iu]
            zr0 = q_tri[:, il - 1 : iu]
            zi0 = jnp.zeros_like(zr0)
            yr, yi = unmtr_planar(pr, pi, taur, taui, zr0, zi0, nb=cfg.nb_back)
        yr, yi = yr[:n], yi[:n]

        # PHASE 4: x = L^{-H} y  (L^H is upper triangular)
        lh = pH(l)
        zr, zi = _solve_u(lh, (yr, yi), nb=nb_chol)
        return PlanarResult(w=w, zr=zr, zi=zi, info=info)


def zhegvdx_planar_host(a, b, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Convenience wrapper for complex host arrays."""
    import numpy as np

    a = np.asarray(a)
    b = np.asarray(b)
    return zhegvdx_planar(
        jnp.asarray(a.real.copy()),
        jnp.asarray(a.imag.copy()),
        jnp.asarray(b.real.copy()),
        jnp.asarray(b.imag.copy()),
        il=il,
        iu=iu,
        cfg=cfg,
    )


def zhegvdx_planar_batched(
    ar, ai, br, bi, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG, chunk=None
):
    """vmap over a leading batch axis (QE k-point batches, BASELINE.md
    config 4, at native complex flop count).

    ``chunk``: process the batch in sequential chunks of this size
    (lax.map over vmap). Needed for large batches at large n: the
    platform's emulated fp64 dot materializes an 8-slice fp32 expansion
    of each operand, so a 64 x 1024 batch of refinement gemms wants
    ~46 GB all-at-once but fits comfortably chunked.
    """
    fn = functools.partial(zhegvdx_planar, il=il, iu=iu, cfg=cfg)
    batch = ar.shape[0]
    if chunk is None or chunk >= batch:
        return jax.vmap(fn)(ar, ai, br, bi)
    if batch % chunk != 0:
        raise ValueError(f"batch {batch} not divisible by chunk {chunk}")
    resh = lambda x: x.reshape((batch // chunk, chunk) + x.shape[1:])
    out = jax.lax.map(
        lambda t: jax.vmap(fn)(*t), (resh(ar), resh(ai), resh(br), resh(bi))
    )
    flat = lambda x: x.reshape((batch,) + x.shape[2:])
    return PlanarResult(*(flat(x) for x in out))
