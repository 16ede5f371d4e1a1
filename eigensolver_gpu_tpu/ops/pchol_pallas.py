"""Fused Mosaic Cholesky-block kernel for the planar blocked Cholesky
(fp32).

Re-designs the base-block step of ops/planar.pcholesky_lower (reference
role: the cusolverDnZpotrf call at zhegvdx_gpu.F90:135).  The XLA form
pays two nb-step compiled loops per diagonal block (`_pchol_base` +
`_fsub_base`) at ~5-7 us of dispatch per step -- with nb=128 and 32
blocks at n=4096 that is ~55 ms of the measured 61 ms stage time (the
left-looking correction gemms are ~4 ms of MXU-ideal work).

This kernel fuses, per diagonal block, in ONE dispatch:
  * the nb-step unblocked planar Cholesky (rank-1 Hermitian downdates,
    all VPU; dynamic LANE indexing is not expressible in Mosaic, so
    column reads are one-hot lane reductions -- VPU, per platform fact
    that MXU gemv-shaped dots are slow in-kernel);
  * the nb-step forward substitution on the identity, producing
    inv(L_d) -- so the caller's subdiagonal-panel solve collapses to
    ONE planar Karatsuba gemm on the MXU instead of a second nb-step
    XLA loop over an (nb, nr) rhs.

Forward error of the panel solve becomes ~eps32 * kappa(L_block)
(explicit block inverse) instead of substitution's eps32 * kappa(L) --
the same class as ops/planar.ptrsm_left_lower_inv, which the fp32
pipeline already uses for every other solve; callers gate this kernel
to fp32 (the fp64 path keeps the exact XLA loops).

devInfo contract preserved: `fail` = 1-based index of the first
non-positive/NaN pivot (0 if none), negative pivots clamped to tiny so
the factorization stays finite (ops/planar._pchol_base semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pchol_block_kernel(nb, *refs):
    dr_in, di_in, ldr, ldi, invr, invi, fail_ref = refs
    rows = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    tiny = jnp.float32(jnp.finfo(jnp.float32).tiny)
    eye = (rows == lanes).astype(jnp.float32)

    ldr[:, :] = dr_in[:, :]
    ldi[:, :] = di_in[:, :]

    def _col(m, j):
        # column j in SUBLANE layout (nb, 1): one-hot lane reduction
        return jnp.sum(m * (lanes == j).astype(jnp.float32), axis=1,
                       keepdims=True)

    def chol_step(j, fail):
        onehot_l = (lanes == j).astype(jnp.float32)  # (1, nb)
        rowj_r = ldr[pl.ds(j, 1), :]  # (1, nb)
        rowj_i = ldi[pl.ds(j, 1), :]
        pivot = jnp.sum(rowj_r * onehot_l)
        badj = (pivot <= 0.0) | jnp.isnan(pivot)
        fail = jnp.where(badj & (fail == 0), j + 1, fail)
        dj = jnp.sqrt(jnp.maximum(pivot, tiny))
        # entries (r, j) with r < j are stale (their downdates stopped at
        # step r) but are masked out here and tril-zeroed at the end
        ccol_r = _col(ldr[:, :], j)  # (nb, 1)
        ccol_i = _col(ldi[:, :], j)
        below = (rows > j).astype(jnp.float32)
        right = (lanes > j).astype(jnp.float32)
        lcol_r = below * ccol_r / dj + dj * (rows == j).astype(jnp.float32)
        lcol_i = below * ccol_i / dj
        # conj(l) in LANE layout: the trailing block stays Hermitian, so
        # conj(column j below diag) = row j right of the diagonal
        q_r = right * rowj_r / dj
        q_i = right * rowj_i / dj
        keep = below * right
        ldr[:, :] -= keep * (lcol_r * q_r - lcol_i * q_i)
        ldi[:, :] -= keep * (lcol_r * q_i + lcol_i * q_r)
        # write L column j
        ldr[:, :] = ldr[:, :] * (1.0 - onehot_l) + lcol_r * onehot_l
        ldi[:, :] = ldi[:, :] * (1.0 - onehot_l) + lcol_i * onehot_l
        return fail

    # int32 bounds: i64 induction vars (x64 mode) hit Mosaic's infinite
    # convert recursion -- see ops/ql_panel_pallas.py
    fail = lax.fori_loop(jnp.int32(0), jnp.int32(nb), chol_step,
                         jnp.int32(0))
    fail_ref[0, 0] = fail
    # zero the strict upper triangle (stale values left by the row reads)
    tril = (rows >= lanes).astype(jnp.float32)
    ldr[:, :] *= tril
    ldi[:, :] *= tril

    # ---- inv(L_d) by forward substitution on I (downdate form) ----
    invr[:, :] = eye
    invi[:, :] = jnp.zeros_like(eye)

    def inv_step(j, _):
        onehot_l = (lanes == j).astype(jnp.float32)
        djj = jnp.sum(ldr[pl.ds(j, 1), :] * onehot_l)  # real positive
        y_r = invr[pl.ds(j, 1), :] / djj
        y_i = invi[pl.ds(j, 1), :] / djj
        invr[pl.ds(j, 1), :] = y_r
        invi[pl.ds(j, 1), :] = y_i
        below = (rows > j).astype(jnp.float32)
        lcol_r = below * _col(ldr[:, :], j)
        lcol_i = below * _col(ldi[:, :], j)
        invr[:, :] -= lcol_r * y_r - lcol_i * y_i
        invi[:, :] -= lcol_r * y_i + lcol_i * y_r
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb), inv_step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pchol_block_planar_pallas(dr, di, interpret=False):
    """Fused planar Cholesky of one HPD block + inv(L) (fp32).

    Returns (ld_r, ld_i, inv_r, inv_i, fail): the lower factor, its
    explicit inverse (both lower-triangular), and the 1-based
    first-bad-pivot index (0 on success)."""
    nb = dr.shape[0]
    if nb % 8 != 0:
        raise ValueError(f"pchol_block_planar_pallas requires nb % 8 == 0, got {nb}")
    f32 = jnp.float32
    kernel = functools.partial(_pchol_block_kernel, nb)
    ldr, ldi, invr, invi, fail = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nb), f32),
            jax.ShapeDtypeStruct((nb, nb), f32),
            jax.ShapeDtypeStruct((nb, nb), f32),
            jax.ShapeDtypeStruct((nb, nb), f32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(dr.astype(f32), di.astype(f32))
    return ldr, ldi, invr, invi, fail[0, 0]
