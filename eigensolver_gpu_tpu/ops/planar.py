"""Planar complex linear algebra: complex matrices as (re, im) real pairs.

The target TPU stack has no complex dtypes (SURVEY of the platform in
ops/complex_embed.py), so the native-flop-count complex path represents
every complex array as a pair of real arrays and implements the needed
BLAS/LAPACK pieces in planar real arithmetic:

  * ``pmatmul``        -- 3-multiplication Karatsuba complex gemm
  * ``ptrsm_left_lower`` -- blocked forward substitution, L X = B
  * ``pcholesky_lower`` -- blocked planar Cholesky, B = L L^H
  * upper-triangular wrappers via conjugate/flip identities

These are the building blocks of the planar zhegvdx driver
(models/zhegvdx_planar.py) -- cf. the reference's use of cuSOLVER
Zpotrf + cuBLAS ztrsm (zhegvdx_gpu.F90:135,169), re-implemented here
because no vendor complex library exists on this hardware.

A planar array is a `(re, im)` tuple of equal-shape real jnp arrays.
All functions are shape-polymorphic and jit-friendly (fixed shapes,
fori_loop based blocking).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.kernel_guard import kernel_ok
from eigensolver_gpu_tpu.utils.precision import highest_precision

_NO_PCHOL_KERNEL = bool(os.environ.get("EIGSOLVE_NO_PCHOL_KERNEL"))


def pconj(x):
    return (x[0], -x[1])


def pT(x):
    """Transpose (no conjugation)."""
    return (x[0].T, x[1].T)


def pH(x):
    """Conjugate transpose."""
    return (x[0].T, -x[1].T)


def padd(x, y):
    return (x[0] + y[0], x[1] + y[1])


def psub(x, y):
    return (x[0] - y[0], x[1] - y[1])


def pscale(x, sr, si=0.0):
    """Multiply by a (possibly planar-scalar) complex scalar."""
    return (x[0] * sr - x[1] * si, x[0] * si + x[1] * sr)


def pmatmul(x, y):
    """Karatsuba complex product: 3 real gemms instead of 4."""
    m1 = x[0] @ y[0]
    m2 = x[1] @ y[1]
    m3 = (x[0] + x[1]) @ (y[0] + y[1])
    return (m1 - m2, m3 - m1 - m2)


def pmatmul_chunked(x, y, chunk):
    """pmatmul with the columns of y processed in sequential chunks.

    The platform's emulated fp64 dot expands each operand into 8 fp32
    slices; chunking keeps one expansion alive at a time (needed for
    n >= 8192 refinement gemms, which otherwise OOM the 16 GB HBM)."""
    m = y[0].shape[1]
    if chunk is None or chunk >= m or m % chunk != 0:
        return pmatmul(x, y)
    resh = lambda a: a.reshape(a.shape[0], m // chunk, chunk).transpose(1, 0, 2)
    yr, yi = resh(y[0]), resh(y[1])
    out = jax.lax.map(lambda t: pmatmul(x, t), (yr, yi))
    flat = lambda a: a.transpose(1, 0, 2).reshape(x[0].shape[0], m)
    return flat(out[0]), flat(out[1])


def pdiv(x, y):
    """Elementwise complex division x / y."""
    den = y[0] * y[0] + y[1] * y[1]
    safe = jnp.where(den == 0, jnp.ones_like(den), den)
    return (
        (x[0] * y[0] + x[1] * y[1]) / safe,
        (x[1] * y[0] - x[0] * y[1]) / safe,
    )


def to_planar(a):
    """Split a complex (numpy/jax) array into a planar pair."""
    a = jnp.asarray(a)
    return (jnp.real(a), jnp.imag(a))


def from_planar(x):
    """Assemble a complex array (host-side; for tests off-TPU)."""
    import numpy as np

    return np.asarray(x[0]) + 1j * np.asarray(x[1])


def _fsub_base(lr, li, br, bi, nb):
    """Forward substitution for the nb x nb planar lower block L X = B."""

    def body(i, x):
        xr, xi = x
        lrow_r = lax.dynamic_slice(lr, (i, 0), (1, nb))[0]
        lrow_i = lax.dynamic_slice(li, (i, 0), (1, nb))[0]
        acc_r = lrow_r @ xr - lrow_i @ xi  # (m,)
        acc_i = lrow_r @ xi + lrow_i @ xr
        br_i = lax.dynamic_slice(br, (i, 0), (1, br.shape[1]))[0]
        bi_i = lax.dynamic_slice(bi, (i, 0), (1, br.shape[1]))[0]
        num_r = br_i - acc_r
        num_i = bi_i - acc_i
        dr = lr[i, i]
        di = li[i, i]
        den = dr * dr + di * di
        safe = jnp.where(den == 0, jnp.ones_like(den), den)
        row_r = (num_r * dr + num_i * di) / safe
        row_i = (num_i * dr - num_r * di) / safe
        xr = lax.dynamic_update_slice(xr, row_r[None, :], (i, 0))
        xi = lax.dynamic_update_slice(xi, row_i[None, :], (i, 0))
        return xr, xi

    x0 = (jnp.zeros_like(br), jnp.zeros_like(bi))
    return lax.fori_loop(0, nb, body, x0)


def _ptrinv_batched(lr, li, base=16):
    """Batched inverse of planar lower-triangular blocks (B, k, k).

    Recursive block inversion: inv([[A,0],[C,D]]) = [[iA,0],[-iD C iA, iD]].
    All blocks at each level invert together, so the sequential depth is
    base + log2(k/base) steps instead of k substitution rows -- the
    ptrsm diagonal solves were the pipeline's hidden row-serial loop.
    """
    k = lr.shape[-1]
    if k <= base:
        # batched substitution against the identity, fori over base rows
        nb_ = lr.shape[0]
        eye = jnp.broadcast_to(jnp.eye(k, dtype=lr.dtype), (nb_, k, k))

        def body(i, x):
            xr, xi = x
            lrow_r = lax.dynamic_slice(lr, (0, i, 0), (nb_, 1, k))[:, 0, :]
            lrow_i = lax.dynamic_slice(li, (0, i, 0), (nb_, 1, k))[:, 0, :]
            acc_r = jnp.einsum("bk,bkj->bj", lrow_r, xr) - jnp.einsum(
                "bk,bkj->bj", lrow_i, xi
            )
            acc_i = jnp.einsum("bk,bkj->bj", lrow_r, xi) + jnp.einsum(
                "bk,bkj->bj", lrow_i, xr
            )
            rhs_r = eye[:, i, :] - acc_r
            rhs_i = -acc_i
            dr = lr[:, i, i][:, None]
            di = li[:, i, i][:, None]
            den = dr * dr + di * di
            safe = jnp.where(den == 0, jnp.ones_like(den), den)
            row_r = (rhs_r * dr + rhs_i * di) / safe
            row_i = (rhs_i * dr - rhs_r * di) / safe
            xr = lax.dynamic_update_slice(xr, row_r[:, None, :], (0, i, 0))
            xi = lax.dynamic_update_slice(xi, row_i[:, None, :], (0, i, 0))
            return xr, xi

        z = jnp.zeros_like(lr)
        return lax.fori_loop(0, k, body, (z, z))
    h = k // 2
    ia_r, ia_i = _ptrinv_batched(lr[:, :h, :h], li[:, :h, :h], base)
    id_r, id_i = _ptrinv_batched(lr[:, h:, h:], li[:, h:, h:], base)
    cr, ci = lr[:, h:, :h], li[:, h:, :h]
    # M = iD @ C @ iA  (batched planar products)
    t_r = jnp.einsum("bij,bjk->bik", cr, ia_r) - jnp.einsum("bij,bjk->bik", ci, ia_i)
    t_i = jnp.einsum("bij,bjk->bik", cr, ia_i) + jnp.einsum("bij,bjk->bik", ci, ia_r)
    m_r = jnp.einsum("bij,bjk->bik", id_r, t_r) - jnp.einsum("bij,bjk->bik", id_i, t_i)
    m_i = jnp.einsum("bij,bjk->bik", id_r, t_i) + jnp.einsum("bij,bjk->bik", id_i, t_r)
    top_r = jnp.concatenate([ia_r, jnp.zeros_like(cr).transpose(0, 2, 1)], axis=2)
    top_i = jnp.concatenate([ia_i, jnp.zeros_like(ci).transpose(0, 2, 1)], axis=2)
    bot_r = jnp.concatenate([-m_r, id_r], axis=2)
    bot_i = jnp.concatenate([-m_i, id_i], axis=2)
    return (
        jnp.concatenate([top_r, bot_r], axis=1),
        jnp.concatenate([top_i, bot_i], axis=1),
    )


@highest_precision
@functools.partial(jax.jit, static_argnames=("base",))
def ptrinv_lower(l, base=128):
    """Full planar lower-triangular inverse, bottom-up batched doubling.

    Level 0 inverts all n/base diagonal blocks together (one batched
    substitution loop); level k merges pairs with the 2x2 block-inverse
    identity inv([[A,0],[C,D]]) = [[iA,0],[-iD C iA, iD]] -- so the
    sequential depth is a 16-step batched substitution plus log2(n/16)
    batched-gemm levels, and a triangular solve against any rhs becomes
    ONE planar gemm.  Forward
    error ~eps * kappa(L) (explicit-inverse apply): used on the fp32
    pipeline where the fp64 refinement absorbs it; the fp64 path keeps
    substitution (ptrsm_left_lower).
    """
    lr, li = l
    n = lr.shape[0]
    if n % base != 0 or (n // base) & (n // base - 1):
        raise ValueError(f"ptrinv requires n = base * 2^k, got n={n}, base={base}")
    nb0 = n // base
    diags_r = jnp.stack(
        [lr[k * base : (k + 1) * base, k * base : (k + 1) * base] for k in range(nb0)]
    )
    diags_i = jnp.stack(
        [li[k * base : (k + 1) * base, k * base : (k + 1) * base] for k in range(nb0)]
    )
    inv_r, inv_i = _ptrinv_batched(diags_r, diags_i)
    size = base
    while size < n:
        pairs = n // (2 * size)
        ia_r, ia_i = inv_r[0::2], inv_i[0::2]
        id_r, id_i = inv_r[1::2], inv_i[1::2]
        cr = jnp.stack(
            [
                lr[(2 * p + 1) * size : (2 * p + 2) * size, 2 * p * size : (2 * p + 1) * size]
                for p in range(pairs)
            ]
        )
        ci = jnp.stack(
            [
                li[(2 * p + 1) * size : (2 * p + 2) * size, 2 * p * size : (2 * p + 1) * size]
                for p in range(pairs)
            ]
        )
        # M = iD @ C @ iA
        t_r = jnp.einsum("bij,bjk->bik", cr, ia_r) - jnp.einsum("bij,bjk->bik", ci, ia_i)
        t_i = jnp.einsum("bij,bjk->bik", cr, ia_i) + jnp.einsum("bij,bjk->bik", ci, ia_r)
        m_r = jnp.einsum("bij,bjk->bik", id_r, t_r) - jnp.einsum("bij,bjk->bik", id_i, t_i)
        m_i = jnp.einsum("bij,bjk->bik", id_r, t_i) + jnp.einsum("bij,bjk->bik", id_i, t_r)
        z_r = jnp.zeros_like(m_r)
        inv_r = jnp.concatenate(
            [
                jnp.concatenate([ia_r, z_r], axis=2),
                jnp.concatenate([-m_r, id_r], axis=2),
            ],
            axis=1,
        )
        inv_i = jnp.concatenate(
            [
                jnp.concatenate([ia_i, z_r], axis=2),
                jnp.concatenate([-m_i, id_i], axis=2),
            ],
            axis=1,
        )
        size *= 2
    return inv_r[0], inv_i[0]


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb",))
def ptrsm_left_lower_inv(l, b, nb=128):
    """L X = B via batched-inverted diagonal blocks + blocked forward
    substitution: ~30 sequential steps instead of n row steps. Forward
    error ~eps * kappa(L_block) -- used on the fp32 pipeline where the
    fp64 refinement absorbs it; the fp64 path keeps pure substitution."""
    lr, li = l
    br, bi = b
    n = lr.shape[0]
    m = br.shape[1]
    if n % nb != 0:
        raise ValueError(f"ptrsm requires n % nb == 0, got n={n}, nb={nb}")
    nblocks = n // nb
    # gather and invert all diagonal blocks at once
    diags_r = jnp.stack([lr[k * nb : (k + 1) * nb, k * nb : (k + 1) * nb] for k in range(nblocks)])
    diags_i = jnp.stack([li[k * nb : (k + 1) * nb, k * nb : (k + 1) * nb] for k in range(nblocks)])
    inv_r, inv_i = _ptrinv_batched(diags_r, diags_i)

    def make_body(w):
        # segment-bucketed correction gemms: block k's correction only
        # reads solved rows < k0 <= w (see pcholesky_lower; full-width
        # masking wastes ~2x gemm area)
        def body(k, x):
            xr, xi = x
            k0 = k * nb
            lrow_r = lax.dynamic_slice(lr, (k0, 0), (nb, w))
            lrow_i = lax.dynamic_slice(li, (k0, 0), (nb, w))
            cmask = lax.broadcasted_iota(jnp.int32, (1, w), 1) < k0
            lrow_r = jnp.where(cmask, lrow_r, 0.0)
            lrow_i = jnp.where(cmask, lrow_i, 0.0)
            xr_w = lax.dynamic_slice(xr, (0, 0), (w, m))
            xi_w = lax.dynamic_slice(xi, (0, 0), (w, m))
            acc_r = lrow_r @ xr_w - lrow_i @ xi_w
            acc_i = lrow_r @ xi_w + lrow_i @ xr_w
            rhs_r = lax.dynamic_slice(br, (k0, 0), (nb, m)) - acc_r
            rhs_i = lax.dynamic_slice(bi, (k0, 0), (nb, m)) - acc_i
            ir = lax.dynamic_slice(inv_r, (k, 0, 0), (1, nb, nb))[0]
            ii = lax.dynamic_slice(inv_i, (k, 0, 0), (1, nb, nb))[0]
            sol_r = ir @ rhs_r - ii @ rhs_i
            sol_i = ir @ rhs_i + ii @ rhs_r
            xr = lax.dynamic_update_slice(xr, sol_r, (k0, 0))
            xi = lax.dynamic_update_slice(xi, sol_i, (k0, 0))
            return xr, xi

        return body

    x = (jnp.zeros_like(br), jnp.zeros_like(bi))
    for lo, hi in _chol_segments(nblocks):
        w = max(hi - 1, 1) * nb
        x = lax.fori_loop(lo, hi, make_body(w), x)
    return x


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb",))
def ptrsm_left_lower(l, b, nb=128):
    """Solve L X = B with planar lower-triangular L (n x n), B (n x m).

    Blocked forward substitution: one fori_loop over uniform diagonal
    blocks; the off-diagonal correction uses full-width masked gemms so
    the whole solve is a single traced instance.
    """
    lr, li = l
    br, bi = b
    n = lr.shape[0]
    if n % nb != 0:
        raise ValueError(f"ptrsm requires n % nb == 0, got n={n}, nb={nb}")
    nblocks = n // nb
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    def body(k, x):
        xr, xi = x
        k0 = k * nb
        # correction: rows [k0, k0+nb) of L times the already-solved rows
        lrow_r = lax.dynamic_slice(lr, (k0, 0), (nb, n))
        lrow_i = lax.dynamic_slice(li, (k0, 0), (nb, n))
        mask = (rows < k0)[None, :]
        lrow_r = jnp.where(mask, lrow_r, 0.0)
        lrow_i = jnp.where(mask, lrow_i, 0.0)
        acc_r = lrow_r @ xr - lrow_i @ xi
        acc_i = lrow_r @ xi + lrow_i @ xr
        rhs_r = lax.dynamic_slice(br, (k0, 0), (nb, br.shape[1])) - acc_r
        rhs_i = lax.dynamic_slice(bi, (k0, 0), (nb, bi.shape[1])) - acc_i
        ld_r = lax.dynamic_slice(lr, (k0, k0), (nb, nb))
        ld_i = lax.dynamic_slice(li, (k0, k0), (nb, nb))
        sol_r, sol_i = _fsub_base(ld_r, ld_i, rhs_r, rhs_i, nb)
        xr = lax.dynamic_update_slice(xr, sol_r, (k0, 0))
        xi = lax.dynamic_update_slice(xi, sol_i, (k0, 0))
        return xr, xi

    x0 = (jnp.zeros_like(br), jnp.zeros_like(bi))
    return lax.fori_loop(0, nblocks, body, x0)


def _chol_segments(nblocks, nseg=4):
    """Split [0, nblocks) into <= nseg contiguous block ranges."""
    nseg = min(nseg, nblocks)
    bounds = [round(s * nblocks / nseg) for s in range(nseg + 1)]
    return [(lo, hi) for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]


def ptrsm_left_upper(u, b, nb=128):
    """Solve U X = B with planar upper-triangular U via the flip identity
    (P U P is lower triangular for the reversal permutation P)."""
    ur, ui = u
    br, bi = b
    fl = lambda m: jnp.flip(m, axis=(0, 1))
    flv = lambda m: jnp.flip(m, axis=0)
    xr, xi = ptrsm_left_lower((fl(ur), fl(ui)), (flv(br), flv(bi)), nb=nb)
    return flv(xr), flv(xi)


def _pchol_base(ar, ai, nb):
    """Unblocked planar Cholesky of an nb x nb HPD block (lower).

    Returns (lr, li, fail) with ``fail`` the 1-based index of the first
    non-positive/NaN pivot encountered (0 if none) -- negative pivots
    are clamped to tiny so the factorization stays finite, and the
    caller maps ``fail`` to a global devInfo column index."""
    cols = lax.broadcasted_iota(jnp.int32, (nb, 1), 1 if False else 0).squeeze(-1)

    def body(j, c):
        cr, ci, fail = c
        pivot = cr[j, j]
        badj = (pivot <= 0) | jnp.isnan(pivot)
        fail = jnp.where(badj & (fail == 0), jnp.int32(j + 1), fail)
        dj = jnp.sqrt(jnp.maximum(pivot, jnp.finfo(cr.dtype).tiny))
        col_r = cr[:, j] / dj
        col_i = ci[:, j] / dj
        below = cols > j
        col_r = jnp.where(below, col_r, jnp.where(cols == j, dj, 0.0))
        col_i = jnp.where(below, col_i, 0.0)
        # trailing update: A[:, k] -= col * conj(col[k]) for k > j
        upd_r = col_r[:, None] * col_r[None, :] + col_i[:, None] * col_i[None, :]
        upd_i = col_i[:, None] * col_r[None, :] - col_r[:, None] * col_i[None, :]
        keep = (cols > j)[None, :] & below[:, None]
        cr = jnp.where(keep, cr - upd_r, cr)
        ci = jnp.where(keep, ci - upd_i, ci)
        cr = lax.dynamic_update_slice(cr, col_r[:, None], (0, j))
        ci = lax.dynamic_update_slice(ci, col_i[:, None], (0, j))
        return cr, ci, fail

    lr, li, fail = lax.fori_loop(0, nb, body, (ar, ai, jnp.int32(0)))
    tril = (
        lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        >= lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    )
    return jnp.where(tril, lr, 0.0), jnp.where(tril, li, 0.0), fail


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb", "block_kernel"))
def pcholesky_lower(b, nb=128, block_kernel=True):
    """Planar Cholesky B = L L^H (left-looking, fixed shapes).

    Returns (L, info) with info the 1-based global column index of the
    first non-positive pivot, 0 on success (cuSOLVER devInfo semantics,
    checked by the reference at zhegvdx_gpu.F90:136-142).

    block_kernel: allow the fused Mosaic diag-block kernel
    (ops/pchol_pallas.py) on fp32 TPU runs -- one dispatch replaces the
    two nb-step XLA loops per block, and the panel solve becomes one
    planar gemm against the kernel's inv(L_d) (same eps32*kappa(block)
    error class as the fp32 pipeline's other block-inverted solves).
    """
    br, bi = b
    n = br.shape[0]
    if n % nb != 0:
        raise ValueError(f"pcholesky requires n % nb == 0, got n={n}, nb={nb}")
    nblocks = n // nb
    use_kernel = (
        block_kernel
        and br.dtype == jnp.float32
        and nb % 8 == 0
        and not _NO_PCHOL_KERNEL
        and kernel_ok("pchol")  # backend==tpu + toolchain probe
    )

    def make_body(r0, w):
        """Loop body for blocks whose correction reads cols [0, w) and
        whose panel spans rows [r0, n) -- segment-bucketed so the
        left-looking gemms shrink with the triangle instead of running
        full-width masked (measured ~86 ms at n=4096; the 4-segment
        bucketing cuts the gemm area ~2x)."""
        nr = n - r0
        rows = r0 + lax.broadcasted_iota(jnp.int32, (nr, 1), 0).squeeze(-1)

        def body(k, carry):
            lr, li, fail = carry
            k0 = k * nb
            # panel = B[:, k-block] - L[:, :k0] @ L[k-block, :k0]^H
            lrow_r = lax.dynamic_slice(lr, (k0, 0), (nb, w))
            lrow_i = lax.dynamic_slice(li, (k0, 0), (nb, w))
            cmask = (lax.broadcasted_iota(jnp.int32, (1, w), 1) < k0)
            lrow_r = jnp.where(cmask, lrow_r, 0.0)
            lrow_i = jnp.where(cmask, lrow_i, 0.0)
            lm_r = jnp.where(cmask, lax.dynamic_slice(lr, (r0, 0), (nr, w)), 0.0)
            lm_i = jnp.where(cmask, lax.dynamic_slice(li, (r0, 0), (nr, w)), 0.0)
            corr_r = lm_r @ lrow_r.T + lm_i @ lrow_i.T  # (nr, nb)
            corr_i = lm_i @ lrow_r.T - lm_r @ lrow_i.T
            pan_r = lax.dynamic_slice(br, (r0, k0), (nr, nb)) - corr_r
            pan_i = lax.dynamic_slice(bi, (r0, k0), (nr, nb)) - corr_i
            diag_r = lax.dynamic_slice(pan_r, (k0 - r0, 0), (nb, nb))
            diag_i = lax.dynamic_slice(pan_i, (k0 - r0, 0), (nb, nb))
            if use_kernel:
                from eigensolver_gpu_tpu.ops.pchol_pallas import (
                    pchol_block_planar_pallas,
                )

                ld_r, ld_i, inv_r, inv_i, blk_fail = pchol_block_planar_pallas(
                    diag_r, diag_i
                )
                # X L_d^H = pan  =>  X = pan @ inv(L_d)^H (one planar gemm)
                x_r = pan_r @ inv_r.T + pan_i @ inv_i.T
                x_i = pan_i @ inv_r.T - pan_r @ inv_i.T
            else:
                ld_r, ld_i, blk_fail = _pchol_base(diag_r, diag_i, nb)
                # subdiagonal panel: X L_d^H = pan =>
                # L_d conj(X^T) = conj(pan^T)
                sub_r, sub_i = _fsub_base(
                    ld_r, ld_i, pan_r.T, -pan_i.T, nb
                )  # solves L_d Y = conj(pan)^T; then X = conj(Y)^T
                x_r = sub_r.T
                x_i = -sub_i.T
            # devInfo semantics: 1-based global column of FIRST bad pivot
            fail = jnp.where(
                (fail == 0) & (blk_fail > 0), jnp.int32(k0) + blk_fail, fail
            )
            below = (rows >= k0 + nb)[:, None]
            blk_r = jnp.where(below, x_r, 0.0)
            blk_i = jnp.where(below, x_i, 0.0)
            blk_r = lax.dynamic_update_slice(blk_r, ld_r, (k0 - r0, 0))
            blk_i = lax.dynamic_update_slice(blk_i, ld_i, (k0 - r0, 0))
            lr = lax.dynamic_update_slice(lr, blk_r, (r0, k0))
            li = lax.dynamic_update_slice(li, blk_i, (r0, k0))
            return lr, li, fail

        return body

    carry = (jnp.zeros_like(br), jnp.zeros_like(bi), jnp.int32(0))
    for lo, hi in _chol_segments(nblocks):
        w = max(hi - 1, 1) * nb  # correction cols < k0 <= (hi-1)*nb
        carry = lax.fori_loop(lo, hi, make_body(lo * nb, w), carry)
    lr, li, fail = carry
    return (lr, li), fail
