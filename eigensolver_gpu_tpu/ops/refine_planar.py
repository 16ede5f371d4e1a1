"""Planar mixed-precision refinement for the GENERALIZED eigenproblem.

Extends ops/refine.py (standard problem) to ``A x = lambda B x`` in
planar complex arithmetic: with R = I - X^H B X and S = X^H A X, the
first-order corrections are the same Ogita-Aishima formulas

    E_ii = R_ii / 2
    E_ij = (S_ij + lambda_j R_ij) / (lambda_j - lambda_i)   (separated)
    E_ij = R_ij / 2                                          (clustered)
    X <- X + X E

(derivation: impose X'^H B X' = I and X'^H A X' diagonal to first
order; the B-gram replaces the identity gram). This lets the ENTIRE
fp32 planar pipeline -- Cholesky, triangular solves, hetrd, stedc,
back-transform -- be refined in one step against the fp64 A and B,
with only a handful of fp64 planar gemms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.ozaki import (
    digit_bits_for,
    nslice_for,
    ozaki_planar_slices,
    ozaki_pmatmul,
    ozaki_pmatmul_chunked,
    ozaki_pmatmul_pre,
    ozaki_slice,
)
from eigensolver_gpu_tpu.ops.planar import pmatmul, pmatmul_chunked, pH
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _renorm_planar(m, e):
    """Second-order B-norm correction from the gram M = X^H B X and the
    correction E, gemm-free (see ops/refine._renorm): the first-order
    rotation leaves +|theta|^2 norm defects that the final sweep cannot
    clean.  Returns the per-column scale 1/sqrt(diag((I+E)^H M (I+E)))."""
    d = (
        jnp.diagonal(m[0])
        + 2.0 * jnp.sum(e[0] * m[0] + e[1] * m[1], axis=0)
        + jnp.sum(e[0] * e[0] + e[1] * e[1], axis=0)
    )
    return 1.0 / jnp.sqrt(jnp.maximum(d, jnp.finfo(d.dtype).tiny))


def _sweep(a, b, x, eye, eps32, chunk=None, mm=pmatmul_chunked, mm_dx=None):
    """One Ogita-Aishima sweep in the dtype of its arguments.

    Returns (x_updated, lam): the Rayleigh quotients of the PRE-update
    vectors, whose error is quadratic in the pre-update vector error.
    """
    ar, _ = a
    xr, xi = x
    bx = mm(b, x, chunk)
    ax = mm(a, x, chunk)
    xhbx = mm(pH(x), bx, chunk)
    s = mm(pH(x), ax, chunk)
    r = (eye - xhbx[0], -xhbx[1])
    lam = jnp.diagonal(s[0]) / (1.0 - jnp.diagonal(r[0]))
    denom = lam[None, :] - lam[:, None]
    anorm = jnp.max(jnp.abs(lam))
    sep = jnp.maximum(1e3 * jnp.finfo(ar.dtype).eps * anorm, eps32 * anorm)
    ok = jnp.abs(denom) > sep
    safe = jnp.where(ok, denom, 1.0)
    e_r = jnp.where(ok, (s[0] + lam[None, :] * r[0]) / safe, r[0] / 2)
    e_i = jnp.where(ok, (s[1] + lam[None, :] * r[1]) / safe, r[1] / 2)
    dx = (mm_dx or mm)(x, (e_r, e_i), chunk)
    sc = _renorm_planar(xhbx, (e_r, e_i))[None, :]
    return ((xr + dx[0]) * sc, (xi + dx[1]) * sc), lam


def _sweep_ozaki(a, b, x, eye, eps32, bits=48):
    """fp64 sweep with slice-reused ozaki products.

    Same math as _sweep; X's column-scaled digit slicings are computed
    once and reused across B@X, A@X (as the rhs) and both grams (as the
    transposed-contraction lhs -- X^T's row scales ARE X's column
    scales), cutting operand slicings from 30 to 24.
    """
    ar, ai = a
    br, bi = b
    xr, xi = x
    n = ar.shape[0]
    m = xr.shape[1]
    dbits = digit_bits_for(n)
    ns = nslice_for(dbits, bits)

    # B @ X and A @ X share X's column slicings (stacking [B;A] into one
    # (2n,n) product measured 13 ms SLOWER end-to-end -- the concat
    # materialization costs more than the saved per-product overhead)
    xcol = ozaki_planar_slices((xr, xi), 1, dbits, ns)
    bx = ozaki_pmatmul_pre(ozaki_planar_slices(b, 0, dbits, ns), xcol, dbits)
    ax = ozaki_pmatmul_pre(ozaki_planar_slices(a, 0, dbits, ns), xcol, dbits)

    # X^H @ BX / X^H @ AX: reuse X's column slicings as the transposed lhs
    xconj = (xcol[0], xcol[1], ozaki_slice(xr - xi, 1, dbits, ns))
    xhbx = ozaki_pmatmul_pre(
        xconj, ozaki_planar_slices(bx, 1, dbits, ns), dbits,
        transpose_lhs=True, conj_lhs=True,
    )
    s = ozaki_pmatmul_pre(
        xconj, ozaki_planar_slices(ax, 1, dbits, ns), dbits,
        transpose_lhs=True, conj_lhs=True,
    )

    r = (eye - xhbx[0], -xhbx[1])
    lam = jnp.diagonal(s[0]) / (1.0 - jnp.diagonal(r[0]))
    denom = lam[None, :] - lam[:, None]
    anorm = jnp.max(jnp.abs(lam))
    sep = jnp.maximum(1e3 * jnp.finfo(ar.dtype).eps * anorm, eps32 * anorm)
    ok = jnp.abs(denom) > sep
    safe = jnp.where(ok, denom, 1.0)
    e_r = jnp.where(ok, (s[0] + lam[None, :] * r[0]) / safe, r[0] / 2)
    e_i = jnp.where(ok, (s[1] + lam[None, :] * r[1]) / safe, r[1] / 2)
    # the correction product only needs ~28 bits RELATIVE TO E: its
    # ozaki error is ~2^-28 * |E|, always below the sweep's own
    # quadratic O(|E|^2) term for any |E| >= 2^-28 and below 1e-13
    # absolute otherwise -- 4 digit slices (10 pair gemms) instead of 7
    # (28), saving ~54 bf16 gemms per sweep
    dx = ozaki_pmatmul((xr, xi), (e_r, e_i), bits=28)
    sc = _renorm_planar(xhbx, (e_r, e_i))[None, :]
    return ((xr + dx[0]) * sc, (xi + dx[1]) * sc), lam


@highest_precision
@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "coarse_first", "final_pass", "chunk", "gemm"),
)
def refine_gevp_planar(
    a, b, x, sweeps=2, coarse_first=True, final_pass=False, chunk=None,
    gemm="ozaki",
):
    """Refine planar eigenvectors ``x`` of the pair (a, b); returns (w, x).

    a, b, x: planar pairs; x is (n, m). Needs m == n (full spectrum) for
    quadratic convergence to fp64 residuals; a column subset is refined
    only within its span.

    coarse_first: run all but the last sweep in fp32. The early
    corrections only need a couple of digits (the error they remove is
    ~1e-5 relative), and the platform's emulated fp64 gemms are ~70% of
    the whole solver's wall time -- fp32 early sweeps cut that roughly
    in half with no measurable accuracy loss (validated in
    tests/test_planar_pipeline.py).

    final_pass: re-evaluate Rayleigh quotients and B-norms after the
    last update (2 more fp64 matrix products). Off by default: the last
    sweep's lam is already quadratically accurate, and the post-update
    B-norms are 1 + O(err^2) by construction (the E_ii = R_ii/2 term).

    gemm: 'ozaki' (default) runs the fp64 sweeps' matrix products as
    exact bf16 digit gemms on the MXU (ops/ozaki.py; measured 2.3x the
    emulated-fp64 planar product at n=4096, same ~1e-13 accuracy);
    'emulated' uses the platform fp64 dot.
    """
    ar, ai = a
    xr, xi = x
    m = xr.shape[1]
    eps32 = jnp.finfo(jnp.float32).eps

    with trace_range("refine_gevp_planar"):
        if coarse_first and sweeps > 1 and ar.dtype == jnp.float64:
            f32 = lambda p: (p[0].astype(jnp.float32), p[1].astype(jnp.float32))
            a32, b32 = f32(a), f32(b)
            eye32 = jnp.eye(m, dtype=jnp.float32)
            x32 = f32((xr, xi))
            # cap coarse sweeps at 2: refine_iters=4 buys a SECOND fp64
            # sweep (escape hatch for spectra with gaps near
            # eps32*anorm, where the fp32 sweeps must cluster pairs and
            # one fp64 rotation caps accuracy at theta^2*gap)
            n_coarse = min(sweeps - 1, 2)
            for _ in range(n_coarse):
                x32, _ = _sweep(a32, b32, x32, eye32, eps32)
            xr = x32[0].astype(ar.dtype)
            xi = x32[1].astype(ar.dtype)
            n_f64_sweeps = max(sweeps - n_coarse, 1)
        else:
            n_f64_sweeps = sweeps
        eye = jnp.eye(m, dtype=ar.dtype)
        use_ozaki = gemm == "ozaki" and ar.dtype == jnp.float64
        w = None
        for _ in range(n_f64_sweeps):
            if use_ozaki and chunk is None:
                (xr, xi), w = _sweep_ozaki(a, b, (xr, xi), eye, eps32)
            else:
                mm = ozaki_pmatmul_chunked if use_ozaki else pmatmul_chunked
                mm_dx = (
                    functools.partial(ozaki_pmatmul_chunked, bits=28)
                    if use_ozaki
                    else None
                )
                (xr, xi), w = _sweep(
                    a, b, (xr, xi), eye, eps32, chunk, mm, mm_dx
                )
        if not final_pass:
            return w, (xr, xi)
        # optional post-update Rayleigh quotients and B-normalization
        x = (xr, xi)
        bx = pmatmul(b, x)
        ax = pmatmul(a, x)
        bnorm = jnp.sum(xr * bx[0] + xi * bx[1], axis=0)
        anum = jnp.sum(xr * ax[0] + xi * ax[1], axis=0)
        safe_b = jnp.where(bnorm == 0, 1.0, bnorm)
        w = anum / safe_b
        scale = 1.0 / jnp.sqrt(jnp.maximum(bnorm, jnp.finfo(ar.dtype).tiny))
        return w, (xr * scale[None, :], xi * scale[None, :])
