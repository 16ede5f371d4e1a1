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

Selected-range refinement (round 3): the reference back-transforms and
back-substitutes only the NZ = iu-il+1 selected columns
(dsyevd_gpu.F90:108,119-128; zhegvdx_gpu.F90:169 trsm's N x NZ).  Here
the analogous economy applies to the refinement sweeps: only a block of
``ms`` selected columns (plus a cluster-guard margin) is corrected, but
against the FULL fp32 basis -- E is (n, ms) and the correction
X @ E spans all n directions, so out-of-block error components still
converge quadratically.  The per-sweep gemm cost drops from ~5 n^3 to
~5 n^2 ms.  Out-of-block denominators use the fp32 pipeline's
eigenvalue estimates, whose O(eps32 * anorm) error forces a larger
cluster floor for out-of-block pairs; the margin keeps boundary
clusters in-block where accurate fp64 Rayleigh quotients are available.

Auto-escalation: each fp64 sweep also returns a ``defect`` -- the
largest per-column l2 norm of the PREDICTED post-sweep coupling:
|num| * (delta_i + |num|) / max(|denom|, sep) per pair, where num =
(S + lambda R)_ij is the first-order coupling in hand and delta_i the
denominator uncertainty (eps64-level for in-block fp64 Rayleigh
quotients, ~64*eps32*anorm for the fp32 pipeline's out-of-block
lambdas).  This captures both failure modes a single sweep leaves
behind -- geometric (not quadratic) convergence against out-of-block
denominators, and the quadratic |E|^2 remainder of marginally-
separated pairs -- while suppressing genuinely-clustered pairs whose
gap-level floor is unavoidable (measured: the defect matches the true
next-sweep residual within ~10x on the adversarial fixtures).  When it
exceeds the residual contract, up to ``extra_max`` additional fp64
sweeps run automatically -- replacing the manual refine_iters=4 escape
hatch for tight-cluster spectra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

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


def _renorm_planar(m, e, sel0, ms):
    """Second-order B-norm correction from the gram M = X^H B X_sel and
    the correction E, gemm-free (see ops/refine._renorm): the
    first-order rotation leaves +|theta|^2 norm defects that the final
    sweep cannot clean.  Returns 1/sqrt(diag((I+E)^H M (I+E))) for the
    ms block columns; the block's own diagonal lives at rows
    sel0..sel0+ms of the (n_all, ms) gram."""
    d = (
        jnp.diagonal(m[0][sel0 : sel0 + ms])
        + 2.0 * jnp.sum(e[0] * m[0] + e[1] * m[1], axis=0)
        + jnp.sum(e[0] * e[0] + e[1] * e[1], axis=0)
    )
    return 1.0 / jnp.sqrt(jnp.maximum(d, jnp.finfo(d.dtype).tiny))


def _correct_block(xhbx, s, sel0, ms, w_rows, eps32, dt):
    """Shared tail of one selected-block sweep: from the grams
    xhbx = X^H B Xs and s = X^H A Xs (planar pairs, (n_all, ms)),
    build the correction E, the updated eigenvalue estimates and the
    marginal-pair defect.

    Returns (e, sc, lam_sel, w_rows', defect) with ``sc`` the
    second-order B-norm column scales."""
    n_all = xhbx[0].shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (n_all, ms), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n_all, ms), 1)
    is_self = rows == cols + sel0
    inblk = (rows >= sel0) & (rows < sel0 + ms)

    eye_blk = jnp.where(is_self, jnp.ones((), dt), jnp.zeros((), dt))
    r = (eye_blk - xhbx[0], -xhbx[1])
    lam_sel = jnp.diagonal(s[0][sel0 : sel0 + ms]) / (
        1.0 - jnp.diagonal(r[0][sel0 : sel0 + ms])
    )
    w_rows = lax.dynamic_update_slice(w_rows, lam_sel, (sel0,))
    denom = lam_sel[None, :] - w_rows[:, None]
    anorm = jnp.max(jnp.abs(w_rows))
    sep_in = jnp.maximum(1e3 * jnp.finfo(dt).eps * anorm, eps32 * anorm)
    # out-of-block lambdas carry the fp32 pipeline's O(eps32*anorm)
    # error: denominators below ~64x that bound cannot be trusted as
    # separated (a wrong-sign denominator GROWS the error), so those
    # pairs get the orthogonality-only R/2 treatment
    sep = jnp.where(inblk, sep_in, jnp.maximum(sep_in, 64 * eps32 * anorm))
    ok = jnp.abs(denom) > sep
    safe = jnp.where(ok, denom, jnp.ones((), dt))
    num_r = s[0] + lam_sel[None, :] * r[0]
    num_i = s[1] + lam_sel[None, :] * r[1]
    e = (
        jnp.where(ok, num_r / safe, r[0] / 2),
        jnp.where(ok, num_i / safe, r[1] / 2),
    )
    sc = _renorm_planar(xhbx, e, sel0, ms)[None, :]
    # defect = predicted post-sweep residual (see ops/refine.
    # _correct_block): denominator-error remainder |num|*delta/|denom|
    # + quadratic |num|^2/|denom|, cluster-branch pairs suppressed via
    # max(.., sep) -- their gap-level floor must not drive escalation
    delta = jnp.where(
        inblk, 1e3 * jnp.finfo(dt).eps * anorm, 64 * eps32 * anorm
    )
    absnum = jnp.sqrt(num_r * num_r + num_i * num_i)
    pred = jnp.where(
        is_self,
        0.0,
        jnp.minimum(
            absnum,
            (delta + absnum) * absnum / jnp.maximum(jnp.abs(denom), sep),
        ),
    )
    defect = jnp.sqrt(jnp.max(jnp.sum(pred**2, axis=0)))
    return e, sc, lam_sel, w_rows, defect


def _sweep(a, b, x, sel, w_rows, eps32, chunk=None, mm=pmatmul_chunked,
           mm_dx=None):
    """One Ogita-Aishima sweep on the selected block, in the dtype of
    its arguments.  ``x`` is the full planar basis (n, n_all); only
    columns sel0..sel0+ms are updated.  Returns
    (x_updated, lam_sel, w_rows', defect); lam_sel are the Rayleigh
    quotients of the PRE-update block vectors (quadratically accurate).
    """
    sel0, ms = sel
    ar, _ = a
    xr, xi = x
    xs = (xr[:, sel0 : sel0 + ms], xi[:, sel0 : sel0 + ms])
    bx = mm(b, xs, chunk)
    ax = mm(a, xs, chunk)
    xhbx = mm(pH(x), bx, chunk)
    s = mm(pH(x), ax, chunk)
    e, sc, lam_sel, w_rows, defect = _correct_block(
        xhbx, s, sel0, ms, w_rows, eps32, ar.dtype
    )
    dx = (mm_dx or mm)(x, e, chunk)
    new_r = (xs[0] + dx[0]) * sc
    new_i = (xs[1] + dx[1]) * sc
    xr = lax.dynamic_update_slice(xr, new_r, (0, sel0))
    xi = lax.dynamic_update_slice(xi, new_i, (0, sel0))
    return (xr, xi), lam_sel, w_rows, defect


def _sweep_ozaki(a, b, x, sel, w_rows, eps32, bits=48):
    """fp64 selected-block sweep with slice-reused ozaki products.

    Same math as _sweep; X's column-scaled digit slicings are computed
    once and reused across B@Xs, A@Xs (the block's columns are a static
    SLICE of the full slicing -- per-column scales slice with them) and
    both grams (as the transposed-contraction lhs -- X^T's row scales
    ARE X's column scales).
    """
    sel0, ms = sel
    ar, ai = a
    xr, xi = x
    n = ar.shape[0]
    dbits = digit_bits_for(n)
    ns = nslice_for(dbits, bits)

    # full-basis column slicings; the rhs block is a column slice of the
    # same digits (stacking [B;A] into one (2n,n) product measured 13 ms
    # SLOWER end-to-end -- the concat materialization costs more than
    # the saved per-product overhead)
    xcol = ozaki_planar_slices((xr, xi), 1, dbits, ns)
    blk = lambda p: (p[0][:, :, sel0 : sel0 + ms], p[1][sel0 : sel0 + ms])
    xcol_s = tuple(blk(p) for p in xcol)
    bx = ozaki_pmatmul_pre(ozaki_planar_slices(b, 0, dbits, ns), xcol_s, dbits)
    ax = ozaki_pmatmul_pre(ozaki_planar_slices(a, 0, dbits, ns), xcol_s, dbits)

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

    e, sc, lam_sel, w_rows, defect = _correct_block(
        xhbx, s, sel0, ms, w_rows, eps32, ar.dtype
    )
    # the correction product only needs ~28 bits RELATIVE TO E: its
    # ozaki error is ~2^-28 * |E|, always below the sweep's own
    # quadratic O(|E|^2) term for any |E| >= 2^-28 and below 1e-13
    # absolute otherwise -- 4 digit slices (10 pair gemms) instead of 7
    # (28), saving ~54 bf16 gemms per sweep
    dx = ozaki_pmatmul((xr, xi), e, bits=28)
    new_r = (xr[:, sel0 : sel0 + ms] + dx[0]) * sc
    new_i = (xi[:, sel0 : sel0 + ms] + dx[1]) * sc
    xr = lax.dynamic_update_slice(xr, new_r, (0, sel0))
    xi = lax.dynamic_update_slice(xi, new_i, (0, sel0))
    return (xr, xi), lam_sel, w_rows, defect


@highest_precision
@functools.partial(
    jax.jit,
    static_argnames=(
        "sweeps", "coarse_first", "final_pass", "chunk", "gemm", "sel",
        "extra_max",
    ),
)
def refine_gevp_planar(
    a, b, x, sweeps=2, coarse_first=True, final_pass=False, chunk=None,
    gemm="ozaki", sel=None, w0=None, extra_max=0,
):
    """Refine planar eigenvectors ``x`` of the pair (a, b).

    a, b, x: planar pairs; x is (n, m) -- the FULL approximate basis in
    ascending eigenvalue order (quadratic convergence needs the
    correction to span all n directions).

    sel: optional static (sel0, ms) -- refine only block columns
    sel0..sel0+ms (selected range + cluster-guard margin; see module
    docstring). Returns (w (ms,), x_block (n, ms)).  None refines and
    returns everything.

    w0: full-length eigenvalue estimates from the fp32 pipeline;
    REQUIRED when sel selects a strict subset (out-of-block
    denominators).

    extra_max: auto-escalated additional fp64 sweeps (module
    docstring); runs only while the marginal-pair defect exceeds the
    residual contract.

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
    n = xr.shape[0]
    m = xr.shape[1]
    if sel is None:
        sel = (0, m)
    sel0, ms = sel
    eps32 = jnp.finfo(jnp.float32).eps
    if w0 is None:
        if ms < m:
            raise ValueError("sel with a strict subset requires w0")
        w0 = jnp.zeros((m,), ar.dtype)
    w_rows = w0.astype(ar.dtype)

    with trace_range("refine_gevp_planar"):
        if coarse_first and sweeps > 1 and ar.dtype == jnp.float64:
            f32 = lambda p: (p[0].astype(jnp.float32), p[1].astype(jnp.float32))
            a32, b32 = f32(a), f32(b)
            x32 = f32((xr, xi))
            w32 = w_rows.astype(jnp.float32)
            # cap coarse sweeps at 2: refine_iters=4 buys a SECOND fp64
            # sweep (escape hatch for spectra with gaps near
            # eps32*anorm, where the fp32 sweeps must cluster pairs and
            # one fp64 rotation caps accuracy at theta^2*gap)
            n_coarse = min(sweeps - 1, 2)
            for _ in range(n_coarse):
                x32, _, w32, _ = _sweep(a32, b32, x32, sel, w32, eps32)
            xr = x32[0].astype(ar.dtype)
            xi = x32[1].astype(ar.dtype)
            w_rows = w32.astype(ar.dtype)
            n_f64_sweeps = max(sweeps - n_coarse, 1)
        else:
            n_f64_sweeps = sweeps
        use_ozaki = gemm == "ozaki" and ar.dtype == jnp.float64

        def one_sweep(xpair, w_rows):
            if use_ozaki and chunk is None:
                return _sweep_ozaki(a, b, xpair, sel, w_rows, eps32)
            mm = ozaki_pmatmul_chunked if use_ozaki else pmatmul_chunked
            mm_dx = (
                functools.partial(ozaki_pmatmul_chunked, bits=28)
                if use_ozaki
                else None
            )
            return _sweep(a, b, xpair, sel, w_rows, eps32, chunk, mm, mm_dx)

        w = None
        defect = None
        for _ in range(n_f64_sweeps):
            (xr, xi), w, w_rows, defect = one_sweep((xr, xi), w_rows)

        if extra_max > 0 and ar.dtype == jnp.float64:
            # auto-escalation: more fp64 sweeps while the predicted
            # post-sweep residual exceeds the contract (tolerance sits
            # above the defect's gram-noise floor ~3e-13 and below a
            # one-sweep-short defect ~1e-9, see ops/refine._run_sweeps)
            anorm = jnp.max(jnp.abs(w_rows))
            tol = 100.0 * jnp.finfo(jnp.float64).eps * (n**0.5) * anorm

            def cond(carry):
                it, _, _, _, defect = carry
                return (it < extra_max) & (defect > tol)

            def body(carry):
                it, xr, xi, w_rows, _ = carry
                (xr, xi), _, w_rows, defect = one_sweep((xr, xi), w_rows)
                return it + 1, xr, xi, w_rows, defect

            _, xr, xi, w_rows, defect = lax.while_loop(
                cond, body, (jnp.int32(0), xr, xi, w_rows, defect)
            )
            w = lax.dynamic_slice(w_rows, (sel0,), (ms,))

        xr_s = xr[:, sel0 : sel0 + ms]
        xi_s = xi[:, sel0 : sel0 + ms]
        if not final_pass:
            return w, (xr_s, xi_s)
        # optional post-update Rayleigh quotients and B-normalization
        xs = (xr_s, xi_s)
        bx = pmatmul(b, xs)
        ax = pmatmul(a, xs)
        bnorm = jnp.sum(xr_s * bx[0] + xi_s * bx[1], axis=0)
        anum = jnp.sum(xr_s * ax[0] + xi_s * ax[1], axis=0)
        safe_b = jnp.where(bnorm == 0, 1.0, bnorm)
        w = anum / safe_b
        scale = 1.0 / jnp.sqrt(jnp.maximum(bnorm, jnp.finfo(ar.dtype).tiny))
        return w, (xr_s * scale[None, :], xi_s * scale[None, :])
