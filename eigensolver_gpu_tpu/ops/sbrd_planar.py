"""Planar complex successive band reduction, stage 1: dense Hermitian ->
Hermitian band (the complex twin of ops/sbrd.py, without complex dtypes).

Re-designs the role of the reference's one-stage complex Householder loop
(zhetrd_gpu.F90:60-165): the one-stage scheme pays an O(n^2)-traffic hemv
serialized once per column (measured at its HBM roofline, 549 ms at
n=4096 fp32 -- RESULTS.md); reducing first to a band of half-width ``b``
moves all O(n^3) work into per-panel two-sided compact-WY planar gemms on
the MXU (Karatsuba, 3 real products each), leaving only O(n b) traffic
per sequential column step for stage 2 (the bulge chase).

Derivation of the Hermitian W-form used below (A Hermitian,
N = I - V T V^H from zlarft-forward):

    N A N^H = A - V W^H - W V^H,   Y = A (V T^H),  S = T (V^H Y),
    W = Y - 1/2 V S
    (S = T V^H A V T^H is Hermitian, which folds the three correction
    terms into the symmetric two-sided pair exactly as in the real case.)

Returns the banded planar pair plus per-panel planar (V, T) factors;
``apply_q1_planar`` replays them onto planar eigenvector columns.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.ops.sytrd_planar import _larfg_planar

# escape hatch if a toolchain regresses the fused QL-panel kernel
_NO_QL_KERNEL = bool(os.environ.get("EIGSOLVE_NO_QL_KERNEL"))
from eigensolver_gpu_tpu.utils.kernel_guard import kernel_ok
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _pmm(xr, xi, yr, yi):
    """Planar complex matmul (Karatsuba: 3 real gemms)."""
    m1 = xr @ yr
    m2 = xi @ yi
    m3 = (xr + xi) @ (yr + yi)
    return m1 - m2, m3 - m1 - m2


def _pmm_h(xr, xi, yr, yi):
    """X^H Y planar (Karatsuba)."""
    return _pmm(xr.T, -xi.T, yr, yi)


def _ql_panel_planar(pr, pi, rows_below):
    """QL factorization of the planar (m x b) panel: b complex
    reflectors, column j (processed last to first) zeroing rows
    [0, rows_below + j) with its pivot at row rows_below + j (pivot
    becomes REAL beta, zlarfg convention).  Returns
    (pr, pi, vr, vi, tau_r, tau_i)."""
    m, b = pr.shape
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)

    def col_step(k, carry):
        pr, pi, vr_p, vi_p, tr, ti = carry
        j = b - 1 - k
        top = rows_below + j
        col_r = lax.dynamic_slice(pr, (0, j), (m, 1))[:, 0]
        col_i = lax.dynamic_slice(pi, (0, j), (m, 1))[:, 0]
        mask_above = rows < top
        xr = jnp.where(mask_above, col_r, 0.0)
        xi = jnp.where(mask_above, col_i, 0.0)
        xnormsq = jnp.sum(xr * xr + xi * xi)
        beta, tk_r, tk_i, sc_r, sc_i = _larfg_planar(
            col_r[top], col_i[top], xnormsq
        )
        # v = scale * x above the pivot, 1 at the pivot (0 when trivial)
        v_r = xr * sc_r - xi * sc_i
        v_i = xr * sc_i + xi * sc_r
        trivial = (tk_r == 0.0) & (tk_i == 0.0)
        v_r = jnp.where((rows == top) & ~trivial, 1.0, v_r)
        v_i = jnp.where((rows == top) & ~trivial, 0.0, v_i)
        # update remaining (left) columns with H^H (zlarfg annihilates
        # via H^H): P <- P - v (conj(tau) (v^H P))
        vp_r = v_r @ pr + v_i @ pi  # (b,)  = Re(v^H P)
        vp_i = v_r @ pi - v_i @ pr  #       = Im(v^H P)
        tvp_r = tk_r * vp_r + tk_i * vp_i
        tvp_i = tk_r * vp_i - tk_i * vp_r
        upd_r = v_r[:, None] * tvp_r[None, :] - v_i[:, None] * tvp_i[None, :]
        upd_i = v_r[:, None] * tvp_i[None, :] + v_i[:, None] * tvp_r[None, :]
        colmask = (lax.broadcasted_iota(jnp.int32, (1, b), 1)[0] < j)[None, :]
        pr = pr - jnp.where(colmask, upd_r, 0.0)
        pi = pi - jnp.where(colmask, upd_i, 0.0)
        newc_r = jnp.where(mask_above, 0.0, col_r)
        newc_i = jnp.where(mask_above, 0.0, col_i)
        newc_r = jnp.where((rows == top) & ~trivial, beta, newc_r)
        newc_i = jnp.where((rows == top) & ~trivial, 0.0, newc_i)
        pr = lax.dynamic_update_slice(pr, newc_r[:, None], (0, j))
        pi = lax.dynamic_update_slice(pi, newc_i[:, None], (0, j))
        vr_p = lax.dynamic_update_slice(vr_p, v_r[:, None], (0, j))
        vi_p = lax.dynamic_update_slice(vi_p, v_i[:, None], (0, j))
        tr = lax.dynamic_update_slice(tr, tk_r[None], (j,))
        ti = lax.dynamic_update_slice(ti, tk_i[None], (j,))
        return pr, pi, vr_p, vi_p, tr, ti

    z = jnp.zeros((m, b), pr.dtype)
    zt = jnp.zeros((b,), pr.dtype)
    return lax.fori_loop(0, b, col_step, (pr, pi, z, z, zt, zt))


def _larft_forward_planar(vr, vi, tr, ti):
    """Planar T with H(0) H(1) ... H(b-1) = I - V T V^H."""
    b = vr.shape[1]
    dt = vr.dtype
    mr, mi = _pmm_h(vr, vi, vr, vi)  # V^H V
    rows = lax.broadcasted_iota(jnp.int32, (b, 1), 0).squeeze(-1)

    def body(j, t):
        t_r, t_i = t
        mc_r = jnp.where(rows < j, mr[:, j], 0.0)
        mc_i = jnp.where(rows < j, mi[:, j], 0.0)
        # col = -tau_j * (T @ mcol)
        ar = t_r @ mc_r - t_i @ mc_i
        ai = t_r @ mc_i + t_i @ mc_r
        cr = -(tr[j] * ar - ti[j] * ai)
        ci = -(tr[j] * ai + ti[j] * ar)
        cr = jnp.where(rows == j, tr[j], cr)
        ci = jnp.where(rows == j, ti[j], ci)
        t_r = lax.dynamic_update_slice(t_r, cr[:, None], (0, j))
        t_i = lax.dynamic_update_slice(t_i, ci[:, None], (0, j))
        return t_r, t_i

    z = jnp.zeros((b, b), dt)
    return lax.fori_loop(0, b, body, (z, z))


@highest_precision
@functools.partial(jax.jit, static_argnames=("band", "bucket", "panel_kernel"))
def psbrd(a_r, a_i, band=32, bucket=512, panel_kernel=True):
    """Reduce the Hermitian planar pair to a Hermitian band of half-width
    ``band``.  Returns ((abr, abi), (vr, vi), (tr, ti)): the banded
    planar pair (full storage, entries outside the band zero) and the
    per-panel planar WY factors with a = Q1 ab Q1^H,
    Q1 = apply_q1_planar(..., I).  Requires n % band == 0, n >= 3*band.

    panel_kernel: allow the fused Mosaic QL-panel kernel
    (ops/ql_panel_pallas.ql_panel_planar_pallas) on fp32 TPU runs --
    one dispatch per panel (column loop + conjugated-tau larft) instead
    of ~20 XLA ops per column."""
    n = a_r.shape[0]
    b = band
    if n % b != 0 or n < 3 * b:
        raise ValueError(f"psbrd requires n % band == 0 and n >= 3*band, got {n}, {b}")
    dt = a_r.dtype
    ar = (a_r + a_r.T) / 2
    ai = (a_i - a_i.T) / 2
    npanels_total = n // b - 1
    vs_r = jnp.zeros((npanels_total, n, b), dt)
    vs_i = jnp.zeros((npanels_total, n, b), dt)
    ts_r = jnp.zeros((npanels_total, b, b), dt)
    ts_i = jnp.zeros((npanels_total, b, b), dt)

    with trace_range("psbrd"):
        bounds = []
        hi = n
        while hi > b:
            lo = max(hi - bucket, b)
            bounds.append((hi, lo))
            hi = lo
        pidx_start = 0
        for hi, lo in bounds:
            mbound = hi
            npan = (hi - lo) // b
            ar_mb = ar[:mbound, :mbound]
            ai_mb = ai[:mbound, :mbound]
            rows = lax.broadcasted_iota(jnp.int32, (mbound, 1), 0).squeeze(-1)
            use_kernel = (
                panel_kernel
                and dt == jnp.float32
                and mbound % 128 == 0
                and b % 8 == 0
                and not _NO_QL_KERNEL
                and kernel_ok("ql_planar")  # backend + toolchain probe
            )

            def panel_step(p, carry, mbound=mbound, hi=hi, rows=rows,
                           pidx_start=pidx_start, use_kernel=use_kernel):
                ar_mb, ai_mb, vs_r, vs_i, ts_r, ts_i = carry
                pend = hi - p * b
                mrows = pend - b
                pan_r = lax.dynamic_slice(ar_mb, (0, pend - b), (mbound, b))
                pan_i = lax.dynamic_slice(ai_mb, (0, pend - b), (mbound, b))
                if use_kernel:
                    from eigensolver_gpu_tpu.ops.ql_panel_pallas import (
                        ql_panel_planar_pallas,
                    )

                    (pf_r, pf_i, v_r, v_i, tk_r, tk_i, t_r, t_i) = (
                        ql_panel_planar_pallas(pan_r, pan_i, mrows - b)
                    )
                    keep = (rows < mrows)[:, None]
                    v_r = jnp.where(keep, v_r, 0.0)
                    v_i = jnp.where(keep, v_i, 0.0)
                else:
                    pf_r, pf_i, v_r, v_i, tk_r, tk_i = _ql_panel_planar(
                        pan_r, pan_i, mrows - b
                    )
                    keep = (rows < mrows)[:, None]
                    v_r = jnp.where(keep, v_r, 0.0)
                    v_i = jnp.where(keep, v_i, 0.0)
                    # the panel applied H^H per column (zlarfg
                    # annihilation side), so the accumulated WY block is
                    # N = H_0^H .. H_{b-1}^H = I - V T' V^H with T' the
                    # forward larft of the CONJUGATED taus
                    t_r, t_i = _larft_forward_planar(v_r, v_i, tk_r, -tk_i)
                # two-sided A <- N A N^H via the Hermitian W-form
                # (module docstring): Y = A (V T^H), S = T (V^H Y),
                # W = Y - 1/2 V S, A <- A - V W^H - W V^H
                vt_r, vt_i = _pmm(v_r, v_i, t_r.T, -t_i.T)  # V T^H
                y_r, y_i = _pmm(ar_mb, ai_mb, vt_r, vt_i)
                vy_r, vy_i = _pmm_h(v_r, v_i, y_r, y_i)
                s_r, s_i = _pmm(t_r, t_i, vy_r, vy_i)
                vs2_r, vs2_i = _pmm(v_r, v_i, s_r, s_i)
                w_r = y_r - 0.5 * vs2_r
                w_i = y_i - 0.5 * vs2_i
                w_r = jnp.where(keep, w_r, 0.0)
                w_i = jnp.where(keep, w_i, 0.0)
                # A -= V W^H + W V^H  (P = V W^H; update = P + P^H)
                p_r, p_i = _pmm(v_r, v_i, w_r.T, -w_i.T)
                upd_r = p_r + p_r.T
                upd_i = p_i - p_i.T
                ar_mb = ar_mb - upd_r
                ai_mb = ai_mb - upd_i
                # write the factored panel and its conjugate transpose
                ar_mb = lax.dynamic_update_slice(ar_mb, pf_r, (0, pend - b))
                ai_mb = lax.dynamic_update_slice(ai_mb, pf_i, (0, pend - b))
                ar_mb = lax.dynamic_update_slice(
                    ar_mb, jnp.swapaxes(pf_r, 0, 1), (pend - b, 0)
                )
                ai_mb = lax.dynamic_update_slice(
                    ai_mb, -jnp.swapaxes(pf_i, 0, 1), (pend - b, 0)
                )
                vpad_r = jnp.zeros((n, b), dt)
                vpad_r = lax.dynamic_update_slice(vpad_r, v_r, (0, 0))
                vpad_i = jnp.zeros((n, b), dt)
                vpad_i = lax.dynamic_update_slice(vpad_i, v_i, (0, 0))
                vs_r = lax.dynamic_update_slice(
                    vs_r, vpad_r[None], (pidx_start + p, 0, 0)
                )
                vs_i = lax.dynamic_update_slice(
                    vs_i, vpad_i[None], (pidx_start + p, 0, 0)
                )
                ts_r = lax.dynamic_update_slice(
                    ts_r, t_r[None], (pidx_start + p, 0, 0)
                )
                ts_i = lax.dynamic_update_slice(
                    ts_i, t_i[None], (pidx_start + p, 0, 0)
                )
                return ar_mb, ai_mb, vs_r, vs_i, ts_r, ts_i

            ar_mb, ai_mb, vs_r, vs_i, ts_r, ts_i = lax.fori_loop(
                0, npan, panel_step, (ar_mb, ai_mb, vs_r, vs_i, ts_r, ts_i)
            )
            ar = lax.dynamic_update_slice(ar, ar_mb, (0, 0))
            ai = lax.dynamic_update_slice(ai, ai_mb, (0, 0))
            pidx_start += npan
        return (ar, ai), (vs_r, vs_i), (ts_r, ts_i)


@highest_precision
@functools.partial(jax.jit, static_argnames=("group",))
def apply_q1_planar(vs, ts, y, group=4):
    """y <- Q1 y (planar) where a = Q1 ab Q1^H from psbrd: panels applied
    in reverse processing order, y -= V S (V^H y) each (S = T^H).

    group: consecutive panels pre-aggregated into one (n, group*b) planar
    compact-WY block via (I - V1 S1 V1^H)(I - V2 S2 V2^H) =
    I - [V1 V2] Sc [V1 V2]^H, Sc = [[S1, -S1 (V1^H V2) S2], [0, S2]] --
    the complex twin of ops/sbrd.apply_q1's aggregation."""
    vs_r, vs_i = vs
    ts_r, ts_i = ts
    y_r, y_i = y
    npanels, n, b = vs_r.shape

    def _bmm(xr, xi, yr, yi):
        m1 = jnp.einsum("gij,gjk->gik", xr, yr)
        m2 = jnp.einsum("gij,gjk->gik", xi, yi)
        m3 = jnp.einsum("gij,gjk->gik", xr + xi, yr + yi)
        return m1 - m2, m3 - m1 - m2

    with trace_range("apply_q1_planar"):
        g = max(1, min(group, npanels))
        ng = npanels // g
        rem = npanels - ng * g

        if g > 1 and ng > 0:
            v4_r = vs_r[rem:].reshape(ng, g, n, b)
            v4_i = vs_i[rem:].reshape(ng, g, n, b)
            # S = T^H
            s4_r = jnp.swapaxes(ts_r[rem:], 1, 2).reshape(ng, g, b, b)
            s4_i = -jnp.swapaxes(ts_i[rem:], 1, 2).reshape(ng, g, b, b)
            v_acc_r, v_acc_i = v4_r[:, 0], v4_i[:, 0]
            s_acc_r, s_acc_i = s4_r[:, 0], s4_i[:, 0]
            for j in range(1, g):
                vj_r, vj_i = v4_r[:, j], v4_i[:, j]
                sj_r, sj_i = s4_r[:, j], s4_i[:, j]
                # M = V_acc^H V_j
                m_r, m_i = _bmm(
                    jnp.swapaxes(v_acc_r, 1, 2), -jnp.swapaxes(v_acc_i, 1, 2),
                    vj_r, vj_i,
                )
                t1_r, t1_i = _bmm(s_acc_r, s_acc_i, m_r, m_i)
                cr_r, cr_i = _bmm(t1_r, t1_i, sj_r, sj_i)
                cr_r, cr_i = -cr_r, -cr_i
                kb = s_acc_r.shape[1]
                zt = jnp.zeros((ng, b, kb), s_acc_r.dtype)
                s_acc_r = jnp.concatenate(
                    [jnp.concatenate([s_acc_r, cr_r], axis=2),
                     jnp.concatenate([zt, sj_r], axis=2)], axis=1
                )
                s_acc_i = jnp.concatenate(
                    [jnp.concatenate([s_acc_i, cr_i], axis=2),
                     jnp.concatenate([zt, sj_i], axis=2)], axis=1
                )
                v_acc_r = jnp.concatenate([v_acc_r, vj_r], axis=2)
                v_acc_i = jnp.concatenate([v_acc_i, vj_i], axis=2)

            def gbody(i, y):
                y_r, y_i = y
                q = ng - 1 - i
                vq_r, vq_i = v_acc_r[q], v_acc_i[q]
                sq_r, sq_i = s_acc_r[q], s_acc_i[q]
                u_r, u_i = _pmm(vq_r.T, -vq_i.T, y_r, y_i)  # V^H y
                x_r, x_i = _pmm(sq_r, sq_i, u_r, u_i)
                d_r, d_i = _pmm(vq_r, vq_i, x_r, x_i)
                return y_r - d_r, y_i - d_i

            y_r, y_i = lax.fori_loop(0, ng, gbody, (y_r, y_i))

        def body(i, y):
            y_r, y_i = y
            p = rem - 1 - i
            v_r, v_i = vs_r[p], vs_i[p]
            t_r, t_i = ts_r[p], ts_i[p]
            u_r, u_i = _pmm(v_r.T, -v_i.T, y_r, y_i)
            x_r, x_i = _pmm(t_r.T, -t_i.T, u_r, u_i)  # S = T^H
            d_r, d_i = _pmm(v_r, v_i, x_r, x_i)
            return y_r - d_r, y_i - d_i

        return lax.fori_loop(0, rem, body, (y_r, y_i))
