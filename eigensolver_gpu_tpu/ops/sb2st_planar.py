"""Planar complex stage 2: Hermitian band -> real tridiagonal via
wavefront-batched bulge chasing, plus the planar blocked WY replay.

Complex twin of ops/sb2st.py for the complex-free TPU stack (the
reference's one-stage zhetrd_gpu.F90:60-165 is the role being re-designed;
it has no two-stage path).  Differences from the real chase:

* reflectors are complex (planar zlarfg: real beta, complex tau/v);
  the two-sided update is A <- H A H^H with H = I - tau v v^H, i.e.
  rows <- rows - tau v (v^H rows), cols <- cols - conj(tau) (cols v) v^H.
* the chased tridiagonal has a COMPLEX subdiagonal; ``phase_normalize``
  computes the diagonal unitary D (cumulative product of subdiagonal
  phases, log-depth associative scan -- no transcendentals, CLAUDE.md
  platform fact 3) with D^H T D real.  Eigenvectors of the band matrix
  are Q2 (D z) for z of the real tridiagonal.
* ``apply_q2_planar``: the wave-scheduled compact-WY replay with planar
  window products; T^{-1} = striu(V^H V) + diag(1/tau) exactly as in the
  real case (complex Householder WY identity).

Band storage: one (n, 2b) plane per component, B[j, d] = A[j+d, j]
(see ops/sb2st.dense_to_band) -- the LOWER triangle, so the imaginary
plane holds -Im(upper).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.ops.sb2st import (
    _shift_rows,
    _skew_to_window,
    _window_to_skew,
    repack_sweep_major,
)
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _larfg_vec_planar(xr, xi):
    """Batched planar zlarfg: zero x[:, 1:], pivot x[:, 0] -> REAL beta.

    Returns (vr, vi, tau_r, tau_i, beta) with v[:, 0] = 1 (0 for trivial
    columns: zero tail AND real pivot).  LAPACK zlarfg conventions."""
    ar = xr[:, 0]
    ai = xi[:, 0]
    xnormsq = jnp.sum(xr[:, 1:] * xr[:, 1:] + xi[:, 1:] * xi[:, 1:], axis=1)
    norm = jnp.sqrt(ar * ar + ai * ai + xnormsq)
    beta = jnp.where(ar >= 0, -norm, norm)
    trivial = (xnormsq == 0) & (ai == 0)
    safe_beta = jnp.where(trivial, 1.0, beta)
    tau_r = (beta - ar) / safe_beta
    tau_i = -ai / safe_beta
    dr = ar - beta
    den = dr * dr + ai * ai
    safe_den = jnp.where(trivial, 1.0, den)
    sc_r = dr / safe_den
    sc_i = -ai / safe_den
    vr = xr * sc_r[:, None] - xi * sc_i[:, None]
    vi = xr * sc_i[:, None] + xi * sc_r[:, None]
    vr = vr.at[:, 0].set(jnp.where(trivial, 0.0, 1.0))
    vi = vi.at[:, 0].set(0.0)
    z = jnp.zeros_like(beta)
    pick = lambda v: jnp.where(trivial, z, v)
    beta = jnp.where(trivial, ar, beta)
    return vr, vi, pick(tau_r), pick(tau_i), beta


@highest_precision
@functools.partial(jax.jit, static_argnames=("b",))
def bulge_chase_planar(band_r, band_i, b):
    """Chase a Hermitian planar band (lower storage, 2b diagonals) to a
    complex tridiagonal.  Returns (d, (e_r, e_i), (vt_r, vt_i),
    (taut_r, taut_i)): real diagonal, complex subdiagonal, and the chase
    reflectors in timestep storage for apply_q2_planar."""
    n = band_r.shape[0]
    dtype = band_r.dtype
    w = 2 * b
    if band_r.shape[1] != w:
        raise ValueError(f"band must have 2b={w} diagonals, got {band_r.shape[1]}")
    kmax = max((n - 3) // b, 0)
    s_slots = kmax // 3 + 1
    t_total = 3 * (n - 3) + 1 if n > 3 else 1
    stride = 3 * b - 1

    pad_f = 2 * b
    pad_b = 2 * b + s_slots * stride + w
    zshape = (n + pad_f + pad_b, w)
    bp_r = lax.dynamic_update_slice(jnp.zeros(zshape, dtype), band_r, (pad_f, 0))
    bp_i = lax.dynamic_update_slice(jnp.zeros(zshape, dtype), band_i, (pad_f, 0))

    t3 = 3 * ((t_total + 2) // 3)
    vt_r = jnp.zeros((t3, s_slots, b), dtype)
    vt_i = jnp.zeros((t3, s_slots, b), dtype)
    tt_r = jnp.zeros((t3, s_slots), dtype)
    tt_i = jnp.zeros((t3, s_slots), dtype)

    svec = jnp.arange(s_slots)
    eye3b = jnp.eye(3 * b, dtype=dtype)

    def step(t, carry):
        bp_r, bp_i, vt_r, vt_i, tt_r, tt_i = carry
        vmax = t // 3
        k0 = t % 3
        v_s = vmax - svec
        k_s = k0 + 3 * svec
        r0_s = v_s + 1 + k_s * b
        active = (v_s >= 0) & (v_s <= n - 3) & (r0_s <= n - 2)

        start = vmax + 1 + k0 * b - b
        blk_r = lax.dynamic_slice(
            bp_r, (start + pad_f, 0), (s_slots * stride, w)
        ).reshape(s_slots, stride, w)
        blk_i = lax.dynamic_slice(
            bp_i, (start + pad_f, 0), (s_slots * stride, w)
        ).reshape(s_slots, stride, w)
        strip_r = blk_r[:, :w, :]
        strip_i = blk_i[:, :w, :]

        # dense Hermitian windows from the lower trapezoid
        wlow_r = _skew_to_window(strip_r, b)  # (S, 3b, 2b)
        wlow_i = _skew_to_window(strip_i, b)
        zpad = jnp.zeros((s_slots, 3 * b, b), dtype)
        we_r = jnp.concatenate([wlow_r, zpad], axis=2)
        we_i = jnp.concatenate([wlow_i, zpad], axis=2)
        diag = jnp.einsum("spp->sp", we_r)
        wd_r = we_r + jnp.swapaxes(we_r, 1, 2) - diag[:, :, None] * eye3b[None]
        wd_i = we_i - jnp.swapaxes(we_i, 1, 2)

        src = (k_s == 0)[:, None]
        x_r = jnp.where(src, wd_r[:, b : 2 * b, b - 1], wd_r[:, b : 2 * b, 0])
        x_i = jnp.where(src, wd_i[:, b : 2 * b, b - 1], wd_i[:, b : 2 * b, 0])
        v_r, v_i, tau_r, tau_i, beta = _larfg_vec_planar(x_r, x_i)
        tau_r = jnp.where(active, tau_r, 0.0)
        tau_i = jnp.where(active, tau_i, 0.0)

        # left: rows <- H^H rows = rows - conj(tau) v (v^H rows)
        # (zlarfg annihilates via H^H: H^H x = beta e1, so the similarity
        # is A <- H^H A H and Q2 accumulates as H_1 H_2 ... H_N)
        rows_r = wd_r[:, b : 2 * b, :]
        rows_i = wd_i[:, b : 2 * b, :]
        u_r = jnp.einsum("sp,spq->sq", v_r, rows_r) + jnp.einsum(
            "sp,spq->sq", v_i, rows_i
        )
        u_i = jnp.einsum("sp,spq->sq", v_r, rows_i) - jnp.einsum(
            "sp,spq->sq", v_i, rows_r
        )
        tu_r = tau_r[:, None] * u_r + tau_i[:, None] * u_i
        tu_i = tau_r[:, None] * u_i - tau_i[:, None] * u_r
        rows_r = rows_r - (
            v_r[:, :, None] * tu_r[:, None, :] - v_i[:, :, None] * tu_i[:, None, :]
        )
        rows_i = rows_i - (
            v_r[:, :, None] * tu_i[:, None, :] + v_i[:, :, None] * tu_r[:, None, :]
        )
        wd_r = wd_r.at[:, b : 2 * b, :].set(rows_r)
        wd_i = wd_i.at[:, b : 2 * b, :].set(rows_i)

        # right: cols <- cols H = cols - tau (cols v) conj(v)^T
        cols_r = wd_r[:, :, b : 2 * b]
        cols_i = wd_i[:, :, b : 2 * b]
        c_r = jnp.einsum("spq,sq->sp", cols_r, v_r) - jnp.einsum(
            "spq,sq->sp", cols_i, v_i
        )
        c_i = jnp.einsum("spq,sq->sp", cols_r, v_i) + jnp.einsum(
            "spq,sq->sp", cols_i, v_r
        )
        tc_r = tau_r[:, None] * c_r - tau_i[:, None] * c_i
        tc_i = tau_r[:, None] * c_i + tau_i[:, None] * c_r
        # (tau cols v) outer conj(v)
        cols_r = cols_r - (
            tc_r[:, :, None] * v_r[:, None, :] + tc_i[:, :, None] * v_i[:, None, :]
        )
        cols_i = cols_i - (
            tc_i[:, :, None] * v_r[:, None, :] - tc_r[:, :, None] * v_i[:, None, :]
        )
        wd_r = wd_r.at[:, :, b : 2 * b].set(cols_r)
        wd_i = wd_i.at[:, :, b : 2 * b].set(cols_i)

        sn_r = _window_to_skew(wd_r, b, strip_r)
        sn_i = _window_to_skew(wd_i, b, strip_i)
        blk_r = blk_r.at[:, :w, :].set(sn_r)
        blk_i = blk_i.at[:, :w, :].set(sn_i)
        bp_r = lax.dynamic_update_slice(
            bp_r, blk_r.reshape(s_slots * stride, w), (start + pad_f, 0)
        )
        bp_i = lax.dynamic_update_slice(
            bp_i, blk_i.reshape(s_slots * stride, w), (start + pad_f, 0)
        )
        vt_r = lax.dynamic_update_slice(vt_r, v_r[None], (t, 0, 0))
        vt_i = lax.dynamic_update_slice(vt_i, v_i[None], (t, 0, 0))
        tt_r = lax.dynamic_update_slice(tt_r, tau_r[None], (t, 0))
        tt_i = lax.dynamic_update_slice(tt_i, tau_i[None], (t, 0))
        return bp_r, bp_i, vt_r, vt_i, tt_r, tt_i

    with trace_range("bulge_chase_planar"):
        bp_r, bp_i, vt_r, vt_i, tt_r, tt_i = lax.fori_loop(
            0, t_total, step, (bp_r, bp_i, vt_r, vt_i, tt_r, tt_i)
        )
    out_r = lax.dynamic_slice(bp_r, (pad_f, 0), (n, w))
    out_i = lax.dynamic_slice(bp_i, (pad_f, 0), (n, w))
    d = out_r[:, 0]
    ne = n - 1 if n > 1 else 0
    e_r = out_r[:ne, 1]
    e_i = out_i[:ne, 1]
    return d, (e_r, e_i), (vt_r, vt_i), (tt_r, tt_i)


def phase_normalize(e_r, e_i):
    """Diagonal unitary D with D^H T D real for the complex tridiagonal
    (d real, subdiagonal e): returns ((dr, di), e_abs) with
    D = diag(p_0..p_{n-1}), p_0 = 1, p_{j+1} = p_j * e_j / |e_j|
    (p_{j+1} = p_j for |e_j| = 0).  Then (D^H T D)_{j+1,j} = |e_j|.

    Log-depth associative scan of complex products -- exact arithmetic,
    no transcendentals (platform fact: fp64 log/exp are ~1e-8 only)."""
    mag = jnp.sqrt(e_r * e_r + e_i * e_i)
    safe = jnp.where(mag == 0, 1.0, mag)
    ph_r = jnp.where(mag == 0, 1.0, e_r / safe)
    ph_i = jnp.where(mag == 0, 0.0, e_i / safe)
    one = jnp.ones((1,), e_r.dtype)
    zero = jnp.zeros((1,), e_r.dtype)
    seq_r = jnp.concatenate([one, ph_r])
    seq_i = jnp.concatenate([zero, ph_i])

    def cmul(a, b):
        ar, ai = a
        br, bi = b
        return ar * br - ai * bi, ar * bi + ai * br

    p_r, p_i = lax.associative_scan(cmul, (seq_r, seq_i))
    # the fp32 cumulative product drifts off unit modulus by
    # ~sqrt(n)*eps (it scales eigenvector norms if left in): renormalize
    pm = jnp.sqrt(p_r * p_r + p_i * p_i)
    pm = jnp.where(pm == 0, 1.0, pm)
    return (p_r / pm, p_i / pm), mag


def _ptriu_inv_doubling(tr, ti, base=16):
    """Batched planar upper-triangular inverse by block doubling."""
    k = tr.shape[-1]
    if k <= base:
        # batched planar substitution against the identity, top-down
        nb_ = tr.shape[0]
        eye = jnp.broadcast_to(jnp.eye(k, dtype=tr.dtype), (nb_, k, k))

        def body(i, x):
            xr, xi = x
            j = k - 1 - i  # bottom row first for upper-triangular
            row_r = lax.dynamic_slice(tr, (0, j, 0), (nb_, 1, k))[:, 0, :]
            row_i = lax.dynamic_slice(ti, (0, j, 0), (nb_, 1, k))[:, 0, :]
            acc_r = jnp.einsum("bk,bkj->bj", row_r, xr) - jnp.einsum(
                "bk,bkj->bj", row_i, xi
            )
            acc_i = jnp.einsum("bk,bkj->bj", row_r, xi) + jnp.einsum(
                "bk,bkj->bj", row_i, xr
            )
            # subtract the diagonal term included in acc
            dr = tr[:, j, j][:, None]
            di = ti[:, j, j][:, None]
            xj_r = lax.dynamic_slice(xr, (0, j, 0), (nb_, 1, k))[:, 0, :]
            xj_i = lax.dynamic_slice(xi, (0, j, 0), (nb_, 1, k))[:, 0, :]
            acc_r = acc_r - (dr * xj_r - di * xj_i)
            acc_i = acc_i - (dr * xj_i + di * xj_r)
            num_r = eye[:, j, :] - acc_r
            num_i = -acc_i
            den = dr * dr + di * di
            safe = jnp.where(den == 0, 1.0, den)
            row_or = (num_r * dr + num_i * di) / safe
            row_oi = (num_i * dr - num_r * di) / safe
            xr = lax.dynamic_update_slice(xr, row_or[:, None, :], (0, j, 0))
            xi = lax.dynamic_update_slice(xi, row_oi[:, None, :], (0, j, 0))
            return xr, xi

        z = jnp.zeros_like(tr)
        return lax.fori_loop(0, k, body, (z, z))
    h = k // 2
    ia_r, ia_i = _ptriu_inv_doubling(tr[..., :h, :h], ti[..., :h, :h], base)
    id_r, id_i = _ptriu_inv_doubling(tr[..., h:, h:], ti[..., h:, h:], base)
    cr, ci = tr[..., :h, h:], ti[..., :h, h:]
    bmm = lambda xr, xi, yr, yi: (
        jnp.einsum("...ij,...jk->...ik", xr, yr)
        - jnp.einsum("...ij,...jk->...ik", xi, yi),
        jnp.einsum("...ij,...jk->...ik", xr, yi)
        + jnp.einsum("...ij,...jk->...ik", xi, yr),
    )
    t_r, t_i = bmm(cr, ci, id_r, id_i)
    m_r, m_i = bmm(ia_r, ia_i, t_r, t_i)
    zb = jnp.zeros_like(m_r)
    out_r = jnp.concatenate(
        [jnp.concatenate([ia_r, -m_r], axis=-1),
         jnp.concatenate([zb.swapaxes(-1, -2), id_r], axis=-1)], axis=-2
    )
    out_i = jnp.concatenate(
        [jnp.concatenate([ia_i, -m_i], axis=-1),
         jnp.concatenate([zb.swapaxes(-1, -2), id_i], axis=-1)], axis=-2
    )
    return out_r, out_i


@highest_precision
@functools.partial(jax.jit, static_argnames=("b", "g", "n"))
def apply_q2_planar(vt, taut, y, n, b, g=None):
    """Planar y <- Q2 y: the complex twin of ops/sb2st.apply_q2 (same
    wave schedule -- its validity derivation is dtype-independent; the
    compact-WY identity becomes T^{-1} = striu(V^H V) + diag(1/tau)).

    vt = (vt_r, vt_i), taut = (taut_r, taut_i) from bulge_chase_planar;
    y = (y_r, y_i) of shape (n, m)."""
    vt_r, vt_i = vt
    tt_r, tt_i = taut
    y_r, y_i = y
    if g is None:
        g = b
    t3, s_slots, _ = vt_r.shape
    m = y_r.shape[1]
    dtype = y_r.dtype
    kmax = max((n - 3) // b, 0)
    l_win = b + g - 1
    n_groups = -(-max(n - 2, 1) // g)
    nv = max(n - 2, 1)
    kcap = 3 * s_slots
    n_u = kmax // 2 + 1
    n_act = min(n_u, -(-(n - 2) // (g + 2 * b)) + 1)

    with trace_range("apply_q2_planar_repack"):
        v2_r, t2_r = repack_sweep_major(vt_r, tt_r, b, n)
        v2_i, t2_i = repack_sweep_major(vt_i, tt_i, b, n)
        nvp = n_groups * g + g
        kp = max(kmax + 2, kcap)
        padv = lambda v: jnp.pad(
            v, ((0, kp - kcap), (0, nvp - nv), (0, 0))
        ).reshape(kp * nvp, b)
        padt = lambda t: jnp.pad(
            t, ((0, kp - kcap), (0, nvp - nv))
        ).reshape(kp * nvp)
        v2f_r, v2f_i = padv(v2_r), padv(v2_i)
        t2f_r, t2f_i = padt(t2_r), padt(t2_i)

    taus_np = np.arange(2 * (n_groups - 1) + kmax + 1)
    par_np = taus_np % 2
    c0_np = n_groups - 1 - (taus_np - par_np) // 2
    ulo_np = np.minimum(np.maximum(0, -c0_np), n_u - n_act)
    base_np = (c0_np + ulo_np) * g + 1 + par_np * b + 2 * b * ulo_np
    fy = int(max(0, -base_np.min())) + 8
    span = n_act * (g + 2 * b)
    rows_p = fy + max(int(base_np.max()) + span + l_win, n) + 8
    yp_r = lax.dynamic_update_slice(jnp.zeros((rows_p, m), dtype), y_r, (fy, 0))
    yp_i = lax.dynamic_update_slice(jnp.zeros((rows_p, m), dtype), y_i, (fy, 0))

    n_waves = 2 * (n_groups - 1) + kmax + 1
    eye_g = jnp.eye(g, dtype=dtype)
    iota_u = jnp.arange(n_act, dtype=jnp.int32)
    iota_g = jnp.arange(g, dtype=jnp.int32)

    def wave(tau, yp):
        yp_r, yp_i = yp
        par = tau % 2
        c0 = n_groups - 1 - (tau - par) // 2
        u_lo = jnp.minimum(jnp.maximum(0, -c0), n_u - n_act)
        u = u_lo + iota_u
        jw = c0 + u
        kw = par + 2 * u
        ok = (jw >= 0) & (jw < n_groups) & (kw <= kmax) \
            & (jw * g + kw * b <= n - 3)
        jj = jnp.where(ok, jw, n_groups)
        kk = jnp.where(ok, kw, kp - 1)
        ridx = (kk * nvp + jj * g)[:, None] + iota_g[None, :]
        take = lambda f: jnp.take(f, ridx.reshape(-1), axis=0)
        vb_r = take(v2f_r).reshape(n_act, g, b)
        vb_i = take(v2f_i).reshape(n_act, g, b)
        ta_r = jnp.take(t2f_r, ridx.reshape(-1), axis=0).reshape(n_act, g)
        ta_i = jnp.take(t2f_i, ridx.reshape(-1), axis=0).reshape(n_act, g)
        live = (ta_r != 0) | (ta_i != 0)
        den = ta_r * ta_r + ta_i * ta_i
        safe = jnp.where(live, den, 1.0)
        inv_r = jnp.where(live, ta_r / safe, 1.0)  # Re(1/tau)
        inv_i = jnp.where(live, -ta_i / safe, 0.0)
        skew = lambda vb: jnp.swapaxes(
            _shift_rows(jnp.pad(vb, ((0, 0), (0, 0), (0, g))), -1, l_win),
            1, 2,
        )
        vw_r = skew(vb_r) * live[:, None, :]
        vw_i = skew(vb_i) * live[:, None, :]

        base = c0 * g + 1 + par * b + fy + u_lo * (g + 2 * b)
        span_act = n_act * (g + 2 * b)
        ywa_r = lax.dynamic_slice(yp_r, (base, 0), (span_act, m)).reshape(
            n_act, g + 2 * b, m
        )
        ywa_i = lax.dynamic_slice(yp_i, (base, 0), (span_act, m)).reshape(
            n_act, g + 2 * b, m
        )
        yw_r = ywa_r[:, :l_win]
        yw_i = ywa_i[:, :l_win]

        # T^{-1} = striu(V^H V) + diag(1/tau)
        vtv_r = jnp.einsum("urs,urt->ust", vw_r, vw_r) + jnp.einsum(
            "urs,urt->ust", vw_i, vw_i
        )
        vtv_i = jnp.einsum("urs,urt->ust", vw_r, vw_i) - jnp.einsum(
            "urs,urt->ust", vw_i, vw_r
        )
        tinv_r = jnp.triu(vtv_r, 1) + eye_g[None] * inv_r[:, :, None]
        tinv_i = jnp.triu(vtv_i, 1) + eye_g[None] * inv_i[:, :, None]
        ti_r, ti_i = _ptriu_inv_doubling(tinv_r, tinv_i)
        # Q = I - V T V^H, applied as one batched planar (l x l) product
        # tv = T V^H: (u, g, l)
        tv_r = jnp.einsum("ust,urt->usr", ti_r, vw_r) + jnp.einsum(
            "ust,urt->usr", ti_i, vw_i
        )
        tv_i = jnp.einsum("ust,urt->usr", ti_i, vw_r) - jnp.einsum(
            "ust,urt->usr", ti_r, vw_i
        )
        qw_r = -(
            jnp.einsum("urs,usq->urq", vw_r, tv_r)
            - jnp.einsum("urs,usq->urq", vw_i, tv_i)
        )
        qw_i = -(
            jnp.einsum("urs,usq->urq", vw_r, tv_i)
            + jnp.einsum("urs,usq->urq", vw_i, tv_r)
        )
        qw_r = qw_r + jnp.broadcast_to(jnp.eye(l_win, dtype=dtype), qw_r.shape)
        new_r = jnp.einsum("uqr,urm->uqm", qw_r, yw_r) - jnp.einsum(
            "uqr,urm->uqm", qw_i, yw_i
        )
        new_i = jnp.einsum("uqr,urm->uqm", qw_r, yw_i) + jnp.einsum(
            "uqr,urm->uqm", qw_i, yw_r
        )
        ywa_r = ywa_r.at[:, :l_win].set(new_r)
        ywa_i = ywa_i.at[:, :l_win].set(new_i)
        yp_r = lax.dynamic_update_slice(
            yp_r, ywa_r.reshape(span_act, m), (base, 0)
        )
        yp_i = lax.dynamic_update_slice(
            yp_i, ywa_i.reshape(span_act, m), (base, 0)
        )
        return yp_r, yp_i

    with trace_range("apply_q2_planar"):
        yp_r, yp_i = lax.fori_loop(0, n_waves, wave, (yp_r, yp_i))
    return (
        lax.dynamic_slice(yp_r, (fy, 0), (n, m)),
        lax.dynamic_slice(yp_i, (fy, 0), (n, m)),
    )
