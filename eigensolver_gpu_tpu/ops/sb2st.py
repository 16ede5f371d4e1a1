"""Stage 2 of the two-stage tridiagonalization: symmetric band ->
tridiagonal via wavefront-batched bulge chasing (sb2st), plus the blocked
WY replay of the chase reflectors onto eigenvector columns.

Re-designs the role of the reference's hot one-stage Householder loop
(dsytrd_gpu.F90:61-163 / zhetrd_gpu.F90:60-165): instead of one
O(n^2)-traffic matvec serialized per column, stage 1 (ops/sbrd.py)
moves the O(n^3) flops into per-panel gemms and this module eliminates
the remaining band with O(b)-sized Householder reflectors.

TPU-native design (no translation possible -- the reference has no
two-stage path):

* The band is kept in LAPACK-style lower band storage ``B[j, d] =
  A[j+d, j]`` with 2b diagonals (the chase's maximal intermediate
  bandwidth is 2b-1, measured and asserted in tests).
* Chase schedule: sweep ``v`` eliminates column ``v``; its chase step
  ``k`` applies a length-<=b reflector at rows ``r0 = v+1+k*b``. With
  the wavefront schedule ``t = 3v + k``, all active (v, k) at one
  timestep touch disjoint band strips spaced exactly ``3b-1`` apart --
  so one `lax.dynamic_slice` of a contiguous block, a static shear into
  dense (D, L, Db) window blocks, batched reflector math, and one
  `lax.dynamic_update_slice` per timestep. No scatter, no atomics; the
  sequential dependency is the fori_loop carry.
* Reflector (v, k) is stored at ``V[3v+k, k//3]`` -- contiguous writes
  at each timestep (t fixed, all slots), and contiguous (stride-3 via a
  reshape) reads for the replay's WY windows.
* Replay: groups of ``g`` sweeps processed descending, chase windows
  ascending; each window applies its <=g reflectors as one compact-WY
  block using ``T^{-1} = striu(V^T V) + diag(1/tau)`` (one batched
  triangular solve + two gemms). Verified equal to scalar replay.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def dense_to_band(a, b):
    """Lower band storage with 2b diagonals: ``B[j, d] = A[j+d, j]``
    (zero where j+d >= n). ``a`` symmetric (n, n); returns (n, 2b)."""
    n = a.shape[0]
    w = 2 * b
    rows = jnp.arange(n)[:, None] + jnp.arange(w)[None, :]  # j + d
    safe = jnp.minimum(rows, n - 1)
    vals = a[safe, jnp.arange(n)[:, None]]
    return jnp.where(rows < n, vals, 0.0)


def band_to_dense(band, b):
    """Inverse of dense_to_band (symmetric reconstruction)."""
    n = band.shape[0]
    w = 2 * b
    out = jnp.zeros((n, n), band.dtype)
    for d in range(w):
        out = out + jnp.diag(band[: n - d, d] if d else band[:, 0], -d)
    return out + jnp.tril(out, -1).T


def _larfg_vec(x):
    """Batched real Householder: zero x[:, 1:], pivot x[:, 0].

    Returns (v, tau, beta) with v[:, 0] = 1 (or 0 for trivial columns),
    H = I - tau v v^T, H x = beta e1. LAPACK dlarfg conventions (see
    ops/sytrd._larfg)."""
    alpha = x[:, 0]
    xnormsq = jnp.sum(x[:, 1:] * x[:, 1:], axis=1)
    norm = jnp.sqrt(alpha * alpha + xnormsq)
    beta = jnp.where(alpha >= 0, -norm, norm)
    trivial = xnormsq == 0
    safe_beta = jnp.where(trivial, 1.0, beta)
    tau = jnp.where(trivial, 0.0, (beta - alpha) / safe_beta)
    denom = jnp.where(trivial, 1.0, alpha - beta)
    v = x / denom[:, None]
    v = v.at[:, 0].set(jnp.where(trivial, 0.0, 1.0))
    beta = jnp.where(trivial, alpha, beta)
    return v, tau, beta


def _skew_to_window(sb, b):
    """Band strips -> dense lower-trapezoid windows, gather-free.

    ``sb`` is (S, 2b, 2b) with sb[s, q, d] = A[j0+q+d, j0+q] (band rows
    j0 = r0-b .. r0+b of slot s). Returns W (S, 3b, 2b) with
    W[s, p, q] = A[j0+p, j0+q] for 0 <= p-q < 2b, 0 elsewhere.

    The skew is the classic pad/flatten/reshape stride trick: padding
    each row to width 3b+1 makes flat index q*(3b+1)+d equal
    q*3b + (q+d), so a reshape with row stride 3b realigns diagonals to
    matrix rows. Pure reshapes -- no gather (TPU gathers measured ~40x
    slower than this path in the chase loop).
    """
    s, w, _ = sb.shape
    t3 = 3 * b
    pad = jnp.zeros((s, w, t3 + 1 - w), sb.dtype)
    flat = jnp.concatenate([sb, pad], axis=2).reshape(s, w * (t3 + 1))
    lt = flat[:, : w * t3].reshape(s, w, t3)  # lt[s, q, p] = sb[s, q, p-q]
    wmat = jnp.swapaxes(lt, 1, 2)  # (S, 3b, 2b)
    p = np.arange(t3)[:, None]
    q = np.arange(w)[None, :]
    valid = jnp.asarray((p >= q) & (p - q < w))
    return jnp.where(valid[None], wmat, 0.0)


def _window_to_skew(wd, b, sb_old):
    """Inverse of _skew_to_window: dense windows (S, 3b, >=2b) back to
    band strips (S, 2b, 2b); positions q+d >= 3b (outside the window)
    keep ``sb_old``. Same stride trick, reversed."""
    s = wd.shape[0]
    w = 2 * b
    t3 = 3 * b
    lt = jnp.swapaxes(wd[:, :, :w], 1, 2)  # lt[s, q, p] = wd[s, p, q]
    flat = lt.reshape(s, w * t3)
    flat = jnp.concatenate(
        [flat, jnp.zeros((s, w * (t3 + 1) - w * t3), wd.dtype)], axis=1
    )
    ext = flat.reshape(s, w, t3 + 1)[:, :, :w]  # ext[s,q,d] = wd[s,q+d,q]
    q = np.arange(w)[:, None]
    d = np.arange(w)[None, :]
    inwin = jnp.asarray(q + d < t3)
    return jnp.where(inwin[None], ext, sb_old)


@highest_precision
@functools.partial(jax.jit, static_argnames=("b",))
def bulge_chase(band, b):
    """Chase a symmetric band matrix (lower storage, 2b diagonals, see
    dense_to_band) to tridiagonal. Returns (d, e, vt, taut): the
    tridiagonal, plus the chase reflectors in timestep storage for
    apply_q2. Requires n >= 3 and b >= 2."""
    n = band.shape[0]
    dtype = band.dtype
    w = 2 * b
    if band.shape[1] != w:
        raise ValueError(f"band must have 2b={w} diagonals, got {band.shape[1]}")
    kmax = max((n - 3) // b, 0)  # largest chase index overall
    s_slots = kmax // 3 + 1
    t_total = 3 * (n - 3) + 1 if n > 3 else 1
    stride = 3 * b - 1

    # padded band: front pad 2b, back pad covers the largest gather
    pad_f = 2 * b
    pad_b = 2 * b + s_slots * stride + w
    band_p = jnp.zeros((n + pad_f + pad_b, w), dtype)
    band_p = lax.dynamic_update_slice(band_p, band, (pad_f, 0))

    t3 = 3 * ((t_total + 2) // 3)
    vt = jnp.zeros((t3, s_slots, b), dtype)
    taut = jnp.zeros((t3, s_slots), dtype)

    svec = jnp.arange(s_slots)
    eye3b = jnp.eye(3 * b, dtype=dtype)

    def step(t, carry):
        band_p, vt, taut = carry
        vmax = t // 3
        k0 = t % 3
        v_s = vmax - svec                    # sweep per slot
        k_s = k0 + 3 * svec                  # chase index per slot
        r0_s = v_s + 1 + k_s * b             # reflector start row
        active = (v_s >= 0) & (v_s <= n - 3) & (r0_s <= n - 2)

        start = vmax + 1 + k0 * b - b        # = r0_{s=0} - b
        blk = lax.dynamic_slice(
            band_p, (start + pad_f, 0), (s_slots * stride, w)
        ).reshape(s_slots, stride, w)
        strip = blk[:, : 2 * b, :]           # (S, 2b, 2b)

        # dense symmetric windows Wd[s, p, q] = A[r0-b+p, r0-b+q]
        # (3b x 3b; the [2b:, 2b:] corner is unused and stays 0)
        wlow = _skew_to_window(strip, b)     # (S, 3b, 2b) lower trapezoid
        wemb = jnp.concatenate(
            [wlow, jnp.zeros((s_slots, 3 * b, b), dtype)], axis=2
        )
        diag = jnp.einsum("spp->sp", wemb)
        wd = wemb + jnp.swapaxes(wemb, 1, 2) - diag[:, :, None] * eye3b[None]

        # reflector source: rows [r0, r0+b) of column r0-1 (sweep start,
        # k==0) or r0-b (in-chase); window coords rows [b, 2b)
        x = jnp.where(
            (k_s == 0)[:, None], wd[:, b : 2 * b, b - 1], wd[:, b : 2 * b, 0]
        )
        v, tau, beta = _larfg_vec(x)
        tau = jnp.where(active, tau, 0.0)

        # two-sided update H A H on the dense window, H = I - tau v v^T
        # acting on window rows/cols [b, 2b): left then right.
        rows = wd[:, b : 2 * b, :]
        vtr = jnp.einsum("sp,spq->sq", v, rows)
        rows = rows - tau[:, None, None] * v[:, :, None] * vtr[:, None, :]
        wd = wd.at[:, b : 2 * b, :].set(rows)
        cols = wd[:, :, b : 2 * b]
        cv = jnp.einsum("spq,sq->sp", cols, v)
        wd = wd.at[:, :, b : 2 * b].set(
            cols - tau[:, None, None] * cv[:, :, None] * v[:, None, :]
        )

        strip_new = _window_to_skew(wd, b, strip)
        blk = blk.at[:, : 2 * b, :].set(strip_new)
        band_p = lax.dynamic_update_slice(
            band_p, blk.reshape(s_slots * stride, w), (start + pad_f, 0)
        )
        vt = lax.dynamic_update_slice(vt, v[None], (t, 0, 0))
        taut = lax.dynamic_update_slice(taut, tau[None], (t, 0))
        return band_p, vt, taut

    with trace_range("bulge_chase"):
        band_p, vt, taut = lax.fori_loop(0, t_total, step, (band_p, vt, taut))
    band = lax.dynamic_slice(band_p, (pad_f, 0), (n, w))
    d = band[:, 0]
    e = band[: n - 1, 1] if n > 1 else band[:0, 1]
    return d, e, vt, taut


def _shift_rows(x, step, out_w):
    """Y[..., i, j] = x[..., i, j + i*step], out-of-range reads 0.

    The pad/flatten/reshape stride trick (see _skew_to_window): padding
    rows to width w2 and reshaping the flat buffer with row stride
    w2+step realigns row i by i*step. Requires -w2 < step. Pure
    reshapes, no gather."""
    *lead, r, w = x.shape
    need = out_w + max(0, (r - 1) * step)
    w2 = max(w, need, out_w - step + 1)
    if w2 > w:
        padw = [(0, 0)] * len(lead) + [(0, 0), (0, w2 - w)]
        x = jnp.pad(x, padw)
    flat = x.reshape(*lead, r * w2)
    extra = r * (w2 + step) - r * w2
    if extra > 0:
        padf = [(0, 0)] * len(lead) + [(0, extra)]
        flat = jnp.pad(flat, padf)
    y = flat[..., : r * (w2 + step)].reshape(*lead, r, w2 + step)
    return y[..., :out_w]


def _triu_inv_doubling(t, base=16):
    """Batched upper-triangular inverse by block doubling (log depth).

    XLA's batched triangular_solve substitutes row-by-row; for the
    g x g compact-WY T factors (g up to 128) a doubled inverse plus one
    gemm measures faster inside the wave loop.
    """
    k = t.shape[-1]
    if k <= base:
        eye = jnp.broadcast_to(jnp.eye(k, dtype=t.dtype), t.shape)
        return lax.linalg.triangular_solve(
            t, eye, left_side=True, lower=False
        )
    h = k // 2
    ia = _triu_inv_doubling(t[..., :h, :h], base)
    id_ = _triu_inv_doubling(t[..., h:, h:], base)
    c = t[..., :h, h:]
    m = -jnp.einsum("...ij,...jk,...kl->...il", ia, c, id_)
    top = jnp.concatenate([ia, m], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(m).swapaxes(-1, -2), id_], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def repack_sweep_major(vt, taut, b, n):
    """Repack vt[t, s] -> V2[k, v] sweep-major storage, gather-free.

    Reflector (v, k) of the chase lives at t = 3v+k, s = k//3; for
    k = 3s+c, V2[3s+c, v] = vt[3(v+s)+c, s].  Returns
    (v2 (3*s_slots, nv, b), t2 (3*s_slots, nv)) with nv = max(n-2, 1)
    (sweeps v in [0, n-3])."""
    t3, s_slots, b_ = vt.shape
    nv = max(n - 2, 1)
    tcap = t3 // 3
    need_t = nv + s_slots
    vt4 = vt.reshape(tcap, 3, s_slots, b_)
    tt4 = taut.reshape(tcap, 3, s_slots)
    if need_t > tcap:
        vt4 = jnp.pad(vt4, ((0, need_t - tcap), (0, 0), (0, 0), (0, 0)))
        tt4 = jnp.pad(tt4, ((0, need_t - tcap), (0, 0), (0, 0)))
    # axes -> (c, s, t, b); per (c, s): row v reads t = v + s
    vt_cs = jnp.transpose(vt4, (1, 2, 0, 3)).reshape(3, s_slots, need_t * b_)
    v_sk = _shift_rows(vt_cs, b_, nv * b_).reshape(3, s_slots, nv, b_)
    t_cs = jnp.transpose(tt4, (1, 2, 0))
    t_sk = _shift_rows(t_cs, 1, nv)
    # V2[k = 3s+c] : (s, c) row-major == 3s+c
    v2 = jnp.transpose(v_sk, (1, 0, 2, 3)).reshape(3 * s_slots, nv, b_)
    t2 = jnp.transpose(t_sk, (1, 0, 2)).reshape(3 * s_slots, nv)
    return v2, t2


@highest_precision
@functools.partial(jax.jit, static_argnames=("b", "g", "n", "tsolve"))
def apply_q2(vt, taut, y, n, b, g=None, tsolve="qform"):
    """y <- Q2 y where Q2 is the accumulated bulge-chase transform
    (band = Q2^T A_band Q2). y is (n, m); reflectors from bulge_chase.

    Wavefront-batched blocked replay: reflectors are grouped into
    compact-WY windows of ``g`` consecutive sweeps per chase position
    (window (j, k) covers sweeps [jg, jg+g) at chase hop k, rows
    jg+1+kb .. +b+g-1). The sequential order (groups descending, k
    ascending) is replaced by the wave schedule tau = 2*(G-1-j) + k.

    Validity (holds for EVERY g >= 1, b >= 2 -- property-tested over
    g up to 4b in tests/test_sbrd.py):

    * sequential lex order is correct: reflectors (v1,k1), (v2,k2)
      whose row intervals [v+1+kb, v+kb+b) overlap satisfy
      |dv + dk*b| <= b-1; replay (reverse chase, t = 3v+k descending)
      then forces the window order (j desc, k asc) -- for every
      overlapping pair the lex-earlier window holds the later-t
      reflector, because dv >= (dj-1)g+1 with overlap would need
      |dk|(b - 1/3) <= b-1, impossible for |dk| >= 1.
    * lex -> wave: windows start at a(j,k) = jg+kb; a tau-order
      inversion against lex needs dk >= 2*dj (dj = j1-j2 > 0), which
      puts the starts >= g+2b apart -- past the window length b+g-1,
      so inverted pairs never overlap. Equal-tau windows (dk = 2*dj)
      are exactly g+2b apart: disjoint, batchable.

    Each wave is ONE contiguous slice of y (slots spaced g+2b rows), a
    batch of staircase-WY gemms, and one write-back; ~(2n/g + n/b)
    waves instead of ~n^2/(gb) sequential windows. g > 2b trades a
    shorter critical path (fewer, taller windows: l_win = b+g-1 rows)
    against more wasted reflector-free rows per slot. The timestep->
    sweep-major repack is gather-free (_shift_rows); each wave then row-
    gathers its ~n_act*g reflectors from the compact store (tiny next
    to the wave's y traffic, and O(n*b) memory instead of the O(n^2)
    pre-skewed copy that dominated the sharded config's memory plan)."""
    if g is None:
        g = b
    t3, s_slots, _ = vt.shape
    m = y.shape[1]
    dtype = y.dtype
    kmax = max((n - 3) // b, 0)
    l_win = b + g - 1
    n_groups = -(-max(n - 2, 1) // g)
    nv = max(n - 2, 1)  # sweeps v in [0, n-3]

    # slots per wave: slot u holds window (j = c0+u, k = par+2u), so
    # u = k//2 <= kmax//2 -- bounded by the HOP count, never by
    # n_groups (a min(n_groups, ..) here silently dropped the
    # high-hop windows of low groups whenever g > 2b, where
    # n_groups < kmax//2+1 -- the round-2 "g <= 2b corruption").
    # Out-of-range slots (j >= n_groups or k > kmax) read zeros and
    # reduce to identity windows.
    kcap = 3 * s_slots
    n_u = kmax // 2 + 1
    # active slots per wave: windows intersecting rows [0, n) number at
    # most cdiv(n-2, g+2b)+1 (spacing g+2b); reading n_act slots from
    # the first possibly-active one (u_lo) skips the identity windows
    # (j < 0 or rows past n) that n_u = kmax//2+1 otherwise drags
    # through the gemms -- at n=8192/g=32 that is 87 of 128 slots.
    n_act = min(n_u, -(-(n - 2) // (g + 2 * b)) + 1)

    with trace_range("apply_q2_repack"):
        # sweep-major store, padded so every out-of-range (k, sweep)
        # index lands in a zero region: rows kmax+1.. and sweeps nv..
        # (the round-2 parity PRE-SKEW materialized a (2, n_u,
        # ~1.5n + n, b) shifted copy so each wave was one slice -- at
        # n=16384 that is GBs of mostly-zero replicated temp, the bulk
        # of the sharded config's memory plan. Per-wave index-computed
        # row gathers from the compact store read ~n_act*g*b elements
        # instead: negligible next to the wave's y traffic.)
        v2, t2 = repack_sweep_major(vt, taut, b, n)
        nvp = n_groups * g + g
        kp = max(kmax + 2, kcap)
        v2p = jnp.pad(v2, ((0, kp - kcap), (0, nvp - nv), (0, 0)))
        t2p = jnp.pad(t2, ((0, kp - kcap), (0, nvp - nv)))
        v2f = v2p.reshape(kp * nvp, b)
        t2f = t2p.reshape(kp * nvp)

    # pad y rows: the clamped wave bases dip at most ~2b below row 0
    # (exact static min below) and the top windows read past n
    taus_np = np.arange(2 * (n_groups - 1) + kmax + 1)
    par_np = taus_np % 2
    c0_np = n_groups - 1 - (taus_np - par_np) // 2
    ulo_np = np.minimum(np.maximum(0, -c0_np), n_u - n_act)
    base_np = (c0_np + ulo_np) * g + 1 + par_np * b + 2 * b * ulo_np
    fy = int(max(0, -base_np.min())) + 8
    span = n_act * (g + 2 * b)
    rows_p = fy + max(int(base_np.max()) + span + l_win, n) + 8
    y_p = jnp.zeros((rows_p, m), dtype)
    y_p = lax.dynamic_update_slice(y_p, y, (fy, 0))

    n_waves = 2 * (n_groups - 1) + kmax + 1
    eye_g = jnp.eye(g, dtype=dtype)
    iota_u = jnp.arange(n_act, dtype=jnp.int32)
    iota_g = jnp.arange(g, dtype=jnp.int32)

    def wave(tau, y_p):
        par = tau % 2
        c0 = n_groups - 1 - (tau - par) // 2
        # first potentially-active slot (j = c0+u >= 0), clamped so the
        # static n_act window stays in range; active slots are
        # contiguous from max(0, -c0) with count <= n_act (row-span)
        u_lo = jnp.minimum(jnp.maximum(0, -c0), n_u - n_act)
        u = u_lo + iota_u
        jw = c0 + u
        kw = par + 2 * u
        ok = (jw >= 0) & (jw < n_groups) & (kw <= kmax) \
            & (jw * g + kw * b <= n - 3)
        jj = jnp.where(ok, jw, n_groups)   # -> zero sweep padding
        kk = jnp.where(ok, kw, kp - 1)     # -> zero k row
        ridx = (kk * nvp + jj * g)[:, None] + iota_g[None, :]
        vblk = jnp.take(v2f, ridx.reshape(-1), axis=0).reshape(
            n_act, g, b
        )
        taus = jnp.take(t2f, ridx.reshape(-1), axis=0).reshape(n_act, g)
        tsafe = jnp.where(taus == 0, 1.0, taus)
        # staircase embedding vw[u, r, s] = vblk[u, s, r-s] (skew)
        vw = jnp.swapaxes(
            _shift_rows(jnp.pad(vblk, ((0, 0), (0, 0), (0, g))), -1, l_win),
            1, 2,
        )  # (n_act, l_win, g)
        vw = vw * (taus != 0)[:, None, :]

        base = c0 * g + 1 + par * b + fy + u_lo * (g + 2 * b)
        span_act = n_act * (g + 2 * b)
        yw_all = lax.dynamic_slice(y_p, (base, 0), (span_act, m)).reshape(
            n_act, g + 2 * b, m
        )
        yw = yw_all[:, :l_win]
        vtv = jnp.einsum("urs,urt->ust", vw, vw)
        tinv = jnp.triu(vtv, 1) + eye_g[None] / tsafe[:, :, None]
        if tsolve == "qform":
            # explicit window orthogonal Q = I - V T^-1 V^T, applied as
            # ONE batched (l_win x l_win) gemm: the skinny WY factors
            # (K=l_win, M=g) run the MXU at ~(g/128)(l_win/128)
            # utilization; the square form doubles M and folds the
            # three passes over yw into one.
            tv = jnp.einsum("ust,urt->usr", _triu_inv_doubling(tinv), vw)
            qw = -jnp.einsum("urs,usq->urq", vw, tv)
            qw = qw + jnp.broadcast_to(jnp.eye(l_win, dtype=dtype), qw.shape)
            yw = jnp.einsum("uqr,urm->uqm", qw, yw)
        else:
            u_m = jnp.einsum("urs,urm->usm", vw, yw)
            if tsolve == "inv":
                x = jnp.einsum("ust,utm->usm", _triu_inv_doubling(tinv), u_m)
            else:
                x = jax.scipy.linalg.solve_triangular(tinv, u_m, lower=False)
            yw = yw - jnp.einsum("urs,usm->urm", vw, x)
        yw_all = yw_all.at[:, :l_win].set(yw)
        return lax.dynamic_update_slice(
            y_p, yw_all.reshape(span_act, m), (base, 0)
        )

    with trace_range("apply_q2"):
        y_p = lax.fori_loop(0, n_waves, wave, y_p)
    return lax.dynamic_slice(y_p, (fy, 0), (n, m))
