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


def _shear_indices(b):
    """Static numpy index maps between the (2b, 2b) band strip and the
    dense window blocks (Lb, D, Db); see module docstring geometry.

    Strip row j in [0, 2b) is band column r0-b+j; strip col d is the
    d-th lower diagonal. Window blocks (local p, q in [0, b)):
      Lb[p, q] = A[r0+p,   r0-b+q] = strip[q,     b+p-q]
      D [p, q] = A[r0+p,   r0+q  ] = strip[b+q,   p-q  ]   (p >= q)
      Db[p, q] = A[r0+b+p, r0+q  ] = strip[b+q,   b+p-q]
    """
    p = np.arange(b)[:, None]
    q = np.arange(b)[None, :]
    lb_row = np.broadcast_to(q, (b, b))
    lb_d = b + p - q  # in [1, 2b-1]
    d_row = b + np.broadcast_to(q, (b, b))
    d_d = np.clip(p - q, 0, 2 * b - 1)  # valid where p >= q
    db_row = d_row
    db_d = b + p - q
    return (lb_row, lb_d), (d_row, d_d), (db_row, db_d)


def _strip_rebuild_indices(b):
    """Static maps writing the updated window blocks back into strip
    layout. For strip position (j, d):
      j <  b: from Lb[d-b+j, j]        if 0 <= d-b+j < b, else keep
      j >= b: from D[q+d, q] (q=j-b)   if d < b-q
              from Db[d-b+q, q]        if b-q <= d < 2b-q, else keep
    """
    w = 2 * b
    j = np.arange(w)[:, None]
    d = np.arange(w)[None, :]
    # top half (j < b): Lb[p=d-b+j, q=j]
    top_p = d - b + j
    top_valid = (j < b) & (top_p >= 0) & (top_p < b)
    # bottom half (j >= b): q = j - b
    q = j - b
    bot_from_d = (j >= b) & (d < b - q) & (q + d < b) & (q >= 0)
    bot_p_d = q + d
    bot_from_db = (j >= b) & (d >= b - q) & (d - b + q >= 0) & (d - b + q < b)
    bot_p_db = d - b + q
    clip = lambda m: np.clip(m, 0, b - 1)
    return (
        (clip(top_p), np.clip(np.broadcast_to(j, (w, w)), 0, b - 1), top_valid),
        (clip(bot_p_d), clip(q), bot_from_d),
        (clip(bot_p_db), clip(q), bot_from_db),
    )


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

    (lb_r, lb_d), (d_r, d_d), (db_r, db_d) = _shear_indices(b)
    reb = _strip_rebuild_indices(b)
    lb_r = jnp.asarray(lb_r); lb_d = jnp.asarray(lb_d)
    d_r = jnp.asarray(d_r); d_d = jnp.asarray(d_d)
    db_r = jnp.asarray(db_r); db_d = jnp.asarray(db_d)
    reb = [(jnp.asarray(p), jnp.asarray(qq), jnp.asarray(m)) for p, qq, m in reb]

    t3 = 3 * ((t_total + 2) // 3)
    vt = jnp.zeros((t3, s_slots, b), dtype)
    taut = jnp.zeros((t3, s_slots), dtype)

    svec = jnp.arange(s_slots)

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

        lb = strip[:, lb_r, lb_d]            # (S, b, b)
        d_low = jnp.where((jnp.arange(b)[:, None] >= jnp.arange(b)[None, :])[None],
                          strip[:, d_r, d_d], 0.0)
        dmat = d_low + jnp.swapaxes(d_low, 1, 2) - (
            d_low * jnp.eye(b, dtype=dtype)[None]
        )
        db = strip[:, db_r, db_d]

        x = jnp.where((k_s == 0)[:, None], lb[:, :, b - 1], lb[:, :, 0])
        v, tau, beta = _larfg_vec(x)
        tau = jnp.where(active, tau, 0.0)

        # left-mult rows: Lb -= tau v (v^T Lb)
        vl = jnp.einsum("sp,spq->sq", v, lb)
        lb = lb - tau[:, None, None] * v[:, :, None] * vl[:, None, :]
        # two-sided on the diagonal block
        y = tau[:, None] * jnp.einsum("spq,sq->sp", dmat, v)
        yv = jnp.einsum("sp,sp->s", y, v)
        wvec = y - 0.5 * tau[:, None] * yv[:, None] * v
        dmat = dmat - v[:, :, None] * wvec[:, None, :] - wvec[:, :, None] * v[:, None, :]
        # right-mult cols: Db -= tau (Db v) v^T
        dbv = jnp.einsum("spq,sq->sp", db, v)
        db = db - tau[:, None, None] * dbv[:, :, None] * v[:, None, :]

        # rebuild the strip from the updated blocks
        (tp, tq, tm), (dp, dq, dm), (bp, bq, bm) = reb
        new_top = lb[:, tp, tq]
        new_bot = jnp.where(dm[None], dmat[:, dp, dq], 0.0) + jnp.where(
            bm[None], db[:, bp, bq], 0.0
        )
        keep = ~(tm | dm | bm)
        strip_new = (
            jnp.where(tm[None], new_top, 0.0)
            + new_bot
            + jnp.where(keep[None], strip, 0.0)
        )
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


@highest_precision
@functools.partial(jax.jit, static_argnames=("b", "g", "n"))
def apply_q2(vt, taut, y, n, b, g=None):
    """y <- Q2 y where Q2 is the accumulated bulge-chase transform
    (band = Q2^T A_band Q2). y is (n, m); reflectors from bulge_chase.

    Blocked replay: groups of g sweeps (descending), windows per chase
    position (ascending), each window one compact-WY application."""
    if g is None:
        g = b
    t3, s_slots, _ = vt.shape
    m = y.shape[1]
    dtype = y.dtype
    kmax = max((n - 3) // b, 0)
    l_win = b + g - 1
    n_groups = -(-max(n - 2, 1) // g)

    # zero-pad the timestep axis: edge windows index past the last
    # timestep and lax.dynamic_slice would CLAMP the start (silently
    # reading reflectors of other sweeps) -- padding keeps them no-ops.
    pad_t = g + kmax // 3 + 3
    vt4 = jnp.concatenate(
        [vt.reshape(t3 // 3, 3, s_slots, b),
         jnp.zeros((pad_t, 3, s_slots, b), dtype)], axis=0
    )
    taut3 = jnp.concatenate(
        [taut.reshape(t3 // 3, 3, s_slots),
         jnp.zeros((pad_t, 3, s_slots), dtype)], axis=0
    )

    # pad y rows so every window slice is in-bounds
    y_p = jnp.zeros((n + l_win + 3 * b, m), dtype)
    y_p = lax.dynamic_update_slice(y_p, y, (0, 0))

    srange = jnp.arange(g)
    # static shear embedding V (g, b) -> Vw (L, g): Vw[s+i, s] = V[s, i]
    rw = np.arange(b + g - 1)[:, None]
    sw = np.arange(g)[None, :]
    emb_i = np.clip(rw - sw, 0, b - 1)
    emb_m = (rw >= sw) & (rw - sw < b)
    emb_i = jnp.asarray(emb_i)
    emb_m = jnp.asarray(emb_m)
    eye_g = jnp.eye(g, dtype=dtype)

    def window(idx, y_p):
        j = n_groups - 1 - idx // (kmax + 1)
        k = idx % (kmax + 1)
        v0 = j * g
        # reflector (v0+s, k) lives at vt[3(v0+s)+k, k//3]
        #   = vt4[v0+s+k//3, k%3, k//3]
        vblk = lax.dynamic_slice(
            vt4, (v0 + k // 3, k % 3, k // 3, 0), (g, 1, 1, b)
        ).reshape(g, b)
        taus = lax.dynamic_slice(
            taut3, (v0 + k // 3, k % 3, k // 3), (g, 1, 1)
        ).reshape(g)
        tsafe = jnp.where(taus == 0, 1.0, taus)
        vw = jnp.where(emb_m, vblk[srange[None, :], emb_i], 0.0)  # (L, g)
        vw = vw * (taus != 0)[None, :]

        base = v0 + 1 + k * b
        yw = lax.dynamic_slice(y_p, (base, 0), (l_win, m))
        tinv = jnp.triu(vw.T @ vw, 1) + jnp.diag(1.0 / tsafe)
        u = vw.T @ yw
        x = jax.scipy.linalg.solve_triangular(tinv, u, lower=False)
        yw = yw - vw @ x
        return lax.dynamic_update_slice(y_p, yw, (base, 0))

    with trace_range("apply_q2"):
        y_p = lax.fori_loop(0, n_groups * (kmax + 1), window, y_p)
    return lax.dynamic_slice(y_p, (0, 0), (n, m))
