"""Planar blocked WY back-transformation (zunmtr without complex dtypes).

Applies Q = H(n-2)...H(0) from hetrd_planar to a planar matrix:
(cr, ci) <- Q @ (cr, ci). Mirrors ops/unmtr.py with every complex product
expanded to real MXU products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _block_v_planar(ar, ai, r0, kb, nref):
    n = ar.shape[0]
    cr = lax.dynamic_slice(ar, (0, r0 + 1), (n, kb))
    ci = lax.dynamic_slice(ai, (0, r0 + 1), (n, kb))
    rows = lax.broadcasted_iota(jnp.int32, (n, kb), 0)
    refl = lax.broadcasted_iota(jnp.int32, (n, kb), 1) + r0
    valid = refl < nref
    keep = (rows < refl) & valid
    vr = jnp.where(keep, cr, 0.0)
    vi = jnp.where(keep, ci, 0.0)
    one = (rows == refl) & valid
    vr = jnp.where(one, 1.0, vr)
    vi = jnp.where(one, 0.0, vi)
    return vr, vi


def _larft_left_planar(vr, vi, tr, ti):
    """T rows via the left-product recurrence, planar complex."""
    kb = vr.shape[1]
    # m = V^H V
    m_r = vr.T @ vr + vi.T @ vi
    m_i = vr.T @ vi - vi.T @ vr
    cols = lax.broadcasted_iota(jnp.int32, (1, kb), 1)[0]

    def body(j, t):
        t_r, t_i = t
        mrow_r = jnp.where(cols < j, m_r[j], 0.0)
        mrow_i = jnp.where(cols < j, m_i[j], 0.0)
        # row = -tau_j * (mrow @ T)
        pr = mrow_r @ t_r - mrow_i @ t_i
        pi = mrow_r @ t_i + mrow_i @ t_r
        row_r = -(tr[j] * pr - ti[j] * pi)
        row_i = -(tr[j] * pi + ti[j] * pr)
        row_r = jnp.where(cols == j, tr[j], row_r)
        row_i = jnp.where(cols == j, ti[j], row_i)
        t_r = lax.dynamic_update_slice(t_r, row_r[None, :], (j, 0))
        t_i = lax.dynamic_update_slice(t_i, row_i[None, :], (j, 0))
        return t_r, t_i

    t0 = jnp.zeros((kb, kb), vr.dtype)
    return lax.fori_loop(0, kb, body, (t0, t0))


def _larft_left_batched(vr, vi, tr, ti):
    """T factors for ALL reflector blocks at once: the rows of each T are
    a sequential recurrence, but the blocks are mutually independent, so
    one fori over kb rows builds every block's T simultaneously
    (sequential depth kb instead of kb * nblocks)."""
    nb_, _, kb = vr.shape[0], vr.shape[1], vr.shape[2]
    dt = vr.dtype
    m_r = jnp.einsum("bji,bjk->bik", vr, vr) + jnp.einsum("bji,bjk->bik", vi, vi)
    m_i = jnp.einsum("bji,bjk->bik", vr, vi) - jnp.einsum("bji,bjk->bik", vi, vr)
    cols = lax.broadcasted_iota(jnp.int32, (1, kb), 1)[0]

    def body(j, t):
        t_r, t_i = t
        mrow_r = jnp.where(cols[None, :] < j, m_r[:, j, :], 0.0)
        mrow_i = jnp.where(cols[None, :] < j, m_i[:, j, :], 0.0)
        pr = jnp.einsum("bk,bkj->bj", mrow_r, t_r) - jnp.einsum("bk,bkj->bj", mrow_i, t_i)
        pi = jnp.einsum("bk,bkj->bj", mrow_r, t_i) + jnp.einsum("bk,bkj->bj", mrow_i, t_r)
        tj_r = tr[:, j][:, None]
        tj_i = ti[:, j][:, None]
        row_r = -(tj_r * pr - tj_i * pi)
        row_i = -(tj_r * pi + tj_i * pr)
        row_r = jnp.where(cols[None, :] == j, tj_r, row_r)
        row_i = jnp.where(cols[None, :] == j, tj_i, row_i)
        t_r = lax.dynamic_update_slice(t_r, row_r[:, None, :], (0, j, 0))
        t_i = lax.dynamic_update_slice(t_i, row_i[:, None, :], (0, j, 0))
        return t_r, t_i

    t0 = jnp.zeros((nb_, kb, kb), dt)
    return lax.fori_loop(0, kb, body, (t0, t0))


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb",))
def unmtr_planar(ar, ai, taur, taui, cr, ci, nb=128):
    """(cr, ci) <- Q @ (cr, ci) with Q from hetrd_planar."""
    n = ar.shape[0]
    nref = n - 1
    if nref <= 0:
        return cr, ci
    nblocks = -(-nref // nb)
    pad = nblocks * nb - nref
    tr = jnp.concatenate([taur, jnp.zeros((pad,), taur.dtype)])
    ti = jnp.concatenate([taui, jnp.zeros((pad,), taui.dtype)])
    ar_e = jnp.concatenate([ar, jnp.zeros((n, nblocks * nb + 1 - n), ar.dtype)], 1)
    ai_e = jnp.concatenate([ai, jnp.zeros((n, nblocks * nb + 1 - n), ai.dtype)], 1)

    with trace_range("unmtr_planar"):
        # extract every reflector block and build every T factor batched
        vs = [_block_v_planar(ar_e, ai_e, k * nb, nb, nref) for k in range(nblocks)]
        vr_all = jnp.stack([v[0] for v in vs])
        vi_all = jnp.stack([v[1] for v in vs])
        t_r_all, t_i_all = _larft_left_batched(
            vr_all, vi_all, tr.reshape(nblocks, nb), ti.reshape(nblocks, nb)
        )

        def body(i, c):
            cr, ci = c
            vr = lax.dynamic_slice(vr_all, (i, 0, 0), (1, n, nb))[0]
            vi = lax.dynamic_slice(vi_all, (i, 0, 0), (1, n, nb))[0]
            t_r = lax.dynamic_slice(t_r_all, (i, 0, 0), (1, nb, nb))[0]
            t_i = lax.dynamic_slice(t_i_all, (i, 0, 0), (1, nb, nb))[0]
            # p = V^H C ; C -= V (T p)
            p_r = vr.T @ cr + vi.T @ ci
            p_i = vr.T @ ci - vi.T @ cr
            q_r = t_r @ p_r - t_i @ p_i
            q_i = t_r @ p_i + t_i @ p_r
            cr = cr - (vr @ q_r - vi @ q_i)
            ci = ci - (vr @ q_i + vi @ q_r)
            return cr, ci

        return lax.fori_loop(0, nblocks, body, (cr, ci))
