"""Batched cyclic Jacobi eigensolver for small symmetric blocks.

Used as the divide-and-conquer leaf solver (ops/stedc.py) instead of
XLA's QDWH-based ``eigh``: Jacobi needs only +,*,/,sqrt -- exactly the
operations that are accurate under the target platform's double-word
fp64 emulation (its transcendentals and some composite ops are not) --
and is MXU-friendly: each round applies m/2 disjoint plane rotations as
one batched gemm pair.

The rotation schedule is a static round-robin tournament (m-1 rounds of
m/2 disjoint pairs), so the whole solve is one fori_loop over
sweeps*rounds with gather/scatter-built rotation matrices -- no
data-dependent control flow.

Convergence: cyclic Jacobi is quadratically convergent; for m <= 64,
`sweeps=10` reaches working accuracy with large margin (validated in
tests/test_jacobi.py against numpy, including clustered spectra).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision


def _round_robin(m):
    """(rounds, m/2) index arrays p, q with p < q, disjoint within a round."""
    players = list(range(m))
    rounds_p, rounds_q = [], []
    for _ in range(m - 1):
        ps, qs = [], []
        for i in range(m // 2):
            x, y = players[i], players[m - 1 - i]
            ps.append(min(x, y))
            qs.append(max(x, y))
        rounds_p.append(ps)
        rounds_q.append(qs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.array(rounds_p, np.int32), np.array(rounds_q, np.int32)


@highest_precision
@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(a, sweeps=10):
    """Eigendecomposition of a batch of small symmetric matrices.

    a: (..., m, m) real symmetric, m even. Returns (w ascending, v).
    """
    batch_shape = a.shape[:-2]
    m = a.shape[-1]
    if m % 2 != 0:
        raise ValueError(f"jacobi_eigh requires even m, got {m}")
    dt = a.dtype
    a = a.reshape((-1, m, m))
    nb = a.shape[0]
    p_np, q_np = _round_robin(m)
    p_all = jnp.asarray(p_np)
    q_all = jnp.asarray(q_np)
    rounds = m - 1

    eye = jnp.broadcast_to(jnp.eye(m, dtype=dt), (nb, m, m))

    def round_step(r, carry):
        a, v = carry
        p = p_all[r % rounds]
        q = q_all[r % rounds]
        app = a[:, p, p]
        aqq = a[:, q, q]
        apq = a[:, p, q]
        # Golub & Van Loan 8.4.1 rotation that zeroes a[p,q]. Skip
        # rotations whose off-diagonal is negligible RELATIVE to the
        # diagonals: this is the classical convergence test, and it
        # bounds |tau| <= 1/eps so the division can never overflow
        # (the platform's double-word f64 turns inf arithmetic into NaN).
        eps = jnp.finfo(dt).eps
        nz = jnp.abs(apq) > eps * (jnp.abs(app) + jnp.abs(aqq)) / 2
        safe_apq = jnp.where(nz, apq, jnp.ones((), dt))
        tau = (aqq - app) / (2.0 * safe_apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0, jnp.ones((), dt), t)  # sign(0)=0 guard
        t = jnp.where(nz, t, jnp.zeros((), dt))
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        g = eye
        bidx = jnp.arange(nb)[:, None]
        g = g.at[bidx, p[None, :], p[None, :]].set(c)
        g = g.at[bidx, q[None, :], q[None, :]].set(c)
        g = g.at[bidx, p[None, :], q[None, :]].set(s)
        g = g.at[bidx, q[None, :], p[None, :]].set(-s)
        # A <- G^T A G, V <- V G : two batched MXU gemms (+ one for V)
        a = jnp.einsum("bij,bjk,bkl->bil", g.transpose(0, 2, 1), a, g)
        a = (a + a.transpose(0, 2, 1)) / 2
        v = v @ g
        return a, v

    a, v = lax.fori_loop(0, sweeps * rounds, round_step, (a, eye))
    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    return w.reshape(batch_shape + (m,)), v.reshape(batch_shape + (m, m))


@highest_precision
@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh_planar(ar, ai, sweeps=12):
    """Eigendecomposition of small HERMITIAN matrices in planar (re, im)
    arithmetic (no complex dtypes -- the target TPU stack has none).

    ar, ai: (m, m) with A = ar + i*ai Hermitian, m even. Returns
    (w ascending (m,), (vr, vi)) with A V = V diag(w), V unitary.

    Complex cyclic Jacobi: the (p, q) rotation is the unitary
    G[p,p]=G[q,q]=c, G[p,q]=s*e^{i phi}, G[q,p]=-s*e^{-i phi} with
    phi = arg(a_pq) and theta from the real Golub/Van Loan formula on
    (a_pp, a_qq, |a_pq|) -- degenerate eigenvalues need no special
    handling, which is why this backs the structure-preserving
    embedding extraction (ops/complex_embed.py)."""
    m = ar.shape[-1]
    if m % 2 != 0:
        raise ValueError(f"jacobi_eigh_planar requires even m, got {m}")
    dt = ar.dtype
    p_np, q_np = _round_robin(m)
    p_all = jnp.asarray(p_np)
    q_all = jnp.asarray(q_np)
    rounds = m - 1
    eye = jnp.eye(m, dtype=dt)
    zer = jnp.zeros((m, m), dt)

    def round_step(r, carry):
        ar, ai, vr, vi = carry
        p = p_all[r % rounds]
        q = q_all[r % rounds]
        app = ar[p, p]  # diagonals real (Hermitian)
        aqq = ar[q, q]
        pqr = ar[p, q]
        pqi = ai[p, q]
        mag = jnp.sqrt(pqr * pqr + pqi * pqi)
        eps = jnp.finfo(dt).eps
        nz = mag > eps * (jnp.abs(app) + jnp.abs(aqq)) / 2
        safe_mag = jnp.where(nz, mag, jnp.ones((), dt))
        cph = jnp.where(nz, pqr / safe_mag, jnp.ones((), dt))
        sph = jnp.where(nz, pqi / safe_mag, jnp.zeros((), dt))
        tau = (aqq - app) / (2.0 * safe_mag)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0, jnp.ones((), dt), t)
        t = jnp.where(nz, t, jnp.zeros((), dt))
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        gr = eye.at[p, p].set(c).at[q, q].set(c)
        gr = gr.at[p, q].set(s * cph).at[q, p].set(-s * cph)
        gi = zer.at[p, q].set(s * sph).at[q, p].set(s * sph)
        # A <- G^H A G, V <- V G  (planar products)
        tr = ar @ gr - ai @ gi
        ti = ar @ gi + ai @ gr
        nar = gr.T @ tr + gi.T @ ti
        nai = gr.T @ ti - gi.T @ tr
        ar = (nar + nar.T) / 2
        ai = (nai - nai.T) / 2
        nvr = vr @ gr - vi @ gi
        nvi = vr @ gi + vi @ gr
        return ar, ai, nvr, nvi

    ar, ai, vr, vi = lax.fori_loop(
        0, sweeps * rounds, round_step, (ar, ai, eye, zer)
    )
    w = jnp.diagonal(ar)
    order = jnp.argsort(w)
    return w[order], (vr[:, order], vi[:, order])
