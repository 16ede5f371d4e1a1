"""Successive band reduction, stage 1: dense symmetric -> banded.

Round-2 foundation (ROADMAP item 2, docs/DESIGN_NOTES_R2.md): the
one-stage tridiagonalization's bottleneck is an O(n^2)-traffic matvec
serialized once per column (RESULTS.md). Reducing first to a band of
width ``b`` costs only O(n b) traffic per sequential column step -- all
the O(n^3) work moves into per-panel two-sided WY gemm updates on the
MXU. Stage 2 (band -> tridiagonal bulge chasing) is future work; until
it lands this op is exercised by tests only.

Convention (matches ops/sytrd.py): UPLO='U' processed from the last
column backward, so the active submatrix is always the leading
principal block (static prefix shapes). Panel columns are eliminated
with QL-style Householder reflectors: for panel [pend-b, pend), the
reflector block zeroes rows [0, pend-2b) of those columns, leaving a
b-band coupling block. Two-sided update via compact WY.

Returns (ab, q) with ``ab`` the banded matrix (full storage, entries
outside the band zero) and ``q`` the accumulated orthogonal transform,
A = Q AB Q^H. (Accumulating dense Q costs an extra O(n^3) of gemms; the
round-2 integration will instead apply the WY blocks directly to the
selected eigenvectors.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _ql_panel(p, rows_below):
    """QL factorization of the (m x b) panel ``p``: b reflectors, each
    zeroing rows [0, k_top) of its column, pivot at row k_top-ish.

    Column j of the panel (processed from the LAST column backward)
    eliminates rows [0, rows_below + j) ... here simplified: column j
    (j = b-1 .. 0) zeroes rows [0, top_j) where top_j = rows_below + j,
    pivot at row top_j. Returns (v (m x b), tau (b,), r_panel (m x b))
    with v[:, j] the reflector (1 at its pivot row, zeros below pivot+1
    ... above in QL orientation).
    """
    m, b = p.shape
    dt = p.dtype
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)

    def col_step(k, carry):
        p, v_p, tau = carry
        j = b - 1 - k  # column processed (from last to first)
        top = rows_below + j  # pivot row; rows [0, top) eliminated
        col = lax.dynamic_slice(p, (0, j), (m, 1))[:, 0]
        mask_above = rows < top
        x = jnp.where(mask_above, col, 0.0)
        xnormsq = jnp.sum(x * x)
        alpha = col[top]
        norm = jnp.sqrt(alpha * alpha + xnormsq)
        beta = jnp.where(alpha >= 0, -norm, norm)
        trivial = xnormsq == 0
        safe_b = jnp.where(trivial, 1.0, beta)
        tau_k = jnp.where(trivial, 0.0, (beta - alpha) / safe_b)
        denom = jnp.where(trivial, 1.0, alpha - beta)
        v = jnp.where(mask_above, x / denom, 0.0)
        v = jnp.where((rows == top) & ~trivial, 1.0, v)
        # apply H = I - tau v v^T to the remaining panel columns (< j)
        vp = v @ p  # (b,)
        upd = tau_k * v[:, None] * vp[None, :]
        colmask = (lax.broadcasted_iota(jnp.int32, (1, b), 1)[0] < j)[None, :]
        p = p - jnp.where(colmask, upd, 0.0)
        # store the eliminated column: beta at pivot, zeros above
        newcol = jnp.where(mask_above, 0.0, col)
        newcol = jnp.where((rows == top) & ~trivial, beta, newcol)
        p = lax.dynamic_update_slice(p, newcol[:, None], (0, j))
        v_p = lax.dynamic_update_slice(v_p, v[:, None], (0, j))
        tau = lax.dynamic_update_slice(tau, tau_k[None], (j,))
        return p, v_p, tau

    v0 = jnp.zeros((m, b), dt)
    tau0 = jnp.zeros((b,), dt)
    return lax.fori_loop(0, b, col_step, (p, v0, tau0))


def _larft_forward(v, tau):
    """T with H(0) H(1) ... H(b-1) = I - V T V^T (forward product order:
    appending H_new on the RIGHT adds column  -tau T (V^T v_new)."""
    b = v.shape[1]
    dt = v.dtype
    m = v.T @ v
    rows = lax.broadcasted_iota(jnp.int32, (b, 1), 0).squeeze(-1)

    def body(j, t):
        mcol = jnp.where(rows < j, m[:, j], 0.0)
        colv = -tau[j] * (t @ mcol)
        colv = jnp.where(rows == j, tau[j], colv)
        return lax.dynamic_update_slice(t, colv[:, None], (0, j))

    return lax.fori_loop(0, b, body, jnp.zeros((b, b), dt))


@highest_precision
@functools.partial(jax.jit, static_argnames=("band",))
def sbrd(a, band=32):
    """Reduce symmetric ``a`` to a symmetric band matrix of half-width
    ``band``. Returns (ab, q), a = q @ ab @ q.T. Requires n % band == 0
    and n >= 3*band."""
    n = a.shape[0]
    b = band
    if n % b != 0 or n < 3 * b:
        raise ValueError(f"sbrd requires n % band == 0 and n >= 3*band, got {n}, {b}")
    a = (a + a.T) / 2
    q = jnp.eye(n, dtype=a.dtype)

    with trace_range("sbrd"):
        # panels from the last column block; panel [pend-b, pend) couples
        # to rows [0, pend-b); eliminate rows [0, pend-2b) -- the last
        # panel (pend = 2b) eliminates a ragged triangle (top_j = j)
        for pend in range(n, b, -b):
            mrows = pend - b  # rows 0..mrows of the panel block
            panel = a[:mrows, pend - b : pend]
            pfac, v, tau = _ql_panel(panel, mrows - b)
            t = _larft_forward(v, tau)
            # two-sided update of the leading block: A <- N A N^T with
            # N = H_0 H_1 ... H_{b-1} = I - V T V^T (the order the panel
            # loop applied them), via the symmetric W-form:
            #   Y = A V T^T,  S = T (V^T Y)  (symmetric),
            #   W = Y - 1/2 V S,  A <- A - V W^T - W V^T
            at = a[:mrows, :mrows]
            y = at @ (v @ t.T)
            s = t @ (v.T @ y)
            w = y - 0.5 * (v @ s)
            at = at - v @ w.T - w @ v.T
            a = a.at[:mrows, :mrows].set((at + at.T) / 2)
            a = a.at[:mrows, pend - b : pend].set(pfac)
            a = a.at[pend - b : pend, :mrows].set(pfac.T)
            # accumulate Q <- Q N^T (dense for now; round-2 applies the
            # WY blocks directly to the selected eigenvectors instead)
            qcols = q[:, :mrows]
            q = q.at[:, :mrows].set(qcols - ((qcols @ v) @ t.T) @ v.T)
        return a, q
