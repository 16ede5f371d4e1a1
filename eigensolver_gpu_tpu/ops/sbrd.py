"""Successive band reduction, stage 1: dense symmetric -> banded.

First stage of the two-stage tridiagonalization (stage 2 = bulge chasing
in ops/sb2st.py). Re-designs the role of the reference's one-stage
blocked Householder loop (dsytrd_gpu.F90:61-163): the one-stage scheme
pays an O(n^2)-traffic matvec serialized once per column; reducing first
to a band of width ``b`` moves all O(n^3) work into per-panel two-sided
compact-WY gemm updates on the MXU, leaving only O(n b) traffic per
sequential column step.

Convention (matches ops/sytrd.py): UPLO='U' processed from the last
column backward, so the active submatrix is always the leading principal
block. Panel columns are eliminated with QL-style Householder
reflectors; the two-sided update uses the symmetric W-form. The loop is
a bucketed `lax.fori_loop` (one traced panel body per size bucket, like
ops/sytrd.py), so compile time is bounded regardless of n.

Returns the banded matrix plus the per-panel (V, T) factors;
``apply_q1`` replays them onto eigenvector columns (Z = Q1 * y) as
3 gemms per panel -- the dense Q of the round-1 version is gone.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# escape hatch if a toolchain regresses the fused QL-panel kernel
_NO_QL_KERNEL = bool(os.environ.get("EIGSOLVE_NO_QL_KERNEL"))

from eigensolver_gpu_tpu.utils.kernel_guard import kernel_ok
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _ql_panel(p, rows_below):
    """QL factorization of the (m x b) panel ``p`` (rows at/after the
    pivot band are preserved untouched): b reflectors, column j
    (processed last to first) zeroing rows [0, rows_below + j) with its
    pivot at row rows_below + j. Returns (r_panel, v (m x b), tau (b,))."""
    m, b = p.shape
    dt = p.dtype
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)

    def col_step(k, carry):
        p, v_p, tau = carry
        j = b - 1 - k
        top = rows_below + j
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
        vp = v @ p
        upd = tau_k * v[:, None] * vp[None, :]
        colmask = (lax.broadcasted_iota(jnp.int32, (1, b), 1)[0] < j)[None, :]
        p = p - jnp.where(colmask, upd, 0.0)
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
    """T with H(0) H(1) ... H(b-1) = I - V T V^T (forward product order)."""
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
@functools.partial(jax.jit, static_argnames=("band", "bucket", "panel_kernel"))
def sbrd(a, band=32, bucket=512, panel_kernel=True):
    """Reduce symmetric ``a`` to a symmetric band matrix of half-width
    ``band``. Returns (ab, vs, ts): the banded matrix (full storage,
    entries outside the band zero) and the per-panel WY factors with
    a = Q1 ab Q1^T, Q1 = apply_q1(vs, ts, I). Requires n % band == 0 and
    n >= 3*band.

    panel_kernel: allow the fused Mosaic QL-panel kernel
    (ops/ql_panel_pallas.py) on fp32 TPU runs with compatible shapes --
    one dispatch per panel instead of ~12 XLA ops per column.  Callers
    running under a mesh pass False (a Pallas call is not SPMD-
    partitionable; the panel loops stay XLA there)."""
    n = a.shape[0]
    b = band
    if n % b != 0 or n < 3 * b:
        raise ValueError(f"sbrd requires n % band == 0 and n >= 3*band, got {n}, {b}")
    dt = a.dtype
    a = (a + a.T) / 2
    npanels_total = n // b - 1  # pend = n, n-b, ..., 2b
    vs = jnp.zeros((npanels_total, n, b), dt)
    ts = jnp.zeros((npanels_total, b, b), dt)

    with trace_range("sbrd"):
        # bucket by the panel's pend (static slice bound per bucket)
        bounds = []
        hi = n
        while hi > b:
            lo = max(hi - bucket, b)
            bounds.append((hi, lo))
            hi = lo
        pidx_start = 0
        for hi, lo in bounds:
            mbound = hi  # pend <= hi in this bucket
            npan = (hi - lo) // b
            a_mb = a[:mbound, :mbound]
            rows = lax.broadcasted_iota(jnp.int32, (mbound, 1), 0).squeeze(-1)
            use_kernel = (
                panel_kernel
                and dt == jnp.float32
                and mbound % 128 == 0
                and b % 8 == 0
                and not _NO_QL_KERNEL
                and kernel_ok("ql")  # backend==tpu + toolchain probe
            )

            def panel_step(p, carry, mbound=mbound, hi=hi, rows=rows,
                           pidx_start=pidx_start, use_kernel=use_kernel):
                a_mb, vs, ts = carry
                pend = hi - p * b
                mrows = pend - b
                panel = lax.dynamic_slice(a_mb, (0, pend - b), (mbound, b))
                if use_kernel:
                    from eigensolver_gpu_tpu.ops.ql_panel_pallas import (
                        ql_panel_pallas,
                    )

                    pfac, v, tau, t = ql_panel_pallas(panel, mrows - b)
                    v = jnp.where((rows < mrows)[:, None], v, 0.0)
                else:
                    pfac, v, tau = _ql_panel(panel, mrows - b)
                    # zero reflector rows at/after mrows (the QL masks
                    # keep them zero already except the pivot row
                    # convention)
                    v = jnp.where((rows < mrows)[:, None], v, 0.0)
                    t = _larft_forward(v, tau)
                # two-sided A <- N A N^T, N = I - V T V^T, via the
                # symmetric W-form: Y = A V T^T, S = T (V^T Y),
                # W = Y - 1/2 V S, A <- A - V W^T - W V^T
                y = a_mb @ (v @ t.T)
                s = t @ (v.T @ y)
                w = y - 0.5 * (v @ s)
                w = jnp.where((rows < mrows)[:, None], w, 0.0)
                a_mb = a_mb - v @ w.T - w @ v.T
                # write the factored panel and its transpose
                a_mb = lax.dynamic_update_slice(a_mb, pfac, (0, pend - b))
                pf_t = jnp.swapaxes(pfac, 0, 1)
                a_mb = lax.dynamic_update_slice(a_mb, pf_t, (pend - b, 0))
                vpad = jnp.zeros((n, b), dt)
                vpad = lax.dynamic_update_slice(vpad, v, (0, 0))
                vs = lax.dynamic_update_slice(
                    vs, vpad[None], (pidx_start + p, 0, 0)
                )
                ts = lax.dynamic_update_slice(ts, t[None], (pidx_start + p, 0, 0))
                return a_mb, vs, ts

            a_mb, vs, ts = lax.fori_loop(0, npan, panel_step, (a_mb, vs, ts))
            a = lax.dynamic_update_slice(a, a_mb, (0, 0))
            pidx_start += npan
        return a, vs, ts


@highest_precision
@functools.partial(jax.jit, static_argnames=("group",))
def apply_q1(vs, ts, y, group=4):
    """y <- Q1 y where a = Q1 ab Q1^T from sbrd: panels applied in
    reverse processing order, y -= V S (V^T y) each (S = T^T).

    group: consecutive panels are pre-aggregated into one (n, group*b)
    compact-WY block via the standard dlarft composition
    (I - V1 S1 V1^T)(I - V2 S2 V2^T) = I - [V1 V2] Sc [V1 V2]^T,
    Sc = [[S1, -S1 (V1^T V2) S2], [0, S2]] -- the per-panel b=32 gemms
    fill only a quarter of the MXU's 128 systolic rows; group=4 makes
    every replay gemm a full tile and quarters the sequential loop
    (measured 331 -> 52 ms at n=8192, m=2048). Aggregation itself is
    O(n^2 b) -- noise next to the O(n^2 m) replay."""
    npanels, n, b = vs.shape

    with trace_range("apply_q1"):
        g = max(1, min(group, npanels))
        ng = npanels // g
        rem = npanels - ng * g

        if g > 1 and ng > 0:
            v4 = vs[rem:].reshape(ng, g, n, b)
            s4 = jnp.swapaxes(ts[rem:], 1, 2).reshape(ng, g, b, b)
            # fold panels left-to-right (apply order is right-to-left,
            # matching the per-panel loop's descending p)
            v_acc = v4[:, 0]
            s_acc = s4[:, 0]
            for j in range(1, g):
                vj = v4[:, j]
                sj = s4[:, j]
                m_blk = jnp.einsum("gnb,gnc->gbc", v_acc, vj)
                cross = -jnp.einsum(
                    "gab,gbc,gcd->gad", s_acc, m_blk, sj
                )
                kb = s_acc.shape[1]
                top = jnp.concatenate([s_acc, cross], axis=2)
                bot = jnp.concatenate(
                    [jnp.zeros((ng, b, kb), s_acc.dtype), sj], axis=2
                )
                s_acc = jnp.concatenate([top, bot], axis=1)
                v_acc = jnp.concatenate([v_acc, vj], axis=2)

            def gbody(i, y):
                q = ng - 1 - i
                vq = v_acc[q]
                sq = s_acc[q]
                return y - vq @ (sq @ (vq.T @ y))

            y = lax.fori_loop(0, ng, gbody, y)

        def body(i, y):
            p = rem - 1 - i
            v = vs[p]
            t = ts[p]
            return y - v @ (t.T @ (v.T @ y))

        return lax.fori_loop(0, rem, body, y)
