"""Fused Mosaic QL-panel kernel for the SBR stage-1 reduction (fp32).

Re-designs the panel step of the successive band reduction
(ops/sbrd.py `_ql_panel` + `_larft_forward`; reference role:
dsytrd_gpu.F90:61-163's panel factorization chain).  The XLA compiled
loop pays ~12 op dispatches per column on tiny (m, b) operands -- b
sequential columns per panel, n/b panels, so the panel loops are the
dominant non-gemm cost of `sbrd` (the two-sided gemm updates are
~25 ms of the measured 108 ms at n=4096; the rest is the loops).

Unlike the latrd panel (ops/latrd_pallas.py, measured gemv-bound at
~140 GB/s because every column must stream the FULL trailing matrix),
the QL panel touches only its own (m, b) strip, which fits VMEM and is
reused across all b column steps -- the kernel is VPU/overhead-bound,
exactly the regime where fusing the loop into ONE dispatch pays.

Layout: the panel is processed TRANSPOSED, (b, m) -- column j becomes
sublane row j (dynamic sublane slicing is legal in Mosaic; dynamic
LANE indexing is not), and every per-column reduction (x norm, pivot
extract, v^T P) rides full 128-lane rows with the latrd lane-fold
trick.  The T factor (forward larft of the panel's reflectors) is
built in the same kernel invocation from the VMEM-resident V -- one
in-kernel f32 MXU gram (V V^T over lanes) plus a b-step scalar
recurrence -- eliminating the second XLA b-step loop per panel.

fp32 only (the fp64 two-stage path keeps the XLA loops; Mosaic has no
fp64 in-kernel dot for the gram).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ql_panel_kernel(b, m, *refs):
    rb_ref, pt_in, pft_ref, vt_ref, scal_ref = refs
    rb = rb_ref[0, 0]
    lanes = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    lane_b = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    rows_b = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    f1 = jnp.float32(1.0)

    # lane-fold reduction: (r, m) -> (r, 128) with vreg adds, then one
    # narrow cross-lane reduce (cross-lane shuffles are the expensive
    # part on the VPU -- see ops/latrd_pallas.py)
    nf = m // 128

    def fold(x):
        r = x.shape[0]
        return jnp.sum(x.reshape(r, nf, 128), axis=1)  # (r, 128)

    pft_ref[:, :] = pt_in[:, :]
    vt_ref[:, :] = jnp.zeros_like(vt_ref)
    scal_ref[:, :] = jnp.zeros_like(scal_ref)

    def col_step(k, _):
        j = b - 1 - k
        top = rb + j
        col = pft_ref[pl.ds(j, 1), :]  # (1, m)
        mask_above = lanes < top
        x = jnp.where(mask_above, col, 0.0)
        pivmask = (lanes == top).astype(jnp.float32)
        folded = fold(jnp.concatenate([x * x, col * pivmask], axis=0))
        xnormsq = jnp.sum(folded[0:1, :])
        alpha = jnp.sum(folded[1:2, :])
        norm = jnp.sqrt(alpha * alpha + xnormsq)
        beta = jnp.where(alpha >= 0, -norm, norm)
        trivial = xnormsq == 0.0
        safe_b = jnp.where(trivial, f1, beta)
        tau_k = jnp.where(trivial, 0.0, (beta - alpha) / safe_b)
        denom = jnp.where(trivial, f1, alpha - beta)
        v = jnp.where(mask_above, x / denom, 0.0)
        v = v + jnp.where(trivial, 0.0, f1) * pivmask  # v[top] = 1
        # vp = v^T P -> (b, 1): lane-reduce of each panel row times v
        vp = jnp.sum(fold(pft_ref[:, :] * v), axis=1, keepdims=True)
        colmask = (rows_b < j).astype(jnp.float32)
        pft_ref[:, :] -= (tau_k * colmask * vp) * v
        newcol = jnp.where(mask_above, 0.0, col)
        newcol = newcol * (1.0 - pivmask) + jnp.where(
            trivial, newcol * pivmask, beta * pivmask
        )
        pft_ref[pl.ds(j, 1), :] = newcol
        vt_ref[pl.ds(j, 1), :] = v
        scal_ref[0:1, :] += tau_k * (lane_b == j).astype(jnp.float32)
        return jnp.int32(0)

    # int32 loop bounds: under jax_enable_x64 a Python-int bound makes an
    # int64 induction variable, and i64->f32 converts send Mosaic's
    # lowering into infinite _convert_helper recursion (round-5 on-chip)
    lax.fori_loop(jnp.int32(0), jnp.int32(b), col_step, jnp.int32(0))

    # ---- forward larft: T with H(0)..H(b-1) = I - V T V^T ----
    # gram M = V^T V in panel-column indexing = VT VT^T over lanes
    # precision=HIGHEST on every in-kernel dot: f32 Mosaic dots default
    # to 1-pass bf16 on this toolchain (see ops/symv_pallas.py), and the
    # T factor feeds the two-sided orthogonal update -- bf16 gram error
    # would break the WY orthogonality contract.
    gram = lax.dot_general(
        vt_ref[:, :], vt_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (b, b), entry [i, k] = v_i . v_k

    def t_step(j, t):
        onehot_j = (lane_b == j).astype(jnp.float32)  # (1, b)
        tau_j = jnp.sum(scal_ref[0:1, :] * onehot_j)
        mcol = jnp.sum(gram * onehot_j, axis=1, keepdims=True)  # (b, 1)
        mcol = jnp.where(rows_b < j, mcol, 0.0)
        tm = lax.dot_general(
            t, mcol, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )  # (b, 1)
        colv = -tau_j * tm
        colv = jnp.where(rows_b == j, tau_j, colv)
        return t * (1.0 - onehot_j) + colv * onehot_j

    t = lax.fori_loop(jnp.int32(0), jnp.int32(b), t_step,
                      jnp.zeros((b, b), jnp.float32))
    scal_ref[8:, :] = t


def _ql_panel_planar_kernel(b, m, *refs):
    rb_ref, ptr_in, pti_in, pftr, pfti, vtr, vti, scal_ref = refs
    rb = rb_ref[0, 0]
    lanes = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    lane_b = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    rows_b = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    f1 = jnp.float32(1.0)
    nf = m // 128

    def fold(x):
        return jnp.sum(x.reshape(x.shape[0], nf, 128), axis=1)

    pftr[:, :] = ptr_in[:, :]
    pfti[:, :] = pti_in[:, :]
    vtr[:, :] = jnp.zeros_like(vtr)
    vti[:, :] = jnp.zeros_like(vti)
    scal_ref[:, :] = jnp.zeros_like(scal_ref)

    def col_step(k, _):
        j = b - 1 - k
        top = rb + j
        col_r = pftr[pl.ds(j, 1), :]
        col_i = pfti[pl.ds(j, 1), :]
        mask_above = lanes < top
        xr = jnp.where(mask_above, col_r, 0.0)
        xi = jnp.where(mask_above, col_i, 0.0)
        pivmask = (lanes == top).astype(jnp.float32)
        folded = fold(jnp.concatenate(
            [xr * xr + xi * xi, col_r * pivmask, col_i * pivmask], axis=0
        ))
        xnormsq = jnp.sum(folded[0:1, :])
        alphr = jnp.sum(folded[1:2, :])
        alphi = jnp.sum(folded[2:3, :])
        # branch-free planar zlarfg (ops/sytrd_planar._larfg_planar)
        norm = jnp.sqrt(alphr * alphr + alphi * alphi + xnormsq)
        beta = jnp.where(alphr >= 0, -norm, norm)
        trivial = (xnormsq == 0.0) & (alphi == 0.0)
        safe_beta = jnp.where(trivial, f1, beta)
        tk_r = jnp.where(trivial, 0.0, (beta - alphr) / safe_beta)
        tk_i = jnp.where(trivial, 0.0, -alphi / safe_beta)
        dr = alphr - beta
        den = dr * dr + alphi * alphi
        safe_den = jnp.where(trivial, f1, den)
        sc_r = jnp.where(trivial, 0.0, dr / safe_den)
        sc_i = jnp.where(trivial, 0.0, -alphi / safe_den)
        beta = jnp.where(trivial, alphr, beta)
        v_r = xr * sc_r - xi * sc_i
        v_i = xr * sc_i + xi * sc_r
        notriv = jnp.where(trivial, 0.0, f1)
        v_r = v_r + notriv * pivmask  # v[top] = 1 (v is 0 there before)
        v_i = v_i * (1.0 - pivmask)
        # v^H P -> (b,) pair: Re = v_r.P_r + v_i.P_i, Im = v_r.P_i - v_i.P_r
        vp_r = jnp.sum(fold(pftr[:, :] * v_r + pfti[:, :] * v_i),
                       axis=1, keepdims=True)
        vp_i = jnp.sum(fold(pfti[:, :] * v_r - pftr[:, :] * v_i),
                       axis=1, keepdims=True)
        # P <- P - v (conj(tau) (v^H P)) on columns < j
        tvp_r = tk_r * vp_r + tk_i * vp_i
        tvp_i = tk_r * vp_i - tk_i * vp_r
        colmask = (rows_b < j).astype(jnp.float32)
        pftr[:, :] -= colmask * (tvp_r * v_r - tvp_i * v_i)
        pfti[:, :] -= colmask * (tvp_r * v_i + tvp_i * v_r)
        newc_r = jnp.where(mask_above, 0.0, col_r)
        newc_i = jnp.where(mask_above, 0.0, col_i)
        newc_r = newc_r * (1.0 - notriv * pivmask) + beta * notriv * pivmask
        newc_i = newc_i * (1.0 - notriv * pivmask)
        pftr[pl.ds(j, 1), :] = newc_r
        pfti[pl.ds(j, 1), :] = newc_i
        vtr[pl.ds(j, 1), :] = v_r
        vti[pl.ds(j, 1), :] = v_i
        onehot_j = (lane_b == j).astype(jnp.float32)
        scal_ref[0:1, :] += tk_r * onehot_j
        scal_ref[1:2, :] += tk_i * onehot_j
        return jnp.int32(0)

    # int32 bounds: i64 induction vars (x64 mode) hit Mosaic's infinite
    # convert recursion -- see _ql_panel_kernel
    lax.fori_loop(jnp.int32(0), jnp.int32(b), col_step, jnp.int32(0))

    # ---- planar forward larft with CONJUGATED taus (psbrd applies
    # H^H per column, so the accumulated block is I - V T' V^H with
    # T' = larft_forward(V, conj(tau)) -- ops/sbrd_planar.py:185) ----
    ctr = lambda x, y: lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    # M = V^H V: Re = Vr^T Vr + Vi^T Vi, Im = Vr^T Vi - Vi^T Vr (in
    # panel-column indexing; rows of vtr/vti are panel columns)
    m_r = ctr(vtr[:, :], vtr[:, :]) + ctr(vti[:, :], vti[:, :])
    m_i = ctr(vtr[:, :], vti[:, :]) - ctr(vti[:, :], vtr[:, :])

    def t_step(j, t):
        t_r, t_i = t
        onehot_j = (lane_b == j).astype(jnp.float32)
        tau_r = jnp.sum(scal_ref[0:1, :] * onehot_j)
        tau_i = -jnp.sum(scal_ref[1:2, :] * onehot_j)  # conjugated
        keep = (rows_b < j).astype(jnp.float32)
        mc_r = keep * jnp.sum(m_r * onehot_j, axis=1, keepdims=True)
        mc_i = keep * jnp.sum(m_i * onehot_j, axis=1, keepdims=True)
        mm = lambda x, y: lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        ar = mm(t_r, mc_r) - mm(t_i, mc_i)
        ai = mm(t_r, mc_i) + mm(t_i, mc_r)
        cr = -(tau_r * ar - tau_i * ai)
        ci = -(tau_r * ai + tau_i * ar)
        diag = (rows_b == j).astype(jnp.float32)
        cr = cr * (1.0 - diag) + tau_r * diag
        ci = ci * (1.0 - diag) + tau_i * diag
        t_r = t_r * (1.0 - onehot_j) + cr * onehot_j
        t_i = t_i * (1.0 - onehot_j) + ci * onehot_j
        return t_r, t_i

    z = jnp.zeros((b, b), jnp.float32)
    t_r, t_i = lax.fori_loop(jnp.int32(0), jnp.int32(b), t_step, (z, z))
    scal_ref[8:8 + b, :] = t_r
    scal_ref[8 + b:, :] = t_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def ql_panel_planar_pallas(pr, pi, rows_below, interpret=False):
    """Fused planar QL panel + conjugated-tau forward-larft T (fp32).

    Drop-in for ops/sbrd_planar's `_ql_panel_planar` +
    `_larft_forward_planar(v, tau_r, -tau_i)` pair: returns
    (pfr, pfi, vr, vi, tau_r, tau_i, t_r, t_i)."""
    m, b = pr.shape
    if m % 128 != 0 or b % 8 != 0:
        raise ValueError(f"requires m % 128 == 0, b % 8 == 0, got {m}, {b}")
    rb = jnp.asarray(rows_below, jnp.int32).reshape(1, 1)
    f32 = jnp.float32
    kernel = functools.partial(_ql_panel_planar_kernel, b, m)
    pftr, pfti, vtr, vti, scal = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((b, m), f32),
            jax.ShapeDtypeStruct((b, m), f32),
            jax.ShapeDtypeStruct((b, m), f32),
            jax.ShapeDtypeStruct((b, m), f32),
            jax.ShapeDtypeStruct((8 + 2 * b, b), f32),
        ],
        interpret=interpret,
    )(rb, pr.T, pi.T)
    return (
        pftr.T, pfti.T, vtr.T, vti.T,
        scal[0, :], scal[1, :], scal[8:8 + b, :], scal[8 + b:, :],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def ql_panel_pallas(p, rows_below, interpret=False):
    """Fused QL panel factorization + forward-larft T (fp32).

    Drop-in for ops/sbrd's `(_ql_panel(p, rows_below), _larft_forward)`
    pair: returns (r_panel (m, b), v (m, b), tau (b,), t (b, b)).
    Requires m % 128 == 0 (the sbrd/psbrd buckets are multiples of 512)
    and b % 8 == 0.
    """
    m, b = p.shape
    if m % 128 != 0 or b % 8 != 0:
        raise ValueError(f"ql_panel_pallas requires m % 128 == 0, b % 8 == 0, got {m}, {b}")
    rb = jnp.asarray(rows_below, jnp.int32).reshape(1, 1)
    f32 = jnp.float32
    kernel = functools.partial(_ql_panel_kernel, b, m)
    pft, vt, scal = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m), f32),
            jax.ShapeDtypeStruct((b, m), f32),
            jax.ShapeDtypeStruct((8 + b, b), f32),  # row 0 = tau, 8: = T
        ],
        interpret=interpret,
    )(rb, p.T)
    return pft.T, vt.T, scal[0, :], scal[8:, :]
