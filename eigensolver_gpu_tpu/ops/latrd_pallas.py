"""Fused Pallas latrd panel kernel (planar complex, fp32).

Re-designs the reference's per-column kernel chain for one zlatrd panel
(zhetrd_gpu.F90:142-163: zher2_mv_zlarfg_kernel -> zhemv_gpu ->
stacked_zgemv_C -> stacked_zgemv_N_finish_W, glued by an atomics-based
software grid barrier) as ONE Pallas kernel per 32-column panel. The
XLA compiled-loop version (ops/sytrd_planar.py) pays ~35 op dispatches
per column; here the whole panel is a single kernel whose grid is
(column-steps, row-tiles):

* per row-tile: two MXU dots stream A's planar tiles once per column,
  producing both the hot matvec ``y = A v`` and the NEXT column's raw
  ``a_col`` (via a one-hot rhs column, so no dynamic lane indexing);
* per column phase (tile 0): all vector/scalar chemistry on
  VMEM-resident (mb, 1) vectors -- finalize the previous w-column,
  apply the compact-WY corrections as (mb, nb) x (nb, 1) dots, the
  branch-free planar zlarfg, and the panel writes. Slot writes/reads
  use one-hot masks (Mosaic cannot dynamically index the lane dim).

The sequential (column, tile) grid gives a stronger ordering guarantee
than the reference's `atomicinc(finished)` barrier, bitwise-
deterministically. fp32 only (Mosaic has no fp64 in-kernel dot); the
fp64 path keeps the XLA loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase(pe, g, nb, refs):
    """Column-phase work at tile 0 of grid step g (see module docstring)."""
    (
        vr_ref, vi_ref, wr_ref, wi_ref, colr_ref, coli_ref, scal_ref,
        acr_ref, aci_ref, yr_ref, yi_ref, vcr_ref, vci_ref, smem,
    ) = refs
    mb = acr_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    f1 = jnp.float32(1.0)

    # ---- (a) finalize w for slot g-2 (its y swept at step g-1) ----
    @pl.when(g >= 2)
    def _():
        s = g - 2
        onehot_s = (slot_lane == s).astype(jnp.float32)  # (1, nb)
        v_r = jax.lax.dot_general(
            vr_ref[:, :], onehot_s, (((1,), (1,)), ((), ()))
        )  # (mb, 1)
        v_i = jax.lax.dot_general(vi_ref[:, :], onehot_s, (((1,), (1,)), ((), ())))
        # y -= V (W^H v) + W (V^H v)   (planar compact-WY correction)
        ctr = lambda p, x: jax.lax.dot_general(
            p, x, (((0,), (0,)), ((), ()))
        )  # (mb,nb)^T @ (mb,1) -> (nb,1)
        wv_r = ctr(wr_ref[:, :], v_r) + ctr(wi_ref[:, :], v_i)  # (W^H v)_r
        wv_i = ctr(wr_ref[:, :], v_i) - ctr(wi_ref[:, :], v_r)
        vv_r = ctr(vr_ref[:, :], v_r) + ctr(vi_ref[:, :], v_i)  # (V^H v)_r
        vv_i = ctr(vr_ref[:, :], v_i) - ctr(vi_ref[:, :], v_r)
        mm = lambda p, x: jnp.dot(p, x, preferred_element_type=jnp.float32)
        y_r = yr_ref[:, :] - (
            mm(vr_ref[:, :], wv_r) - mm(vi_ref[:, :], wv_i)
            + mm(wr_ref[:, :], vv_r) - mm(wi_ref[:, :], vv_i)
        )
        y_i = yi_ref[:, :] - (
            mm(vr_ref[:, :], wv_i) + mm(vi_ref[:, :], wv_r)
            + mm(wr_ref[:, :], vv_i) + mm(wi_ref[:, :], vv_r)
        )
        tk_r = smem[0, s]
        tk_i = smem[1, s]
        w_r = tk_r * y_r - tk_i * y_i
        w_i = tk_r * y_i + tk_i * y_r
        # alpha = -1/2 tau (w^H v); w += alpha v
        hr = jnp.sum(w_r * v_r + w_i * v_i)
        hi = jnp.sum(w_r * v_i - w_i * v_r)
        al_r = -0.5 * (tk_r * hr - tk_i * hi)
        al_i = -0.5 * (tk_r * hi + tk_i * hr)
        w_r = w_r + al_r * v_r - al_i * v_i
        w_i = w_i + al_r * v_i + al_i * v_r
        cj = pe - 1 - s
        keep = (rows < cj).astype(jnp.float32)
        w_r = w_r * keep
        w_i = w_i * keep
        wr_ref[:, :] += w_r * onehot_s
        wi_ref[:, :] += w_i * onehot_s

    # ---- (b) prepare column slot g-1: corrections + larfg + writes ----
    @pl.when((g >= 1) & (g <= nb))
    def _():
        s = g - 1
        cj = pe - 1 - s
        onehot_s = (slot_lane == s).astype(jnp.float32)
        # panel row cj of [W V] (the zlacgv'd gemv pair, conj'd below)
        rowmask = (rows == cj).astype(jnp.float32)  # (mb, 1)
        rowof = lambda p: jax.lax.dot_general(
            p, rowmask, (((0,), (0,)), ((), ()))
        )  # (nb, 1)
        wrow_r = rowof(wr_ref[:, :])
        wrow_i = rowof(wi_ref[:, :])
        vrow_r = rowof(vr_ref[:, :])
        vrow_i = rowof(vi_ref[:, :])
        mm = lambda p, x: jnp.dot(p, x, preferred_element_type=jnp.float32)
        # acol -= V conj(wrow) + W conj(vrow)
        a_r = acr_ref[:, :] - (
            mm(vr_ref[:, :], wrow_r) + mm(vi_ref[:, :], wrow_i)
            + mm(wr_ref[:, :], vrow_r) + mm(wi_ref[:, :], vrow_i)
        )
        a_i = aci_ref[:, :] - (
            mm(vi_ref[:, :], wrow_r) - mm(vr_ref[:, :], wrow_i)
            + mm(wi_ref[:, :], vrow_r) - mm(wr_ref[:, :], vrow_i)
        )
        d_val = jnp.sum(a_r * rowmask)

        # branch-free planar zlarfg (ops/sytrd_planar._larfg_planar)
        pidx = jnp.maximum(cj - 1, 0)
        pivmask = (rows == pidx).astype(jnp.float32)
        alphr = jnp.sum(a_r * pivmask)
        alphi = jnp.sum(a_i * pivmask)
        xmask = (rows < cj - 1).astype(jnp.float32)
        x_r = a_r * xmask
        x_i = a_i * xmask
        xnormsq = jnp.sum(x_r * x_r + x_i * x_i)
        norm = jnp.sqrt(alphr * alphr + alphi * alphi + xnormsq)
        beta = jnp.where(alphr >= 0, -norm, norm)
        trivial = (xnormsq == 0) & (alphi == 0)
        safe_beta = jnp.where(trivial, f1, beta)
        tk_r = (beta - alphr) / safe_beta
        tk_i = -alphi / safe_beta
        dr = alphr - beta
        den = dr * dr + alphi * alphi
        safe_den = jnp.where(trivial, f1, den)
        sc_r = dr / safe_den
        sc_i = -alphi / safe_den
        has_r = cj > 0
        zero_if = trivial | ~has_r
        tk_r = jnp.where(zero_if, 0.0, tk_r)
        tk_i = jnp.where(zero_if, 0.0, tk_i)
        sc_r = jnp.where(zero_if, 0.0, sc_r)
        sc_i = jnp.where(zero_if, 0.0, sc_i)
        beta = jnp.where(trivial, alphr, beta)

        v_r = x_r * sc_r - x_i * sc_i
        v_i = x_r * sc_i + x_i * sc_r
        one_here = pivmask * jnp.where(has_r, f1, 0.0)
        v_r = v_r * (1.0 - one_here) + one_here
        v_i = v_i * (1.0 - one_here)

        vr_ref[:, :] += v_r * onehot_s
        vi_ref[:, :] += v_i * onehot_s
        vcr_ref[:, :] = v_r
        vci_ref[:, :] = v_i
        smem[0, s] = tk_r
        smem[1, s] = tk_i

        # packed column (LAPACK storage) + per-column scalars
        new_r = jnp.where(xmask > 0, v_r, a_r)
        new_i = jnp.where(xmask > 0, v_i, a_i)
        pb = pivmask * jnp.where(has_r, f1, 0.0)
        new_r = new_r * (1.0 - pb) + pb * beta
        new_i = new_i * (1.0 - pb)
        db = rowmask
        new_r = new_r * (1.0 - db) + db * d_val
        new_i = new_i * (1.0 - db)
        colr_ref[:, :] += new_r * onehot_s
        coli_ref[:, :] += new_i * onehot_s
        svals = jnp.concatenate(
            [
                jnp.full((1, 1), d_val, jnp.float32),
                jnp.full((1, 1), jnp.where(has_r, beta, 0.0), jnp.float32),
                jnp.full((1, 1), tk_r, jnp.float32),
                jnp.full((1, 1), tk_i, jnp.float32),
            ],
            axis=0,
        )  # (4, 1)
        scal_ref[:, :] += svals * onehot_s


def _latrd_kernel(nb, tile, pe_ref, ar_ref, ai_ref,
                  vr_ref, vi_ref, wr_ref, wi_ref, colr_ref, coli_ref,
                  scal_ref, acr, aci, yr, yi, vcr, vci, smem):
    g = pl.program_id(0)
    i = pl.program_id(1)
    pe = pe_ref[0, 0]
    mb = vr_ref.shape[0]

    @pl.when((g == 0) & (i == 0))
    def _():
        vr_ref[:, :] = jnp.zeros_like(vr_ref)
        vi_ref[:, :] = jnp.zeros_like(vi_ref)
        wr_ref[:, :] = jnp.zeros_like(wr_ref)
        wi_ref[:, :] = jnp.zeros_like(wi_ref)
        colr_ref[:, :] = jnp.zeros_like(colr_ref)
        coli_ref[:, :] = jnp.zeros_like(coli_ref)
        scal_ref[:, :] = jnp.zeros_like(scal_ref)
        vcr[:, :] = jnp.zeros_like(vcr)
        vci[:, :] = jnp.zeros_like(vci)

    @pl.when(i == 0)
    def _():
        _phase(
            pe, g, nb,
            (vr_ref, vi_ref, wr_ref, wi_ref, colr_ref, coli_ref, scal_ref,
             acr, aci, yr, yi, vcr, vci, smem),
        )

    # ---- tile sweep: y = A v (slot g-1) and raw a_col (slot g) ----
    @pl.when(g <= nb)
    def _():
        cj_next = pe - 1 - g  # column whose raw a_col this sweep gathers
        rows_t = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0)
        onehot_col = (rows_t == cj_next).astype(jnp.float32)  # (mb, 1)
        rhs = jnp.concatenate([vcr[:, :], vci[:, :], onehot_col], axis=1)
        p = jnp.dot(ar_ref[:, :], rhs, preferred_element_type=jnp.float32)
        q = jnp.dot(ai_ref[:, :], rhs, preferred_element_type=jnp.float32)
        sl = pl.ds(i * tile, tile)
        yr[sl, :] = p[:, 0:1] - q[:, 1:2]
        yi[sl, :] = p[:, 1:2] + q[:, 0:1]
        acr[sl, :] = p[:, 2:3]
        aci[sl, :] = q[:, 2:3]


@functools.partial(
    jax.jit, static_argnames=("nb", "tile", "interpret")
)
def latrd_panel_planar(ar_mb, ai_mb, panel_end, nb=32, tile=256,
                       interpret=False):
    """One fused zlatrd panel on the planar pair (ar_mb, ai_mb) (mb, mb),
    processing columns [panel_end-nb, panel_end) (descending).

    Returns (vr, vi, wr, wi, colr, coli, scal): compact-WY panels and
    packed columns in SLOT order (slot k = column panel_end-1-k), and
    scal (4, nb) rows = (d, e, tau_r, tau_i) per slot.
    """
    mb = ar_mb.shape[0]
    if mb % tile != 0:
        raise ValueError(f"mb={mb} must be divisible by tile={tile}")
    n_tiles = mb // tile
    pe = jnp.asarray(panel_end, jnp.int32).reshape(1, 1)
    f32 = jnp.float32

    kernel = functools.partial(_latrd_kernel, nb, tile)
    outs = pl.pallas_call(
        kernel,
        grid=(nb + 2, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1),
                index_map=lambda g, i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (tile, mb),
                index_map=lambda g, i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, mb),
                index_map=lambda g, i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (mb, nb),
                index_map=lambda g, i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(6)
        ]
        + [
            pl.BlockSpec(
                (4, nb),
                index_map=lambda g, i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=[jax.ShapeDtypeStruct((mb, nb), f32) for _ in range(6)]
        + [jax.ShapeDtypeStruct((4, nb), f32)],
        scratch_shapes=[
            pltpu.VMEM((mb, 1), f32),  # acol_r
            pltpu.VMEM((mb, 1), f32),  # acol_i
            pltpu.VMEM((mb, 1), f32),  # y_r
            pltpu.VMEM((mb, 1), f32),  # y_i
            pltpu.VMEM((mb, 1), f32),  # v_cur_r
            pltpu.VMEM((mb, 1), f32),  # v_cur_i
            pltpu.SMEM((2, nb), f32),  # tau_r, tau_i per slot
        ],
        interpret=interpret,
    )(pe, ar_mb, ai_mb)
    return tuple(outs)
