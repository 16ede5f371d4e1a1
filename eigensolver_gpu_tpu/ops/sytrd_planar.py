"""Planar complex Householder tridiagonalization (hetrd without complex
dtypes).

The true zhetrd_gpu counterpart (zhetrd_gpu.F90:30, 883 LoC) for the
target TPU stack: the complex Hermitian reduction runs at native complex
flop count on (re, im) real array pairs -- half the work of the 2n real
embedding (ops/complex_embed.py). Same bucketed static-shape structure
as ops/sytrd.py; every complex product is expanded into real MXU
products; LAPACK zlarfg/zlatrd conventions (real beta/e, forced-real
diagonal) hold exactly, so the output feeds the real stedc directly.

Returns (packed (ar, ai), d, e, (tau_r, tau_i)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.kernel_guard import compiled_unavailable
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _pgemv(mr, mi, xr, xi):
    """(M x) for planar matrix/vector.

    Four plain gemvs. A stacked-rhs variant (mr @ [xr xi], one read per
    factor) measured SLOWER end to end (hetrd 549 -> 658 ms at n=4096;
    the (m, 2)-rhs gemm lowers worse than two gemvs on this chip) --
    recorded negative result, do not re-stack without measuring."""
    return mr @ xr - mi @ xi, mr @ xi + mi @ xr


def _pgemv_h(mr, mi, xr, xi):
    """(M^H x) for planar matrix/vector."""
    return mr.T @ xr + mi.T @ xi, mr.T @ xi - mi.T @ xr


def _larfg_planar(alphr, alphi, xnormsq):
    """zlarfg: returns (beta, tau_r, tau_i, scale_r, scale_i)."""
    norm = jnp.sqrt(alphr * alphr + alphi * alphi + xnormsq)
    beta = jnp.where(alphr >= 0, -norm, norm)
    trivial = (xnormsq == 0) & (alphi == 0)
    safe_beta = jnp.where(trivial, jnp.ones_like(beta), beta)
    tau_r = (beta - alphr) / safe_beta
    tau_i = -alphi / safe_beta
    dr = alphr - beta
    den = dr * dr + alphi * alphi
    safe_den = jnp.where(trivial, jnp.ones_like(den), den)
    scale_r = dr / safe_den
    scale_i = -alphi / safe_den
    z = jnp.zeros_like(beta)
    pick = lambda x: jnp.where(trivial, z, x)
    return (
        jnp.where(trivial, alphr, beta),
        pick(tau_r),
        pick(tau_i),
        pick(scale_r),
        pick(scale_i),
    )


def _panel_columns_planar(
    ar, ai, vr, vi, wr, wi, d, e, taur, taui, panel_end, nb, use_pallas=False
):
    mb = ar.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (mb, 1), 0).squeeze(-1)

    def col_step(k, carry):
        ar, ai, vr, vi, wr, wi, d, e, taur, taui = carry
        cj = panel_end - 1 - k

        acr = lax.dynamic_slice(ar, (0, cj), (mb, 1))[:, 0]
        aci = lax.dynamic_slice(ai, (0, cj), (mb, 1))[:, 0]
        # a_col -= [V W] @ conj([w_row; v_row])   (zlatrd's zlacgv'd pair)
        vw_r = jnp.concatenate([vr, wr], axis=1)
        vw_i = jnp.concatenate([vi, wi], axis=1)
        wv_r = jnp.concatenate([wr, vr], axis=1)
        wv_i = jnp.concatenate([wi, vi], axis=1)
        row_r = lax.dynamic_slice(wv_r, (cj, 0), (1, 2 * nb))[0]
        row_i = lax.dynamic_slice(wv_i, (cj, 0), (1, 2 * nb))[0]
        cr, ci = _pgemv(vw_r, vw_i, row_r, -row_i)
        acr = acr - cr
        aci = aci - ci

        d_val = acr[cj]  # diagonal forced real (zlatrd A(I,I)=DBLE(...))

        pidx = jnp.maximum(cj - 1, 0)
        xmask = rows < cj - 1
        xr_ = jnp.where(xmask, acr, 0.0)
        xi_ = jnp.where(xmask, aci, 0.0)
        xnormsq = jnp.sum(xr_ * xr_ + xi_ * xi_)
        beta, tk_r, tk_i, sc_r, sc_i = _larfg_planar(acr[pidx], aci[pidx], xnormsq)
        has_r = cj > 0
        tk_r = jnp.where(has_r, tk_r, 0.0)
        tk_i = jnp.where(has_r, tk_i, 0.0)

        v_r = xr_ * sc_r - xi_ * sc_i
        v_i = xr_ * sc_i + xi_ * sc_r
        one_here = (rows == cj - 1) & has_r
        v_r = jnp.where(one_here, 1.0, v_r)
        v_i = jnp.where(one_here, 0.0, v_i)

        # y = A v  -  [V W] ([W V]^H v)
        # The A@v is the traffic-dominant op of the whole reduction (the
        # reference's zhemv_gpu); the Pallas planar hemv reads only the
        # upper-triangle tiles. Junk in processed columns is harmless
        # (v is zero there) and junk rows >= cj are masked below.
        if use_pallas and not compiled_unavailable("hemv"):
            from eigensolver_gpu_tpu.ops.hemv_pallas import hemv_planar_auto

            y_r, y_i = hemv_planar_auto(ar, ai, v_r, v_i)
        else:
            y_r, y_i = _pgemv(ar, ai, v_r, v_i)
        z_r, z_i = _pgemv_h(wv_r, wv_i, v_r, v_i)
        c2r, c2i = _pgemv(vw_r, vw_i, z_r, z_i)
        y_r = y_r - c2r
        y_i = y_i - c2i
        # w = tau * y
        w_r = tk_r * y_r - tk_i * y_i
        w_i = tk_r * y_i + tk_i * y_r
        # alpha = -1/2 tau (w^H v);  w += alpha v
        hr = jnp.sum(w_r * v_r + w_i * v_i)
        hi = jnp.sum(w_r * v_i - w_i * v_r)
        al_r = -0.5 * (tk_r * hr - tk_i * hi)
        al_i = -0.5 * (tk_r * hi + tk_i * hr)
        w_r = w_r + al_r * v_r - al_i * v_i
        w_i = w_i + al_r * v_i + al_i * v_r
        keep = rows < cj
        w_r = jnp.where(keep, w_r, 0.0)
        w_i = jnp.where(keep, w_i, 0.0)

        vr = lax.dynamic_update_slice(vr, v_r[:, None], (0, k))
        vi = lax.dynamic_update_slice(vi, v_i[:, None], (0, k))
        wr = lax.dynamic_update_slice(wr, w_r[:, None], (0, k))
        wi = lax.dynamic_update_slice(wi, w_i[:, None], (0, k))

        new_r = jnp.where(xmask, v_r, acr)
        new_i = jnp.where(xmask, v_i, aci)
        new_r = jnp.where((rows == cj - 1) & has_r, beta, new_r)
        new_i = jnp.where((rows == cj - 1) & has_r, 0.0, new_i)
        new_r = jnp.where(rows == cj, d_val, new_r)
        new_i = jnp.where(rows == cj, 0.0, new_i)
        ar = lax.dynamic_update_slice(ar, new_r[:, None], (0, cj))
        ai = lax.dynamic_update_slice(ai, new_i[:, None], (0, cj))

        d = lax.dynamic_update_slice(d, d_val[None], (cj,))
        e_old = lax.dynamic_slice(e, (pidx,), (1,))[0]
        e = lax.dynamic_update_slice(
            e, jnp.where(has_r, beta, e_old)[None], (pidx,)
        )
        tr_old = lax.dynamic_slice(taur, (pidx,), (1,))[0]
        ti_old = lax.dynamic_slice(taui, (pidx,), (1,))[0]
        taur = lax.dynamic_update_slice(
            taur, jnp.where(has_r, tk_r, tr_old)[None], (pidx,)
        )
        taui = lax.dynamic_update_slice(
            taui, jnp.where(has_r, tk_i, ti_old)[None], (pidx,)
        )
        return ar, ai, vr, vi, wr, wi, d, e, taur, taui

    return lax.fori_loop(
        0, nb, col_step, (ar, ai, vr, vi, wr, wi, d, e, taur, taui)
    )


def _panel_via_pallas(ar_mb, ai_mb, d, e, taur, taui, panel_end, nb):
    """Run the panel through the fused Pallas kernel
    (ops/latrd_pallas.py) and fold its slot-ordered outputs back into
    the LAPACK-layout carries of the XLA loop."""
    from eigensolver_gpu_tpu.ops.latrd_pallas import latrd_panel_planar

    on_tpu = jax.devices()[0].platform == "tpu"
    mb = ar_mb.shape[0]
    # VMEM budget: double-buffered (tile, mb) planar input tiles must
    # leave room for the (mb, nb) output panels (16 MB scoped limit)
    tile = 128 if mb > 2048 else 256
    vr, vi, wr, wi, colr, coli, scal = latrd_panel_planar(
        ar_mb, ai_mb, panel_end, nb=nb, tile=tile, interpret=not on_tpu
    )
    pe = panel_end
    start_col = pe - nb
    ar_mb = lax.dynamic_update_slice(
        ar_mb, jnp.flip(colr, axis=1), (0, start_col)
    )
    ai_mb = lax.dynamic_update_slice(
        ai_mb, jnp.flip(coli, axis=1), (0, start_col)
    )
    d = lax.dynamic_update_slice(d, jnp.flip(scal[0]), (start_col,))
    # e/tau target index cj-1; slot cj=0 (only when pe == nb) has no
    # target -- roll its dummy out and preserve the old entry there.
    is_first = start_col == 0
    start_e = jnp.maximum(pe - nb - 1, 0)
    valid = jnp.arange(nb) < nb - is_first.astype(jnp.int32)

    def scatter(vec, vals):
        vals = jnp.flip(vals)
        vals = jnp.where(is_first, jnp.roll(vals, -1), vals)
        old = lax.dynamic_slice(vec, (start_e,), (nb,))
        return lax.dynamic_update_slice(
            vec, jnp.where(valid, vals, old), (start_e,)
        )

    e = scatter(e, scal[1])
    taur = scatter(taur, scal[2])
    taui = scatter(taui, scal[3])
    return ar_mb, ai_mb, vr, vi, wr, wi, d, e, taur, taui


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb", "bucket", "use_pallas"))
def hetrd_planar(a_r, a_i, nb=32, bucket=512, use_pallas=False):
    """Planar blocked hetrd. Returns ((ar, ai) packed, d, e, (taur, taui))."""
    n = a_r.shape[0]
    if n % nb != 0:
        raise ValueError(f"hetrd_planar requires n % nb == 0, got n={n}, nb={nb}")
    rdt = a_r.dtype

    # hermitize in planar form: Ar <- (Ar+Ar^T)/2, Ai <- (Ai-Ai^T)/2
    ar = (a_r + a_r.T) / 2
    ai = (a_i - a_i.T) / 2

    d = jnp.zeros((n,), rdt)
    e = jnp.zeros((max(n - 1, 1),), rdt)
    taur = jnp.zeros((max(n - 1, 1),), rdt)
    taui = jnp.zeros((max(n - 1, 1),), rdt)

    with trace_range("hetrd_planar"):
        num_buckets = -(-n // bucket)
        for b in range(num_buckets, 0, -1):
            mb = min(b * bucket, n)
            lo = (b - 1) * bucket
            npanels = (mb - lo) // nb
            ar_mb = ar[:mb, :mb]
            ai_mb = ai[:mb, :mb]
            rows = lax.broadcasted_iota(jnp.int32, (mb, 1), 0).squeeze(-1)
            # Mosaic has no fp64 in-kernel dot; the Pallas panel kernel
            # serves the fp32 path only (the mixed-precision pipeline)
            pallas_ok = (
                use_pallas
                and rdt == jnp.float32
                and mb % 256 == 0
                and mb <= 4096  # VMEM budget of the fused panel kernel
                and not compiled_unavailable("latrd_planar")
            )

            def panel_step(p, carry, mb=mb, rows=rows, pallas_ok=pallas_ok):
                ar_mb, ai_mb, d, e, taur, taui = carry
                panel_end = mb - p * nb
                if pallas_ok:
                    ar_mb, ai_mb, vr, vi, wr, wi, d, e, taur, taui = (
                        _panel_via_pallas(
                            ar_mb, ai_mb, d, e, taur, taui, panel_end, nb
                        )
                    )
                else:
                    z = jnp.zeros((mb, nb), rdt)
                    ar_mb, ai_mb, vr, vi, wr, wi, d, e, taur, taui = (
                        _panel_columns_planar(
                            ar_mb, ai_mb, z, z, z, z, d, e, taur, taui,
                            panel_end, nb, False,
                        )
                    )
                # trailing her2k: A -= V W^H + W V^H (planar, masked)
                t = panel_end - nb
                keep = (rows < t)[:, None]
                vr_m = jnp.where(keep, vr, 0.0)
                vi_m = jnp.where(keep, vi, 0.0)
                wr_m = jnp.where(keep, wr, 0.0)
                wi_m = jnp.where(keep, wi, 0.0)
                p_r = vr_m @ wr_m.T + vi_m @ wi_m.T  # (V W^H)_r
                p_i = vi_m @ wr_m.T - vr_m @ wi_m.T  # (V W^H)_i
                upd_r = p_r + p_r.T
                upd_i = p_i - p_i.T
                box = keep & keep.T
                ar_mb = jnp.where(box, ar_mb - upd_r, ar_mb)
                ai_mb = jnp.where(box, ai_mb - upd_i, ai_mb)
                return ar_mb, ai_mb, d, e, taur, taui

            ar_mb, ai_mb, d, e, taur, taui = lax.fori_loop(
                0, npanels, panel_step, (ar_mb, ai_mb, d, e, taur, taui)
            )
            ar = lax.dynamic_update_slice(ar, ar_mb, (0, 0))
            ai = lax.dynamic_update_slice(ai, ai_mb, (0, 0))

    ne = n - 1 if n > 1 else 0
    return (ar, ai), d, e[:ne], (taur[:ne], taui[:ne])
