"""Pallas band->tridiagonal bulge chase: the whole wavefront schedule in
ONE kernel.

The XLA chase (ops/sb2st.bulge_chase) is correct but dispatch-bound: its
~3n fori_loop steps each cost ~100 us of launch/fusion overhead against
~1 us of VPU work, so the chase dominates the two-stage reduction
(measured: two-stage LOSES to the one-stage column loop at fp32 because
of it).  Here every timestep runs inside a single Mosaic kernel -- the
sequential grid iterates over blocks of ``TB`` timesteps (streaming the
reflector outputs per block) with a fori_loop inside, and the band
stays VMEM-resident for the whole chase.  Per-step cost drops from the
XLA dispatch floor to VPU arithmetic.

Same schedule, storage and conventions as the XLA version (sweep v's
chase step k applies a length-<=b reflector at rows v+1+k*b; wavefront
t = 3v + k; slot s handles (v-s, k+3s); reflector (v,k) stored at
vt[3v+k, k//3]) -- apply_q2 replays either version's output.

Mosaic-native re-expressions (the XLA tricks don't lower in-kernel):

* band strips -> dense windows uses a LOG-STEP MASKED ROLL shear
  (the flatten/reshape stride trick needs minor-dim reshapes, which
  Mosaic rejects): for sublane q, roll lanes right by q via 6 masked
  power-of-two rolls, descending shifts so the circular wrap region is
  provably empty at every stage.
* the two-sided symmetric update never materializes the symmetric
  window: the reflector's action decomposes over the lower trapezoid as
  a left update on A10, the v w^T + w v^T form on tril(A11), and a
  right update on A21, each a lane- or sublane-reduction against v.
* lane<->sublane vector moves are pure reshapes ((S,1,b)<->(S,b,1),
  same linear order), the one relayout Mosaic handles cheaply.

fp32 only (Mosaic has no fp64 arithmetic path here); the fp64 two-stage
path keeps the XLA chase.  Re-designs the role of the reference's hot
loop dsytrd_gpu.F90:61-163 at its wavefront limit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

# Escape hatch: EIGSOLVE_CHASE_LADDER=1 keeps the round-3 masked-roll
# ladders in case a toolchain rejects/slows the strided roll lowering.
_USE_LADDER = bool(os.environ.get("EIGSOLVE_CHASE_LADDER"))


def _shear(x, w, lanes, left):
    """Per-sublane-index lane roll: out[s, q, l] = x[s, q, l -+ q].

    Fast path (round 4): ONE hardware strided roll --
    ``pltpu.roll(x, shift, axis=2, stride, stride_axis=1)`` rotates lane
    l of sublane q to l + shift + stride*q (mod lanes); stride=1 shifts
    row q right by q (band strip -> window rows), stride=lanes-1 == -1
    undoes it.  Replaces the round-3 ladder of log2(w) masked
    power-of-two rolls (6 full VPU select passes each way at w=64).
    """
    if not _USE_LADDER:
        stride = lanes - 1 if left else 1
        return pltpu.roll(x, shift=jnp.int32(0), axis=2, stride=stride,
                          stride_axis=1)
    s, wq, _ = x.shape
    q = lax.broadcasted_iota(jnp.int32, (1, wq, 1), 1)
    shift = 1
    while shift < w:
        shift *= 2
    shift //= 2
    while shift >= 1:
        sh = lanes - shift if left else shift
        # static python-int shifts reach Mosaic as i64 under x64
        rolled = pltpu.roll(x, shift=jnp.int32(sh), axis=2)
        x = jnp.where((q & shift) != 0, rolled, x)
        shift //= 2
    return x


def _subroll(x, n_sl, chunk, up):
    """Per-slot sublane roll on (n_sl, chunk, w): slot sl's strip sits
    at chunk rows [off, off+2b) with off(sl) = n_sl-1-sl (the -1/slot
    drift of the aligned chunk view); up=True brings it to [0, 2b),
    up=False undoes it. Circular within the chunk, so the round trip is
    the identity on every row.

    Fast path (round 4): one strided roll over the slot axis -- roll up
    by n_sl-1-sl == roll down by chunk-(n_sl-1)+sl, i.e. shift =
    chunk-n_sl+1, stride = +1; the inverse rolls down by (n_sl-1) - sl,
    i.e. shift = n_sl-1, stride = chunk-1 == -1 (mod chunk).  Ladder
    fallback: mask key = slot index (dim 0), invariant under the axis-1
    rolls -- the shear trick, one axis over."""
    if n_sl == 1:
        return x
    if not _USE_LADDER:
        if up:
            shift, stride = (chunk - n_sl + 1) % chunk, 1
        else:
            shift, stride = n_sl - 1, chunk - 1
        return pltpu.roll(x, shift=jnp.int32(shift), axis=1, stride=stride,
                          stride_axis=0)
    slv = lax.broadcasted_iota(jnp.int32, (n_sl, 1, 1), 0)
    off = n_sl - 1 - slv
    shift = 1
    while shift < n_sl:
        shift *= 2
    shift //= 2
    while shift >= 1:
        sh = chunk - shift if up else shift
        rolled = pltpu.roll(x, shift=jnp.int32(sh), axis=1)
        x = jnp.where((off & shift) != 0, rolled, x)
        shift //= 2
    return x


def _chase_kernel(
    n, b, s_slots, stride, tb, t_total, pad_f, lanes, ablate, t0, *refs
):
    band_in, band_out, vt_ref, tau_ref = refs
    g = pl.program_id(0)
    w = 2 * b
    f1 = jnp.float32(1.0)
    # Aligned grouped band access: the (s_slots*stride, w) -> (S, stride,
    # w) per-slot reshape is a re-tiling relayout when stride % 8 != 0
    # and was measured to DOMINATE the step (15.0 us vs 2.5 us at an
    # aligned stride -- benchmarks/vmem_roundtrip_micro.py). Slots are
    # therefore processed in groups of <= b whose chunk view uses height
    # stride+1 = 3b (tile-aligned when b % 8 == 0); the per-slot -1-row
    # drift of that view is absorbed by strided sublane rolls (_subroll).
    # 'aligned'/'static' ablations time the UNGROUPED slicing and keep
    # the old path; the rest ablate the production (grouped) kernel.
    grouped = (3 * b) % 8 == 0 and ablate not in ("aligned", "static")

    @pl.when(g == 0)
    def _():
        band_out[:, :] = band_in[:, :]

    lane_b = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    sub_b = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    tril_mask = (lane_b >= sub_b).astype(jnp.float32)  # (1, b, b) p >= q

    # all scalar index math in int32: under x64, python-int promotion
    # produces int64 scalars whose conversion Mosaic cannot lower
    i32 = jnp.int32

    def window_update(wt, n_sl, s0, vmax, k0):
        """One chase step's reflectors on the sheared windows of slots
        [s0, s0+n_sl); returns (wt_new, v, tau)."""
        svec = i32(s0) + lax.broadcasted_iota(jnp.int32, (n_sl, 1), 0)

        # per-slot schedule
        v_s = vmax - svec                       # (S, 1)
        k_s = k0 + i32(3) * svec
        r0_s = v_s + i32(1) + k_s * i32(b)
        active = (v_s >= i32(0)) & (v_s <= i32(n - 3)) & (r0_s <= i32(n - 2))

        # reflector source: window col b-1 (sweep start) or col 0
        x0 = wt[:, b - 1, b:w]                  # (S, b)
        x1 = wt[:, 0, b:w]
        x = jnp.where((k_s == i32(0)) & (k0 == i32(0)), x0, x1)

        # batched branch-free larfg (LAPACK dlarfg conventions)
        alpha = x[:, 0:1]
        xtail = x * (lane_b[0] > 0).astype(jnp.float32)
        xnormsq = jnp.sum(xtail * xtail, axis=1, keepdims=True)
        norm = jnp.sqrt(alpha * alpha + xnormsq)
        beta = jnp.where(alpha >= 0, -norm, norm)
        trivial = xnormsq == 0
        safe_beta = jnp.where(trivial, f1, beta)
        tau = jnp.where(trivial, 0.0, (beta - alpha) / safe_beta)
        tau = jnp.where(active, tau, 0.0)       # (S, 1)
        denom = jnp.where(trivial, f1, alpha - beta)
        v = xtail / denom
        lane0 = (lane_b[0] == 0).astype(jnp.float32)
        v = v * (1.0 - lane0) + jnp.where(trivial, 0.0, f1) * lane0

        v_l = v[:, None, :]                     # (S, 1, b) lanes
        v_sub = v_l.reshape(n_sl, b, 1)         # (S, b, 1) sublanes
        tau3 = tau[:, :, None]                  # (S, 1, 1)

        # A10 (rows I, cols [0,b)) stored transposed at wt[:, :b, b:2b]
        a10t = wt[:, 0:b, b:w]
        u1 = jnp.sum(a10t * v_l, axis=2, keepdims=True)       # (S, b, 1)
        a10t = a10t - tau3 * u1 * v_l

        # A11 (rows/cols I), lower part at wt[:, b:2b, b:2b]
        l11 = wt[:, b:w, b:w] * tril_mask       # [q, p], valid p >= q
        t1 = jnp.sum(l11 * v_sub, axis=1, keepdims=True)      # (S, 1, b)
        # strict-upper mirror: (A11 v)[q] += sum_{p>q} W[q, p] v[p]
        strict_gt = (lane_b > sub_b).astype(jnp.float32)      # (1, b, b)
        t2 = jnp.sum(wt[:, b:w, b:w] * strict_gt * v_l,
                     axis=2, keepdims=True)                   # (S, b, 1)
        y = t1 + t2.reshape(n_sl, 1, b)                       # A11 v, lanes
        vav = jnp.sum(y * v_l, axis=2, keepdims=True)         # (S, 1, 1)
        wvec = tau3 * y - 0.5 * tau3 * tau3 * vav * v_l       # (S, 1, b)
        w_sub = wvec.reshape(n_sl, b, 1)
        upd = v_sub * wvec + w_sub * v_l                      # (S, b, b)
        l11_new = wt[:, b:w, b:w] - upd * tril_mask

        # A21 (rows [2b,3b), cols I) stored transposed at wt[:, b:2b, 2b:3b]
        a21t = wt[:, b:w, 2 * b : 3 * b]
        y2 = jnp.sum(a21t * v_sub, axis=1, keepdims=True)     # (S, 1, b)
        a21t = a21t - tau3 * v_sub * y2

        wt = jnp.concatenate(
            [
                jnp.concatenate([wt[:, 0:b, 0:b], a10t, wt[:, 0:b, 2 * b :]], axis=2),
                jnp.concatenate([wt[:, b:w, 0:b], l11_new, a21t,
                                 wt[:, b:w, 3 * b :]], axis=2),
            ],
            axis=1,
        )
        return wt, v, tau

    def step(i, carry):
        t = i32(t0) + g.astype(i32) * i32(tb) + i
        vmax = t // i32(3)
        k0 = t - i32(3) * vmax
        start = vmax + i32(1) + k0 * i32(b) - i32(b) + i32(pad_f)
        if ablate == "aligned":
            # WRONG RESULTS: 8-sublane-aligned slice, to time the cost
            # of the misaligned dynamic read/write (benchmarks/chase_micro)
            start = (start // i32(8)) * i32(8)
        if ablate == "static":
            # WRONG RESULTS: constant slice offset, to time dynamic-
            # offset slicing vs static (benchmarks/chase_micro)
            start = pad_f

        if grouped:
            chunk = stride + 1  # = 3b, tile-aligned
            for s0 in range(0, s_slots, b):
                n_sl = min(b, s_slots - s0)
                base = start + i32(stride * s0) - i32(n_sl - 1)
                flat = band_out[pl.ds(base, n_sl * chunk), :]
                ch = flat.reshape(n_sl, chunk, w)
                if ablate != "nosubroll":
                    ch = _subroll(ch, n_sl, chunk, up=True)
                strip = ch[:, :w, :]
                pad = jnp.zeros((n_sl, w, lanes - w), jnp.float32)
                cat = jnp.concatenate([strip, pad], axis=2)
                wt = cat if ablate == "noshear" else _shear(cat, w, lanes, False)
                if ablate == "nomath":
                    # WRONG RESULTS: skip reflector math, keep the deps
                    v = wt[:, 0, :b]
                    tau = wt[:, 0, 0:1]
                else:
                    wt, v, tau = window_update(wt, n_sl, s0, vmax, k0)
                strip_new = (
                    wt[:, :, :w]
                    if ablate == "noshear"
                    else _shear(wt, w, lanes, True)[:, :, :w]
                )
                ch = jnp.concatenate([strip_new, ch[:, w:, :]], axis=1)
                if ablate != "nosubroll":
                    ch = _subroll(ch, n_sl, chunk, up=False)
                # trimmed write: [base, base + stride*n_sl) regions tile
                # the band exactly across groups (last strip ends at
                # chunk*(n_sl-1)+2b <= stride*n_sl whenever n_sl <= b),
                # so no group clobbers a neighbor's freshly written strip
                if ablate != "nowrite":
                    band_out[pl.ds(base, stride * n_sl), :] = ch.reshape(
                        n_sl * chunk, w
                    )[: stride * n_sl]
                vt_ref[pl.ds(i, 1), s0 : s0 + n_sl, :] = v[None]
                tau_ref[pl.ds(i, 1), s0 : s0 + n_sl] = tau[:, 0][None]
            return carry

        blk = band_out[pl.ds(start, s_slots * stride), :]
        blk3 = blk.reshape(s_slots, stride, w)
        strip = blk3[:, :w, :]  # (S, 2b, 2b)  [q, d]

        # shear to window rows: wt[s, q, p] = A[j0+p, j0+q], p = q + d
        pad = jnp.zeros((s_slots, w, lanes - w), jnp.float32)
        if ablate == "noshear":
            # WRONG RESULTS: skip both shears, time everything else
            wt = jnp.concatenate([strip, pad], axis=2)
        else:
            wt = _shear(jnp.concatenate([strip, pad], axis=2), w, lanes, False)

        if ablate == "nomath":
            # WRONG RESULTS: skip the reflector math, time shear+traffic
            vt_ref[pl.ds(i, 1), :, :] = wt[:, 0:1, :b].reshape(1, s_slots, b)
            tau_ref[pl.ds(i, 1), :] = wt[:, 0:1, 0:1].reshape(1, s_slots)
            strip_new = (
                wt[:, :, :w]
                if ablate == "noshear"
                else _shear(wt, w, lanes, True)[:, :, :w]
            )
            blk_new = jnp.concatenate([strip_new, blk3[:, w:, :]], axis=1)
            band_out[pl.ds(start, s_slots * stride), :] = blk_new.reshape(
                s_slots * stride, w
            )
            return carry

        wt, v, tau = window_update(wt, s_slots, 0, vmax, k0)

        if ablate == "noshear":
            strip_new = wt[:, :, :w]
        else:
            strip_new = _shear(wt, w, lanes, True)[:, :, :w]
        if ablate == "nowrite":
            # WRONG RESULTS: skip the band write-back, time the read side
            pass
        else:
            blk_new = jnp.concatenate([strip_new, blk3[:, w:, :]], axis=1)
            band_out[pl.ds(start, s_slots * stride), :] = blk_new.reshape(
                s_slots * stride, w
            )
        vt_ref[pl.ds(i, 1), :, :] = v[None]
        tau_ref[pl.ds(i, 1), :] = tau[:, 0][None]
        return carry

    lax.fori_loop(i32(0), i32(tb), step, i32(0))


@functools.partial(jax.jit, static_argnames=("b", "tb", "interpret", "ablate"))
def bulge_chase_pallas(band, b, tb=96, interpret=False, ablate=None):
    """Pallas counterpart of ops/sb2st.bulge_chase (fp32).

    band: (n, 2b) lower band storage (see sb2st.dense_to_band).
    Returns (d, e, vt, taut) with the same timestep/slot layout as the
    XLA chase; vt's leading dim rounds up to a multiple of ``tb`` (the
    extra timesteps carry tau=0 and replay as no-ops).

    ``ablate`` (None | 'noshear' | 'aligned' | 'nowrite' | 'nomath')
    disables pieces of the per-step work FOR COST ATTRIBUTION ONLY
    (benchmarks/chase_micro.py); every non-None mode returns wrong
    results by design.
    """
    n = band.shape[0]
    w = 2 * b
    if band.shape[1] != w:
        raise ValueError(f"band must have 2b={w} diagonals, got {band.shape[1]}")
    if band.dtype != jnp.float32:
        raise TypeError("bulge_chase_pallas is fp32-only; use the XLA chase")
    if tb % 3 != 0:
        raise ValueError(f"tb must be a multiple of 3, got {tb}")
    kmax = max((n - 3) // b, 0)
    s_slots = kmax // 3 + 1
    t_total = 3 * (n - 3) + 1 if n > 3 else 1
    stride = 3 * b - 1
    lanes = 128 * (-(-(4 * b - 1) // 128))

    grid = -(-t_total // tb)
    t3 = grid * tb
    pad_f = 2 * b
    # back padding covers the largest slot read at the largest timestep
    # (start_max + S*stride with start_max <= (t3-1)//3 + 1 + b)
    pad_b = s_slots * stride + w + tb // 3 + b + 4
    npad = n + pad_f + pad_b
    band_p = jnp.zeros((npad, w), jnp.float32)
    band_p = lax.dynamic_update_slice(band_p, band, (pad_f, 0))

    # Phase plan: the wavefront's active-slot count ramps up with slope 1
    # (s <= vmax) and decays with slope 1/stride (r0 <= n-2), so most
    # timesteps need far fewer than s_slots slots; the per-step cost is
    # dominated by the band read/write round trip, which scales with the
    # static slot count (measured ~73% of step time at n=4096,
    # benchmarks/chase_micro.py). Splitting the t range into chunks with
    # a static per-chunk slot count roughly halves that term over the
    # run; the in-kernel ``active`` mask keeps correctness, phases only
    # shrink the slot dim where slots are provably inactive.
    n_phases = 1 if ablate in ("aligned", "static") else min(10, grid)
    blocks_per = -(-grid // n_phases)
    phases = []
    for p0 in range(0, grid, blocks_per):
        nblk = min(blocks_per, grid - p0)
        vmax_lo = (p0 * tb) // 3
        vmax_hi = (min((p0 + nblk) * tb, t_total) - 1) // 3
        s_ramp = vmax_hi + 1  # slot s needs v_s = vmax - s >= 0
        # r0_s = vmax + 1 + k0*b + s*stride <= n-2; loosest at k0=0
        s_tail = (n - 3 - vmax_lo) // stride + 1 if n > 3 else 1
        phases.append((p0, nblk, max(1, min(s_slots, s_ramp, s_tail))))

    const2 = lambda g: (jnp.int32(0), jnp.int32(0))
    vts, taus = [], []
    for p0, nblk, s_p in phases:
        kernel = functools.partial(
            _chase_kernel, n, b, s_p, stride, tb, t_total, pad_f, lanes,
            ablate, p0 * tb,
        )
        band_p, vt_p, tau_p = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(
                    (npad, w), index_map=const2, memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (npad, w), index_map=const2, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tb, s_p, b),
                    index_map=lambda g: (g, jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tb, s_p),
                    index_map=lambda g: (g, jnp.int32(0)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((npad, w), jnp.float32),
                jax.ShapeDtypeStruct((nblk * tb, s_p, b), jnp.float32),
                jax.ShapeDtypeStruct((nblk * tb, s_p), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(band_p)
        if s_p < s_slots:
            vt_p = jnp.pad(vt_p, ((0, 0), (0, s_slots - s_p), (0, 0)))
            tau_p = jnp.pad(tau_p, ((0, 0), (0, s_slots - s_p)))
        vts.append(vt_p)
        taus.append(tau_p)
    vt = jnp.concatenate(vts) if len(vts) > 1 else vts[0]
    taut = jnp.concatenate(taus) if len(taus) > 1 else taus[0]
    out = lax.dynamic_slice(band_p, (pad_f, 0), (n, w))
    d = out[:, 0]
    e = out[: n - 1, 1] if n > 1 else out[:0, 1]
    return d, e, vt, taut
