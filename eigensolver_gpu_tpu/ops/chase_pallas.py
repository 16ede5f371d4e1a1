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


def _ladder_choice(interpret):
    """Whether the shears/subrolls use the round-3 masked-roll ladders
    instead of the strided roll. EIGSOLVE_CHASE_LADDER=1/0 forces the
    choice (A/B runs); otherwise compiled TPU runs PROBE the strided
    roll once per process (utils/kernel_guard) and fall back to the
    ladders automatically if the toolchain rejects it (VERDICT r4 #4 --
    the bench must survive a toolchain change unattended)."""
    env = os.environ.get("EIGSOLVE_CHASE_LADDER")
    if env is not None:
        return env not in ("", "0")
    if interpret:
        return False
    from eigensolver_gpu_tpu.utils import kernel_guard

    if not kernel_guard.mosaic_backend():
        return False
    return not kernel_guard.kernel_ok("strided_roll")


def _shear(x, w, lanes, left, ladder):
    """Per-sublane-index lane roll: out[s, q, l] = x[s, q, l -+ q].

    Fast path: ONE hardware strided roll --
    ``pltpu.roll(x, shift, axis=2, stride, stride_axis=1)`` rotates lane
    l of sublane q to l + shift + stride*q (mod lanes); stride=1 shifts
    row q right by q (band strip -> window rows).  ROUND-5 ON-CHIP
    FINDING: only small power-of-two strides lower on the real Mosaic
    toolchain for lane rolls strided over sublanes -- stride=lanes-1
    (the inverse shear) is REJECTED ("max shift in a vreg > 128") and
    stride=64 compiles to WRONG RESULTS (verified against the roll
    semantics on-chip).  The left/inverse direction therefore always
    uses the round-3 ladder of log2(w) masked power-of-two rolls; the
    hybrid halves the shear cost vs the full ladder.
    """
    if not ladder and not left:
        return pltpu.roll(x, shift=jnp.int32(0), axis=2, stride=1,
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


def _subroll(x, n_sl, chunk, up, ladder):
    """Per-slot sublane roll on (n_sl, chunk, w): slot sl's strip sits
    at chunk rows [off, off+2b) with off(sl) = n_sl-1-sl (the -1/slot
    drift of the aligned chunk view); up=True brings it to [0, 2b),
    up=False undoes it. Circular within the chunk, so the round trip is
    the identity on every row.

    Fast path: one strided roll over the slot axis -- roll up by
    n_sl-1-sl == roll down by chunk-(n_sl-1)+sl, i.e. shift =
    chunk-n_sl+1, stride = +1.  ROUND-5 ON-CHIP FINDING: the inverse
    (shift = n_sl-1, stride = chunk-1 == -1 mod chunk) COMPILES BUT
    MISCOMPILES on the real toolchain (verified wrong vs the roll
    semantics at (8,192,128) and (16,96,128)) -- only stride=1 is
    trustworthy, so the down direction always takes the masked-roll
    ladder (mask key = slot index (dim 0), invariant under the axis-1
    rolls -- the shear trick, one axis over)."""
    if n_sl == 1:
        return x
    if not ladder and up:
        return pltpu.roll(x, shift=jnp.int32((chunk - n_sl + 1) % chunk),
                          axis=1, stride=1, stride_axis=0)
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


def _slot_roll_minus(x, shift, n_key=None):
    """Per-slot sublane roll DOWN-minus-slot: out[s] = roll_right(x[s],
    shift - s) along axis 1. The hardware form (stride = axis_size - 1)
    COMPILES BUT MISCOMPILES on the real toolchain (round-5 on-chip
    verification), so this is always the masked power-of-two ladder:
    one plain roll by ``shift`` then log2(n_key) masked up-rolls keyed
    by the slot index (invariant under the axis-1 rolls)."""
    f = x.shape[1]
    n_sl = x.shape[0]
    if n_key is None:
        n_key = n_sl
    x = pltpu.roll(x, shift=jnp.int32(shift % f), axis=1)
    if n_key <= 1:
        return x
    slv = lax.broadcasted_iota(jnp.int32, (n_sl, 1, 1), 0)
    k = 1
    while k < n_key:
        rolled = pltpu.roll(x, shift=jnp.int32(f - k), axis=1)
        x = jnp.where((slv & k) != 0, rolled, x)
        k *= 2
    return x


def _window_update(wt, n_sl, s0, vmax, k0, n, b):
    """One chase step's reflectors on the sheared windows of slots
    [s0, s0+n_sl); returns (wt_new, v, tau). Shared by the per-timestep
    kernel and the vmax-batched kernel (window geometry is identical;
    only the band<->window staging differs)."""
    w = 2 * b
    f1 = jnp.float32(1.0)
    i32 = jnp.int32
    lane_b = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    sub_b = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    tril_mask = (lane_b >= sub_b).astype(jnp.float32)  # (1, b, b) p >= q
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


def _chase_kernel(
    n, b, s_slots, stride, tb, t_total, pad_f, lanes, ablate, t0, ladder,
    *refs,
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
        return _window_update(wt, n_sl, s0, vmax, k0, n, b)

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
                    ch = _subroll(ch, n_sl, chunk, up=True, ladder=ladder)
                strip = ch[:, :w, :]
                pad = jnp.zeros((n_sl, w, lanes - w), jnp.float32)
                cat = jnp.concatenate([strip, pad], axis=2)
                wt = cat if ablate == "noshear" else _shear(cat, w, lanes,
                                                            False, ladder)
                if ablate == "nomath":
                    # WRONG RESULTS: skip reflector math, keep the deps
                    v = wt[:, 0, :b]
                    tau = wt[:, 0, 0:1]
                else:
                    wt, v, tau = window_update(wt, n_sl, s0, vmax, k0)
                strip_new = (
                    wt[:, :, :w]
                    if ablate == "noshear"
                    else _shear(wt, w, lanes, True, ladder)[:, :, :w]
                )
                ch = jnp.concatenate([strip_new, ch[:, w:, :]], axis=1)
                if ablate != "nosubroll":
                    ch = _subroll(ch, n_sl, chunk, up=False, ladder=ladder)
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
            wt = _shear(jnp.concatenate([strip, pad], axis=2), w, lanes,
                        False, ladder)

        if ablate == "nomath":
            # WRONG RESULTS: skip the reflector math, time shear+traffic
            vt_ref[pl.ds(i, 1), :, :] = wt[:, 0:1, :b].reshape(1, s_slots, b)
            tau_ref[pl.ds(i, 1), :] = wt[:, 0:1, 0:1].reshape(1, s_slots)
            strip_new = (
                wt[:, :, :w]
                if ablate == "noshear"
                else _shear(wt, w, lanes, True, ladder)[:, :, :w]
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
            strip_new = _shear(wt, w, lanes, True, ladder)[:, :, :w]
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


def _chase_kernel_b3(
    n, b, s_slots, stride, tb, t_total, pad_f, lanes, t0, ladder, planar,
    *refs,
):
    """vmax-BATCHED chase kernel: the 3 sub-steps (k0 = 0, 1, 2) of one
    wavefront index vmax share ONE band read/write round trip instead of
    three (ROADMAP r4 #1). Handles the real band (planar=False, 4 refs)
    and the planar complex pair (planar=True, 8 refs) with identical
    staging applied per plane.

    Sub-step j's strip is band rows [start_s + j*b, start_s + j*b + 2b),
    start_s = vmax+1-b+stride*s, so the union per slot is 4b rows; the
    extra b rows beyond the 3b chunk come from the NEXT slot's chunk via
    one slot-axis roll plus one sublane roll (slot s rows [3b-d_s, 3b)
    sit at next-chunk positions r+1 after its subroll; rows [3b, 4b) are
    its positions [1, b+1)).

    Between sub-steps the 1-sweep-later slot writes rows the 1-sweep-
    earlier slot reads next: after sub-step 0, slot s rows [3b-1, 4b)
    refresh from slot s+1 rows [0, b+1); after sub-step 1, row 4b-1
    refreshes from slot s+1 row b. Dependencies flow ONLY from s+1 to s
    (verified window-by-window), so slot GROUPS are processed in
    DESCENDING order and each group hands its slot-0 post-sub-step rows
    up to the group above in registers (h0/h1) -- the band cannot carry
    them because each group's trimmed write starts below its slot-0
    strip top.

    Write-back ownership: the last writer of band row start_s + r is
    slot s-1's sub-step 2 for r in [0, b+1) and slot s itself above
    that, so slot s owns rows [start_s + b+1, start_s + 4b) -- exactly
    stride rows, tiling the band. The (n_sl, 3b) write image is built
    with two strided sublane rolls (slab placement offset is linear in
    the slot index) plus one slot roll for the spill of slab s-1's tail
    into chunk s's head; the topmost group additionally writes its
    b+1-n_sl head rows (slot 0's sub-step-0 update is their final
    value).
    """
    np_ = 2 if planar else 1
    b_ins = refs[0:np_]
    b_outs = refs[np_ : 2 * np_]
    vt_refs = refs[2 * np_ : 3 * np_]
    tau_refs = refs[3 * np_ : 4 * np_]
    g = pl.program_id(0)
    w = 2 * b
    chunk = 3 * b
    fourb = 4 * b
    i32 = jnp.int32

    @pl.when(g == 0)
    def _():
        for bin_, bout_ in zip(b_ins, b_outs):
            bout_[:, :] = bin_[:, :]

    n_groups = -(-s_slots // b)

    def batch(ib, carry):
        tbase = i32(t0) + g.astype(i32) * i32(tb) + i32(3) * ib
        vmax = tbase // i32(3)  # tbase % 3 == 0 (t0 and tb multiples of 3)
        start = vmax + i32(1) - i32(b) + i32(pad_f)
        h0 = None  # group-below slot-0 rows [0, b+1) after sub-step 0
        h1 = None  # group-below slot-0 row b after sub-step 1
        for gi in range(n_groups - 1, -1, -1):
            s0 = gi * b
            n_sl = min(b, s_slots - s0)
            base = start + i32(stride * s0) - i32(n_sl - 1)
            s_col = lax.broadcasted_iota(jnp.int32, (n_sl, 1, 1), 0)
            last = s_col == n_sl - 1
            views = []
            for bo in b_outs:
                ch = bo[pl.ds(base, n_sl * chunk), :].reshape(
                    n_sl, chunk, w
                )
                ch = _subroll(ch, n_sl, chunk, up=True, ladder=ladder)
                tail = bo[pl.ds(base + i32(n_sl * chunk), b), :]  # (b, w)
                if n_sl > 1:
                    nxt0 = pltpu.roll(ch, shift=jnp.int32(n_sl - 1), axis=0)
                    nshift = pltpu.roll(nxt0, shift=jnp.int32(chunk - 1),
                                        axis=1)
                    r_i = lax.broadcasted_iota(jnp.int32, (n_sl, chunk, 1), 1)
                    s_i = lax.broadcasted_iota(jnp.int32, (n_sl, chunk, 1), 0)
                    # slot s chunk rows [0, 3b - d_s) valid, d_s = n_sl-1-s
                    top = jnp.where(r_i < i32(chunk - n_sl + 1) + s_i, ch,
                                    nshift)
                    ext = jnp.where(
                        last, jnp.broadcast_to(tail[None], (n_sl, b, w)),
                        nxt0[:, 1 : b + 1, :],
                    )
                else:
                    top = ch
                    ext = tail[None]
                views.append(jnp.concatenate([top, ext], axis=1))

            h0_new = h1_new = None
            for j in range(3):
                pad = jnp.zeros((n_sl, w, lanes - w), jnp.float32)
                wts = [
                    _shear(
                        jnp.concatenate([v[:, j * b : j * b + w, :], pad],
                                        axis=2),
                        w, lanes, False, ladder,
                    )
                    for v in views
                ]
                if planar:
                    wtr, wti, v_r, v_i, tau_r, tau_i = _window_update_planar(
                        wts[0], wts[1], n_sl, s0, vmax, i32(j), n, b
                    )
                    wts = [wtr, wti]
                    vs = [v_r, v_i]
                    taus = [tau_r, tau_i]
                else:
                    wt, v, tau = _window_update(
                        wts[0], n_sl, s0, vmax, i32(j), n, b
                    )
                    wts = [wt]
                    vs = [v]
                    taus = [tau]
                def _reassemble(v, wt_):
                    # zero-size pieces (prefix at j=0, suffix at j=2)
                    # are legal XLA but Mosaic rejects zero-size vectors
                    parts = []
                    if j > 0:
                        parts.append(v[:, : j * b])
                    parts.append(_shear(wt_, w, lanes, True, ladder)[:, :, :w])
                    if j * b + w < fourb:
                        parts.append(v[:, j * b + w :])
                    return jnp.concatenate(parts, axis=1)

                views = [_reassemble(v, wt_) for v, wt_ in zip(views, wts)]
                for vt_ref, vv in zip(vt_refs, vs):
                    vt_ref[pl.ds(i32(3) * ib + j, 1), s0 : s0 + n_sl, :] = (
                        vv[None]
                    )
                for tau_ref, tt in zip(tau_refs, taus):
                    tau_ref[pl.ds(i32(3) * ib + j, 1), s0 : s0 + n_sl] = (
                        tt[:, 0][None]
                    )
                if j == 0:
                    h0_new = [v[0:1, 0 : b + 1, :] for v in views]
                    # refresh rows [3b-1, 4b) from slot s+1 rows [0, b+1)
                    new_views = []
                    for p, v in enumerate(views):
                        if n_sl > 1:
                            nx = pltpu.roll(v, shift=jnp.int32(n_sl - 1),
                                            axis=0)
                            repl = nx[:, 0 : b + 1, :]
                        else:
                            repl = v[:, chunk - 1 : fourb, :]
                        if h0 is not None:
                            repl = jnp.where(
                                last,
                                jnp.broadcast_to(h0[p], (n_sl, b + 1, w)),
                                repl,
                            )
                        else:
                            repl = jnp.where(last, v[:, chunk - 1 :, :],
                                             repl)
                        new_views.append(
                            jnp.concatenate([v[:, : chunk - 1, :], repl],
                                            axis=1)
                        )
                    views = new_views
                elif j == 1:
                    h1_new = [v[0:1, b : b + 1, :] for v in views]
                    # refresh row 4b-1 from slot s+1 row b
                    new_views = []
                    for p, v in enumerate(views):
                        if n_sl > 1:
                            nx = pltpu.roll(v, shift=jnp.int32(n_sl - 1),
                                            axis=0)
                            repl = nx[:, b : b + 1, :]
                        else:
                            repl = v[:, fourb - 1 : fourb, :]
                        if h1 is not None:
                            repl = jnp.where(
                                last, jnp.broadcast_to(h1[p], (n_sl, 1, w)),
                                repl,
                            )
                        else:
                            repl = jnp.where(
                                last, v[:, fourb - 1 : fourb, :], repl
                            )
                        new_views.append(
                            jnp.concatenate([v[:, : fourb - 1, :], repl],
                                            axis=1)
                        )
                    views = new_views
            h0, h1 = h0_new, h1_new

            # ownership-tiled write image: chunk t rows r host slab t at
            # offset d'_t = n_sl - t (main) and slab t-1's tail (spill)
            # for r < d'_t; both placements are linear in t -> strided
            # sublane rolls. Chunk 0's head keeps the main rule: for the
            # group above it is garbage that group overwrites; for the
            # global top group it is slot 0's own (correct) rows.
            shift_main = (n_sl - b - 1) % fourb
            base_w = start + i32(stride * s0) + i32(b + 1 - n_sl)
            for bo, v in zip(b_outs, views):
                main = _slot_roll_minus(v, shift_main)
                if n_sl > 1:
                    sp0 = pltpu.roll(v, shift=jnp.int32(1), axis=0)
                    spill = _slot_roll_minus(sp0, n_sl)
                    r4 = lax.broadcasted_iota(jnp.int32, (n_sl, fourb, 1), 1)
                    s4 = lax.broadcasted_iota(jnp.int32, (n_sl, fourb, 1), 0)
                    out = jnp.where((r4 + s4 < i32(n_sl)) & (s4 > 0), spill,
                                    main)
                else:
                    out = main
                bo[pl.ds(base_w, chunk * n_sl), :] = out[
                    :, :chunk, :
                ].reshape(n_sl * chunk, w)
                if gi == 0:
                    # the topmost group must write its own head rows --
                    # slot 0's sub-step-0 update is their final value
                    # (dropping them corrupts e[r0-1] whenever n_sl == 1,
                    # the wavefront-tail phases)
                    bo[pl.ds(start, b + 1 - n_sl), :] = v[
                        0, 0 : b + 1 - n_sl, :
                    ]
        return carry

    lax.fori_loop(i32(0), i32(tb // 3), batch, i32(0))


def _window_update_planar(wtr, wti, n_sl, s0, vmax, k0, n, b):
    """Planar complex twin of _window_update (zlarfg conventions; see
    _chase_kernel_planar docstring for the region algebra). Shared by
    the per-timestep and vmax-batched planar kernels."""
    w = 2 * b
    f1 = jnp.float32(1.0)
    i32 = jnp.int32
    lane_b = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    sub_b = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    tril_mask = (lane_b >= sub_b).astype(jnp.float32)
    strict_gt = (lane_b > sub_b).astype(jnp.float32)
    svec = i32(s0) + lax.broadcasted_iota(jnp.int32, (n_sl, 1), 0)
    v_s = vmax - svec
    k_s = k0 + i32(3) * svec
    r0_s = v_s + i32(1) + k_s * i32(b)
    active = (v_s >= i32(0)) & (v_s <= i32(n - 3)) & (r0_s <= i32(n - 2))

    src = (k_s == i32(0)) & (k0 == i32(0))
    x_r = jnp.where(src, wtr[:, b - 1, b:w], wtr[:, 0, b:w])
    x_i = jnp.where(src, wti[:, b - 1, b:w], wti[:, 0, b:w])

    # batched planar zlarfg (real beta, complex tau/v)
    tail = (lane_b[0] > 0).astype(jnp.float32)
    ar = x_r[:, 0:1]
    ai = x_i[:, 0:1]
    xtr = x_r * tail
    xti = x_i * tail
    xnormsq = jnp.sum(xtr * xtr + xti * xti, axis=1, keepdims=True)
    norm = jnp.sqrt(ar * ar + ai * ai + xnormsq)
    beta = jnp.where(ar >= 0, -norm, norm)
    trivial = (xnormsq == 0) & (ai == 0)
    safe_beta = jnp.where(trivial, f1, beta)
    tau_r = jnp.where(trivial, 0.0, (beta - ar) / safe_beta)
    tau_i = jnp.where(trivial, 0.0, -ai / safe_beta)
    tau_r = jnp.where(active, tau_r, 0.0)
    tau_i = jnp.where(active, tau_i, 0.0)
    dr = ar - beta
    dd = jnp.where(trivial, f1, dr * dr + ai * ai)
    sc_r = dr / dd
    sc_i = -ai / dd
    v_r = xtr * sc_r - xti * sc_i
    v_i = xtr * sc_i + xti * sc_r
    lane0 = (lane_b[0] == 0).astype(jnp.float32)
    v_r = v_r * (1.0 - lane0) + jnp.where(trivial, 0.0, f1) * lane0
    v_i = v_i * (1.0 - lane0)

    vr_l = v_r[:, None, :]
    vi_l = v_i[:, None, :]
    vr_s = vr_l.reshape(n_sl, b, 1)
    vi_s = vi_l.reshape(n_sl, b, 1)
    tr3 = tau_r[:, :, None]
    ti3 = tau_i[:, :, None]

    # A10^T at [:, :b, b:2b]: -= conj(tau) (A10^T conj(v)) v^T
    a10r = wtr[:, 0:b, b:w]
    a10i = wti[:, 0:b, b:w]
    u1r = jnp.sum(a10r * vr_l + a10i * vi_l, axis=2, keepdims=True)
    u1i = jnp.sum(a10i * vr_l - a10r * vi_l, axis=2, keepdims=True)
    ctr = tr3 * u1r + ti3 * u1i
    cti = tr3 * u1i - ti3 * u1r
    a10r = a10r - (ctr * vr_l - cti * vi_l)
    a10i = a10i - (ctr * vi_l + cti * vr_l)

    # A11 tril at [:, b:2b, b:2b], [q=col, l=row]
    w11r = wtr[:, b:w, b:w]
    w11i = wti[:, b:w, b:w]
    l11r = w11r * tril_mask
    l11i = w11i * tril_mask
    # y[l] = sum_{q<=l} W[q,l] v[q] + sum_{q>l... } mirror
    t1r = jnp.sum(l11r * vr_s - l11i * vi_s, axis=1, keepdims=True)
    t1i = jnp.sum(l11r * vi_s + l11i * vr_s, axis=1, keepdims=True)
    # mirror: y[q] += sum_{l>q} conj(W[q,l]) v[l]
    t2r = jnp.sum((w11r * vr_l + w11i * vi_l) * strict_gt,
                  axis=2, keepdims=True)
    t2i = jnp.sum((w11r * vi_l - w11i * vr_l) * strict_gt,
                  axis=2, keepdims=True)
    yr = t1r + t2r.reshape(n_sl, 1, b)
    yi = t1i + t2i.reshape(n_sl, 1, b)
    # vav = Re(v^H y) (exactly real for Hermitian A11)
    vav = jnp.sum(vr_l * yr + vi_l * yi, axis=2, keepdims=True)
    t2ab = tr3 * tr3 + ti3 * ti3
    wvr = tr3 * yr - ti3 * yi - 0.5 * t2ab * vav * vr_l
    wvi = tr3 * yi + ti3 * yr - 0.5 * t2ab * vav * vi_l
    wr_s = wvr.reshape(n_sl, b, 1)
    wi_s = wvi.reshape(n_sl, b, 1)
    # upd[q,l] = conj(w[q]) v[l] + conj(v[q]) w[l]
    upd_r = wr_s * vr_l + wi_s * vi_l + vr_s * wvr + vi_s * wvi
    upd_i = wr_s * vi_l - wi_s * vr_l + vr_s * wvi - vi_s * wvr
    l11_new_r = w11r - upd_r * tril_mask
    l11_new_i = w11i - upd_i * tril_mask

    # A21^T at [:, b:2b, 2b:3b]: -= tau conj(v)_sub (A21^T v)
    a21r = wtr[:, b:w, 2 * b : 3 * b]
    a21i = wti[:, b:w, 2 * b : 3 * b]
    y2r = jnp.sum(a21r * vr_s - a21i * vi_s, axis=1, keepdims=True)
    y2i = jnp.sum(a21r * vi_s + a21i * vr_s, axis=1, keepdims=True)
    ty2r = tr3 * y2r - ti3 * y2i
    ty2i = tr3 * y2i + ti3 * y2r
    a21r = a21r - (vr_s * ty2r + vi_s * ty2i)
    a21i = a21i - (vr_s * ty2i - vi_s * ty2r)

    wtr = jnp.concatenate(
        [
            jnp.concatenate([wtr[:, 0:b, 0:b], a10r,
                             wtr[:, 0:b, 2 * b :]], axis=2),
            jnp.concatenate([wtr[:, b:w, 0:b], l11_new_r, a21r,
                             wtr[:, b:w, 3 * b :]], axis=2),
        ],
        axis=1,
    )
    wti = jnp.concatenate(
        [
            jnp.concatenate([wti[:, 0:b, 0:b], a10i,
                             wti[:, 0:b, 2 * b :]], axis=2),
            jnp.concatenate([wti[:, b:w, 0:b], l11_new_i, a21i,
                             wti[:, b:w, 3 * b :]], axis=2),
        ],
        axis=1,
    )
    return wtr, wti, v_r, v_i, tau_r, tau_i


def _chase_kernel_planar(
    n, b, s_slots, stride, tb, t_total, pad_f, lanes, t0, ladder, *refs
):
    """Planar complex twin of _chase_kernel (grouped path only).

    The two-sided update is A <- H^H A H with H = I - tau v v^H (zlarfg
    annihilates via H^H; see ops/sb2st_planar.bulge_chase_planar, whose
    XLA window algebra this kernel re-expresses region-wise in the
    transposed [q=col, l=row] window storage):

      A10^T <- A10^T - conj(tau) (A10^T conj(v)) v^T
      y = A11 v (tril + conj-mirror), w = tau y - 1/2 |tau|^2 (v^H y) v,
        A11[q,l] -= conj(w[q]) v[l] + conj(v[q]) w[l]   (l >= q)
      A21^T <- A21^T - tau conj(v)_sub (A21^T v)
    """
    (br_in, bi_in, br_out, bi_out, vtr_ref, vti_ref, taur_ref,
     taui_ref) = refs
    g = pl.program_id(0)
    w = 2 * b
    f1 = jnp.float32(1.0)

    @pl.when(g == 0)
    def _():
        br_out[:, :] = br_in[:, :]
        bi_out[:, :] = bi_in[:, :]

    lane_b = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    sub_b = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    tril_mask = (lane_b >= sub_b).astype(jnp.float32)
    strict_gt = (lane_b > sub_b).astype(jnp.float32)
    i32 = jnp.int32

    def window_update(wtr, wti, n_sl, s0, vmax, k0):
        return _window_update_planar(wtr, wti, n_sl, s0, vmax, k0, n, b)


    def step(i, carry):
        t = i32(t0) + g.astype(i32) * i32(tb) + i
        vmax = t // i32(3)
        k0 = t - i32(3) * vmax
        start = vmax + i32(1) + k0 * i32(b) - i32(b) + i32(pad_f)
        chunk = stride + 1  # = 3b, tile-aligned
        for s0 in range(0, s_slots, b):
            n_sl = min(b, s_slots - s0)
            base = start + i32(stride * s0) - i32(n_sl - 1)
            chr_ = br_out[pl.ds(base, n_sl * chunk), :].reshape(n_sl, chunk, w)
            chi_ = bi_out[pl.ds(base, n_sl * chunk), :].reshape(n_sl, chunk, w)
            chr_ = _subroll(chr_, n_sl, chunk, up=True, ladder=ladder)
            chi_ = _subroll(chi_, n_sl, chunk, up=True, ladder=ladder)
            pad = jnp.zeros((n_sl, w, lanes - w), jnp.float32)
            wtr = _shear(jnp.concatenate([chr_[:, :w, :], pad], axis=2),
                         w, lanes, False, ladder)
            wti = _shear(jnp.concatenate([chi_[:, :w, :], pad], axis=2),
                         w, lanes, False, ladder)
            wtr, wti, v_r, v_i, tau_r, tau_i = window_update(
                wtr, wti, n_sl, s0, vmax, k0
            )
            snr = _shear(wtr, w, lanes, True, ladder)[:, :, :w]
            sni = _shear(wti, w, lanes, True, ladder)[:, :, :w]
            chr_ = jnp.concatenate([snr, chr_[:, w:, :]], axis=1)
            chi_ = jnp.concatenate([sni, chi_[:, w:, :]], axis=1)
            chr_ = _subroll(chr_, n_sl, chunk, up=False, ladder=ladder)
            chi_ = _subroll(chi_, n_sl, chunk, up=False, ladder=ladder)
            br_out[pl.ds(base, stride * n_sl), :] = chr_.reshape(
                n_sl * chunk, w
            )[: stride * n_sl]
            bi_out[pl.ds(base, stride * n_sl), :] = chi_.reshape(
                n_sl * chunk, w
            )[: stride * n_sl]
            vtr_ref[pl.ds(i, 1), s0 : s0 + n_sl, :] = v_r[None]
            vti_ref[pl.ds(i, 1), s0 : s0 + n_sl, :] = v_i[None]
            taur_ref[pl.ds(i, 1), s0 : s0 + n_sl] = tau_r[:, 0][None]
            taui_ref[pl.ds(i, 1), s0 : s0 + n_sl] = tau_i[:, 0][None]
        return carry

    lax.fori_loop(i32(0), i32(tb), step, i32(0))


@functools.partial(
    jax.jit, static_argnames=("b", "tb", "interpret", "batch3")
)
def bulge_chase_planar_pallas(band_r, band_i, b, tb=96, interpret=False,
                              batch3=False):
    """Planar complex Mosaic bulge chase: the complex twin of
    bulge_chase_pallas (fp32, b % 8 == 0 only).  Same timestep/slot
    storage as ops/sb2st_planar.bulge_chase_planar; apply_q2_planar (or
    its Mosaic twin) replays either version's output.

    ``batch3``: the vmax-batched kernel (one band round trip per 3
    timesteps per plane, bit-identical outputs -- _chase_kernel_b3).

    Returns (d, (e_r, e_i), (vt_r, vt_i), (taut_r, taut_i))."""
    n = band_r.shape[0]
    w = 2 * b
    if band_r.shape[1] != w:
        raise ValueError(f"band must have 2b={w} diagonals, got {band_r.shape[1]}")
    if band_r.dtype != jnp.float32 or band_i.dtype != jnp.float32:
        raise TypeError("planar Mosaic chase is fp32-only; use the XLA chase")
    if (3 * b) % 8 != 0:
        raise ValueError(f"planar Mosaic chase requires 3b % 8 == 0, got b={b}")
    if tb % 3 != 0:
        raise ValueError(f"tb must be a multiple of 3, got {tb}")
    kmax = max((n - 3) // b, 0)
    s_slots = kmax // 3 + 1
    t_total = 3 * (n - 3) + 1 if n > 3 else 1
    stride = 3 * b - 1
    lanes = 128 * (-(-(4 * b - 1) // 128))

    grid = -(-t_total // tb)
    pad_f = 2 * b
    # +2b extra back padding for the batch3 kernel's tail read and
    # deeper ownership-tiled write (same formula as the real entry)
    pad_b = s_slots * stride + w + tb // 3 + 3 * b + 4
    npad = n + pad_f + pad_b
    zero = jnp.zeros((npad, w), jnp.float32)
    bp_r = lax.dynamic_update_slice(zero, band_r, (pad_f, 0))
    bp_i = lax.dynamic_update_slice(zero, band_i, (pad_f, 0))

    # same phase plan as the real kernel (see bulge_chase_pallas)
    n_phases = min(10, grid)
    blocks_per = -(-grid // n_phases)
    phases = []
    for p0 in range(0, grid, blocks_per):
        nblk = min(blocks_per, grid - p0)
        vmax_lo = (p0 * tb) // 3
        vmax_hi = (min((p0 + nblk) * tb, t_total) - 1) // 3
        s_ramp = vmax_hi + 1
        s_tail = (n - 3 - vmax_lo) // stride + 1 if n > 3 else 1
        phases.append((p0, nblk, max(1, min(s_slots, s_ramp, s_tail))))

    const2 = lambda g: (jnp.int32(0), jnp.int32(0))
    ladder = _ladder_choice(interpret)
    vtrs, vtis, taurs, tauis = [], [], [], []
    for p0, nblk, s_p in phases:
        if batch3:
            kernel = functools.partial(
                _chase_kernel_b3, n, b, s_p, stride, tb, t_total, pad_f,
                lanes, p0 * tb, ladder, True,
            )
        else:
            kernel = functools.partial(
                _chase_kernel_planar, n, b, s_p, stride, tb, t_total, pad_f,
                lanes, p0 * tb, ladder,
            )
        band_spec = pl.BlockSpec(
            (npad, w), index_map=const2, memory_space=pltpu.VMEM
        )
        vt_spec = pl.BlockSpec(
            (tb, s_p, b),
            index_map=lambda g: (g, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
        tau_spec = pl.BlockSpec(
            (tb, s_p),
            index_map=lambda g: (g, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[band_spec, band_spec],
            out_specs=[band_spec, band_spec, vt_spec, vt_spec,
                       tau_spec, tau_spec],
            out_shape=[
                jax.ShapeDtypeStruct((npad, w), jnp.float32),
                jax.ShapeDtypeStruct((npad, w), jnp.float32),
                jax.ShapeDtypeStruct((nblk * tb, s_p, b), jnp.float32),
                jax.ShapeDtypeStruct((nblk * tb, s_p, b), jnp.float32),
                jax.ShapeDtypeStruct((nblk * tb, s_p), jnp.float32),
                jax.ShapeDtypeStruct((nblk * tb, s_p), jnp.float32),
            ],
            # band planes aliased in->out: halves the VMEM footprint
            # (4 x (npad, 2b) fp32 buffers exceed VMEM at n = 8192)
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=interpret,
        )(bp_r, bp_i)
        bp_r, bp_i, vt_p_r, vt_p_i, tau_p_r, tau_p_i = out
        if s_p < s_slots:
            padv = ((0, 0), (0, s_slots - s_p), (0, 0))
            padt = ((0, 0), (0, s_slots - s_p))
            vt_p_r = jnp.pad(vt_p_r, padv)
            vt_p_i = jnp.pad(vt_p_i, padv)
            tau_p_r = jnp.pad(tau_p_r, padt)
            tau_p_i = jnp.pad(tau_p_i, padt)
        vtrs.append(vt_p_r)
        vtis.append(vt_p_i)
        taurs.append(tau_p_r)
        tauis.append(tau_p_i)
    cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
    vt_r, vt_i = cat(vtrs), cat(vtis)
    taut_r, taut_i = cat(taurs), cat(tauis)
    out_r = lax.dynamic_slice(bp_r, (pad_f, 0), (n, w))
    out_i = lax.dynamic_slice(bp_i, (pad_f, 0), (n, w))
    d = out_r[:, 0]
    ne = n - 1 if n > 1 else 0
    return (
        d, (out_r[:ne, 1], out_i[:ne, 1]), (vt_r, vt_i), (taut_r, taut_i)
    )


@functools.partial(
    jax.jit, static_argnames=("b", "tb", "interpret", "ablate", "batch3")
)
def bulge_chase_pallas(band, b, tb=96, interpret=False, ablate=None,
                       batch3=False):
    """Pallas counterpart of ops/sb2st.bulge_chase (fp32).

    band: (n, 2b) lower band storage (see sb2st.dense_to_band).
    Returns (d, e, vt, taut) with the same timestep/slot layout as the
    XLA chase; vt's leading dim rounds up to a multiple of ``tb`` (the
    extra timesteps carry tau=0 and replay as no-ops).

    ``ablate`` (None | 'noshear' | 'aligned' | 'nowrite' | 'nomath')
    disables pieces of the per-step work FOR COST ATTRIBUTION ONLY
    (benchmarks/chase_micro.py); every non-None mode returns wrong
    results by design.

    ``batch3`` runs the vmax-batched kernel (_chase_kernel_b3): one band
    round trip per 3 timesteps instead of 3 (requires b % 8 == 0).
    Output-identical schedule; A/B via benchmarks/chase_micro.py.
    """
    n = band.shape[0]
    w = 2 * b
    if band.shape[1] != w:
        raise ValueError(f"band must have 2b={w} diagonals, got {band.shape[1]}")
    if band.dtype != jnp.float32:
        raise TypeError("bulge_chase_pallas is fp32-only; use the XLA chase")
    if tb % 3 != 0:
        raise ValueError(f"tb must be a multiple of 3, got {tb}")
    if batch3 and (b % 8 != 0 or ablate is not None):
        raise ValueError("batch3 requires b % 8 == 0 and ablate=None")
    kmax = max((n - 3) // b, 0)
    s_slots = kmax // 3 + 1
    t_total = 3 * (n - 3) + 1 if n > 3 else 1
    stride = 3 * b - 1
    lanes = 128 * (-(-(4 * b - 1) // 128))

    grid = -(-t_total // tb)
    t3 = grid * tb
    pad_f = 2 * b
    # back padding covers the largest slot read at the largest timestep
    # (start_max + S*stride with start_max <= (t3-1)//3 + 1 + b); +2b
    # more for the batch3 kernel's tail read and deeper write
    pad_b = s_slots * stride + w + tb // 3 + 3 * b + 4
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
    ladder = _ladder_choice(interpret)
    vts, taus = [], []
    for p0, nblk, s_p in phases:
        if batch3:
            kernel = functools.partial(
                _chase_kernel_b3, n, b, s_p, stride, tb, t_total, pad_f,
                lanes, p0 * tb, ladder, False,
            )
        else:
            kernel = functools.partial(
                _chase_kernel, n, b, s_p, stride, tb, t_total, pad_f, lanes,
                ablate, p0 * tb, ladder,
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
