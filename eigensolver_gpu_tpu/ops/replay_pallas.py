"""Pallas bulge-chase replay: apply_q2 with VMEM-resident eigenvectors.

The XLA replay (ops/sb2st.apply_q2) is HBM-traffic bound: every wave
dynamic-slices a (span, m) strip of y out of HBM, runs the window-Q
gemms, and writes the strip back -- at n=8192 that is ~0.5 GB of
read+write PER WAVE across ~500 waves (measured 1060 ms, ~25x the
useful traffic).  Here the whole wave loop runs inside one Mosaic
kernel per m-tile:

* y stays VMEM-RESIDENT across ALL waves of an m-tile -- read from HBM
  once, written back once.  Two staging schemes:
  - RESIDENT (default): y lives in HBM (memory_space=ANY) and each
    m-tile is staged through ONE manually-DMA'd VMEM scratch per plane
    (fetched at wave 0, stored at the last wave).  The pipelined
    scheme's automatic double-buffering charged 2x VMEM per y window
    (4x for the planar pair's in+out), forcing the m-tile down to 128
    at n=8192 planar -- and the replay's cost is ~m_tiles * n_waves *
    slot overhead, measured ~8x above its flop roofline.  Single
    buffering lifts the m-tile bound 4-8x (one fetch costs ~1 ms
    against 100s of ms of waves, so the lost overlap is noise).
  - PIPELINED (EIGSOLVE_REPLAY_PIPELINED=1, or automatic when the
    toolchain rejects the resident probe / the resident tile bound is
    infeasible): grid = (m_tiles, n_waves) with the y block's index
    map ignoring the wave dimension, so Pallas fetches it only when
    the m-tile changes, double-buffered.
* the window-Q matrices (one (P, P) orthogonal block per active slot,
  P = 128) are PRECOMPUTED in one batched XLA pass over all windows
  (window_qs below) -- the per-wave vtv/T-inverse/qform work leaves the
  sequential path entirely -- and streamed into the kernel through FOUR
  parallel BlockSpec entries (one Pallas DMA stream tops out at
  ~71 GB/s on this chip; concurrency = #inputs x double-buffering).
* per wave, each active slot is one (P, P) @ (P, m_tile) MXU dot at a
  dynamically computed (8-aligned) row offset of the resident y; with
  g = 3b = 96, l_win = b+g-1 = 127 fills the 128-lane MXU tile
  (the XLA path's l_win=63 windows ran at ~24% utilization).

Wave geometry matches ops/sb2st.apply_q2 exactly (same schedule, same
active-slot clamping); window validity for ANY g is derived in that
module's docstring.  fp32 only (no Mosaic fp64 dot on this toolchain);
the fp64 two-stage path keeps the XLA replay.

Re-designs the WY back-transform economics of the reference's
dsyevd_gpu.F90:119-128 (cuSOLVER dormtr) for the two-stage reduction
the reference does not have.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eigensolver_gpu_tpu.ops.sb2st import (
    _shift_rows,
    _triu_inv_doubling,
    repack_sweep_major,
)
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range

P = 128  # padded window size: one full MXU tile
N_STREAMS = 4  # parallel qw BlockSpec entries (DMA concurrency)

# escape hatch: force the pipelined (double-buffered BlockSpec) staging
_REPLAY_PIPELINED = bool(os.environ.get("EIGSOLVE_REPLAY_PIPELINED"))


def _resident_mtile(rows, n_plane, m, stream_bytes, m_tile):
    """m-tile for the RESIDENT staging scheme: one single-buffered
    (rows, mt) fp32 VMEM scratch per plane + the double-buffered qw
    streams must fit the VMEM budget.  With m_tile=None (auto) picks
    the largest 128-multiple tile that splits m evenly into the fewest
    tiles (the replay cost is ~per-tile, so fewer is strictly better);
    an explicit m_tile is honored (tests force tiny tiles to exercise
    the tiling).  Returns None when even a 128-wide tile does not fit
    (caller falls back to the pipelined scheme)."""
    budget = 92 * 2**20 - stream_bytes
    bound = budget // (rows * 4 * n_plane)
    if m_tile is not None:
        mt = min(-(-min(m_tile, m) // 8) * 8, bound // 8 * 8)
        return mt if mt >= 8 else None
    for k in range(1, 65):
        cand = -(-(-(-m // k)) // 128) * 128  # round_up(ceil(m/k), 128)
        if cand <= bound:
            return cand
    return None


def _wave_body(n, b, g, n_groups, n_u, n_act4, q4, fy, rows, t, qws, y_refs,
               planar):
    """One replay wave applied to VMEM-resident y plane(s).  Shared by
    the pipelined kernels (y_refs = pipeline output block refs) and the
    resident kernels (y_refs = manually-DMA'd scratch).  The base/clamp
    arithmetic matches the host-side _wave_gather exactly (clamp proof
    in the module docstring of the round-4 kernel)."""
    i32 = jnp.int32
    spacing = i32(g + 2 * b)
    ti = t.astype(i32)
    par = lax.rem(ti, i32(2))
    c0 = i32(n_groups - 1) - lax.div(ti - par, i32(2))
    u_lo = jnp.minimum(jnp.maximum(i32(0), -c0), i32(max(n_u - n_act4, 0)))
    base = (c0 + u_lo) * i32(g) + i32(1) + par * i32(b) \
        + i32(2 * b) * u_lo + i32(fy)
    kmax_i = i32((n - 3) // b if n > 3 else 0)

    for s in range(N_STREAMS):
        qref = qws[s]

        def slot(i, carry, qref=qref, s=s):
            u = u_lo + i32(s * q4) + i
            j = c0 + u
            k = par + i32(2) * u
            a0 = j * i32(g) + k * i32(b)
            # provably 8-aligned: fy = 7 mod 8, g = b = 0 mod 8 make
            # every base = 0 mod 8, and spacing = g+2b = 0 mod 8.
            # Active slots always land in [fy+1, fy+n-2+P); the clamp
            # (8-aligned bounds, so the multiple_of proof survives)
            # keeps INACTIVE slots' never-executed addresses in range.
            r0 = base + (i32(s * q4) + i) * spacing
            r0 = jnp.clip(r0, i32(0), i32(rows - P))
            r0 = pl.multiple_of(r0, 8)

            @pl.when((j >= 0) & (k <= kmax_i) & (a0 <= i32(n - 3)))
            def _():
                dot = lambda a, x: jnp.dot(
                    a, x,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                if planar:
                    yr_o, yi_o = y_refs
                    qcat = qref[0, i]            # (P, 2P) = [Q_r | Q_i]
                    q_r = qcat[:, :P]
                    q_i = qcat[:, P:]
                    br = yr_o[pl.ds(r0, P), :]
                    bi = yi_o[pl.ds(r0, P), :]
                    # Karatsuba: 3 MXU dots per slot instead of 4
                    m1 = dot(q_r, br)
                    m2 = dot(q_i, bi)
                    m3 = dot(q_r + q_i, br + bi)
                    yr_o[pl.ds(r0, P), :] = m1 - m2
                    yi_o[pl.ds(r0, P), :] = m3 - m1 - m2
                else:
                    (y_o,) = y_refs
                    q = qref[0, i]
                    blk = y_o[pl.ds(r0, P), :]
                    y_o[pl.ds(r0, P), :] = dot(q, blk)
            return carry

        lax.fori_loop(i32(0), i32(q4), slot, i32(0))


def _wave_body_twophase(n, b, g, n_groups, n_u, n_act4, q4, fy, rows, t,
                        qws, y_ref, tmp_ref):
    """Two-phase wave for the REAL resident kernel: phase 1 computes
    every active slot's window dot into a per-slot row band of
    ``tmp_ref`` (y is READ-ONLY, so Mosaic can stream the independent
    MXU dots back-to-back instead of stalling on the per-slot
    read-modify-write chain -- the single-phase form measured ~4x above
    its flop roofline at n=8192); phase 2 copies the bands back.
    Equivalent to the single-phase wave because one wave's active
    windows are pairwise DISJOINT: slot spacing g+2b exceeds the window
    span l_win = b+g-1 (the wave-schedule invariant in
    ops/sb2st.apply_q2), so no slot reads rows another slot writes."""
    i32 = jnp.int32
    spacing = i32(g + 2 * b)
    ti = t.astype(i32)
    par = lax.rem(ti, i32(2))
    c0 = i32(n_groups - 1) - lax.div(ti - par, i32(2))
    u_lo = jnp.minimum(jnp.maximum(i32(0), -c0), i32(max(n_u - n_act4, 0)))
    base = (c0 + u_lo) * i32(g) + i32(1) + par * i32(b) \
        + i32(2 * b) * u_lo + i32(fy)
    kmax_i = i32((n - 3) // b if n > 3 else 0)

    def slot_geom(i, s):
        u = u_lo + i32(s * q4) + i
        j = c0 + u
        k = par + i32(2) * u
        a0 = j * i32(g) + k * i32(b)
        r0 = base + (i32(s * q4) + i) * spacing
        r0 = jnp.clip(r0, i32(0), i32(rows - P))
        r0 = pl.multiple_of(r0, 8)
        pred = (j >= 0) & (k <= kmax_i) & (a0 <= i32(n - 3))
        toff = pl.multiple_of((i32(s * q4) + i) * i32(P), P)
        return r0, toff, pred

    for s in range(N_STREAMS):
        qref = qws[s]

        def slot1(i, carry, qref=qref, s=s):
            r0, toff, pred = slot_geom(i, s)

            @pl.when(pred)
            def _():
                q = qref[0, i]
                tmp_ref[pl.ds(toff, P), :] = jnp.dot(
                    q, y_ref[pl.ds(r0, P), :],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            return carry

        lax.fori_loop(i32(0), i32(q4), slot1, i32(0))

    for s in range(N_STREAMS):

        def slot2(i, carry, s=s):
            r0, toff, pred = slot_geom(i, s)

            @pl.when(pred)
            def _():
                y_ref[pl.ds(r0, P), :] = tmp_ref[pl.ds(toff, P), :]
            return carry

        lax.fori_loop(i32(0), i32(q4), slot2, i32(0))


def _replay_kernel_resident(n, b, g, n_groups, n_u, n_act4, q4, fy, rows,
                            n_waves, mt, planar, *refs):
    """RESIDENT staging: y plane(s) arrive as whole (rows, mp) HBM refs
    (memory_space=ANY); each m-tile is DMA'd into single-buffered VMEM
    scratch at wave 0 and stored back at the last wave.  Grid iterates
    the wave dim innermost, so the scratch carries across all waves of
    a tile.  The real kernel additionally carries a (n_act4*P, mt) tmp
    scratch for the two-phase wave (the planar kernel's 3 Karatsuba
    dots per slot amortize the per-slot stall already -- measured at
    its MXU roofline -- so it keeps the single-phase wave)."""
    n_y = 2 if planar else 1
    y_ins = refs[:n_y]
    qws = refs[n_y : n_y + N_STREAMS]
    y_outs = refs[n_y + N_STREAMS : 2 * n_y + N_STREAMS]
    scr = refs[2 * n_y + N_STREAMS :]
    yvs, sems = scr[:n_y], scr[n_y : 2 * n_y]
    tmp = scr[2 * n_y] if not planar else None
    i32 = jnp.int32
    t = pl.program_id(1).astype(i32)
    col0 = pl.program_id(0).astype(i32) * i32(mt)

    @pl.when(t == i32(0))
    def _():
        cps = [
            pltpu.make_async_copy(
                y_ins[p].at[:, pl.ds(col0, mt)], yvs[p], sems[p]
            )
            for p in range(n_y)
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    if planar:
        _wave_body(n, b, g, n_groups, n_u, n_act4, q4, fy, rows, t, qws,
                   yvs, planar=True)
    else:
        _wave_body_twophase(n, b, g, n_groups, n_u, n_act4, q4, fy, rows,
                            t, qws, yvs[0], tmp)

    @pl.when(t == i32(n_waves - 1))
    def _():
        cps = [
            pltpu.make_async_copy(
                yvs[p], y_outs[p].at[:, pl.ds(col0, mt)], sems[p]
            )
            for p in range(n_y)
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()


def _auto_mtile(mt, rows, n_win, stream_bytes):
    """Shrink the replay m-tile until the resident y windows + reflector
    streams fit the VMEM budget.  Each of the n_win (rows, mt) fp32 y
    windows is DOUBLE-buffered by the Pallas pipeline (its index map
    varies over the m grid dim); undercounting that buffering is exactly
    the n=8192 planar OOM found on-chip in round 5 (145.2M used vs the
    chip's 128M vmem)."""
    while mt > 64 and rows * mt * 4 * 2 * n_win + stream_bytes > 100 * 2**20:
        mt //= 2
    return mt


def _geometry(n, b, g):
    """Static wave-schedule geometry (numpy), shared by the gather
    index construction and the kernel's in-kernel base arithmetic.
    Mirrors ops/sb2st.apply_q2."""
    kmax = max((n - 3) // b, 0)
    l_win = b + g - 1
    n_groups = -(-max(n - 2, 1) // g)
    n_u = kmax // 2 + 1
    n_act = min(n_u, -(-(n - 2) // (g + 2 * b)) + 1)
    n_waves = 2 * (n_groups - 1) + kmax + 1
    taus = np.arange(n_waves)
    par = taus % 2
    c0 = n_groups - 1 - (taus - par) // 2
    # NOTE: u_lo (and the row bases) depend on the effective slot count
    # (stream-padded n_act4), so callers compute them themselves.
    return dict(
        kmax=kmax, l_win=l_win, n_groups=n_groups, n_u=n_u, n_act=n_act,
        n_waves=n_waves, par=par, c0=c0,
    )


def _wave_gather(geo, n, b, g, n_act4, kcap):
    """Static gather-index construction shared by window_qs and its
    planar twin: slot i of wave tau -> window (j, k) -> flat index into
    the (kp, nvp, b)-padded sweep-major reflector pack.  The u_lo clamp
    uses the stream-padded slot count n_act4 and MUST match the kernels'
    in-kernel base arithmetic exactly (the clamp proof lives in
    _replay_kernel).  Active slots span [u_lo, u_lo + n_act4) entirely
    (u_lo >= n_u - n_act4 when clamped), so there is NO i < n_act
    restriction here -- the kernel's in-kernel predicate applies every
    window this marks valid.  Invalid slots index zero padding (sweep
    column n_groups*g.., k row kp-1)."""
    kmax, n_groups = geo["kmax"], geo["n_groups"]
    n_u = geo["n_u"]
    nvp = n_groups * g + g
    kp = max(kmax + 2, kcap)
    u_lo = np.minimum(np.maximum(0, -geo["c0"]), max(n_u - n_act4, 0))
    u = u_lo[:, None] + np.arange(n_act4)[None, :]
    jarr = geo["c0"][:, None] + u
    karr = geo["par"][:, None] + 2 * u
    a0 = jarr * g + karr * b
    valid = (jarr >= 0) & (jarr < n_groups) & (karr <= kmax) & (a0 <= n - 3)
    jj = np.where(valid, jarr, n_groups)   # -> zero sweep padding
    kk = np.where(valid, karr, kp - 1)     # -> zero k row
    flat_idx = jnp.asarray(
        (kk[:, :, None] * nvp + jj[:, :, None] * g + np.arange(g)).reshape(-1),
        jnp.int32,
    )
    return nvp, kp, flat_idx


@highest_precision
@functools.partial(jax.jit, static_argnames=("n", "b", "g"))
def window_qs(vt, taut, n, b, g):
    """Precompute every wave-slot's padded window-Q, batched.

    Returns qw (n_waves, n_act4, P, P) fp32 where n_act4 rounds n_act
    up to a multiple of N_STREAMS: qw[tau, i] = [[Q, 0], [0, I]] with Q
    the (l_win, l_win) compact-WY orthogonal block of window
    (j = c0+u_lo+i, k = par+2(u_lo+i)), or the identity for inactive
    slots.  One batched pass over all ~n^2/(2gb) windows -- the
    vtv/T-inverse/qform arithmetic leaves apply_q2's sequential path.
    """
    geo = _geometry(n, b, g)
    kmax, l_win = geo["kmax"], geo["l_win"]
    n_groups, n_act, n_waves = geo["n_groups"], geo["n_act"], geo["n_waves"]
    n_act4 = -(-n_act // N_STREAMS) * N_STREAMS
    nv = max(n - 2, 1)

    v2, t2 = repack_sweep_major(vt, taut, b, n)  # (kcap, nv, b)
    kcap = v2.shape[0]
    # pad: k rows to kmax+2 (last = zeros), sweeps to n_groups*g + g
    nvp, kp, flat_idx = _wave_gather(geo, n, b, g, n_act4, kcap)
    v2p = jnp.pad(v2, ((0, kp - kcap), (0, nvp - nv), (0, 0)))
    t2p = jnp.pad(t2, ((0, kp - kcap), (0, nvp - nv)))
    vblk = jnp.take(v2p.reshape(kp * nvp, b), flat_idx, axis=0).reshape(
        n_waves, n_act4, g, b
    )
    taus = jnp.take(t2p.reshape(kp * nvp), flat_idx, axis=0).reshape(
        n_waves, n_act4, g
    )

    # batched qform over wave chunks (lax.map keeps one traced body)
    chunk = 8
    nwp = -(-n_waves // chunk) * chunk
    vblk = jnp.pad(vblk, ((0, nwp - n_waves), (0, 0), (0, 0), (0, 0)))
    taus = jnp.pad(taus, ((0, nwp - n_waves), (0, 0), (0, 0)))
    eye_g = jnp.eye(g, dtype=jnp.float32)
    eye_l = jnp.eye(l_win, dtype=jnp.float32)
    # identity tail of the (P, P) padding
    r = np.arange(P)
    tail = jnp.asarray(np.diag((r >= l_win).astype(np.float32)))

    def qform(args):
        vb, ts = args  # (chunk, n_act4, g, b), (chunk, n_act4, g)
        w = chunk * n_act4
        vb = vb.reshape(w, g, b)
        ts = ts.reshape(w, g)
        tsafe = jnp.where(ts == 0, 1.0, ts)
        vw = jnp.swapaxes(
            _shift_rows(jnp.pad(vb, ((0, 0), (0, 0), (0, g))), -1, l_win),
            1, 2,
        )  # (w, l_win, g) staircase
        vw = vw * (ts != 0)[:, None, :]
        vtv = jnp.einsum("urs,urt->ust", vw, vw)
        tinv = jnp.triu(vtv, 1) + eye_g[None] / tsafe[:, :, None]
        tv = jnp.einsum("ust,urt->usr", _triu_inv_doubling(tinv), vw)
        q = eye_l[None] - jnp.einsum("urs,usq->urq", vw, tv)
        qp = jnp.pad(q, ((0, 0), (0, P - l_win), (0, P - l_win)))
        qp = qp + tail[None]
        return qp.reshape(chunk, n_act4, P, P)

    qw = lax.map(
        qform,
        (
            vblk.reshape(nwp // chunk, chunk, n_act4, g, b),
            taus.reshape(nwp // chunk, chunk, n_act4, g),
        ),
    ).reshape(nwp, n_act4, P, P)
    return qw[:n_waves]


def _replay_kernel(n, b, g, n_groups, n_u, n_act4, q4, fy, rows, n_waves,
                   *refs):
    """PIPELINED staging, real dtype (see module docstring)."""
    (y_in, *qws), (y_out,) = refs[: 1 + N_STREAMS], refs[1 + N_STREAMS :]
    i32 = jnp.int32
    # all scalar math in explicit int32 pairs: under x64, mixed
    # promotion emits int64 converts Mosaic cannot lower
    t = pl.program_id(1).astype(i32)

    @pl.when(t == i32(0))
    def _():
        y_out[:, :] = y_in[:, :]

    _wave_body(n, b, g, n_groups, n_u, n_act4, q4, fy, rows, t, qws,
               (y_out,), planar=False)


@highest_precision
@functools.partial(jax.jit, static_argnames=("n", "b", "g"))
def window_qs_planar(vt, taut, n, b, g):
    """Planar twin of window_qs: every wave-slot's padded complex
    window-Q as a concatenated (P, 2P) block [Q_r | Q_i].

    Inactive slots hold the identity (Q_r = I, Q_i = 0).  The compact-WY
    identity is T^{-1} = striu(V^H V) + diag(1/tau) (see
    ops/sb2st_planar.apply_q2_planar, whose wave algebra this batches
    off the sequential path)."""
    from eigensolver_gpu_tpu.ops.sb2st_planar import _ptriu_inv_doubling

    vt_r, vt_i = vt
    tt_r, tt_i = taut
    geo = _geometry(n, b, g)
    kmax, l_win = geo["kmax"], geo["l_win"]
    n_groups, n_act, n_waves = geo["n_groups"], geo["n_act"], geo["n_waves"]
    n_act4 = -(-n_act // N_STREAMS) * N_STREAMS
    nv = max(n - 2, 1)

    v2_r, t2_r = repack_sweep_major(vt_r, tt_r, b, n)
    v2_i, t2_i = repack_sweep_major(vt_i, tt_i, b, n)
    kcap = v2_r.shape[0]
    nvp, kp, flat_idx = _wave_gather(geo, n, b, g, n_act4, kcap)
    padv = lambda v: jnp.pad(v, ((0, kp - kcap), (0, nvp - nv), (0, 0)))
    padt = lambda t: jnp.pad(t, ((0, kp - kcap), (0, nvp - nv)))
    v2p_r, v2p_i = padv(v2_r), padv(v2_i)
    t2p_r, t2p_i = padt(t2_r), padt(t2_i)

    take_v = lambda v: jnp.take(
        v.reshape(kp * nvp, b), flat_idx, axis=0
    ).reshape(n_waves, n_act4, g, b)
    take_t = lambda t: jnp.take(
        t.reshape(kp * nvp), flat_idx, axis=0
    ).reshape(n_waves, n_act4, g)
    vb_r, vb_i = take_v(v2p_r), take_v(v2p_i)
    ts_r, ts_i = take_t(t2p_r), take_t(t2p_i)

    chunk = 8
    nwp = -(-n_waves // chunk) * chunk
    pad4 = ((0, nwp - n_waves), (0, 0), (0, 0), (0, 0))
    pad3 = ((0, nwp - n_waves), (0, 0), (0, 0))
    vb_r, vb_i = jnp.pad(vb_r, pad4), jnp.pad(vb_i, pad4)
    ts_r, ts_i = jnp.pad(ts_r, pad3), jnp.pad(ts_i, pad3)
    eye_g = jnp.eye(g, dtype=jnp.float32)
    eye_l = jnp.eye(l_win, dtype=jnp.float32)
    r = np.arange(P)
    tail = jnp.asarray(np.diag((r >= l_win).astype(np.float32)))

    def qform(args):
        vbr, vbi, tsr, tsi = args
        w = chunk * n_act4
        vbr = vbr.reshape(w, g, b)
        vbi = vbi.reshape(w, g, b)
        tsr = tsr.reshape(w, g)
        tsi = tsi.reshape(w, g)
        live = (tsr != 0) | (tsi != 0)
        den = tsr * tsr + tsi * tsi
        safe = jnp.where(live, den, 1.0)
        inv_r = jnp.where(live, tsr / safe, 1.0)   # 1/tau
        inv_i = jnp.where(live, -tsi / safe, 0.0)
        skew = lambda vb: jnp.swapaxes(
            _shift_rows(jnp.pad(vb, ((0, 0), (0, 0), (0, g))), -1, l_win),
            1, 2,
        )
        vw_r = skew(vbr) * live[:, None, :]
        vw_i = skew(vbi) * live[:, None, :]
        vtv_r = jnp.einsum("urs,urt->ust", vw_r, vw_r) + jnp.einsum(
            "urs,urt->ust", vw_i, vw_i
        )
        vtv_i = jnp.einsum("urs,urt->ust", vw_r, vw_i) - jnp.einsum(
            "urs,urt->ust", vw_i, vw_r
        )
        tinv_r = jnp.triu(vtv_r, 1) + eye_g[None] * inv_r[:, :, None]
        tinv_i = jnp.triu(vtv_i, 1) + eye_g[None] * inv_i[:, :, None]
        ti_r, ti_i = _ptriu_inv_doubling(tinv_r, tinv_i)
        tv_r = jnp.einsum("ust,urt->usr", ti_r, vw_r) + jnp.einsum(
            "ust,urt->usr", ti_i, vw_i
        )
        tv_i = jnp.einsum("ust,urt->usr", ti_i, vw_r) - jnp.einsum(
            "ust,urt->usr", ti_r, vw_i
        )
        q_r = eye_l[None] - (
            jnp.einsum("urs,usq->urq", vw_r, tv_r)
            - jnp.einsum("urs,usq->urq", vw_i, tv_i)
        )
        q_i = -(
            jnp.einsum("urs,usq->urq", vw_r, tv_i)
            + jnp.einsum("urs,usq->urq", vw_i, tv_r)
        )
        qp_r = jnp.pad(q_r, ((0, 0), (0, P - l_win), (0, P - l_win))) + tail[None]
        qp_i = jnp.pad(q_i, ((0, 0), (0, P - l_win), (0, P - l_win)))
        qcat = jnp.concatenate([qp_r, qp_i], axis=2)  # (w, P, 2P)
        return qcat.reshape(chunk, n_act4, P, 2 * P)

    qw = lax.map(
        qform,
        (
            vb_r.reshape(nwp // chunk, chunk, n_act4, g, b),
            vb_i.reshape(nwp // chunk, chunk, n_act4, g, b),
            ts_r.reshape(nwp // chunk, chunk, n_act4, g),
            ts_i.reshape(nwp // chunk, chunk, n_act4, g),
        ),
    ).reshape(nwp, n_act4, P, 2 * P)
    return qw[:n_waves]


def _replay_kernel_planar(n, b, g, n_groups, n_u, n_act4, q4, fy, rows,
                          n_waves, *refs):
    """PIPELINED staging, planar pair (see module docstring)."""
    (yr_in, yi_in, *qws), (yr_out, yi_out) = (
        refs[: 2 + N_STREAMS], refs[2 + N_STREAMS :],
    )
    i32 = jnp.int32
    t = pl.program_id(1).astype(i32)

    @pl.when(t == i32(0))
    def _():
        yr_out[:, :] = yr_in[:, :]
        yi_out[:, :] = yi_in[:, :]

    _wave_body(n, b, g, n_groups, n_u, n_act4, q4, fy, rows, t, qws,
               (yr_out, yi_out), planar=True)


@highest_precision
@functools.partial(
    jax.jit, static_argnames=("n", "b", "g", "m_tile", "interpret")
)
def apply_q2_planar_pallas(vt, taut, y, n, b, g=None, m_tile=None,
                           interpret=False):
    """Planar y <- Q2 y, Mosaic replay (fp32): drop-in for
    ops/sb2st_planar.apply_q2_planar on the fp32 TPU path.  vt/taut/y
    are (re, im) pairs; same wave schedule and constraints as
    apply_q2_pallas, with both y planes VMEM-resident and each active
    slot a 3-dot Karatsuba window product.  m_tile=None picks the
    staging scheme's largest feasible tile (module docstring)."""
    if g is None:
        g = 3 * b
    if g % 8 or b % 8:
        raise ValueError(f"need 8 | g and 8 | b, got g={g}, b={b}")
    if b + g - 1 > P:
        raise ValueError(f"l_win={b+g-1} exceeds padded window {P}")
    y_r, y_i = y
    if y_r.dtype != jnp.float32:
        raise TypeError("apply_q2_planar_pallas is fp32-only")
    geo = _geometry(n, b, g)
    n_act, n_waves, n_u = geo["n_act"], geo["n_waves"], geo["n_u"]
    n_groups = geo["n_groups"]
    n_act4 = -(-n_act // N_STREAMS) * N_STREAMS
    q4 = n_act4 // N_STREAMS

    fy = 7
    rows = -(-(fy + n + P + 8) // 8) * 8

    m = y_r.shape[1]
    stream_bytes = 8 * q4 * P * 2 * P * 4
    from eigensolver_gpu_tpu.utils.kernel_guard import kernel_ok

    resident = not _REPLAY_PIPELINED and (
        interpret or kernel_ok("replay_resident")
    )
    mt = _resident_mtile(rows, 2, m, stream_bytes, m_tile) if resident \
        else None
    if mt is None:
        resident = False
        mt = min(m_tile or 512, -(-m // 8) * 8)
        # 4 y windows (2 planes x in+out) + the 4 double-buffered
        # [Qr|Qi] streams (see _auto_mtile for the accounting)
        mt = _auto_mtile(mt, rows, 4, stream_bytes)
    mp = -(-m // mt) * mt
    zero = jnp.zeros((rows, mp), jnp.float32)
    yp_r = lax.dynamic_update_slice(zero, y_r, (fy, 0))
    yp_i = lax.dynamic_update_slice(zero, y_i, (fy, 0))

    with trace_range("apply_q2_planar_pallas_qs"):
        qw = window_qs_planar(vt, taut, n, b, g)  # (n_waves, n_act4, P, 2P)

    qw_specs = [
        pl.BlockSpec(
            (1, q4, P, 2 * P),
            index_map=lambda i, t: (t, jnp.int32(0), jnp.int32(0),
                                    jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
        for _ in range(N_STREAMS)
    ]
    if resident:
        kernel = functools.partial(
            _replay_kernel_resident, n, b, g, n_groups, n_u, n_act4, q4,
            fy, rows, n_waves, mt, True,
        )
        y_any = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [y_any, y_any] + qw_specs
        out_specs = [y_any, y_any]
        scratch = [
            pltpu.VMEM((rows, mt), jnp.float32),
            pltpu.VMEM((rows, mt), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        kernel = functools.partial(
            _replay_kernel_planar, n, b, g, n_groups, n_u, n_act4, q4, fy,
            rows, n_waves,
        )
        y_spec = pl.BlockSpec(
            (rows, mt),
            index_map=lambda i, t: (jnp.int32(0), i),
            memory_space=pltpu.VMEM,
        )
        in_specs = [y_spec, y_spec] + qw_specs
        out_specs = [y_spec, y_spec]
        scratch = []
    with trace_range("apply_q2_planar_pallas"):
        out = pl.pallas_call(
            kernel,
            grid=(mp // mt, n_waves),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((rows, mp), jnp.float32),
                jax.ShapeDtypeStruct((rows, mp), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            yp_r, yp_i,
            *[qw[:, s * q4 : (s + 1) * q4] for s in range(N_STREAMS)],
        )
    return (
        lax.dynamic_slice(out[0], (fy, 0), (n, m)),
        lax.dynamic_slice(out[1], (fy, 0), (n, m)),
    )


@highest_precision
@functools.partial(
    jax.jit, static_argnames=("n", "b", "g", "m_tile", "interpret")
)
def apply_q2_pallas(vt, taut, y, n, b, g=None, m_tile=None, interpret=False):
    """y <- Q2 y, Mosaic replay (fp32). Drop-in for ops/sb2st.apply_q2
    on the fp32 TPU path; same reflector storage, same wave schedule.

    g defaults to 3b (l_win = 4b-1 = 127 at b=32: a full MXU tile).
    Requires g % 8 == 0 and b % 8 == 0 (all wave bases are then
    8-aligned sublane offsets) and l_win <= 128.  m_tile=None picks the
    staging scheme's largest feasible tile (module docstring).
    """
    if g is None:
        g = 3 * b
    if g % 8 or b % 8:
        raise ValueError(f"need 8 | g and 8 | b, got g={g}, b={b}")
    if b + g - 1 > P:
        raise ValueError(f"l_win={b+g-1} exceeds padded window {P}")
    if y.dtype != jnp.float32:
        raise TypeError("apply_q2_pallas is fp32-only; use the XLA replay")
    geo = _geometry(n, b, g)
    n_act, n_waves, n_u = geo["n_act"], geo["n_waves"], geo["n_u"]
    n_groups = geo["n_groups"]
    n_act4 = -(-n_act // N_STREAMS) * N_STREAMS
    q4 = n_act4 // N_STREAMS

    # front pad: ACTIVE slots always have row base a0+1 >= 1, so fy only
    # needs the alignment invariant (fy = 7 mod 8 -> every base = 0 mod
    # 8); inactive slots' addresses are clamped in-kernel and never
    # dereferenced. Rows cover the active span [fy+1, fy+n-2+P).
    fy = 7
    rows = -(-(fy + n + P + 8) // 8) * 8

    m = y.shape[1]
    stream_bytes = 8 * q4 * P * P * 4
    from eigensolver_gpu_tpu.utils.kernel_guard import kernel_ok

    resident = not _REPLAY_PIPELINED and (
        interpret or kernel_ok("replay_resident")
    )
    # the two-phase wave's (n_act4*P, mt) tmp scratch scales with mt
    # exactly like an extra n_act4*P rows of y
    mt = _resident_mtile(rows + n_act4 * P, 1, m, stream_bytes, m_tile) \
        if resident else None
    if mt is None:
        resident = False
        mt = min(m_tile or 512, -(-m // 8) * 8)
        # auto-shrink the m-tile until the resident-y (in+out, double-
        # buffered by the pipeline) + qw stream buffers fit VMEM
        mt = _auto_mtile(mt, rows, 2, stream_bytes)
    mp = -(-m // mt) * mt
    y_p = jnp.zeros((rows, mp), jnp.float32)
    y_p = lax.dynamic_update_slice(y_p, y, (fy, 0))

    with trace_range("apply_q2_pallas_qs"):
        qw = window_qs(vt, taut, n, b, g)  # (n_waves, n_act4, P, P)

    qw_specs = [
        pl.BlockSpec(
            (1, q4, P, P),
            index_map=lambda i, t: (t, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
        for _ in range(N_STREAMS)
    ]
    if resident:
        kernel = functools.partial(
            _replay_kernel_resident, n, b, g, n_groups, n_u, n_act4, q4,
            fy, rows, n_waves, mt, False,
        )
        y_any = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [y_any] + qw_specs
        out_specs = [y_any]
        scratch = [
            pltpu.VMEM((rows, mt), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((n_act4 * P, mt), jnp.float32),  # two-phase tmp
        ]
    else:
        kernel = functools.partial(
            _replay_kernel, n, b, g, n_groups, n_u, n_act4, q4, fy, rows,
            n_waves,
        )
        y_spec = pl.BlockSpec(
            (rows, mt),
            index_map=lambda i, t: (jnp.int32(0), i),
            memory_space=pltpu.VMEM,
        )
        in_specs = [y_spec] + qw_specs
        out_specs = [y_spec]
        scratch = []
    with trace_range("apply_q2_pallas"):
        out = pl.pallas_call(
            kernel,
            grid=(mp // mt, n_waves),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((rows, mp), jnp.float32)],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            y_p,
            *[qw[:, s * q4 : (s + 1) * q4] for s in range(N_STREAMS)],
        )[0]
    return lax.dynamic_slice(out, (fy, 0), (n, m))
