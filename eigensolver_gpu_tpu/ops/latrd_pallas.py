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

VMEM layout note: every buffer's lane dimension pads to 128, so the
six (mb, nb=32) panels are PACKED into one (mb, 6*nb) output and the
six (mb, 1) work vectors into one (mb, 8) scratch -- unpacked they
cost 24 MB of VMEM at mb=4096, packed ~6 MB (the scoped limit is 16).

The sequential (column, tile) grid gives a stronger ordering guarantee
than the reference's `atomicinc(finished)` barrier, bitwise-
deterministically. fp32 only (Mosaic has no fp64 in-kernel dot); the
fp64 path keeps the XLA loop.

MEASURED RESULT (round 2, real chip, mb=4096 panel): 31-38 ms/panel
across every variant tried -- MXU dots with skinny rhs, VPU
multiply+lane-reduce, lane-folded reduction, 1..8 DMA streams, tiles
128..512 -- exactly at parity with the XLA compiled loop (32 ms). The
panel is gemv-throughput-bound on this chip (~140 GB/s effective for
sequential matvec-shaped sweeps however expressed; a single Pallas DMA
stream tops at ~71 GB/s and concurrency only scales across distinct
HBM buffers). The kernel is therefore NOT the default (use_pallas
gates it); it stays as the compiled-kernel counterpart of the
reference's fused zlatrd chain and as the vehicle for these platform
measurements (CLAUDE.md facts 8-9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane offsets into the packed panel output: [vr vi wr wi colr coli]
_VR, _VI, _WR, _WI, _CR, _CI = range(6)
# lane offsets into the packed vector scratch
_ACR, _ACI, _YR, _YI, _VCR, _VCI = range(6)


def _phase(pe, g, nb, nsplit, pan_ref, scal_ref, vec, rowv, smem):
    """Column-phase work at tile 0 of grid step g (see module docstring)."""
    mb = vec.shape[0]
    mq = mb // nsplit
    rows = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    f1 = jnp.float32(1.0)
    P = lambda j: pan_ref[:, j * nb : (j + 1) * nb]  # packed panel slab
    # precision=HIGHEST: in-kernel f32 dots default to 1-pass bf16 on
    # the real Mosaic toolchain (see ops/symv_pallas.py); the compact-WY
    # corrections are exactly where bf16 would break orthogonality
    _hi = jax.lax.Precision.HIGHEST
    mm = lambda p, x: jnp.dot(
        p, x, preferred_element_type=jnp.float32, precision=_hi
    )
    ctr = lambda p, x: jax.lax.dot_general(
        p, x, (((0,), (0,)), ((), ())), precision=_hi
    )  # (mb, nb)^T @ (mb, 1) -> (nb, 1)

    # ---- (a) finalize w for slot g-2 (its y swept at step g-1) ----
    @pl.when(g >= 2)
    def _():
        s = g - 2
        onehot_s = (slot_lane == s).astype(jnp.float32)  # (1, nb)
        v_r = jax.lax.dot_general(
            P(_VR), onehot_s, (((1,), (1,)), ((), ())), precision=_hi
        )
        v_i = jax.lax.dot_general(
            P(_VI), onehot_s, (((1,), (1,)), ((), ())), precision=_hi
        )
        # y -= V (W^H v) + W (V^H v)   (planar compact-WY correction)
        wv_r = ctr(P(_WR), v_r) + ctr(P(_WI), v_i)  # (W^H v)_r
        wv_i = ctr(P(_WR), v_i) - ctr(P(_WI), v_r)
        vv_r = ctr(P(_VR), v_r) + ctr(P(_VI), v_i)
        vv_i = ctr(P(_VR), v_i) - ctr(P(_VI), v_r)
        y_r = vec[:, _YR:_YR + 1] - (
            mm(P(_VR), wv_r) - mm(P(_VI), wv_i)
            + mm(P(_WR), vv_r) - mm(P(_WI), vv_i)
        )
        y_i = vec[:, _YI:_YI + 1] - (
            mm(P(_VR), wv_i) + mm(P(_VI), wv_r)
            + mm(P(_WR), vv_i) + mm(P(_WI), vv_r)
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
        pan_ref[:, _WR * nb : (_WR + 1) * nb] += (w_r * keep) * onehot_s
        pan_ref[:, _WI * nb : (_WI + 1) * nb] += (w_i * keep) * onehot_s

    # ---- (b) prepare column slot g-1: corrections + larfg + writes ----
    @pl.when((g >= 1) & (g <= nb))
    def _():
        s = g - 1
        cj = pe - 1 - s
        onehot_s = (slot_lane == s).astype(jnp.float32)
        # panel row cj of [W V] (the zlacgv'd gemv pair, conj'd below)
        rowmask = (rows == cj).astype(jnp.float32)  # (mb, 1)
        wrow_r = ctr(P(_WR), rowmask)
        wrow_i = ctr(P(_WI), rowmask)
        vrow_r = ctr(P(_VR), rowmask)
        vrow_i = ctr(P(_VI), rowmask)
        # acol -= V conj(wrow) + W conj(vrow)
        a_r = vec[:, _ACR:_ACR + 1] - (
            mm(P(_VR), wrow_r) + mm(P(_VI), wrow_i)
            + mm(P(_WR), vrow_r) + mm(P(_WI), vrow_i)
        )
        a_i = vec[:, _ACI:_ACI + 1] - (
            mm(P(_VI), wrow_r) - mm(P(_VR), wrow_i)
            + mm(P(_WI), vrow_r) - mm(P(_WR), vrow_i)
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

        pan_ref[:, _VR * nb : (_VR + 1) * nb] += v_r * onehot_s
        pan_ref[:, _VI * nb : (_VI + 1) * nb] += v_i * onehot_s
        # row-vector copies feed the VPU matvec in the tile sweep: ONE
        # SUBLANE ROW PER COLUMN-QUARTER (rows 0..nsplit-1 = v_r
        # quarters, nsplit..2*nsplit-1 = v_i quarters) so every sweep
        # read is at lane offset 0 -- Mosaic rejects broadcasting a
        # (1, mq) slice taken at a non-zero vreg lane offset ("Invalid
        # input layout", round-5 on-chip at mb=256/mq=128)
        rowv[0:nsplit, :] = v_r.reshape(nsplit, mq)
        rowv[nsplit : 2 * nsplit, :] = v_i.reshape(nsplit, mq)
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
        pan_ref[:, _CR * nb : (_CR + 1) * nb] += new_r * onehot_s
        pan_ref[:, _CI * nb : (_CI + 1) * nb] += new_i * onehot_s
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


_NSPLIT = 4  # column-quarter input splits (parallel DMA streams)


def _nsplit_for(mb):
    """Largest split <= _NSPLIT whose quarter width keeps every lane
    slice vreg-aligned (mq % 128 == 0). Mosaic rejects broadcasting a
    (1, mq) row sliced at a lane offset that is not a multiple of 128
    ("Invalid input layout" on vector.broadcast -- first observed on
    the round-5 on-chip smoke at mb=256, where mq=64 put quarter 1 at
    lane offset 64). Production buckets (mb % 512 == 0) keep the full
    4-way split; small shapes degrade to fewer DMA streams, which only
    costs bandwidth concurrency they do not need."""
    ns = _NSPLIT
    while ns > 1 and (mb % ns != 0 or (mb // ns) % 128 != 0):
        ns //= 2
    return ns


def _latrd_kernel(nb, tile, nsplit, *refs):
    pe_ref = refs[0]
    a_refs = refs[1 : 1 + 2 * nsplit]  # ar quarters then ai quarters
    pan_ref, scal_ref, vec, rowv, smem = refs[1 + 2 * nsplit :]
    g = pl.program_id(0)
    i = pl.program_id(1)
    pe = pe_ref[0, 0]
    mb = vec.shape[0]
    mq = mb // nsplit

    @pl.when((g == 0) & (i == 0))
    def _():
        pan_ref[:, :] = jnp.zeros_like(pan_ref)
        scal_ref[:, :] = jnp.zeros_like(scal_ref)
        vec[:, :] = jnp.zeros_like(vec)
        rowv[:, :] = jnp.zeros_like(rowv)

    @pl.when(i == 0)
    def _():
        _phase(pe, g, nb, nsplit, pan_ref, scal_ref, vec, rowv, smem)

    # ---- tile sweep: y = A v (slot g-1) and raw a_col (slot g) ----
    # VPU formulation: an MXU dot with an (mb, 3) rhs runs at 1/42 lane
    # utilization (measured: gemv-bound 35 ms/panel); elementwise
    # multiply + lane-reduction hits the VPU's full 8x128 width. Each
    # planar array arrives as _NSPLIT column-quarter inputs because one
    # Pallas DMA stream tops out at ~71 GB/s on the target chip
    # (measured; XLA's own ops use many parallel streams) -- 8 streams
    # recover most of the HBM bandwidth.
    @pl.when(g <= nb)
    def _():
        cj_next = pe - 1 - g  # column whose raw a_col this sweep gathers
        lanes_q = jax.lax.broadcasted_iota(jnp.int32, (1, mq), 1)
        # lane-fold reduction: cross-lane shuffles are expensive on the
        # VPU, so fold each (tile, mq) product into (tile, 128) with
        # plain vreg adds and pay ONE narrow cross-lane reduce per
        # output at the end of the quarter loop.
        if mq % 128 == 0:
            fold = lambda x: jnp.sum(
                x.reshape(tile, mq // 128, 128), axis=1
            )  # (tile, 128)
        else:  # small buckets: quarter narrower than one vreg row
            fold = lambda x: jnp.sum(x, axis=1, keepdims=True)
        y_r = y_i = ac_r = ac_i = None
        for qx in range(nsplit):
            arq = a_refs[qx][:, :]
            aiq = a_refs[nsplit + qx][:, :]
            lo = qx * mq
            # quarter rows of v + per-quarter one-hot: everything the
            # (tile, mq) broadcasts consume sits at lane offset 0
            vrq = rowv[qx : qx + 1, :]
            viq = rowv[nsplit + qx : nsplit + qx + 1, :]
            ohq = (lanes_q == cj_next - lo).astype(jnp.float32)
            t0 = fold(arq * vrq - aiq * viq)
            t1 = fold(arq * viq + aiq * vrq)
            t2 = fold(arq * ohq)
            t3 = fold(aiq * ohq)
            y_r = t0 if y_r is None else y_r + t0
            y_i = t1 if y_i is None else y_i + t1
            ac_r = t2 if ac_r is None else ac_r + t2
            ac_i = t3 if ac_i is None else ac_i + t3
        red = lambda x: jnp.sum(x, axis=1, keepdims=True)
        sl = pl.ds(i * tile, tile)
        vec[sl, _YR:_YR + 1] = red(y_r)
        vec[sl, _YI:_YI + 1] = red(y_i)
        vec[sl, _ACR:_ACR + 1] = red(ac_r)
        vec[sl, _ACI:_ACI + 1] = red(ac_i)


@functools.partial(
    jax.jit, static_argnames=("nb", "tile", "interpret")
)
def latrd_panel_planar(ar_mb, ai_mb, panel_end, nb=32, tile=128,
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

    nsplit = _nsplit_for(mb)
    mq = mb // nsplit
    kernel = functools.partial(_latrd_kernel, nb, tile, nsplit)
    const = lambda g, i: (jnp.int32(0), jnp.int32(0))
    # each quarter is its OWN operand buffer: a column slice of a bigger
    # array is non-contiguous, so XLA materializes a distinct buffer per
    # quarter -- which is what buys DMA concurrency (measured: streams
    # from the same buffer serialize at ~71 GB/s; 4 distinct buffers
    # scale ~linearly)
    quarter_specs = [
        pl.BlockSpec(
            (tile, mq),
            index_map=lambda g, i: (i, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
        for q in range(nsplit)
    ]
    pan, scal = pl.pallas_call(
        kernel,
        grid=(nb + 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), index_map=const, memory_space=pltpu.SMEM),
        ]
        + quarter_specs
        + quarter_specs,
        out_specs=[
            pl.BlockSpec((mb, 6 * nb), index_map=const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nb), index_map=const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mb, 6 * nb), f32),
            jax.ShapeDtypeStruct((4, nb), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mb, 8), f32),  # packed work vectors (lanes 0..3)
            # v row copies, ONE SUBLANE ROW PER QUARTER (offset-0 reads)
            pltpu.VMEM((8, mb // nsplit), f32),
            pltpu.SMEM((2, nb), f32),  # tau_r, tau_i per slot
        ],
        # the default scoped-vmem limit (16M) undercounts the phase's
        # live (mb, nb)-slice temporaries; the chip has 128M
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        pe,
        *[ar_mb[:, q * mq : (q + 1) * mq] for q in range(nsplit)],
        *[ai_mb[:, q * mq : (q + 1) * mq] for q in range(nsplit)],
    )
    sl = lambda j: pan[:, j * nb : (j + 1) * nb]
    return sl(_VR), sl(_VI), sl(_WR), sl(_WI), sl(_CR), sl(_CI), scal
