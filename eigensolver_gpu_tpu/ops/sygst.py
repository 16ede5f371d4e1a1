"""Reduction of the generalized problem to standard form (sygst/hegst).

Given ``B = U^H U`` (upper Cholesky) and symmetric/Hermitian ``A``, computes
``C = U^{-H} A U^{-1}`` so that ``A x = lambda B x`` becomes
``C y = lambda y`` with ``x = U^{-1} y`` (ITYPE=1, UPLO='U').

Reference: dsygst_gpu.F90:31-100 / zhegst_gpu.F90:31-111 — a blocked
recurrence (nb=448) of trsm/gemm/syr2k(her2k) steps with a two-CUDA-stream
lookahead overlapping the diagonal-block solve of step k+1 with the trailing
update of step k (dsygst_gpu.F90:48-93).

TPU-native re-design: two whole-matrix triangular solves
(``sygst_full``) — XLA's `triangular_solve` is internally blocked and
MXU-lowered, and the XLA scheduler owns any overlap (no streams/events
needed) — plus a reference-shaped blocked recurrence (``sygst_blocked``)
trace-unrolled over 128-aligned blocks for large-N / sharded use where the
trailing-update gemms dominate and pipeline better.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _tsolve(u, b, *, left, trans):
    """x with op(U) x = b (left) or x op(U) = b (right); U upper triangular."""
    return lax.linalg.triangular_solve(
        u, b, left_side=left, lower=False, transpose_a=trans, conjugate_a=trans
    )


@highest_precision
def sygst_full(a, u):
    """Whole-matrix C = U^{-H} A U^{-1} via two triangular solves."""
    with trace_range("sygst_full"):
        x = _tsolve(u, a, left=True, trans=True)  # X = U^{-H} A
        c = _tsolve(u, x, left=False, trans=False)  # C = X U^{-1}
        return (c + jnp.conjugate(c.T)) / 2


@highest_precision
def sygst_blocked(a, u, nb=512, n_buckets=4):
    """Blocked LAPACK-style recurrence (dsygst_gpu.F90:50-96 shape).

    Per block k (size nb): transform the diagonal block, then update the
    trailing panel with trsm -> gemm(-1/2) -> her2k -> gemm(-1/2) -> trsm.

    Compile-time is bounded for any n: blocks are grouped into at most
    ``n_buckets`` contiguous buckets, each one traced `lax.fori_loop`
    whose active region is the (static) bucket-start-to-end trailing
    square; inside, trailing extents are handled by column masks and a
    block-diagonal [I, U_tt] solve instead of dynamic shapes. (The round-1
    version trace-unrolled n/nb block bodies -- 32 instances at n=16384
    on a remote compiler with minutes-scale latency.)
    """
    n = a.shape[0]
    dt = a.dtype
    a = (a + jnp.conjugate(a.T)) / 2
    nblocks = -(-n // nb)
    npad = nblocks * nb
    if npad != n:
        # zero-pad A, identity-pad U: padded coordinates stay decoupled
        # and carry zeros through every update.
        pad = npad - n
        a = jnp.pad(a, ((0, pad), (0, pad)))
        u = jnp.pad(u, ((0, pad), (0, pad)))
        u = u.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)

    with trace_range("sygst_blocked"):
        per = -(-nblocks // n_buckets)  # blocks per bucket
        starts = list(range(0, nblocks, per))
        for s in starts:
            lo = s * nb
            m = npad - lo  # static within this bucket
            aa = lax.dynamic_slice(a, (lo, lo), (m, m))
            uu = lax.dynamic_slice(u, (lo, lo), (m, m))
            cols = lax.broadcasted_iota(jnp.int32, (1, m), 1)[0]
            eye_m = jnp.eye(m, dtype=dt)
            nblk_here = min(per, nblocks - s)

            def block_step(j, aa, uu=uu, cols=cols, eye_m=eye_m, m=m):
                k = j * nb  # offset of this block inside aa
                akk = lax.dynamic_slice(aa, (k, k), (nb, nb))
                ukk = lax.dynamic_slice(uu, (k, k), (nb, nb))
                # Diagonal block: U_kk^{-H} A_kk U_kk^{-1} (two ztrsm on
                # the nb x nb block, dsygst_gpu.F90:67-70).
                akk = _tsolve(ukk, akk, left=True, trans=True)
                akk = _tsolve(ukk, akk, left=False, trans=False)
                akk = (akk + jnp.conjugate(akk.T)) / 2

                # Trailing panel update (dsygst_gpu.F90:76-93), full-width
                # row strips with the leading columns masked off.
                trail = cols >= k + nb  # (m,)
                art = lax.dynamic_slice(aa, (k, 0), (nb, m))
                urt = lax.dynamic_slice(uu, (k, 0), (nb, m))
                zero = jnp.zeros((), dt)
                akt = jnp.where(trail[None, :], art, zero)
                ukt = jnp.where(trail[None, :], urt, zero)
                akt = _tsolve(ukk, akt, left=True, trans=True)
                akt = akt - 0.5 * akk @ ukt
                upd = jnp.conjugate(akt.T) @ ukt
                upd = upd + jnp.conjugate(upd.T)
                box = trail[:, None] & trail[None, :]
                aa = jnp.where(box, aa - upd, aa)
                aa = jnp.where(box, (aa + jnp.conjugate(aa.T)) / 2, aa)
                akt = akt - 0.5 * akk @ ukt
                # right-solve against U_tt via the block-diagonal
                # [I, U_tt] embedding (akt's leading columns are zero, so
                # the identity block passes them through untouched)
                u_bd = jnp.where(box, uu, eye_m)
                akt = _tsolve(u_bd, akt, left=False, trans=False)

                # write back: row strip (prior columns kept, akk on the
                # diagonal, akt on the trailing), then the symmetric
                # column strip below the diagonal block.
                strip = jnp.where(trail[None, :], akt, art)
                strip = lax.dynamic_update_slice(strip, akk, (0, k))
                aa = lax.dynamic_update_slice(aa, strip, (k, 0))
                colstrip = lax.dynamic_slice(aa, (0, k), (m, nb))
                colstrip = jnp.where(
                    trail[:, None], jnp.conjugate(akt.T), colstrip
                )
                aa = lax.dynamic_update_slice(aa, colstrip, (0, k))
                return aa

            aa = lax.fori_loop(0, nblk_here, block_step, aa)
            a = lax.dynamic_update_slice(a, aa, (lo, lo))
        return a[:n, :n]


@highest_precision
def sygst_inv(a, u, nb=512):
    """C = U^{-H} A U^{-1} via the inverse-diagonal blocked solves
    (ops/trsm.py scheme): both triangular solves become n/nb static-
    sliced steps of one correction gemm + one block gemm each.

    Why (measured, config-5 artifact): XLA's whole-matrix solves keep
    O(n) full-width temps alive, and sygst_blocked's fori_loop does
    traced dynamic slices on sharded operands (which the SPMD
    partitioner answers with replicated copies) plus an (m, m)
    block-diagonal XLA solve per step -- together the largest per-device
    memory stage at n=16384 (4.65 GB).  Static slices keep every gemm
    partitionable and bound temps to a few nb-wide strips.

    Forward error ~eps * kappa(U_block) per solve (explicit block
    inverses): fp32-pipeline use only, where the fp64 refinement
    absorbs it; the fp64 path keeps sygst_full/sygst_blocked.
    """
    from eigensolver_gpu_tpu.ops.trsm import upper_block_inverses

    n = a.shape[0]
    with trace_range("sygst_inv"):
        inv = upper_block_inverses(u, nb)
        # X = U^{-H} A: forward substitution over row blocks
        x = jnp.zeros_like(a)
        for k in range(n // nb):
            k0, k1 = k * nb, k * nb + nb
            rhs = a[k0:k1]
            if k0 > 0:
                rhs = rhs - jnp.conj(u[:k0, k0:k1].T) @ x[:k0]
            x = x.at[k0:k1].set(jnp.conj(inv[k].T) @ rhs)
        # C = X U^{-1}: column blocks left to right
        c = jnp.zeros_like(a)
        for k in range(n // nb):
            k0, k1 = k * nb, k * nb + nb
            rhs = x[:, k0:k1]
            if k0 > 0:
                rhs = rhs - c[:, :k0] @ u[:k0, k0:k1]
            c = c.at[:, k0:k1].set(rhs @ inv[k])
        return (c + jnp.conjugate(c.T)) / 2


def sygst(a, u, mode="full", nb=512):
    """Dispatch: 'full' (two whole-matrix trsm), 'blocked' recurrence,
    or 'inv' (inverse-diagonal blocked solves, fp32 pipelines)."""
    if mode == "full":
        return sygst_full(a, u)
    if mode == "inv":
        return sygst_inv(a, u, nb=nb)
    return sygst_blocked(a, u, nb=nb)
