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
def sygst_blocked(a, u, nb=512):
    """Blocked LAPACK-style recurrence (dsygst_gpu.F90:50-96 shape).

    Per block k (size kb): transform the diagonal block, then update the
    trailing panel with trsm -> gemm(-1/2) -> her2k -> gemm(-1/2) -> trsm.
    Trace-unrolled (n/nb iterations of static shapes); XLA overlaps the
    independent products the way the reference's stream2 lookahead does.
    """
    n = a.shape[0]
    a = (a + jnp.conjugate(a.T)) / 2
    with trace_range("sygst_blocked"):
        for k in range(0, n, nb):
            kb = min(nb, n - k)
            akk = a[k : k + kb, k : k + kb]
            ukk = u[k : k + kb, k : k + kb]
            # Diagonal block: U_kk^{-H} A_kk U_kk^{-1} (reference does two
            # ztrsm on the kb x kb block, dsygst_gpu.F90:67-70).
            akk = _tsolve(ukk, akk, left=True, trans=True)
            akk = _tsolve(ukk, akk, left=False, trans=False)
            akk = (akk + jnp.conjugate(akk.T)) / 2
            a = a.at[k : k + kb, k : k + kb].set(akk)
            if k + kb < n:
                # Trailing panel update (dsygst_gpu.F90:76-93):
                akt = a[k : k + kb, k + kb :]
                ukt = u[k : k + kb, k + kb :]
                utt = u[k + kb :, k + kb :]
                akt = _tsolve(ukk, akt, left=True, trans=True)
                akt = akt - 0.5 * akk @ ukt
                att = a[k + kb :, k + kb :]
                att = att - jnp.conjugate(akt.T) @ ukt - jnp.conjugate(ukt.T) @ akt
                att = (att + jnp.conjugate(att.T)) / 2
                a = a.at[k + kb :, k + kb :].set(att)
                akt = akt - 0.5 * akk @ ukt
                akt = _tsolve(utt, akt, left=False, trans=False)
                a = a.at[k : k + kb, k + kb :].set(akt)
                a = a.at[k + kb :, k : k + kb].set(jnp.conjugate(akt.T))
        return a


def sygst(a, u, mode="full", nb=512):
    """Dispatch: 'full' (two whole-matrix trsm) or 'blocked' recurrence."""
    if mode == "full":
        return sygst_full(a, u)
    return sygst_blocked(a, u, nb=nb)
