"""Blocked WY back-transformation (ormtr/unmtr, side='L', uplo='U').

Applies ``Q = H(n-2) ... H(1) H(0)`` from sytrd/hetrd to a matrix of
tridiagonal eigenvectors: ``C <- Q @ C``.

Reference: the custom dormtr/zunmtr loop in dsyevd_gpu.F90:119-128 /
zheevd_gpu.F90:121-130 -- per 64-column block, ``dlarft_gpu`` forms the
triangular T factor (CUF prep kernel + cublasdsyrk + a single-block
``finish_T_block_kernel``, dsyevd_gpu.F90:134-276) on stream 1 while
``dlarfb_gpu`` applies the previous block's ``I - V T^H V^H`` with
gemm/trmm/gemm on stream 2, overlapped through events.

TPU-native re-design: T is built by the standard larft left-product
recurrence as a `lax.fori_loop` (sequential scalar-row work is negligible);
the apply is three MXU gemms. Block-to-block overlap is XLA's scheduling
problem, not ours -- no streams, no events. One implementation serves the
real and complex cases (the reference keeps twin routines).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _block_v(a_packed, r0, kb, nref):
    """Columns of V for reflectors r0..r0+kb-1 out of sytrd's packed storage.

    Reflector r lives in packed column r+1: v[0:r] = a[0:r, r+1], v[r] = 1,
    v[r+1:] = 0 (LAPACK UPLO='U' convention, see ops/sytrd.py docstring).
    Reflector indices >= nref (ragged last block) come out as zero columns,
    which combined with tau=0 make H=I.
    """
    n = a_packed.shape[0]
    cols = lax.dynamic_slice(a_packed, (0, r0 + 1), (n, kb))
    rows = lax.broadcasted_iota(jnp.int32, (n, kb), 0)
    refl = lax.broadcasted_iota(jnp.int32, (n, kb), 1) + r0
    valid = refl < nref
    v = jnp.where((rows < refl) & valid, cols, jnp.zeros((), a_packed.dtype))
    v = jnp.where((rows == refl) & valid, jnp.ones((), a_packed.dtype), v)
    return v


def _larft_left(v, tau_blk):
    """T for the left-product H(r0+kb-1)...H(r0) = I - V T V^H.

    Prepending H_new to I - V T V^H appends row
    ``[-tau_new v^H V T, tau_new]`` -- a kb-step recurrence on rows of T
    (the reference's finish_T_block_kernel, dsyevd_gpu.F90:212-276, does
    the same triangular recurrence inside one thread block).
    """
    kb = v.shape[1]
    dt = v.dtype
    m = jnp.conj(v).T @ v  # m[j, i] = v_j^H v_i
    cols = lax.broadcasted_iota(jnp.int32, (1, kb), 1)[0]

    def body(j, t):
        mrow = jnp.where(cols < j, m[j], jnp.zeros((), dt))
        row = -tau_blk[j] * (mrow @ t)
        row = jnp.where(cols == j, tau_blk[j], row)
        return lax.dynamic_update_slice(t, row[None, :], (j, 0))

    t0 = jnp.zeros((kb, kb), dt)
    return lax.fori_loop(0, kb, body, t0)


def _larft_left_batched(v, tau):
    """_larft_left for a stack of blocks at once: the per-block row
    recurrences are independent, so one fori over kb rows builds every
    T (sequential depth kb instead of kb * nblocks)."""
    nb_, _, kb = v.shape
    dt = v.dtype
    m = jnp.einsum("bji,bjk->bik", jnp.conj(v), v)
    cols = lax.broadcasted_iota(jnp.int32, (1, kb), 1)[0]

    def body(j, t):
        mrow = jnp.where(cols[None, :] < j, m[:, j, :], jnp.zeros((), dt))
        row = -tau[:, j][:, None] * jnp.einsum("bk,bkj->bj", mrow, t)
        row = jnp.where(cols[None, :] == j, tau[:, j][:, None], row)
        return lax.dynamic_update_slice(t, row[:, None, :], (0, j, 0))

    return lax.fori_loop(0, kb, body, jnp.zeros((nb_, kb, kb), dt))


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb",))
def unmtr(a_packed, tau, c, nb=128):
    """C <- Q @ C with Q from sytrd's packed reflectors. Blocked WY apply.

    A single fori_loop over uniform blocks (the ragged tail is padded
    with tau=0 identity reflectors) so the whole apply is ONE traced
    instance regardless of n -- remote-compile time matters on the
    target platform as much as run time.
    """
    n = a_packed.shape[0]
    nref = n - 1
    if nref <= 0:
        return c
    nblocks = -(-nref // nb)
    tau_pad = jnp.concatenate([tau, jnp.zeros((nblocks * nb - nref,), tau.dtype)])
    # pad columns so the tail-block dynamic_slice never clamps (a clamped
    # start would silently misalign reflector columns)
    a_ext = jnp.concatenate(
        [a_packed, jnp.zeros((n, nblocks * nb + 1 - n), a_packed.dtype)], axis=1
    )

    with trace_range("unmtr"):
        v_all = jnp.stack([_block_v(a_ext, k * nb, nb, nref) for k in range(nblocks)])
        t_all = _larft_left_batched(v_all, tau_pad.reshape(nblocks, nb))

        def body(i, c):
            v = lax.dynamic_slice(v_all, (i, 0, 0), (1, n, nb))[0]
            t = lax.dynamic_slice(t_all, (i, 0, 0), (1, nb, nb))[0]
            # C <- (I - V T V^H) C : two gemms + one small triangular gemm
            p = jnp.conj(v).T @ c
            return c - v @ (t @ p)

        return lax.fori_loop(0, nblocks, body, c)


@functools.partial(jax.jit, static_argnames=("nb",))
def ungtr(a_packed, tau, nb=128):
    """Explicitly form Q (LAPACK dorgtr/zungtr analogue), for tests/debug."""
    n = a_packed.shape[0]
    eye = jnp.eye(n, dtype=a_packed.dtype)
    return unmtr(a_packed, tau, eye, nb=nb)
