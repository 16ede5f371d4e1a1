"""Blocked triangular solve with batched-inverted diagonal blocks
(real/complex dtype twin of ops/planar.ptrsm_left_lower_inv).

Phase 4 of the generalized driver back-substitutes x = U^{-1} y
(reference: one cublasZtrsm, zhegvdx_gpu.F90:169).  XLA's whole-matrix
``triangular_solve`` substitutes in O(n) sequential row/block steps and
keeps O(n) full-width temps alive -- at n=16384 it plans ~3 GB/device
and serializes a collective chain on a sharded mesh (RESULTS.md config-5
artifact).  This module replaces it on the fp32 pipeline with the scheme
measured best in the planar stack:

  * all n/nb diagonal blocks are inverted together -- a 16-wide batched
    substitution + log2(nb/16) batched-gemm doubling levels;
  * back-substitution then runs in n/nb sequential steps whose
    correction is a plain gemm (MXU work, SPMD-partitionable on a mesh),
    segment-bucketed so the gemm area tracks the solved width instead of
    always spanning full n (~2x area saving, as in pcholesky_lower).

Forward error is ~eps * kappa(U_block) (explicit-inverse apply) instead
of pure substitution's eps * kappa(U): acceptable ONLY where the fp64
refinement absorbs it, so the drivers gate this to their fp32 inner
pipelines.  The fp64 path keeps ``lax.linalg.triangular_solve``.

The full-triangular-inverse form (one gemm per solve) measured 40 ms
SLOWER end-to-end in the planar pipeline despite 3x standalone (round-2
negative result) -- the block-diagonal form is the one that wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision


def _trinv_lower_batched(l, base=16):
    """Invert a batch of lower-triangular blocks (k, nb, nb).

    Level 0: one ``base``-step substitution loop inverts every
    base x base diagonal sub-block of every batch entry at once; then
    log2(nb/base) batched-gemm doubling levels merge pairs via
    inv([[A,0],[C,D]]) = [[iA,0],[-iD C iA, iD]].
    """
    k, nb, _ = l.shape
    if nb % base or (nb // base) & (nb // base - 1):
        raise ValueError(f"trinv requires nb = base * 2^j, got nb={nb}")
    nsub = nb // base
    # (k*nsub, base, base) diagonal sub-blocks
    sub = l.reshape(k, nsub, base, nsub, base)
    sub = jnp.stack([sub[:, i, :, i, :] for i in range(nsub)], axis=1)
    sub = sub.reshape(k * nsub, base, base)
    eye = jnp.eye(base, dtype=l.dtype)[None]
    dinv = 1.0 / jnp.einsum("bii->bi", sub)

    def body(i, x):
        # row i of inv: (e_i - L[i,:i] @ x[:i]) / L[i,i], batched
        li = lax.dynamic_slice(sub, (0, i, 0), (sub.shape[0], 1, base))
        acc = jnp.einsum("boj,bjc->boc", li, x)
        ei = lax.dynamic_slice(eye, (0, i, 0), (1, 1, base))
        di = lax.dynamic_slice(dinv, (0, i), (dinv.shape[0], 1))
        row = (ei - acc) * di[:, :, None]
        return lax.dynamic_update_slice(x, row, (0, i, 0))

    inv = lax.fori_loop(0, base, body, jnp.zeros_like(sub))
    size = base
    while size < nb:
        pairs = nb // (2 * size)
        inv = inv.reshape(k * pairs, 2, size, size)
        ia, idd = inv[:, 0], inv[:, 1]
        # C blocks: rows [size, 2*size), cols [0, size) of each pair
        c = l.reshape(k, pairs, 2 * size, pairs, 2 * size)
        c = jnp.stack([c[:, p, size:, p, :size] for p in range(pairs)], axis=1)
        c = c.reshape(k * pairs, size, size)
        m = jnp.einsum("bij,bjk,bkl->bil", idd, c, ia)
        z = jnp.zeros_like(m)
        inv = jnp.concatenate(
            [
                jnp.concatenate([ia, z], axis=2),
                jnp.concatenate([-m, idd], axis=2),
            ],
            axis=1,
        )
        size *= 2
    return inv.reshape(k, nb, nb)


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb",))
def trsm_left_upper_inv(u, b, nb=512):
    """Solve U X = B (U upper triangular, B (n, m)) via batched-inverted
    diagonal blocks + blocked back-substitution: n/nb sequential steps,
    each one correction gemm + one small block gemm.

    The block loop is UNROLLED with static slice starts -- on a sharded
    mesh a fori_loop's traced dynamic_slice starts on the row-sharded
    operands force the SPMD partitioner to materialize replicated copies
    of U and X (measured +3.2 GB/device at n=16384); static slices keep
    every correction gemm partitionable and exact-area (no masking, no
    segment buckets).  n/nb stays <= ~64 at every target size.

    fp32-pipeline use only (see module docstring); requires n % nb == 0
    and nb a power-of-two multiple of 16 -- callers fall back to
    ``lax.linalg.triangular_solve`` otherwise.
    """
    n = u.shape[0]
    if n % nb != 0:
        raise ValueError(f"trsm_left_upper_inv requires n % nb == 0, got {n} % {nb}")
    nblocks = n // nb
    # U_k^{-1} = (L_k^{-1})^T with L_k = U_k^T, batched over blocks
    diags = jnp.stack(
        [u[k * nb : (k + 1) * nb, k * nb : (k + 1) * nb] for k in range(nblocks)]
    )
    inv = _trinv_lower_batched(jnp.swapaxes(diags, 1, 2))
    inv = jnp.swapaxes(inv, 1, 2)  # batched upper-triangular inverses

    x = jnp.zeros_like(b)
    for k in range(nblocks - 1, -1, -1):
        k0 = k * nb
        k1 = k0 + nb
        rhs = b[k0:k1]
        if k1 < n:
            rhs = rhs - u[k0:k1, k1:] @ x[k1:]  # solved rows only
        x = x.at[k0:k1].set(inv[k] @ rhs)
    return x


@highest_precision
@functools.partial(jax.jit, static_argnames=("base",))
def trinv_upper_full(u, base=512):
    """FULL upper-triangular inverse by bottom-up batched block doubling
    (the real/complex-dtype twin of ops/planar.ptrinv_lower, transposed).

    Level 0 inverts all n/base diagonal blocks together; each of the
    log2(n/base) merge levels is a pair of batched gemms via
    inv([[A,0],[C,D]]) = [[iA,0],[-iD C iA, iD]] on the transposed
    (lower) view -- every step is a partitionable gemm, so on a sharded
    mesh the SPMD partitioner never builds a sequential collective
    chain (the failure mode of both XLA's whole-matrix solve and the
    unrolled block-substitution schemes at n=16384, RESULTS.md config-5).

    Forward error ~eps * kappa(U) (explicit full inverse): strictly for
    fp32 pipelines whose fp64 refinement absorbs it. Requires
    n = base * 2^k."""
    n = u.shape[0]
    if n % base != 0 or (n // base) & (n // base - 1):
        raise ValueError(f"trinv_upper_full requires n = base * 2^k, got {n}")
    l = u.T  # lower view; inv(U) = inv(L)^T (transpose, no conjugation)
    nb0 = n // base
    diags = jnp.stack(
        [l[k * base : (k + 1) * base, k * base : (k + 1) * base]
         for k in range(nb0)]
    )
    inv = _trinv_lower_batched(diags)
    size = base
    while size < n:
        pairs = n // (2 * size)
        ia, id_ = inv[0::2], inv[1::2]
        c = jnp.stack(
            [l[(2 * p + 1) * size : (2 * p + 2) * size,
               2 * p * size : (2 * p + 1) * size] for p in range(pairs)]
        )
        m = jnp.einsum("bij,bjk,bkl->bil", id_, c, ia)
        z = jnp.zeros_like(m)
        inv = jnp.concatenate(
            [jnp.concatenate([ia, z], axis=2),
             jnp.concatenate([-m, id_], axis=2)], axis=1
        )
        size *= 2
    return inv[0].T


def upper_block_inverses(u, nb):
    """Batched inverses of U's nb x nb diagonal blocks (upper)."""
    n = u.shape[0]
    diags = jnp.stack(
        [u[k * nb : (k + 1) * nb, k * nb : (k + 1) * nb] for k in range(n // nb)]
    )
    inv = _trinv_lower_batched(jnp.swapaxes(diags, 1, 2))
    return jnp.swapaxes(inv, 1, 2)


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb",))
def trsm_left_upper_trans_inv(u, b, nb=512):
    """Solve U^H X = B (forward substitution over row blocks, static
    slices; same scheme/caveats as trsm_left_upper_inv).  The lower-
    triangular operand is U^H, so block row k's correction reads
    U[:k0, k0:k1]^H against the already-solved X[:k0]."""
    n = u.shape[0]
    if n % nb != 0:
        raise ValueError(f"trsm requires n % nb == 0, got {n} % {nb}")
    inv = upper_block_inverses(u, nb)
    x = jnp.zeros_like(b)
    for k in range(n // nb):
        k0 = k * nb
        k1 = k0 + nb
        rhs = b[k0:k1]
        if k0 > 0:
            rhs = rhs - jnp.conj(u[:k0, k0:k1].T) @ x[:k0]
        x = x.at[k0:k1].set(jnp.conj(inv[k].T) @ rhs)
    return x


@highest_precision
@functools.partial(jax.jit, static_argnames=("nb",))
def trsm_right_upper_inv(u, b, nb=512):
    """Solve X U = B (column blocks left to right, static slices; same
    scheme/caveats as trsm_left_upper_inv)."""
    n = u.shape[0]
    if n % nb != 0:
        raise ValueError(f"trsm requires n % nb == 0, got {n} % {nb}")
    inv = upper_block_inverses(u, nb)
    x = jnp.zeros_like(b)
    for k in range(n // nb):
        k0 = k * nb
        k1 = k0 + nb
        rhs = b[:, k0:k1]
        if k0 > 0:
            rhs = rhs - x[:, :k0] @ u[:k0, k0:k1]
        x = x.at[:, k0:k1].set(rhs @ inv[k])
    return x


def trsm_phase4(u, y, nb=512):
    """Driver-facing phase-4 back-substitution x = U^{-1} y.

    Picks the inverse-diagonal blocked scheme on fp32/complex64 inputs
    with compatible shapes (the mixed pipelines, where refinement absorbs
    the explicit-inverse forward error) and XLA's exact substitution
    everywhere else (the fp64 contract path).
    """
    n = u.shape[0]
    lowprec = u.dtype in (jnp.float32, jnp.complex64)
    if lowprec and n % nb == 0 and n // nb >= 2:
        return trsm_left_upper_inv(u, y, nb=nb)
    return lax.linalg.triangular_solve(
        u, y, left_side=True, lower=False, transpose_a=False
    )
