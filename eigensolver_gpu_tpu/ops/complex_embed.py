"""Hermitian problems on TPUs without complex-dtype support.

The serving TPU toolchain rejects complex128 ("Element type C128 is not
supported on TPU" from the AOT compiler), so the complex driver cannot
run natively on device in fp64. This module provides the standard
real-embedding formulation: for Hermitian ``A = Ar + i Ai``,

    M(A) = [[Ar, -Ai],
            [Ai,  Ar]]        (2n x 2n, real symmetric)

has the same spectrum as A with every eigenvalue doubled; a real
eigenvector [u; v] of M maps to the complex eigenvector x = u + i v.
B HPD embeds to M(B) SPD, so ``A x = lambda B x`` becomes the real
generalized problem ``M(A) y = lambda M(B) y`` -- solved by the fully
TPU-native real pipeline (models/sygvdx.py) at 2x the flops of native
complex arithmetic.

Pair selection (structure-preserving): eigenvalues come out in adjacent
equal pairs. The naive pick (every other selected column) produces
linearly DEPENDENT complex vectors when eigenvalues are exactly
multiple: with J = [[0, -I], [I, 0]], y and Jy span the same complex
line (x(Jy) = i x(y)), and the real solver is free to return any
rotation of a degenerate eigenspace. The extraction here never picks:
all 2m selected real columns are mapped to complex vectors X (n, 2m)
whose complex span is exactly the m-dimensional invariant subspace;
a fixed random compression X Omega (rank m a.s.), a planar Cholesky-QR
B-orthonormalization, and a Rayleigh-Ritz projection (planar complex
Jacobi, degeneracy-safe) return exact B-orthonormal eigenpairs of the
original pencil.

This capability has no counterpart in the reference (Volta has native
complex fp64); it exists so the complex API contract survives on
hardware where the MXU world is real-valued.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eigensolver_gpu_tpu.models.sygvdx import sygvdx
from eigensolver_gpu_tpu.utils.config import DEFAULT_CONFIG, SolverConfig
from eigensolver_gpu_tpu.utils.precision import highest_precision


class EmbeddedResult(NamedTuple):
    w: jax.Array  # (m,) eigenvalues
    zr: jax.Array  # (n, m) real part of eigenvectors
    zi: jax.Array  # (n, m) imaginary part
    info: jax.Array  # 0 ok; 1..n: B pivot (cuSOLVER semantics); > n:
    # the extraction's compression gram went (near-)rank-deficient at
    # column info - n -- the returned basis is degraded, re-draw Omega


def embed_herm(ar, ai):
    """[[Ar, -Ai], [Ai, Ar]] for Hermitian A = Ar + i Ai."""
    top = jnp.concatenate([ar, -ai], axis=1)
    bot = jnp.concatenate([ai, ar], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@highest_precision
@functools.partial(jax.jit, static_argnames=("il", "iu", "cfg"))
def zhegvdx_embedded(ar, ai, br, bi, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Complex generalized solve via the real embedding.

    Args are the real/imag parts of A and B (real arrays, so the whole
    computation stays in real dtypes end to end).
    """
    n = ar.shape[0]
    if iu is None:
        iu = n
    ma = embed_herm(ar, ai)
    mb = embed_herm(br, bi)
    # complex indices il..iu = doubled real indices 2il-1 .. 2iu (1-based)
    w2, y, info = sygvdx(ma, mb, il=2 * il - 1, iu=2 * iu, cfg=cfg)
    w, zr, zi, xfail = _extract_invariant(y, (ar, ai), (br, bi), iu - il + 1)
    # rank-deficient compression (xfail > 0) is reported as info = n +
    # failing gram column, distinguishable from B's 1..n pivot indices;
    # an earlier Cholesky failure keeps priority.
    info = jnp.where((info == 0) & (xfail > 0), n + xfail, info)
    return EmbeddedResult(w=w, zr=zr, zi=zi, info=info)


def _extract_invariant(y, a, b, m):
    """Structure-preserving extraction of m complex eigenpairs from the
    2m selected real embedded eigenvectors (module docstring): random
    J-compression -> planar Cholesky-QR in the B metric -> Rayleigh-Ritz
    with the planar complex Jacobi. Exact for degenerate spectra."""
    import numpy as np

    from eigensolver_gpu_tpu.ops.jacobi import jacobi_eigh_planar
    from eigensolver_gpu_tpu.ops.planar import (
        _fsub_base,
        _pchol_base,
        pH,
        pmatmul,
    )

    ar, ai = a
    n = ar.shape[0]
    dt = ar.dtype
    xr = y[:n, :].astype(dt)  # complex columns x_j = u_j + i v_j
    xi = y[n:, :].astype(dt)
    # fixed compression (trace-time constant; any generic Omega works)
    host = np.random.default_rng(20240817)
    om_r = jnp.asarray(host.standard_normal((2 * m, m)), dt)
    om_i = jnp.asarray(host.standard_normal((2 * m, m)), dt)
    xh = (xr @ om_r - xi @ om_i, xr @ om_i + xi @ om_r)  # (n, m)
    # B-orthonormalize: G = Xh^H B Xh = L L^H; Q = Xh L^{-H}
    bx = pmatmul(b, xh)
    g = pmatmul(pH(xh), bx)
    gr = (g[0] + g[0].T) / 2
    gi = (g[1] - g[1].T) / 2
    lr, li, gfail = _pchol_base(gr, gi, m)
    # Q^H = L^{-1} Xh^H (planar forward substitution), Q = (Q^H)^H
    qh = _fsub_base(lr, li, xh[0].T, -xh[1].T, m)
    q = (qh[0].T, -qh[1].T)
    # Rayleigh-Ritz: S = Q^H A Q is exact on the invariant subspace
    s = pmatmul(pH(q), pmatmul(a, q))
    sr = (s[0] + s[0].T) / 2
    si = (s[1] - s[1].T) / 2
    if m % 2 != 0:
        # pad with a decoupled above-spectrum value (planar Jacobi's
        # round-robin schedule needs an even size)
        bound = jnp.max(jnp.sum(jnp.abs(sr) + jnp.abs(si), axis=1)) + 1.0
        sr = jnp.pad(sr, ((0, 1), (0, 1))).at[m, m].set(bound)
        si = jnp.pad(si, ((0, 1), (0, 1)))
    w, (rr, ri) = jacobi_eigh_planar(sr, si)
    w = w[:m]
    rr = rr[:m, :m]
    ri = ri[:m, :m]
    zr = q[0] @ rr - q[1] @ ri
    zi = q[0] @ ri + q[1] @ rr
    # gfail: 1-based gram column of the first clamped pivot (0 if none)
    # -- a (near-)rank-deficient X@Omega compression silently degrades
    # the basis, so the caller surfaces it through info instead of
    # returning info=0 with inaccurate pairs.
    return w, zr, zi, gfail


def zhegvdx_embedded_batched(
    ar, ai, br, bi, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG
):
    """vmap of the embedded solve over a leading batch axis (QE k-points
    on complex-free TPU stacks; BASELINE.md config 4)."""
    fn = functools.partial(zhegvdx_embedded, il=il, iu=iu, cfg=cfg)
    return jax.vmap(fn)(ar, ai, br, bi)


def zhegvdx_via_embedding(a, b, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Convenience wrapper taking complex numpy/jax arrays on the host."""
    import numpy as np

    a = np.asarray(a)
    b = np.asarray(b)
    rdt = np.float64 if a.dtype == np.complex128 else np.float32
    res = zhegvdx_embedded(
        jnp.asarray(a.real.astype(rdt)),
        jnp.asarray(a.imag.astype(rdt)),
        jnp.asarray(b.real.astype(rdt)),
        jnp.asarray(b.imag.astype(rdt)),
        il=il,
        iu=iu,
        cfg=cfg,
    )
    return res
