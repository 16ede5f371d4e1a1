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

Pair selection: eigenvalues come out in adjacent equal pairs; taking
every other selected column yields one complex eigenvector per pair.
For *exactly* multiple eigenvalues the picked complex vectors can be
linearly dependent (known limitation of the plain embedding; the
structure-preserving variant is on the roadmap) -- generic and QE-style
spectra are fine.

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
    info: jax.Array


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
    w = w2[0::2]
    ysel = y[:, 0::2]
    zr = ysel[:n, :]
    zi = ysel[n:, :]
    return EmbeddedResult(w=w, zr=zr, zi=zi, info=info)


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
