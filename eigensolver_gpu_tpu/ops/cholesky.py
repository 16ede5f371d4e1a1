"""Cholesky factorization of the metric matrix B.

Reference: the drivers call cuSOLVER ``cusolverDnDpotrf``/``cusolverDnZpotrf``
with CUBLAS_FILL_MODE_UPPER (dsygvdx_gpu.F90:121, zhegvdx_gpu.F90:135) to get
``B = U^H U``. TPU-native: ``jax.lax.linalg.cholesky`` (XLA's blocked,
MXU-lowered factorization); XLA produces the lower factor ``L`` with
``B = L L^H``, so ``U = L^H``.

Positive-definiteness reporting: cuSOLVER returns ``devInfo`` which the
reference copies to host and checks (zhegvdx_gpu.F90:136-142). XLA's
cholesky instead poisons the factor with NaNs for indefinite input; we
surface that as an ``info`` flag computed on device (no host round-trip).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def cholesky_upper(b):
    """Upper Cholesky factor ``U`` with ``B = U^H @ U``.

    Returns:
      (u, info): ``u`` upper triangular; ``info`` int32 scalar, 0 on
      success, else the 1-based index of the first row whose pivot is
      invalid (non-positive/NaN/Inf diagonal, or NaN/Inf anywhere in the
      row) -- the LAPACK/cuSOLVER devInfo convention (the reference
      checks cuSOLVER's index, zhegvdx_gpu.F90:136-142). The diagonal
      sign check catches indefinite inputs for which XLA's cholesky
      returns finite junk instead of NaN."""
    n = b.shape[0]
    l = lax.linalg.cholesky(b)
    u = jnp.conjugate(l.T)
    notfin = ~jnp.isfinite(u)
    if jnp.issubdtype(u.dtype, jnp.complexfloating):
        notfin = ~jnp.isfinite(u.real) | ~jnp.isfinite(u.imag)
    row_bad = jnp.any(notfin, axis=1) | ~(jnp.diagonal(u).real > 0)
    # first bad row, 1-based (0 if none): argmax finds the first True
    first = jnp.argmax(row_bad).astype(jnp.int32) + 1
    info = jnp.where(jnp.any(row_bad), first, jnp.int32(0))
    return u, info
