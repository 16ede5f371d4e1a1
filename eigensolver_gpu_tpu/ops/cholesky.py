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
      (u, info): ``u`` upper triangular; ``info`` int32 scalar, 0 on success,
      >0 if B was not positive definite (NaN detected in the factor).
    """
    l = lax.linalg.cholesky(b)
    u = jnp.conjugate(l.T)
    bad = jnp.any(jnp.isnan(u)) | jnp.any(jnp.isinf(u))
    info = jnp.where(bad, jnp.int32(1), jnp.int32(0))
    return u, info
