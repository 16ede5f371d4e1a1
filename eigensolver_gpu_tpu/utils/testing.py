"""Test fixtures and accuracy metrics.

TPU-native re-design of the reference's test machinery:

* random SPD/HPD generators mirror ``create_random_symmetric_pd`` /
  ``create_random_hermetian_pd`` (test_driver/test_dsygvdx.F90:28-64,
  test_driver/test_zhegvdx.F90:28-66): draw a random symmetric/Hermitian
  ``T`` and form ``T @ T^H`` (gemm -> positive definite), plus a diagonal
  shift for conditioning.
* ``compare_*`` metrics mirror module ``compare_utils``
  (test_driver/toolbox.F90:26-177): relative L2-norm error and max
  elementwise error; matrix comparisons use absolute values to absorb
  eigenvector sign/phase indeterminacy (toolbox.F90:29-30,101,150).
  Unlike the reference -- which just prints numbers for a human
  (toolbox.F90:70-74) -- these return floats that tests assert against
  explicit thresholds.
* ``ge_residual`` is the canonical accuracy metric from BASELINE.md:
  ``max_k ||A z_k - lambda_k B z_k|| / (n ||A||)``.
"""

from __future__ import annotations

import numpy as np


def random_spd_pair(n, seed=0, dtype=np.float64, diag_shift=None):
    """Random (A symmetric, B SPD) pair, mirroring test_dsygvdx.F90:28-64."""
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((n, n)).astype(dtype)
    a = (t + t.T) / 2
    t2 = rng.standard_normal((n, n)).astype(dtype)
    shift = n if diag_shift is None else diag_shift
    b = t2 @ t2.T / n + shift / n * np.eye(n, dtype=dtype)
    return a, b


def random_hpd_pair(n, seed=0, dtype=np.complex128, diag_shift=None):
    """Random (A Hermitian, B HPD) pair, mirroring test_zhegvdx.F90:28-66."""
    rng = np.random.default_rng(seed)
    real_dt = np.float64 if dtype == np.complex128 else np.float32
    t = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))).astype(dtype)
    a = (t + t.conj().T) / 2
    t2 = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))).astype(dtype)
    shift = n if diag_shift is None else diag_shift
    b = t2 @ t2.conj().T / n + shift / n * np.eye(n, dtype=dtype)
    return a, b


def qe_style_pair(n, seed=0, dtype=np.complex128, decay=0.5):
    """Hermitian pair with a Quantum-ESPRESSO-style clustered low spectrum.

    BASELINE.md config 3 asks for a 'QE-style spectrum': many small,
    clustered eigenvalues (occupied bands) and a spread-out tail. Built by
    conjugating a chosen spectrum with a random unitary.
    """
    rng = np.random.default_rng(seed)
    lam = np.concatenate(
        [
            -10.0 + 0.05 * rng.standard_normal(n // 4),
            np.sort(rng.uniform(0.0, 100.0, n - n // 4)),
        ]
    )
    iscomplex = np.issubdtype(dtype, np.complexfloating)
    g = rng.standard_normal((n, n))
    if iscomplex:
        g = g + 1j * rng.standard_normal((n, n))
    q, _ = np.linalg.qr(g)
    a = (q * lam) @ q.conj().T
    a = (a + a.conj().T) / 2
    t2 = rng.standard_normal((n, n))
    if iscomplex:
        t2 = t2 + 1j * rng.standard_normal((n, n))
    t2 = t2.astype(dtype)
    b = t2 @ t2.conj().T / n + np.eye(n, dtype=dtype)
    return a.astype(dtype), b


def compare_values(x, y):
    """Relative L2 error, toolbox.F90:36-78 style (eigenvalues compared directly)."""
    x = np.asarray(x)
    y = np.asarray(y)
    denom = np.linalg.norm(y)
    return float(np.linalg.norm(x - y) / (denom if denom else 1.0))


def compare_vectors(z1, z2):
    """Sign/phase-insensitive matrix comparison, toolbox.F90:80-177 style.

    Compares |z1| to |z2| elementwise (relative L2 over the whole matrix),
    which absorbs per-column sign flips (real) and phases (complex).
    """
    z1 = np.abs(np.asarray(z1))
    z2 = np.abs(np.asarray(z2))
    denom = np.linalg.norm(z2)
    return float(np.linalg.norm(z1 - z2) / (denom if denom else 1.0))


def ge_residual(a, b, w, z):
    """max_k ||A z_k - w_k B z_k||_2 / (n * ||A||_2-est) -- BASELINE.md metric."""
    a = np.asarray(a)
    b = np.asarray(b)
    w = np.asarray(w)
    z = np.asarray(z)
    n = a.shape[0]
    r = a @ z - (b @ z) * w[None, :]
    anorm = np.linalg.norm(a, ord=1)  # cheap upper-bound proxy for ||A||_2
    return float(np.max(np.linalg.norm(r, axis=0)) / (n * anorm))


def std_residual(a, w, z):
    """max_k ||A z_k - w_k z_k|| / (n ||A||) for the standard problem."""
    a = np.asarray(a)
    r = a @ np.asarray(z) - np.asarray(z) * np.asarray(w)[None, :]
    anorm = np.linalg.norm(a, ord=1)
    return float(np.max(np.linalg.norm(r, axis=0)) / (a.shape[0] * anorm))


def orthonormality_error(z, b=None):
    """||Z^H B Z - I||_max (B-orthonormality for the generalized problem)."""
    z = np.asarray(z)
    g = z.conj().T @ (np.asarray(b) @ z if b is not None else z)
    return float(np.max(np.abs(g - np.eye(z.shape[1], dtype=g.dtype))))
