"""Unit tests: on-device divide-and-conquer tridiagonal eigensolver
vs scipy.linalg.eigh_tridiagonal, including adversarial spectra
(clusters, exact ties, graded, decoupled blocks) -- the cases that stress
the masked-deflation / pole-separation design (ops/stedc.py docstring)."""

import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu.ops.stedc import stedc


def _check(d, e, leaf=16, wtol=1e-12, rtol=1e-11, otol=1e-11):
    n = d.shape[0]
    w, q = stedc(d, e, leaf=leaf)
    w, q = np.asarray(w), np.asarray(q)
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    w_ref = scipy.linalg.eigh_tridiagonal(d, e, eigvals_only=True)
    scale = max(np.max(np.abs(w_ref)), 1.0)
    assert np.all(np.diff(w) >= -1e-14 * scale), "eigenvalues not sorted"
    np.testing.assert_allclose(w, w_ref, atol=wtol * scale * n, rtol=0)
    # residual ||T q - q w|| and orthogonality
    res = np.max(np.abs(t @ q - q * w[None, :])) / (scale * n)
    assert res < rtol, f"residual {res:.2e}"
    orth = np.max(np.abs(q.T @ q - np.eye(n)))
    assert orth < otol * n, f"orthogonality {orth:.2e}"


@pytest.mark.parametrize("n", [4, 16, 33, 64, 130, 256])
def test_random(n):
    rng = np.random.default_rng(n)
    _check(rng.standard_normal(n), rng.standard_normal(n - 1))


def test_identity_ties():
    n = 64
    _check(np.ones(n), np.zeros(n - 1))


def test_small_offdiag_near_ties():
    n = 64
    rng = np.random.default_rng(1)
    _check(np.ones(n), 1e-14 * rng.standard_normal(n - 1))


def test_clustered_spectrum():
    """1-2-1 matrix: eigenvalues cluster quadratically at the ends."""
    n = 128
    _check(2.0 * np.ones(n), 1.0 * np.ones(n - 1))


def test_graded():
    n = 64
    d = np.logspace(0, -12, n)
    rng = np.random.default_rng(2)
    e = 1e-3 * d[:-1] * rng.standard_normal(n - 1)
    _check(d, e, wtol=1e-11)


def test_decoupled_blocks():
    """Zero off-diagonals inside the matrix (splits) must deflate exactly."""
    n = 48
    rng = np.random.default_rng(3)
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    e[10] = 0.0
    e[31] = 0.0
    _check(d, e)


def test_wilkinson():
    """W21+ has pathologically close eigenvalue pairs."""
    n = 21
    d = np.abs(np.arange(n) - (n - 1) // 2).astype(np.float64)
    e = np.ones(n - 1)
    _check(d, e, leaf=8)


def test_negative_offdiagonals():
    rng = np.random.default_rng(4)
    n = 64
    _check(rng.standard_normal(n), -np.abs(rng.standard_normal(n - 1)))


def test_scaling_invariance():
    rng = np.random.default_rng(5)
    n = 32
    d = 1e8 * rng.standard_normal(n)
    e = 1e8 * rng.standard_normal(n - 1)
    _check(d, e)


def test_stedc_heavy_deflation_compact_assembly():
    """Clustered (QE-style) spectra deflate most poles; the bucketed
    compact assembly (lax.switch on the alive count) must stay exact
    through the unbatched top merges."""
    import numpy as np
    import scipy.linalg
    import jax.numpy as jnp
    from eigensolver_gpu_tpu.ops.stedc import stedc

    n = 384  # 6 leaves -> binary decomposition 4+2 exercises the
    # compact fold merge AND the pairs<=2 tree levels
    rng = np.random.default_rng(33)
    # tridiagonal with tiny couplings between large identical blocks ->
    # heavy deflation at every merge
    d = np.repeat(np.linspace(1.0, 3.0, 8), n // 8)
    e = np.full(n - 1, 1e-13)
    e[:: n // 8] = 0.5  # a few real couplings
    w, q = stedc(jnp.asarray(d), jnp.asarray(e), leaf=64)
    w, q = np.asarray(w), np.asarray(q)
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    w_ref = scipy.linalg.eigh_tridiagonal(d, e, eigvals_only=True)
    np.testing.assert_allclose(w, w_ref, rtol=0, atol=1e-12 * n)
    res = np.abs(t @ q - q * w[None, :]).max()
    assert res < 1e-12 * n, f"residual {res:.2e}"
    orth = np.abs(q.T @ q - np.eye(n)).max()
    assert orth < 1e-12 * n, f"orthogonality {orth:.2e}"
