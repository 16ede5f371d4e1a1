"""Batched Jacobi leaf solver vs numpy.eigh."""

import numpy as np
import pytest

from eigensolver_gpu_tpu.ops.jacobi import jacobi_eigh


@pytest.mark.parametrize("m", [4, 16, 32, 64])
def test_jacobi_random(m):
    rng = np.random.default_rng(m)
    b = 5
    t = rng.standard_normal((b, m, m))
    a = (t + t.transpose(0, 2, 1)) / 2
    w, v = jacobi_eigh(a)
    w, v = np.asarray(w), np.asarray(v)
    for k in range(b):
        w_ref = np.linalg.eigvalsh(a[k])
        np.testing.assert_allclose(w[k], w_ref, atol=1e-13 * m, rtol=0)
        res = np.abs(a[k] @ v[k] - v[k] * w[k][None, :]).max()
        assert res < 1e-13 * m
        assert np.abs(v[k].T @ v[k] - np.eye(m)).max() < 1e-13 * m


def test_jacobi_clustered():
    m = 32
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = np.concatenate([np.ones(m // 2), 1 + 1e-12 * rng.standard_normal(m // 2)])
    a = ((q * lam) @ q.T)[None]
    a = (a + a.transpose(0, 2, 1)) / 2
    w, v = jacobi_eigh(a)
    res = np.abs(a[0] @ np.asarray(v)[0] - np.asarray(v)[0] * np.asarray(w)[0][None, :]).max()
    assert res < 1e-13 * m


def test_jacobi_tridiagonal():
    """The actual leaf use case: tridiagonal blocks."""
    m = 64
    rng = np.random.default_rng(1)
    d = rng.standard_normal(m)
    e = rng.standard_normal(m - 1)
    a = (np.diag(d) + np.diag(e, 1) + np.diag(e, -1))[None]
    import scipy.linalg

    w, v = jacobi_eigh(a)
    w_ref = scipy.linalg.eigh_tridiagonal(d, e, eigvals_only=True)
    np.testing.assert_allclose(np.asarray(w)[0], w_ref, atol=1e-13 * m, rtol=0)
