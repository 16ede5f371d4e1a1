"""Planar complex linear algebra primitives vs complex numpy/scipy."""

import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu.ops.planar import (
    from_planar,
    pcholesky_lower,
    pmatmul,
    ptrsm_left_lower,
    ptrsm_left_upper,
    to_planar,
)


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_pmatmul():
    rng = np.random.default_rng(0)
    a = _rand_c(rng, 64, 48)
    b = _rand_c(rng, 48, 32)
    c = from_planar(pmatmul(to_planar(a), to_planar(b)))
    np.testing.assert_allclose(c, a @ b, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n,m,nb", [(128, 32, 64), (256, 256, 128)])
def test_ptrsm_lower(n, m, nb):
    rng = np.random.default_rng(1)
    l = np.tril(_rand_c(rng, n, n)) + n * np.eye(n)
    b = _rand_c(rng, n, m)
    x = from_planar(ptrsm_left_lower(to_planar(l), to_planar(b), nb=nb))
    x_ref = scipy.linalg.solve_triangular(l, b, lower=True)
    np.testing.assert_allclose(x, x_ref, rtol=1e-11, atol=1e-11)


def test_ptrsm_upper():
    n, m, nb = 128, 16, 64
    rng = np.random.default_rng(2)
    u = np.triu(_rand_c(rng, n, n)) + n * np.eye(n)
    b = _rand_c(rng, n, m)
    x = from_planar(ptrsm_left_upper(to_planar(u), to_planar(b), nb=nb))
    x_ref = scipy.linalg.solve_triangular(u, b, lower=False)
    np.testing.assert_allclose(x, x_ref, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("n,nb", [(128, 64), (256, 128)])
def test_pcholesky(n, nb):
    rng = np.random.default_rng(3)
    t = _rand_c(rng, n, n)
    b = t @ t.conj().T / n + np.eye(n)
    (lr, li), info = pcholesky_lower(to_planar(b), nb=nb)
    assert int(info) == 0
    l = np.asarray(lr) + 1j * np.asarray(li)
    assert np.allclose(np.tril(l), l)
    np.testing.assert_allclose(l @ l.conj().T, b, rtol=1e-11, atol=1e-10 * n)


def test_pcholesky_not_pd():
    n = 128
    b = -np.eye(n, dtype=complex)
    _, info = pcholesky_lower(to_planar(b), nb=64)
    assert int(info) == 1  # devInfo: first bad pivot is column 1


def test_pcholesky_indefinite_finite_reports_index():
    """Indefinite-but-finite B (one negative eigenvalue, not -I): info
    must carry the 1-based column of the first failing pivot, matching
    LAPACK zpotrf's devInfo on the same matrix."""
    import scipy.linalg as sla

    n, k = 128, 77
    rng = np.random.default_rng(31)
    t = _rand_c(rng, n, n)
    q, _ = np.linalg.qr(t)
    w = np.ones(n)
    w[k - 1] = -0.5  # exactly one negative direction
    b = (q * w[None, :]) @ q.conj().T
    b = (b + b.conj().T) / 2
    _, info = pcholesky_lower(to_planar(b), nb=64)
    _, ref_info = sla.lapack.zpotrf(b, lower=1)
    assert int(info) > 0
    assert int(info) == int(ref_info)


def test_pmatmul_chunked():
    from eigensolver_gpu_tpu.ops.planar import pmatmul_chunked

    rng = np.random.default_rng(5)
    x = _rand_c(rng, 96, 64)
    y = _rand_c(rng, 64, 48)
    c = from_planar(pmatmul_chunked(to_planar(x), to_planar(y), 16))
    np.testing.assert_allclose(c, x @ y, rtol=1e-12, atol=1e-12)
    # non-divisible chunk falls back to the plain product
    c2 = from_planar(pmatmul_chunked(to_planar(x), to_planar(y), 7))
    np.testing.assert_allclose(c2, x @ y, rtol=1e-12, atol=1e-12)


def test_ptrsm_inverted_diag_blocks():
    from eigensolver_gpu_tpu.ops.planar import ptrsm_left_lower_inv

    n, m, nb = 256, 32, 128
    rng = np.random.default_rng(6)
    l = np.tril(_rand_c(rng, n, n)) + n * np.eye(n)
    b = _rand_c(rng, n, m)
    x = from_planar(ptrsm_left_lower_inv(to_planar(l), to_planar(b), nb=nb))
    x_ref = scipy.linalg.solve_triangular(l, b, lower=True)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-10)


def test_ptrinv_lower_full():
    from eigensolver_gpu_tpu.ops.planar import pmatmul, ptrinv_lower

    rng = np.random.default_rng(8)
    for n, base in ((256, 64), (96, 96)):
        l = np.tril(_rand_c(rng, n, n)) + n * np.eye(n)
        inv = from_planar(ptrinv_lower(to_planar(l), base=base))
        np.testing.assert_allclose(inv @ l, np.eye(n), rtol=0, atol=1e-12)
        # a solve is one planar gemm
        b = _rand_c(rng, n, 17)
        x = from_planar(pmatmul(ptrinv_lower(to_planar(l), base=base), to_planar(b)))
        x_ref = scipy.linalg.solve_triangular(l, b, lower=True)
        np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-10)
