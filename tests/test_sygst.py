"""Unit tests: Cholesky + reduction to standard form (SURVEY.md §4 upgrade:
per-stage pytest units vs scipy references instead of print-and-eyeball)."""

import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu.ops.cholesky import cholesky_upper
from eigensolver_gpu_tpu.ops.sygst import sygst_blocked, sygst_full
from eigensolver_gpu_tpu.utils.testing import random_hpd_pair, random_spd_pair


@pytest.mark.parametrize("n", [16, 65, 128])
def test_cholesky_upper(n):
    _, b = random_spd_pair(n, seed=1)
    u, info = cholesky_upper(b)
    u = np.asarray(u)
    assert int(info) == 0
    assert np.allclose(np.triu(u), u)
    assert np.allclose(u.T @ u, b, atol=1e-10 * n)


def test_cholesky_not_pd():
    b = -np.eye(8)
    _, info = cholesky_upper(b)
    assert int(info) > 0


@pytest.mark.parametrize("n", [32, 100, 256])
@pytest.mark.parametrize("mode", ["full", "blocked"])
def test_sygst_real(n, mode):
    a, b = random_spd_pair(n, seed=2)
    u = scipy.linalg.cholesky(b, lower=False)
    fn = sygst_full if mode == "full" else sygst_blocked
    c = np.asarray(fn(a, u) if mode == "full" else fn(a, u, nb=64))
    # oracle: C = U^{-T} A U^{-1}
    x = scipy.linalg.solve_triangular(u, a, trans="T")
    c_ref = scipy.linalg.solve_triangular(u, x.T, trans="T").T
    assert np.allclose(c, (c_ref + c_ref.T) / 2, atol=1e-11 * n)


@pytest.mark.parametrize("mode", ["full", "blocked"])
def test_sygst_complex(mode):
    n = 96
    a, b = random_hpd_pair(n, seed=3)
    u = scipy.linalg.cholesky(b, lower=False)
    fn = sygst_full if mode == "full" else sygst_blocked
    c = np.asarray(fn(a, u) if mode == "full" else fn(a, u, nb=32))
    x = scipy.linalg.solve_triangular(u.conj().T, a, lower=True)
    c_ref = scipy.linalg.solve_triangular(u.conj().T, x.conj().T, lower=True).conj().T
    assert np.allclose(c, (c_ref + c_ref.conj().T) / 2, atol=1e-11 * n)
    # eigenvalues of C must equal generalized eigenvalues of (A, B)
    w_c = np.linalg.eigvalsh(c)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(w_c, w_ref, atol=1e-9 * n)
