"""Unit tests: blocked Householder tridiagonalization vs LAPACK dsytrd/zhetrd."""

import numpy as np
import pytest
import scipy.linalg
from scipy.linalg import lapack

from eigensolver_gpu_tpu.ops.sytrd import sytrd_blocked
from eigensolver_gpu_tpu.ops.unmtr import ungtr, unmtr
from eigensolver_gpu_tpu.utils.testing import random_hpd_pair, random_spd_pair


def _dense_tridiag(d, e):
    return np.diag(d) + np.diag(e, 1) + np.diag(e, -1)


@pytest.mark.parametrize("n", [32, 64, 160])
def test_sytrd_real_spectrum(n):
    a, _ = random_spd_pair(n, seed=4)
    _, d, e, _ = sytrd_blocked(a, nb=32, bucket=64)
    d, e = np.asarray(d), np.asarray(e)
    w = np.linalg.eigvalsh(_dense_tridiag(d, e))
    w_ref = np.linalg.eigvalsh(a)
    assert np.allclose(w, w_ref, atol=1e-11 * n)


@pytest.mark.parametrize("n", [32, 96])
def test_sytrd_matches_lapack(n):
    """d, e must match LAPACK dsytrd exactly up to roundoff (deterministic
    algorithm, same conventions; SURVEY.md §7.2 item 4)."""
    a, _ = random_spd_pair(n, seed=5)
    _, d, e, _ = sytrd_blocked(a, nb=32, bucket=32)
    c, d_ref, e_ref, tau_ref, info = lapack.dsytrd(a, lower=0)
    assert info == 0
    assert np.allclose(np.asarray(d), d_ref, atol=1e-12 * n)
    assert np.allclose(np.abs(np.asarray(e)), np.abs(e_ref), atol=1e-12 * n)


@pytest.mark.parametrize("n", [32, 96])
def test_hetrd_complex_spectrum(n):
    a, _ = random_hpd_pair(n, seed=6)
    _, d, e, _ = sytrd_blocked(a, nb=32, bucket=32)
    d, e = np.asarray(d), np.asarray(e)
    assert d.dtype == np.float64 and e.dtype == np.float64
    w = np.linalg.eigvalsh(_dense_tridiag(d, e))
    w_ref = np.linalg.eigvalsh(a)
    assert np.allclose(w, w_ref, atol=1e-11 * n)


@pytest.mark.parametrize("n", [32, 96])
@pytest.mark.parametrize("cplx", [False, True])
def test_ungtr_reconstructs(n, cplx):
    """Q d,e reconstruction: Q T Q^H == A and Q unitary."""
    if cplx:
        a, _ = random_hpd_pair(n, seed=7)
    else:
        a, _ = random_spd_pair(n, seed=7)
    ap, d, e, tau = sytrd_blocked(a, nb=32, bucket=32)
    q = np.asarray(ungtr(ap, tau, nb=32))
    t = _dense_tridiag(np.asarray(d), np.asarray(e)).astype(a.dtype)
    assert np.allclose(q @ q.conj().T, np.eye(n), atol=1e-12 * n)
    assert np.allclose(q @ t @ q.conj().T, a, atol=1e-11 * n)


def test_unmtr_partial_columns():
    """Back-transform of a column slice equals slicing the full transform."""
    n, m = 64, 11
    a, _ = random_spd_pair(n, seed=8)
    ap, d, e, tau = sytrd_blocked(a, nb=32, bucket=64)
    rng = np.random.default_rng(0)
    c = rng.standard_normal((n, m))
    full_q = np.asarray(ungtr(ap, tau, nb=32))
    out = np.asarray(unmtr(ap, tau, c, nb=32))
    assert np.allclose(out, full_q @ c, atol=1e-12 * n)
