"""Unit tests: inverse-diagonal blocked triangular solve (ops/trsm.py),
the fp32-pipeline replacement for XLA's whole-matrix phase-4 trsm
(reference: cublasZtrsm, zhegvdx_gpu.F90:169)."""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.sygst import sygst_inv
from eigensolver_gpu_tpu.ops.trsm import (
    trsm_left_upper_inv,
    trsm_left_upper_trans_inv,
    trsm_phase4,
    trsm_right_upper_inv,
)
from eigensolver_gpu_tpu.utils.testing import random_spd_pair


def _upper_factor(n, seed, jitter=1.0):
    _, b = random_spd_pair(n, seed=seed)
    return scipy.linalg.cholesky(b * jitter, lower=False)


@pytest.mark.parametrize("n,nb,m", [(128, 32, 16), (256, 64, 256), (512, 128, 40)])
def test_trsm_upper_inv_matches_scipy(n, nb, m):
    u = _upper_factor(n, seed=3)
    rng = np.random.default_rng(4)
    b = rng.standard_normal((n, m))
    x = np.asarray(trsm_left_upper_inv(jnp.asarray(u), jnp.asarray(b), nb=nb))
    x_ref = scipy.linalg.solve_triangular(u, b, lower=False)
    assert np.allclose(x, x_ref, atol=1e-10 * n)


def test_trsm_upper_inv_fp32_residual():
    """fp32 path: residual ||U x - b|| at the eps32 * kappa(block) level
    (the forward error the fp64 refinement absorbs)."""
    n, nb = 512, 128
    u = _upper_factor(n, seed=5).astype(np.float32)
    rng = np.random.default_rng(6)
    b = rng.standard_normal((n, 64)).astype(np.float32)
    x = np.asarray(trsm_left_upper_inv(jnp.asarray(u), jnp.asarray(b), nb=nb))
    res = np.max(np.abs(u @ x - b)) / (np.max(np.abs(b)) * n)
    assert res < 1e-5


def test_trsm_upper_inv_ill_conditioned_blocks():
    """Adversarial: widely scaled diagonal (kappa ~ 1e6) still solves to
    the fp64 oracle within the explicit-inverse error model."""
    n, nb = 256, 64
    u = _upper_factor(n, seed=7)
    scale = np.logspace(0, 3, n)
    u = u * scale[None, :]
    rng = np.random.default_rng(8)
    b = rng.standard_normal((n, 8))
    x = np.asarray(trsm_left_upper_inv(jnp.asarray(u), jnp.asarray(b), nb=nb))
    x_ref = scipy.linalg.solve_triangular(u, b, lower=False)
    denom = np.maximum(np.abs(x_ref), 1.0)
    assert np.max(np.abs(x - x_ref) / denom) < 1e-8


@pytest.mark.parametrize("n,nb", [(128, 32), (256, 64)])
def test_trsm_trans_and_right_variants(n, nb):
    """U^H X = B (forward) and X U = B (right) against scipy."""
    u = _upper_factor(n, seed=11)
    rng = np.random.default_rng(12)
    b = rng.standard_normal((n, 24))
    x = np.asarray(trsm_left_upper_trans_inv(jnp.asarray(u), jnp.asarray(b), nb=nb))
    x_ref = scipy.linalg.solve_triangular(u, b, lower=False, trans="T")
    assert np.allclose(x, x_ref, atol=1e-10 * n)
    br = rng.standard_normal((24, n))
    x = np.asarray(trsm_right_upper_inv(jnp.asarray(u), jnp.asarray(br), nb=nb))
    x_ref = scipy.linalg.solve_triangular(u.T, br.T, lower=True).T
    assert np.allclose(x, x_ref, atol=1e-10 * n)


@pytest.mark.parametrize("n,nb", [(128, 32), (256, 128)])
def test_sygst_inv_matches_oracle(n, nb):
    """C = U^{-H} A U^{-1} via the inverse-diagonal solves vs scipy."""
    a, b = random_spd_pair(n, seed=13)
    u = scipy.linalg.cholesky(b, lower=False)
    c = np.asarray(sygst_inv(jnp.asarray(a), jnp.asarray(u), nb=nb))
    x = scipy.linalg.solve_triangular(u, a, trans="T", lower=False)
    c_ref = scipy.linalg.solve_triangular(u, x.T, trans="T", lower=False).T
    assert np.allclose(c, (c_ref + c_ref.T) / 2, atol=1e-10 * n)
    assert np.allclose(c, c.T)


def test_trsm_phase4_gating():
    """Dispatch: fp32 divisible shapes take the inverse-diagonal path;
    fp64 and indivisible shapes keep exact substitution -- both must
    solve correctly."""
    for n, dt in [(1024, np.float32), (1024, np.float64), (200, np.float32)]:
        u = _upper_factor(n, seed=9).astype(dt)
        rng = np.random.default_rng(10)
        b = rng.standard_normal((n, 8)).astype(dt)
        x = np.asarray(trsm_phase4(jnp.asarray(u), jnp.asarray(b)))
        x_ref = scipy.linalg.solve_triangular(u, b, lower=False)
        tol = 1e-4 if dt == np.float32 else 1e-10 * n
        assert np.allclose(x, x_ref, atol=tol * np.max(np.abs(x_ref)))


def test_trinv_upper_full_matches_scipy():
    from eigensolver_gpu_tpu.ops.trsm import trinv_upper_full

    n = 512
    u = _upper_factor(n, seed=9)
    inv = np.asarray(trinv_upper_full(jnp.asarray(u), base=128))
    ref = scipy.linalg.solve_triangular(u, np.eye(n), lower=False)
    assert np.triu(inv).shape == inv.shape  # sanity
    assert np.allclose(inv, ref, atol=1e-10 * n)
    assert np.max(np.abs(np.tril(inv, -1))) == 0.0
