"""Mixed-precision (fp32 factorization + fp64 refinement) tests."""

import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu import SolverConfig, dsygvdx
from eigensolver_gpu_tpu.models.syevdx import syevdx
from eigensolver_gpu_tpu.ops.refine import refine_eigh
from eigensolver_gpu_tpu.utils.testing import ge_residual, random_spd_pair

CFG32 = SolverConfig(compute_dtype="float32", refine_iters=3)


def test_refine_recovers_fp64():
    """fp32-quality eigenvectors refined to fp64 residuals."""
    n = 96
    a, _ = random_spd_pair(n, seed=50)
    w32, x32 = np.linalg.eigh(a.astype(np.float32))
    res32 = np.max(np.abs(a @ x32.astype(np.float64) - x32 * w32[None, :]))
    w, x = refine_eigh(a, x32.astype(np.float64), sweeps=2)
    w, x = np.asarray(w), np.asarray(x)
    res = np.max(np.abs(a @ x - x * w[None, :]))
    assert res < 1e-9 * res32 + 1e-12 * n, f"res {res:.2e} (fp32 was {res32:.2e})"
    assert np.max(np.abs(x.T @ x - np.eye(n))) < 1e-13 * n


def test_syevdx_mixed_precision():
    n = 128
    a, _ = random_spd_pair(n, seed=51)
    w, z = syevdx(a, il=1, iu=32, cfg=CFG32)
    w_ref = np.linalg.eigvalsh(a)
    assert np.allclose(np.asarray(w), w_ref[:32], atol=1e-10 * n)
    res = np.max(np.abs(a @ np.asarray(z) - np.asarray(z) * np.asarray(w)[None, :]))
    assert res < 1e-10 * n


def test_dsygvdx_mixed_precision():
    n = 96
    a, b = random_spd_pair(n, seed=52)
    w, z, info = dsygvdx(a, b, il=1, iu=24, cfg=CFG32)
    assert int(info) == 0
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref[:24], atol=1e-9 * n)
    assert ge_residual(a, b, np.asarray(w), np.asarray(z)) < 1e-11


def test_refine_gevp_recovers_fp64():
    """fp32-quality generalized eigenpairs refined to fp64 residuals
    against the fp64 (A, B) pair directly (ops/refine.refine_gevp)."""
    n = 96
    a, b = random_spd_pair(n, seed=55)
    w32, x32 = scipy.linalg.eigh(a.astype(np.float32), b.astype(np.float32))
    from eigensolver_gpu_tpu.ops.refine import refine_gevp

    w, x = refine_gevp(a, b, x32.astype(np.float64), sweeps=2)
    w, x = np.asarray(w), np.asarray(x)
    res = np.max(np.abs(a @ x - b @ x * w[None, :]))
    assert res < 1e-12 * n
    # B-orthonormality restored by the E_ii = R_ii/2 term
    assert np.max(np.abs(x.T @ b @ x - np.eye(n))) < 1e-11 * n
    assert np.allclose(w, scipy.linalg.eigh(a, b, eigvals_only=True), atol=1e-11 * n)
