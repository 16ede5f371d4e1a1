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


def test_refine_sweeps_zero_with_escalation():
    """sweeps=0 + extra_max>0 must seed the defect gate with one sweep
    instead of crashing at trace time (round-3 advisor finding)."""
    n = 48
    a, b = random_spd_pair(n, seed=56)
    from eigensolver_gpu_tpu.ops.refine import refine_gevp

    w32, x32 = scipy.linalg.eigh(a.astype(np.float32), b.astype(np.float32))
    w, x = refine_gevp(a, b, x32.astype(np.float64), sweeps=0, extra_max=3)
    w, x = np.asarray(w), np.asarray(x)
    res = np.max(np.abs(a @ x - b @ x * w[None, :]))
    assert res < 1e-11 * n


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


def test_dsygvdx_mixed_degenerate_cluster():
    """Exactly-degenerate and 1e-9-split clusters through the full-fp32
    pipeline + ozaki-refined generalized sweep: the separated-root
    formula must yield to the cluster branch (E = R/2) without residual
    loss (ADVICE/VERDICT adversarial coverage)."""
    from eigensolver_gpu_tpu import SolverConfig, dsygvdx

    n = 128
    rng = np.random.default_rng(60)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w_true = np.sort(np.concatenate([
        np.full(8, 1.0),                      # exact 8-fold degeneracy
        1.0 + 1e-9 * np.arange(1, 5),         # tight cluster
        rng.uniform(2.0, 50.0, n - 12),
    ]))
    a = (q * w_true[None, :]) @ q.T
    a = (a + a.T) / 2
    t = rng.standard_normal((n, n))
    b = t @ t.T / n + np.eye(n)
    # generalized pair with the same clustered structure via B=I-like
    cfg = SolverConfig(compute_dtype="float32", refine_iters=2)
    w, z, info = dsygvdx(a, np.eye(n), il=1, iu=n, cfg=cfg)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(w), w_true, rtol=0, atol=1e-10 * n)
    res = np.max(np.abs(a @ np.asarray(z) - np.asarray(z) * np.asarray(w)[None, :]))
    # vectors inside the 1e-9-split cluster mix freely (the cluster
    # branch only restores orthonormality), so the residual floor is
    # the cluster spread -- same as LAPACK; eigenvalues are exact above
    assert res < 4e-9 * n
    # B-orthonormality of the degenerate subspace
    g = np.asarray(z).T @ np.asarray(z)
    assert np.max(np.abs(g - np.eye(n))) < 1e-10 * n
    # true generalized pair too
    w2, z2, info2 = dsygvdx(a, b, il=1, iu=32, cfg=cfg)
    import scipy.linalg as sla

    ref = sla.eigh(a, b, eigvals_only=True)[:32]
    assert np.allclose(np.asarray(w2), ref, atol=1e-9 * n)
    res2 = np.max(np.abs(a @ np.asarray(z2) - b @ np.asarray(z2) * np.asarray(w2)[None, :]))
    assert res2 < 1e-10 * n


def test_refine_iters4_second_f64_sweep():
    """refine_iters=4 buys a second fp64 sweep: for gaps near
    eps32*anorm the single-sweep accuracy cap (theta^2 * gap) drops
    quadratically (measured 6.4e-9 -> 3.7e-10 on the cluster fixture)."""
    from eigensolver_gpu_tpu import SolverConfig, dsygvdx

    n = 128
    rng = np.random.default_rng(60)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w_true = np.sort(np.concatenate([
        np.full(8, 1.0), 1.0 + 1e-9 * np.arange(1, 5),
        rng.uniform(2.0, 50.0, n - 12),
    ]))
    a = (q * w_true[None, :]) @ q.T
    a = (a + a.T) / 2
    cfg = SolverConfig(compute_dtype="float32", refine_iters=4)
    w, z, info = dsygvdx(a, np.eye(n), il=1, iu=n, cfg=cfg)
    z = np.asarray(z)
    res = np.abs(a @ z - z * np.asarray(w)[None, :]).max()
    g = np.abs(z.T @ z - np.eye(n)).max()
    assert res < 1e-9
    assert g < 1e-9


def test_selected_range_economy_matches_full():
    """Selected-block refinement (sel + margin, the round-3 n^2*ms
    economy) must reach the same residuals as full-spectrum refinement
    and return exactly the requested pairs (reference NZ-column
    behavior, dsyevd_gpu.F90:108,119-128)."""
    n = 192
    a, b = random_spd_pair(n, seed=70)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    # interior range with both boundaries cutting the spectrum
    il, iu = 33, 64
    w, z, info = dsygvdx(a, b, il=il, iu=iu, cfg=CFG32)
    assert int(info) == 0
    assert np.asarray(w).shape == (iu - il + 1,)
    np.testing.assert_allclose(np.asarray(w), w_ref[il - 1 : iu],
                               rtol=0, atol=1e-11 * n)
    z = np.asarray(z)
    res = np.max(np.abs(a @ z - b @ z * np.asarray(w)[None, :]))
    assert res < 1e-11, f"selected-range residual {res:.2e}"
    # B-orthonormality of the selected block
    g = z.T @ b @ z
    assert np.max(np.abs(g - np.eye(iu - il + 1))) < 1e-10


def test_selected_range_cluster_straddles_cut():
    """A tight eigenvalue cluster straddling the iu selection cut: the
    refine_margin must keep the whole cluster in-block so its members
    get accurate in-block fp64 Rayleigh quotients (out-of-block
    denominators carry O(eps32*anorm) error)."""
    n = 160
    rng = np.random.default_rng(71)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    # cluster of 8 at 1.0 spanning indices 29..36 (1-based); cut at iu=32
    w_true = np.sort(np.concatenate([
        rng.uniform(0.01, 0.9, 28),
        1.0 + 1e-10 * np.arange(8),
        rng.uniform(1.5, 40.0, n - 36),
    ]))
    a = (q * w_true[None, :]) @ q.T
    a = (a + a.T) / 2
    w, z, info = dsygvdx(a, np.eye(n), il=1, iu=32, cfg=CFG32)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(w), w_true[:32], rtol=0, atol=2e-11 * n)
    z = np.asarray(z)
    res = np.max(np.abs(a @ z - z * np.asarray(w)[None, :]))
    # cluster spread 1e-10 bounds attainable residual for mixed vectors
    assert res < 5e-9


def test_auto_escalation_default_config():
    """VERDICT weak #5: the adversarial tight-cluster spectrum must meet
    the residual contract at the DEFAULT mixed config -- the defect
    measured on the in-hand grams triggers extra fp64 sweeps
    automatically (no manual refine_iters=4)."""
    n = 128
    rng = np.random.default_rng(60)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w_true = np.sort(np.concatenate([
        np.full(8, 1.0), 1.0 + 1e-9 * np.arange(1, 5),
        rng.uniform(2.0, 50.0, n - 12),
    ]))
    a = (q * w_true[None, :]) @ q.T
    a = (a + a.T) / 2
    cfg = SolverConfig(compute_dtype="float32")  # default refine_iters
    w, z, info = dsygvdx(a, np.eye(n), il=1, iu=n, cfg=cfg)
    z = np.asarray(z)
    res = np.abs(a @ z - z * np.asarray(w)[None, :]).max()
    g = np.abs(z.T @ z - np.eye(n)).max()
    assert res < 1e-9, f"auto-escalated residual {res:.2e}"
    assert g < 1e-9


def test_syevdx_selected_range_mixed():
    """Mixed-precision syevdx with an interior range through the
    selected-block refine_eigh path."""
    n = 160
    a, _ = random_spd_pair(n, seed=72)
    w_ref = np.linalg.eigvalsh(a)
    w, z = syevdx(a, il=49, iu=80, cfg=CFG32)
    assert np.asarray(w).shape == (32,)
    np.testing.assert_allclose(np.asarray(w), w_ref[48:80], rtol=0,
                               atol=1e-10 * n)
    z = np.asarray(z)
    res = np.max(np.abs(a @ z - z * np.asarray(w)[None, :]))
    assert res < 1e-11 * n


def test_zhegvdx_planar_selected_range_mixed():
    """Planar complex mixed driver with a selected range (the headline
    path): block refinement + NZ-column return."""
    from eigensolver_gpu_tpu.utils.testing import random_hpd_pair
    from eigensolver_gpu_tpu import zhegvdx_planar_host

    n = 128
    a, b = random_hpd_pair(n, seed=73)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    cfg = SolverConfig(compute_dtype="float32", refine_iters=3)
    w, zr, zi, info = zhegvdx_planar_host(a, b, il=17, iu=48, cfg=cfg)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(w), w_ref[16:48], rtol=0,
                               atol=1e-10 * n)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    res = np.max(np.abs(a @ z - b @ z * np.asarray(w)[None, :]))
    assert res < 1e-11 * n


def test_refine_sweeps_zero_32bit_is_noop():
    """32-bit refine with sweeps=0 and extra_max>0 must NOT run the
    escalation seed sweep: the defect-gated while_loop is 64-bit-only,
    so the seed would be pure unrequested cost (review finding)."""
    n = 32
    a, b = random_spd_pair(n, seed=57)
    from eigensolver_gpu_tpu.ops.refine import refine_gevp

    a32, b32 = a.astype(np.float32), b.astype(np.float32)
    w32, x32 = scipy.linalg.eigh(a32, b32)
    w, x = refine_gevp(a32, b32, x32, sweeps=0, extra_max=3)
    # sweeps=0 on a 32-bit dtype is a documented no-op on the basis
    np.testing.assert_array_equal(np.asarray(x), x32)
