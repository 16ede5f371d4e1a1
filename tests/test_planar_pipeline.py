"""Planar complex pipeline tests: hetrd_planar, unmtr_planar, and the
full planar zhegvdx driver vs scipy complex oracles."""

import numpy as np
import pytest
import scipy.linalg
from scipy.linalg import lapack

from eigensolver_gpu_tpu import SolverConfig
from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar_host
from eigensolver_gpu_tpu.ops.sytrd_planar import hetrd_planar
from eigensolver_gpu_tpu.ops.unmtr_planar import unmtr_planar
from eigensolver_gpu_tpu.utils.testing import (
    ge_residual,
    orthonormality_error,
    qe_style_pair,
    random_hpd_pair,
)


def _dense_tridiag(d, e):
    return np.diag(d) + np.diag(e, 1) + np.diag(e, -1)


@pytest.mark.parametrize("n", [32, 96])
def test_hetrd_planar_spectrum(n):
    a, _ = random_hpd_pair(n, seed=90)
    (pr, pi), d, e, _ = hetrd_planar(a.real.copy(), a.imag.copy(), nb=32, bucket=32)
    w = np.linalg.eigvalsh(_dense_tridiag(np.asarray(d), np.asarray(e)))
    w_ref = np.linalg.eigvalsh(a)
    assert np.allclose(w, w_ref, atol=1e-11 * n)


def test_hetrd_planar_matches_lapack():
    n = 64
    a, _ = random_hpd_pair(n, seed=91)
    _, d, e, _ = hetrd_planar(a.real.copy(), a.imag.copy(), nb=32, bucket=64)
    c, d_ref, e_ref, tau_ref, info = lapack.zhetrd(a, lower=0)
    assert info == 0
    assert np.allclose(np.asarray(d), d_ref, atol=1e-12 * n)
    assert np.allclose(np.abs(np.asarray(e)), np.abs(e_ref), atol=1e-12 * n)


def test_unmtr_planar_reconstructs():
    n = 64
    a, _ = random_hpd_pair(n, seed=92)
    (pr, pi), d, e, (tr, ti) = hetrd_planar(
        a.real.copy(), a.imag.copy(), nb=32, bucket=64
    )
    # Q via applying to the identity (planar)
    eye = np.eye(n)
    zr, zi = unmtr_planar(pr, pi, tr, ti, eye, np.zeros((n, n)), nb=32)
    q = np.asarray(zr) + 1j * np.asarray(zi)
    t = _dense_tridiag(np.asarray(d), np.asarray(e)).astype(complex)
    assert np.allclose(q @ q.conj().T, np.eye(n), atol=1e-12 * n)
    assert np.allclose(q @ t @ q.conj().T, a, atol=1e-11 * n)


@pytest.mark.parametrize("n,il,iu", [(64, 1, 16), (128, 5, 40), (100, 2, 30)])
def test_zhegvdx_planar(n, il, iu):
    a, b = random_hpd_pair(n, seed=93)
    w, zr, zi, info = zhegvdx_planar_host(a, b, il=il, iu=iu)
    assert int(info) == 0
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w = np.asarray(w)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(w, w_ref[il - 1 : iu], atol=1e-10 * n)
    assert ge_residual(a, b, w, z) < 1e-12
    assert orthonormality_error(z, b) < 1e-9 * n


def test_zhegvdx_planar_qe():
    n = 96
    a, b = qe_style_pair(n, seed=94)
    w, zr, zi, info = zhegvdx_planar_host(a, b, il=1, iu=24)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref[:24], atol=1e-9 * n)
    assert ge_residual(a, b, np.asarray(w), z) < 1e-11


def test_zhegvdx_planar_batched():
    from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar_batched

    batch, n, iu = 3, 64, 8
    a = np.empty((batch, n, n), complex)
    b = np.empty((batch, n, n), complex)
    for k in range(batch):
        a[k], b[k] = random_hpd_pair(n, seed=95 + k)
    w, zr, zi, info = zhegvdx_planar_batched(
        np.ascontiguousarray(a.real), np.ascontiguousarray(a.imag),
        np.ascontiguousarray(b.real), np.ascontiguousarray(b.imag),
        il=1, iu=iu,
    )
    for k in range(batch):
        z = np.asarray(zr)[k] + 1j * np.asarray(zi)[k]
        w_ref = scipy.linalg.eigh(a[k], b[k], eigvals_only=True)
        assert np.allclose(np.asarray(w)[k], w_ref[:iu], atol=1e-10 * n)
        assert ge_residual(a[k], b[k], np.asarray(w)[k], z) < 1e-12


def test_zhegvdx_planar_mixed_precision():
    n = 128
    a, b = random_hpd_pair(n, seed=96)
    cfg = SolverConfig(compute_dtype="float32", refine_iters=2)
    w, zr, zi, info = zhegvdx_planar_host(a, b, il=1, iu=32, cfg=cfg)
    assert int(info) == 0
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w = np.asarray(w)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(w, w_ref[:32], atol=1e-9 * n)
    assert ge_residual(a, b, w, z) < 1e-12
    assert orthonormality_error(z, b) < 1e-9 * n


def test_zhegvdx_planar_mixed_trinv():
    """planar_solve_mode='trinv': one full block-doubled inv(L) replaces
    all three fp32 triangular solves; the fp64 refinement must absorb
    the explicit-inverse forward error to the same contract."""
    n = 128  # trinv requires n = 128 * 2^k (one doubling level suffices
    # to exercise the merge identity; n=256 doubled the stedc depth and
    # cost ~100 s of XLA CPU compile per cold run, VERDICT r4 #7)
    a, b = random_hpd_pair(n, seed=97)
    cfg = SolverConfig(
        compute_dtype="float32", refine_iters=2, planar_solve_mode="trinv"
    )
    w, zr, zi, info = zhegvdx_planar_host(a, b, il=1, iu=32, cfg=cfg)
    assert int(info) == 0
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w = np.asarray(w)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(w, w_ref[:32], atol=1e-9 * n)
    assert ge_residual(a, b, w, z) < 1e-12
    assert orthonormality_error(z, b) < 1e-9 * n


def test_zhegvdx_planar_trinv_pure_fp32():
    """'trinv' on a pure-fp32 planar solve (no refinement): forward
    error ~eps32 * kappa -- same contract class as 'blockinv'."""
    n = 128
    a, b = random_hpd_pair(n, seed=98)
    a32 = a.astype(np.complex64)
    b32 = b.astype(np.complex64)
    cfg = SolverConfig(planar_solve_mode="trinv")
    w, zr, zi, info = zhegvdx_planar_host(a32, b32, il=1, iu=n, cfg=cfg)
    assert int(info) == 0
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref, atol=5e-3 * n)
    assert ge_residual(a, b, np.asarray(w), z) < 1e-4


def test_zhegvdx_planar_batched_chunked():
    from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar_batched

    batch, n, iu = 4, 32, 4
    a = np.empty((batch, n, n), complex)
    b = np.empty((batch, n, n), complex)
    for k in range(batch):
        a[k], b[k] = random_hpd_pair(n, seed=97 + k)
    w, zr, zi, info = zhegvdx_planar_batched(
        np.ascontiguousarray(a.real), np.ascontiguousarray(a.imag),
        np.ascontiguousarray(b.real), np.ascontiguousarray(b.imag),
        il=1, iu=iu, chunk=2,
    )
    for k in range(batch):
        z = np.asarray(zr)[k] + 1j * np.asarray(zi)[k]
        w_ref = scipy.linalg.eigh(a[k], b[k], eigvals_only=True)
        assert np.allclose(np.asarray(w)[k], w_ref[:iu], atol=1e-10 * n)


def test_hetrd_planar_pallas_path():
    """use_pallas hetrd (interpret mode on CPU) matches the plain path."""
    import jax.numpy as jnp

    n = 512  # mb % 512 == 0 so the Pallas gate opens
    a, _ = random_hpd_pair(n, seed=98)
    ar = np.ascontiguousarray(a.real, np.float32)
    ai = np.ascontiguousarray(a.imag, np.float32)
    _, d0, e0, _ = hetrd_planar(ar, ai, nb=32, use_pallas=False)
    _, d1, e1, _ = hetrd_planar(ar, ai, nb=32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.abs(np.asarray(e0)), np.abs(np.asarray(e1)),
                               rtol=1e-4, atol=1e-3)


def test_zhegvdx_planar_uplo_contract():
    """UPLO='U': garbage in the strict lower triangles must not change
    the result (advisor finding: the planar driver previously read the
    full matrix and returned NaN with info=0)."""
    n, iu = 64, 12
    a, b = random_hpd_pair(n, seed=97)
    w0, zr0, zi0, info0 = zhegvdx_planar_host(a, b, il=1, iu=iu)
    rng = np.random.default_rng(98)
    trash = lambda x: x + np.tril(
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)), -1
    ) * 1e3
    w1, zr1, zi1, info1 = zhegvdx_planar_host(trash(a), trash(b), il=1, iu=iu)
    assert int(info1) == 0
    assert np.allclose(np.asarray(w1), np.asarray(w0), atol=1e-11 * n)
    assert np.allclose(np.abs(np.asarray(zr1) + 1j * np.asarray(zi1)),
                       np.abs(np.asarray(zr0) + 1j * np.asarray(zi0)),
                       atol=1e-9 * n)


def test_zhegvdx_planar_range_validation():
    n = 32
    a, b = random_hpd_pair(n, seed=99)
    for il, iu in [(0, 8), (5, 4), (1, n + 1), (-1, 8)]:
        with pytest.raises(ValueError):
            zhegvdx_planar_host(a, b, il=il, iu=iu)


def test_zhegvdx_planar_stedc_backend_xla():
    """cfg.stedc_backend='xla' must actually switch the tridiagonal
    eigensolver (review finding: the planar driver silently ignored the
    knob), on both the one-stage and two-stage reduction paths."""
    from eigensolver_gpu_tpu.utils.config import SolverConfig

    n, iu = 96, 10
    a, b = random_hpd_pair(n, seed=96)
    import scipy.linalg

    want = scipy.linalg.eigh(a, b, eigvals_only=True)[:iu]
    for mode in ("one", "two"):
        cfg = SolverConfig(stedc_backend="xla", tridiag_mode=mode, band=32)
        w, zr, zi, info = zhegvdx_planar_host(a, b, il=1, iu=iu, cfg=cfg)
        assert int(info) == 0
        np.testing.assert_allclose(np.asarray(w), want, atol=1e-10 * n,
                                   err_msg=f"tridiag_mode={mode}")
