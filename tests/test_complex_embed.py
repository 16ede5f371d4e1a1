"""Real-embedding complex solver tests (the no-complex-dtype TPU path)."""

import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu import SolverConfig
from eigensolver_gpu_tpu.ops.complex_embed import zhegvdx_via_embedding
from eigensolver_gpu_tpu.utils.testing import (
    ge_residual,
    orthonormality_error,
    qe_style_pair,
    random_hpd_pair,
)


@pytest.mark.parametrize("n,il,iu", [(48, 1, 12), (64, 3, 20)])
def test_embedded_matches_scipy(n, il, iu):
    a, b = random_hpd_pair(n, seed=70)
    w, zr, zi, info = zhegvdx_via_embedding(a, b, il=il, iu=iu)
    assert int(info) == 0
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w = np.asarray(w)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(w, w_ref[il - 1 : iu], atol=1e-10 * n)
    assert ge_residual(a, b, w, z) < 1e-12
    assert orthonormality_error(z, b) < 1e-9 * n


def test_embedded_qe_spectrum():
    n = 96
    a, b = qe_style_pair(n, seed=71)
    w, zr, zi, info = zhegvdx_via_embedding(a, b, il=1, iu=24)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref[:24], atol=1e-9 * n)
    assert ge_residual(a, b, np.asarray(w), z) < 1e-11


def test_embedded_exactly_degenerate_spectrum():
    """VERDICT r1 #6: exactly-multiple Hermitian eigenvalues through the
    embedding path. The naive every-other-column pick returned linearly
    DEPENDENT complex vectors here (x(Jy) = i x(y) spans the same
    complex line); the structure-preserving Rayleigh-Ritz extraction
    must return B-orthonormal eigenpairs with full rank."""
    n = 64
    rng = np.random.default_rng(72)
    t = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    q, _ = np.linalg.qr(t)
    w0 = np.sort(rng.standard_normal(n))
    w0[3:9] = w0[3]       # 6-fold degenerate cluster inside the range
    w0[20:24] = w0[20]    # and a second one
    a = (q * w0[None, :]) @ q.conj().T
    a = (a + a.conj().T) / 2
    b = np.eye(n, dtype=complex)
    m = 32
    w, zr, zi, info = zhegvdx_via_embedding(a, b, il=1, iu=m)
    assert int(info) == 0
    z = np.asarray(zr) + 1j * np.asarray(zi)
    w = np.asarray(w)
    assert np.allclose(w, w0[:m], atol=1e-10 * n)
    # full rank + orthonormal (the old pick failed exactly here)
    assert orthonormality_error(z, b) < 1e-9 * n
    assert np.linalg.matrix_rank(z, tol=1e-6) == m
    assert ge_residual(a, b, w, z) < 1e-12
