"""Randomized stress sweep for the divide-and-conquer solver: many
seeds, sizes, and structured spectra -- the merge/deflation/secular
logic has data-dependent behavior that single seeds can miss."""

import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu.ops.stedc import stedc


def _check(d, e, leaf=32):
    n = d.shape[0]
    w, q = stedc(d, e, leaf=leaf)
    w, q = np.asarray(w), np.asarray(q)
    w_ref = scipy.linalg.eigh_tridiagonal(d, e, eigvals_only=True)
    scale = max(np.max(np.abs(w_ref)), 1.0)
    assert np.abs(w - w_ref).max() < 5e-13 * scale * n
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    res = np.abs(t @ q - q * w[None, :]).max()
    assert res < 1e-11 * scale * n
    assert np.abs(q.T @ q - np.eye(n)).max() < 1e-11 * n


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_random(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(40, 300))
    kind = seed % 4
    if kind == 0:  # plain gaussian
        d = rng.standard_normal(n)
        e = rng.standard_normal(n - 1)
    elif kind == 1:  # strong diagonal dominance (heavy deflation)
        d = 100.0 * rng.standard_normal(n)
        e = 1e-6 * rng.standard_normal(n - 1)
    elif kind == 2:  # near-Toeplitz (clustered ends)
        d = 2.0 + 1e-3 * rng.standard_normal(n)
        e = 1.0 + 1e-3 * rng.standard_normal(n - 1)
    else:  # random splits (exact decoupling)
        d = rng.standard_normal(n)
        e = rng.standard_normal(n - 1)
        e[rng.integers(0, n - 1, size=3)] = 0.0
    _check(d, e)


def test_fuzz_duplicated_eigenvalues():
    """Spectra with exact high multiplicity via direct sums."""
    rng = np.random.default_rng(7)
    d1 = rng.standard_normal(40)
    e1 = rng.standard_normal(39)
    # same block twice, decoupled -> every eigenvalue has multiplicity 2
    d = np.concatenate([d1, d1])
    e = np.concatenate([e1, [0.0], e1])
    _check(d, e, leaf=16)
