"""Stage-1 band reduction: bandedness, similarity, spectrum preservation,
and the full two-stage pipeline (sbrd -> bulge_chase -> replay)."""

import numpy as np
import pytest
import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.sb2st import (
    apply_q2,
    band_to_dense,
    bulge_chase,
    dense_to_band,
)
from eigensolver_gpu_tpu.ops.sbrd import apply_q1, sbrd
from eigensolver_gpu_tpu.utils.testing import random_spd_pair


@pytest.mark.parametrize("n,b,bucket", [(128, 32, 512), (192, 32, 96), (256, 64, 128)])
def test_sbrd_band_and_similarity(n, b, bucket):
    a, _ = random_spd_pair(n, seed=110)
    ab, vs, ts = sbrd(a, band=b, bucket=bucket)
    q = np.asarray(apply_q1(vs, ts, np.eye(n)))
    ab = np.asarray(ab)
    # banded: zero outside half-width b
    for k in range(b + 1, n):
        assert np.abs(np.diag(ab, k)).max() < 1e-11 * n, f"diag {k} not zero"
    # orthogonality and similarity
    assert np.abs(q.T @ q - np.eye(n)).max() < 1e-12 * n
    assert np.abs(q @ ab @ q.T - a).max() < 1e-11 * n
    # spectrum preserved
    w = np.linalg.eigvalsh(ab)
    w_ref = np.linalg.eigvalsh(a)
    assert np.allclose(w, w_ref, atol=1e-11 * n)


def test_sbrd_validation():
    a = np.eye(64)
    with pytest.raises(ValueError):
        sbrd(a, band=48)  # n < 3*band


@pytest.mark.parametrize("n,b", [(64, 4), (96, 8), (100, 6)])
def test_bulge_chase_spectrum(n, b):
    rng = np.random.default_rng(111)
    t0 = rng.standard_normal((n, n))
    a = (t0 + t0.T) / 2
    a[np.abs(np.subtract.outer(range(n), range(n))) > b] = 0
    band = dense_to_band(a, b)
    assert np.abs(np.asarray(band_to_dense(band, b)) - a).max() < 1e-14
    d, e, vt, taut = bulge_chase(band, b)
    d, e = np.asarray(d), np.asarray(e)
    tri = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    assert np.allclose(np.linalg.eigvalsh(tri), np.linalg.eigvalsh(a), atol=1e-11 * n)


@pytest.mark.parametrize("g", [1, 5, 8, 16])
def test_apply_q2_blocked_matches_scalar(g):
    """The blocked WY replay must equal the g=1 scalar-order replay."""
    n, b = 96, 8
    rng = np.random.default_rng(112)
    t0 = rng.standard_normal((n, n))
    a = (t0 + t0.T) / 2
    a[np.abs(np.subtract.outer(range(n), range(n))) > b] = 0
    d, e, vt, taut = bulge_chase(dense_to_band(a, b), b)
    d, e = np.asarray(d), np.asarray(e)
    w, y = np.linalg.eigh(np.diag(d) + np.diag(e, 1) + np.diag(e, -1))
    z1 = np.asarray(apply_q2(vt, taut, y, n, b, g=1))
    z = np.asarray(apply_q2(vt, taut, y, n, b, g=g))
    assert np.abs(z - z1).max() < 1e-12
    assert np.abs(a @ z - z * w).max() < 1e-11 * n


@pytest.mark.parametrize("n,b", [(128, 16), (192, 32)])
def test_two_stage_end_to_end(n, b):
    """dense -> band -> tridiagonal -> eigvecs via Q1 Q2 replay."""
    a, _ = random_spd_pair(n, seed=113)
    ab, vs, ts = sbrd(a, band=b)
    d, e, vt, taut = bulge_chase(dense_to_band(np.asarray(ab), b), b)
    d, e = np.asarray(d), np.asarray(e)
    w, y = np.linalg.eigh(np.diag(d) + np.diag(e, 1) + np.diag(e, -1))
    z = np.asarray(apply_q1(vs, ts, apply_q2(vt, taut, y, n, b)))
    w_ref = np.linalg.eigvalsh(a)
    assert np.allclose(w, w_ref, atol=1e-11 * n)
    assert np.abs(a @ z - z * w[None, :]).max() < 1e-11 * n
    assert np.abs(z.T @ z - np.eye(n)).max() < 1e-11 * n


@pytest.mark.parametrize("b,gs", [
    (4, (3, 4, 8, 9, 12, 16)),       # g through 4b incl. odd boundaries
    (8, (8, 16, 17, 24, 32)),
    (16, (16, 32, 33, 48, 64)),
])
def test_apply_q2_wave_schedule_any_g(b, gs):
    """Property test of the wave-schedule validity argument (apply_q2
    docstring): the blocked replay must equal the scalar replay for ANY
    g, including g > 2b. Round 2's corruption at g > 2b was NOT a
    schedule invariant but a slot-count bug (n_u capped by n_groups,
    dropping high-hop windows of low groups when n_groups < kmax//2+1);
    this sweep pins the fix across the old boundary."""
    n = 16 * b
    rng = np.random.default_rng(7)
    t = rng.standard_normal((n, n))
    a_full = (t + t.T) / 2
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    band = dense_to_band(jnp.asarray(a_full * mask), b)
    d, e, vt, taut = bulge_chase(band, b)
    y = jnp.asarray(rng.standard_normal((n, 8)))
    z1 = np.asarray(apply_q2(vt, taut, y, n, b, g=1))
    for g in gs:
        z = np.asarray(apply_q2(vt, taut, y, n, b, g=g))
        np.testing.assert_allclose(z, z1, rtol=0, atol=1e-12,
                                   err_msg=f"b={b} g={g}")
