"""Pallas bulge chase vs the XLA chase (interpret mode on CPU)."""

import contextlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_pallas
from eigensolver_gpu_tpu.ops.sb2st import (
    apply_q2,
    band_to_dense,
    bulge_chase,
    dense_to_band,
)


@contextlib.contextmanager
def _deterministic_lowering():
    """Pin an unoptimized XLA lowering for BIT-exactness comparisons.

    The batch3 and per-timestep kernels run the same window arithmetic
    on the same values; only the band<->register staging differs. That
    makes them bitwise-identical under any fixed instruction selection
    -- but the two variants are *different surrounding programs*, and
    the optimizing XLA CPU pipeline is free to contract FMAs
    differently in each (observed: d drifts 4e-5 abs on the planar
    pair under full optimization, while the no-opt lowering and the
    real Mosaic TPU lowering are both exactly equal). Scoping
    jax_disable_most_optimizations to these tests keeps the strict
    staging check without testing a non-production compiler config
    anywhere else (see tests/conftest.py for why it must not be
    global)."""
    old = jax.config.read("jax_disable_most_optimizations")
    jax.config.update("jax_disable_most_optimizations", True)
    try:
        yield
    finally:
        jax.config.update("jax_disable_most_optimizations", old)


def _rand_band(rng, n, b):
    t = rng.standard_normal((n, n)).astype(np.float32)
    a = (t + t.T) / 2
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    return a * mask


@pytest.mark.parametrize("n,b", [(24, 4), (40, 8), (96, 16)])
def test_chase_pallas_matches_xla(n, b):
    rng = np.random.default_rng(0)
    a = _rand_band(rng, n, b)
    band = jnp.asarray(dense_to_band(jnp.asarray(a), b))
    d0, e0, vt0, tau0 = bulge_chase(band, b)
    d1, e1, vt1, tau1 = bulge_chase_pallas(band, b, tb=6, interpret=True)
    # the decomposed-trapezoid update sums in a different order than the
    # XLA dense-window einsums, so fp32 round-off drifts across the
    # sequential steps: compare at drift tolerance, correctness is
    # pinned by the spectrum/replay test below
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.abs(np.asarray(e1)), np.abs(np.asarray(e0)), rtol=2e-3, atol=2e-3
    )
    # tau=0 padding beyond the XLA chase's timestep count
    t0 = vt0.shape[0]
    np.testing.assert_allclose(
        np.asarray(tau1)[:t0], np.asarray(tau0), rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(tau1)[t0:], 0.0)


def test_chase_pallas_multigroup_spectrum():
    """The aligned grouped band access (groups of <= b slots, trimmed
    tiled writes) must preserve the spectrum across group boundaries:
    n=784, b=16 gives S=17 slots = 2 groups, the second of size 1."""
    n, b = 784, 16
    rng = np.random.default_rng(3)
    a = _rand_band(rng, n, b)
    band = jnp.asarray(dense_to_band(jnp.asarray(a), b))
    d, e, _, _ = bulge_chase_pallas(band, b, tb=96, interpret=True)
    import scipy.linalg

    w_ref = np.sort(scipy.linalg.eigvalsh(a))
    tri = (
        np.diag(np.asarray(d))
        + np.diag(np.asarray(e), 1)
        + np.diag(np.asarray(e), -1)
    )
    w = np.sort(scipy.linalg.eigvalsh(tri))
    scale = max(1.0, np.abs(w_ref).max())
    assert np.abs(w - w_ref).max() / scale < 5e-5


def test_chase_pallas_spectrum_and_replay():
    n, b = 32, 4
    rng = np.random.default_rng(1)
    a = _rand_band(rng, n, b)
    band = jnp.asarray(dense_to_band(jnp.asarray(a), b))
    d, e, vt, taut = bulge_chase_pallas(band, b, tb=9, interpret=True)
    import scipy.linalg

    w_ref = np.sort(scipy.linalg.eigvalsh(a))
    tri = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) + np.diag(np.asarray(e), -1)
    w = np.sort(scipy.linalg.eigvalsh(tri))
    np.testing.assert_allclose(w, w_ref, rtol=1e-4, atol=1e-4)
    # full similarity: Q2 replay applied to the tridiagonal eigenvectors
    wt, q = scipy.linalg.eigh(tri)
    z = np.asarray(apply_q2(vt, taut, jnp.asarray(q.astype(np.float32)), n, b))
    resid = a @ z - z * wt[None, :]
    assert np.abs(resid).max() < 5e-4


def test_chase_ladder_fallback_spectrum():
    """EIGSOLVE_CHASE_LADDER=1 (the masked-roll ladder escape hatch for
    toolchains that reject the strided roll) must stay correct: flip the
    module flag, clear the jit cache (the flag is read at trace time),
    and check spectrum preservation for the real and planar kernels.
    (Element-wise d/e comparison against the strided-roll kernel is NOT
    valid: the two compilations reassociate fp32 reductions differently
    (~1e-5), and the sequential chase amplifies that drift element-wise
    while leaving the spectrum intact -- verified during round 4.)"""
    import scipy.linalg

    import eigensolver_gpu_tpu.ops.chase_pallas as cp

    # n=64 keeps interpret-mode cost down (same grouped/ladder code
    # paths as n=96 -- s_slots=3 still exercises multi-slot groups --
    # at ~half the 85 s this test used to take, VERDICT r4 #7)
    n, b = 64, 8
    rng = np.random.default_rng(11)
    a = _rand_band(rng, n, b)
    band = jnp.asarray(dense_to_band(jnp.asarray(a), b))
    ti = rng.standard_normal((n, n)).astype(np.float32)
    ai = (ti - ti.T) / 2 * (np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b)
    band_i = jnp.asarray(dense_to_band(jnp.asarray(ai), b))

    old = cp._ladder_choice
    cp.bulge_chase_pallas.clear_cache()
    cp.bulge_chase_planar_pallas.clear_cache()
    try:
        cp._ladder_choice = lambda interpret: True
        d1, e1, _, _ = cp.bulge_chase_pallas(band, b, tb=6, interpret=True)
        dp1, (epr1, epi1), _, _ = cp.bulge_chase_planar_pallas(
            band, band_i, b, tb=6, interpret=True
        )
    finally:
        cp._ladder_choice = old
        cp.bulge_chase_pallas.clear_cache()
        cp.bulge_chase_planar_pallas.clear_cache()

    w_ref = np.sort(scipy.linalg.eigvalsh(a))
    tri = (
        np.diag(np.asarray(d1))
        + np.diag(np.asarray(e1), 1)
        + np.diag(np.asarray(e1), -1)
    )
    w = np.sort(scipy.linalg.eigvalsh(tri))
    scale = max(1.0, np.abs(w_ref).max())
    assert np.abs(w - w_ref).max() / scale < 5e-5

    wz_ref = np.sort(scipy.linalg.eigvalsh(a + 1j * ai))
    ez = np.hypot(np.asarray(epr1), np.asarray(epi1))
    triz = (
        np.diag(np.asarray(dp1)) + np.diag(ez, 1) + np.diag(ez, -1)
    )
    wz = np.sort(scipy.linalg.eigvalsh(triz))
    scale = max(1.0, np.abs(wz_ref).max())
    assert np.abs(wz - wz_ref).max() / scale < 5e-5


def test_batch3_bitexact_vs_per_timestep():
    """The vmax-batched kernel (batch3: 3 sub-steps per band round trip,
    _chase_kernel_b3) must be BIT-IDENTICAL to the per-timestep kernel:
    the window arithmetic is the same code on the same values; only the
    band<->register staging (neighbor-exchange view, ownership-tiled
    write) differs, so any staging bug shows as a nonzero diff."""
    n, b = 96, 8
    rng = np.random.default_rng(3)
    a = _rand_band(rng, n, b)
    band = jnp.asarray(dense_to_band(jnp.asarray(a), b))
    with _deterministic_lowering():
        r0 = bulge_chase_pallas(band, b, tb=6, interpret=True)
        r1 = bulge_chase_pallas(band, b, tb=6, interpret=True, batch3=True)
    for name, x0, x1 in zip(["d", "e", "vt", "tau"], r0, r1):
        np.testing.assert_array_equal(
            np.asarray(x0), np.asarray(x1), err_msg=name
        )


def test_batch3_planar_bitexact_vs_per_timestep():
    """Planar complex twin of the bit-exactness check: the batch3 path
    shares _window_update_planar with the per-timestep planar kernel,
    so any diff is a staging bug in the 2-plane neighbor-exchange view
    or the per-plane ownership-tiled write."""
    from eigensolver_gpu_tpu.ops.chase_pallas import (
        bulge_chase_planar_pallas,
    )

    n, b = 96, 8
    rng = np.random.default_rng(7)
    a = _rand_band(rng, n, b)
    ti = rng.standard_normal((n, n)).astype(np.float32)
    ai = (ti - ti.T) / 2 * (
        np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    )
    band_r = jnp.asarray(dense_to_band(jnp.asarray(a), b))
    band_i = jnp.asarray(dense_to_band(jnp.asarray(ai), b))
    with _deterministic_lowering():
        r0 = bulge_chase_planar_pallas(
            band_r, band_i, b, tb=6, interpret=True
        )
        r1 = bulge_chase_planar_pallas(
            band_r, band_i, b, tb=6, interpret=True, batch3=True
        )

    def _flat(r):
        d, (er, ei), (vtr, vti), (taur, taui) = r
        return [
            ("d", d), ("e_r", er), ("e_i", ei), ("vt_r", vtr),
            ("vt_i", vti), ("tau_r", taur), ("tau_i", taui),
        ]

    for (name, x0), (_, x1) in zip(_flat(r0), _flat(r1)):
        np.testing.assert_array_equal(
            np.asarray(x0), np.asarray(x1), err_msg=name
        )


@pytest.mark.skipif(
    not os.environ.get("EIGSOLVE_SLOW_TESTS"),
    reason="multi-group batch3 needs n >= 3b^2+3 (~4 min interpret); "
    "run with EIGSOLVE_SLOW_TESTS=1 (validated bit-exact at n=224 in "
    "round 5)",
)
def test_batch3_bitexact_multigroup():
    """s_slots > b: two slot groups, exercising the cross-group h0/h1
    handoff and the descending group order."""
    n, b = 224, 8
    rng = np.random.default_rng(5)
    a = _rand_band(rng, n, b)
    band = jnp.asarray(dense_to_band(jnp.asarray(a), b))
    with _deterministic_lowering():
        r0 = bulge_chase_pallas(band, b, tb=24, interpret=True)
        r1 = bulge_chase_pallas(band, b, tb=24, interpret=True, batch3=True)
    for name, x0, x1 in zip(["d", "e", "vt", "tau"], r0, r1):
        np.testing.assert_array_equal(
            np.asarray(x0), np.asarray(x1), err_msg=name
        )
