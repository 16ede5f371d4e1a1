"""Fused Mosaic planar Cholesky block kernel (ops/pchol_pallas.py) vs
the XLA base loops it replaces (ops/planar._pchol_base + _fsub_base),
interpret mode (CPU CI; the compiled twin is covered by
benchmarks/kernel_smoke.py on the real chip)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.pchol_pallas import pchol_block_planar_pallas
from eigensolver_gpu_tpu.ops.planar import _fsub_base, _pchol_base


def _hpd(rng, nb):
    t = rng.standard_normal((nb, nb)) + 1j * rng.standard_normal((nb, nb))
    a = t @ t.conj().T + nb * np.eye(nb)
    return np.real(a).astype(np.float32), np.imag(a).astype(np.float32)


@pytest.mark.parametrize("nb", [8, 32, 128])
def test_pchol_block_matches_base(nb):
    rng = np.random.default_rng(0)
    ar, ai = _hpd(rng, nb)
    ldr, ldi, invr, invi, fail = pchol_block_planar_pallas(
        jnp.asarray(ar), jnp.asarray(ai), interpret=True
    )
    br, bi, fail0 = _pchol_base(jnp.asarray(ar), jnp.asarray(ai), nb)
    assert int(fail) == int(fail0) == 0
    scale = float(jnp.max(jnp.abs(br)))
    assert float(jnp.max(jnp.abs(ldr - br))) / scale < 1e-5
    assert float(jnp.max(jnp.abs(ldi - bi))) / scale < 1e-5
    # inverse: L^{-1} L = I in planar arithmetic
    pr = np.asarray(invr) @ np.asarray(ldr) - np.asarray(invi) @ np.asarray(ldi)
    pi = np.asarray(invr) @ np.asarray(ldi) + np.asarray(invi) @ np.asarray(ldr)
    assert np.max(np.abs(pr - np.eye(nb))) < 5e-5
    assert np.max(np.abs(pi)) < 5e-5


def test_pchol_block_oracle():
    rng = np.random.default_rng(1)
    nb = 64
    ar, ai = _hpd(rng, nb)
    ldr, ldi, _, _, fail = pchol_block_planar_pallas(
        jnp.asarray(ar), jnp.asarray(ai), interpret=True
    )
    l0 = np.linalg.cholesky(ar.astype(np.float64) + 1j * ai.astype(np.float64))
    got = np.asarray(ldr) + 1j * np.asarray(ldi)
    assert int(fail) == 0
    assert np.max(np.abs(got - l0)) / np.max(np.abs(l0)) < 1e-5


def test_pchol_block_devinfo_first_bad_pivot():
    d = np.array([4.0, -1.0, 2.0, -3.0, 1, 1, 1, 1], np.float32)
    ldr, ldi, _, _, fail = pchol_block_planar_pallas(
        jnp.asarray(np.diag(d)), jnp.zeros((8, 8), jnp.float32),
        interpret=True,
    )
    assert int(fail) == 2  # FIRST bad pivot, 1-based
    assert np.all(np.isfinite(np.asarray(ldr)))  # clamped, not NaN


def test_panel_solve_via_inverse_matches_fsub():
    """The caller's X = pan @ inv(L_d)^H gemm equals the substitution
    solve of X L_d^H = pan (to fp32 kappa-scaled tolerance)."""
    rng = np.random.default_rng(2)
    nb, nr = 32, 48
    ar, ai = _hpd(rng, nb)
    ldr, ldi, invr, invi, _ = pchol_block_planar_pallas(
        jnp.asarray(ar), jnp.asarray(ai), interpret=True
    )
    pan_r = jnp.asarray(rng.standard_normal((nr, nb)).astype(np.float32))
    pan_i = jnp.asarray(rng.standard_normal((nr, nb)).astype(np.float32))
    sub_r, sub_i = _fsub_base(ldr, ldi, pan_r.T, -pan_i.T, nb)
    x0_r, x0_i = sub_r.T, -sub_i.T
    x1_r = pan_r @ invr.T + pan_i @ invi.T
    x1_i = pan_i @ invr.T - pan_r @ invi.T
    assert float(jnp.max(jnp.abs(x1_r - x0_r))) < 1e-4
    assert float(jnp.max(jnp.abs(x1_i - x0_i))) < 1e-4
