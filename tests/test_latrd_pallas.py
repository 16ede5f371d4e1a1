"""Fused Pallas zlatrd panel kernel vs the XLA compiled panel loop.

CI runs the kernel in interpret mode (CPU backend); the compiled-mode
path is exercised on the real chip via `EIGSOLVE_BENCH_PALLAS=1
python bench.py` (smoke) and benchmarks runs. The kernel's measured
perf story is in its module docstring (parity with the XLA loop --
recorded negative result, VERDICT r1 #5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.latrd_pallas import latrd_panel_planar
from eigensolver_gpu_tpu.ops.sytrd_planar import _panel_columns_planar, hetrd_planar


def _planar_pair(n, seed):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = (t + t.conj().T) / 2
    return jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32), a


@pytest.mark.parametrize("pe", [256, 224, 32])
def test_panel_matches_xla_loop(pe):
    mb, nb = 256, 32
    ar, ai, _ = _planar_pair(mb, 5)
    z = jnp.zeros((mb, nb), jnp.float32)
    d0 = jnp.zeros((mb,), jnp.float32)
    e0 = jnp.zeros((mb - 1,), jnp.float32)
    arx, aix, vr, vi, wr, wi, d, e, taur, taui = _panel_columns_planar(
        ar, ai, z, z, z, z, d0, e0, e0, e0, pe, nb, False
    )
    kvr, kvi, kwr, kwi, kcr, kci, scal = latrd_panel_planar(
        ar, ai, pe, nb=nb, tile=64, interpret=True
    )
    # fp32 summation-order differences on O(15)-magnitude data with
    # rank-2 accumulation: ~100 ulp absolute (the end-to-end test below
    # checks the spectrum, which is what actually matters)
    tol = 3e-4
    for got, want in [(kvr, vr), (kvi, vi), (kwr, wr), (kwi, wi)]:
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < tol
    cols_r = np.stack([np.asarray(arx)[:, pe - 1 - k] for k in range(nb)], axis=1)
    cols_i = np.stack([np.asarray(aix)[:, pe - 1 - k] for k in range(nb)], axis=1)
    assert np.abs(np.asarray(kcr) - cols_r).max() < tol
    assert np.abs(np.asarray(kci) - cols_i).max() < tol
    scal = np.asarray(scal)
    d_ref = np.array([np.asarray(d)[pe - 1 - k] for k in range(nb)])
    assert np.abs(scal[0] - d_ref).max() < tol


def test_hetrd_planar_pallas_end_to_end():
    """Full reduction through the kernel: the tridiagonal's spectrum
    must match the dense spectrum to fp32 scale."""
    n = 512
    ar, ai, a = _planar_pair(n, 7)
    _, d, e, _ = hetrd_planar(ar, ai, nb=32, bucket=256, use_pallas=True)
    d = np.asarray(d, np.float64)
    e = np.asarray(e, np.float64)
    tri = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    err = np.abs(np.linalg.eigvalsh(tri) - np.linalg.eigvalsh(a)).max()
    assert err < 1.2e-7 * n * np.abs(np.linalg.eigvalsh(a)).max()
