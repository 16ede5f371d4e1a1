"""Pallas triangle-reading symv vs dense matvec (interpreter mode on CPU)."""

import numpy as np
import pytest

from eigensolver_gpu_tpu.ops.symv_pallas import symv_auto


@pytest.mark.parametrize("n,tile", [(256, 128), (512, 256), (512, 128)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_symv_matches_dense(n, tile, dtype):
    rng = np.random.default_rng(60)
    t = rng.standard_normal((n, n)).astype(dtype)
    a = (t + t.T) / 2
    v = rng.standard_normal(n).astype(dtype)
    y = np.asarray(symv_auto(a, v, tile=tile))
    tol = 1e-5 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(y, a @ v, rtol=tol, atol=tol * n)


def test_symv_bad_tile():
    a = np.zeros((100, 100))
    with pytest.raises(ValueError):
        symv_auto(a, np.zeros(100), tile=64)


def test_hemv_planar_matches_dense():
    from eigensolver_gpu_tpu.ops.hemv_pallas import hemv_auto
    import jax.numpy as jnp

    n, tile = 256, 128
    rng = np.random.default_rng(61)
    t = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = (t + t.conj().T) / 2
    v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = np.asarray(hemv_auto(jnp.asarray(a), jnp.asarray(v), tile=tile))
    np.testing.assert_allclose(y, a @ v, rtol=1e-12, atol=1e-12 * n)
