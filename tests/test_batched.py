"""QE k-point batching (BASELINE.md config 4): vmapped complex solves,
native and via the real embedding, plus vmap of the Pallas symv."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from eigensolver_gpu_tpu import SolverConfig, zhegvdx
from eigensolver_gpu_tpu.ops.complex_embed import zhegvdx_embedded_batched
from eigensolver_gpu_tpu.ops.symv_pallas import symv
from eigensolver_gpu_tpu.utils.testing import ge_residual, random_hpd_pair

CFG = SolverConfig(stedc_leaf=16)


def _batch(batch, n, seed):
    a = np.empty((batch, n, n), np.complex128)
    b = np.empty((batch, n, n), np.complex128)
    for k in range(batch):
        a[k], b[k] = random_hpd_pair(n, seed=seed + k)
    return a, b


def test_zhegvdx_vmap_native():
    batch, n, iu = 3, 32, 8
    a, b = _batch(batch, n, seed=80)
    import functools

    fn = functools.partial(zhegvdx, il=1, iu=iu, cfg=CFG)
    w, z, info = jax.vmap(fn)(jnp.asarray(a), jnp.asarray(b))
    for k in range(batch):
        w_ref = scipy.linalg.eigh(a[k], b[k], eigvals_only=True)
        assert np.allclose(np.asarray(w)[k], w_ref[:iu], atol=1e-10 * n)
        assert ge_residual(a[k], b[k], np.asarray(w)[k], np.asarray(z)[k]) < 1e-12


def test_zhegvdx_embedded_batched():
    batch, n, iu = 2, 32, 6
    a, b = _batch(batch, n, seed=81)
    w, zr, zi, info = zhegvdx_embedded_batched(
        jnp.asarray(a.real), jnp.asarray(a.imag),
        jnp.asarray(b.real), jnp.asarray(b.imag), il=1, iu=iu, cfg=CFG,
    )
    for k in range(batch):
        z = np.asarray(zr)[k] + 1j * np.asarray(zi)[k]
        w_ref = scipy.linalg.eigh(a[k], b[k], eigvals_only=True)
        assert np.allclose(np.asarray(w)[k], w_ref[:iu], atol=1e-10 * n)
        assert ge_residual(a[k], b[k], np.asarray(w)[k], z) < 1e-12


def test_symv_vmap():
    batch, n = 3, 256
    rng = np.random.default_rng(82)
    t = rng.standard_normal((batch, n, n))
    a = (t + t.transpose(0, 2, 1)) / 2
    v = rng.standard_normal((batch, n))
    import functools

    f = jax.vmap(functools.partial(symv, tile=128, interpret=True))
    y = np.asarray(f(jnp.asarray(a), jnp.asarray(v)))
    np.testing.assert_allclose(y, np.einsum("bij,bj->bi", a, v), rtol=1e-11, atol=1e-11)
