"""Sharded/batched solver tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu import SolverConfig
from eigensolver_gpu_tpu.parallel import (
    make_mesh,
    sygvdx_batched,
    sygvdx_batched_sharded,
    sygvdx_sharded,
)
from eigensolver_gpu_tpu.utils.testing import ge_residual, random_spd_pair

CFG = SolverConfig()


def _batch_pairs(batch, n, seed=0):
    a = np.empty((batch, n, n))
    b = np.empty((batch, n, n))
    for k in range(batch):
        a[k], b[k] = random_spd_pair(n, seed=seed + k)
    return a, b


def test_mesh_shapes():
    mesh = make_mesh(8, dp=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 4)


def test_sygvdx_sharded_tp():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    n = 64
    a, b = random_spd_pair(n, seed=20)
    w, z, info = sygvdx_sharded(a, b, mesh, il=1, iu=16, cfg=CFG)
    assert int(info) == 0
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref[:16], atol=1e-11)
    assert ge_residual(a, b, np.asarray(w), np.asarray(z)) < 1e-12


def test_sygvdx_batched():
    batch, n = 4, 32
    a, b = _batch_pairs(batch, n, seed=30)
    w, z, info = sygvdx_batched(a, b, il=1, iu=8, cfg=CFG)
    assert np.asarray(info).shape == (batch,)
    for k in range(batch):
        w_ref = scipy.linalg.eigh(a[k], b[k], eigvals_only=True)
        assert np.allclose(np.asarray(w)[k], w_ref[:8], atol=1e-11)
        assert ge_residual(a[k], b[k], np.asarray(w)[k], np.asarray(z)[k]) < 1e-12


def test_sygvdx_batched_sharded_dp():
    mesh = make_mesh(8, dp=2)
    batch, n = 8, 32
    a, b = _batch_pairs(batch, n, seed=40)
    w, z, info = sygvdx_batched_sharded(a, b, mesh, il=1, iu=4, cfg=CFG)
    for k in range(batch):
        w_ref = scipy.linalg.eigh(a[k], b[k], eigvals_only=True)
        assert np.allclose(np.asarray(w)[k], w_ref[:4], atol=1e-11)


def test_sygvdx_sharded_uplo_contract():
    """Sharded driver honors UPLO='U' like the unsharded one (advisor
    finding: garbage in the lower triangle changed the sharded result)."""
    from eigensolver_gpu_tpu.parallel import make_mesh, sygvdx_sharded

    n, iu = 64, 12
    a, b = random_spd_pair(n, seed=123)
    mesh = make_mesh(4)
    w0, z0, info0 = sygvdx_sharded(a, b, mesh, il=1, iu=iu)
    rng = np.random.default_rng(124)
    trash = lambda x: x + np.tril(rng.standard_normal((n, n)), -1) * 1e3
    w1, z1, info1 = sygvdx_sharded(trash(a), trash(b), mesh, il=1, iu=iu)
    assert int(info1) == 0
    assert np.allclose(np.asarray(w1), np.asarray(w0), atol=1e-11 * n)
    assert np.allclose(np.abs(np.asarray(z1)), np.abs(np.asarray(z0)), atol=1e-9 * n)


def test_sharded_dominant_stages_communicate():
    """VERDICT r1 #3: the dominant stages (tridiagonalization panel
    products, stedc merges, refinement gemms) must actually run SHARDED,
    not replicated. Assert (a) the compiled module contains cross-device
    collectives, (b) the eigenvector output is row-sharded over 'tp',
    and (c) the answer still matches the LAPACK oracle."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eigensolver_gpu_tpu.parallel.sharded import _sharded_step

    mesh = make_mesh(8)
    n = 512
    a, b = random_spd_pair(n, seed=30)
    cfg = SolverConfig(compute_dtype="float32", refine_iters=2)
    row = NamedSharding(mesh, P("tp", None))
    a_d = jax.device_put(a, row)
    b_d = jax.device_put(b, row)
    compiled = _sharded_step.lower(a_d, b_d, mesh, 1, 128, cfg).compile()
    hlo = compiled.as_text()
    assert ("all-reduce" in hlo) or ("all-gather" in hlo) or (
        "collective-permute" in hlo
    ), "no ICI collectives in the sharded solve -- stages are replicated"
    w, z, info = compiled(a_d, b_d)
    assert int(info) == 0
    z_spec = z.sharding.spec
    assert tuple(z_spec)[:1] == ("tp",), f"z not row-sharded: {z_spec}"
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)[:128]
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-10 * n
    assert ge_residual(a, b, np.asarray(w), np.asarray(z)) < 1e-12


def test_sygvdx_sharded_mixed():
    """Sharded mixed-precision path: the ENTIRE fp32 generalized
    pipeline runs sharded, then the sharded selected-range fp64
    refinement recovers fp64 residuals (round-3: previously phases
    1/2/4 ran emulated fp64 on the mesh, doubling the memory plan)."""
    import numpy as np
    import scipy.linalg

    from eigensolver_gpu_tpu import SolverConfig
    from eigensolver_gpu_tpu.parallel.sharded import sygvdx_sharded
    from eigensolver_gpu_tpu.utils.testing import random_spd_pair

    n = 256
    a, b = random_spd_pair(n, seed=21)
    mesh = make_mesh(8)
    cfg = SolverConfig(compute_dtype="float32", refine_iters=3)
    out = sygvdx_sharded(a, b, mesh, il=17, iu=80, cfg=cfg)
    assert int(np.asarray(out.info)) == 0
    w = np.asarray(out.w)
    z = np.asarray(out.z)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)[16:80]
    np.testing.assert_allclose(w, w_ref, rtol=0, atol=1e-10 * n)
    res = np.abs(a @ z - (b @ z) * w[None, :]).max()
    assert res < 1e-10, f"sharded mixed residual {res:.2e}"


def test_sygvdx_sharded_mixed_fullinv():
    """n = 512*2^k exercises the SPMD-first full-inverse phases 2/4
    (ops/trsm.trinv_upper_full): inv(U) built once by block doubling,
    C = inv^H A inv and Z = inv Y as partitionable gemms -- no
    sequential solve chain in the sharded HLO (round-4, VERDICT #4)."""
    n = 512
    a, b = random_spd_pair(n, seed=22)
    mesh = make_mesh(8)
    cfg = SolverConfig(compute_dtype="float32", refine_iters=3)
    out = sygvdx_sharded(a, b, mesh, il=1, iu=64, cfg=cfg)
    assert int(np.asarray(out.info)) == 0
    w = np.asarray(out.w)
    z = np.asarray(out.z)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)[:64]
    np.testing.assert_allclose(w, w_ref, rtol=0, atol=1e-10 * n)
    res = np.abs(a @ z - (b @ z) * w[None, :]).max()
    assert res < 1e-10, f"sharded mixed full-inv residual {res:.2e}"


def test_sygvdx_sharded_mixed_blocked_escape_hatch():
    """An explicit sygst_mode='blocked' must be honored on fp32 sharded
    runs even when n qualifies for the trinv full-inverse scheme
    (review finding: the trinv branch silently overrode it)."""
    n = 512
    a, b = random_spd_pair(n, seed=23)
    mesh = make_mesh(8)
    cfg = SolverConfig(
        compute_dtype="float32", refine_iters=3, sygst_mode="blocked"
    )
    out = sygvdx_sharded(a, b, mesh, il=1, iu=32, cfg=cfg)
    assert int(np.asarray(out.info)) == 0
    w = np.asarray(out.w)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)[:32]
    np.testing.assert_allclose(w, w_ref, rtol=0, atol=1e-10 * n)


def test_zhegvdx_planar_batched_sharded():
    """dp-sharded batched planar complex solves: the multi-chip form of
    config 4 (QE k-point batches are Hermitian). Each device owns
    batch/n_devices whole solves; values must match per-solve scipy."""
    from eigensolver_gpu_tpu.parallel import zhegvdx_planar_batched_sharded
    from eigensolver_gpu_tpu.utils.testing import random_hpd_pair

    batch, n, iu = 8, 48, 6
    ar = np.empty((batch, n, n))
    ai = np.empty((batch, n, n))
    br = np.empty((batch, n, n))
    bi = np.empty((batch, n, n))
    mats = []
    for k in range(batch):
        a, b = random_hpd_pair(n, seed=100 + k)
        ar[k], ai[k] = a.real, a.imag
        br[k], bi[k] = b.real, b.imag
        mats.append((a, b))
    mesh = make_mesh(8, dp=4)
    cfg = SolverConfig(stedc_leaf=16)
    out = zhegvdx_planar_batched_sharded(
        ar, ai, br, bi, mesh, il=1, iu=iu, cfg=cfg
    )
    assert np.all(np.asarray(out.info) == 0)
    w = np.asarray(out.w)
    for k, (a, b) in enumerate(mats):
        want = scipy.linalg.eigh(a, b, eigvals_only=True)[:iu]
        np.testing.assert_allclose(w[k], want, rtol=0, atol=1e-10 * n,
                                   err_msg=f"k={k}")
    with pytest.raises(ValueError):
        zhegvdx_planar_batched_sharded(
            ar[:3], ai[:3], br[:3], bi[:3], mesh, il=1, iu=iu, cfg=cfg
        )
