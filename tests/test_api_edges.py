"""Public-API edge cases: single-precision input, single-pair selection,
full range, Fortran-ordered inputs, tiny matrices."""

import numpy as np
import pytest
import scipy.linalg

from eigensolver_gpu_tpu import SolverConfig, dsygvdx, syevdx
from eigensolver_gpu_tpu.utils.testing import random_spd_pair

CFG_SMALL = SolverConfig(stedc_leaf=16)


def test_float32_end_to_end():
    n = 64
    a, b = random_spd_pair(n, seed=100, dtype=np.float32)
    w, z, info = dsygvdx(a, b, il=1, iu=8, cfg=CFG_SMALL)
    assert np.asarray(w).dtype == np.float32
    w_ref = scipy.linalg.eigh(a.astype(np.float64), b.astype(np.float64),
                              eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref[:8], atol=2e-3)


def test_single_pair():
    n = 64
    a, b = random_spd_pair(n, seed=101)
    w, z, info = dsygvdx(a, b, il=5, iu=5, cfg=CFG_SMALL)
    assert np.asarray(w).shape == (1,)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert abs(float(np.asarray(w)[0]) - w_ref[4]) < 1e-11 * n


def test_full_range():
    n = 48
    a, b = random_spd_pair(n, seed=102)
    w, z, info = dsygvdx(a, b, cfg=CFG_SMALL)  # il/iu defaults = all
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref, atol=1e-11 * n)


def test_fortran_order_input():
    n = 64
    a, b = random_spd_pair(n, seed=103)
    a = np.asfortranarray(a)
    b = np.asfortranarray(b)
    w, z, info = dsygvdx(a, b, il=1, iu=4, cfg=CFG_SMALL)
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref[:4], atol=1e-11 * n)


@pytest.mark.parametrize("n", [2, 3, 8])
def test_tiny_matrices(n):
    a, b = random_spd_pair(n, seed=104)
    w, z, info = dsygvdx(a, b, cfg=SolverConfig(stedc_leaf=4))
    w_ref = scipy.linalg.eigh(a, b, eigvals_only=True)
    assert np.allclose(np.asarray(w), w_ref, atol=1e-12 * max(n, 4))


def test_syevdx_top_of_spectrum():
    n = 64
    a, _ = random_spd_pair(n, seed=105)
    w, z = syevdx(a, il=n - 3, iu=n, cfg=CFG_SMALL)
    w_ref = np.linalg.eigvalsh(a)
    assert np.allclose(np.asarray(w), w_ref[-4:], atol=1e-11 * n)

@pytest.mark.parametrize("il,iu", [(1, 999), (0, 4), (5, 4), (-3, 2)])
@pytest.mark.parametrize("mixed", [False, True])
def test_iliu_validation_raises(il, iu, mixed):
    """Every driver path must reject an out-of-range il/iu up front.

    Round-3 gap: the mixed branch silently clamped iu > n via slicing and
    returned fewer columns than requested -- the silent-contract class of
    bug SURVEY.md §5.3 faults the reference for."""
    n = 32
    a, b = random_spd_pair(n, seed=107)
    cfg = SolverConfig(stedc_leaf=16,
                       compute_dtype="float32" if mixed else None)
    with pytest.raises(ValueError, match="il"):
        dsygvdx(a, b, il=il, iu=iu, cfg=cfg)


def test_sygst_inv_gate_falls_back_on_incompatible_nb():
    """fp32 inputs with an nb_sygst the batched block inversion cannot
    take (e.g. the reference's 448: not 16*2^j) must fall back to
    'full', not raise at trace time (round-3 advisor finding)."""
    import jax

    from eigensolver_gpu_tpu.models.sygvdx import sygvdx

    cfg = SolverConfig(stedc_leaf=16, nb_sygst=448)
    shp = jax.ShapeDtypeStruct((1024, 1024), np.float32)
    jax.eval_shape(lambda a, b: sygvdx(a, b, il=1, iu=8, cfg=cfg), shp, shp)


def test_bitwise_determinism():
    """SURVEY.md §5.2: the reference's atomicAdd accumulation is
    nondeterministic run to run; this framework has no atomics and must
    be bitwise reproducible."""
    n = 96
    a, b = random_spd_pair(n, seed=106)
    r1 = dsygvdx(a, b, il=1, iu=16, cfg=CFG_SMALL)
    r2 = dsygvdx(a, b, il=1, iu=16, cfg=CFG_SMALL)
    assert np.array_equal(np.asarray(r1.w), np.asarray(r2.w))
    assert np.array_equal(np.asarray(r1.z), np.asarray(r2.z))
