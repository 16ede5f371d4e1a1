"""QE plane-wave fixture generator (benchmarks/qe_fixture.py): the
committed replay workload must be deterministic, physically shaped, and
solvable by the planar driver (reference analogue: the file-replay path
of test_dsygvdx.F90:120-145)."""

import os

import numpy as np
import scipy.linalg

from benchmarks.qe_fixture import qe_pw_pair


def test_qe_pair_structure_and_solve():
    n = 128
    h, s = qe_pw_pair(n)
    # Hermitian-definite pair
    assert np.max(np.abs(h - h.conj().T)) == 0.0
    assert np.max(np.abs(s - s.conj().T)) == 0.0
    assert np.linalg.eigvalsh(s).min() > 0.9
    w = scipy.linalg.eigh(h, s, eigvals_only=True)
    # QE shape: bound cluster below a free-electron tail
    assert w[0] < -1.0 and w[-1] > 1.0
    # deterministic
    h2, s2 = qe_pw_pair(n)
    assert np.array_equal(h, h2) and np.array_equal(s, s2)

    from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar_host
    from eigensolver_gpu_tpu.utils.config import SolverConfig

    wj, zr, zi, info = zhegvdx_planar_host(
        h, s, il=1, iu=16, cfg=SolverConfig(stedc_leaf=16)
    )
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(wj), w[:16], rtol=0, atol=1e-10 * n)


def test_committed_fixture_matches_generator():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "qe_n512.npz",
    )
    data = np.load(path)
    h, s = qe_pw_pair(512)
    assert np.array_equal(data["a"], h)
    assert np.array_equal(data["b"], s)
