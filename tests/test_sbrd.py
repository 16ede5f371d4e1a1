"""Stage-1 band reduction: bandedness, similarity, spectrum preservation."""

import numpy as np
import pytest

from eigensolver_gpu_tpu.ops.sbrd import sbrd
from eigensolver_gpu_tpu.utils.testing import random_spd_pair


@pytest.mark.parametrize("n,b", [(128, 32), (192, 32), (256, 64)])
def test_sbrd_band_and_similarity(n, b):
    a, _ = random_spd_pair(n, seed=110)
    ab, q = sbrd(a, band=b)
    ab, q = np.asarray(ab), np.asarray(q)
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
