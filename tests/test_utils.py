"""Utility-layer tests: config validation, tracing shim, native timer."""

import time

import numpy as np
import pytest

from eigensolver_gpu_tpu.utils import tracing
from eigensolver_gpu_tpu.utils.config import SolverConfig
from eigensolver_gpu_tpu.utils.testing import (
    compare_values,
    compare_vectors,
    orthonormality_error,
)
from eigensolver_gpu_tpu.utils.timer import wallclock


def test_config_validation():
    with pytest.raises(ValueError):
        SolverConfig(stedc_backend="nope")
    with pytest.raises(ValueError):
        SolverConfig(sygst_mode="nope")
    with pytest.raises(ValueError):
        SolverConfig(nb_tridiag=0)
    cfg = SolverConfig()
    assert hash(cfg) == hash(SolverConfig())  # usable as a jit static arg


def test_wallclock_monotonic():
    t0 = wallclock()
    time.sleep(0.01)
    t1 = wallclock()
    assert t1 > t0
    assert t1 - t0 < 5.0


def test_tracing_sync_mode_records():
    tracing.clear()
    tracing.enable(sync=True)
    try:
        with tracing.trace_range("unit-test-range"):
            time.sleep(0.005)
        recs = tracing.timings()
        assert any(name == "unit-test-range" and dt > 0 for name, dt in recs)
    finally:
        tracing.disable()
        tracing.clear()


def test_compare_utils_sign_insensitive():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((16, 4))
    flipped = z * np.array([1, -1, 1, -1])
    # toolbox.F90-style |.| comparison absorbs column sign flips
    assert compare_vectors(z, flipped) < 1e-15
    assert compare_values([1.0, 2.0], [1.0, 2.0]) == 0.0
    q, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    assert orthonormality_error(q) < 1e-14
