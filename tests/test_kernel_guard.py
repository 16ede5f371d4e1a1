"""Automatic Mosaic-kernel fallback (utils/kernel_guard, VERDICT r4 #4).

A toolchain that rejects one Mosaic construct (e.g. the chase's
pltpu.roll(stride=...)) must degrade the solve to the XLA path instead
of failing it. The guard probes each kernel once per process; these
tests force the probe to run on CPU (where compiled Pallas raises, the
same signature as a Mosaic rejection) and by monkeypatching the probe
to raise, then assert the solve completes and is correct.
"""

import warnings

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from eigensolver_gpu_tpu.models.syevdx import syevdx
from eigensolver_gpu_tpu.utils import kernel_guard
from eigensolver_gpu_tpu.utils.config import SolverConfig


@pytest.fixture(autouse=True)
def _clean_verdicts():
    kernel_guard._VERDICTS.clear()
    yield
    kernel_guard._VERDICTS.clear()


def _spd32(n, seed):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((n, n)).astype(np.float32)
    return jnp.asarray((t + t.T) / 2)


def test_probe_failure_falls_back_and_solve_completes(monkeypatch):
    """EIGSOLVE_KERNEL_FORCE=1 makes the gates treat CPU as a Mosaic
    backend; every compiled-Pallas probe then fails exactly like a
    toolchain rejection, and the two-stage fp32 solve must complete on
    the XLA chase/replay with correct eigenvalues."""
    monkeypatch.setenv("EIGSOLVE_KERNEL_FORCE", "1")
    n = 160
    a = _spd32(n, 0)
    cfg = SolverConfig(tridiag_mode="two", band=8, stedc_leaf=16)
    with pytest.warns(UserWarning, match="falling back"):
        w, z = syevdx(a, il=1, iu=n, cfg=cfg)
    # the probes must have actually run and failed
    assert kernel_guard._VERDICTS.get("chase") is False
    w_ref = scipy.linalg.eigvalsh(np.asarray(a, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=5e-3 * n)
    r = np.asarray(a) @ np.asarray(z) - np.asarray(z) * np.asarray(w)[None, :]
    assert np.abs(r).max() < 5e-3 * n


def test_monkeypatched_lowering_rejection_falls_back(monkeypatch):
    """Simulate a Mosaic lowering rejection of one specific kernel: the
    probe raises, the guard memoizes False with a warning, and the
    caller's gate selects the XLA path."""
    monkeypatch.setenv("EIGSOLVE_KERNEL_FORCE", "1")

    def boom():
        raise RuntimeError("Mosaic lowering rejected pltpu.roll stride form")

    monkeypatch.setitem(kernel_guard._PROBES, "strided_roll", boom)
    import eigensolver_gpu_tpu.ops.chase_pallas as cp

    with pytest.warns(UserWarning, match="strided_roll"):
        assert cp._ladder_choice(interpret=False) is True
    # memoized: second consult does not re-probe (no second warning)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert kernel_guard.kernel_ok("strided_roll") is False


def test_env_force_overrides_ladder_choice(monkeypatch):
    import eigensolver_gpu_tpu.ops.chase_pallas as cp

    monkeypatch.setenv("EIGSOLVE_CHASE_LADDER", "1")
    assert cp._ladder_choice(interpret=True) is True
    monkeypatch.setenv("EIGSOLVE_CHASE_LADDER", "0")
    assert cp._ladder_choice(interpret=False) is False


def test_kernel_disable_env_short_circuits(monkeypatch):
    monkeypatch.setenv("EIGSOLVE_KERNEL_FORCE", "1")
    monkeypatch.setenv("EIGSOLVE_KERNEL_DISABLE", "all")

    def boom():  # must never be called
        raise AssertionError("probe ran despite disable")

    monkeypatch.setitem(kernel_guard._PROBES, "pchol", boom)
    assert kernel_guard.kernel_ok("pchol") is False
    monkeypatch.setenv("EIGSOLVE_KERNEL_DISABLE", "chase,pchol")
    assert kernel_guard.kernel_ok("pchol") is False


def test_off_tpu_gates_closed_without_force():
    # default CPU test environment: no probe runs, gates simply close
    assert kernel_guard.kernel_ok("chase") is False
    assert kernel_guard._VERDICTS == {}
