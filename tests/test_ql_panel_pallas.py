"""Fused Mosaic QL-panel kernels (ops/ql_panel_pallas.py) vs the XLA
panel loops they replace (ops/sbrd._ql_panel + _larft_forward and the
planar pair), interpret mode (CPU CI; the compiled twins are covered by
benchmarks/kernel_smoke.py on the real chip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.ql_panel_pallas import (
    ql_panel_pallas,
    ql_panel_planar_pallas,
)
from eigensolver_gpu_tpu.ops.sbrd import _larft_forward, _ql_panel
from eigensolver_gpu_tpu.ops.sbrd_planar import (
    _larft_forward_planar,
    _ql_panel_planar,
)


@pytest.mark.parametrize("m,b,rb", [(256, 32, 96), (512, 32, 448),
                                    (256, 32, 0), (128, 16, 32)])
def test_ql_panel_kernel_matches_xla(m, b, rb):
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((m, b)).astype(np.float32))
    pf0, v0, tau0 = _ql_panel(p, rb)
    t0 = _larft_forward(v0, tau0)
    pf1, v1, tau1, t1 = ql_panel_pallas(p, rb, interpret=True)
    for a, c in [(pf0, pf1), (v0, v1), (tau0, tau1), (t0, t1)]:
        assert float(jnp.max(jnp.abs(a - c))) < 1e-5


@pytest.mark.parametrize("m,b,rb", [(256, 32, 96), (512, 32, 448),
                                    (256, 32, 0), (128, 8, 24)])
def test_ql_panel_planar_kernel_matches_xla(m, b, rb):
    rng = np.random.default_rng(1)
    pr = jnp.asarray(rng.standard_normal((m, b)).astype(np.float32))
    pi = jnp.asarray(rng.standard_normal((m, b)).astype(np.float32))
    pr0, pi0, vr0, vi0, tr0, ti0 = _ql_panel_planar(pr, pi, rb)
    t0r, t0i = _larft_forward_planar(vr0, vi0, tr0, -ti0)
    out = ql_panel_planar_pallas(pr, pi, rb, interpret=True)
    pr1, pi1, vr1, vi1, tr1, ti1, t1r, t1i = out
    for a, c in [(pr0, pr1), (pi0, pi1), (vr0, vr1), (vi0, vi1),
                 (tr0, tr1), (ti0, ti1), (t0r, t1r), (t0i, t1i)]:
        assert float(jnp.max(jnp.abs(a - c))) < 1e-5


def test_ql_panel_kernel_trivial_column():
    """A panel whose last column is already zero above the pivot must
    produce tau = 0 for that reflector and leave the pivot value."""
    m, b, rb = 128, 16, 64
    rng = np.random.default_rng(2)
    p = rng.standard_normal((m, b)).astype(np.float32)
    p[: rb + b - 1, b - 1] = 0.0  # column b-1 zero above its pivot
    p = jnp.asarray(p)
    pf0, v0, tau0 = _ql_panel(p, rb)
    pf1, v1, tau1, _ = ql_panel_pallas(p, rb, interpret=True)
    assert float(tau1[b - 1]) == 0.0
    assert float(jnp.max(jnp.abs(pf0 - pf1))) < 1e-5
    assert float(jnp.max(jnp.abs(v0 - v1))) < 1e-5


def test_sbrd_gate_stays_xla_off_tpu():
    """On CPU the kernel gate must fall back to the XLA loops (Mosaic
    cannot lower); sbrd with panel_kernel=True must equal panel_kernel=
    False bit-for-bit here."""
    from eigensolver_gpu_tpu.ops.sbrd import sbrd

    n = 160
    rng = np.random.default_rng(3)
    t = rng.standard_normal((n, n)).astype(np.float32)
    a = jnp.asarray((t + t.T) / 2)
    ab0, vs0, ts0 = sbrd(a, band=32, bucket=512, panel_kernel=False)
    ab1, vs1, ts1 = sbrd(a, band=32, bucket=512, panel_kernel=True)
    assert jnp.array_equal(ab0, ab1)
    assert jnp.array_equal(vs0, vs1)
    assert jnp.array_equal(ts0, ts1)
