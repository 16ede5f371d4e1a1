"""Planar complex two-stage reduction: psbrd (dense Hermitian -> band),
planar bulge chase (band -> complex tridiagonal), phase normalization,
and the planar replays, against numpy/scipy complex oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.sb2st import band_to_dense, dense_to_band
from eigensolver_gpu_tpu.ops.sb2st_planar import (
    apply_q2_planar,
    bulge_chase_planar,
    phase_normalize,
)
from eigensolver_gpu_tpu.ops.sbrd_planar import apply_q1_planar, psbrd


def _rand_herm(rng, n):
    t = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    return (t + t.conj().T) / 2


def _rand_herm_band(rng, n, b):
    a = _rand_herm(rng, n)
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    return a * mask


def _planar(a):
    return jnp.asarray(a.real.copy()), jnp.asarray(a.imag.copy())


@pytest.mark.parametrize("n,b", [(96, 8), (128, 16), (120, 8)])
def test_psbrd_band_and_factor(n, b):
    rng = np.random.default_rng(0)
    a = _rand_herm(rng, n)
    (abr, abi), vs, ts = psbrd(*_planar(a), band=b)
    ab = np.asarray(abr) + 1j * np.asarray(abi)
    # Hermitian band of half-width b
    assert np.max(np.abs(ab - ab.conj().T)) < 1e-12 * n
    outside = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) > b
    assert np.max(np.abs(ab[outside])) < 1e-12 * n
    # same spectrum
    w0 = np.linalg.eigvalsh(a)
    w1 = np.linalg.eigvalsh(ab)
    np.testing.assert_allclose(w1, w0, rtol=0, atol=1e-11 * n)
    # Q1 from the factors reconstructs a = Q1 ab Q1^H
    eye = (jnp.eye(n, dtype=abr.dtype), jnp.zeros((n, n), abr.dtype))
    q1r, q1i = apply_q1_planar(vs, ts, eye)
    q1 = np.asarray(q1r) + 1j * np.asarray(q1i)
    assert np.max(np.abs(q1 @ q1.conj().T - np.eye(n))) < 1e-12 * n
    assert np.max(np.abs(q1 @ ab @ q1.conj().T - a)) < 1e-11 * n


@pytest.mark.parametrize("n,b", [(24, 4), (96, 8), (120, 8)])
def test_planar_chase_spectrum_and_replay(n, b):
    rng = np.random.default_rng(1)
    a = _rand_herm_band(rng, n, b)
    band_r = dense_to_band(jnp.asarray(a.real.copy()), b)
    band_i = dense_to_band(jnp.asarray(a.imag.copy()), b)
    d, (e_r, e_i), vt, taut = bulge_chase_planar(band_r, band_i, b)
    (p_r, p_i), e_abs = phase_normalize(e_r, e_i)
    d = np.asarray(d)
    e_abs = np.asarray(e_abs)
    # real tridiagonal spectrum == band spectrum
    t_real = np.diag(d) + np.diag(e_abs, -1) + np.diag(e_abs, 1)
    w0 = np.linalg.eigvalsh(a)
    w1 = np.linalg.eigvalsh(t_real)
    np.testing.assert_allclose(w1, w0, rtol=0, atol=1e-11 * n)
    # eigenvectors: A (Q2 D z) = (Q2 D z) diag(w)
    wz, z = np.linalg.eigh(t_real)
    ph = np.asarray(p_r) + 1j * np.asarray(p_i)
    dz = ph[:, None] * z  # D z
    zr, zi = apply_q2_planar(
        vt, taut,
        (jnp.asarray(dz.real.copy()), jnp.asarray(dz.imag.copy())),
        n, b, g=3 * b,
    )
    q2dz = np.asarray(zr) + 1j * np.asarray(zi)
    res = a @ q2dz - q2dz * wz[None, :]
    assert np.max(np.abs(res)) < 1e-11 * n
    # unitarity of the replayed basis
    assert np.max(np.abs(q2dz.conj().T @ q2dz - np.eye(n))) < 1e-11 * n


@pytest.mark.parametrize("g", [4, 8, 24])
def test_planar_replay_group_sizes(g):
    n, b = 96, 4
    rng = np.random.default_rng(2)
    a = _rand_herm_band(rng, n, b)
    band_r = dense_to_band(jnp.asarray(a.real.copy()), b)
    band_i = dense_to_band(jnp.asarray(a.imag.copy()), b)
    d, (e_r, e_i), vt, taut = bulge_chase_planar(band_r, band_i, b)
    y = rng.standard_normal((n, 12)) + 1j * rng.standard_normal((n, 12))
    ref = None
    zr, zi = apply_q2_planar(
        vt, taut, (jnp.asarray(y.real.copy()), jnp.asarray(y.imag.copy())),
        n, b, g=g,
    )
    got = np.asarray(zr) + 1j * np.asarray(zi)
    # oracle: scalar replay from the stored reflectors, reverse chase
    vt_r, vt_i = np.asarray(vt[0]), np.asarray(vt[1])
    tt_r, tt_i = np.asarray(taut[0]), np.asarray(taut[1])
    t3, s_slots, _ = vt_r.shape
    ref = y.copy()
    for t in range(t3 - 1, -1, -1):
        for s in range(s_slots):
            tau = tt_r[t, s] + 1j * tt_i[t, s]
            if tau == 0:
                continue
            v = vt_r[t, s] + 1j * vt_i[t, s]
            vmax, k0 = t // 3, t % 3
            vswp = vmax - s
            k = k0 + 3 * s
            r0 = vswp + 1 + k * b
            rows = slice(r0, min(r0 + b, n))
            vv = v[: rows.stop - rows.start]
            ref[rows] -= tau * np.outer(vv, vv.conj() @ ref[rows])
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-10 * n)


@pytest.mark.parametrize("n,il,iu", [(96, 1, 24), (100, 5, 40)])
def test_zhegvdx_planar_two_stage_driver(n, il, iu):
    """Full generalized driver with the planar two-stage reduction
    (tridiag_mode='two') against scipy's complex oracle -- includes the
    decoupled-diagonal padding interaction (n=100 pads to 128)."""
    import scipy.linalg

    from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar
    from eigensolver_gpu_tpu.utils.config import SolverConfig

    rng = np.random.default_rng(4)
    a = _rand_herm(rng, n)
    t = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    bmat = t @ t.conj().T / n + np.eye(n)
    cfg = SolverConfig(tridiag_mode="two", band=8, stedc_leaf=16)
    w, zr, zi, info = zhegvdx_planar(
        jnp.asarray(a.real.copy()), jnp.asarray(a.imag.copy()),
        jnp.asarray(bmat.real.copy()), jnp.asarray(bmat.imag.copy()),
        il=il, iu=iu, cfg=cfg,
    )
    assert int(info) == 0
    w_ref = scipy.linalg.eigh(a, bmat, eigvals_only=True)
    np.testing.assert_allclose(
        np.asarray(w), w_ref[il - 1 : iu], rtol=0, atol=1e-10 * n
    )
    z = np.asarray(zr) + 1j * np.asarray(zi)
    res = a @ z - bmat @ z * np.asarray(w)[None, :]
    assert np.max(np.abs(res)) < 1e-10 * n


def test_two_stage_planar_end_to_end():
    """psbrd -> planar chase -> stedc-style real eigh -> replays: full
    Hermitian eigensolve against numpy."""
    n, b = 96, 8
    rng = np.random.default_rng(3)
    a = _rand_herm(rng, n)
    (abr, abi), vs, ts = psbrd(*_planar(a), band=b)
    band_r = dense_to_band(abr, b)
    band_i = dense_to_band(abi, b)
    d, (e_r, e_i), vt, taut = bulge_chase_planar(band_r, band_i, b)
    (p_r, p_i), e_abs = phase_normalize(e_r, e_i)
    t_real = (
        np.diag(np.asarray(d))
        + np.diag(np.asarray(e_abs), -1)
        + np.diag(np.asarray(e_abs), 1)
    )
    w, z = np.linalg.eigh(t_real)
    ph = np.asarray(p_r) + 1j * np.asarray(p_i)
    dz = ph[:, None] * z
    y = apply_q2_planar(
        vt, taut,
        (jnp.asarray(dz.real.copy()), jnp.asarray(dz.imag.copy())),
        n, b, g=3 * b,
    )
    zr, zi = apply_q1_planar(vs, ts, y)
    zc = np.asarray(zr) + 1j * np.asarray(zi)
    res = a @ zc - zc * w[None, :]
    assert np.max(np.abs(res)) < 1e-11 * n
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), rtol=0, atol=1e-11 * n)


@pytest.mark.parametrize("n,b", [(96, 8), (784, 16)])
def test_planar_chase_pallas_matches_xla(n, b):
    """Mosaic planar chase (interpret mode) vs the XLA planar chase --
    n=784/b=16 exercises multiple slot groups and the phase plan."""
    from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_planar_pallas

    rng = np.random.default_rng(5)
    a = _rand_herm_band(rng, n, b).astype(np.complex64)
    band_r = dense_to_band(jnp.asarray(a.real.copy(), jnp.float32), b)
    band_i = dense_to_band(jnp.asarray(a.imag.copy(), jnp.float32), b)
    d0, (e0r, e0i), vt0, tt0 = bulge_chase_planar(band_r, band_i, b)
    d1, (e1r, e1i), vt1, tt1 = bulge_chase_planar_pallas(
        band_r, band_i, b, tb=6, interpret=True
    )
    # fp32 drift tolerance (different summation orders across ~3n steps)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=2e-3, atol=2e-3)
    m0 = np.hypot(np.asarray(e0r), np.asarray(e0i))
    m1 = np.hypot(np.asarray(e1r), np.asarray(e1i))
    np.testing.assert_allclose(m1, m0, rtol=2e-3, atol=2e-3)
    # spectrum check at fp32 tolerance via the phase-normalized tridiag
    _, ea = phase_normalize(e1r, e1i)
    t_real = (np.diag(np.asarray(d1))
              + np.diag(np.asarray(ea), -1) + np.diag(np.asarray(ea), 1))
    w0 = np.linalg.eigvalsh(a.astype(np.complex128))
    w1 = np.linalg.eigvalsh(t_real.astype(np.float64))
    np.testing.assert_allclose(w1, w0, rtol=0, atol=5e-4 * n)
    # replay the kernel's reflectors: eigvec residual at fp32 scale
    wz, z = np.linalg.eigh(t_real.astype(np.float64))
    (p_r, p_i), _ = phase_normalize(e1r, e1i)
    ph = np.asarray(p_r) + 1j * np.asarray(p_i)
    dz = (ph[:, None] * z).astype(np.complex64)
    zr, zi = apply_q2_planar(
        vt1, tt1,
        (jnp.asarray(dz.real.copy()), jnp.asarray(dz.imag.copy())),
        n, b, g=3 * b,
    )
    q2dz = np.asarray(zr) + 1j * np.asarray(zi)
    res = a.astype(np.complex128) @ q2dz - q2dz * wz[None, :]
    assert np.max(np.abs(res)) < 5e-4 * n


def test_zhegvdx_planar_mixed_two_stage():
    """Mixed (fp32 pipeline + fp64 refinement) planar driver with the
    two-stage reduction threaded into the INNER fp32 config (round-4
    wiring: the flagship headline path)."""
    import scipy.linalg

    from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar
    from eigensolver_gpu_tpu.utils.config import SolverConfig

    n = 96
    rng = np.random.default_rng(6)
    a = _rand_herm(rng, n)
    t = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    bmat = t @ t.conj().T / n + np.eye(n)
    # refine_iters=2 (1 coarse fp32 + 1 fp64 sweep): same contract as
    # the mixed blockinv/trinv tests; one fewer unrolled sweep keeps the
    # XLA CPU compile of this big two-stage graph inside the suite
    # budget (VERDICT r4 #7)
    cfg = SolverConfig(compute_dtype="float32", refine_iters=2,
                       tridiag_mode="two", band=8, stedc_leaf=16)
    w, zr, zi, info = zhegvdx_planar(
        jnp.asarray(a.real.copy()), jnp.asarray(a.imag.copy()),
        jnp.asarray(bmat.real.copy()), jnp.asarray(bmat.imag.copy()),
        il=1, iu=24, cfg=cfg,
    )
    assert int(info) == 0
    w_ref = scipy.linalg.eigh(a, bmat, eigvals_only=True)
    np.testing.assert_allclose(np.asarray(w), w_ref[:24], rtol=0,
                               atol=1e-10 * n)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    res = np.max(np.abs(a @ z - bmat @ z * np.asarray(w)[None, :]))
    assert res < 1e-10 * n


def test_psbrd_already_banded_phase_only():
    """A matrix already within the band: every QL column has a zero
    tail, so each reflector is at most a PIVOT PHASE (zlarfg rotates a
    complex pivot to real beta even with a zero tail).  The reduction
    must then act as a diagonal unitary: |ab| == |a| entrywise, and the
    factors must still reconstruct a = Q1 ab Q1^H."""
    n, b = 96, 8
    rng = np.random.default_rng(7)
    a = _rand_herm_band(rng, n, b)
    (abr, abi), vs, ts = psbrd(*_planar(a), band=b)
    ab = np.asarray(abr) + 1j * np.asarray(abi)
    np.testing.assert_allclose(np.abs(ab), np.abs(a), rtol=0, atol=1e-12 * n)
    # reflector vectors reduce to the pivot alone: zero tails everywhere
    assert np.max(np.abs(np.asarray(vs[0])) * (np.abs(np.asarray(vs[0])) != 1.0)) < 1e-12
    eye = (jnp.eye(n, dtype=abr.dtype), jnp.zeros((n, n), abr.dtype))
    q1r, q1i = apply_q1_planar(vs, ts, eye)
    q1 = np.asarray(q1r) + 1j * np.asarray(q1i)
    # Q1 is a diagonal unitary here
    assert np.max(np.abs(q1 - np.diag(np.diag(q1)))) < 1e-12 * n
    assert np.max(np.abs(q1 @ ab @ q1.conj().T - a)) < 1e-11 * n


def test_planar_chase_decoupled_blocks():
    """Zero subdiagonal entries decouple the band into independent
    blocks; phase_normalize must carry |e|=0 through (p stays constant)
    and the spectrum must still match."""
    n, b = 64, 4
    rng = np.random.default_rng(8)
    a = _rand_herm_band(rng, n, b)
    # decouple at rows 24..24+b and 40..40+b (zero the coupling block)
    for cut in (24, 40):
        a[cut : cut + b + 1, max(cut - b - 1, 0) : cut] = 0
        a[max(cut - b - 1, 0) : cut, cut : cut + b + 1] = 0
    a = np.ascontiguousarray((a + a.conj().T) / 2)
    band_r = dense_to_band(jnp.asarray(a.real.copy()), b)
    band_i = dense_to_band(jnp.asarray(a.imag.copy()), b)
    d, (e_r, e_i), vt, taut = bulge_chase_planar(band_r, band_i, b)
    (p_r, p_i), e_abs = phase_normalize(e_r, e_i)
    t_real = (np.diag(np.asarray(d))
              + np.diag(np.asarray(e_abs), -1)
              + np.diag(np.asarray(e_abs), 1))
    np.testing.assert_allclose(
        np.linalg.eigvalsh(t_real), np.linalg.eigvalsh(a),
        rtol=0, atol=1e-11 * n,
    )
    # D stays unit-modulus everywhere
    mod = np.asarray(p_r) ** 2 + np.asarray(p_i) ** 2
    np.testing.assert_allclose(mod, 1.0, rtol=0, atol=1e-13)


def test_two_stage_planar_clustered_spectrum():
    """QE-shaped clustered spectrum through the full two-stage driver."""
    import scipy.linalg

    from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar
    from eigensolver_gpu_tpu.utils.config import SolverConfig
    from eigensolver_gpu_tpu.utils.testing import qe_style_pair

    n = 96
    a, bmat = qe_style_pair(n, seed=9)
    cfg = SolverConfig(tridiag_mode="two", band=8, stedc_leaf=16)
    w, zr, zi, info = zhegvdx_planar(
        jnp.asarray(a.real.copy()), jnp.asarray(a.imag.copy()),
        jnp.asarray(bmat.real.copy()), jnp.asarray(bmat.imag.copy()),
        il=1, iu=n // 4, cfg=cfg,
    )
    assert int(info) == 0
    w_ref = scipy.linalg.eigh(a, bmat, eigvals_only=True)
    np.testing.assert_allclose(np.asarray(w), w_ref[: n // 4],
                               rtol=0, atol=1e-10 * n)


def test_planar_two_stage_auto_gate():
    """Gate logic for the planar two-stage reduction: 'two' always
    engages it; 'auto' only for fp32 TPU runs at n >= the measured
    crossover (planar_two_stage_min_n; 0 = never)."""
    from eigensolver_gpu_tpu.models.zhegvdx_planar import (
        _want_two_stage_planar,
    )
    from eigensolver_gpu_tpu.utils.config import DEFAULT_CONFIG

    m = DEFAULT_CONFIG.planar_two_stage_min_n
    assert _want_two_stage_planar("two", 0, 256, False, "cpu")
    assert not _want_two_stage_planar("auto", 0, 1 << 30, True, "tpu")
    if m:
        assert _want_two_stage_planar("auto", m, m, True, "tpu")
        assert not _want_two_stage_planar("auto", m, m - 1, True, "tpu")
        assert not _want_two_stage_planar("auto", m, m, False, "tpu")
        assert not _want_two_stage_planar("auto", m, m, True, "cpu")
    assert not _want_two_stage_planar("one", m or 4096, 1 << 30, True, "tpu")
