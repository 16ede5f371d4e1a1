"""Mosaic replay kernel vs the XLA apply_q2 (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.replay_pallas import apply_q2_pallas, window_qs
from eigensolver_gpu_tpu.ops.sb2st import apply_q2, bulge_chase, dense_to_band


def _chase(rng, n, b):
    t = rng.standard_normal((n, n)).astype(np.float32)
    a = (t + t.T) / 2
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    band = dense_to_band(jnp.asarray(a * mask, jnp.float32), b)
    return a, bulge_chase(band, b)


@pytest.mark.parametrize("n,b,g", [
    (96, 8, 8),      # g = b
    (128, 8, 24),    # g = 3b (the production shape at b=32)
    (256, 16, 48),   # g = 3b, larger
    (120, 8, 16),    # n not a multiple of the slot spacing
])
def test_replay_pallas_matches_scalar(n, b, g):
    rng = np.random.default_rng(7)
    a, (d, e, vt, taut) = _chase(rng, n, b)
    y = jnp.asarray(rng.standard_normal((n, 40)), jnp.float32)
    z1 = np.asarray(apply_q2(vt, taut, y, n, b, g=1))
    z = np.asarray(
        apply_q2_pallas(vt, taut, y, n, b, g=g, m_tile=16, interpret=True)
    )
    np.testing.assert_allclose(z, z1, rtol=0, atol=1e-4)


def test_replay_pallas_m_not_divisible():
    """Column counts that don't divide the m_tile get zero-padded."""
    n, b, g = 96, 8, 24
    rng = np.random.default_rng(8)
    a, (d, e, vt, taut) = _chase(rng, n, b)
    y = jnp.asarray(rng.standard_normal((n, 23)), jnp.float32)
    z1 = np.asarray(apply_q2(vt, taut, y, n, b, g=1))
    z = np.asarray(
        apply_q2_pallas(vt, taut, y, n, b, g=g, m_tile=16, interpret=True)
    )
    np.testing.assert_allclose(z, z1, rtol=0, atol=1e-4)


def test_replay_pallas_validation():
    vt = jnp.zeros((3, 1, 8), jnp.float32)
    taut = jnp.zeros((3, 1), jnp.float32)
    y64 = jnp.zeros((24, 4))
    with pytest.raises(TypeError):
        apply_q2_pallas(vt, taut, y64, 24, 8)
    y32 = jnp.zeros((24, 4), jnp.float32)
    with pytest.raises(ValueError):
        apply_q2_pallas(vt, taut, y32, 24, 8, g=7)  # g not 8-aligned
    with pytest.raises(ValueError):
        apply_q2_pallas(vt, taut, y32, 24, 8, g=128)  # l_win > 128


def test_window_qs_orthogonal():
    """Every precomputed window-Q block must be orthogonal (incl. the
    identity-padded tail) -- the invariant the in-kernel dots rely on."""
    n, b, g = 128, 8, 24
    rng = np.random.default_rng(9)
    a, (d, e, vt, taut) = _chase(rng, n, b)
    qw = np.asarray(window_qs(vt, taut, n, b, g))
    w = qw.reshape(-1, 128, 128)
    eye = np.eye(128, dtype=np.float32)
    err = np.abs(np.einsum("uij,uik->ujk", w, w) - eye[None]).max()
    assert err < 1e-4, f"window Q orthogonality {err:.2e}"


@pytest.mark.parametrize("n,b,g", [(128, 8, 24), (256, 16, 48)])
def test_replay_planar_pallas_matches_xla(n, b, g):
    """Mosaic planar replay (interpret) vs the XLA planar replay."""
    from eigensolver_gpu_tpu.ops.replay_pallas import apply_q2_planar_pallas
    from eigensolver_gpu_tpu.ops.sb2st_planar import (
        apply_q2_planar,
        bulge_chase_planar,
    )

    rng = np.random.default_rng(11)
    t = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = ((t + t.conj().T) / 2).astype(np.complex64)
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    a = a * mask
    band_r = dense_to_band(jnp.asarray(a.real.copy(), jnp.float32), b)
    band_i = dense_to_band(jnp.asarray(a.imag.copy(), jnp.float32), b)
    d, e, vt, taut = bulge_chase_planar(band_r, band_i, b)
    y = rng.standard_normal((n, 40)) + 1j * rng.standard_normal((n, 40))
    yp = (jnp.asarray(y.real.copy(), jnp.float32),
          jnp.asarray(y.imag.copy(), jnp.float32))
    zr0, zi0 = apply_q2_planar(vt, taut, yp, n, b, g=g)
    zr1, zi1 = apply_q2_planar_pallas(
        vt, taut, yp, n, b, g=g, m_tile=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(zr1), np.asarray(zr0),
                               rtol=0, atol=2e-4 * n)
    np.testing.assert_allclose(np.asarray(zi1), np.asarray(zi0),
                               rtol=0, atol=2e-4 * n)


def test_auto_mtile_vmem_budget():
    """The m-tile sizing must account for pipeline double-buffering of
    every y window.  At n=8192 the planar replay (4 y windows) overflowed
    the 128M chip vmem with mt=512 (145.2M measured on-chip, round 5):
    the planar kernel must shrink to 256 while the real kernel (2 y
    windows, 75.6M) keeps 512.  At n=4096 both keep 512."""
    from eigensolver_gpu_tpu.ops.replay_pallas import P, _auto_mtile, _geometry

    def mtiles(n, b=32, g=96):
        geo = _geometry(n, b, g)
        n_act4 = -(-geo["n_act"] // 4) * 4
        q4 = n_act4 // 4
        rows = -(-(7 + n + P + 8) // 8) * 8
        real = _auto_mtile(512, rows, 2, 8 * q4 * P * P * 4)
        planar = _auto_mtile(512, rows, 4, 8 * q4 * P * 2 * P * 4)
        return real, planar

    assert mtiles(8192) == (512, 256)
    assert mtiles(4096) == (512, 512)
    # modeled planar usage at the chosen tile stays under the 112M limit
    geo = _geometry(8192, 32, 96)
    q4 = (-(-geo["n_act"] // 4) * 4) // 4
    rows = -(-(7 + 8192 + P + 8) // 8) * 8
    used = rows * 256 * 4 * 2 * 4 + 8 * q4 * P * 2 * P * 4
    assert used < 112 * 2**20


def test_replay_pipelined_scheme_matches(monkeypatch):
    """The PIPELINED staging fallback (toolchain-rejection / env escape
    path) must agree with the XLA replay too; distinct geometry from the
    resident-path tests so the jit cache cannot alias the two schemes."""
    import eigensolver_gpu_tpu.ops.replay_pallas as rp

    monkeypatch.setattr(rp, "_REPLAY_PIPELINED", True)
    n, b, g = 160, 8, 24
    rng = np.random.default_rng(12)
    a, (d, e, vt, taut) = _chase(rng, n, b)
    y = jnp.asarray(rng.standard_normal((n, 40)), jnp.float32)
    z1 = np.asarray(apply_q2(vt, taut, y, n, b, g=1))
    z = np.asarray(
        apply_q2_pallas(vt, taut, y, n, b, g=g, m_tile=24, interpret=True)
    )
    np.testing.assert_allclose(z, z1, rtol=0, atol=1e-4)


def test_resident_mtile_bounds():
    """Auto resident tiles are 128-multiples covering m in the fewest
    tiles under the single-buffered VMEM budget; explicit tiles are
    honored; infeasible geometry returns None (pipelined fallback)."""
    from eigensolver_gpu_tpu.ops.replay_pallas import P, _geometry, _resident_mtile

    def bound_for(n, planes, m, m_tile=None, g=96, b=32):
        geo = _geometry(n, b, g)
        n_act4 = -(-geo["n_act"] // 4) * 4
        q4 = n_act4 // 4
        rows = -(-(7 + n + P + 8) // 8) * 8
        sb = 8 * q4 * P * (2 * P if planes == 2 else P) * 4
        # the real kernel budgets the two-phase tmp as extra rows
        # (mirrors apply_q2_pallas)
        rows_eff = rows if planes == 2 else rows + n_act4 * P
        return _resident_mtile(rows_eff, planes, m, sb, m_tile), rows, sb

    # n=8192 planar, m=2048: one even 1024 split (the pipelined scheme
    # was forced down to mt=128 here -- the round-5 replay wall)
    mt, rows, sb = bound_for(8192, 2, 2048)
    assert mt == 1024
    assert rows * mt * 4 * 2 + sb < 112 * 2**20
    # n=8192 real, m=2048: two 1024 tiles (y + two-phase tmp in budget)
    mt, rows, sb = bound_for(8192, 1, 2048)
    assert mt == 1024
    # explicit tiny tile honored (tests force tiling)
    mt, _, _ = bound_for(8192, 2, 2048, m_tile=16)
    assert mt == 16
    # tiny m rounds up to one 128-wide tile
    mt, _, _ = bound_for(8192, 2, 40)
    assert mt == 128
