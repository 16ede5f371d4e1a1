"""Ozaki bf16-digit fp64 matmul vs the numpy double oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.ozaki import (
    digit_bits_for,
    nslice_for,
    ozaki_matmul,
    ozaki_pmatmul,
)


def _relerr(got, ref):
    scale = np.max(np.abs(ref)) + 1e-300
    return np.max(np.abs(np.asarray(got) - ref)) / scale


@pytest.mark.parametrize("n,k,m", [(64, 64, 64), (257, 129, 65), (128, 4096, 96)])
def test_ozaki_matmul_accuracy(n, k, m):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((k, m))
    ref = a @ b
    got = ozaki_matmul(jnp.asarray(a), jnp.asarray(b))
    assert _relerr(got, ref) < 1e-13


def test_ozaki_matmul_ill_scaled_rows():
    rng = np.random.default_rng(1)
    n = 96
    a = rng.standard_normal((n, n)) * np.exp2(rng.integers(-20, 20, (n, 1)))
    b = rng.standard_normal((n, n)) * np.exp2(rng.integers(-20, 20, (1, n)))
    ref = a @ b
    got = ozaki_matmul(jnp.asarray(a), jnp.asarray(b))
    # error is relative to rowmax*colmax, so compare row/col-normalized
    ra = np.max(np.abs(a), axis=1, keepdims=True)
    cb = np.max(np.abs(b), axis=0, keepdims=True)
    scale = ra * cb * a.shape[1]
    err = np.max(np.abs(np.asarray(got) - ref) / scale)
    assert err < 1e-13


def test_ozaki_matmul_extreme_scales():
    """Row/col maxima far outside the f32 exponent range: the wide-range
    exact floor_log2/pow2 (ADVICE r2) must keep full relative accuracy.
    (Only reachable on real-f64 backends; the TPU stack's emulated fp64
    itself spans just the f32 exponent range.)"""
    rng = np.random.default_rng(4)
    n = 64
    # +-2^450 each side: far beyond f32's +-2^127 but the PRODUCT of a
    # row and a column scale still fits fp64 (no true overflow)
    a = rng.standard_normal((n, n)) * np.exp2(
        rng.integers(-450, 450, (n, 1)).astype(np.float64)
    )
    b = rng.standard_normal((n, n)) * np.exp2(
        rng.integers(-450, 450, (1, n)).astype(np.float64)
    )
    ref = a @ b
    got = np.asarray(ozaki_matmul(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(np.isfinite(got))
    ra = np.max(np.abs(a), axis=1, keepdims=True)
    cb = np.max(np.abs(b), axis=0, keepdims=True)
    err = np.max(np.abs(got - ref) / (ra * cb * n))
    assert err < 1e-13


def test_ozaki_matmul_zero_rows_and_exact_powers():
    rng = np.random.default_rng(2)
    n = 64
    a = rng.standard_normal((n, n))
    a[3] = 0.0
    a[7] = 2.0 ** np.arange(n) % 17  # include exact powers of two and zeros
    b = rng.standard_normal((n, n))
    b[:, 5] = 0.0
    ref = a @ b
    got = ozaki_matmul(jnp.asarray(a), jnp.asarray(b))
    assert _relerr(got, ref) < 1e-13


def test_ozaki_pmatmul_matches_complex():
    rng = np.random.default_rng(3)
    n = 96
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    b = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    ref = a @ b
    gr, gi = ozaki_pmatmul(
        (jnp.asarray(a.real), jnp.asarray(a.imag)),
        (jnp.asarray(b.real), jnp.asarray(b.imag)),
    )
    assert _relerr(np.asarray(gr) + 1j * np.asarray(gi), ref) < 1e-13


def test_digit_policy():
    assert digit_bits_for(4096) == 7
    assert digit_bits_for(8192) == 6
    assert digit_bits_for(64) == 7  # capped at 7 (bf16 significand headroom)
    assert nslice_for(7, 48) == 7
    assert nslice_for(6, 48) == 8
