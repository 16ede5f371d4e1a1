"""Ozaki-style fp64-accurate matmul on the bf16 MXU.

The platform's emulated fp64 dot runs at ~2 TFLOP/s (it expands each
operand into fp32 slices and runs many correction passes); the bf16 MXU
is two orders of magnitude faster.  This module recovers fp64-class
gemm accuracy from exact bf16 integer-digit products (Ozaki/ozIMMU
scheme, adapted to bf16 instead of int8 because int8 dots do not lower
to the MXU's int path on this toolchain -- measured ~0.06 TOPS):

1. scale row i of A (col j of B) by an exact power of two so entries
   lie in (-1, 1];
2. split each scaled entry into ``nslice`` signed digits of ``dbits``
   bits (digit s carries weight 2^{-(dbits-1) - dbits*s}); extraction
   uses only round/subtract/scale-by-2^k, so each digit is an integer
   that bf16 represents exactly;
3. multiply digit pairs (i, j) with i + j < nslice as bf16 x bf16 ->
   f32 MXU gemms.  Each scalar product has <= 2*dbits significant bits
   and the contraction has k terms, so with k * 2^{2(dbits-1)} <= 2^24
   the whole f32 accumulation is EXACT (integers below 2^24);
4. combine the exact per-pair products in fp64 with their power-of-two
   weights and re-apply the row/col scales (all exact multiplies).

The only inexactness is the truncation after ``nslice`` digits
(~2^-(dbits*nslice) relative to the row/col maxima) and fp64 combine
rounding -- both below the platform's emulated-fp64 epsilon (~1e-13)
at the default settings.

Counterpart in the reference: none -- the V100 has fast native fp64
units (dsytrd_gpu.F90 / dsygvdx_gpu.F90 simply run in double); this is
the TPU-native route to fp64 gemm throughput and feeds the
Ogita-Aishima refinement sweeps (ops/refine_planar.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def digit_bits_for(k: int) -> int:
    """Largest digit width whose k-term f32 accumulation stays exact.

    Products of two d-bit signed digits have magnitude <= 2^{2(d-1)};
    k of them sum to < 2^24 iff 2(d-1) + ceil(log2 k) <= 24.
    """
    return max(2, min(7, (24 - max(0, math.ceil(math.log2(max(k, 1))))) // 2 + 1))


def nslice_for(dbits: int, bits: int = 48) -> int:
    """Digits needed so truncation error is below 2^-bits (row-relative)."""
    return max(2, math.ceil(bits / dbits))


def _pow2_f32range(e):
    """Exact 2^e as f64 for e in [-126, 127] (f32 exponent range)."""
    e = jnp.clip(e, -126, 127).astype(jnp.int32)
    f = lax.bitcast_convert_type((e + 127) << 23, jnp.float32)
    return f.astype(jnp.float64)


def _pow2(e):
    """Exact power of two 2^e as f64 for ANY fp64-range integer e.

    Built as a product of <= 9 f32-exponent-range factors: each factor
    is exact and products of powers of two round exactly in fp64 (down
    to denormals on real-f64 backends). Covers e in [-1074, 1024]; note
    the TPU stack's emulated fp64 itself only spans the f32 exponent
    range, so the extra factors matter on CPU/GPU backends."""
    e = jnp.asarray(e).astype(jnp.int32)
    out = _pow2_f32range(jnp.clip(e, -126, 127))
    rem = e - jnp.clip(e, -126, 127)
    for _ in range(8):
        step = jnp.clip(rem, -126, 127)
        out = out * _pow2_f32range(step)
        rem = rem - step
    return out


def _floor_log2(x):
    """floor(log2(x)) for positive finite x of any fp64 magnitude, exact
    via f32 exponent bits.

    (fp64 log on this platform is only ~1e-8 accurate -- never use it
    where an integer exponent must be exact.)  One f32-exponent read
    covers [2^-126, 2^127]; eight fixed rescale-and-reread passes
    (ceil(1074/123)) extend it to the full fp64 range (denormal f64
    included): each pass reduces the residual exponent magnitude by up
    to ~123."""
    def _f32_exp(v):
        v32 = jnp.clip(v, 1e-37, 1e37).astype(jnp.float32)
        bits = lax.bitcast_convert_type(v32, jnp.int32)
        return ((bits >> 23) & 0xFF) - 127

    e = _f32_exp(x)
    for _ in range(8):  # ceil(1074 / 123) passes reach fp64 denormals
        r = x * _pow2(-e)  # exact: power-of-two scaling
        e = e + _f32_exp(r)
    return e


def ozaki_slice(a, axis, dbits, nslice):
    """Split fp64 ``a`` into bf16 digit slices along rows or columns.

    axis=0: scale per row (lhs operand); axis=1: per column (rhs).
    Returns (digits, e) where digits has shape (nslice,) + a.shape and
    entry s holds integer digits in [-2^{dbits-1}, 2^{dbits-1}], and
    2^e is the per-row/col scale (int32).  The represented value is
        a ~= 2^e * sum_s digits[s] * 2^{-(dbits-1) - dbits*s}.
    """
    amax = jnp.max(jnp.abs(a), axis=1 - axis, keepdims=True)
    # scale = 2^(floor(log2 max)+1) >= max  ->  a/scale in [-1, 1]
    e = jnp.where(amax > 0, _floor_log2(amax) + 1, 0)
    r = a * _pow2(-e) * float(2 ** (dbits - 1))
    digits = []
    for _ in range(nslice):
        d = jnp.round(r)
        digits.append(d.astype(jnp.bfloat16))
        r = (r - d) * float(2**dbits)
    return jnp.stack(digits), e.squeeze(1 - axis).astype(jnp.int32)


def _pair_dots(da, db, nslice, transpose_lhs=False):
    """All digit-pair gemms grouped by diagonal d = i + j < nslice.

    Returns a list of f32 products, one per diagonal, each the exact
    integer sum of its pair gemms (pairs within a diagonal are summed
    in f32: each pair result is an exact integer < 2^24, and the <=
    nslice-term sum adds at most ~nslice ulp at 2^{ceil(log2 nslice)+24}
    -- far below the diagonal's own weight in the combine).

    transpose_lhs: contract axis 0 of the lhs digits instead of axis 1
    -- computes lhs^T @ rhs from UNtransposed slices, so one slicing of
    X serves both X-as-rhs and X^H-as-lhs products (the per-column
    scales of X are the per-row scales of X^T).
    """
    dims = (((0,), (0,)), ((), ())) if transpose_lhs else (((1,), (0,)), ((), ()))
    prods = []
    for d in range(nslice):
        acc = None
        for i in range(max(0, d - (nslice - 1)), min(d, nslice - 1) + 1):
            p = lax.dot_general(
                da[i],
                db[d - i],
                dimension_numbers=dims,
                precision=lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
        prods.append(acc)
    return prods


def ozaki_matmul_pre(pa, pb, dbits, transpose_lhs=False, negate=False):
    """Product from pre-computed slicings (see ozaki_slice).

    pa = (digits, e) sliced with axis=0 (row scales) -- or, with
    transpose_lhs, sliced with axis=1 (the transposed operand's row
    scales); pb sliced with axis=1.
    """
    da, ea = pa
    db, eb = pb
    nslice = da.shape[0]
    prods = _pair_dots(da, db, nslice, transpose_lhs)
    out = _combine(prods, ea, eb, dbits)
    return -out if negate else out


@functools.partial(jax.jit, static_argnames=("dbits", "nslice", "bits"))
def ozaki_matmul(a, b, dbits=None, nslice=None, bits=48):
    """fp64-accurate ``a @ b`` via exact bf16 digit products.

    a: (n, k) fp64, b: (k, m) fp64.  Accuracy ~2^-bits relative to
    rowmax(a) * colmax(b) -- below emulated-fp64 epsilon at bits=48.
    """
    k = a.shape[1]
    if dbits is None:
        dbits = digit_bits_for(k)
    if nslice is None:
        nslice = nslice_for(dbits, bits)
    da, ea = ozaki_slice(a, 0, dbits, nslice)
    db, eb = ozaki_slice(b, 1, dbits, nslice)
    return _combine(_pair_dots(da, db, nslice), ea, eb, dbits)


def _combine(prods, ea, eb, dbits):
    """fp64 weighted combine of the per-diagonal exact f32 products."""
    out = None
    # highest-order diagonal first so the fp64 sum is headroom-friendly
    for d, p in enumerate(prods):
        w = 2.0 ** (-2 * (dbits - 1) - dbits * d)
        term = p.astype(jnp.float64) * w
        out = term if out is None else out + term
    return out * _pow2(ea)[:, None] * _pow2(eb)[None, :]


def ozaki_pmatmul(x, y, dbits=None, nslice=None, bits=48):
    """Planar complex product via three Karatsuba ozaki gemms."""
    m1 = ozaki_matmul(x[0], y[0], dbits, nslice, bits)
    m2 = ozaki_matmul(x[1], y[1], dbits, nslice, bits)
    m3 = ozaki_matmul(x[0] + x[1], y[0] + y[1], dbits, nslice, bits)
    return (m1 - m2, m3 - m1 - m2)


@functools.partial(jax.jit, static_argnames=("chunk", "bits"))
def ozaki_matmul_chunked(a, b, chunk=None, bits=48):
    """ozaki_matmul with b's columns in sequential chunks.

    The lhs is sliced once and reused across chunks; per chunk only the
    rhs slices and one (n, chunk) output are alive -- the ozaki analogue
    of ops/planar.pmatmul_chunked (memory control at n >= 8192; digit
    slices are 2 bytes/element vs the emulated dot's 32).
    """
    m = b.shape[1]
    if chunk is None or chunk >= m or m % chunk != 0:
        return ozaki_matmul(a, b, bits=bits)
    k = a.shape[1]
    dbits = digit_bits_for(k)
    nslice = nslice_for(dbits, bits)
    da, ea = ozaki_slice(a, 0, dbits, nslice)
    bc = b.reshape(k, m // chunk, chunk).transpose(1, 0, 2)

    def one(bj):
        db, eb = ozaki_slice(bj, 1, dbits, nslice)
        return _combine(_pair_dots(da, db, nslice), ea, eb, dbits)

    out = lax.map(one, bc)
    return out.transpose(1, 0, 2).reshape(a.shape[0], m)


def ozaki_pmatmul_chunked(x, y, chunk=None, bits=48):
    """Chunked planar complex product via three Karatsuba ozaki gemms."""
    m1 = ozaki_matmul_chunked(x[0], y[0], chunk, bits)
    m2 = ozaki_matmul_chunked(x[1], y[1], chunk, bits)
    m3 = ozaki_matmul_chunked(x[0] + x[1], y[0] + y[1], chunk, bits)
    return (m1 - m2, m3 - m1 - m2)


def ozaki_planar_slices(p, axis, dbits, nslice, conj=False):
    """Karatsuba component slicings of a planar pair.

    Returns slicings of (Re, Im, Re+Im) -- or (Re, Im, Re-Im) with
    ``conj`` (for a conjugated lhs, whose Karatsuba components are
    (Re, -Im, Re-Im); the Im negation is applied at combine time by
    ozaki_pmatmul_pre's conj_lhs flag, digits are sign-symmetric).
    """
    third = p[0] - p[1] if conj else p[0] + p[1]
    return (
        ozaki_slice(p[0], axis, dbits, nslice),
        ozaki_slice(p[1], axis, dbits, nslice),
        ozaki_slice(third, axis, dbits, nslice),
    )


def ozaki_pmatmul_pre(lhs3, rhs3, dbits, transpose_lhs=False, conj_lhs=False):
    """Planar Karatsuba product from pre-computed component slicings.

    lhs3/rhs3 from ozaki_planar_slices (lhs axis=0, or axis=1 with
    transpose_lhs; rhs axis=1). conj_lhs computes conj(L)^T-style
    products: (u1 + i u2)(Yr + i Yi) with u2 = -Im.
    """
    m1 = ozaki_matmul_pre(lhs3[0], rhs3[0], dbits, transpose_lhs)
    m2 = ozaki_matmul_pre(
        lhs3[1], rhs3[1], dbits, transpose_lhs, negate=conj_lhs
    )
    m3 = ozaki_matmul_pre(lhs3[2], rhs3[2], dbits, transpose_lhs)
    return (m1 - m2, m3 - m1 - m2)
