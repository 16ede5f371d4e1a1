"""Mixed-precision eigenpair refinement (Ogita-Aishima iteration).

The reference runs everything in fp64 because Volta has fast fp64 units.
A TPU's MXU is fp32/bf16, so the BASELINE.md fast path (config 5) runs
the O(n^3) factorization stages in fp32 and recovers fp64 accuracy by
iterative refinement against the fp64 matrix -- a capability the
reference does not have.

Algorithm (Ogita & Aishima, 'Iterative refinement for symmetric
eigenvalue decomposition', 2018): given approximate eigenvectors X of
symmetric/Hermitian A,

    R = I - X^H X          (orthogonality defect)
    S = X^H A X            (near-diagonal)
    lambda_i = S_ii / (1 - R_ii)
    E_ij = (S_ij + lambda_j R_ij) / (lambda_j - lambda_i)   (separated)
    E_ij = R_ij / 2                                          (else, and i=j)
    X <- X + X E

Quadratic convergence while eigenvalue gaps exceed the working error;
clustered pairs fall back to the R/2 term, which still restores
orthogonality (the invariant subspace is what converges for clusters).
Cost per sweep: 4 gemms in the target precision -- all MXU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _mm_chunked(x, y, chunk):
    """x @ y with y's columns in sequential chunks (one emulated-fp64
    operand expansion alive at a time; see ops/planar.pmatmul_chunked)."""
    m = y.shape[1]
    if chunk is None or chunk >= m or m % chunk != 0:
        return x @ y
    yc = y.reshape(y.shape[0], m // chunk, chunk).transpose(1, 0, 2)
    out = jax.lax.map(lambda t: x @ t, yc)
    return out.transpose(1, 0, 2).reshape(x.shape[0], m)


def _sweep_eigh(a, x, eye, dt, chunk=None, mm=_mm_chunked, mm_dx=None):
    eps = jnp.finfo(jnp.zeros((), dt).real.dtype).eps
    r = eye - mm(jnp.conj(x.T), x, chunk)
    s = mm(jnp.conj(x.T), mm(a, x, chunk), chunk)
    lam = (jnp.diagonal(s).real / (1.0 - jnp.diagonal(r).real)).astype(
        jnp.zeros((), dt).real.dtype
    )
    denom = lam[None, :] - lam[:, None]
    anorm = jnp.max(jnp.abs(lam))
    # separation threshold: below it, pairs are treated as a
    # cluster and only orthogonality is corrected
    sep = jnp.maximum(1e3 * eps * anorm, jnp.finfo(jnp.float32).eps * anorm)
    safe = jnp.where(jnp.abs(denom) > sep, denom, jnp.ones((), lam.dtype))
    e_sep = (s + lam[None, :].astype(dt) * r) / safe.astype(dt)
    e = jnp.where(jnp.abs(denom) > sep, e_sep, r / 2)
    x_new = x + (mm_dx or mm)(x, e, chunk)
    # second-order norm correction (see _renorm): the first-order
    # rotation leaves a +theta^2 norm defect the last sweep can't clean
    return x_new * _renorm(eye - r, e)[None, :].astype(dt)


def _sweep_gevp(a, b, x, eye, dt, chunk=None, mm=_mm_chunked, mm_dx=None):
    """One generalized Ogita-Aishima sweep: R = I - X^H B X, S = X^H A X
    (see ops/refine_planar.py for the derivation); returns (x', lam)."""
    eps = jnp.finfo(jnp.zeros((), dt).real.dtype).eps
    bx = mm(b, x, chunk)
    ax = mm(a, x, chunk)
    r = eye - mm(jnp.conj(x.T), bx, chunk)
    s = mm(jnp.conj(x.T), ax, chunk)
    lam = (jnp.diagonal(s).real / (1.0 - jnp.diagonal(r).real)).astype(
        jnp.zeros((), dt).real.dtype
    )
    denom = lam[None, :] - lam[:, None]
    anorm = jnp.max(jnp.abs(lam))
    sep = jnp.maximum(1e3 * eps * anorm, jnp.finfo(jnp.float32).eps * anorm)
    ok = jnp.abs(denom) > sep
    safe = jnp.where(ok, denom, jnp.ones((), lam.dtype))
    e_sep = (s + lam[None, :].astype(dt) * r) / safe.astype(dt)
    e = jnp.where(ok, e_sep, r / 2)
    # correction product at reduced digit count: ozaki error is
    # relative to |E|, below the sweep's own O(|E|^2) term (see
    # ops/refine_planar._sweep_ozaki)
    x_new = x + (mm_dx or mm)(x, e, chunk)
    return x_new * _renorm(eye - r, e)[None, :].astype(dt), lam


def _renorm(m_gram, e):
    """Second-order B-norm correction, gemm-free.

    The first-order update X' = X(I+E) removes O(theta) mixing but
    leaves a +theta^2 norm defect that no later sweep cleans (a coarse
    fp32 sweep treats moderately-separated pairs as clustered, so the
    rotation happens only in the FINAL fp64 sweep -- measured stuck at
    1.0e-5 for an fp32 pipeline with eps32*anorm/gap ~ 3e-3 mixing).
    diag(X'^H B X') = diag((I+E)^H M (I+E)) with M the gram already in
    hand: M_ii + 2 Re(E^H M)_ii + (E^H E)_ii to O(|E|^2 |R|) -- all
    elementwise, no matrix product.  Returns 1/sqrt(d).
    """
    d = (
        jnp.diagonal(m_gram).real
        + 2.0 * jnp.sum(jnp.conj(e) * m_gram, axis=0).real
        + jnp.sum(jnp.abs(e) ** 2, axis=0)
    )
    return 1.0 / jnp.sqrt(jnp.maximum(d, jnp.finfo(d.dtype).tiny))


@highest_precision
@functools.partial(
    jax.jit, static_argnames=("sweeps", "coarse_first", "chunk", "gemm")
)
def refine_gevp(a, b, x, sweeps=2, coarse_first=True, chunk=None, gemm="ozaki"):
    """Refine generalized eigenpairs of (a, b) from approximate
    B-orthonormal eigenvectors ``x`` (n x n for full refinement).

    The real/complex-dtype counterpart of refine_gevp_planar: lets the
    ENTIRE fp32 generalized pipeline (Cholesky, sygst, tridiagonal,
    stedc, back-substitution) be refined in one step against the fp64
    (A, B) -- the reference has no analogue (V100 fp64 units make its
    all-fp64 pipeline fast; the TPU MXU path earns fp64 back here).
    gemm='ozaki' runs real-fp64 sweeps via exact bf16 digit products
    (ops/ozaki.py).
    """
    dt = a.dtype
    x = x.astype(dt)
    eye = jnp.eye(x.shape[1], dtype=dt)
    is64 = jnp.finfo(jnp.zeros((), dt).real.dtype).bits == 64

    with trace_range("refine_gevp"):
        if coarse_first and sweeps > 1 and is64:
            lo = jnp.complex64 if jnp.issubdtype(dt, jnp.complexfloating) else jnp.float32
            a32, b32, x32 = a.astype(lo), b.astype(lo), x.astype(lo)
            eye32 = eye.astype(lo)
            # cap coarse sweeps at 2: extra iterations beyond that go to
            # fp64 (refine_iters=4 -> 2 fp64 sweeps, the escape hatch
            # for spectra with gaps near eps32*anorm where the fp32
            # sweeps must treat pairs as clustered)
            n_coarse = min(sweeps - 1, 2)
            for _ in range(n_coarse):
                x32, _ = _sweep_gevp(a32, b32, x32, eye32, lo)
            x = x32.astype(dt)
            n_full = max(sweeps - n_coarse, 1)
        else:
            n_full = sweeps
        if gemm == "ozaki" and dt == jnp.float64:
            from eigensolver_gpu_tpu.ops.ozaki import ozaki_matmul_chunked

            mm = ozaki_matmul_chunked
            mm_dx = functools.partial(ozaki_matmul_chunked, bits=28)
        else:
            mm = _mm_chunked
            mm_dx = None
        w = None
        for _ in range(n_full):
            x, w = _sweep_gevp(a, b, x, eye, dt, chunk, mm, mm_dx)
        return w, x


@highest_precision
@functools.partial(
    jax.jit, static_argnames=("sweeps", "coarse_first", "chunk", "mesh", "gemm")
)
def refine_eigh(a, x, sweeps=2, coarse_first=True, chunk=None, mesh=None,
                gemm="ozaki"):
    """Refine eigenvectors ``x`` (n x m, m == n for full refinement) of
    dense symmetric/Hermitian ``a``; returns (w, x) in a's dtype.

    coarse_first: all but the last sweep run in the 32-bit dtype -- the
    early corrections only need a couple of digits, and the platform's
    emulated fp64 gemms dominate wall time (see ops/refine_planar.py).

    mesh: optional 'tp' row-sharding of a and x -- the refinement gemms
    (and crucially the emulated-fp64 8-slice operand expansions, ~8
    bytes/element extra) then live sharded; XLA inserts the contraction
    psums.

    gemm: 'ozaki' (default) runs real-fp64 sweeps as exact bf16 digit
    gemms on the MXU (ops/ozaki.py, ~1.8x the emulated fp64 dot at
    n=4096, same ~1e-13 accuracy); used only when unsharded (mesh=None)
    -- the sharded path keeps the plain dot so XLA's SPMD partitioner
    owns the contraction psums. 'emulated' forces the platform dot.
    """
    dt = a.dtype
    x = x.astype(dt)
    if mesh is not None and x.shape[0] % mesh.shape["tp"] == 0:
        from jax.sharding import NamedSharding, PartitionSpec

        spec = NamedSharding(mesh, PartitionSpec("tp", None))
        a = jax.lax.with_sharding_constraint(a, spec)
        x = jax.lax.with_sharding_constraint(x, spec)
    eye = jnp.eye(x.shape[1], dtype=dt)
    is64 = jnp.finfo(jnp.zeros((), dt).real.dtype).bits == 64

    with trace_range("refine_eigh"):
        if coarse_first and sweeps > 1 and is64:
            lo = jnp.complex64 if jnp.issubdtype(dt, jnp.complexfloating) else jnp.float32
            a32 = a.astype(lo)
            x32 = x.astype(lo)
            eye32 = eye.astype(lo)
            n_coarse = min(sweeps - 1, 2)  # see refine_gevp
            for _ in range(n_coarse):
                x32 = _sweep_eigh(a32, x32, eye32, lo)
            x = x32.astype(dt)
            n_full = max(sweeps - n_coarse, 1)
        else:
            n_full = sweeps
        use_ozaki = gemm == "ozaki" and dt == jnp.float64 and mesh is None
        if use_ozaki:
            from eigensolver_gpu_tpu.ops.ozaki import ozaki_matmul_chunked

            mm = ozaki_matmul_chunked
            mm_dx = functools.partial(ozaki_matmul_chunked, bits=28)
        else:
            mm = _mm_chunked
            mm_dx = None
        for _ in range(n_full):
            x = _sweep_eigh(a, x, eye, dt, chunk, mm, mm_dx)
        # final Rayleigh quotients + column normalization
        norms = jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=0))
        x = x / norms[None, :].astype(dt)
        w = jnp.sum(jnp.conj(x) * (a @ x), axis=0).real
        return w, x
