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

Selected-range refinement + defect auto-escalation (round 3): see
ops/refine_planar.py's module docstring -- this module implements the
same block scheme for real/complex-dtype arrays.  Only ``ms`` selected
columns (+ cluster margin) are corrected, against the FULL fp32 basis
(grams are (n_all, ms), cost ~n^2 ms per sweep instead of n^3), with
the fp32 pipeline's eigenvalues serving the out-of-block denominators
under a widened cluster floor.  Mirrors the reference's NZ-column
economy (dsyevd_gpu.F90:108,119-128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

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


def _renorm(m_gram, e, sel0, ms):
    """Second-order B-norm correction, gemm-free.

    The first-order update X' = X(I+E) removes O(theta) mixing but
    leaves a +theta^2 norm defect that no later sweep cleans (a coarse
    fp32 sweep treats moderately-separated pairs as clustered, so the
    rotation happens only in the FINAL fp64 sweep -- measured stuck at
    1.0e-5 for an fp32 pipeline with eps32*anorm/gap ~ 3e-3 mixing).
    diag(X'^H B X') = diag((I+E)^H M (I+E)) with M = X^H B X_blk the
    gram already in hand: M_(blk)ii + 2 Re(E^H M)_ii + (E^H E)_ii to
    O(|E|^2 |R|) -- all elementwise, no matrix product.  Returns
    1/sqrt(d) for the ms block columns.
    """
    d = (
        jnp.diagonal(m_gram[sel0 : sel0 + ms]).real
        + 2.0 * jnp.sum(jnp.conj(e) * m_gram, axis=0).real
        + jnp.sum(jnp.abs(e) ** 2, axis=0)
    )
    return 1.0 / jnp.sqrt(jnp.maximum(d, jnp.finfo(d.dtype).tiny))


def _correct_block(gram, s, sel0, ms, w_rows, dt):
    """Shared tail of one selected-block sweep (real/complex dtype):
    from gram = X^H M X_blk (M = B or I) and s = X^H A X_blk, build the
    correction E (n_all, ms), the block column scales, the updated
    eigenvalue estimates and the marginal-pair defect (see
    ops/refine_planar.py for the escalation semantics)."""
    rdt = jnp.zeros((), dt).real.dtype
    eps = jnp.finfo(rdt).eps
    n_all = gram.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (n_all, ms), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n_all, ms), 1)
    is_self = rows == cols + sel0
    inblk = (rows >= sel0) & (rows < sel0 + ms)

    r = jnp.where(is_self, jnp.ones((), dt), jnp.zeros((), dt)) - gram
    lam = (
        jnp.diagonal(s[sel0 : sel0 + ms]).real
        / (1.0 - jnp.diagonal(r[sel0 : sel0 + ms]).real)
    ).astype(rdt)
    w_rows = lax.dynamic_update_slice(w_rows, lam, (sel0,))
    denom = lam[None, :] - w_rows[:, None]
    anorm = jnp.max(jnp.abs(w_rows))
    sep_in = jnp.maximum(1e3 * eps * anorm, jnp.finfo(jnp.float32).eps * anorm)
    # out-of-block lambdas carry the fp32 pipeline's O(eps32*anorm)
    # error -- widen the cluster floor there (refine_planar docstring)
    sep = jnp.where(
        inblk, sep_in,
        jnp.maximum(sep_in, 64 * jnp.finfo(jnp.float32).eps * anorm),
    )
    ok = jnp.abs(denom) > sep
    safe = jnp.where(ok, denom, jnp.ones((), denom.dtype))
    num = s + lam[None, :].astype(dt) * r
    e = jnp.where(ok, num / safe.astype(dt), r / 2)
    sc = _renorm(gram, e, sel0, ms)[None, :].astype(dt)
    # defect = predicted post-sweep residual per column (l2 over rows,
    # max over columns): the sweep leaves |num|*delta/|denom| from
    # denominator error (delta: eps64-level in-block Rayleigh quotients,
    # O(64*eps32*anorm) for the fp32 pipeline's out-of-block lambdas)
    # plus the quadratic |num|^2/|denom| term; cluster-branch pairs
    # (|denom| <= sep) are suppressed by the max(.., sep) -- their
    # gap-level floor is unavoidable and must not drive escalation.
    delta = jnp.where(
        inblk, 1e3 * eps * anorm, 64 * jnp.finfo(jnp.float32).eps * anorm
    )
    absnum = jnp.abs(num)
    pred = jnp.where(
        is_self,
        0.0,
        jnp.minimum(
            absnum,
            (delta + absnum) * absnum / jnp.maximum(jnp.abs(denom), sep),
        ),
    )
    defect = jnp.sqrt(jnp.max(jnp.sum(pred**2, axis=0)))
    return e, sc, lam, w_rows, defect


def _sweep_eigh(a, x, sel, w_rows, dt, chunk=None, mm=_mm_chunked,
                mm_dx=None):
    """One standard-problem sweep on the selected block; updates only
    columns sel0..sel0+ms of the full basis x (n, n_all)."""
    sel0, ms = sel
    xs = x[:, sel0 : sel0 + ms]
    gram = mm(jnp.conj(x.T), xs, chunk)
    s = mm(jnp.conj(x.T), mm(a, xs, chunk), chunk)
    e, sc, lam, w_rows, defect = _correct_block(
        gram, s, sel0, ms, w_rows, dt
    )
    x_new = (xs + (mm_dx or mm)(x, e, chunk)) * sc
    return lax.dynamic_update_slice(x, x_new, (0, sel0)), lam, w_rows, defect


def _sweep_gevp(a, b, x, sel, w_rows, dt, chunk=None, mm=_mm_chunked,
                mm_dx=None):
    """One generalized sweep on the selected block: R = I - X^H B X_blk,
    S = X^H A X_blk (see ops/refine_planar.py for the derivation)."""
    sel0, ms = sel
    xs = x[:, sel0 : sel0 + ms]
    bx = mm(b, xs, chunk)
    ax = mm(a, xs, chunk)
    gram = mm(jnp.conj(x.T), bx, chunk)
    s = mm(jnp.conj(x.T), ax, chunk)
    e, sc, lam, w_rows, defect = _correct_block(
        gram, s, sel0, ms, w_rows, dt
    )
    # correction product at reduced digit count: ozaki error is
    # relative to |E|, below the sweep's own quadratic term (see
    # ops/refine_planar._sweep_ozaki)
    x_new = (xs + (mm_dx or mm)(x, e, chunk)) * sc
    return lax.dynamic_update_slice(x, x_new, (0, sel0)), lam, w_rows, defect


def _resolve_mm(gemm, dt, mesh=None):
    """Pick the fp64 gemm implementation (ozaki on real f64, else the
    platform dot); ozaki is gated to mesh=None so the SPMD partitioner
    owns the contraction psums on sharded runs."""
    if gemm == "ozaki" and dt == jnp.float64 and mesh is None:
        from eigensolver_gpu_tpu.ops.ozaki import ozaki_matmul_chunked

        return ozaki_matmul_chunked, functools.partial(
            ozaki_matmul_chunked, bits=28
        )
    return _mm_chunked, None


def _run_sweeps(one_sweep, x, w_rows, n_full, extra_max, n, dt):
    """Static sweeps + defect-gated while_loop escalation (shared by
    refine_gevp / refine_eigh)."""
    w = None
    defect = None
    escalate = jnp.finfo(jnp.zeros((), dt).real.dtype).bits == 64
    for _ in range(n_full):
        x, w, w_rows, defect = one_sweep(x, w_rows)
    if defect is None and extra_max > 0 and escalate:
        # sweeps=0 with escalation enabled: the defect gate needs one
        # measured sweep to seed the while_loop carry (a None seed
        # crashes at trace time); spend the first escalation sweep here.
        # Gated on the 64-bit check: 32-bit refines never enter the
        # while_loop, so the seed sweep would be an unrequested no-op-
        # plus-cost under sweeps=0.
        x, w, w_rows, defect = one_sweep(x, w_rows)
        extra_max -= 1
    if extra_max > 0 and defect is not None and escalate:
        # tolerance sits well above the defect's gram-noise floor
        # (measured ~3e-13 scale) and well below a one-sweep-short
        # defect (1e-9..1e-10 on the adversarial fixtures)
        anorm = jnp.max(jnp.abs(w_rows))
        tol = 100.0 * jnp.finfo(jnp.float64).eps * (n**0.5) * anorm

        def cond(carry):
            it, _, _, defect = carry
            return (it < extra_max) & (defect > tol)

        def body(carry):
            it, x, w_rows, _ = carry
            x, _, w_rows, defect = one_sweep(x, w_rows)
            return it + 1, x, w_rows, defect

        _, x, w_rows, defect = lax.while_loop(
            cond, body, (jnp.int32(0), x, w_rows, defect)
        )
        w = None  # recover from w_rows (set by the last sweep)
    return x, w, w_rows


@highest_precision
@functools.partial(
    jax.jit,
    static_argnames=(
        "sweeps", "coarse_first", "chunk", "gemm", "sel", "extra_max",
        "mesh",
    ),
)
def refine_gevp(a, b, x, sweeps=2, coarse_first=True, chunk=None,
                gemm="ozaki", sel=None, w0=None, extra_max=0, mesh=None):
    """Refine generalized eigenpairs of (a, b) from the approximate
    B-orthonormal full basis ``x`` (n x n, ascending eigenvalue order).

    sel: optional static (sel0, ms) -- refine/return only that block
    (selected range + cluster margin; per-sweep cost ~n^2*ms).  w0:
    full-length fp32-pipeline eigenvalue estimates, required with a
    strict-subset sel.  extra_max: defect-gated auto-escalation sweeps.
    Returns (w (ms,), x_block (n, ms)).

    mesh: row-shard a, b, x over 'tp' and let the SPMD partitioner own
    the contraction psums (ozaki stays gated to mesh=None, as in
    refine_eigh).

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
    n, m = x.shape
    if sel is None:
        sel = (0, m)
    sel0, ms = sel
    rdt = jnp.zeros((), dt).real.dtype
    if w0 is None:
        if ms < m:
            raise ValueError("sel with a strict subset requires w0")
        w0 = jnp.zeros((m,), rdt)
    w_rows = w0.astype(rdt)
    is64 = jnp.finfo(rdt).bits == 64
    if mesh is not None and n % mesh.shape["tp"] == 0:
        from jax.sharding import NamedSharding, PartitionSpec

        spec = NamedSharding(mesh, PartitionSpec("tp", None))
        a = jax.lax.with_sharding_constraint(a, spec)
        b = jax.lax.with_sharding_constraint(b, spec)
        x = jax.lax.with_sharding_constraint(x, spec)

    with trace_range("refine_gevp"):
        if coarse_first and sweeps > 1 and is64:
            lo = jnp.complex64 if jnp.issubdtype(dt, jnp.complexfloating) else jnp.float32
            a32, b32, x32 = a.astype(lo), b.astype(lo), x.astype(lo)
            w32 = w_rows.astype(jnp.float32)
            # cap coarse sweeps at 2: extra iterations beyond that go to
            # fp64 (refine_iters=4 -> 2 fp64 sweeps; superseded by
            # extra_max auto-escalation but kept for manual control)
            n_coarse = min(sweeps - 1, 2)
            for _ in range(n_coarse):
                x32, _, w32, _ = _sweep_gevp(a32, b32, x32, sel, w32, lo)
            x = x32.astype(dt)
            w_rows = w32.astype(rdt)
            n_full = max(sweeps - n_coarse, 1)
        else:
            n_full = sweeps
        mm, mm_dx = _resolve_mm(gemm, dt, mesh)

        def one_sweep(x, w_rows):
            return _sweep_gevp(a, b, x, sel, w_rows, dt, chunk, mm, mm_dx)

        x, w, w_rows = _run_sweeps(
            one_sweep, x, w_rows, n_full, extra_max, n, dt
        )
        if w is None:
            w = lax.dynamic_slice(w_rows, (sel0,), (ms,))
        return w, x[:, sel0 : sel0 + ms]


@highest_precision
@functools.partial(
    jax.jit,
    static_argnames=(
        "sweeps", "coarse_first", "chunk", "mesh", "gemm", "sel", "extra_max"
    ),
)
def refine_eigh(a, x, sweeps=2, coarse_first=True, chunk=None, mesh=None,
                gemm="ozaki", sel=None, w0=None, extra_max=0):
    """Refine eigenvectors of dense symmetric/Hermitian ``a`` from the
    approximate full basis ``x`` (n x m, ascending order); returns
    (w (ms,), x_block (n, ms)) for the selected block (all of x when
    sel is None).

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

    sel/w0/extra_max: selected-block refinement and auto-escalation,
    as in refine_gevp.
    """
    dt = a.dtype
    x = x.astype(dt)
    n, m = x.shape
    if sel is None:
        sel = (0, m)
    sel0, ms = sel
    rdt = jnp.zeros((), dt).real.dtype
    if w0 is None:
        if ms < m:
            raise ValueError("sel with a strict subset requires w0")
        w0 = jnp.zeros((m,), rdt)
    w_rows = w0.astype(rdt)
    if mesh is not None and x.shape[0] % mesh.shape["tp"] == 0:
        from jax.sharding import NamedSharding, PartitionSpec

        spec = NamedSharding(mesh, PartitionSpec("tp", None))
        a = jax.lax.with_sharding_constraint(a, spec)
        x = jax.lax.with_sharding_constraint(x, spec)
    is64 = jnp.finfo(rdt).bits == 64

    with trace_range("refine_eigh"):
        if coarse_first and sweeps > 1 and is64:
            lo = jnp.complex64 if jnp.issubdtype(dt, jnp.complexfloating) else jnp.float32
            a32 = a.astype(lo)
            x32 = x.astype(lo)
            w32 = w_rows.astype(jnp.float32)
            n_coarse = min(sweeps - 1, 2)  # see refine_gevp
            for _ in range(n_coarse):
                x32, _, w32, _ = _sweep_eigh(a32, x32, sel, w32, lo)
            x = x32.astype(dt)
            w_rows = w32.astype(rdt)
            n_full = max(sweeps - n_coarse, 1)
        else:
            n_full = sweeps
        mm, mm_dx = _resolve_mm(gemm, dt, mesh)

        def one_sweep(x, w_rows):
            return _sweep_eigh(a, x, sel, w_rows, dt, chunk, mm, mm_dx)

        x, _, w_rows = _run_sweeps(
            one_sweep, x, w_rows, n_full, extra_max, n, dt
        )
        # final Rayleigh quotients + column normalization on the block
        xs = x[:, sel0 : sel0 + ms]
        norms = jnp.sqrt(jnp.sum(jnp.abs(xs) ** 2, axis=0))
        xs = xs / norms[None, :].astype(dt)
        w = jnp.sum(jnp.conj(xs) * (a @ xs), axis=0).real
        return w, xs
