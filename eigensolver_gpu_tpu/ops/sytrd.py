"""Blocked Householder tridiagonalization (sytrd/hetrd, UPLO='U').

Reduces a symmetric/Hermitian ``A`` to real tridiagonal ``T = Q^H A Q``,
returning LAPACK-compatible results: ``d`` (diagonal), ``e`` (off-diagonal),
``tau`` and the Householder vectors packed in the upper triangle
(reflector ``r`` has ``v[0:r]`` stored in column ``r+1``, ``v[r] = 1``;
``Q = H(n-2) ... H(1) H(0)``).

Reference design (dsytrd_gpu.F90 / zhetrd_gpu.F90, 728+883 LoC): panels of
nb1=32 columns swept from the last column backwards (dsytrd_gpu.F90:61-66);
each ``dlatrd_gpu`` panel column runs a chain of hand-written CUDA kernels --
fused rank-2-update+larfg with an atomics-based software grid barrier
(:303, :346-353), the custom triangle-reading symv (dsymv_gpu.F90:33), and
fused stacked gemvs (:449,:618) -- then a cuBLAS syr2k trailing update.

TPU-native re-design (not a translation):
  * The whole reduction is ONE compiled XLA computation: an unrolled loop
    over size *buckets* (static shapes, 512-aligned so MXU tiling holds),
    each a `lax.fori_loop` over panels, each a `lax.fori_loop` over the
    nb=32 columns. No kernel-launch chain, no streams, no atomics -- the
    sequential dependency lives in the loop carry, which is *stronger*
    ordering than the reference's software grid barrier.
  * ``A`` is kept full (mirrored) so the hot ``A @ v`` is a plain gemv and
    the trailing rank-2k update is a gemm -- both MXU-lowered. (The
    reference reads only the upper triangle to halve HBM traffic; the
    Pallas mirrored-triangle kernel that recovers that 2x is in
    ops/symv_pallas.py and used when cfg.use_pallas.)
  * The final <=32x32 block needs no special single-block kernel
    (dsytd2_gpu.F90:3 exists to avoid GPU launch overhead): the same
    column loop simply runs to column 0 inside the compiled loop.

Requires n % nb == 0 (drivers pad with a decoupled diagonal block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.kernel_guard import compiled_unavailable
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _real_dtype(dtype):
    return jnp.zeros((), dtype=dtype).real.dtype


def _larfg(alpha, xnormsq, iscomplex):
    """Householder generator, LAPACK dlarfg/zlarfg conventions.

    Given pivot ``alpha`` and ||x||^2 of the entries above it, returns
    (beta, tau, scale) with H = I - tau [v;1][v;1]^H, v = scale * x,
    H^H [x; alpha] = [0; beta], beta real.

    The reference implements this inside its fused kernels with
    warp-shuffle norms (dsytrd_gpu.F90:389-445, dlapy3/zladiv scaling
    zhetd2_gpu.F90:75-95); here it is branch-free scalar math.
    """
    if iscomplex:
        alphr, alphi = alpha.real, alpha.imag
    else:
        alphr, alphi = alpha, jnp.zeros_like(alpha)
    norm = jnp.sqrt(alphr * alphr + alphi * alphi + xnormsq)
    beta = jnp.where(alphr >= 0, -norm, norm)
    trivial = (xnormsq == 0) & (alphi == 0)
    safe_beta = jnp.where(trivial, jnp.ones_like(beta), beta)
    if iscomplex:
        tau = jax.lax.complex((beta - alphr) / safe_beta, -alphi / safe_beta)
        denom = alpha - beta.astype(alpha.dtype)
    else:
        tau = (beta - alphr) / safe_beta
        denom = alpha - beta
    safe_denom = jnp.where(trivial, jnp.ones_like(denom), denom)
    scale = 1.0 / safe_denom
    zero_tau = jnp.zeros_like(tau)
    tau = jnp.where(trivial, zero_tau, tau)
    scale = jnp.where(trivial, jnp.zeros_like(scale), scale)
    beta = jnp.where(trivial, alphr, beta)
    return beta, tau, scale


def _panel_columns(a_mb, v_p, w_p, d, e, tau, panel_end, nb, iscomplex, use_pallas):
    """dlatrd-equivalent: process the nb columns [panel_end-nb, panel_end).

    Returns updated (a_mb, v_p, w_p, d, e, tau). v_p/w_p are (mb, nb)
    compact-WY panel buffers (column slot k holds the k-th processed
    column, i.e. absolute column panel_end-1-k).
    """
    mb = a_mb.shape[0]
    dtype = a_mb.dtype
    rows = lax.broadcasted_iota(jnp.int32, (mb, 1), 0).squeeze(-1)

    def col_step(k, carry):
        a_mb, v_p, w_p, d, e, tau = carry
        cj = panel_end - 1 - k  # absolute column being reduced

        a_col = lax.dynamic_slice(a_mb, (0, cj), (mb, 1))[:, 0]
        # Rank-2 correction from this panel's already-computed columns
        # (dlatrd's leading gemv pair; zlatrd conjugates the row picks).
        # One stacked product [V W] @ conj([w_row; v_row]) -- the
        # reference fuses the same pair (stacked_dgemv_N,
        # dsytrd_gpu.F90:511).
        vw = jnp.concatenate([v_p, w_p], axis=1)  # (mb, 2nb)
        wv_row = lax.dynamic_slice(
            jnp.concatenate([w_p, v_p], axis=1), (cj, 0), (1, 2 * nb)
        )[0]
        a_col = a_col - vw @ jnp.conj(wv_row)

        d_val = a_col[cj].real if iscomplex else a_col[cj]

        # Householder generation for rows [0, cj): pivot at row cj-1.
        pidx = jnp.maximum(cj - 1, 0)
        alpha = a_col[pidx]
        xmask = rows < cj - 1
        x = jnp.where(xmask, a_col, jnp.zeros_like(a_col))
        xnormsq = jnp.sum((x * jnp.conj(x)).real)
        beta, tau_k, scale = _larfg(alpha, xnormsq, iscomplex)
        has_reflector = cj > 0
        tau_k = jnp.where(has_reflector, tau_k, jnp.zeros_like(tau_k))

        v = x * scale
        v = jnp.where((rows == cj - 1) & has_reflector, jnp.ones((), dtype), v)

        # w = tau * (A v - Vp (Wp^H v) - Wp (Vp^H v)); then the -1/2 tau
        # (w^H v) v correction (dlatrd tail / stacked_dgemv_N_finish_W,
        # dsytrd_gpu.F90:618-723, here three MXU products + an axpy).
        # The A@v is the flops-dominant op of the whole reduction (the
        # reference's dsymv_gpu); the Pallas path reads only the upper
        # triangle tiles, halving HBM traffic. Rows >= cj of y are junk
        # either way and masked below.
        if use_pallas and not compiled_unavailable("symv"):
            from eigensolver_gpu_tpu.ops.symv_pallas import symv_auto

            y = symv_auto(a_mb, v)
        else:
            y = a_mb @ v
        # z = [W V]^H v then y -= [V W] z : two stacked products instead
        # of four (stacked_dgemv_T / stacked_dgemv_N_finish_W,
        # dsytrd_gpu.F90:449,618)
        z12 = jnp.conj(jnp.concatenate([w_p, v_p], axis=1)).T @ v
        y = y - vw @ z12
        w = tau_k * y
        alpha_c = -0.5 * tau_k * jnp.vdot(w, v)
        w = w + alpha_c * v
        w = jnp.where(rows < cj, w, jnp.zeros_like(w))

        v_p = lax.dynamic_update_slice(v_p, v[:, None], (0, k))
        w_p = lax.dynamic_update_slice(w_p, w[:, None], (0, k))

        # Write back column cj in LAPACK storage: v in rows [0, cj-1),
        # e (=beta) at row cj-1, updated diagonal at row cj.
        new_col = jnp.where(xmask, v, a_col)
        new_col = jnp.where(
            (rows == cj - 1) & has_reflector, beta.astype(dtype), new_col
        )
        new_col = jnp.where(rows == cj, jnp.asarray(d_val, dtype), new_col)
        a_mb = lax.dynamic_update_slice(a_mb, new_col[:, None], (0, cj))

        d = lax.dynamic_update_slice(d, d_val[None], (cj,))
        e_old = lax.dynamic_slice(e, (pidx,), (1,))
        e = lax.dynamic_update_slice(
            e, jnp.where(has_reflector, beta, e_old[0])[None], (pidx,)
        )
        tau_old = lax.dynamic_slice(tau, (pidx,), (1,))
        tau = lax.dynamic_update_slice(
            tau, jnp.where(has_reflector, tau_k, tau_old[0])[None], (pidx,)
        )
        return a_mb, v_p, w_p, d, e, tau

    return lax.fori_loop(0, nb, col_step, (a_mb, v_p, w_p, d, e, tau))


@highest_precision
@functools.partial(
    jax.jit, static_argnames=("nb", "bucket", "use_pallas", "mesh")
)
def sytrd_blocked(a, nb=32, bucket=512, use_pallas=False, mesh=None):
    """Full blocked tridiagonalization. Returns (a_packed, d, e, tau).

    mesh: optional jax.sharding.Mesh with a 'tp' axis -- the active
    matrix (and therefore the hot per-column gemv, the stacked panel
    products, and the trailing rank-2nb gemm) is row-sharded over it;
    XLA SPMD inserts the psum/all-gather collectives (a few small psums
    per column: the [W V]^H v stack and the larfg scalar reductions).
    """
    n = a.shape[0]
    if n % nb != 0:
        raise ValueError(f"sytrd_blocked requires n % nb == 0, got n={n}, nb={nb}")
    dtype = a.dtype
    iscomplex = jnp.issubdtype(dtype, jnp.complexfloating)
    rdtype = _real_dtype(dtype)

    # Full mirrored storage: symmetrize and (complex) force a real diagonal
    # (the reference forces real diagonals explicitly, zhegst_gpu.F90:74-81).
    a = (a + jnp.conj(a.T)) / 2

    d = jnp.zeros((n,), rdtype)
    e = jnp.zeros((max(n - 1, 1),), rdtype)
    tau = jnp.zeros((max(n - 1, 1),), dtype)

    with trace_range("sytrd"):
        num_buckets = -(-n // bucket)
        for b in range(num_buckets, 0, -1):
            mb = min(b * bucket, n)
            lo = (b - 1) * bucket
            npanels = (mb - lo) // nb
            a_mb = a[:mb, :mb]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                a_mb = lax.with_sharding_constraint(
                    a_mb, NamedSharding(mesh, PartitionSpec("tp", None))
                )
            rows = lax.broadcasted_iota(jnp.int32, (mb, 1), 0).squeeze(-1)
            # the Mosaic toolchain has no fp64 in-kernel dot
            # (NotImplementedError: float64), so the Pallas symv serves
            # the fp32 factorization path only
            pallas_ok = (
                use_pallas
                and not iscomplex
                and dtype == jnp.float32
                and mb % 512 == 0
            )

            def panel_step(p, carry, mb=mb, rows=rows, pallas_ok=pallas_ok):
                a_mb, d, e, tau = carry
                panel_end = mb - p * nb
                v_p = jnp.zeros((mb, nb), dtype)
                w_p = jnp.zeros((mb, nb), dtype)
                a_mb, v_p, w_p, d, e, tau = _panel_columns(
                    a_mb, v_p, w_p, d, e, tau, panel_end, nb, iscomplex, pallas_ok
                )
                # Trailing rank-2nb update A -= V W^H + W V^H restricted to
                # the [0, t) x [0, t) block (cuBLAS syr2k/her2k in the
                # reference, dsytrd_gpu.F90:63-66) -- here masked gemms.
                t = panel_end - nb
                keep = (rows < t)[:, None]
                v_m = jnp.where(keep, v_p, jnp.zeros((), dtype))
                w_m = jnp.where(keep, w_p, jnp.zeros((), dtype))
                upd = v_m @ jnp.conj(w_m).T + w_m @ jnp.conj(v_m).T
                a_mb = a_mb - jnp.where(keep & keep.T, upd, jnp.zeros((), dtype))
                return a_mb, d, e, tau

            a_mb, d, e, tau = lax.fori_loop(
                0, npanels, panel_step, (a_mb, d, e, tau)
            )
            a = lax.dynamic_update_slice(a, a_mb, (0, 0))

    return a, d, e[: n - 1] if n > 1 else e[:0], tau[: n - 1] if n > 1 else tau[:0]


def sytrd(a, nb=32, bucket=512, use_pallas=False, mesh=None):
    """Alias used by the drivers (real and complex share one implementation;
    the reference maintains twin 728/883-line files, dsytrd_gpu.F90 and
    zhetrd_gpu.F90 -- dtype polymorphism replaces the duplication)."""
    return sytrd_blocked(
        a, nb=nb, bucket=bucket, use_pallas=use_pallas, mesh=mesh
    )
