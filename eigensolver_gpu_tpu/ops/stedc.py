"""On-device divide-and-conquer symmetric tridiagonal eigensolver (stedc).

This replaces the reference's single CPU escape hatch: dsyevd_gpu.F90:99 /
zheevd_gpu.F90:101 ship the tridiagonal matrix to the host, run LAPACK
``dstedc``/``zstedc`` on pinned memory, and copy the eigenvectors back
(dsyevd_gpu.F90:84-85,108) -- a PCIe round-trip plus a serial CPU O(n^2..3)
stage in the middle of the GPU pipeline. Here the whole divide-and-conquer
runs on the TPU: the merge tree is a static loop of batched (vmap)
rank-one-update solves, the secular equation is solved for all roots
simultaneously by a fixed-iteration safeguarded rational scheme, and
eigenvector assembly is batched gemms on the MXU (the dominant cost,
(4/3)n^3 flops, exactly where the TPU wants it).

Static-shape design decisions (XLA requires them; LAPACK's dlaed2 is
heavily data-dependent):
  * deflation by masking: entries with rho*|z_i| <= tol keep eigenvalue
    d_i and unit eigenvector; their z is zeroed so every masked formula
    degenerates correctly;
  * instead of dlaed2's sequential Givens rotation chain for near-equal
    poles, surviving poles are *separated* to a minimum gap of
    O(eps * ||T||) by a vectorized prefix-max. This is a backward
    perturbation of the same order as the deflation threshold, keeps
    exact interlacing for the secular solver, and is branch-free;
  * Gu/Eisenstat z-recomputation (the Loewner-formula trick) restores
    eigenvector orthogonality regardless of how accurately each root was
    located relative to its neighbors.

Input: d (n,), e (n-1,) real. Output: (w, q) with w ascending and
q orthogonal, T q = q diag(w), T = tridiag(e, d, e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range

def _secular_iters(dt):
    """Safeguarded-iteration count: worst-case lanes degrade to bisection,
    so the count must bottom out the dtype's precision (interval/2^k below
    eps * scale). 60 covers double-word fp64; fp32 bottoms out by ~35."""
    return 60 if jnp.finfo(dt).bits == 64 else 35


def _merge_pair(d1, q1, d2, q2, beta, gap_scale, compact=False, mesh=None):
    """Merge two solved blocks coupled by off-diagonal ``beta``.

    [[T1, beta e e^T^], [.., T2]] = blockdiag(D1', D2') + rho v v^T with
    rho = |beta|, v = [sign(beta) * last-col-of-Q1-basis, first-of-Q2]
    (the diagonal adjustments were applied on the way down, in stedc()).
    The halves may have different sizes (the binary-decomposition merge
    tree folds unequal groups; Cuppen's update never needed equal halves).

    compact: deflation-aware assembly -- permute the alive (undeflated)
    poles to the front and run the update gemm at the smallest of four
    static bucket sizes covering the alive count (deflated columns of U
    are unit vectors, so they bypass the gemm entirely; heavy deflation
    -- clustered QE-style spectra -- cuts the dominant n^3 assembly by
    the squared deflation fraction). ONLY for unbatched call sites:
    under vmap the lax.switch would execute every bucket for the whole
    batch.

    mesh: row-shard the O(n2^2) secular/assembly intermediates over
    'tp' (unbatched top merges only). The secular reductions run over
    axis=1 per root, so row sharding needs NO collectives inside the
    while_loop; without the constraints the partitioner replicates
    several (n2, n2) temps per device (measured 5.3 GB at n=16384).
    """
    m = d1.shape[0]
    m2_ = d2.shape[0]
    n2 = m + m2_
    dt = d1.dtype
    eps = jnp.finfo(dt).eps

    rho = jnp.abs(beta)
    s = jnp.where(beta >= 0, jnp.ones((), dt), -jnp.ones((), dt))
    z = jnp.concatenate([s * q1[-1, :], q2[0, :]])
    d = jnp.concatenate([d1, d2])

    # Sort poles ascending; remember the permutation for column assembly.
    perm = jnp.argsort(d)
    ds = d[perm]
    zs = z[perm]

    # --- deflation by masking (dlaed2's tiny-z test) ---
    tol = 8.0 * eps * jnp.maximum(jnp.max(jnp.abs(ds)), rho * jnp.max(jnp.abs(zs)))
    alive = rho * jnp.abs(zs) > tol
    zs = jnp.where(alive, zs, jnp.zeros((), dt))
    z2 = zs * zs

    # --- separate surviving poles to a minimum gap (replaces the Givens
    # rotation chain; backward error O(eps ||T||)) ---
    gap_min = 16.0 * eps * gap_scale
    rank = jnp.cumsum(alive.astype(dt)) - alive.astype(dt)  # alive index
    # finite sentinel, NOT -inf: the platform's double-word f64 emulation
    # produces NaN from inf arithmetic (inf - inf in the hi/lo split)
    neg_big = jnp.min(ds) - 2.0 * gap_scale - 1.0
    shifted = jnp.where(alive, ds - rank * gap_min, neg_big)
    dsep = lax.cummax(shifted) + rank * gap_min
    dp = jnp.where(alive, jnp.maximum(ds, dsep), ds)  # perturbed poles

    # --- per-root search intervals ---
    idx = lax.broadcasted_iota(jnp.int32, (n2, 1), 0).squeeze(-1)
    # next alive pole above each position (reverse cummin over positions)
    big = jnp.full((n2,), n2, jnp.int32)
    nxt_pos = jnp.where(alive, idx, big)
    nxt_pos = lax.cummin(nxt_pos[::-1])[::-1]
    # nxt_pos[i] = min alive j >= i; we need j > i:
    nxt_above = jnp.concatenate([nxt_pos[1:], big[:1]])
    zsum = rho * jnp.sum(z2)
    ub = jnp.max(dp) + zsum + gap_min  # upper bound for the top root
    dp_ext = jnp.concatenate([dp, jnp.array([0.0], dt)])
    nxt_d = jnp.where(nxt_above < n2, dp_ext[jnp.minimum(nxt_above, n2 - 1)], ub)

    if mesh is not None and n2 % mesh.shape["tp"] == 0:
        from jax.sharding import NamedSharding, PartitionSpec

        _row = NamedSharding(mesh, PartitionSpec("tp", None))
        shard_rows = lambda x: lax.with_sharding_constraint(x, _row)
    else:
        shard_rows = lambda x: x

    # --- secular solve: all roots at once, shifted coordinates ---
    # pole-difference matrix: pd[i, j] = dp[j] - dp[i] (exact f64 diffs)
    pd = shard_rows(dp[None, :] - dp[:, None])
    gap = nxt_d - dp  # interval width for root i: (dp[i], dp[i]+gap)

    # psi/phi split masks: for root i, psi sums poles j <= i, phi the rest
    # (the classic dlaed4 decomposition; both stay monotone in mu).
    le_mask = (
        lax.broadcasted_iota(jnp.int32, (n2, n2), 1)
        <= lax.broadcasted_iota(jnp.int32, (n2, n2), 0)
    )

    def secular_parts(mu, sig_is_right):
        # delta[i,j] = dp[j] - sigma_i - mu_i ; sigma_i = dp_i or nxt_i
        base = jnp.where(sig_is_right[:, None], pd - gap[:, None], pd)
        delta = base - mu[:, None]
        safe = jnp.where(delta == 0, jnp.ones((), dt), delta)
        terms = z2[None, :] / safe
        terms2 = terms / safe
        psi = rho * jnp.sum(jnp.where(le_mask, terms, 0.0), axis=1)
        phi = rho * jnp.sum(jnp.where(le_mask, 0.0, terms), axis=1)
        dpsi = rho * jnp.sum(jnp.where(le_mask, terms2, 0.0), axis=1)
        dphi = rho * jnp.sum(jnp.where(le_mask, 0.0, terms2), axis=1)
        return psi, phi, dpsi, dphi

    # choose the shift side from the sign of f at the midpoint; the
    # bracket stays the FULL interval so a noisy midpoint sign (root
    # hugging the midpoint) can never exclude the root.
    p_mid, q_mid, _, _ = secular_parts(gap / 2, jnp.zeros((n2,), bool))
    sig_right = 1.0 + p_mid + q_mid < 0
    lo0 = jnp.where(sig_right, -gap, jnp.zeros((n2,), dt))
    hi0 = jnp.where(sig_right, jnp.zeros((n2,), dt), gap)
    mu0 = (lo0 + hi0) / 2

    def secular_step(_, carry):
        mu, lo, hi, _ = carry
        psi, phi, dpsi, dphi = secular_parts(mu, sig_right)
        f = 1.0 + psi + phi
        fp = dpsi + dphi
        # dlaed4-style residual convergence: stop a lane once |f| is at
        # the roundoff floor of its own evaluation (the bracket-width
        # test alone kept converged lanes iterating 15-25 sweeps:
        # only one bracket side moves per step while the rational
        # iterate converges quadratically). NO n2 factor here -- an
        # 8*eps*n2 threshold measured ~4e-3*scale for fp32 merges at
        # n2=4096, froze the roots early, degraded the eigenvector
        # basis, and triggered a whole extra fp64 refinement sweep in
        # the mixed drivers (+128 ms on the bench headline).
        conv = jnp.abs(f) <= 8.0 * eps * (
            1.0 + jnp.abs(psi) + jnp.abs(phi)
        )
        lo = jnp.where(f < 0, mu, lo)
        hi = jnp.where(f >= 0, mu, hi)
        # derivative-matched two-pole rational model (dlaed4 middle way):
        #   psi(t) ~ c_psi + P/(di - t),  phi(t) ~ c_phi + Q/(dn - t)
        # matching value and derivative at the current iterate.
        di = jnp.where(sig_right, -gap, jnp.zeros((n2,), dt))  # left pole (mu)
        dn = jnp.where(sig_right, jnp.zeros((n2,), dt), gap)  # right pole (mu)
        del_i = di - mu
        del_n = dn - mu
        p = dpsi * del_i * del_i
        q = dphi * del_n * del_n
        a = 1.0 + (psi - dpsi * del_i) + (phi - dphi * del_n)
        bq = -a * (di + dn) - p - q
        cq = a * di * dn + p * dn + q * di
        disc = jnp.maximum(bq * bq - 4 * a * cq, 0.0)
        sq = jnp.sqrt(disc)
        t1 = jnp.where(bq >= 0, (-bq - sq) / 2, (-bq + sq) / 2)
        safe_t1 = jnp.where(t1 == 0, jnp.ones((), dt), t1)
        safe_a = jnp.where(a == 0, jnp.ones((), dt), a)
        r1 = t1 / safe_a
        r2 = cq / safe_t1
        # the model has exactly one root strictly between its two poles
        # (di, dn) -- prefer a candidate that is both in the bracket and
        # between the poles, then any in-bracket candidate, else bisect
        in1 = (r1 > lo) & (r1 < hi)
        in2 = (r2 > lo) & (r2 < hi)
        mid1 = in1 & (r1 > di) & (r1 < dn)
        mid2 = in2 & (r2 > di) & (r2 < dn)
        cand = jnp.where(
            mid1, r1, jnp.where(
                mid2, r2, jnp.where(in1, r1, jnp.where(in2, r2, (lo + hi) / 2))
            )
        )
        # Newton fallback when the rational model degenerates
        newton = mu - f / jnp.where(fp == 0, jnp.ones((), dt), fp)
        cand = jnp.where(
            jnp.isfinite(cand), cand, jnp.where(
                (newton > lo) & (newton < hi), newton, (lo + hi) / 2
            )
        )
        # converged lanes freeze their iterate (safeguard invariant:
        # re-applying the step to a frozen lane is a no-op)
        cand = jnp.where(conv, mu, cand)
        return cand, lo, hi, conv

    # Adaptive iteration: the fixed count (60 fp64 / 35 fp32) covers the
    # worst case where lanes degrade to bisection, but typical spectra
    # converge in ~15-25 rational steps. Run the same safeguarded step
    # under a while_loop that stops once EVERY lane's bracket has
    # collapsed to relative eps (absolute floor eps*gap_scale for roots
    # near zero) -- ~2x fewer sweeps of the O(n^2) secular evaluation on
    # typical merges with bitwise-identical worst-case behavior.
    #
    # while_loop semantics (keep in mind when changing the step):
    # * not reverse-differentiable -- if stedc ever needs jax.grad, gate
    #   this to a fixed-count fori_loop of max_it steps;
    # * under vmap, converged lanes of a batch member KEEP running the
    #   body until the whole batch's condition fails. That is safe ONLY
    #   because the step is safeguarded (mu always clipped into [lo, hi]
    #   and the bracket never widens) -- a converged lane re-applying the
    #   step is a no-op. Preserve that invariant in any new step formula.
    max_it = _secular_iters(dt)
    # absolute floor at eps * gap_min: roots hugging their pole (mu of
    # order the separation floor) still resolve to full relative
    # precision before the freeze fires
    tol_abs = eps * gap_min

    def secular_cond(carry):
        it, mu, lo, hi, conv = carry
        width = hi - lo
        done = conv | (
            width <= eps * jnp.maximum(jnp.abs(lo), jnp.abs(hi)) + tol_abs
        )
        return (it < max_it) & ~jnp.all(done)

    def secular_body(carry):
        it, mu, lo, hi, conv = carry
        mu, lo, hi, conv = secular_step(it, (mu, lo, hi, conv))
        return it + 1, mu, lo, hi, conv

    _, mu, lo, hi, _ = lax.while_loop(
        secular_cond, secular_body,
        (jnp.int32(0), mu0, lo0, hi0, jnp.zeros((n2,), bool)),
    )
    # final safeguarded value strictly inside the interval
    mu = jnp.clip(mu, lo, hi)
    sigma = jnp.where(sig_right, nxt_d, dp)
    lam = sigma + mu  # roots for alive entries
    w = jnp.where(alive, lam, ds)

    # --- Gu/Eisenstat recomputed z via the Loewner formula ---
    # zhat_i^2 = prod_k (lam_k - dp_i) / prod_{k != i} (dp_k - dp_i),
    # lam[k] - dp[i] = (sigma_k - dp_i) + mu_k, with sigma_k - dp_i an
    # exact difference of stored pole values. Evaluated as a direct
    # product of paired ratios -- NOT log/exp (the platform's f64
    # transcendentals are only ~1e-8 accurate, which poisoned the
    # eigenvectors); interlacing telescopes the partial products into
    # f64 range.
    sig_minus_d = jnp.where(sig_right[:, None], -(pd - gap[:, None]), -pd)
    lam_minus_d = shard_rows(sig_minus_d + mu[:, None])  # [k,i] = lam_k - dp_i
    pdT = -pd  # [k, i] = dp_k - dp_i
    eye = jnp.eye(n2, dtype=bool)
    both = alive[:, None] & alive[None, :]
    ratio = jnp.where(
        both & ~eye,
        lam_minus_d / jnp.where(pdT == 0, jnp.ones((), dt), pdT),
        jnp.ones((), dt),
    )
    own = jnp.where(alive, jnp.abs(jnp.diagonal(lam_minus_d)), 1.0)
    zhat_abs = jnp.sqrt(jnp.abs(jnp.prod(ratio, axis=0)) * own)
    zhat = jnp.where(alive, jnp.where(zs >= 0, zhat_abs, -zhat_abs), 0.0)

    # --- eigenvector assembly ---
    # u[i, k] = zhat_i / (dp_i - lam_k) for alive i,k; unit columns for
    # deflated k; then Q = [Q1 0; 0 Q2][:, perm] @ U  (one MXU gemm).
    denom_u = shard_rows(-lam_minus_d.T)  # [i, k] = dp_i - lam_k
    safe_u = jnp.where(denom_u == 0, jnp.ones((), dt), denom_u)
    u = jnp.where(both.T & both, zhat[:, None] / safe_u, 0.0)
    u = shard_rows(jnp.where(both, u, 0.0))
    norms = jnp.sqrt(jnp.sum(u * u, axis=0))
    u = u / jnp.where(norms == 0, jnp.ones((), dt), norms)[None, :]
    u = jnp.where((~alive[None, :]) & eye, jnp.ones((), dt), u)

    qcat = jnp.zeros((n2, n2), dt)
    qcat = qcat.at[:m, :m].set(q1)
    qcat = qcat.at[m:, m:].set(q2)
    qp = qcat[:, perm]
    if compact:
        # alive-first permutation; U restricted to the leading na block
        # is the whole non-trivial update (dead rows/cols of U are unit)
        perm2 = jnp.argsort(~alive, stable=True)
        inv2 = jnp.argsort(perm2)
        qp_c = qp[:, perm2]
        u_c = u[perm2][:, perm2]
        na = jnp.sum(alive.astype(jnp.int32))
        sizes = sorted(
            {min(n2, -(-(n2 * (i + 1) // 4) // 128) * 128) for i in range(4)}
        )
        if sizes[-1] != n2:
            sizes.append(n2)
        bidx = sum((na > s).astype(jnp.int32) for s in sizes[:-1])

        def mk(sz):
            def branch(args):
                qp_c, u_c = args
                left = qp_c[:, :sz] @ u_c[:sz, :sz]
                return jnp.concatenate([left, qp_c[:, sz:]], axis=1)

            return branch

        qnew = lax.switch(bidx, [mk(s) for s in sizes], (qp_c, u_c))[:, inv2]
    else:
        qnew = qp @ u

    # final ascending order
    order = jnp.argsort(w)
    return w[order], qnew[:, order]


@highest_precision
@functools.partial(jax.jit, static_argnames=("leaf", "leaf_solver", "mesh"))
def stedc(d, e, leaf=64, leaf_solver=None, mesh=None):
    """All eigenpairs of the symmetric tridiagonal (d, e), on device.

    leaf_solver: None = auto (see below), 'jacobi' (ops/jacobi.py), or
    'xla' (jnp.linalg.eigh).  Auto picks 'xla' for fp32 and 'jacobi'
    for fp64.  Rationale (measured on the target chip): the Jacobi
    sweep loop is sequential-depth bound -- sweeps*(leaf-1) ~ 630 tiny
    fori_loop steps cost ~100 ms regardless of n, which WAS the entire
    fixed cost of small-n stedc (benchmarks/stedc_micro.py: leaf=64
    jacobi 102 ms device vs xla ~0).  XLA's batched fp32 eigh under
    ``highest`` matmul precision reaches orth ~1e-6 / residual
    ~n*eps32 (validated on-chip); it is NOT trusted in fp64, where the
    platform's double-word emulation makes its internals uncertain --
    the fp64 path keeps the Jacobi solver whose accuracy was validated
    against LAPACK on this stack.

    mesh: optional Mesh with a 'tp' axis. Lower merge levels shard the
    independent-pair batch axis over it; once pairs < devices the merge
    assembly gemm (the dominant (4/3)n^3 cost) is row-sharded instead.
    """
    from eigensolver_gpu_tpu.ops.jacobi import jacobi_eigh

    n = d.shape[0]
    dt = d.dtype
    if leaf_solver is None:
        leaf_solver = "xla" if jnp.finfo(dt).bits == 32 else "jacobi"

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        ntp = mesh.shape["tp"]

        def shard_level(wb_c, qb_c):
            pairs = qb_c.shape[0]
            if pairs % ntp == 0:
                spec = PartitionSpec("tp", None, None)
            elif qb_c.shape[1] % ntp == 0:
                spec = PartitionSpec(None, "tp", None)
            else:
                return wb_c, qb_c
            return wb_c, lax.with_sharding_constraint(
                qb_c, NamedSharding(mesh, spec)
            )

        def shard_block(q_c):
            if q_c.shape[0] % ntp:
                return q_c
            return lax.with_sharding_constraint(
                q_c, NamedSharding(mesh, PartitionSpec("tp", None))
            )
    else:
        shard_level = lambda wb_c, qb_c: (wb_c, qb_c)
        shard_block = lambda q_c: q_c

    def leaf_eigh(tb):
        if leaf_solver == "jacobi" and tb.shape[-1] % 2 == 0:
            return jacobi_eigh(tb)
        return jnp.linalg.eigh(tb)

    if n <= 2 or n <= leaf:
        t = jnp.diag(d) + jnp.diag(e, 1) + jnp.diag(e, -1)
        return leaf_eigh(t)

    with trace_range("stedc"):
        # scale to unit norm-ish (dstedc scales by orgnrm)
        orgnrm = jnp.maximum(jnp.max(jnp.abs(d)), jnp.max(jnp.abs(e)))
        scale = jnp.where(orgnrm > 0, orgnrm, jnp.ones((), dt))
        d = d / scale
        e = e / scale

        # pad to a whole number of leaves only (< leaf extra entries).
        # The merge tree is built from the BINARY DECOMPOSITION of the
        # block count instead of padding to leaf * 2^L: power-of-two
        # padding cost up to 4x just past a boundary (n=4097 padded to
        # 8192); here each power-of-two group of leaves gets a standard
        # vmapped tree and the group results fold left-to-right through
        # unequal-size merges (Cuppen's rank-one update never needed
        # equal halves).
        nblk = -(-n // leaf)
        npad = leaf * nblk
        pad = npad - n
        # distinct decoupled values just above the scaled spectrum
        # (Gershgorin of T/scale <= 3). Tight spacing matters: these
        # values enter gap_scale and the deflation tolerance, and a
        # 4+arange ramp once inflated fp32 thresholds ~10x per 40 pad
        # entries, visibly corrupting interior eigenvalues.
        pad_vals = 4.0 + jnp.arange(pad, dtype=dt) * (1.0 / 1024.0)
        dp_full = jnp.concatenate([d, pad_vals])
        e_full = jnp.concatenate([e, jnp.zeros((npad - 1 - (n - 1),), dt)])
        if pad > 0:
            e_full = e_full.at[n - 1].set(0.0)  # decouple the padding

        # way-down diagonal adjustments at every merge boundary
        bidx = (jnp.arange(1, nblk, dtype=jnp.int32)) * leaf
        babs = jnp.abs(e_full[bidx - 1])
        dp_adj = dp_full.at[bidx - 1].add(-babs).at[bidx].add(-babs)

        # leaves: batched dense eigh of leaf-sized tridiagonal blocks
        db = dp_adj.reshape(nblk, leaf)
        eb = e_full[: npad - 1]
        # within-block off-diagonals: positions where (i+1) % leaf != 0
        e_in = jnp.concatenate([eb, jnp.zeros((1,), dt)]).reshape(nblk, leaf)
        e_in = e_in.at[:, -1].set(0.0)  # drop the cross-block boundary e
        ii = jnp.arange(leaf)
        tb = (
            db[:, :, None] * (ii[:, None] == ii[None, :])
            + e_in[:, :, None] * ((ii[:, None] + 1) == ii[None, :])
            + e_in[:, None, :] * ((ii[None, :] + 1) == ii[:, None])
        )
        wb, qb = leaf_eigh(tb)  # (nblk, leaf), (nblk, leaf, leaf)

        gap_scale = jnp.maximum(jnp.max(jnp.abs(dp_full)), 1.0)

        def tree(wb_c, qb_c, start_el, nblk_c):
            """Standard vmapped power-of-two merge tree over nblk_c
            leaves whose first element sits at global index start_el."""
            m = leaf
            sz = nblk_c * leaf
            while m < sz:
                pairs = sz // (2 * m)
                w1 = wb_c.reshape(pairs, 2, m)[:, 0]
                w2 = wb_c.reshape(pairs, 2, m)[:, 1]
                q1 = qb_c.reshape(pairs, 2, m, m)[:, 0]
                q2 = qb_c.reshape(pairs, 2, m, m)[:, 1]
                betas = e_full[start_el + (2 * jnp.arange(pairs) + 1) * m - 1]
                if pairs <= 2:
                    # unbatched top merges (the dominant assembly gemms):
                    # call directly so the deflation-aware bucketed
                    # assembly can lax.switch on the alive count
                    # (unsharded) and the O(n2^2) secular temps can be
                    # row-sharded (mesh runs)
                    outs = [
                        _merge_pair(
                            w1[p], q1[p], w2[p], q2[p], betas[p], gap_scale,
                            compact=mesh is None, mesh=mesh,
                        )
                        for p in range(pairs)
                    ]
                    wb_c = jnp.stack([o[0] for o in outs])
                    qb_c = jnp.stack([o[1] for o in outs])
                else:
                    merge = jax.vmap(_merge_pair, in_axes=(0, 0, 0, 0, 0, None))
                    wb_c, qb_c = merge(w1, q1, w2, q2, betas, gap_scale)
                wb_c, qb_c = shard_level(wb_c, qb_c)
                m *= 2
            return wb_c.reshape(sz), qb_c.reshape(sz, sz)

        # binary decomposition of the block count, largest group first
        comps = []
        start = 0
        for bit in reversed(range(nblk.bit_length())):
            size = 1 << bit
            if nblk & size:
                comps.append((start, size))
                start += size
        acc_w = acc_q = None
        for start_blk, size_blk in comps:
            wg, qg = tree(
                wb[start_blk : start_blk + size_blk],
                qb[start_blk : start_blk + size_blk],
                start_blk * leaf,
                size_blk,
            )
            if acc_w is None:
                acc_w, acc_q = wg, shard_block(qg)
            else:
                beta = e_full[start_blk * leaf - 1]
                acc_w, acc_q = _merge_pair(
                    acc_w, acc_q, wg, qg, beta, gap_scale,
                    compact=mesh is None, mesh=mesh,
                )
                acc_q = shard_block(acc_q)

        # padding deflates to eigenvalues >= 4 > Gershgorin(T/scale) <= 3,
        # so after the (already sorted) merge the real pairs come first
        return acc_w[:n] * scale, acc_q[:n, :n]
