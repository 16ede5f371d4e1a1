"""Standard symmetric/Hermitian eigensolver with index-range selection.

Pipeline (reference dsyevd_gpu.F90:32-128 / zheevd_gpu.F90:32-130):
tridiagonalize -> tridiagonal eigensolve -> select columns il..iu ->
back-transform. Two deliberate departures from the reference:

* the tridiagonal solve runs ON DEVICE (ops/stedc.py) instead of a host
  LAPACK dstedc/zstedc call across PCIe (dsyevd_gpu.F90:84-108);
* the routine is self-contained: the reference silently assumes the
  generalized driver stashed A's lower triangle in Z and restores it
  (dsyevd_gpu.F90:87-95, "works if called from zhegvd only!") -- here A is
  simply not destroyed (functional semantics).

For Hermitian input the tridiagonal matrix is real; the real stedc output
is cast back to the complex dtype only for the WY back-transform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eigensolver_gpu_tpu.ops.stedc import stedc
from eigensolver_gpu_tpu.ops.sytrd import sytrd
from eigensolver_gpu_tpu.ops.unmtr import unmtr
from eigensolver_gpu_tpu.utils.config import DEFAULT_CONFIG, SolverConfig
from eigensolver_gpu_tpu.utils.kernel_guard import kernel_ok
from eigensolver_gpu_tpu.utils.precision import highest_precision
from eigensolver_gpu_tpu.utils.tracing import trace_range


def _pad_decoupled(a, npad):
    """Embed A in an npad x npad matrix whose extra block is a decoupled
    diagonal strictly above A's spectrum (Gershgorin bound), so the padded
    eigenvalues sort after the real ones and index selection is unchanged."""
    n = a.shape[0]
    if npad == n:
        return a
    bound = jnp.max(jnp.sum(jnp.abs(a), axis=1)).real + 1.0
    k = npad - n
    # tight spacing: the pad values feed stedc's orgnrm scaling, and a
    # bound*(2+arange) ramp inflated fp32 deflation thresholds enough to
    # corrupt interior eigenvalues (distinctness only needs ~2^-8 steps)
    padvals = bound * (2.0 + jnp.arange(k, dtype=bound.dtype) * (1.0 / 256.0))
    out = jnp.zeros((npad, npad), a.dtype)
    out = out.at[:n, :n].set(a)
    out = out.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(
        padvals.astype(a.dtype)
    )
    return out


def _maybe_row_shard(x, mesh):
    """Constrain x to 'tp' row-sharding when a mesh is given (and the
    row count divides evenly); no-op otherwise."""
    if mesh is None or x.shape[0] % mesh.shape["tp"] != 0:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec("tp", None))
    )


def _use_two_stage(n, cfg, iscomplex, compute_is_f64):
    """Whether the two-stage SBR reduction (sbrd + bulge chase) replaces
    the one-stage Householder loop. Complex inputs use the one-stage path
    (the planar complex pipeline has its own fused panel kernel).

    Measured on the target chip (benchmarks/two_stage.py): in emulated
    fp64 the one-stage loop is ALU-bound (n=2048: 1 970 ms) and roughly
    doubles per doubling of n, while the two-stage total grows slower
    (n=2048: 3 115 ms, dominated by the chase whose step cost is
    size-independent) -- the crossover is near n=4096, so 'auto'
    switches for fp64 compute there. In fp32 the phased + aligned-
    grouped Mosaic chase (late round 3) flipped the large-n crossover:
    n=8192 two-stage 334+352+250+52 = 988 ms vs one-stage 1 453; n=4096
    still favors one-stage (330 vs 183, fixed costs dominate). The fp32 switch is
    TPU-only: every other backend runs the XLA fori_loop chase, which
    loses by 3x+ at every size.
    """
    if iscomplex or cfg.tridiag_mode == "one":
        return False
    if cfg.tridiag_mode == "two":
        return True
    if compute_is_f64:
        return n >= cfg.two_stage_min_n
    return n >= 8192 and jax.default_backend() == "tpu"


def _tridiag_reduce(a_p, cfg, two_stage, mesh=None):
    """Reduce symmetric/Hermitian ``a_p`` (padded) to tridiagonal (d, e);
    returns (d, e, back) with ``back(z)`` applying the accumulated
    orthogonal transform Q to tridiagonal eigenvector columns z.

    mesh: optional 'tp' row-sharding for the one-stage path (the
    two-stage chase is latency-bound and runs as-is)."""
    if two_stage:
        from eigensolver_gpu_tpu.ops.sb2st import apply_q2, bulge_chase, dense_to_band
        from eigensolver_gpu_tpu.ops.sbrd import apply_q1, sbrd

        npad = a_p.shape[0]
        ab, vs, ts = sbrd(a_p, band=cfg.band, bucket=512,
                          panel_kernel=mesh is None and cfg.mosaic_kernels)
        band = dense_to_band(ab, cfg.band)
        # Mosaic chase (one kernel for all 3n timesteps, measured 4.6x
        # the XLA fori_loop chase) on fp32 TPU runs; the XLA chase
        # remains for fp64 (no Mosaic fp64) and every non-TPU backend
        # (the kernel only lowers through Mosaic). kernel_ok probes the
        # toolchain once so a Mosaic rejection degrades to the XLA
        # chase instead of failing the solve (VERDICT r4 #4).
        if (band.dtype == jnp.float32 and cfg.mosaic_kernels
                and kernel_ok("chase")):
            import os as _os

            from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_pallas

            # EIGSOLVE_CHASE_BATCH3=1: vmax-batched kernel (one band
            # round trip per 3 timesteps, bit-identical outputs) --
            # queued A/B lever, default off until measured on-chip
            b3 = bool(_os.environ.get("EIGSOLVE_CHASE_BATCH3")) and (
                cfg.band % 8 == 0
            )
            d, e, vt, taut = bulge_chase_pallas(band, cfg.band, batch3=b3)
        else:
            d, e, vt, taut = bulge_chase(band, cfg.band)

        # replay group size: l_win = b+g-1 = 127 fills the MXU tile for
        # fp32; fp64's emulated dot gains nothing from fill, so g=b
        # minimizes qform flops (see utils/config.SolverConfig.replay_g)
        g = cfg.replay_g or (
            3 * cfg.band if ab.dtype == jnp.float32 else cfg.band
        )
        # Mosaic replay (VMEM-resident y; measured 3.7x the XLA replay
        # at n=4096) on fp32 TPU runs; mesh runs keep the XLA replay so
        # the SPMD partitioner can shard the window gemms over columns.
        use_kernel = (
            ab.dtype == jnp.float32
            and cfg.mosaic_kernels
            and mesh is None
            and g % 8 == 0
            and cfg.band % 8 == 0
            and cfg.band + g - 1 <= 128
            and kernel_ok("replay")
        )

        def back(z):
            if use_kernel:
                from eigensolver_gpu_tpu.ops.replay_pallas import apply_q2_pallas

                z2 = apply_q2_pallas(vt, taut, z, npad, cfg.band, g=g)
            else:
                z2 = apply_q2(vt, taut, z, npad, cfg.band, g=g)
            return apply_q1(vs, ts, z2)

        return d, e, back

    a_packed, d, e, tau = sytrd(
        a_p, nb=cfg.nb_tridiag, bucket=256, use_pallas=cfg.use_pallas,
        mesh=mesh,
    )

    def back(z):
        return unmtr(a_packed, tau, z, nb=cfg.nb_back)

    return d, e, back


@highest_precision
@functools.partial(jax.jit, static_argnames=("il", "iu", "cfg", "mesh"))
def syevdx(a, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG, mesh=None):
    """Eigenpairs il..iu (1-based, ascending, LAPACK RANGE='I') of dense
    symmetric/Hermitian ``a``. Returns (w (m,) real, z (n, m)).

    mesh: optional jax.sharding.Mesh with a 'tp' axis -- the dominant
    stages (tridiagonalization panel products, stedc merge gemms, WY
    back-transform, refinement gemms) run with row-sharded operands and
    XLA-inserted ICI collectives (SURVEY.md §5.7 capability extension;
    the reference is single-GPU)."""
    n = a.shape[0]
    if iu is None:
        iu = n
    if not (1 <= il <= iu <= n):
        raise ValueError(f"need 1 <= il <= iu <= n, got il={il}, iu={iu}, n={n}")
    iscomplex = jnp.issubdtype(a.dtype, jnp.complexfloating)

    if cfg.stedc_backend == "xla":
        with trace_range("syevdx_xla"):
            w, z = jnp.linalg.eigh(a)
            return w[il - 1 : iu], z[:, il - 1 : iu]

    is64 = jnp.finfo(jnp.zeros((), a.dtype).real.dtype).bits == 64
    mixed = cfg.compute_dtype == "float32" and is64
    two_stage = _use_two_stage(n, cfg, iscomplex, is64 and not mixed)
    nb = cfg.band if two_stage else cfg.nb_tridiag
    npad = -(-n // nb) * nb
    if two_stage and npad < 3 * cfg.band:
        two_stage = False
        nb = cfg.nb_tridiag
        npad = -(-n // nb) * nb

    if mixed:
        # BASELINE.md config-5 fast path: O(n^3) factorization stages in
        # fp32 on the MXU, then Ogita-Aishima sweeps against the fp64
        # matrix recover fp64 accuracy (ops/refine.py). The fp32
        # pipeline computes the full spectrum (stedc needs it), but
        # refinement runs on the selected block + cluster margin only
        # -- the reference likewise back-transforms only the NZ
        # selected columns (dsyevd_gpu.F90:108,119-128).
        from eigensolver_gpu_tpu.ops.refine import refine_eigh

        lo_dt = jnp.complex64 if iscomplex else jnp.float32
        a_p = _pad_decoupled(a.astype(lo_dt), npad)
        a_p = _maybe_row_shard(a_p, mesh)
        with trace_range("syevdx_fp32"):
            d, e, back = _tridiag_reduce(a_p, cfg, two_stage, mesh=mesh)
            w_all, q_tri = stedc(d, e, leaf=cfg.stedc_leaf, mesh=mesh)
            z_tri = q_tri.astype(lo_dt) if iscomplex else q_tri
            z_tri = _maybe_row_shard(z_tri, mesh)
            x32 = back(z_tri[:, :n])[:n]
        sel0 = max(0, il - 1 - cfg.refine_margin)
        sel1 = min(n, iu + cfg.refine_margin)
        rdt = jnp.zeros((), a.dtype).real.dtype
        w, x = refine_eigh(
            _maybe_row_shard(a, mesh), x32.astype(a.dtype),
            sweeps=cfg.refine_iters,
            chunk=2048 if n >= 8192 else None, mesh=mesh,
            sel=(sel0, sel1 - sel0), w0=w_all[:n].astype(rdt),
            extra_max=cfg.refine_extra_max,
        )
        order = jnp.argsort(w)
        w = w[order]
        x = x[:, order]
        lo = il - 1 - sel0
        return w[lo : lo + (iu - il + 1)], x[:, lo : lo + (iu - il + 1)]

    a_p = _pad_decoupled(a, npad)
    a_p = _maybe_row_shard(a_p, mesh)
    with trace_range("syevdx"):
        d, e, back = _tridiag_reduce(a_p, cfg, two_stage, mesh=mesh)
        w_all, q_tri = stedc(d, e, leaf=cfg.stedc_leaf, mesh=mesh)
        # stedc pads internally and returns npad pairs sorted ascending;
        # our decoupled padding sorts above the true spectrum, so indices
        # il..iu of the first n entries are the requested pairs.
        w = w_all[il - 1 : iu]
        z_tri = q_tri[:, il - 1 : iu]
        if iscomplex:
            z_tri = z_tri.astype(a.dtype)
        z = back(z_tri)
        return w, z[:n]
