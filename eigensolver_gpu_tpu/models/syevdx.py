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
    padvals = bound * (2.0 + jnp.arange(k, dtype=bound.dtype))
    out = jnp.zeros((npad, npad), a.dtype)
    out = out.at[:n, :n].set(a)
    out = out.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(
        padvals.astype(a.dtype)
    )
    return out


@highest_precision
@functools.partial(jax.jit, static_argnames=("il", "iu", "cfg"))
def syevdx(a, il=1, iu=None, cfg: SolverConfig = DEFAULT_CONFIG):
    """Eigenpairs il..iu (1-based, ascending, LAPACK RANGE='I') of dense
    symmetric/Hermitian ``a``. Returns (w (m,) real, z (n, m))."""
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

    nb = cfg.nb_tridiag
    npad = -(-n // nb) * nb

    mixed = (
        cfg.compute_dtype == "float32"
        and jnp.finfo(jnp.zeros((), a.dtype).real.dtype).bits == 64
    )
    if mixed:
        # BASELINE.md config-5 fast path: O(n^3) factorization stages in
        # fp32 on the MXU, then Ogita-Aishima sweeps against the fp64
        # matrix recover fp64 accuracy (ops/refine.py). Needs the full
        # spectrum, so selection happens after refinement.
        from eigensolver_gpu_tpu.ops.refine import refine_eigh

        lo_dt = jnp.complex64 if iscomplex else jnp.float32
        a_p = _pad_decoupled(a.astype(lo_dt), npad)
        with trace_range("syevdx_fp32"):
            a_packed, d, e, tau = sytrd(a_p, nb=nb, bucket=256, use_pallas=cfg.use_pallas)
            w_all, q_tri = stedc(d, e, leaf=cfg.stedc_leaf)
            z_tri = q_tri.astype(lo_dt) if iscomplex else q_tri
            x32 = unmtr(a_packed, tau, z_tri[:, :n], nb=cfg.nb_back)[:n]
        w, x = refine_eigh(
            a, x32.astype(a.dtype), sweeps=cfg.refine_iters,
            chunk=2048 if n >= 8192 else None,
        )
        order = jnp.argsort(w)
        w = w[order]
        x = x[:, order]
        return w[il - 1 : iu], x[:, il - 1 : iu]

    a_p = _pad_decoupled(a, npad)
    with trace_range("syevdx"):
        a_packed, d, e, tau = sytrd(a_p, nb=nb, bucket=256, use_pallas=cfg.use_pallas)
        w_all, q_tri = stedc(d, e, leaf=cfg.stedc_leaf)
        # stedc pads internally and returns npad pairs sorted ascending;
        # our decoupled padding sorts above the true spectrum, so indices
        # il..iu of the first n entries are the requested pairs.
        w = w_all[il - 1 : iu]
        z_tri = q_tri[:, il - 1 : iu]
        if iscomplex:
            z_tri = z_tri.astype(a.dtype)
        z = unmtr(a_packed, tau, z_tri, nb=cfg.nb_back)
        return w, z[:n]
