"""Pallas TPU hemv: Hermitian matrix-vector product in planar form.

Reference counterpart: zhemv_gpu.F90:33-193, which reads only the stored
upper triangle, keeps split real/imaginary shared-memory tiles
(zhemv_gpu.F90:43-46) and uses an `IGNORE_TKR` trick to atomicAdd the
real and imaginary parts separately (:40-41, :189-191).

TPU re-design: the target TPU stack has no complex dtypes at all, so the
kernel is *planar by construction*: A = Ar + i Ai arrives as two real
arrays (Ar symmetric, Ai antisymmetric, both full-stored), v as an
(n, 2) [vr, vi] pair. Each upper tile (bi <= bj) contributes

    y[bi] += Ar_t v2[bj] + Ai_t (v2[bj] @ ROT)      ROT = [[0,1],[-1,0]]
    y[bj] += Ar_t^T v2[bi] - Ai_t^T (v2[bi] @ ROT)  (mirror: Ar sym, Ai antisym)

-- all MXU work, sequential-grid accumulation, no atomics, 2x less HBM
traffic than a dense planar matvec. Serves the embedded-complex path
and the future planar hetrd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eigensolver_gpu_tpu.ops.symv_pallas import _upper_tile_coords


def _hemv_kernel(bi_ref, bj_ref, ar_ref, ai_ref, v_ref, y_ref):
    t = pl.program_id(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    ar = ar_ref[:, :]
    ai = ai_ref[:, :]
    tsz = ar.shape[0]
    vj = v_ref[pl.ds(bj * tsz, tsz), :]  # (T, 2) = [vr, vi]
    vj_rot = jnp.concatenate([-vj[:, 1:2], vj[:, 0:1]], axis=1)  # (-vi, vr)
    contrib = jnp.dot(ar, vj, preferred_element_type=ar.dtype) + jnp.dot(
        ai, vj_rot, preferred_element_type=ar.dtype
    )
    y_ref[pl.ds(bi * tsz, tsz), :] += contrib

    @pl.when(bi != bj)
    def _():
        vi_ = v_ref[pl.ds(bi * tsz, tsz), :]
        vi_rot = jnp.concatenate([-vi_[:, 1:2], vi_[:, 0:1]], axis=1)
        mirror = jnp.dot(ar.T, vi_, preferred_element_type=ar.dtype) - jnp.dot(
            ai.T, vi_rot, preferred_element_type=ar.dtype
        )
        y_ref[pl.ds(bj * tsz, tsz), :] += mirror


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def hemv_planar(ar, ai, vr, vi, tile=256, interpret=False):
    """y = (Ar + i Ai)(vr + i vi) as planar real arrays -> (yr, yi)."""
    n = ar.shape[0]
    if n % tile != 0:
        raise ValueError(f"hemv requires n % tile == 0, got n={n}, tile={tile}")
    nblk = n // tile
    bi, bj = _upper_tile_coords(nblk)
    ntiles = int(bi.shape[0])
    v2 = jnp.stack([vr, vi], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (tile, tile),
                index_map=lambda t, bi, bj: (bi[t], bj[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, tile),
                index_map=lambda t, bi, bj: (bi[t], bj[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _hemv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 2), ar.dtype),
        interpret=interpret,
    )(bi, bj, ar, ai, v2)
    return out[:, 0], out[:, 1]


def hemv_auto(a_complex, v_complex, tile=256):
    """Convenience complex-in/complex-out wrapper (off-TPU testing)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    yr, yi = hemv_planar(
        a_complex.real,
        a_complex.imag,
        v_complex.real,
        v_complex.imag,
        tile=tile,
        interpret=not on_tpu,
    )
    return yr + 1j * yi
