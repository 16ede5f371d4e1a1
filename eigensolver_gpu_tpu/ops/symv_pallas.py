"""Pallas TPU symv: symmetric matrix-vector product reading only the
upper-triangle tiles.

Reference counterpart: dsymv_gpu.F90:33-150 / zhemv_gpu.F90:33-193 -- the
library's signature kernels ("Do not update" per-file compiler flags,
lib_eigsolve/Makefile:5-6). They read only the stored upper triangle,
mirror the diagonal block through shared memory, reduce with warp
shuffles, and combine partial results with atomicAdd -- because a CUDA
grid has no ordering.

TPU re-design: the grid iterates over the T(T+1)/2 upper tiles via
scalar-prefetched (bi, bj) coordinate lists; each off-diagonal tile
contributes both A[bi,bj] @ v[bj] to y[bi] and A[bi,bj]^T @ v[bi] to
y[bj]. The whole y vector lives in VMEM across grid steps, and because a
Pallas TPU grid executes *sequentially*, the accumulation needs no
atomics at all -- strictly stronger ordering than the reference's
atomicAdd scheme (and bitwise deterministic, fixing the reference's
nondeterminism noted in SURVEY.md §5.2).

HBM traffic: (n^2/2 + n T) elements vs n^2 for a dense gemv -- the same
2x the reference's kernels exist for.

Requires full (mirrored) symmetric storage -- which ops/sytrd.py
maintains -- so the diagonal tiles need no on-the-fly mirroring.
Real dtypes only (complex falls back to jnp matvec; hemv kernel is on
the roadmap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _upper_tile_coords(nblk):
    bi, bj = np.triu_indices(nblk)
    return jnp.asarray(bi, jnp.int32), jnp.asarray(bj, jnp.int32)


def _symv_kernel(bi_ref, bj_ref, a_ref, v_ref, y_ref):
    t = pl.program_id(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    tile = a_ref[:, :]  # (T, T) upper tile (bi, bj)
    tsz = tile.shape[0]
    vj = v_ref[pl.ds(bj * tsz, tsz), :]
    contrib_i = jnp.dot(tile, vj, preferred_element_type=tile.dtype)
    y_ref[pl.ds(bi * tsz, tsz), :] += contrib_i

    @pl.when(bi != bj)
    def _():
        vi = v_ref[pl.ds(bi * tsz, tsz), :]
        contrib_j = jnp.dot(tile.T, vi, preferred_element_type=tile.dtype)
        y_ref[pl.ds(bj * tsz, tsz), :] += contrib_j


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def symv(a, v, tile=256, interpret=False):
    """y = A @ v for symmetric full-stored A, reading only upper tiles."""
    n = a.shape[0]
    if n % tile != 0:
        raise ValueError(f"symv requires n % tile == 0, got n={n}, tile={tile}")
    nblk = n // tile
    bi, bj = _upper_tile_coords(nblk)
    ntiles = int(bi.shape[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (tile, tile),
                index_map=lambda t, bi, bj: (bi[t], bj[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole v
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # whole y
    )
    out = pl.pallas_call(
        _symv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1), a.dtype),
        interpret=interpret,
    )(bi, bj, a, v.reshape(n, 1))
    return out[:, 0]


def symv_auto(a, v, tile=256):
    """symv with interpreter fallback off-TPU (tests run on CPU)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return symv(a, v, tile=tile, interpret=not on_tpu)
