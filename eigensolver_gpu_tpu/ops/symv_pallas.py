"""Pallas TPU symv: symmetric matrix-vector product reading only the
upper-triangle tiles.

Reference counterpart: dsymv_gpu.F90:33-150 / zhemv_gpu.F90:33-193 -- the
library's signature kernels ("Do not update" per-file compiler flags,
lib_eigsolve/Makefile:5-6). They read only the stored upper triangle,
mirror the diagonal block through shared memory, reduce with warp
shuffles, and combine partial results with atomicAdd -- because a CUDA
grid has no ordering.

TPU re-design: the upper triangle of an N x N tile grid (N even) is
enumerated by an (N/2, N+1) *rectangular* grid through the classic
row-pairing reflection -- row r is fused with its mirror row N-1-r, so
each rectangle cell maps to exactly one upper tile with pure integer
index arithmetic (no scalar prefetch: the Mosaic lowering of prefetched
index maps is not supported on the target toolchain). Each off-diagonal
tile contributes both A[bi,bj] @ v[bj] to y[bi] and A[bi,bj]^T @ v[bi]
to y[bj]; y lives in VMEM across the sequentially-executed grid, so the
accumulation needs no atomics -- strictly stronger ordering than the
reference's atomicAdd scheme (and bitwise deterministic, fixing the
nondeterminism noted in SURVEY.md §5.2).

HBM traffic: ~n^2/2 elements vs n^2 for a dense gemv -- the same 2x the
reference's kernels exist for. Requires full (mirrored) symmetric
storage -- which ops/sytrd.py maintains -- so diagonal tiles need no
on-the-fly mirroring. Real dtypes; the planar complex twin is
ops/hemv_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri_coords(r, c, nblk):
    """Reflection map: rectangle (r, c) -> upper tile (bi, bj), bi <= bj.

    Row r (tiles (r, r..N-1), count N-r) is fused with mirror row N-1-r
    (count r+1); together they fill a length-(N+1) rectangle row.
    All arithmetic pinned to int32: under jax_enable_x64 the default
    promotion yields i64 index maps, which Mosaic cannot legalize.
    """
    r = jnp.asarray(r, jnp.int32)
    c = jnp.asarray(c, jnp.int32)
    n = jnp.int32(nblk)
    one = jnp.int32(1)
    direct = c < n - r
    bi = jnp.where(direct, r, n - one - r)
    bj = jnp.where(direct, r + c, (n - one - r) + (c - (n - r)))
    return bi.astype(jnp.int32), bj.astype(jnp.int32)


def _symv_kernel(a_ref, v_ref, y_ref):
    r = pl.program_id(0)
    c = pl.program_id(1)
    nblk = 2 * pl.num_programs(0)

    @pl.when((r == 0) & (c == 0))
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    bi, bj = _tri_coords(r, c, nblk)
    tile = a_ref[:, :]
    tsz = tile.shape[0]
    vj = v_ref[pl.ds(bj * tsz, tsz), :]
    # precision=HIGHEST: in-kernel f32 MXU dots default to 1-pass bf16
    # on this toolchain (CLAUDE.md fact 4 applies INSIDE Mosaic too --
    # measured round 5: compiled-vs-interpret diff 1.2e-1 at n=512
    # without it, i.e. ~bf16 eps; interpret mode masks the default)
    y_ref[pl.ds(bi * tsz, tsz), :] += jnp.dot(
        tile, vj, preferred_element_type=tile.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(bi != bj)
    def _():
        vi = v_ref[pl.ds(bi * tsz, tsz), :]
        y_ref[pl.ds(bj * tsz, tsz), :] += jnp.dot(
            tile.T, vi, preferred_element_type=tile.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def symv(a, v, tile=256, interpret=False):
    """y = A @ v for symmetric full-stored A, reading only upper tiles."""
    n = a.shape[0]
    if n % tile != 0 or (n // tile) % 2 != 0:
        raise ValueError(
            f"symv requires n divisible by 2*tile, got n={n}, tile={tile}"
        )
    nblk = n // tile

    grid_spec = pl.GridSpec(
        grid=(nblk // 2, nblk + 1),
        in_specs=[
            pl.BlockSpec(
                (tile, tile),
                index_map=lambda r, c: _tri_coords(r, c, nblk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n, 1), index_map=lambda r, c: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n, 1), index_map=lambda r, c: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _symv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1), a.dtype),
        interpret=interpret,
    )(a, v.reshape(n, 1))
    return out[:, 0]


def symv_auto(a, v, tile=256):
    """symv with interpreter fallback off-TPU (tests run on CPU)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return symv(a, v, tile=tile, interpret=not on_tpu)
