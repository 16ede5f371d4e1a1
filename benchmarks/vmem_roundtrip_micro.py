"""Measure the VMEM dynamic-slice read-modify-write round trip that
dominates the Mosaic bulge chase (benchmarks/chase_micro.py: ~73% of
per-step time).

A trivial kernel loops T steps; each step reads a dynamic (R, L) slice
of a VMEM-resident buffer, adds 1, and writes it back (serialized by
the data dependency, like the chase). Sweeping (R, L) at constant
R*L bytes answers whether the round trip is row-rate bound (time ~ R,
so lane-packing the band would pay) or byte-rate bound (time ~ R*L).

Usage: python benchmarks/vmem_roundtrip_micro.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("EIGSOLVE_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EIGSOLVE_BENCH_PLATFORM"])
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from eigensolver_gpu_tpu.utils.timer import wallclock  # noqa: E402


def _kernel(rows, tb, stride, *refs):
    x_in, x_out = refs
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        x_out[:, :] = x_in[:, :]

    def step(i, carry):
        # dynamic start that wanders like the chase's (+1 every 3 steps)
        start = (g * tb + i) // jnp.int32(3)
        blk = x_out[pl.ds(start, rows), :]
        if stride:
            # the chase's per-slot split: reshape to (slots, stride, w),
            # take the leading-64-row strip, stitch back (relayout cost
            # when stride % 8 != 0)
            s = rows // stride
            w = blk.shape[1]
            blk3 = blk.reshape(s, stride, w)
            strip = blk3[:, :64, :] + jnp.float32(1.0)
            blk = jnp.concatenate([strip, blk3[:, 64:, :]], axis=1).reshape(
                rows, w
            )
        else:
            blk = blk + jnp.float32(1.0)
        x_out[pl.ds(start, rows), :] = blk
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(tb), step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("rows", "steps", "tb", "stride"))
def roundtrip(x, rows, steps, tb=96, stride=0):
    npad = x.shape[0]
    grid = -(-steps // tb)
    const2 = lambda g: (jnp.int32(0), jnp.int32(0))
    out = pl.pallas_call(
        functools.partial(_kernel, rows, tb, stride),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (npad, x.shape[1]), index_map=const2, memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (npad, x.shape[1]), index_map=const2, memory_space=pltpu.VMEM
            )
        ],
        out_shape=[jax.ShapeDtypeStruct(x.shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x)[0]
    return jnp.sum(out[0])


def main():
    steps = 12288
    rng = np.random.default_rng(0)
    # bare round trip at varying row counts (constant ~1 MB bytes), then
    # the chase's per-slot reshape at stride 95 (misaligned re-tiling)
    # vs 96 (aligned)
    cases = [
        (8168, 64, 0),
        (4084, 128, 0),
        (43 * 95, 64, 95),
        (43 * 96, 64, 96),
        (43 * 96, 64, 0),
    ]
    for rows, lanes, stride in cases:
        npad = rows + steps // 3 + 8
        x = jnp.asarray(rng.standard_normal((npad, lanes)), jnp.float32)
        f = lambda x: roundtrip(x, rows, steps, stride=stride)
        tag = f"rows={rows} lanes={lanes} stride={stride}"
        t0 = wallclock()
        np.asarray(f(x))
        print(f"{tag}: first {wallclock()-t0:.1f}s", file=sys.stderr, flush=True)
        times = []
        for _ in range(3):
            t0 = wallclock()
            np.asarray(f(x))
            times.append(wallclock() - t0)
        ms = min(times) * 1e3
        mb = rows * lanes * 4 * 2 / 1e6
        print(
            f"{tag}: {ms:.1f} ms = {ms*1e3/steps:.2f} us/step, "
            f"{mb*steps/ms:.0f} GB/s effective",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
