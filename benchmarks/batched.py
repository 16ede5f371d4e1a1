"""BASELINE.md config 4: batched QE k-point solves (64 x n=1024 zhegvdx).

Usage: python benchmarks/batched.py [batch] [n] [--iu IU] [--mode mp|dc]

Measures the vmapped planar complex pipeline: the per-column sequential
work of all k-point solves executes as one batched MXU op per step, so
the batch amortizes the loop overhead that dominates single solves.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("EIGSOLVE_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EIGSOLVE_BENCH_PLATFORM"])
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from eigensolver_gpu_tpu import SolverConfig  # noqa: E402
from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar_batched  # noqa: E402
from eigensolver_gpu_tpu.utils.testing import random_hpd_pair  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", type=int, nargs="?", default=64)
    ap.add_argument("n", type=int, nargs="?", default=1024)
    ap.add_argument("--iu", type=int, default=None)
    ap.add_argument("--mode", default="mp")
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()
    batch, n = args.batch, args.n
    iu = args.iu or max(n // 8, 1)
    cfg = (
        SolverConfig(compute_dtype="float32", refine_iters=2)
        if args.mode == "mp"
        else SolverConfig()
    )
    print(f"batch={batch} n={n} iu={iu} mode={args.mode} device={jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(0)
    a0, b0 = random_hpd_pair(n, seed=0)
    # batch of perturbed k-point problems (same sparsity of work as QE)
    shifts = rng.uniform(0.5, 1.5, batch)
    ar = np.stack([a0.real * s for s in shifts])
    ai = np.stack([a0.imag * s for s in shifts])
    br = np.broadcast_to(b0.real, (batch, n, n)).copy()
    bi = np.broadcast_to(b0.imag, (batch, n, n)).copy()

    def fn(ar, ai, br, bi):
        w, zr, zi, info = zhegvdx_planar_batched(
            ar, ai, br, bi, il=1, iu=iu, cfg=cfg, chunk=args.chunk)
        return jnp.sum(w), jnp.max(info)

    f = jax.jit(fn)
    argsj = tuple(jnp.asarray(x) for x in (ar, ai, br, bi))
    t0 = time.perf_counter()
    wsum, info = [np.asarray(x) for x in f(*argsj)]
    print(f"first (compile+run): {time.perf_counter()-t0:.1f}s "
          f"wsum={float(wsum):.6e} info={int(info)}", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*argsj)[0])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"steady: {best*1e3:.1f} ms total = {best*1e3/batch:.2f} ms/solve",
          flush=True)


if __name__ == "__main__":
    main()
