"""BASELINE config 5 artifact: the sharded solve at n=16384.

Single chip is out at n=16384 (XLA's plan wants 25.95 GB vs 15.75 GB
HBM, measured round 2). This script demonstrates the 8-way 'tp'-sharded
path at the real size WITHOUT 8 real chips:

1. AOT-lowers and compiles the full mixed-precision generalized solve
   (fp32 two-stage pipeline + selected-range fp64 refinement) at
   n=16384 over an 8-device mesh (virtual CPU devices, same SPMD
   partitioner XLA uses on ICI).
2. Records the compiled per-device memory plan (argument/output/temp
   sizes) -- the "~3.3 GB/chip fits" claim as an XLA number, not
   arithmetic.
3. Greps the optimized HLO for the ICI collectives (all-gather /
   psum / reduce-scatter / collective-permute) that the partitioner
   inserted into the dominant stages.
4. Runs the SAME sharded jit at a CPU-affordable size (n=2048) and
   checks the residual against scipy, so the artifact is an executed
   path, not just a lowered one.

Writes benchmarks/config5_artifact.json and prints a summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from eigensolver_gpu_tpu.parallel.sharded import _sharded_step  # noqa: E402
from eigensolver_gpu_tpu.utils.config import SolverConfig  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("CONFIG5_N", "16384"))
    run_n = int(os.environ.get("CONFIG5_RUN_N", "2048"))
    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("tp",))
    # config 5: mixed-precision, two-stage reduction (the one-stage
    # column loop would issue a collective gemv per column), selected
    # range il=1..iu=n//8 (BASELINE: "lowest eigenpairs at scale")
    cfg = SolverConfig(
        compute_dtype="float32", refine_iters=3, tridiag_mode="two",
        sygst_mode="blocked",
    )
    iu = n // 8

    row = NamedSharding(mesh, P("tp", None))
    a_ty = jax.ShapeDtypeStruct((n, n), jnp.float64, sharding=row)
    b_ty = jax.ShapeDtypeStruct((n, n), jnp.float64, sharding=row)

    t0 = time.time()
    lowered = _sharded_step.lower(a_ty, b_ty, mesh, 1, iu, cfg)
    t_lower = time.time() - t0
    log(f"lowered n={n} iu={iu} in {t_lower:.1f}s")

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    log(f"compiled in {t_compile:.1f}s")

    # --- memory plan ---
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_size_gb": ma.argument_size_in_bytes / 2**30,
            "output_size_gb": ma.output_size_in_bytes / 2**30,
            "temp_size_gb": ma.temp_size_in_bytes / 2**30,
            "generated_code_size_mb": ma.generated_code_size_in_bytes / 2**20,
            "total_per_device_gb": (
                ma.argument_size_in_bytes
                + ma.output_size_in_bytes
                + ma.temp_size_in_bytes
            )
            / 2**30,
        }
        log("memory plan (per device):", json.dumps(mem, indent=2))
    except Exception as e:  # CPU backends may not implement it
        mem = {"error": str(e)}
        log("memory_analysis unavailable:", e)

    # --- collectives in the optimized module ---
    hlo = compiled.as_text()
    colls = {
        op: hlo.count(op)
        for op in (
            "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
            "all-to-all",
        )
    }
    log("collectives in optimized HLO:", colls)

    # --- executed path at CPU-affordable size ---
    exec_res = {}
    if run_n:
        import scipy.linalg

        rng = np.random.default_rng(0)
        t = rng.standard_normal((run_n, run_n))
        a_h = (t + t.T) / 2
        t2 = rng.standard_normal((run_n, run_n))
        b_h = t2 @ t2.T / run_n + np.eye(run_n)
        a = jax.device_put(jnp.asarray(a_h), row)
        b = jax.device_put(jnp.asarray(b_h), row)
        t0 = time.time()
        out = _sharded_step(a, b, mesh, 1, run_n // 8, cfg)
        w = np.asarray(out.w)
        z = np.asarray(out.z)
        t_run = time.time() - t0
        w_ref = scipy.linalg.eigh(a_h, b_h, eigvals_only=True)[: run_n // 8]
        res = float(
            np.abs(a_h @ z - (b_h @ z) * w[None, :]).max()
        )
        exec_res = {
            "run_n": run_n,
            "iu": run_n // 8,
            "info": int(np.asarray(out.info)),
            "max_abs_eigval_err": float(np.abs(w - w_ref).max()),
            "residual": res,
            "wall_s_first": t_run,
        }
        log("executed:", json.dumps(exec_res, indent=2))
        assert exec_res["info"] == 0
        assert exec_res["max_abs_eigval_err"] < 1e-9 * run_n
        assert res < 1e-9 * run_n

    artifact = {
        "config": {
            "n": n, "iu": iu, "mesh": "8-way tp", "mixed": True,
            "tridiag_mode": "two", "replay_g": "auto(96)",
        },
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "memory_per_device": mem,
        "collectives": colls,
        "executed": exec_res,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "config5_artifact.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
