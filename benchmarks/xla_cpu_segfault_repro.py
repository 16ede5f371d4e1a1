"""Minimized repro attempt for the XLA CPU compile segfault (round 4).

Observed failure: a LONG single-process pytest run of the whole suite
segfaults ~2/3 through, inside XLA CPU compile/serialize/deserialize of
the large stedc-family programs (backend_compile_and_load /
(de)serialize_executable frames; both zstd and zlib cache compression,
hot and cold caches; reproduced 4x in round 4). Short targeted runs
never crash -- the trigger is cumulative per-process state.

This script isolates the suspected trigger WITHOUT pytest: one process
repeatedly compiles DISTINCT large stedc/syevdx programs (distinct
shapes so every iteration is a fresh XLA CPU compile + persistent-cache
serialize) until it crashes or completes. Run it under a shell that
reports signals:

    python benchmarks/xla_cpu_segfault_repro.py [iters=40] [cache=1]
    echo "exit: $?"       # 139 = SIGSEGV reproduced

Knobs: second arg 0 disables the persistent cache to split
compile-crash from serialize-crash hypotheses. If this reproduces, the
jaxlib version + this script are the upstream report; if it never does,
the trigger needs the wider op mix of the full suite (record that).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
use_cache = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
if use_cache:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "tests", ".jax_cache_tests", "segfault_repro"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eigensolver_gpu_tpu.models.syevdx import syevdx  # noqa: E402
from eigensolver_gpu_tpu.utils.config import SolverConfig  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    for i in range(iters):
        # distinct (n, leaf, iters) per iteration -> distinct HLO ->
        # fresh compile + cache serialize each time, mimicking the
        # suite's accumulation of large stedc-family executables
        n = 96 + 16 * (i % 12)
        leaf = (8, 16, 32)[i % 3]
        sweeps = 1 + (i % 3)
        t = rng.standard_normal((n, n))
        a = jnp.asarray((t + t.T) / 2)
        cfg = SolverConfig(compute_dtype="float32", refine_iters=sweeps,
                           stedc_leaf=leaf)
        w, z = syevdx(a, il=1, iu=n // 3, cfg=cfg)
        w.block_until_ready()
        print(f"iter {i:3d}: n={n} leaf={leaf} sweeps={sweeps} "
              f"w[0]={float(w[0]):.3f} ok", flush=True)
    print("COMPLETED WITHOUT CRASH -- the minimal stedc-compile loop is "
          "not sufficient; the trigger needs the full suite's op mix.")


if __name__ == "__main__":
    main()
