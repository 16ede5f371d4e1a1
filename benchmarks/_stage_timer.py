"""Shared stage-timer pieces for the per-stage benchmark harnesses
(stages_mixed.py, stages_planar.py).

EIGSOLVE_STAGES_LOOPK=k (k > 1) additionally times a fori_loop of k
stage evaluations inside ONE jit call, amortizing the tunnel's ~28 ms
per-call floor so small-n DEVICE time is attributable (ROADMAP round-4
item: the config-1 ~24 ms device budget is unattributed).  The loop
body perturbs the first argument by i*1e-30 -- numerically a no-op,
but loop-variant so XLA cannot hoist or CSE the k evaluations.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

LOOPK = int(os.environ.get("EIGSOLVE_STAGES_LOOPK", "0"))
_FLOOR_MS = None


def call_floor_ms():
    """Measured host->device->host round-trip floor for a noop jit."""
    global _FLOOR_MS
    if _FLOOR_MS is None:
        noop = jax.jit(lambda x: x + 1.0)
        np.asarray(noop(jnp.float32(0)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(noop(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        _FLOOR_MS = min(ts) * 1e3
    return _FLOOR_MS


def loopk_device_ms(scalar, args, k, rep=3):
    """Per-evaluation device time of `scalar(*args)` from a k-iteration
    in-jit loop, floor-corrected.  `scalar` must reduce the stage output
    to one f32 scalar (device-side checksum; host link is 35 MB/s)."""
    x0, rest = args[0], args[1:]

    def looped(x0, *rest):
        def body(i, acc):
            xp = x0 + (i.astype(jnp.float32) * 1e-30).astype(x0.dtype)
            return acc + scalar(xp, *rest)

        return lax.fori_loop(0, k, body, jnp.float32(0))

    gl = jax.jit(looped)
    np.asarray(gl(x0, *rest))  # compile
    tl = []
    for _ in range(rep):
        t0 = time.perf_counter()
        np.asarray(gl(x0, *rest))
        tl.append(time.perf_counter() - t0)
    return (min(tl) * 1e3 - call_floor_ms()) / k
