"""Profiler range annotations -- TPU-native equivalent of the NVTX shim.

The reference wraps every pipeline phase in named/colored NVTX ranges
(lib_eigsolve/toolbox.F90:71-97, hooked at e.g. zhegvdx_gpu.F90:134-168)
and, when enabled, calls ``cudaDeviceSynchronize`` at each range boundary
so ranges measure true device time (toolbox.F90:77,94).

On TPU the equivalents are:
  * ``jax.profiler.TraceAnnotation`` / ``jax.named_scope`` -- labels show
    up in XLA/TensorBoard profiles (the nvprof/Nsight analogue);
  * an opt-in *synchronizing* mode mirroring the reference's
    sync-on-range semantics, implemented with ``block_until_ready`` on a
    tiny sentinel, for coarse host-side phase timing.

Like the reference (compiled out unless -DUSE_NVTX, Makefile:8-9), tracing
is off unless explicitly enabled -- here at runtime instead of compile time.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

_ENABLED = os.environ.get("EIGSOLVE_TRACE", "0") not in ("0", "", "false")
_SYNC = os.environ.get("EIGSOLVE_TRACE_SYNC", "0") not in ("0", "", "false")
_records: list[tuple[str, float]] = []


def enable(sync: bool = False) -> None:
    global _ENABLED, _SYNC
    _ENABLED = True
    _SYNC = sync


def disable() -> None:
    global _ENABLED
    _ENABLED = False


def timings() -> list[tuple[str, float]]:
    """(name, seconds) records collected by synchronizing ranges."""
    return list(_records)


def clear() -> None:
    _records.clear()


@contextlib.contextmanager
def trace_range(name: str):
    """Label a pipeline phase. Inside jit this is a named_scope (pure
    metadata); outside jit with sync mode it also measures device time."""
    if not _ENABLED:
        with jax.named_scope(name):
            yield
        return
    t0 = time.perf_counter() if _SYNC else None
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield
    if _SYNC:
        # Mirror the reference's cudaDeviceSynchronize-on-range-end
        # (toolbox.F90:94): fence so the range brackets device work.
        jax.effects_barrier()
        _records.append((name, time.perf_counter() - t0))
