"""Wall-clock timer backed by the native C component.

Parity with test_driver/wallclock.c (the reference's only non-Fortran
component): a C ``wallclock()`` returning seconds, used by the benchmark
harness. Compiled on first use with the system C compiler and loaded via
ctypes; falls back to ``time.perf_counter`` if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import time

_SRC = pathlib.Path(__file__).resolve().parent.parent / "csrc" / "wallclock.c"
_LIB = _SRC.with_name("libwallclock.so")
_impl = None


def _load():
    global _impl
    if _impl is not None:
        return _impl
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.wallclock.restype = ctypes.c_double
        lib.wallclock.argtypes = []
        _impl = lib.wallclock
    except Exception:  # no compiler / load failure: keep benchmarks runnable
        _impl = time.perf_counter
    return _impl


def wallclock() -> float:
    """Seconds from a monotonic native clock (test_driver/wallclock.c:30-42)."""
    return _load()()
