"""Automatic Mosaic-kernel availability guard (VERDICT r4 #4).

Selection sites used to gate the compiled Mosaic kernels on
``jax.default_backend() == 'tpu'`` alone. A toolchain that rejects one
construct (e.g. ``pltpu.roll(stride=...)``, which the chase's shears
rely on) then failed the WHOLE solve at compile time, recoverable only
by a manual env var (EIGSOLVE_CHASE_LADDER=1). That is the same
fragility as the reference's pinned per-file compiler flags
(lib_eigsolve/Makefile:5-6 "Do not update!") -- the build must instead
survive a toolchain change unattended.

``kernel_ok(name)`` PROBES the named kernel once per process: it
compiles and runs a tiny instance eagerly (persistent compilation cache
makes this sub-second after the first ever run) and memoizes the
verdict. On failure it warns and returns False, and the caller selects
the XLA path -- the solve completes either way.

Env overrides:
  EIGSOLVE_KERNEL_DISABLE=chase,pchol | all   force kernels off
                                              (A/B runs, emergencies)
  EIGSOLVE_KERNEL_FORCE=1   skip the backend==tpu precondition so CPU
                            tests exercise the probe-failure fallback
                            (compiled Pallas raises on CPU, which is
                            exactly a toolchain-rejection signature)

The probe verdict is resolved at TRACE time and memoized per process;
jitted callers bake the choice into their trace (same property as the
existing env-var gates -- a verdict cannot flip mid-process).
"""

from __future__ import annotations

import concurrent.futures
import os
import warnings

import numpy as np

import jax
import jax.numpy as jnp

_VERDICTS: dict[str, bool] = {}


def _run_probe_eagerly(fn):
    """Execute a probe EAGERLY even when kernel_ok() is consulted during
    an outer jit trace. ensure_compile_time_eval is the obvious tool but
    is a trap for Pallas: inside that context the kernel-internal iotas
    and eye() constants evaluate to concrete arrays while the kernel
    function is being traced, so a perfectly valid kernel fails with
    "captures constants" and the guard silently disables it (round-5
    on-chip: the pchol probe failed exactly this way while the kernel
    itself compiled fine). JAX's trace stack is thread-local, so a fresh
    thread is a clean eager context regardless of the caller's."""
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        ex.submit(fn).result()


def _disabled(name: str) -> bool:
    dis = os.environ.get("EIGSOLVE_KERNEL_DISABLE", "")
    if not dis:
        return False
    names = {s.strip() for s in dis.split(",")}
    return "all" in names or name in names


def mosaic_backend() -> bool:
    """True when compiled Pallas would lower through Mosaic here."""
    if os.environ.get("EIGSOLVE_KERNEL_FORCE"):
        return True
    return jax.default_backend() == "tpu"


def kernel_ok(name: str) -> bool:
    """Memoized: the named Mosaic kernel compiles AND runs on this
    toolchain. False on non-TPU backends, when disabled by env, or when
    the tiny probe instance fails to lower/execute."""
    if _disabled(name):
        return False
    if not mosaic_backend():
        return False
    if name not in _VERDICTS:
        try:
            # kernel_ok is consulted at trace time from inside jitted
            # drivers; without isolation the probe's computations would
            # be DEFERRED into the outer jaxpr (no exception fires and
            # the probe vacuously "passes"). A fresh thread forces eager
            # execution -- see _run_probe_eagerly for why NOT
            # ensure_compile_time_eval.
            _run_probe_eagerly(_PROBES[name])
            _VERDICTS[name] = True
        except Exception as e:  # noqa: BLE001 -- any lowering/runtime error
            warnings.warn(
                f"Mosaic kernel '{name}' unavailable on this toolchain "
                f"({type(e).__name__}: {str(e)[:200]}); falling back to the "
                f"XLA path",
                stacklevel=2,
            )
            _VERDICTS[name] = False
    return _VERDICTS[name]


def compiled_unavailable(name: str) -> bool:
    """True only when lowering the named kernel through Mosaic on the
    current backend is KNOWN to fail (Mosaic backend + failed probe).
    For call sites with their own interpret-mode fallback off-TPU
    (symv_auto/hemv_planar_auto/latrd panel): off-TPU behavior is
    unchanged; on TPU a toolchain rejection reroutes to the XLA form."""
    return mosaic_backend() and not kernel_ok(name)


# --- tiny probe instances ------------------------------------------------
# Shapes are the smallest each kernel accepts (mirroring the unit tests);
# every probe builds its own concrete inputs so it executes eagerly even
# when kernel_ok() is consulted during an outer jit trace.


def _probe_strided_roll():
    """The pltpu.roll(stride=1) forms the chase's fast paths use, at
    PRODUCTION-representative geometry, with the results VERIFIED
    against the roll semantics. Round-5 on-chip lesson: compile+run
    success is not enough -- stride=64 lane rolls and stride=chunk-1
    sublane rolls compile on this toolchain and return WRONG data, and
    the old (2, 8, 128)/stride<=7 probe shape accepted strides the
    production (S, 2b, 128) shear shape rejects. Only the stride=1
    directions are used by the kernels (the inverses always ladder);
    this probe pins exactly those."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_shear(x_ref, o_ref):
        # band strip -> window rows: roll lane l of sublane q to l + q
        o_ref[...] = pltpu.roll(x_ref[...], shift=jnp.int32(0), axis=2,
                                stride=1, stride_axis=1)

    def k_sub(x_ref, o_ref):
        # subroll up: roll sublanes of slot s down by shift + s
        o_ref[...] = pltpu.roll(x_ref[...], shift=jnp.int32(5), axis=1,
                                stride=1, stride_axis=0)

    x = jnp.arange(8 * 64 * 128, dtype=jnp.float32).reshape(8, 64, 128)
    got = np.asarray(pl.pallas_call(
        k_shear, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x))
    xn = np.asarray(x)
    exp = np.stack([np.stack([np.roll(xn[s, q], q) for q in range(64)])
                    for s in range(8)])
    if not (got == exp).all():
        raise ValueError("strided lane roll (stride=1) miscompiles")

    y = jnp.arange(4 * 96 * 128, dtype=jnp.float32).reshape(4, 96, 128)
    got = np.asarray(pl.pallas_call(
        k_sub, out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype)
    )(y))
    yn = np.asarray(y)
    exp = np.stack([np.roll(yn[s], 5 + s, axis=0) for s in range(4)])
    if not (got == exp).all():
        raise ValueError("strided sublane roll (stride=1) miscompiles")


def _band96():
    rng = np.random.default_rng(0)
    n, b = 96, 8
    t = rng.standard_normal((n, n)).astype(np.float32)
    a = (t + t.T) / 2
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    from eigensolver_gpu_tpu.ops.sb2st import dense_to_band

    return dense_to_band(jnp.asarray(a * mask, jnp.float32), b), b, n


def _probe_chase():
    from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_pallas

    band, b, _ = _band96()
    jax.block_until_ready(bulge_chase_pallas(band, b, tb=6))


def _probe_chase_planar():
    from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_planar_pallas

    band, b, n = _band96()
    rng = np.random.default_rng(1)
    ti = rng.standard_normal((n, n)).astype(np.float32)
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    from eigensolver_gpu_tpu.ops.sb2st import dense_to_band

    band_i = dense_to_band(jnp.asarray(((ti - ti.T) / 2) * mask, jnp.float32), b)
    jax.block_until_ready(bulge_chase_planar_pallas(band, band_i, b, tb=6))


def _probe_replay():
    from eigensolver_gpu_tpu.ops.replay_pallas import apply_q2_pallas
    from eigensolver_gpu_tpu.ops.sb2st import bulge_chase

    band, b, n = _band96()
    d, e, vt, taut = bulge_chase(band, b)
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    jax.block_until_ready(
        apply_q2_pallas(vt, taut, y, n, b, g=8, m_tile=16)
    )


def _probe_replay_planar():
    from eigensolver_gpu_tpu.ops.replay_pallas import apply_q2_planar_pallas
    from eigensolver_gpu_tpu.ops.sb2st import dense_to_band
    from eigensolver_gpu_tpu.ops.sb2st_planar import bulge_chase_planar

    band, b, n = _band96()
    rng = np.random.default_rng(3)
    ti = rng.standard_normal((n, n)).astype(np.float32)
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    band_i = dense_to_band(jnp.asarray(((ti - ti.T) / 2) * mask, jnp.float32), b)
    d, e, vt, taut = bulge_chase_planar(band, band_i, b)
    yr = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    yi = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    jax.block_until_ready(
        apply_q2_planar_pallas(vt, taut, (yr, yi), n, b, g=8, m_tile=16)
    )


def _probe_replay_resident():
    """The RESIDENT replay staging mechanism (memory_space=ANY y refs +
    manual make_async_copy through single-buffered VMEM scratch), at a
    multi-tile grid, with the result VERIFIED element-wise -- compile
    success alone is not evidence of correctness on this toolchain
    (round-5 strided-roll lesson)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, mt, ntile = 64, 128, 2

    def k(x_ref, o_ref, yv, sem_i, sem_o):
        col0 = pl.program_id(0).astype(jnp.int32) * jnp.int32(mt)
        cp = pltpu.make_async_copy(
            x_ref.at[:, pl.ds(col0, mt)], yv, sem_i
        )
        cp.start()
        cp.wait()
        yv[:, :] = yv[:, :] * 2.0 + 1.0
        cp2 = pltpu.make_async_copy(
            yv, o_ref.at[:, pl.ds(col0, mt)], sem_o
        )
        cp2.start()
        cp2.wait()

    x = jnp.arange(rows * ntile * mt, dtype=jnp.float32).reshape(
        rows, ntile * mt
    )
    got = np.asarray(pl.pallas_call(
        k,
        grid=(ntile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, ntile * mt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, mt), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x))
    if not (got == np.asarray(x) * 2.0 + 1.0).all():
        raise ValueError("resident-y DMA staging miscompiles")


def _probe_ql():
    from eigensolver_gpu_tpu.ops.ql_panel_pallas import ql_panel_pallas

    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.standard_normal((128, 32)).astype(np.float32))
    jax.block_until_ready(ql_panel_pallas(p, 96))


def _probe_ql_planar():
    from eigensolver_gpu_tpu.ops.ql_panel_pallas import ql_panel_planar_pallas

    rng = np.random.default_rng(5)
    p_r = jnp.asarray(rng.standard_normal((128, 32)).astype(np.float32))
    p_i = jnp.asarray(rng.standard_normal((128, 32)).astype(np.float32))
    jax.block_until_ready(ql_panel_planar_pallas(p_r, p_i, 96))


def _probe_pchol():
    from eigensolver_gpu_tpu.ops.pchol_pallas import pchol_block_planar_pallas

    rng = np.random.default_rng(6)
    nb = 128
    tr = rng.standard_normal((nb, nb)).astype(np.float32)
    ti = rng.standard_normal((nb, nb)).astype(np.float32)
    ar = jnp.asarray(tr @ tr.T + ti @ ti.T + nb * np.eye(nb, dtype=np.float32))
    ai = jnp.asarray(ti @ tr.T - tr @ ti.T)
    jax.block_until_ready(pchol_block_planar_pallas(ar, ai))


def _probe_latrd_planar():
    from eigensolver_gpu_tpu.ops.latrd_pallas import latrd_panel_planar

    rng = np.random.default_rng(7)
    # mb=256 -> nsplit=2: exercises the multi-quarter sweep (the mb=128
    # probe had nsplit=1 and missed the round-5 lane-offset rejection)
    mb = 256
    tr = rng.standard_normal((mb, mb)).astype(np.float32)
    ti = rng.standard_normal((mb, mb)).astype(np.float32)
    ar = jnp.asarray((tr + tr.T) / 2)
    ai = jnp.asarray((ti - ti.T) / 2)
    jax.block_until_ready(latrd_panel_planar(ar, ai, mb, nb=32, tile=128))


def _probe_symv():
    from eigensolver_gpu_tpu.ops.symv_pallas import symv

    rng = np.random.default_rng(8)
    n = 256
    t = rng.standard_normal((n, n)).astype(np.float32)
    a = jnp.asarray((t + t.T) / 2)
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    jax.block_until_ready(jax.jit(lambda: symv(a, v, tile=128))())


def _probe_hemv():
    from eigensolver_gpu_tpu.ops.hemv_pallas import hemv_planar

    rng = np.random.default_rng(9)
    n = 256
    tr = rng.standard_normal((n, n)).astype(np.float32)
    ti = rng.standard_normal((n, n)).astype(np.float32)
    ar = jnp.asarray((tr + tr.T) / 2)
    ai = jnp.asarray((ti - ti.T) / 2)
    vr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    jax.block_until_ready(jax.jit(lambda: hemv_planar(ar, ai, vr, vi, tile=128))())


_PROBES = {
    "strided_roll": _probe_strided_roll,
    "chase": _probe_chase,
    "chase_planar": _probe_chase_planar,
    "replay": _probe_replay,
    "replay_planar": _probe_replay_planar,
    "replay_resident": _probe_replay_resident,
    "ql": _probe_ql,
    "ql_planar": _probe_ql_planar,
    "pchol": _probe_pchol,
    "latrd_planar": _probe_latrd_planar,
    "symv": _probe_symv,
    "hemv": _probe_hemv,
}
