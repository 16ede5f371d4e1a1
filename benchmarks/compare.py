"""4-way comparison/validation harness.

TPU re-design of the reference's benchmark drivers
(test_driver/test_dsygvdx.F90:73-328, test_zhegvdx.F90:75-305), which
time and cross-validate: CPU LAPACK / MAGMA (optional) / cuSOLVER /
custom. The TPU lineup is:

  1. cpu      : scipy.linalg.eigh(a, b)          (CPU LAPACK oracle)
  2. xla      : jnp.linalg.eigh of U^{-H}AU^{-1} ('vendor library' analogue)
  3. ours-dc  : full native pipeline, fp64 divide & conquer
  4. ours-mp  : fp32 factorization + fp64 Ogita-Aishima refinement

Each case reports wall-time and the BASELINE.md residual
max_k ||A z_k - w_k B z_k|| / (n ||A||) computed ON DEVICE (the tunnel's
host link is too slow for bulk transfers). Accuracy vs the CPU oracle is
printed compare_utils-style (test_driver/toolbox.F90) when n is small
enough to afford the transfer.

Usage: python benchmarks/compare.py [n] [--dtype d|z] [--iu IU]
       [--cases cpu,xla,dc,mp] [--repeat R] [--input FILE.npz]

--input replays a real workload from an .npz with arrays 'a' and 'b'
(the reference's unformatted-file replay mode for Quantum ESPRESSO
matrices, test_dsygvdx.F90:120-145).
"""

from __future__ import annotations

import argparse
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
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from eigensolver_gpu_tpu import SolverConfig  # noqa: E402
from eigensolver_gpu_tpu.models.sygvdx import sygvdx  # noqa: E402
from eigensolver_gpu_tpu.utils.testing import random_hpd_pair, random_spd_pair  # noqa: E402
from eigensolver_gpu_tpu.utils.timer import wallclock  # noqa: E402


def device_residual(a, b, w, z):
    n = a.shape[0]
    r = a @ z - (b @ z) * w[None, :].astype(z.dtype)
    anorm = jnp.max(jnp.sum(jnp.abs(a), axis=1))
    return jnp.max(jnp.sqrt(jnp.sum(jnp.abs(r) ** 2, axis=0))) / (n * anorm)


def run_case(tag, fn, a, b, repeat):
    f = jax.jit(fn)
    t0 = wallclock()
    out = f(a, b)
    wsum = float(np.asarray(out[0]))
    res = float(np.asarray(out[1]))
    t_first = wallclock() - t0
    times = []
    for _ in range(repeat):
        t0 = wallclock()
        np.asarray(f(a, b)[0])
        times.append(wallclock() - t0)
    best = min(times) * 1e3
    print(
        f"  {tag:8s}: {best:10.1f} ms   residual {res:9.3e}   "
        f"(first incl. compile {t_first:.1f}s, wsum {wsum:+.6e})",
        flush=True,
    )
    return best, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=1024)
    ap.add_argument("--dtype", choices=["d", "z"], default="d")
    ap.add_argument("--iu", type=int, default=None)
    ap.add_argument("--cases", default="cpu,xla,dc,mp")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--input", default=None)
    ap.add_argument(
        "--spectrum", choices=["random", "qe"], default="random",
        help="qe = clustered QE-style spectrum (utils/testing.qe_style_pair;"
        " BASELINE config 3's workload shape)",
    )
    args = ap.parse_args()
    if args.input:
        data = np.load(args.input)
        a_h, b_h = data["a"], data["b"]
        n = a_h.shape[0]
        args.dtype = "z" if np.iscomplexobj(a_h) else "d"
    else:
        n = args.n
        if args.spectrum == "qe":
            from eigensolver_gpu_tpu.utils.testing import qe_style_pair

            dt = np.complex128 if args.dtype == "z" else np.float64
            a_h, b_h = qe_style_pair(n, seed=0, dtype=dt)
        elif args.dtype == "z":
            a_h, b_h = random_hpd_pair(n, seed=0)
        else:
            a_h, b_h = random_spd_pair(n, seed=0)
    iu = args.iu or max(n // 4, 1)
    cases = args.cases.split(",")
    print(f"n={n} dtype={'complex128' if args.dtype=='z' else 'float64'} "
          f"il=1 iu={iu} device={jax.devices()[0]}", flush=True)
    need_native = any(c in cases for c in ("xla", "dc", "mp"))
    if need_native:
        # complex dtypes cannot be device_put on the TPU stack; only the
        # complex-native cases need these (zpl/zemb take planar parts)
        a = jnp.asarray(a_h)
        b = jnp.asarray(b_h)

    results = {}
    if "cpu" in cases:
        import scipy.linalg

        t0 = wallclock()
        w_ref, z_ref = scipy.linalg.eigh(a_h, b_h)
        cpu_ms = (wallclock() - t0) * 1e3
        r = a_h @ z_ref[:, :iu] - (b_h @ z_ref[:, :iu]) * w_ref[None, :iu]
        res = np.max(np.linalg.norm(r, axis=0)) / (n * np.max(np.sum(np.abs(a_h), 1)))
        print(f"  {'cpu':8s}: {cpu_ms:10.1f} ms   residual {res:9.3e}   (scipy eigh)",
              flush=True)
        results["cpu"] = (cpu_ms, res)

    def make(cfg):
        def fn(a, b):
            w, z, info = sygvdx(a, b, il=1, iu=iu, cfg=cfg)
            return jnp.sum(w), device_residual(a, b, w, z), info
        return fn

    if "xla" in cases:
        results["xla"] = run_case("xla", make(SolverConfig(stedc_backend="xla")),
                                  a, b, args.repeat)
    if "dc" in cases:
        results["dc"] = run_case("dc", make(SolverConfig()), a, b, args.repeat)
    if "mp" in cases:
        results["mp"] = run_case(
            "mp", make(SolverConfig(compute_dtype="float32", refine_iters=2)),
            a, b, args.repeat)
    if "zpl" in cases and args.dtype == "z":
        # planar (re,im) complex pipeline -- the native on-TPU complex path
        from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar

        parts_p = tuple(jnp.asarray(np.ascontiguousarray(x)) for x in
                        (a_h.real, a_h.imag, b_h.real, b_h.imag))

        def pl_fn(ar, ai, br, bi):
            w, zr, zi, info = zhegvdx_planar(ar, ai, br, bi, il=1, iu=iu)
            rr = ar @ zr - ai @ zi - (br @ zr - bi @ zi) * w[None, :]
            ri = ar @ zi + ai @ zr - (br @ zi + bi @ zr) * w[None, :]
            anorm = jnp.max(jnp.sum(jnp.sqrt(ar * ar + ai * ai), axis=1))
            res = jnp.max(jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=0))) / (n * anorm)
            return jnp.sum(w), res, info

        fpl = jax.jit(pl_fn)
        t0 = wallclock()
        out = fpl(*parts_p)
        wsum = float(np.asarray(out[0]))
        resv = float(np.asarray(out[1]))
        t_first = wallclock() - t0
        times = []
        for _ in range(args.repeat):
            t0 = wallclock()
            np.asarray(fpl(*parts_p)[0])
            times.append(wallclock() - t0)
        best = min(times) * 1e3
        print(f"  {'zpl':8s}: {best:10.1f} ms   residual {resv:9.3e}   "
              f"(first incl. compile {t_first:.1f}s, wsum {wsum:+.6e})", flush=True)
        results["zpl"] = (best, resv)
    if "zemb" in cases and args.dtype == "z":
        # complex via the 2n-real embedding (the on-TPU complex path)
        from eigensolver_gpu_tpu.ops.complex_embed import zhegvdx_embedded

        cfg_emb = SolverConfig()
        parts = tuple(jnp.asarray(x) for x in
                      (a_h.real, a_h.imag, b_h.real, b_h.imag))

        def emb_fn(ar, ai, br, bi):
            w, zr, zi, info = zhegvdx_embedded(ar, ai, br, bi, il=1, iu=iu,
                                               cfg=cfg_emb)
            rr = ar @ zr - ai @ zi - (br @ zr - bi @ zi) * w[None, :]
            ri = ar @ zi + ai @ zr - (br @ zi + bi @ zr) * w[None, :]
            anorm = jnp.max(jnp.sum(jnp.sqrt(ar * ar + ai * ai), axis=1))
            res = jnp.max(jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=0))) / (n * anorm)
            return jnp.sum(w), res, info

        fj = jax.jit(emb_fn)
        t0 = wallclock()
        out = fj(*parts)
        wsum = float(np.asarray(out[0]))
        resv = float(np.asarray(out[1]))
        t_first = wallclock() - t0
        times = []
        for _ in range(args.repeat):
            t0 = wallclock()
            np.asarray(fj(*parts)[0])
            times.append(wallclock() - t0)
        best = min(times) * 1e3
        print(f"  {'zemb':8s}: {best:10.1f} ms   residual {resv:9.3e}   "
              f"(first incl. compile {t_first:.1f}s, wsum {wsum:+.6e})", flush=True)
        results["zemb"] = (best, resv)

    if "cpu" in results:
        base = results["cpu"][0]
        for k, (t, _) in results.items():
            if k != "cpu":
                print(f"  speedup {k} vs cpu: {base / t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
