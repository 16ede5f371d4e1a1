"""Config-5 wall-time model: 8 chips, n=16384, iu=2048 (BASELINE row 5).

Re-derives the RESULTS.md "Config-5 wall-time model" table from measured
single-chip micro-numbers instead of prose arithmetic, so each on-chip
re-measurement (chase_micro, two_stage, stages_planar, bench) updates
the model with one command (VERDICT r4 weak #4 / next #8).

No 8-chip hardware exists in this environment; every row states its
scaling basis explicitly.  Rows marked ``measured`` scale a real
single-chip number; rows marked ``flops``/``latency`` are first-
principles bounds from the measured gemm rates (RESULTS.md round-2
microbenches: f32-'highest' ~25 TF/s/chip, bf16 ~80 TF/s/chip).

Slot-sharding trigger (stated numerically, VERDICT r4 next #8): shard
the replicated bulge chase across chips (cross-chip wavefront pipelining
over ICI) IF AND ONLY IF its modeled share exceeds 50% of config-5
wall.  Below that, Amdahl caps the win under 2x for a stage whose
latency-bound structure replicates for free, and the ICI handoff per
wavefront step (~1 us/hop x 3b steps) erodes most of the remainder.

Usage:
    python benchmarks/config5_model.py                  # current numbers
    python benchmarks/config5_model.py --chase8192-ms 352.3 \
        --sbrd8192-ms 334 --replay8192-ms 250 --stedc4096-ms 95
    python benchmarks/config5_model.py --from-json m.json   # same keys

Reference analogue: the test_driver measures every case on its own
hardware (test_zhegvdx.F90:290-302); config 5 has no such hardware here,
so the model IS the measurement plan and must stay tied to real rows.
"""

import argparse
import json
import math
import sys

N = 16384
IU = 2048
CHIPS = 8

# Measured single-chip micro-numbers the model scales from (defaults =
# latest recorded in RESULTS.md; every one is re-measured by
# benchmarks/run_round5_tpu.sh and should be overridden from its logs).
DEFAULTS = {
    # Mosaic chase totals, one chip (chase_micro.py N full)
    "chase4096_ms": 115.7,
    "chase8192_ms": 352.3,
    # real sbrd dense->band at n=8192 (two_stage.py 8192 stage row)
    "sbrd8192_ms": 334.0,
    # q2 replay onto the n=8192 basis (two_stage.py 8192 stage row)
    "replay8192_ms": 250.0,
    # on-device stedc at n=4096 (stages.py 4096 row)
    "stedc4096_ms": 95.0,
    # fused pcholesky diag-block stage at n=4096 (stages row)
    "chol4096_ms": 61.0,
    # effective 8-chip f32-'highest' gemm rate, TF/s (25/chip x 8)
    "gemm_tf": 200.0,
    # effective refinement MAC rate per chip, TF/s (measured sweep cost)
    "refine_tf_chip": 4.3,
}


def model(m):
    rows = []

    def row(stage, seconds, basis):
        rows.append((stage, seconds, basis))

    # pcholesky + inv(U) build: chol latency chain scales with block
    # count (n/512 blocks, partially overlapped), trinv is log-depth
    # gemms on 8 chips
    chol_s = m["chol4096_ms"] / 1e3 * (N / 4096) * 0.75
    # block-doubling inv(U): ~n^3 MACs total (2n^3 flops), log-depth
    # levels each adding ~10 ms of launch/collective latency
    trinv_s = 2 * N**3 / (m["gemm_tf"] * 1e12) + 0.01 * math.log2(N / 512)
    row(
        "pcholesky + inv(U) build (fp32)",
        chol_s + trinv_s,
        f"chol {m['chol4096_ms']} ms x {N // 4096} block scale (overlap "
        f"0.75) + block-doubling gemms at {m['gemm_tf']} TF/s",
    )

    # phase-2 gemms C = inv^H A inv: 2 full n^3 gemms + ICI all-gathers
    ph2_flops = 2 * 2 * N**3
    row(
        "phase-2 gemms C = inv^H A inv",
        ph2_flops / (m["gemm_tf"] * 1e12) + 0.03,
        f"{ph2_flops / 1e12:.1f} TF at {m['gemm_tf']} TF/s + ~2 GB "
        "all-gathers over ICI",
    )

    # sbrd dense->band: panel gemms shard (x8 flops on 8 chips cancels),
    # the sequential panel-column latency chain replicates
    row(
        "sbrd dense->band (sharded panels)",
        m["sbrd8192_ms"] / 1e3 * (N / 8192) ** 3 / CHIPS + 0.1,
        f"{m['sbrd8192_ms']} ms at n=8192 x (n/8192)^3 / {CHIPS} chips "
        "+ ~0.1 s replicated panel-column latency",
    )

    # bulge chase: replicated (latency-bound). Per-step cost is
    # S-proportional: fit cost ~ c * n^a from the two measured points.
    a = math.log(m["chase8192_ms"] / m["chase4096_ms"]) / math.log(2.0)
    chase_s = m["chase8192_ms"] / 1e3 * (N / 8192) ** a
    row(
        "bulge chase (REPLICATED)",
        chase_s,
        f"{m['chase4096_ms']}/{m['chase8192_ms']} ms at 4096/8192 -> "
        f"n^{a:.2f} scaling (S-proportional per-step cost)",
    )

    # q2 replay onto the full basis (column-sharded): x8 flops / 8 chips
    row(
        "q2 replay (column-sharded)",
        m["replay8192_ms"] / 1e3 * (N / 8192) ** 2 * (N / 8192) / CHIPS,
        f"{m['replay8192_ms']} ms at n=8192, n^3 scaling / {CHIPS}",
    )

    # q1 + stedc: merge gemms shard; secular VPU is row-sharded, ~n^2
    row(
        "q1 + stedc (sharded)",
        m["stedc4096_ms"] / 1e3 * (N / 4096) ** 2 / CHIPS * 2.0,
        f"stedc {m['stedc4096_ms']} ms at n=4096, ~n^2 VPU scaling "
        f"sharded / {CHIPS}, x2 for q1 + merge gemm tails",
    )

    # selected-range refinement: 2 fp32 + 1 ozaki sweep over ms cols
    ms_cols = IU + 64  # padded selected block
    sweep_macs = 5 * N**2 * ms_cols
    row(
        "selected-range refinement (3 sweeps)",
        3 * sweep_macs / (m["refine_tf_chip"] * CHIPS * 1e12),
        f"5n^2 x {ms_cols} MACs/sweep x 3 at "
        f"{m['refine_tf_chip']} TF/s/chip x {CHIPS}",
    )

    # phase-4 gemm z = inv y
    row(
        "phase-4 gemm z = inv y",
        2 * N**2 * ms_cols / (m["gemm_tf"] * 1e12) + 0.02,
        "one (n,n)x(n,ms) gemm + scatter",
    )

    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    for k, v in DEFAULTS.items():
        ap.add_argument(f"--{k.replace('_', '-')}", type=float, default=None)
    ap.add_argument("--from-json", type=str, default=None)
    args = ap.parse_args(argv)

    m = dict(DEFAULTS)
    if args.from_json:
        with open(args.from_json) as f:
            m.update(json.load(f))
    for k in DEFAULTS:
        v = getattr(args, k)
        if v is not None:
            m[k] = v

    rows = model(m)
    total = sum(s for _, s, _ in rows)
    chase_share = next(s for st, s, _ in rows if "chase" in st) / total

    print(f"config-5 model: n={N}, iu={IU}, {CHIPS} chips")
    print(f"{'stage':44s} {'est. s':>7s}  share  basis")
    for stage, s, basis in rows:
        print(f"{stage:44s} {s:7.2f}  {s / total:5.1%}  {basis}")
    print(f"{'TOTAL':44s} {total:7.2f}")
    trigger = chase_share > 0.50
    print(
        f"\nslot-sharding trigger: chase share {chase_share:.1%} "
        f"{'>' if trigger else '<='} 50% -> "
        f"{'SHARD the chase (cross-chip wavefront pipelining)' if trigger else 'keep the chase replicated'}"
    )
    print(
        json.dumps(
            {
                "total_s": round(total, 3),
                "chase_share": round(chase_share, 4),
                "shard_chase": trigger,
                "inputs": m,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
