"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) cannot use a real cluster in this sandbox; per the driver
instructions it is evidenced by running the SAME job on the SAME input
at two parallelism levels — local[8] vs local[32] — in fresh JVMs, and
reporting both throughputs + the efficiency in BENCH/BASELINE.md.

    efficiency(q) = (T_8 / T_32) / (32 / 8)

Input: the deterministic synthetic power-law web graph (see
tools/scaling_job.py for sizing rationale). Physical partitioning is
identical at both levels; only concurrency changes.

Usage: PYTHONPATH=/root/repo python tools/scaling.py [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOBS = ["tc_arrays", "tc_join", "pagerank10", "tc_kernel"]


def run_level(cpus: int, reps: int) -> dict:
    best: dict[str, float] = {}
    for _ in range(reps):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "scaling_job.py"), str(cpus)],
            capture_output=True,
            text=True,
            timeout=3600,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        for k, v in res.items():
            if k in JOBS:
                best[k] = min(best.get(k, float("inf")), v)
            else:
                best[k] = v
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    lo, hi = 8, 32
    r_lo = run_level(lo, reps)
    r_hi = run_level(hi, reps)
    n_tri = r_lo.get("n_triangles", 0)

    lines = [
        "# BENCH/BASELINE — scaling-efficiency evidence (north_rule)",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')}, best of "
        f"{reps} fresh-JVM run(s) per level. In-sandbox stand-in for N vs 4N "
        f"executors: the identical job at `local[{lo}]` vs `local[{hi}]` on the same "
        "input with identical physical partitioning (64 shuffle partitions at both "
        "levels — same plans, same task sets, 4x the concurrent slots). "
        "Driver-sanctioned method; no real cluster available in this sandbox.",
        "",
        "Input: deterministic synthetic power-law web graph "
        f"({r_lo['big_edges']:,} raw edges over {r_lo['big_vertices']:,} vertices → "
        f"{r_lo['n_oriented_edges']:,} oriented edges, {n_tri:,} triangles; "
        f"tc_kernel uses {r_lo['kernel_edges']:,} raw edges — the reference-faithful "
        "per-partition CSR kernel does strictly more data movement per triangle, see "
        "operators/triangles.py). Sized so compute, not job-fixed overhead, dominates "
        "at both levels — the regime the two-cluster criterion constrains; the sf0.1 "
        "driver tables saturate local[32] in seconds and would measure only "
        "scheduler overhead.",
        "",
        "| job | local[8] sec | local[32] sec | speedup | scaling efficiency (/4.0) |",
        "|---|---|---|---|---|",
    ]
    effs = {}
    for q in JOBS:
        sp = r_lo[q] / r_hi[q]
        eff = sp / (hi / lo)
        effs[q] = eff
        lines.append(f"| {q} | {r_lo[q]:.2f} | {r_hi[q]:.2f} | {sp:.2f}x | {eff:.2f} |")
    tput_lo = n_tri / r_lo["tc_arrays"]
    tput_hi = n_tri / r_hi["tc_arrays"]
    lines += [
        "",
        f"Triangle throughput (arrays strategy): {tput_lo:,.0f} tri/s at local[{lo}] → "
        f"{tput_hi:,.0f} tri/s at local[{hi}].",
        f"PageRank: {10 / (r_lo['pagerank10'] / 60):.1f} iters/min at local[{lo}] → "
        f"{10 / (r_hi['pagerank10'] / 60):.1f} iters/min at local[{hi}].",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(
            {
                "local8": r_lo,
                "local32": r_hi,
                "efficiency": {k: round(v, 3) for k, v in effs.items()},
            }
        ),
        "```",
    ]
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
