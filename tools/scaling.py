"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) cannot use a real cluster in this sandbox; per the driver
instructions it is evidenced by running the SAME job on the SAME input
at two parallelism levels — local[8] vs local[32] — in fresh JVMs, and
reporting both throughputs + the efficiency in BENCH/BASELINE.md.

    efficiency(q) = (T_8 / T_32) / (32 / 8)

One fresh JVM per (job, level, rep) measurement — no cross-job GC or
cache residue. Input: the deterministic synthetic power-law web graph
(see tools/scaling_job.py for sizing rationale). Physical partitioning
is identical at both levels; only concurrency changes.

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


def run_one(cpus: int, job: str) -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "scaling_job.py"),
            str(cpus),
            job,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_DRIVER_MEM": "48g"},
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    lo, hi = 8, 32
    results: dict[str, dict[int, dict]] = {}
    for job in JOBS:
        results[job] = {}
        for cpus in (lo, hi):
            best = None
            for _ in range(reps):
                r = run_one(cpus, job)
                if best is None or r["seconds"] < best["seconds"]:
                    best = r
            results[job][cpus] = best
            print(f"{job} local[{cpus}]: {best['seconds']}s", flush=True)

    meta = results["tc_arrays"][lo]
    n_tri = meta.get("n_triangles", 0)
    lines = [
        "# BENCH/BASELINE — scaling-efficiency evidence (north_rule)",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')}, best of "
        f"{reps} fresh-JVM run(s) per (job, level). In-sandbox stand-in for N vs 4N "
        f"executors: the identical job at `local[{lo}]` vs `local[{hi}]` on the same "
        "input with identical physical partitioning (64 shuffle partitions at both "
        "levels — same plans, same task sets, 4x the concurrent slots). "
        "Driver-sanctioned method; no real cluster available in this sandbox.",
        "",
        "Input: deterministic synthetic power-law web graph "
        f"({meta['edges']:,} raw edges over {meta['vertices']:,} vertices → "
        f"{meta.get('n_oriented_edges', 0):,} oriented edges, {n_tri:,} triangles; "
        f"tc_kernel uses {results['tc_kernel'][lo]['edges']:,} raw edges — the "
        "reference-faithful per-partition CSR kernel ships strictly more data per "
        "triangle, see operators/triangles.py). Sized so compute, not job-fixed "
        "overhead, dominates at both levels — the regime the two-cluster criterion "
        "constrains; the sf0.1 driver tables saturate local[32] in seconds and would "
        "measure only scheduler overhead.",
        "",
        "| job | local[8] sec | local[32] sec | speedup | scaling efficiency (/4.0) |",
        "|---|---|---|---|---|",
    ]
    effs = {}
    for q in JOBS:
        t_lo = results[q][lo]["seconds"]
        t_hi = results[q][hi]["seconds"]
        sp = t_lo / t_hi
        eff = sp / (hi / lo)
        effs[q] = eff
        lines.append(f"| {q} | {t_lo:.2f} | {t_hi:.2f} | {sp:.2f}x | {eff:.2f} |")
    t_arr_lo = results["tc_arrays"][lo]["seconds"]
    t_arr_hi = results["tc_arrays"][hi]["seconds"]
    t_pr_lo = results["pagerank10"][lo]["seconds"]
    t_pr_hi = results["pagerank10"][hi]["seconds"]
    lines += [
        "",
        f"Triangle throughput (arrays strategy): {n_tri / t_arr_lo:,.0f} tri/s at "
        f"local[{lo}] → {n_tri / t_arr_hi:,.0f} tri/s at local[{hi}].",
        f"PageRank: {10 / (t_pr_lo / 60):.1f} iters/min at local[{lo}] → "
        f"{10 / (t_pr_hi / 60):.1f} iters/min at local[{hi}].",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(
            {
                "results": {q: {str(c): results[q][c] for c in results[q]} for q in JOBS},
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
