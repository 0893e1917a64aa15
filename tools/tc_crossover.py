"""Triangle-count strategy crossover: measure the three TC strategies
(tc_join / tc_arrays / tc_kernel) at increasing graph sizes on
local[32], so the strategy-choice guidance in operators/triangles.py is
backed by a measured crossover instead of extrapolation (r2 verdict
item 4: "add one sf >= 0.3 point for the three TC strategies").

Sizes: the sf0.1 copurchase graph is ~1.2M symmetric edges; the points
below span 4M -> 48M oriented-input edges (>= 3x to 40x the sweep
scale) on the same deterministic power-law generator the scaling
harness uses, so the crossover is read off the same input family.

Each (size, strategy) cell runs in a FRESH JVM via tools/scaling_job.py
(same measurement discipline: ActiveProcessorCount, pre-touched heap,
tmpfs shuffle, one untimed warmup + best-of-reps). Results merge into
BENCH/tc_crossover.json (fastest-of same harness kept, like the
scaling cache); tools/scaling.py appends the table to BENCH/BASELINE.md
when the file exists.

Usage: PYTHONPATH=/root/repo python tools/tc_crossover.py [reps]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from scaling import merge_cell, run_one  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "tc_crossover.json")
CPUS = 32
STRATEGIES = ["tc_join", "tc_arrays", "tc_kernel"]
# (edges, vertices): degree scale held ~constant (E/V ~= 80) so size is
# the only axis; the last point is ~27x the sf0.1 sweep graph
SIZES = [
    (4_000_000, 50_000),
    (16_000_000, 200_000),
    (32_000_000, 400_000),
    # r4 verdict stretch: one >= 64M-edge point pins where the
    # per-task adjacency stops being cache-resident — the rule above
    # 32M was extrapolation until this cell
    (64_000_000, 800_000),
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    prior: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
    for e, v in SIZES:
        key = f"{e}x{v}"
        prior.setdefault(key, {})
        for job in STRATEGIES:
            r = run_one(CPUS, job, e, v, reps)
            prior[key][job] = merge_cell(prior[key].get(job), r)
            print(
                f"{key} {job}: {prior[key][job]['seconds']}s "
                f"(reps {r['reps']})",
                flush=True,
            )
            with open(OUT, "w") as f:
                json.dump(prior, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
