"""Per-query timing sweep over every registered ``queries()`` entry.

Writes/merges ``BENCH/sweep_sf01.json``: one ``{"sec": .., "rows": ..}``
cell per query (or ``{"sec": .., "error": ..}`` on failure). Existing good
cells are kept unless ``--force``; failed cells always re-run, so the tool
is resumable after a crash. Run from anywhere — the session builder pins
the repo on the workers' PYTHONPATH.

Usage:
    python tools/sweep.py [--sf /root/testdata/sf0.1] [--force|--min] [only ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from trianglecount_spark.session import get_spark  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "sweep_sf01.json")


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    force = False
    keep_min = False
    only: set[str] = set()
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            i += 1
            sf_dir = argv[i]
        elif a == "--force":
            force = True
        elif a == "--min":
            # noise-refresh mode: re-run cells but keep the FASTER of
            # (old, new) — the scaling.py merge discipline (external
            # load only ever inflates a single-shot cell). Use --force
            # instead when the query implementation changed.
            keep_min = True
        else:
            only.add(a)
        i += 1

    cells: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            cells = json.load(f)

    spark = get_spark(app_name="sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # One UNTIMED warmup before any timed cell: JVM JIT, Arrow exchange,
    # and the Python worker pool otherwise land inside the FIRST timed
    # cells (r2 showed a 30s-sweep vs 5.2s-bench split on
    # triangle_total_kernel that was pure cold-start, masking real
    # regressions). The kernel query at sf0.001 touches every runtime
    # path (scan, shuffle joins, applyInArrow, agg) in ~seconds.
    try:
        warm = qs.get("triangle_total_kernel") or next(iter(qs.values()))
        warm(spark, sf_dir.replace("sf0.1", "sf0.001")).count()
    except Exception:  # noqa: BLE001 — warmup must never block the sweep
        pass
    for name in sorted(qs):
        if only and name not in only:
            continue
        prior = cells.get(name)
        if prior and "rows" in prior and not (force or keep_min):
            continue
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            new = {"sec": round(time.time() - t0, 2), "rows": n}
            if keep_min and prior and prior.get("rows") == n and prior["sec"] < new["sec"]:
                new = prior
            cells[name] = new
            print(f"{name:30s} {cells[name]['sec']:8.2f}s  {n} rows", flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping, record the cell
            cells[name] = {
                "sec": round(time.time() - t0, 2),
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }
            print(f"{name:30s} ERROR {cells[name]['error'][:80]}", flush=True)
        # Drop per-query temp state so 150+ queries don't accumulate memory.
        spark.catalog.clearCache()
        with open(OUT, "w") as f:
            json.dump(cells, f, indent=1, sort_keys=True)

    # Stale cells for queries that no longer exist confuse the report.
    stale = [k for k in cells if k not in qs]
    for k in stale:
        del cells[k]
    with open(OUT, "w") as f:
        json.dump(cells, f, indent=1, sort_keys=True)
    errs = {k: v for k, v in cells.items() if "error" in v}
    print(f"SWEEP DONE {len(cells)} cells, {len(errs)} errors")
    for k in sorted(errs):
        print("  ERR", k)


if __name__ == "__main__":
    main()
