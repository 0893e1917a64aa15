"""Shared driver for iterative DataFrame algorithms (SURVEY.md §4 item 3).

The reference has no iterative algorithms (each CUDA round is a fresh
process); PageRank / CC / LPA are driver-mandated extensions
(BASELINE.json north_rule) and share the same needs:

- lineage truncation: each round's plan references the previous round's;
  ``localCheckpoint`` on check rounds cuts it (on a real cluster use
  ``setCheckpointDir`` + reliable ``checkpoint`` for fault tolerance).
- few actions: between check rounds the plans chain LAZILY — no job is
  launched at all. One materialization + one convergence aggregate per
  ``check_every`` rounds, instead of 2-3 collects per round. At a
  thousand executors, driver round-trips are the scalability ceiling of
  any iterative algorithm; this keeps them at 2/K rounds.
- resumability: optionally persist state to ``state_dir/round=NNN``
  parquet; ``resume`` picks up the latest.
- per-check metrics: deltas / wall time / partition counts — and, with
  ``partition_metrics=True``, per-partition row counts + skew ratio —
  returned as an IterationLog (the per-partition lineage+metrics the
  north_rule asks for); ``log.dump(path)`` writes the JSON.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partition_rows(state: DataFrame) -> dict:
    """Per-partition row counts of a (checkpointed) state DataFrame,
    computed JVM-side: spark_partition_id groupBy collapses each
    partition to ONE row map-side, so the job ships n_partitions rows —
    negligible next to the check round's delta aggregate. Returns the
    skew summary the north_rule's per-partition metrics ask for (a
    1000-executor operator that silently develops a 50x hot partition
    is the failure this line of the log catches), plus the full
    per-partition histogram when it is small enough to store."""
    counts = (
        state.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    rows = {int(r["pid"]): int(r["count"]) for r in counts}
    n = len(rows)
    total = sum(rows.values())
    mx = max(rows.values(), default=0)
    mean = (total / n) if n else 0.0
    out = {
        "n_partitions_nonempty": n,
        "rows_total": total,
        "rows_max_partition": mx,
        "skew_ratio": round(mx / mean, 3) if mean else 0.0,
    }
    # gate on the SPAN (max pid + 1), not the nonempty count: 10
    # nonempty partitions scattered across 4096 total would otherwise
    # write a ~4096-element histogram into every check-round log entry
    if max(rows, default=-1) + 1 <= 256:
        out["rows_per_partition"] = [rows.get(i, 0) for i in range(max(rows, default=-1) + 1)]
    return out


@dataclass
class IterationLog:
    rounds: list[dict] = field(default_factory=list)

    def add(self, **kw) -> None:
        self.rounds.append(kw)

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.rounds, f, indent=1)


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    delta_fn: Callable[[DataFrame, DataFrame], float],
    max_iter: int,
    tol: float = 0.0,
    check_every: int = 4,
    state_dir: str | None = None,
    resume: bool = False,
    log: IterationLog | None = None,
    materialize_every: int = 1,
    partition_metrics: bool = False,
) -> tuple[DataFrame, IterationLog]:
    """Run ``step(state, i) -> new_state`` (pure plan transform, NO
    actions) for up to ``max_iter`` rounds. Every ``check_every`` rounds:
    localCheckpoint the state (the only job launch), evaluate
    ``delta_fn(prev_checked_state, state)`` and stop if ``delta <= tol``.

    Note the convergence test spans ``check_every`` rounds — for
    contraction-style algorithms (PageRank) this is conservative; for
    fixpoint algorithms (min-label, LPA, star-contraction) state equality
    across K rounds implies the fixpoint was reached.
    """
    log = log or IterationLog()
    start_round = 0
    spark = state.sparkSession

    if resume and state_dir:
        # Hadoop-FS listing (sources/fsio.py), not os.listdir: state_dir
        # may be HDFS/S3 under spark-submit — resume must find its
        # rounds on the same filesystem the parquet state lives on
        from trianglecount_spark.sources import fsio

        # only COMPLETE rounds are resumable: mode("overwrite") deletes
        # the target before writing, so a crash mid-checkpoint leaves a
        # partial round=N dir without its _SUCCESS marker — resume must
        # fall back to the next-lower complete round, not silently read
        # half-written state parquet (r4 advisor)
        done = sorted(
            n
            for n in (
                int(d.split("=")[1])
                for d in fsio.list_names(spark, state_dir)
                if d.startswith("round=")
            )
            if fsio.exists(spark, f"{state_dir}/round={n}/_SUCCESS")
        )
        if done:
            start_round = done[-1] + 1
            state = spark.read.parquet(f"{state_dir}/round={done[-1]}")

    state = state.localCheckpoint(eager=True)
    prev_checked = state
    t0 = time.time()
    for i in range(start_round, max_iter):
        state = step(state, i)
        # Materialization cadence. Default (1) is the eager per-round
        # GraphX/GraphFrames design: a step that references its input
        # more than once (PageRank's dangling-mass form; star-
        # contraction's mins + join) would otherwise recompute the chain
        # per reference — lazy chaining across K rounds is 2^K
        # recomputation at runtime and 2^K plan nodes for Catalyst.
        # SINGLE-reference steps (dangling-free PageRank: one join + one
        # agg per round) may set materialize_every > 1: K rounds chain
        # lazily into ONE job of K sequential shuffle stages, amortizing
        # job-launch + checkpoint overhead (measured 2.1x at sf0.1,
        # K=5). Keep K small (≤ ~5) — plan size still grows linearly and
        # Catalyst analysis/codegen goes superlinear well before K=10.
        # Old checkpoint blocks are GC'd by ContextCleaner.
        is_check = (i + 1) % check_every == 0 or i == max_iter - 1
        if (i + 1) % materialize_every == 0 or is_check:
            state = state.localCheckpoint(eager=True)
        if not is_check:
            continue
        if state_dir:
            state.write.mode("overwrite").parquet(f"{state_dir}/round={i}")
        delta = float(delta_fn(prev_checked, state))
        entry = dict(
            round=i,
            delta=delta,
            seconds=round(time.time() - t0, 3),
            partitions=state.rdd.getNumPartitions(),
        )
        if partition_metrics:
            entry.update(_partition_rows(state))
        log.add(**entry)
        t0 = time.time()
        prev_checked = state
        if delta <= tol:
            break
    return state, log
