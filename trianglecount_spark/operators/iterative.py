"""Shared driver for iterative DataFrame algorithms (SURVEY.md §4 item 3).

The reference has no iterative algorithms (each CUDA round is a fresh
process); PageRank / CC / LPA are driver-mandated extensions
(BASELINE.json north_rule) and share the same needs:

- lineage truncation: each round's plan references the previous round's;
  without truncation the plan grows linearly and the driver OOMs /
  planning dominates. ``localCheckpoint`` every ``checkpoint_every``
  rounds cuts it (on a cluster: ``spark.sparkContext.setCheckpointDir``
  + reliable ``checkpoint`` for resumability).
- resumability: optionally persist the per-round state to
  ``state_dir/round=NNN`` parquet; ``resume`` picks up the latest.
- per-round metrics: row counts / convergence deltas / wall time,
  returned as a list of dicts (the per-partition lineage+metrics JSON
  the north_rule asks for).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class IterationLog:
    rounds: list[dict] = field(default_factory=list)

    def add(self, **kw) -> None:
        self.rounds.append(kw)

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.rounds, f, indent=1)


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], tuple[DataFrame, float]],
    max_iter: int,
    tol: float | None = None,
    checkpoint_every: int = 5,
    state_dir: str | None = None,
    resume: bool = False,
    log: IterationLog | None = None,
) -> tuple[DataFrame, IterationLog]:
    """Run ``step(state, i) -> (new_state, delta)`` until ``delta <= tol``
    or ``max_iter`` rounds. Checkpoints lineage every K rounds; persists
    state to ``state_dir`` when given (and resumes from the newest round
    if ``resume``)."""
    log = log or IterationLog()
    start_round = 0
    spark = state.sparkSession

    if resume and state_dir and os.path.isdir(state_dir):
        done = sorted(
            int(d.split("=")[1])
            for d in os.listdir(state_dir)
            if d.startswith("round=")
        )
        if done:
            start_round = done[-1] + 1
            state = spark.read.parquet(os.path.join(state_dir, f"round={done[-1]}"))

    state = state.localCheckpoint(eager=True)
    for i in range(start_round, max_iter):
        t0 = time.time()
        new_state, delta = step(state, i)
        if (i + 1) % checkpoint_every == 0:
            new_state = new_state.localCheckpoint(eager=True)
            if state_dir:
                new_state.write.mode("overwrite").parquet(
                    os.path.join(state_dir, f"round={i}")
                )
        state = new_state
        log.add(round=i, delta=delta, seconds=round(time.time() - t0, 3),
                partitions=state.rdd.getNumPartitions())
        if tol is not None and delta <= tol:
            break
    return state.localCheckpoint(eager=True), log
