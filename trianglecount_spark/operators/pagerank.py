"""PageRank as iterative DataFrame joins ([EXT], BASELINE.json north_rule).

Power iteration with damping ``alpha``, dangling mass redistributed
uniformly. Uses the *missing-mass closure*: since total rank is 1 every
round, the teleport + dangling term equals whatever mass the edge pass
did not deliver —

    r~(v)  = a * Σ_{u→v} r(u)/outdeg(u)
    r'(v)  = r~(v) + (1 - Σ_v r~(v)) / N

which is algebraically identical to the textbook
``(1-a)/N + a*(contrib + dangling/N)`` form (the undelivered mass is
exactly ``(1-a) + a*dangling``), but needs NO separate dangling-vertex
aggregate — one shuffle join + one hash aggregate per round, with the
closure constant folded back in plan-side as a broadcast 1-row
aggregate (no per-round driver collect on either path).

Physical shape per round:
  - join ranks ⋈ weighted edges on src (1/outdeg folded into the cached
    edge table once, up front; the edge table is hash-partitioned on src
    a single time and reused — only the rank vector shuffles per round),
  - groupBy dst (map-side partial agg),
  - localCheckpoint (lineage truncation; the GraphX-style per-round
    materialization) — the round's ONLY job: the closure constant is a
    broadcast 1-row aggregate whose duplicated subtree dedupes via
    ReusedExchange at execution.

Skewed in-degree (hub pages) lands in the aggregation, not the join —
partial aggregation absorbs it without salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trianglecount_spark.operators.iterative import IterationLog, iterate


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 100,
    check_every: int = 4,
    state_dir: str | None = None,
    resume: bool = False,
    dangling_free: bool = False,
) -> tuple[DataFrame, IterationLog]:
    """PageRank over a *directed* edge table ``src, dst``.

    For reference-parity on the undirected web graph, pass the symmetric
    edge table from ``canonicalize_edges``. Returns (``v, rank``, log);
    ranks sum to 1. ``tol`` is the L1 delta across a ``check_every``-round
    window (conservative vs per-round delta).

    ``dangling_free=True`` asserts every vertex has at least one
    out-edge (always true for a symmetric edge table): the undelivered
    mass is then exactly ``1 - alpha``, so the per-round scalar-sum
    action disappears and each round is a single job (one shuffle join +
    one agg + the checkpoint). Do NOT set it on directed graphs with
    sinks — their teleport share would be silently dropped.
    """
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .cache()
    )
    n = verts.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition("src")
        .cache()
    )
    ew.count()

    init = verts.select("v", F.lit(1.0 / n).alias("rank"))

    def step(ranks: DataFrame, i: int) -> DataFrame:
        contribs = (
            ew.join(ranks.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        if dangling_free:
            # undelivered mass is exactly (1 - alpha): pure plan
            # transform, iterate()'s checkpoint is the round's only job
            return verts.join(contribs, "v", "left").select(
                "v",
                (
                    F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit((1.0 - alpha) / n)
                ).alias("rank"),
            )
        tilde = verts.join(contribs, "v", "left").select(
            "v",
            (F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rt"),
        )
        # undelivered mass stays PLAN-side: a broadcast 1-row aggregate
        # crossJoined back in, instead of a per-round driver collect().
        # ``tilde`` appears twice in the plan but its shuffle exchanges
        # dedupe (ReusedExchange), so iterate()'s checkpoint remains the
        # round's single job with no driver round-trip.
        mass = tilde.agg(
            ((F.lit(1.0) - F.coalesce(F.sum("rt"), F.lit(0.0))) / n).alias("_per_v")
        )
        return tilde.crossJoin(F.broadcast(mass)).select(
            "v", (F.col("rt") + F.col("_per_v")).alias("rank")
        )

    def delta_fn(prev: DataFrame, cur: DataFrame) -> float:
        return (
            cur.join(prev.withColumnRenamed("rank", "prev"), "v")
            .agg(F.coalesce(F.sum(F.abs(F.col("rank") - F.col("prev"))), F.lit(0.0)))
            .collect()[0][0]
        )

    result, log = iterate(
        init,
        step,
        delta_fn,
        max_iter=max_iter,
        tol=tol,
        check_every=check_every,
        state_dir=state_dir,
        resume=resume,
    )
    return result.select("v", F.col("rank").cast("double")), log
