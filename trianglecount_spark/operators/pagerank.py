"""PageRank as iterative DataFrame joins ([EXT], BASELINE.json north_rule).

Standard power iteration with damping ``alpha`` and dangling-mass
redistribution:

    rank'(v) = (1-a)/N + a * ( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )

Physical shape per round: one shuffle join (ranks ⋈ edges on src — the
out-degree is folded into the edge table once, up front) + one hash
aggregate (groupBy dst). The edge table with weights is cached and
reused every round; only the rank vector moves. Convergence is L1 delta
(allclose-style, tol 1e-6 matches the correctness gate).

Scale notes: at 10^12 edges the join shuffles rank rows to edge
partitions every round — pre-partition both sides on the join key once
(``repartition(k, 'src')`` + cache) so the per-round shuffle is one-sided.
Skewed in-degree (hub pages) is an aggregation, not a join, on dst —
partial aggregation handles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trianglecount_spark.operators.iterative import IterationLog, iterate


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_every: int = 5,
    state_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, IterationLog]:
    """PageRank over a *directed* edge table ``src, dst``.

    For reference-parity on the undirected web graph, pass the symmetric
    edge table from ``canonicalize_edges``. Returns (``v, rank``, log);
    ranks sum to 1.
    """
    spark = edges.sparkSession
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    n = verts.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # Fold 1/outdeg into the edge table once; cache — reused every round.
    ew = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition("src")
        .cache()
    )
    ew.count()
    verts = verts.cache()

    init = verts.select("v", F.lit(1.0 / n).alias("rank"))

    def step(ranks: DataFrame, i: int) -> tuple[DataFrame, float]:
        # dangling vertices have no out-edges → their mass redistributes
        src_ranks = ranks.withColumnRenamed("v", "src")
        dangling = (
            src_ranks.join(outdeg, "src", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            ew.join(src_ranks, "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        base = (1.0 - alpha) / n + alpha * dangling / n
        new_ranks = (
            verts.join(contribs, "v", "left")
            .select(
                "v",
                (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "prev"), "v")
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
            .collect()[0][0]
        )
        return new_ranks, float(delta)

    result, log = iterate(
        init,
        step,
        max_iter=max_iter,
        tol=tol,
        checkpoint_every=checkpoint_every,
        state_dir=state_dir,
        resume=resume,
    )
    return result.select("v", F.col("rank").cast(T.DoubleType())), log
