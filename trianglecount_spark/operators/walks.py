"""Deterministic graph walks + neighbor sampling ([EXT] training-data ops).

Graph-embedding pipelines (DeepWalk, node2vec) and GNN minibatch
training (GraphSAGE) both start from the same two primitives over a
100 TB edge table:

- **random walks**: a length-L walk per seed vertex, emitted as a
  sequence corpus the downstream skip-gram trainer consumes;
- **neighbor sampling**: a bounded-fanout (f1, f2) 2-hop sample per
  seed, the minibatch subgraph loader.

Both are made DETERMINISTIC here by replacing the RNG with a keyed
md5 ranking — the next hop is the neighbor minimizing
``md5(salt:walk:step:cur:nbr)``. At scale this is exactly what you
want anyway (resumable, re-runnable, shardable with no RNG-state
coordination across 1000 executors), and it is what makes an
independent engine able to reproduce the output bit-for-bit: the
DuckDB oracles run the same md5 ranking and land on identical paths.

Plan shape (the 100 TB story):

- each walk step is ONE key-partitioned join (frontier onto edge src)
  + ONE min_by agg on the walk key — the same two shuffle keys every
  round, no driver round-trips, no ``collect``;
- hub vertices cost nothing extra: a frontier row joins a hub's
  adjacency once per walk visiting it, and the min_by partial-aggregates
  map-side before the wire;
- neighbor sampling is a per-key window ``row_number`` over the hash
  order — partitioned by the sample key, never a global window.

The reference has no walk/sampling analog (single-GPU triangle kernels);
this is driver-mandated LLM-training-pipeline breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hop_hash(*cols) -> F.Column:
    return F.md5(F.concat_ws(":", *cols))


def deterministic_walks(
    edges: DataFrame, seeds: DataFrame, length: int, salt: str = "walk"
) -> DataFrame:
    """One length-``length`` walk per seed over directed ``(src, dst)``
    edges: rows ``(walk, step, v)`` with ``walk`` = the seed vertex id,
    steps 0..length. Next hop from ``cur`` at step ``t`` is the neighbor
    minimizing ``md5(salt:walk:t:cur:nbr)``; a walk that reaches a
    vertex with no out-edge simply ends (fewer rows for that walk).

    ``seeds`` is a one-column DataFrame ``(walk,)``."""
    # rename the adjacency columns once — the frontier is itself derived
    # from `edges`, so un-aliased self-join references would be ambiguous
    # — and pin: the step branches reference the adjacency `length` times
    adj = edges.select(
        F.col("src").alias("_es"), F.col("dst").alias("_ed")
    ).localCheckpoint(eager=False)
    state = seeds.select(F.col("walk"), F.col("walk").alias("v"))
    out = [state.select("walk", F.lit(0).alias("step"), "v")]
    for t in range(1, length + 1):
        nxt = (
            state.join(adj, state["v"] == adj["_es"])
            .select(
                "walk",
                F.col("_ed").alias("nbr"),
                _hop_hash(F.lit(salt), "walk", F.lit(t), "_es", "_ed").alias("h"),
            )
            .groupBy("walk")
            .agg(F.min_by("nbr", "h").alias("v"))
        )
        state = nxt
        out.append(state.select("walk", F.lit(t).alias("step"), "v"))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def neighbor_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanout1: int,
    fanout2: int,
    salt: str = "sage",
) -> DataFrame:
    """GraphSAGE-style deterministic 2-hop fanout sample: for each seed,
    the ``fanout1`` neighbors minimizing ``md5(salt:1:seed:nbr)``, and
    for each sampled hop-1 vertex the ``fanout2`` hop-2 neighbors
    minimizing ``md5(salt:2:seed:h1:nbr)``. Rows ``(seed, h1, h2)``;
    hop-1 vertices with no out-edges emit ``h2 = NULL`` so the sampled
    subgraph never silently drops a frontier vertex.

    ``seeds`` is a one-column DataFrame ``(seed,)``."""
    adj = edges.select(
        F.col("src").alias("_es"), F.col("dst").alias("_ed")
    ).localCheckpoint(eager=False)  # referenced by both hops
    h1r = (
        seeds.join(adj, seeds["seed"] == adj["_es"])
        .select(
            "seed",
            F.col("_ed").alias("h1"),
            _hop_hash(F.lit(salt), F.lit(1), "seed", "_ed").alias("h"),
        )
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("seed").orderBy("h"))
        )
        .where(F.col("rn") <= fanout1)
        .select("seed", "h1")
    )
    h2r = (
        h1r.join(adj, h1r["h1"] == adj["_es"], "left")
        .select(
            "seed",
            "h1",
            F.col("_ed").alias("h2"),
            _hop_hash(F.lit(salt), F.lit(2), "seed", "h1", "_ed").alias("h"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("seed", "h1").orderBy("h")),
        )
        .where((F.col("rn") <= fanout2) | F.col("h2").isNull())
        .select("seed", "h1", "h2")
    )
    return h2r
