"""HITS (hubs & authorities) over a directed edge table.

Link-graph extension in the spirit of the mandated PageRank/CC/LPA set
(BASELINE.json north_rule: "PySpark-native link-graph analytics
engine"); the reference has no equivalent (its scope is triangle
counting, Final_updated_corrected.cu:57-219), so like
``operators/pagerank.py`` this is driver-mandated breadth, not parity.

Design for exactness and 100 TB scale:

- **Unnormalized exact-integer power iteration.** The classic HITS
  normalizes hub/auth per round (L2), which makes every score a
  summation-order-dependent double — impossible to compare exactly
  across engines or runs. Ranking, however, is invariant under
  positive scaling, so we iterate the raw integer recurrences

      auth_{i}(v) = sum_{u->v} hub_{i-1}(u)
      hub_{i}(u)  = sum_{u->v} auth_{i}(v)

  in decimal(38,0) (Spark) — every intermediate is an exact integer,
  bit-identical on any engine, any partitioning, any executor count.
  Magnitudes grow ~lambda^(2*rounds) (lambda = principal singular
  value of the adjacency matrix); decimal(38,0) holds ~1e38, so even
  lambda ~ 4e4 survives the default 6 rounds. Normalization, if wanted
  for display, is a single final division by max() — not done here so
  the output stays exact.
- **Shape**: per round, two hash-shuffle joins (edges x state) + two
  partial-agg groupBys — identical to one PageRank round; no driver
  collect, no window, no skew beyond the graph's own (hub vertices
  salt-able upstream exactly as for triangle counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def hits(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """``edges(src, dst)`` directed (dedupe/self-loop policy is the
    caller's; pass distinct, loop-free edges for textbook HITS).
    Returns ``(v, hub, auth)`` with exact-integer decimal(38,0) scores
    after ``rounds`` full auth+hub rounds from hub_0 = 1."""
    # the single lazy plan below references `edges` 2*rounds times:
    # pin it so the upstream derivation materializes once
    edges = edges.localCheckpoint(eager=False)
    vset = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    zero = F.lit(0).cast(_DEC)
    # Sparse state: a vertex absent from hub/auth has score 0, and a
    # 0-score vertex contributes nothing through the inner join — so
    # the loop never needs the dense vset left-join (that's 2 joins per
    # round saved); zeros are restored once on output.
    hub = edges.select(F.col("src").alias("v")).distinct().select(
        "v", F.lit(1).cast(_DEC).alias("hub")
    )
    auth = hub.select("v", zero.alias("auth")).limit(0)
    for i in range(rounds):
        auth = (
            edges.join(hub.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("hub").cast(_DEC).alias("auth"))
        )
        if i == rounds - 1:
            # the output plan references auth twice (directly, and
            # inside hub's subtree) — persist the last state so the
            # whole 2*rounds-agg chain isn't evaluated twice
            auth = auth.persist()
        hub = (
            edges.join(auth.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum("auth").cast(_DEC).alias("hub"))
        )
    return (
        vset.join(hub, "v", "left")
        .join(auth, "v", "left")
        .select(
            "v",
            F.coalesce("hub", zero).alias("hub"),
            F.coalesce("auth", zero).alias("auth"),
        )
    )
