"""Bow-tie decomposition of a directed web graph (Broder et al., WWW 2000).

Link-graph extension (north_rule breadth): the reference pipeline is
undirected-only — it symmetrizes before counting
(``Med_dataset/without_part_preprocess.py:193-208``) — so macroscopic
directed structure has no reference analog. Bow-tie is the canonical
whole-web analysis the mined ``(src_url, dst_url)`` table exists for.

Classes (Broder's taxonomy with tubes+tendrils folded into one class —
their membership tests are the same set differences):

  ``core``         — the largest SCC (ties: smallest SCC label);
  ``in``           — reaches CORE but is not in it (backward closure);
  ``out``          — reachable from CORE but not in it (forward closure);
  ``tendril``      — in CORE's weakly connected component but none of the
                     above (includes Broder's tubes: IN→OUT paths that
                     avoid CORE);
  ``disconnected`` — outside CORE's weak component entirely.

Physical shape, 100 TB notes: SCC labels come from FW-BW coloring
(operators/scc.py); the three reachability sets are monotone frontier
BFS closures — each round joins ONLY the newly discovered frontier
against the edge table (shuffle volume per round is O(frontier ·
out-deg), total O(E) across the whole closure, not O(rounds·E)), folds
with a left-anti join, and localCheckpoints to truncate lineage. An
empty frontier is the fixpoint, detected with one count per round.
Classification is four marker left-joins on the vertex key — all
hash-partitioned on ``v``, so AQE coalesces them into one exchange
reuse. No driver-side vertex sets; the only collect is the 1-row
largest-SCC label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trianglecount_spark.operators.scc import strongly_connected_components


def reach_closure(g: DataFrame, seeds: DataFrame, max_rounds: int = 64) -> DataFrame:
    """All vertices reachable from ``seeds`` (inclusive) along
    ``g(src → dst)``. Frontier BFS: round *i* expands only vertices
    first seen in round *i−1*; the visited set only grows, so an empty
    frontier is the fixpoint."""
    state = seeds.select("v").distinct().localCheckpoint(eager=True)
    frontier = state
    for _ in range(max_rounds):
        nxt = (
            frontier.join(g.withColumnRenamed("src", "v"), "v")
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        frontier = nxt.join(state, "v", "left_anti").localCheckpoint(eager=True)
        if frontier.count() == 0:
            break
        state = state.unionByName(frontier).localCheckpoint(eager=True)
    return state


def bowtie(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """``edges(src, dst)`` directed (any orderable vertex type).
    Returns ``(v, cls)`` with cls ∈ {core, in, out, tendril,
    disconnected}."""
    g = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    verts = (
        g.select(F.col("src").alias("v"))
        .unionByName(g.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    scc = strongly_connected_components(g)
    core_label = (
        scc.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("scc").asc())
        .first()["scc"]
    )
    core = (
        scc.where(F.col("scc") == F.lit(core_label))
        .select("v")
        .localCheckpoint(eager=True)
    )

    fwd = reach_closure(g, core, max_rounds)
    bwd = reach_closure(rev, core, max_rounds)
    und = g.unionByName(rev).distinct()
    weak = reach_closure(und, core, max_rounds)

    # v ∈ fwd ∩ bwd ⇒ v is mutually reachable with CORE ⇒ v ∈ CORE, so
    # the in/out branches below never overlap; order is cosmetic.
    return (
        verts.join(core.withColumn("_c", F.lit(1)), "v", "left")
        .join(bwd.withColumn("_b", F.lit(1)), "v", "left")
        .join(fwd.withColumn("_f", F.lit(1)), "v", "left")
        .join(weak.withColumn("_w", F.lit(1)), "v", "left")
        .select(
            "v",
            F.when(F.col("_c") == 1, F.lit("core"))
            .when(F.col("_b") == 1, F.lit("in"))
            .when(F.col("_f") == 1, F.lit("out"))
            .when(F.col("_w") == 1, F.lit("tendril"))
            .otherwise(F.lit("disconnected"))
            .alias("cls"),
        )
    )
