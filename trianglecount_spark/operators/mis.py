"""Maximal independent set — Luby's algorithm with deterministic
priorities ([EXT] distributed-graph primitive).

Luby (1986): each round, every remaining vertex draws a priority; a
vertex joins the MIS iff its priority beats every remaining neighbor's;
winners and their neighborhoods leave the graph. Expected O(log n)
rounds — THE parallel-scheduling / graph-coloring building block.

Spark formulation: priorities are ``md5(salt:round:v)`` — no RNG state,
bit-reproducible on any engine and any partitioning (the same trick as
deterministic walks, operators/walks.py). One round = two semi-joins
(restrict the edge set to remaining vertices), one groupBy-min of the
neighbor priorities (hex strings compare lexicographically — identical
order in the JVM and any SQL engine), one anti-join to shrink the
remaining set. State is two vertex-sized DataFrames; lineage truncated
per round via eager ``localCheckpoint`` exactly like HyperBall.

The reference has no MIS analog (single-purpose triangle kernels,
src/WithPartition/Final_updated_corrected.cu); this is driver-mandated
breadth in the PageRank/CC/LPA family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pri(salt: str, r: int, col: str):
    return F.md5(F.concat_ws(":", F.lit(salt), F.lit(str(r)), F.col(col).cast("string")))


def maximal_independent_set(
    edges: DataFrame,
    max_iter: int = 8,
    salt: str = "mis",
    vertices: DataFrame | None = None,
) -> DataFrame:
    """MIS over a SYMMETRIC simple edge table (src, dst) — rows
    ``(v, round)`` with the Luby round each winner was selected in.
    Isolated vertices win in round 1 (no remaining neighbor to beat).
    Runs at most ``max_iter`` rounds, early-stopping when the remaining
    set empties (one count action per round, like k-core peeling); an
    exact cross-engine oracle must unroll the SAME number of rounds.
    ``vertices`` (one column ``v``) restricts the universe — edges with
    an endpoint outside it are ignored; vertices isolated WITHIN the
    universe still win round 1 (``luby_coloring`` relies on this)."""
    # the loop references `edges` twice per round: pin it so the
    # upstream derivation (often a full canonicalize pipeline) runs
    # once, not once per reference per round
    edges = edges.localCheckpoint(eager=False)
    rem = (
        vertices.select("v")
        if vertices is not None
        else edges.select(F.col("src").alias("v")).unionByName(
            edges.select(F.col("dst").alias("v"))
        )
    ).distinct().localCheckpoint(eager=True)
    # type-generic empty accumulator (vertex ids may be int64 or urls)
    selected = rem.select("v", F.lit(0).cast("int").alias("round")).where(F.lit(False))
    for r in range(1, max_iter + 1):
        er = (
            edges.join(rem.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(rem.withColumnRenamed("v", "dst"), "dst", "left_semi")
        )
        nbr_min = er.groupBy(F.col("src").alias("v")).agg(
            F.min(_pri(salt, r, "dst")).alias("nmin")
        )
        sel = (
            rem.join(nbr_min, "v", "left")
            .where(F.col("nmin").isNull() | (_pri(salt, r, "v") < F.col("nmin")))
            .select("v")
            .localCheckpoint(eager=True)
        )
        selected = selected.unionByName(
            sel.select("v", F.lit(r).cast("int").alias("round"))
        )
        removed = sel.unionByName(
            er.join(sel.withColumnRenamed("v", "src"), "src", "left_semi")
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        rem = rem.join(removed, "v", "left_anti").localCheckpoint(eager=True)
        if rem.limit(1).count() == 0:
            break
    return selected


def luby_coloring(
    edges: DataFrame,
    n_colors: int = 4,
    mis_rounds: int = 4,
    salt: str = "color",
) -> DataFrame:
    """Greedy distributed graph coloring — color class c is a maximal
    independent set of the still-uncolored subgraph (Luby 1986 §5: MIS
    iterated is a (Δ+1)-coloring). Rows ``(v, color)``; the registry/
    scheduling use case only ever needs the first few classes (the
    largest ones), so the color budget is EXPLICIT: vertices left
    uncolored after ``n_colors`` classes are omitted — fixed-budget
    semantics an exact cross-engine oracle can unroll (colors ×
    mis_rounds blocks; exhausted budgets are no-ops on both sides).
    Per-color salts keep the md5 priorities independent across classes.
    State: one vertex-sized remaining set; every step is a semi-join or
    groupBy keyed on vertex id."""
    # one materialization shared by every color's MIS call
    edges = edges.localCheckpoint(eager=False)
    rem = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = rem.select("v", F.lit(0).cast("int").alias("color")).where(F.lit(False))
    for c in range(1, n_colors + 1):
        cls = maximal_independent_set(
            edges, max_iter=mis_rounds, salt=f"{salt}:{c}", vertices=rem
        ).select("v")
        out = out.unionByName(cls.select("v", F.lit(c).cast("int").alias("color")))
        rem = rem.join(cls, "v", "left_anti").localCheckpoint(eager=True)
        if rem.limit(1).count() == 0:
            break
    return out
