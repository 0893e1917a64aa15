"""Maximal matching — locally-minimal edge selection with deterministic
priorities ([EXT] distributed-graph primitive, the MIS dual).

Each round every remaining edge draws a priority; an edge joins the
matching iff its priority is the strict minimum among ALL edges incident
to either endpoint (a locally-minimal edge — no two such edges can share
a vertex, so the round's winners are vertex-disjoint by construction).
Matched endpoints leave the graph. Expected O(log m) rounds (Israeli &
Itai 1986): at least half the remaining edges are expected to lose an
endpoint per round.

Spark formulation mirrors operators/mis.py: priorities are
``md5(salt:round:src:dst)`` — no RNG state, bit-reproducible on any
engine and partitioning; one round = two groupBy-mins (per-src and
per-dst incident minima), one double equi-join to pick winners, two
anti-joins to drop matched endpoints. State is the remaining edge set;
lineage truncated per round via eager ``localCheckpoint``.

The reference has no matching analog (triangle kernels only,
src/WithPartition/Final_updated_corrected.cu); driver-mandated breadth
in the MIS/LPA primitive family. Use cases: one-round pair
assignment (dedup-merge scheduling, co-location pairing), matching-based
graph coarsening for multilevel partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maximal_matching(
    edges: DataFrame,
    max_iter: int = 8,
    salt: str = "match",
    weight_col: str | None = None,
) -> DataFrame:
    """Maximal matching over a SYMMETRIC simple edge table (src, dst) —
    rows ``(src, dst, round)`` with src < dst, vertex-disjoint, and
    maximal (every unmatched edge shares an endpoint with a matched
    one once the remaining set empties). Runs at most ``max_iter``
    rounds, early-stopping on an empty remainder; an exact cross-engine
    oracle unrolls the SAME rounds (exhausted budgets are no-ops).

    ``weight_col`` switches to HEAVY-EDGE matching (the Metis/Graclus
    coarsening heuristic): the locally-minimal priority becomes
    (max weight, then hash) by prefixing the md5 with the zero-padded
    complement of the weight — string order both engines share, so the
    weighted variant stays exactly oracle-checkable."""
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    rem = (
        edges.where(F.col("src") < F.col("dst"))
        .select(*cols)
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = rem.select(
        "src", "dst", F.lit(0).cast("int").alias("round")
    ).where(F.lit(False))
    for r in range(1, max_iter + 1):
        pri = F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.lit(str(r)),
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
            )
        )
        if weight_col is not None:
            # heavier edge => lexicographically smaller prefix => wins.
            # The complement string only orders correctly for weights in
            # [0, 999999999998] — outside it, fail LOUDLY (inside the
            # used expression, so column pruning can't drop the check)
            w = F.col(weight_col)
            pri = F.when(
                (w >= 0) & (w <= 999999999998),
                F.concat(
                    F.lpad((F.lit(999999999999) - w).cast("string"), 12, "0"),
                    pri,
                ),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("heavy-edge matching weight out of [0, 999999999998]: "),
                        w.cast("string"),
                    )
                )
            )
        e = rem.select("src", "dst", pri.alias("p"))
        # per-VERTEX incident minimum — a vertex appears as src in some
        # remaining edges and dst in others; both roles must compete,
        # else two "winners" could share an endpoint
        inc = e.select(F.col("src").alias("v"), "p").unionByName(
            e.select(F.col("dst").alias("v"), "p")
        )
        vmin = inc.groupBy("v").agg(F.min("p").alias("vm"))
        won = (
            e.join(vmin.select(F.col("v").alias("src"), F.col("vm").alias("vs")), "src")
            .join(vmin.select(F.col("v").alias("dst"), F.col("vm").alias("vd")), "dst")
            .where((F.col("p") == F.col("vs")) & (F.col("p") == F.col("vd")))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(won.select("src", "dst", F.lit(r).cast("int").alias("round")))
        matched = (
            won.select(F.col("src").alias("v"))
            .unionByName(won.select(F.col("dst").alias("v")))
        )
        rem = (
            rem.join(matched.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(matched.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select(*cols)
            .localCheckpoint(eager=True)
        )
        if rem.limit(1).count() == 0:
            break
    return out


def coarsen_by_matching(
    edges: DataFrame, max_iter: int = 8, salt: str = "match"
) -> DataFrame:
    """One multilevel-coarsening step (the Metis/Graclus contraction):
    compute a maximal matching, merge each matched pair into a
    supervertex named by its smaller endpoint, and re-express the graph
    over supervertices — ``(src, dst, weight)`` with src < dst, weight =
    number of original parallel edges collapsed. Halves the vertex set
    (minus unmatched), preserving cut structure — the standard
    preprocessing for partitioning a trillion-edge graph before any
    expensive algorithm runs. Shapes: the matching (see
    ``maximal_matching``), one broadcast-friendly rep-map join per
    endpoint, one (src, dst) partial-agg shuffle."""
    m = maximal_matching(edges, max_iter=max_iter, salt=salt)
    # rep map: both endpoints of a matched edge -> the smaller one
    rep = m.select(F.col("src").alias("v"), F.col("src").alias("rep")).unionByName(
        m.select(F.col("dst").alias("v"), F.col("src").alias("rep"))
    )
    e = (
        edges.where(F.col("src") < F.col("dst"))
        .join(rep.withColumnRenamed("v", "src").withColumnRenamed("rep", "rs"), "src", "left")
        .join(rep.withColumnRenamed("v", "dst").withColumnRenamed("rep", "rd"), "dst", "left")
        .select(
            F.coalesce("rs", F.col("src")).alias("a"),
            F.coalesce("rd", F.col("dst")).alias("b"),
        )
    )
    return (
        e.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("src"),
            F.greatest("a", "b").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
