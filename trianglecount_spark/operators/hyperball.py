"""HyperBall neighborhood function ([EXT] web-graph analytics).

Boldi & Vigna's HyperBall ("In-Core Computation of Geometric
Centralities with HyperBall: A Hundred Billion Nodes and Beyond",
ICDMW 2013) is THE algorithm for distance distributions / effective
diameter / harmonic centrality on crawl-scale graphs: per vertex keep a
HyperLogLog sketch of the ball ``B(v, t) = {m : dist(v → m) ≤ t}`` and
grow it by max-merging the out-neighbors' sketches each round — the
state is O(V·m) registers, NEVER the reach sets (which are O(V²) on a
small-diameter web graph).

Spark formulation: register state is a long DataFrame ``(v, bucket,
m_j)`` (≤ 256 rows per vertex, only non-empty buckets stored). One round
= one join on the edge key + one (v, bucket) max-agg — two
key-partitioned shuffles, partial aggregation (map-side max combine)
does most of the merging before the wire. ``localCheckpoint`` per round
truncates lineage exactly like the shared iterative driver.

Exactness across engines (the oracle property): registers come from the
portable md5 sketch in ``operators/sketches.py``, and register max-merge
over paths equals registers-of-the-reach-set — so an independent engine
can materialize the exact t-hop reach sets (recursive/unrolled CTEs at
gate scale), sketch them ONCE, and land on bit-identical ``(s_scaled,
estimate)`` values.

The reference has no neighborhood-function analog (single-GPU triangle
kernels, ShareKernelTCV62_update_v1.cu); this is driver-mandated
LLM-pipeline/web-analytics breadth like PageRank/CC/LPA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trianglecount_spark.operators.sketches import hll_estimate, hll_registers


def hyperball_profile(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Per-round neighborhood function: rows ``(v, t, s_scaled)`` for
    t = 0..rounds — the HLL register-sum of ``B(v, t)`` after each
    merge round. This is the distance-distribution / effective-diameter
    profile Boldi & Vigna compute with HyperBall (the estimate is the
    deterministic function ``ALPHA_M2_SCALE / s_scaled`` of the emitted
    integer; keeping the profile all-BIGINT makes it exactly
    cross-engine comparable)."""
    # pinned once: the merge loop references `edges` every round
    edges = edges.localCheckpoint(eager=False)
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    regs = hll_registers(
        verts.select("v", F.col("v").cast("string").alias("val")), "val", keys=["v"]
    ).localCheckpoint(eager=True)
    snaps = [
        hll_estimate(regs, keys=["v"]).select(
            "v", F.lit(0).alias("t"), "s_scaled"
        )
    ]
    for t in range(1, rounds + 1):
        absorbed = edges.join(
            regs.select(F.col("v").alias("dst"), "bucket", "m_j"), "dst"
        ).select(F.col("src").alias("v"), "bucket", "m_j")
        regs = (
            regs.unionByName(absorbed)
            .groupBy("v", "bucket")
            .agg(F.max("m_j").alias("m_j"))
            .localCheckpoint(eager=True)
        )
        snaps.append(
            hll_estimate(regs, keys=["v"]).select(
                "v", F.lit(t).alias("t"), "s_scaled"
            )
        )
    res = snaps[0]
    for df in snaps[1:]:
        res = res.unionByName(df)
    return res


def hyperball(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Per-vertex HLL ball-size after ``rounds`` hops along OUT-edges:
    ``v, s_scaled, estimate`` with estimate ≈ |B(v, rounds)| (v itself
    included). ``edges`` is a directed (src, dst) table; vertex ids may
    be any type castable to string (int64 ids or raw urls)."""
    edges = edges.localCheckpoint(eager=False)
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    regs = hll_registers(
        verts.select("v", F.col("v").cast("string").alias("val")), "val", keys=["v"]
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        absorbed = edges.join(
            regs.select(F.col("v").alias("dst"), "bucket", "m_j"), "dst"
        ).select(F.col("src").alias("v"), "bucket", "m_j")
        regs = (
            regs.unionByName(absorbed)
            .groupBy("v", "bucket")
            .agg(F.max("m_j").alias("m_j"))
            .localCheckpoint(eager=True)
        )
    return hll_estimate(regs, keys=["v"])
