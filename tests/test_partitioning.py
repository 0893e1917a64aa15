"""Multilevel k-way partitioner (P3) — determinism, balance, cut
quality vs the hash baseline, and kernel-count invariance under an
external assignment (the reference feeds METIS node-parts into its
subgraph pipeline, Halo_creation_preprocess.py:304-341; here the
assignment is produced in-engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import edges_df
from trianglecount_spark.operators.canonicalize import canonicalize_edges, orient
from trianglecount_spark.operators.triangles import (
    triangle_count_join,
    triangle_count_kernel,
)
from trianglecount_spark.plans.partitioning import (
    edge_cut,
    hash_parts,
    multilevel_partition,
)


def caveman(n_cliques: int = 8, size: int = 12):
    """n dense cliques + one bridge edge between consecutive cliques —
    ground-truth clusters, so a locality-aware partitioner should cut
    ~only bridges while hash cuts ~(1 - 1/k) of ALL edges."""
    pairs = []
    for c in range(n_cliques):
        base = c * size
        pairs += [(base + a, base + b) for a in range(size) for b in range(a + 1, size)]
        if c:
            pairs.append((base - 1, base))
    return pairs


def test_multilevel_deterministic(spark):
    sym = canonicalize_edges(edges_df(spark, caveman()))
    a1 = sorted(map(tuple, multilevel_partition(sym, k=4, coarse_target=24).collect()))
    a2 = sorted(map(tuple, multilevel_partition(sym, k=4, coarse_target=24).collect()))
    assert a1 == a2


def test_multilevel_covers_and_bounds(spark):
    sym = canonicalize_edges(edges_df(spark, caveman()))
    n = sym.select(F.col("src").alias("v")).distinct().count()
    assign = multilevel_partition(sym, k=4, coarse_target=24)
    rows = assign.collect()
    assert len(rows) == n  # every vertex assigned exactly once
    assert {r["part"] for r in rows} <= set(range(4))
    # balance: every part within the slack cap (10% default)
    per = assign.groupBy("part").count().collect()
    cap = 1.10 * n / 4
    assert all(r["count"] <= cap + 1 for r in per)


def test_multilevel_beats_hash_cut(spark):
    sym = canonicalize_edges(edges_df(spark, caveman()))
    assign = multilevel_partition(sym, k=4, coarse_target=24)
    verts = sym.select(F.col("src").alias("v")).distinct()
    cut_ml = edge_cut(sym, assign).collect()[0]
    cut_h = edge_cut(sym, hash_parts(verts, 4)).collect()[0]
    assert cut_ml["total_edges"] == cut_h["total_edges"]
    # 8 cliques of 66 internal edges + 7 bridges; hash cuts ~75% of all
    # edges, the multilevel cut should be a small fraction of that
    assert cut_ml["cut_edges"] < cut_h["cut_edges"] / 3


def test_kernel_count_invariant_under_multilevel_parts(spark):
    sym = canonicalize_edges(edges_df(spark, caveman()))
    oriented = orient(sym)
    expect = triangle_count_join(oriented)
    assign = multilevel_partition(sym, k=4, coarse_target=24)
    got = triangle_count_kernel(oriented, n_parts=4, parts=assign)
    assert got == expect


def test_kernel_partial_assignment_falls_back(spark):
    # an assignment covering only half the vertices must still count
    # correctly (absent anchors take the hash rule)
    sym = canonicalize_edges(edges_df(spark, caveman(4, 8)))
    oriented = orient(sym)
    expect = triangle_count_join(oriented)
    assign = multilevel_partition(sym, k=2, coarse_target=8).where(F.col("v") % 2 == 0)
    got = triangle_count_kernel(oriented, n_parts=2, parts=assign)
    assert got == expect
