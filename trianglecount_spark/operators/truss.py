"""Edge support and k-truss decomposition ([EXT] — the natural step up
from triangle counting).

The reference stops at per-vertex triangle counts (g_sum,
ShareKernelTCV62_update_v1.cu:185); cohesive-subgraph mining on top of
them needs the *per-edge* count (support) and the truss peel, both pure
DataFrame compositions over the same oriented wedge join:

- ``edge_support``: support(e) = number of triangles containing e.
  One triangle enumeration (``triangles_join`` — wedge fan-out bounded
  by the oriented out-degree) + one 3-way corner explode + one hash agg.
  Every step is JVM-side; the only shuffles are keyed on (src, dst).
- ``k_truss``: repeatedly drop edges with support < k−2 until a
  fixpoint. Each round is one support computation + one filter over the
  shrinking edge set, run on the shared ``iterate`` driver (lineage
  truncation, lazy chaining, early stop). Peeling only shrinks the edge
  set, so count stability ⇒ fixpoint, and a fixpoint is stable under
  extra rounds — which is what lets the DuckDB oracle unroll a fixed
  round cap and still agree with the early-stopping engine.

Scale shape: state is |E| rows hash-partitioned on (src, dst);
consecutive rounds re-shuffle on the same keys so AQE reuses exchange
layouts, and the triangle enumeration inside each round inherits the
orientation bound (amortized O(√E) wedge fan-out) — no step holds more
than the wedge stream of the *current* (monotonically shrinking)
subgraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trianglecount_spark.operators.canonicalize import orient
from trianglecount_spark.operators.iterative import IterationLog, iterate
from trianglecount_spark.operators.triangles import triangles_join


def canonical_edges(sym_edges: DataFrame) -> DataFrame:
    """One row per undirected edge, as (src < dst)."""
    return sym_edges.where(F.col("src") < F.col("dst")).select("src", "dst")


def _sym(canon: DataFrame) -> DataFrame:
    return canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def edge_support(sym_edges: DataFrame) -> DataFrame:
    """``src, dst, support`` for every undirected edge (canonical
    src < dst), support = number of triangles through the edge —
    support-0 edges included.

    The triangle set is orientation-independent, so support can be
    counted from the degree-oriented enumeration and folded back to
    canonical (min, max) pairs: each (u ≺ v ≺ w) triangle credits its
    three undirected edges once. Exact integers — the oracle comparison
    needs no rounding."""
    t = triangles_join(orient(sym_edges))
    least = F.least
    greatest = F.greatest
    corners = (
        t.select(least("u", "v").alias("src"), greatest("u", "v").alias("dst"))
        .unionAll(t.select(least("v", "w").alias("src"), greatest("v", "w").alias("dst")))
        .unionAll(t.select(least("u", "w").alias("src"), greatest("u", "w").alias("dst")))
    )
    sup = corners.groupBy("src", "dst").agg(F.count("*").alias("support"))
    return (
        canonical_edges(sym_edges)
        .join(sup, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("support", F.lit(0)).alias("support"))
    )


def k_truss(
    sym_edges: DataFrame, k: int, max_rounds: int = 12
) -> tuple[DataFrame, IterationLog]:
    """The k-truss of a symmetric edge table: the maximal subgraph in
    which every edge lies in ≥ k−2 triangles. Output ``src, dst,
    support`` (canonical src < dst) with support measured *inside* the
    truss.

    ``max_rounds`` caps the peel depth (support cascades are short on
    real graphs — the copurchase graph at sf0.01 converges in 7 rounds
    for k=10); the ``iterate`` driver early-stops at the fixpoint, and
    the fixed-round DuckDB oracle agrees whenever the cap covers the
    true depth."""

    def step(canon: DataFrame, i: int) -> DataFrame:
        sup = edge_support(_sym(canon))
        return sup.where(F.col("support") >= k - 2).select("src", "dst")

    def delta(prev: DataFrame, cur: DataFrame) -> float:
        a = prev.agg(F.count("*")).collect()[0][0]
        b = cur.agg(F.count("*")).collect()[0][0]
        # peeling only shrinks: equal counts ⇒ identical edge sets
        return 0.0 if a == b else 1.0

    state, log = iterate(
        canonical_edges(sym_edges),
        step,
        delta,
        max_iter=max_rounds,
        check_every=2,
    )
    # support measured on the fixpoint subgraph (survivors all have
    # support ≥ k−2 there, so the coalesce-0 arm never fires for k > 2);
    # edge_support's canonical base IS the fixpoint edge set — no
    # re-filter needed
    return edge_support(_sym(state)), log
