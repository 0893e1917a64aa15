"""Connected components ([EXT], BASELINE.json north_rule).

Two strategies:

- ``connected_components`` — alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): O(log n) rounds on any graph, each round two join+agg
  passes that *shrink* the edge set toward star graphs around component
  minima. This is the 100 TB path — no diameter dependence.

- ``connected_components_minlabel`` — simple synchronous min-label
  propagation, O(diameter) rounds; kept as the cross-check oracle and
  for small graphs.

Both return ``v, comp`` with comp = min vertex id in the component
(every vertex present, including each component's minimum itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trianglecount_spark.operators.iterative import IterationLog, iterate


def _sym(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_every: int = 2,
    state_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, IterationLog]:
    """Large-star/small-star. Input: undirected edge list (any direction,
    self-loops ignored). State between rounds: the shrinking edge set as
    parent links (u, v) with v < u eventually forming stars."""
    state = (
        _sym(edges)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    def large_star(e: DataFrame) -> DataFrame:
        # for each u over symmetric neighborhood: m = min(N(u) ∪ {u});
        # emit (v, m) for v in N(u) with v > u
        s = _sym(e).distinct()
        mins = s.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return (
            s.where(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient edges (max, min); for each u: m = min(N≤(u) ∪ {u});
        # emit (v, m) for v in N≤(u) ∪ {u}
        o = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).where(F.col("src") != F.col("dst")).distinct()
        mins = o.groupBy("src").agg(F.min("dst").alias("m"))
        nbrs = o.join(mins, "src").select(
            F.col("dst").alias("src"), F.col("m").alias("dst")
        )
        selfs = mins.select("src", F.col("m").alias("dst"))
        return nbrs.unionByName(selfs).where(F.col("src") != F.col("dst")).distinct()

    def step(e: DataFrame, i: int) -> tuple[DataFrame, float]:
        new_e = small_star(large_star(e))
        # converged when the (src, max-neighbor... ) edge multiset is stable;
        # cheap proxy: count + checksum of the pair set
        sig_old = e.agg(F.count("*"), F.coalesce(F.sum(F.xxhash64("src", "dst")), F.lit(0))).collect()[0]
        sig_new = new_e.agg(F.count("*"), F.coalesce(F.sum(F.xxhash64("src", "dst")), F.lit(0))).collect()[0]
        delta = 0.0 if tuple(sig_old) == tuple(sig_new) else 1.0
        return new_e, delta

    final_edges, log = iterate(
        state, step, max_iter=max_iter, tol=0.0,
        checkpoint_every=checkpoint_every, state_dir=state_dir, resume=resume,
    )
    # final state: star edges (u → comp_min); add the minima themselves
    comp = final_edges.select(F.col("src").alias("v"), F.col("dst").alias("comp"))
    roots = final_edges.select(F.col("dst").alias("v"), F.col("dst").alias("comp"))
    # isolated-in-input vertices that appeared only in self-loops
    all_v = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    assigned = comp.unionByName(roots).groupBy("v").agg(F.min("comp").alias("comp"))
    result = all_v.join(assigned, "v", "left").select(
        "v", F.coalesce("comp", "v").alias("comp")
    )
    return result, log


def connected_components_minlabel(
    edges: DataFrame, max_iter: int = 100, checkpoint_every: int = 5
) -> tuple[DataFrame, IterationLog]:
    """Synchronous min-label propagation to fixpoint (O(diameter))."""
    sym = _sym(edges).where(F.col("src") != F.col("dst")).distinct().cache()
    all_v = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    init = all_v.select("v", F.col("v").alias("comp"))

    def step(labels: DataFrame, i: int) -> tuple[DataFrame, float]:
        nbr_min = (
            sym.join(labels.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "v", "left")
            .select("v", F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"))
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "prev"), "v")
            .where(F.col("comp") != F.col("prev"))
            .count()
        )
        return new_labels, float(changed)

    return iterate(init, step, max_iter=max_iter, tol=0.0, checkpoint_every=checkpoint_every)
