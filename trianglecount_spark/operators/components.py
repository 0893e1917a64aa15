"""Connected components ([EXT], BASELINE.json north_rule).

Two strategies:

- ``connected_components`` — alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): O(log n) rounds on any graph; each round is two join+agg
  passes that *shrink* the edge set toward star graphs rooted at
  component minima. No diameter dependence — the 100 TB path for web
  graphs whose components can be deep.

- ``connected_components_minlabel`` — synchronous min-label propagation,
  O(diameter) rounds; kept as a cross-check and for shallow graphs.

Both return ``v, comp`` with comp = min vertex id in the component
(every vertex of the input present, including each component minimum).
Convergence is detected by state-equality across a check window
(fixpoint ⇒ equality is exact, see iterative.iterate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trianglecount_spark.operators.iterative import IterationLog, iterate


def _sym(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _sig_delta(prev: DataFrame, cur: DataFrame) -> float:
    """0.0 iff the two edge/label sets are identical (count + hash sum)."""
    def sig(df: DataFrame):
        cols = df.columns
        # bit_xor is order-insensitive and cannot overflow (ANSI mode safe)
        return tuple(
            df.agg(
                F.count("*"),
                F.coalesce(F.expr(f"bit_xor(xxhash64({', '.join(cols)}))"), F.lit(0)),
            ).collect()[0]
        )

    return 0.0 if sig(prev) == sig(cur) else 1.0


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    check_every: int = 2,
    state_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, IterationLog]:
    """Large-star/small-star. Input: undirected edge list (any direction;
    self-loops ignored). Iterated state: the shrinking parent-link edge
    set, converging to stars (u → component min)."""
    state = _sym(edges).where(F.col("src") != F.col("dst")).distinct()

    def large_star(e: DataFrame) -> DataFrame:
        # for each u over the symmetric neighborhood: m = min(N(u) ∪ {u});
        # emit (v, m) for v ∈ N(u) with v > u
        s = _sym(e).distinct()
        mins = s.groupBy("src").agg(F.least(F.min("dst"), F.col("src")).alias("m"))
        return (
            s.where(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient (max, min); for each u: m = min(N≤(u)); emit (v, m) for
        # v ∈ N≤(u) ∪ {u}, dropping self-links
        o = (
            e.select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        mins = o.groupBy("src").agg(F.min("dst").alias("m"))
        nbrs = o.join(mins, "src").select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        selfs = mins.select("src", F.col("m").alias("dst"))
        return nbrs.unionByName(selfs).where(F.col("src") != F.col("dst")).distinct()

    def step(e: DataFrame, i: int) -> DataFrame:
        return small_star(large_star(e))

    final_edges, log = iterate(
        state,
        step,
        _sig_delta,
        max_iter=max_iter,
        tol=0.0,
        check_every=check_every,
        state_dir=state_dir,
        resume=resume,
    )
    # converged state: star edges (u → comp_min); add the roots themselves
    comp = final_edges.select(F.col("src").alias("v"), F.col("dst").alias("comp"))
    roots = final_edges.select(F.col("dst").alias("v"), F.col("dst").alias("comp"))
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
    edges: DataFrame,
    max_iter: int = 100,
    check_every: int = 4,
) -> tuple[DataFrame, IterationLog]:
    """Synchronous min-label propagation to fixpoint (O(diameter))."""
    sym = _sym(edges).where(F.col("src") != F.col("dst")).distinct().cache()
    all_v = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    init = all_v.select("v", F.col("v").alias("comp"))

    def step(labels: DataFrame, i: int) -> DataFrame:
        nbr_min = (
            sym.join(labels.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        return labels.join(nbr_min, "v", "left").select(
            "v", F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp")
        )

    return iterate(
        init, step, _sig_delta, max_iter=max_iter, tol=0.0, check_every=check_every
    )
