"""Registered queries + DuckDB oracle SQL for the driver contract.

Every SQL-expressible operator from SURVEY.md §2 (plus the training-data
pipeline operators) appears here twice: once as a Spark DataFrame program
(the engine under test) and once as ANSI SQL for DuckDB (the oracle).
Column names and rounding are aligned pairwise — the driver's comparator
hashes values after sorting columns by name.

Graph derivations over the driver testdata (FIXTURES.md §4):
- ``copurchase``: parts sharing an order (lineitem self-join) — sparse,
  triangle-rich; the flagship graph.
- ``bipartite``: order–part incidence folded into one id space —
  triangle-free by construction (checks canonicalization + orientation
  on a graph whose TC must be exactly 0).
- ``events co-occurrence``: users sharing (event_type, hour) — denser,
  exercises skew.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trianglecount_spark.operators.canonicalize import canonicalize_edges, degrees, orient
from trianglecount_spark.operators.components import connected_components
from trianglecount_spark.operators.lpa import label_propagation
from trianglecount_spark.operators.pagerank import pagerank
from trianglecount_spark.operators.triangles import (
    triangles_join,
    triangles_per_vertex_join,
    triangles_per_vertex_kernel,
)

# ---------------------------------------------------------------------------
# shared loaders / derivations
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def copurchase_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    return a.join(b, "k").where(F.col("src") < F.col("dst")).select("src", "dst")


def copurchase_sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    return canonicalize_edges(copurchase_raw(spark, sf_dir))


def copurchase_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    return orient(copurchase_sym(spark, sf_dir))


def bipartite_sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    raw = li.select(
        F.col("l_orderkey").alias("src"),
        (F.lit(1000000) + F.col("l_partkey")).alias("dst"),
    )
    return canonicalize_edges(raw)


def events_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    a = g.select("event_type", "h", F.col("user_id").alias("src"))
    b = g.select("event_type", "h", F.col("user_id").alias("dst"))
    return (
        a.join(b, ["event_type", "h"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


# SQL CTE prefixes mirroring the derivations above, verbatim semantics.
_CP = """
WITH raw AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM raw WHERE src <> dst
  )
),
deg AS (SELECT dst AS v, count(*) AS deg FROM und GROUP BY 1),
o AS (
  SELECT e.src, e.dst FROM und e
  JOIN deg ds ON ds.v = e.src JOIN deg dd ON dd.v = e.dst
  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.dst < e.src)
)
"""

_EV = """
WITH g AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id FROM events
),
p AS (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM g a JOIN g b ON a.event_type = b.event_type AND a.h = b.h
  WHERE a.user_id < b.user_id
)
"""

_SHINGLES = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(list_transform(list_zip(w, w[2:], w[3:]),
             x -> CASE WHEN x[2] IS NULL OR x[3] IS NULL THEN NULL
                  ELSE x[1] || ' ' || x[2] || ' ' || x[3] END),
             s -> s IS NOT NULL)) AS s
  FROM w
)
"""


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → distinct (doc_id, s) 3-word shingles; matches _SHINGLES."""
    from trianglecount_spark.operators.dedup import shingles

    return shingles(_t(spark, sf_dir, "documents"), n=3)


_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "est", "les"],
    "hi": ["hai", "ka", "ki", "ke", "aur"],
}

# minhash config: H independent hashes as min(md5(shingle || '#i'));
# bands of R rows → candidates share at least one full band.
_MH_H = 8
_MH_R = 2

# portable-ANN configs shared by the Spark query and the DuckDB oracle
_LSH_P = 8   # planes (bucket bits) per table
_LSH_T = 4   # independent tables
_IVF_K = 16  # centroids
_IVF_PROBE = 4

# SimHash oracle: 60-bit hash from the first 15 hex chars of md5(token),
# per-bit ±cnt votes — mirrors operators/dedup.simhash64 exactly.
_SIMHASH = """
WITH tokc AS (
  SELECT doc_id, t, count(*) AS cnt FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
),
h AS (
  SELECT doc_id, cnt,
         CAST(CAST('0x' || substring(md5(t), 1, 15) AS UBIGINT) AS BIGINT) AS hv
  FROM tokc
),
bits AS (
  SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS v
  FROM h, (SELECT unnest(range(60)) AS b) bs
  GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
"""


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------


def q_copurchase_edges(spark, sf_dir):
    return copurchase_sym(spark, sf_dir)


def q_degrees(spark, sf_dir):
    return degrees(copurchase_sym(spark, sf_dir))


def q_degree_histogram(spark, sf_dir):
    return (
        degrees(copurchase_sym(spark, sf_dir))
        .groupBy("deg")
        .agg(F.count("*").alias("n_vertices"))
    )


def q_degree_powerlaw(spark, sf_dir):
    """Power-law MLE over the degree sequence: one row with
    alpha = 1 + n / Σ ln(d_i/d_min), d_min = 1 (Clauset-Shalizi-Newman
    discrete MLE). Whole plan is one agg over the degree table; both
    outputs rounded to 4 decimals so the two engines' double sums
    format identically (same guard as pagerank_exact10)."""
    deg = degrees(copurchase_sym(spark, sf_dir))
    ln_sum = F.sum(F.log(F.col("deg").cast("double")))
    return deg.agg(
        F.count("*").alias("n_vertices"),
        F.round(ln_sum, 4).alias("sum_ln_deg"),
        F.round(F.lit(1.0) + F.count("*") / ln_sum, 4).alias("alpha_mle"),
    )


def q_oriented_edges(spark, sf_dir):
    return copurchase_oriented(spark, sf_dir)


def q_wedge_count(spark, sf_dir):
    o = copurchase_oriented(spark, sf_dir)
    e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return e1.join(e2, "v").agg(F.count("*").alias("n_wedges"))


def q_triangle_total(spark, sf_dir):
    return triangles_join(copurchase_oriented(spark, sf_dir)).agg(
        F.count("*").alias("n_triangles")
    )


def q_triangle_total_kernel(spark, sf_dir):
    # kernel strategy, same oracle as the join strategy — cross-variant
    # agreement is the reference's own correctness method (SURVEY.md §5).
    return (
        triangles_per_vertex_kernel(copurchase_oriented(spark, sf_dir))
        .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("n_triangles"))
    )


def q_triangle_total_metis(spark, sf_dir):
    """Kernel strategy under the IN-ENGINE multilevel (METIS-scheme)
    anchor assignment (P3, plans/partitioning.multilevel_partition),
    on the mined WEB LINK graph — the domain whose locality a
    min-edge-cut partitioner exploits (a link graph clusters by site;
    the copurchase co-occurrence projection is a flat quasi-clique
    where contraction shrinks slowly and buys little). Same oracle as
    q_web_triangle_total: the total is invariant to the assignment, so
    the cross-engine hash checks the partitioner produced a complete,
    well-formed routing (a vertex dropped, duplicated, or mis-ranged
    by the partitioner would break the count). Cut quality itself is
    pytest-asserted (tests/test_partitioning.py: multilevel cut <
    hash cut / 3 on clustered graphs)."""
    from trianglecount_spark.functions.extract import edges_from_pages
    from trianglecount_spark.plans.partitioning import multilevel_partition

    e, _verts = edges_from_pages(web_pages_from_documents(spark, sf_dir))
    sym = canonicalize_edges(e).localCheckpoint(eager=True)
    assign = multilevel_partition(
        sym, k=8, coarse_target=4096, max_levels=3, refine_rounds=1
    )
    return (
        triangles_per_vertex_kernel(orient(sym), n_parts=8, parts=assign)
        .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("n_triangles"))
    )


def q_triangle_total_arrays(spark, sf_dir):
    from trianglecount_spark.operators.triangles import triangles_per_vertex_arrays

    return triangles_per_vertex_arrays(copurchase_oriented(spark, sf_dir)).agg(
        F.coalesce(F.sum("tri"), F.lit(0)).alias("n_triangles")
    )


def q_triangles_per_vertex(spark, sf_dir):
    return triangles_per_vertex_join(copurchase_oriented(spark, sf_dir))


def q_top_degree(spark, sf_dir):
    return (
        degrees(copurchase_sym(spark, sf_dir))
        .orderBy(F.col("deg").desc(), F.col("v").asc())
        .limit(20)
    )


def q_triangle_total_bipartite(spark, sf_dir):
    return triangles_join(orient(bipartite_sym(spark, sf_dir))).agg(
        F.count("*").alias("n_triangles")
    )


# DOULION sampling rate: keep a raw pair iff its md5 bucket (16 bits)
# falls in the first 1/_TRI_SAMPLE_INV of the space — deterministic, so
# the "approximate" count is exactly reproducible by the oracle. Each
# triangle survives with p³; the unbiased estimator is count · inv³.
_TRI_SAMPLE_INV = 4


def q_triangle_estimate_sampled(spark, sf_dir):
    """Approximate triangle count by DOULION edge sparsification
    (Tsourakakis et al., KDD'09) with a DETERMINISTIC md5 coin: raw
    copurchase pairs are kept when md5(src||'_'||dst) mod inv == 0, then
    the exact pipeline (canonicalize → orient → wedge join) runs on the
    1/inv-size graph — the 100 TB shape when the exact count is not
    worth E^1.5 work. Estimator = sampled count · inv³ (each triangle
    survives with p³). The md5 coin makes the estimate bit-reproducible
    in the oracle, unlike an RNG."""
    inv = _TRI_SAMPLE_INV
    raw = copurchase_raw(spark, sf_dir)
    coin = F.conv(F.substring(F.md5(F.concat_ws("_", "src", "dst")), 1, 4), 16, 10)
    sampled = raw.where(coin.cast("long") % inv == 0)
    sym = canonicalize_edges(sampled)
    return triangles_join(orient(sym)).agg(
        F.count("*").alias("n_sampled"),
        (F.count("*") * F.lit(inv**3)).alias("n_triangles_est"),
    )


def q_docs_sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling — per-language keep rates
    (en 4/8, de 2/8, rest 1/8) decided by an md5 coin on doc_id, so the
    sample is bit-reproducible on any engine/partitioning (the property
    RNG-based `sample()` lacks, and the one that makes train/eval splits
    auditable). Pure JVM expressions; filter runs at the scan."""
    docs = _t(spark, sf_dir, "documents")
    coin = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
    thresh = (
        F.when(F.col("lang") == "en", 4).when(F.col("lang") == "de", 2).otherwise(1)
    )
    return docs.where(coin.cast("long") % 8 < thresh).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_events_top3_per_user(spark, sf_dir):
    """Top-3 events by value per user with a total deterministic order
    (value desc, ts, event_id). Catalyst's WindowGroupLimit pushes the
    rank<=3 filter into per-partition partial top-k before the shuffle —
    the scale shape for per-entity leaderboards."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "rn", "event_id", "value")
    )


def q_events_value_quantiles(spark, sf_dir):
    """Exact discrete quantiles (p25/p50/p75/p90) of value per
    event_type: rank each row in its type (deterministic value,event_id
    order), then pick rank == ceil(q·n). Exact by construction — the
    selected values are actual data points, no interpolation doubles.
    Scale note: exact quantiles need a per-group total order; this is
    the honest O(n log n)-per-group form, and the few-distinct-groups
    skew is real — at 100 TB use approx_percentile (t-digest sketch,
    partial-aggregated) unless exactness is contractual."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in (0.25, 0.5, 0.75, 0.9)])).alias("q")
    return (
        r.select("event_type", "value", "rn", "n", qs)
        .where(F.col("rn") == F.ceil(F.col("q") * F.col("n")))
        .select("event_type", "q", "value")
    )


def q_lineitem_rollup(spark, sf_dir):
    """ROLLUP aggregation (grouping sets) — relational breadth the
    reference lacks entirely (SURVEY §2.5): per-(flag, status) subtotals,
    per-flag totals, and the grand total in one pass."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


def q_lineitem_stats(spark, sf_dir):
    """ANALYZE-style column statistics — the table profile a
    cost-based optimizer (or a data-quality monitor) consumes: per
    column min / max / null count / exact distinct count, emitted as
    one row per column in a single multi-aggregate pass (the unpivot
    happens AFTER aggregation, so the fact table is scanned once)."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"min_{c}"),
            F.max(c).cast("double").alias(f"max_{c}"),
            F.count_if(F.col(c).isNull()).alias(f"nulls_{c}"),
            F.countDistinct(c).alias(f"ndv_{c}"),
        ]
    one = li.agg(*aggs)
    rows = [
        one.select(
            F.lit(c).alias("column"),
            F.col(f"min_{c}").alias("min_v"),
            F.col(f"max_{c}").alias("max_v"),
            F.col(f"nulls_{c}").alias("n_nulls"),
            F.col(f"ndv_{c}").alias("ndv"),
        )
        for c in cols
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_lineitem_cube(spark, sf_dir):
    """CUBE aggregation — the full 2^k grouping-set lattice in one pass
    (ROLLUP's sibling; SURVEY §2.5 relational breadth): subtotals for
    every subset of (flag, status), including status-only marginals
    ROLLUP omits."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


def q_ppr_copurchase(spark, sf_dir):
    """Personalized PageRank: 10 fixed rounds with the teleport
    distribution uniform over the seed set {v : v % 50 == 0} — the
    undelivered-mass closure redistributes by the seed vector instead of
    1/N (operators/pagerank.py ``teleport``). Oracle: the same rounds
    unrolled as CTEs with the seed CASE expression inline."""
    sym = copurchase_sym(spark, sf_dir)
    verts = sym.select(F.col("src").alias("v")).distinct()
    seeds = verts.where(F.col("v") % 50 == 0)
    ns = seeds.count()
    n = verts.count()
    tele = seeds.select("v", F.lit(1.0 / ns).alias("s"))
    ranks, _ = pagerank(sym, tol=0.0, max_iter=10, check_every=10, teleport=tele,
                       broadcast_state=True)
    return ranks.select(
        "v", F.round(F.col("rank") * F.lit(float(n)), 4).alias("rank_n")
    )


def q_bfs_copurchase(spark, sf_dir):
    """Single-source BFS distances from the minimum vertex id over the
    copurchase graph (operators/metrics.py). Oracle: DuckDB RECURSIVE
    CTE enumerating (v, dist) pairs level by level; min(dist) per vertex
    is the shortest distance whenever the round cap covers the graph
    diameter — and the engine's fixpoint stop guarantees the same."""
    from trianglecount_spark.operators.metrics import bfs_distances

    sym = copurchase_sym(spark, sf_dir)
    source = sym.agg(F.min("src")).collect()[0][0]
    dist, _ = bfs_distances(sym, int(source), max_rounds=24)
    return dist


def q_sssp_copurchase(spark, sf_dir):
    """Weighted single-source shortest paths: 8 synchronous Bellman–Ford
    relaxations (operators/metrics.py ``sssp_distances``) from the min
    vertex over the copurchase graph with deterministic integer weights
    ``w = (src + dst) % 7 + 1`` — all-BIGINT arithmetic end to end.
    Oracle: the SAME 8 relaxations unrolled as chained DuckDB CTEs;
    both engines run the identical fixed round count, so values match
    exactly even where 8 rounds haven't converged."""
    from trianglecount_spark.operators.metrics import sssp_distances

    sym = copurchase_sym(spark, sf_dir)
    e = sym.select(
        "src", "dst", ((F.col("src") + F.col("dst")) % 7 + 1).cast("long").alias("w")
    )
    source = sym.agg(F.min("src")).collect()[0][0]
    dist, _ = sssp_distances(e, int(source), rounds=8)
    return dist.where(F.col("d") < (1 << 40)).select("v", F.col("d").alias("dist"))


def q_walks_copurchase(spark, sf_dir):
    """DeepWalk-style corpus generation: one deterministic length-4 walk
    per seed vertex (v % 100 == 0) over the symmetric copurchase graph
    (operators/walks.py) — next hop = out-neighbor minimizing
    ``md5(walk:id:step:cur:nbr)``. Rows (walk, step, v). Oracle: the
    same 4 hops unrolled as MATERIALIZED min_by CTEs over identical md5
    keys — bit-identical paths."""
    from trianglecount_spark.operators.walks import deterministic_walks

    sym = copurchase_sym(spark, sf_dir)
    seeds = (
        sym.select(F.col("src").alias("walk"))
        .distinct()
        .where(F.col("walk") % 100 == 0)
    )
    return deterministic_walks(sym, seeds, length=4)


def q_neighbor_sample_copurchase(spark, sf_dir):
    """GraphSAGE-style deterministic (2, 2) fanout sample per seed
    (v % 100 == 0) over the symmetric copurchase graph
    (operators/walks.py ``neighbor_sample``): hop ranks are per-key
    md5 orderings, windows partitioned by the sample key (never
    global). Oracle: the same two row_number-over-hash rankings."""
    from trianglecount_spark.operators.walks import neighbor_sample

    sym = copurchase_sym(spark, sf_dir)
    seeds = (
        sym.select(F.col("src").alias("seed"))
        .distinct()
        .where(F.col("seed") % 100 == 0)
    )
    return neighbor_sample(sym, seeds, fanout1=2, fanout2=2)


def q_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient per vertex over the copurchase graph
    (operators/metrics.py): all-corner triangle attribution / degree
    normalization; lcc is one double division of exact integers, so the
    oracle comparison needs no rounding."""
    from trianglecount_spark.operators.metrics import clustering_coefficient

    return clustering_coefficient(copurchase_sym(spark, sf_dir))


def q_kcore_suppliers(spark, sf_dir):
    """k-core (k=30) of the part–supplier bipartite graph — the one
    driver graph with real degree skew (supplier hubs ~520, part leaves
    ~26 at sf0.01), so peeling cascades. Fixed-round-capped peeling
    (operators/metrics.py) with early stop at the fixpoint; the oracle
    unrolls the same 8 peel rounds (a fixpoint is stable under extra
    rounds, so both sides agree whenever 8 covers the peel depth)."""
    from trianglecount_spark.operators.metrics import k_core

    li = _t(spark, sf_dir, "lineitem")
    raw = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
    )
    core, _ = k_core(canonicalize_edges(raw), k=30, max_rounds=8)
    return core


def q_coreness_copurchase(spark, sf_dir):
    """FULL core decomposition of the copurchase graph — per-vertex
    coreness via the distributed h-index iteration
    (operators/metrics.py:core_numbers, Lü et al. 2016), 8 fixed rounds.
    The oracle unrolls the identical iteration (H-index as
    max(least(row_number-desc, value)) per vertex); the H-index value is
    tie-order-independent, so both engines agree bit-for-bit whether or
    not 8 rounds reach the fixpoint."""
    from trianglecount_spark.operators.metrics import core_numbers

    return core_numbers(copurchase_sym(spark, sf_dir), rounds=8)


def q_edge_support(spark, sf_dir):
    """Per-edge triangle support over the copurchase graph
    (operators/truss.py) — the per-edge analog of the reference's
    per-vertex g_sum (ShareKernelTCV62_update_v1.cu:185). Exact
    integers, support-0 edges included."""
    from trianglecount_spark.operators.truss import edge_support

    return edge_support(copurchase_sym(spark, sf_dir))


def q_ktruss_copurchase(spark, sf_dir):
    """k-truss (k=10) of the copurchase graph (operators/truss.py):
    iteratively drop edges in < 8 triangles until a fixpoint (7 peel
    rounds at sf0.01, 4,974 surviving edges). The oracle unrolls 12
    fixed rounds — peeling is monotone, so the early-stopping engine and
    the fixed-round chain agree whenever the cap covers the depth."""
    from trianglecount_spark.operators.truss import k_truss

    truss, _ = k_truss(copurchase_sym(spark, sf_dir), k=10, max_rounds=12)
    return truss


def q_butterflies_suppliers(spark, sf_dir):
    """Butterfly (4-cycle) count of the part–supplier bipartite graph
    (operators/metrics.py) — the bipartite cohesion motif where
    triangles cannot exist. Wedge centers pinned to the part side (deg
    ~4 leaves vs ~500-degree supplier hubs: ~10× less wedge volume than
    centering on suppliers). Exact integer arithmetic throughout."""
    from trianglecount_spark.operators.metrics import butterfly_count

    li = _t(spark, sf_dir, "lineitem")
    bip = li.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return butterfly_count(bip, center="src")


def q_graph_summary(spark, sf_dir):
    """One-row global summary of the copurchase graph: |V|, |E|,
    wedge count Σ C(deg,2), triangle count, and global transitivity
    3T/W — the graph-level headline the reference prints per run
    (Final_updated_corrected.cu: total triangle stdout). Integer
    moments are exact; transitivity is one double expression of them,
    so the oracle comparison needs no rounding."""
    sym = copurchase_sym(spark, sf_dir)
    deg = degrees(sym)
    base = deg.agg(
        F.count("*").alias("n_vertices"),
        F.expr("sum(deg) div 2").alias("n_edges"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).alias("n_wedges"),
    )
    from trianglecount_spark.operators.triangles import triangles_per_vertex_arrays

    # arrays strategy — fastest measured at every single-box size
    # (BENCH/BASELINE.md crossover table); same exact count
    tri = triangles_per_vertex_arrays(orient(sym, deg)).agg(
        F.coalesce(F.sum("tri"), F.lit(0)).alias("n_triangles")
    )
    return base.crossJoin(tri).select(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        (F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")).alias(
            "transitivity"
        ),
    )


def q_link_prediction(spark, sf_dir):
    """Common-neighbor / Jaccard link prediction on the copurchase
    graph (operators/metrics.py): non-adjacent part pairs sharing ≥ 12
    co-purchase neighbors among wedge centers of degree ≤ 150, scored
    by neighborhood Jaccard. Integer counts + one double division —
    exact oracle, no rounding.

    The τ=150 hub-center cap is the engine-side Σ C(d,2) mitigation
    (r2 verdict #1, metrics._wedge_centers): the oracle applies the
    identical center-degree filter, so the capped score is itself an
    exact cross-engine contract (the uncapped τ=None form stays the
    default API and is bruteforce-checked in tests/test_property.py
    and q_link_prediction_exact). No hard-coded regime (r3 verdict
    #1): the default ``broadcast_adjacency="auto"`` measures the two
    kernel bounds at plan time and picks the broadcast-CSR kernel here
    — the capped adjacency is ≤ |V|·τ int64s, far inside the broadcast
    bound at every test scale (sweep single-shot 19.7 s — was 40.0 s
    in r2 — vs 41.7 s shuffle form at sf0.1); past the bound the SAME
    registered query degrades to the shuffle plan instead of
    failing."""
    from trianglecount_spark.operators.metrics import link_prediction_jaccard

    return link_prediction_jaccard(
        copurchase_sym(spark, sf_dir),
        min_common=12,
        max_center_degree=150,
    )


def q_link_prediction_exact(spark, sf_dir):
    """The UNCAPPED (τ=None) Jaccard link prediction — the exact
    classical score over every wedge center, kept registered so the
    capped production contract (q_link_prediction) and the exact form
    are BOTH oracle-gated. Runs on the smaller events co-occurrence
    graph: exactness is scale-free, and the full Σ C(d,2) stream on
    the flagship graph belongs to the capped plan. Runs the SHUFFLE
    regime on purpose: uncapped hub wedges violate the kernel regime's
    per-task pair-memory bound (metrics._pair_counts — measured 37-143s
    swings from Python memory thrash at sf0.1, vs the JVM agg's
    spill-managed 42s warm). The regime rule is now IN the engine:
    ``broadcast_adjacency="auto"`` (default) routes τ=None to the
    all-shuffle plan, and the explicit kernel+uncapped combination
    raises (r3 verdict #3)."""
    from trianglecount_spark.operators.canonicalize import canonicalize_edges
    from trianglecount_spark.operators.metrics import link_prediction_jaccard

    return link_prediction_jaccard(
        canonicalize_edges(events_pairs(spark, sf_dir)),
        min_common=8,
    )


def q_clique4(spark, sf_dir):
    """4-clique count on the DOULION-sampled copurchase graph — the
    wedge-join triangle pattern extended one level
    (operators/metrics.clique4_count). Host graph: the md5-coin 1/4
    edge sample (same derivation as triangle_estimate_sampled) — the
    full copurchase graph's order-cliques make exhaustive K4
    ENUMERATION quadratically heavier than triangle counting (each
    k-order-clique holds C(k,4) of them); sampling thins cliques by p⁶,
    which is exactly the DOULION argument applied one motif up."""
    from trianglecount_spark.operators.metrics import clique4_count

    inv = _TRI_SAMPLE_INV
    raw = copurchase_raw(spark, sf_dir)
    coin = F.conv(F.substring(F.md5(F.concat_ws("_", "src", "dst")), 1, 4), 16, 10)
    sampled = raw.where(coin.cast("long") % inv == 0)
    return clique4_count(orient(canonicalize_edges(sampled)))


def q_square_count(spark, sf_dir):
    """4-cycle (rectangle) count on the DOULION-sampled copurchase
    graph via opposite-pair common-neighbor counting: N₄ = ½ Σ_{u<w}
    C(cn(u,w), 2) — every 4-cycle u-x-w-y is seen once from each of its
    two opposite pairs {u,w}, {x,y}, so the paired-wedge sum is exactly
    2·N₄ (always even; the halving stays integral). Cost class is the
    Σdeg² wedge self-join — same as wedge_count/butterflies; at crawl
    scale the DOULION coin thins squares by p⁴ (estimator ×inv⁴, the
    triangle_estimate_sampled argument one motif up)."""
    inv = _TRI_SAMPLE_INV
    raw = copurchase_raw(spark, sf_dir)
    coin = F.conv(F.substring(F.md5(F.concat_ws("_", "src", "dst")), 1, 4), 16, 10)
    sym = canonicalize_edges(raw.where(coin.cast("long") % inv == 0))
    e1 = sym.select(F.col("src").alias("mid"), F.col("dst").alias("u"))
    e2 = sym.select(F.col("src").alias("mid"), F.col("dst").alias("w"))
    cn = (
        e1.join(e2, "mid")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").alias("c"))
    )
    return cn.agg(
        F.expr("sum(c * (c - 1) div 2) div 2").cast("long").alias("n_squares")
    )


def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the copurchase graph
    (operators/metrics.py) — sqrt-free rational Pearson form on the
    symmetric edge table; exact integer moments, one double division."""
    from trianglecount_spark.operators.metrics import degree_assortativity

    return degree_assortativity(copurchase_sym(spark, sf_dir))


def q_docs_top_tokens(spark, sf_dir):
    """Corpus-level top-20 tokens by frequency with deterministic
    (count desc, token asc) tie order — the exact-counting counterpart
    of sketch-based heavy hitters."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("t").asc())
        .limit(20)
    )


def q_docs_inverted_index(spark, sf_dir):
    """Corpus inverted index, aggregate form: per token its document
    frequency, total term frequency, and posting-list bounds — the
    index-construction pass of a search/retrieval pipeline (two hash
    aggs over the exploded token table; at crawl scale this is the
    standard shuffle-on-token build, no window, no driver state)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    return toks.groupBy(F.col("t").alias("token")).agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("tf_total"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def q_events_user_hll(spark, sf_dir):
    """Deterministic HyperLogLog distinct-user estimate next to the
    exact count (operators/sketches.py — portable md5 registers, exact
    BIGINT register sum, one final double division; bit-identical on
    any engine/partitioning, hence exactly oracle-checkable — unlike
    approx_count_distinct's engine-private HLL++)."""
    from trianglecount_spark.operators.sketches import hll_sketch

    ev = _t(spark, sf_dir, "events")
    sketch = hll_sketch(ev, "user_id")
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.crossJoin(sketch).select(
        "n_exact", "n_buckets", "s_scaled", "estimate"
    )


def q_docs_tfidf_top(spark, sf_dir):
    """Top TF-IDF term per document. The idf is the *rational* variant
    idf = N/df (ratio-of-exact-ints; same ranking as any monotone idf
    for fixed df ordering within a doc... strictly: same ranking as
    tf·(N/df), which is the textbook score modulo the log — chosen so
    the score is ONE exact-int division, bit-equal on every engine,
    instead of a log whose libm rounding differs). Deterministic
    tie-break (score desc, token asc). Shape: two hash aggs (tf, df) +
    broadcast of the 1-row N + WindowGroupLimit top-1 per doc."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    df = toks.distinct().groupBy("t").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "t")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "t",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("t").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("t").alias("token"), "tf", "df", "score")
    )


def q_events_value_outliers(spark, sf_dir):
    """Per-type z-score outliers (|z| > 3) — deterministic because the
    moments are exact int64 (integer cents: n·S2 − S1² exact), IEEE
    sqrt is correctly rounded by spec, and the one division is IEEE:
    z = (x·n − S1) / sqrt(n·S2 − S1²) is bit-identical on any engine.
    Shape: one groupBy for the 5-row moment table, broadcast back —
    two passes over events, no window."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    mom = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    z = (F.col("cents") * F.col("n") - F.col("s1")) / F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    )
    return (
        ev.join(F.broadcast(mom), "event_type")
        .select("event_id", "event_type", "cents", z.alias("z"))
        .where(F.abs(F.col("z")) > 3)
    )


def q_events_rolling_avg(spark, sf_dir):
    """Per-user trailing 3-event moving average (window ROWS BETWEEN 2
    PRECEDING AND CURRENT), deterministic order (ts, event_id); the
    average is an exact-int-cents sum over an exact count — one IEEE
    division."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "cents",
        (F.sum("cents").over(w) / F.count("*").over(w)).alias("avg3"),
    )


def q_events_pivot(spark, sf_dir):
    """Crosstab: per-user event counts pivoted to one column per type
    (`groupBy().pivot()` with explicit values — Catalyst rewrites to a
    single pass of conditional aggregates, no shuffle per column)."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


def q_events_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: per user the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that; one summary row of stage counts plus
    exact-int conversion ratios. Three groupBy-min passes (each a tiny
    per-user aggregate), no window, no self-join explosion."""
    ev = _t(spark, sf_dir, "events")

    def first_after(kind, prev, name):
        e = ev.where(F.col("event_type") == kind).select("user_id", "ts")
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col("prev_ts"))
        return e.groupBy("user_id").agg(F.min("ts").alias(name)).select(
            "user_id", F.col(name).alias("prev_ts")
        )

    v = first_after("view", None, "t_view")
    c = first_after("click", v, "t_click")
    p = first_after("purchase", c, "t_purchase")
    counts = (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )
    return counts.select(
        "n_view",
        "n_view_click",
        "n_view_click_purchase",
        (F.col("n_view_click") / F.col("n_view")).alias("cr_click"),
        (F.col("n_view_click_purchase") / F.col("n_view_click")).alias("cr_purchase"),
    )


def q_events_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase event matched to the
    user's most recent click at-or-before it (operators/asof.py —
    union + ordered-window as-of join, one key shuffle, no range-join
    blowup). Clicks are pre-deduped to one row per (user, ts) by max
    event_id so the match is deterministic; the oracle is DuckDB's
    native ASOF LEFT JOIN over the same deduped stream."""
    from trianglecount_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purch, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("asof_click_id").alias("click_id")
    )


def q_events_error_overlap(spark, sf_dir):
    """Range-containment join: how many same-user 5-minute error
    windows contain each purchase (operators/interval.py — bucketized
    equi-join, never a BroadcastNestedLoop theta join). Left semantics:
    purchases inside no window report 0. Oracle: the plain SQL theta
    join DuckDB can afford at oracle scale."""
    from trianglecount_spark.operators.interval import interval_join

    ev = _t(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    pairs = interval_join(
        purch.withColumnRenamed("user_id", "u"),
        err, point_ts="ts", start_col="s", end_col="e", on="u",
    )
    n = pairs.groupBy("event_id").agg(F.count("*").alias("n_error_windows"))
    return purch.join(n, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce("n_error_windows", F.lit(0)).alias("n_error_windows"),
    )


def q_events_edges(spark, sf_dir):
    return events_pairs(spark, sf_dir)


def q_events_triangle_total(spark, sf_dir):
    # engine path: canonicalize + orient + wedge JOIN — deliberately NOT
    # the arrays strategy here: the events graph is a co-occurrence
    # projection (a union of (event_type, hour) cliques), and measured
    # at sf0.1 the join form wins 22s vs 42-47s — on clique-dense
    # graphs every member's oriented adjacency array is clique-sized,
    # so the per-edge array_intersect payload (two k-length arrays per
    # row) dwarfs the join form's streamed wedge rows. The crossover
    # table's "arrays fastest" rule (BENCH/BASELINE.md) is for
    # power-law WEB graphs; co-occurrence projections are the join
    # form's regime. Oracle path: plain a<b<c 3-way join on the pair
    # table — independent formulations.
    sym = canonicalize_edges(events_pairs(spark, sf_dir))
    return triangles_join(orient(sym)).agg(F.count("*").alias("n_triangles"))


# --- iterative, all EXACTLY oracle-checked (r2: the r1 rows-only gaps) ---


def q_pagerank_copurchase(spark, sf_dir):
    """30 fixed PageRank rounds (the cluster-deterministic production
    configuration; convergence mode ``tol>0`` is pytest-covered against
    a NumPy oracle in tests/test_iterative.py). Oracle: the same power
    iteration unrolled as 30 MATERIALIZED CTEs."""
    sym = copurchase_sym(spark, sf_dir)
    n = sym.select(F.col("src").alias("v")).distinct().count()
    # symmetric graph => every vertex has out-edges: the dangling-free
    # share is the CONSTANT (1-alpha)/N (the oracle's float-sum closure
    # equals it to ~1e-16, far below the 4-decimal rounding), and the
    # single-reference step lets 5 rounds compose into one job — the
    # overhead-bound-regime cadence (see pagerank() on when NOT to)
    ranks, _ = pagerank(
        sym, tol=0.0, max_iter=30, check_every=30,
        dangling_free=True, materialize_every=5, broadcast_state=True,
    )
    return ranks.select(
        "v", F.round(F.col("rank") * F.lit(float(n)), 4).alias("rank_n")
    )


def q_components_copurchase(spark, sf_dir):
    """Large-star/small-star CC on the full copurchase graph. Oracle: a
    DuckDB RECURSIVE CTE computing min-reachable-vertex per vertex —
    independent formulation, exact comparison."""
    comp, _ = connected_components(copurchase_sym(spark, sf_dir))
    return comp


def q_lpa_copurchase(spark, sf_dir):
    """10 synchronous LPA rounds on the full copurchase graph. Oracle:
    the same deterministic (freq desc, label asc) update unrolled as 10
    chained CTEs — exact label-for-label comparison. (The engine may
    early-stop at a fixpoint; a fixpoint is stable under further rounds,
    so both sides agree.)"""
    labels, _ = label_propagation(
        copurchase_sym(spark, sf_dir), max_iter=10, broadcast_state=True
    )
    return labels


def q_mis_copurchase(spark, sf_dir):
    """Luby maximal independent set over the copurchase graph
    (operators/mis.py) — deterministic md5 priorities, so the oracle
    unrolls the identical rounds (restrict → neighbor-min → select →
    remove) and matches (v, round) exactly. Both sides run the same
    8-round budget; the engine early-stops when the remaining set
    empties, which on this graph happens well inside the budget (a
    fixpoint is stable under further rounds, the lpa_copurchase
    argument)."""
    from trianglecount_spark.operators.mis import maximal_independent_set

    return maximal_independent_set(copurchase_sym(spark, sf_dir), max_iter=8)


def q_matching_copurchase(spark, sf_dir):
    """Maximal matching over the copurchase graph (operators/matching.py
    — locally-minimal edges under deterministic md5 priorities). Both
    sides run the same 8-round budget; the oracle unrolls the identical
    rounds and matches (src, dst, round) exactly."""
    from trianglecount_spark.operators.matching import maximal_matching

    return maximal_matching(copurchase_sym(spark, sf_dir), max_iter=8)


def q_coarsen_copurchase(spark, sf_dir):
    """One multilevel coarsening step (operators/matching.py
    ``coarsen_by_matching``): contract the 8-round maximal matching,
    re-aggregate parallel edges into weights. The oracle replays the
    matching rounds and the identical contraction."""
    from trianglecount_spark.operators.matching import coarsen_by_matching

    return coarsen_by_matching(copurchase_sym(spark, sf_dir), max_iter=8)


def q_triangle_list_sample(spark, sf_dir):
    """Triangle ENUMERATION (not just counting): the actual (a, b, c)
    motif instances, here on the id<200 induced subgraph — the output
    shape GNN samplers and motif-feature pipelines consume. Same
    oriented wedge join as the counter, minus the final aggregate;
    bounding the subgraph bounds the listing volume (at web scale the
    enumeration is always over a filtered/sampled region — listing all
    10^12 triangles is never the query)."""
    o = copurchase_oriented(spark, sf_dir).where(
        (F.col("src") < 200) & (F.col("dst") < 200)
    )
    # path-wedge form, exactly like triangles_join: every triangle of a
    # DAG has ONE directed path a→b→c with closing edge a→c. (The naive
    # "both wedge arms from a, b<c by id" form misses every triangle
    # whose closing edge is oriented high→low id — 205 of 443 here.)
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )


def q_docs_quality_deciles(spark, sf_dir):
    """Per-language quality deciles (ntile over a lang-partitioned
    window, deterministic (n_chars, doc_id) order) — the percentile
    banding a quality-filtered mixture uses to keep 'the top 30% per
    language' without a global sort."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "lang", "n_chars", F.ntile(10).over(w).cast("long").alias("decile")
    )


def q_sp_counts_copurchase(spark, sf_dir):
    """Shortest-path counting from vertex 0 (operators/metrics.py
    ``shortest_path_counts``): the exact-integer Brandes forward pass —
    per reached vertex its BFS level and the number of distinct
    shortest paths from the source. 4 fixed levels, both engines."""
    from trianglecount_spark.operators.metrics import shortest_path_counts

    return shortest_path_counts(copurchase_sym(spark, sf_dir), source=0, rounds=4)


def q_heavy_matching_coarse(spark, sf_dir):
    """Heavy-edge matching on the WEIGHTED coarse graph — the second
    level of a multilevel pipeline: coarsen the copurchase graph once
    (matching contraction), then match the coarse graph preferring the
    heaviest collapsed-weight edges (the Metis coarsening heuristic,
    operators/matching.py ``weight_col``). Oracle: the full two-level
    unroll — 8 unweighted rounds, the contraction, then 6 weighted
    rounds with the identical lpad-complement priority strings."""
    from trianglecount_spark.operators.matching import (
        coarsen_by_matching,
        maximal_matching,
    )

    cg = coarsen_by_matching(copurchase_sym(spark, sf_dir), max_iter=8)
    return maximal_matching(cg, max_iter=6, salt="hmatch", weight_col="weight")


def q_coloring_copurchase(spark, sf_dir):
    """Luby graph coloring (operators/mis.py ``luby_coloring``): the
    first 4 color classes of the copurchase graph, each class an MIS of
    the still-uncolored subgraph (4 Luby rounds per class, per-class
    md5 salts). Fixed (colors × rounds) budget on both engines; the
    oracle unrolls all 16 blocks."""
    from trianglecount_spark.operators.mis import luby_coloring

    return luby_coloring(
        copurchase_sym(spark, sf_dir), n_colors=4, mis_rounds=4
    )


def q_modularity_lpa(spark, sf_dir):
    """Per-community modularity decomposition of the 2-round LPA
    partition (on this dense graph full convergence collapses to ONE
    community — the mid-propagation partition is the non-degenerate
    check), in EXACT integer space: with 2m = |sym edges|,
    q_num = 2m·intra_sym_c − d_c² per community c, so the Newman
    modularity is Q = Σ_c q_num / (2m)² — every column a BIGINT both
    engines agree on bit-for-bit. Shape: LPA rounds + one degree agg +
    two shuffle label joins on the edge table (labels are |V|-sized —
    never broadcast at crawl scale) + one hash agg per side."""
    sym = copurchase_sym(spark, sf_dir)
    labels, _ = label_propagation(sym, max_iter=2, broadcast_state=True)
    m2 = sym.count()  # 2m: each undirected edge appears twice
    deg = sym.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    dc = (
        deg.join(labels, "v")
        .groupBy("label")
        .agg(F.sum("deg").alias("d_c"), F.count("*").alias("n_members"))
    )
    ls = labels.select(F.col("v").alias("src"), F.col("label").alias("l_src"))
    ld = labels.select(F.col("v").alias("dst"), F.col("label").alias("l_dst"))
    intra = (
        sym.join(ls, "src")
        .join(ld, "dst")
        .where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("label"))
        .agg(F.count("*").alias("intra_sym"))
    )
    return dc.join(intra, "label", "left").select(
        "label",
        "n_members",
        "d_c",
        F.coalesce("intra_sym", F.lit(0)).alias("intra_sym"),
        (
            F.lit(m2) * F.coalesce("intra_sym", F.lit(0))
            - F.col("d_c") * F.col("d_c")
        ).alias("q_num"),
    )


# --- iterative, EXACTLY oracle-checked ---


def q_pagerank_exact10(spark, sf_dir):
    """10 fixed PageRank rounds with an exact DuckDB oracle.

    The oracle is the SAME power iteration unrolled as 10 chained CTEs
    (``_pagerank_sql``): identical damping, identical missing-mass
    closure. Ranks are scaled by N (mean 1.0) and rounded to 4 decimals
    so both engines' double-precision group sums format identically —
    4 (not 5) keeps the probability of a rank landing within the two
    engines' ~1e-12 summation-order divergence of a rounding boundary
    an order of magnitude lower (ADVICE r1).
    """
    sym = copurchase_sym(spark, sf_dir)
    n = sym.select(F.col("src").alias("v")).distinct().count()
    # symmetric => dangling-free constant share (matches the oracle's
    # float-sum closure to ~1e-16, far below the 4-decimal rounding);
    # 5-round chains for the overhead-bound gate/bench regime
    ranks, _ = pagerank(
        sym, tol=0.0, max_iter=10, check_every=10,
        dangling_free=True, materialize_every=5, broadcast_state=True,
    )
    return ranks.select(
        "v", F.round(F.col("rank") * F.lit(float(n)), 4).alias("rank_n")
    )


def nation_clique_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations sharing a region: 5 disjoint 5-cliques — the smallest real
    table whose component/label structure is closed-form in SQL."""
    na = _t(spark, sf_dir, "nation")
    a = na.select(F.col("n_regionkey").alias("r"), F.col("n_nationkey").alias("src"))
    b = na.select(F.col("n_regionkey").alias("r"), F.col("n_nationkey").alias("dst"))
    return a.join(b, "r").where(F.col("src") < F.col("dst")).select("src", "dst")


def q_components_nation(spark, sf_dir):
    """Large-star/small-star CC, exactly oracle-checked: on disjoint
    cliques the component label (min member id) is a window MIN."""
    comp, _ = connected_components(nation_clique_edges(spark, sf_dir))
    return comp


def q_lpa_nation(spark, sf_dir):
    """Synchronous LPA, exactly oracle-checked: on a clique the
    deterministic (freq desc, label asc) rule converges every member to
    the clique minimum — same closed form as CC."""
    labels, _ = label_propagation(
        nation_clique_edges(spark, sf_dir), max_iter=10, broadcast_state=True
    )
    return labels


# ---------------------------------------------------------------------------
# relational / windowed queries (engine breadth)
# ---------------------------------------------------------------------------


def q_lineitem_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


def q_orders_revenue_topn(spark, sf_dir):
    """TPC-H Q3 shape — shipping-priority top-10: a selective dimension
    filter (mktsegment) broadcast into a 3-table join, revenue summed
    per order, global top-10. Revenue is EXACT integer cents
    (floor(p·(1−d)·100 + 0.5) per row — fixed-order IEEE ops, then a
    BIGINT sum), so the aggregate is order-independent and hash-exact.
    The top-10 is TakeOrderedAndProject — a per-partition heap + tiny
    merge, never a global sort. Ties broken by orderkey."""
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_region_nation_volume(spark, sf_dir):
    """TPC-H Q5 shape — local-supplier volume: six-table star join
    (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region) with
    the same-nation constraint between customer and supplier, revenue
    per nation in exact integer cents. The dimension chain
    (region→nation) broadcasts; the fact joins shuffle on their keys —
    the canonical Catalyst join-reorder showcase."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
    )


def _zorder_expr(xcol: str, ycol: str, bits: int = 12) -> str:
    """Bit-interleaved Z-value of two non-negative ints (``bits`` bits
    each) as a portable SQL expression — identical text runs on Spark
    SQL and DuckDB, so the oracle replays the exact layout."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def q_events_zorder_stats(spark, sf_dir):
    """Z-ORDER data layout (the multi-dimensional clustering technique
    behind Delta/Iceberg OPTIMIZE ZORDER): interleave the bits of
    (user_id, day-since-epoch-of-corpus) into a Z-value, bucket rows by
    the value's top 4 bits (pure arithmetic — no global ntile window),
    and report each bucket's row count and per-dimension min/max spans.
    Tight spans on BOTH dimensions are what make file-level min/max
    skipping effective for 2-D predicates at 100 TB — this query IS the
    measurement a layout job would emit. All integer arithmetic."""
    ev = _t(spark, sf_dir, "events")
    x = "CAST(user_id AS BIGINT)"
    # midnight base ⇒ Spark's complete-day count == DuckDB's
    # boundary-crossing count
    y = "CAST(timestampdiff(DAY, TIMESTAMP '2024-01-01', ts) AS BIGINT)"
    z = _zorder_expr("xv", "yv")
    rows = ev.selectExpr(f"{x} AS xv", f"{y} AS yv").selectExpr(
        "xv", "yv", f"CAST({z} AS BIGINT) AS zv"
    )
    return (
        rows.selectExpr("xv", "yv", "CAST(zv >> 12 AS BIGINT) AS bucket")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("xv").alias("min_user"),
            F.max("xv").alias("max_user"),
            F.min("yv").alias("min_day"),
            F.max("yv").alias("max_day"),
        )
    )


def q_events_value_iqr(spark, sf_dir):
    """GROUPED-AGG pandas UDF (the Arrow-vectorized UDAF surface,
    complementing mapInPandas/applyInArrow elsewhere): per event type,
    exact DISCRETE quartiles of the cent-value distribution via one
    numpy sort per group — p25 = sorted[(n−1) div 4], p75 =
    sorted[3(n−1) div 4] (the lower-element convention, integer index
    arithmetic, so the result is element-exact, no interpolation, no
    float). A UDAF receives each group as ONE Arrow batch — fine for
    per-type groups; a 100 TB per-key cardinality would use the
    sketch/exact-quantile queries instead (documented trade-off)."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: this module's `from __future__ import
    # annotations` stringifies signatures, so type inference can't run
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def p25(v):
        a = np.sort(v.to_numpy())
        return int(a[(len(a) - 1) // 4])

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def p75(v):
        a = np.sort(v.to_numpy())
        return int(a[(3 * (len(a) - 1)) // 4])

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return (
        ev.groupBy("event_type")
        .agg(p25("cents").alias("p25_cents"), p75("cents").alias("p75_cents"))
        .select(
            "event_type",
            "p25_cents",
            "p75_cents",
            (F.col("p75_cents") - F.col("p25_cents")).alias("iqr_cents"),
        )
    )


def q_orders_rolling_30d(spark, sf_dir):
    """RANGE-frame window (the time-interval frame, complementing
    events_rolling_avg's ROWS frame): per customer, each order's
    trailing-30-day revenue — orders within [ts−30d, ts] by VALUE
    range, however many rows that is. Spark expresses the interval
    frame as rangeBetween over unix microseconds (equivalent by
    definition: RANGE on a monotone key transform); revenue is exact
    integer cents so the frame sum is order-independent. Window is
    customer-partitioned — never global."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    mu = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(mu)
        .rangeBetween(-30 * 86400 * 1000000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(cents).over(w).cast("long").alias("rev30d_cents"),
    )


def q_part_set_ops(spark, sf_dir):
    """Table-level set operators (the INTERSECT / EXCEPT surface the
    reference lacks entirely, SURVEY §2.5): part keys partitioned into
    sold (part ∩ lineitem) and shelf-only (part ∖ lineitem), plus
    phantom fact keys (lineitem ∖ part). Spark compiles INTERSECT /
    EXCEPT to left-semi / left-anti hash joins over distinct inputs —
    the same one-shuffle plan a hand-written anti-join gets."""
    pk = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    lk = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    sold = pk.intersect(lk)
    shelf = pk.exceptAll(sold).distinct()
    phantom = lk.distinct().exceptAll(pk.distinct())
    return (
        sold.agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("sold").alias("cls"), "n")
        .unionByName(
            shelf.agg(F.count("*").cast("long").alias("n")).select(
                F.lit("shelf_only").alias("cls"), "n"
            )
        )
        .unionByName(
            phantom.agg(F.count("*").cast("long").alias("n")).select(
                F.lit("phantom").alias("cls"), "n"
            )
        )
    )


def q_orders_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape — order priority checking: count orders per
    priority in a half-year window having AT LEAST ONE late shipment
    (l_shipdate more than 60 days after o_orderdate). The EXISTS
    subquery is a LEFT SEMI join with a non-equi residual on the date
    columns — Catalyst executes the equi part (orderkey) as the join
    key and the 60-day predicate as the join filter, so each order
    probes only its own lineitems and short-circuits at the first
    match (no count/distinct over the fact table). Both sides shuffle
    on orderkey; at 100 TB neither is broadcastable and this is the
    minimal one-shuffle plan."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders")
    )


def q_densest_subgraph(spark, sf_dir):
    """Densest-subgraph 2-approx (Charikar greedy, parallel peel) on
    the copurchase graph — exact integer peel rule and millionths
    density, best snapshot returned.
    operators/metrics.py:densest_subgraph."""
    from trianglecount_spark.operators.metrics import densest_subgraph

    return densest_subgraph(copurchase_sym(spark, sf_dir), rounds=8)


def q_events_rfm(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary — the classic
    customer scoring): per-user metrics, then 1–4 scores by comparison
    against the EXACT discrete quartiles of each metric's distribution
    (sorted-list indexing, the events_value_iqr convention — no ntile,
    no global row window). Recency is integer days via micros div
    86400e6 (identical integer division both engines — NOT calendar
    date_diff, whose boundary-crossing count differs from complete
    days for non-midnight stamps); recency scores invert (recent =
    4). The quartile thresholds are a 1-row aggregate (users ≪
    events) cross-joined back — at 10⁹ users the same plan works with
    the thresholds from the exact-quantile query instead."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_us"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(0)
            ).cast("long").alias("monetary_cents"),
        )
        .crossJoin(
            ev.agg(
                F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mx_us")
            )
        )
        .select(
            "user_id",
            F.expr("CAST((mx_us - last_us) div 86400000000 AS BIGINT)").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    th = pu.agg(
        F.sort_array(F.collect_list("recency_days")).alias("ra"),
        F.sort_array(F.collect_list("frequency")).alias("fa"),
        F.sort_array(F.collect_list("monetary_cents")).alias("ma"),
        F.count("*").alias("n"),
    ).selectExpr(
        *[
            f"element_at({a}, CAST(1 + ({q} * (n - 1)) DIV 4 AS INT)) AS {a}q{q}"
            for a in ("ra", "fa", "ma")
            for q in (1, 2, 3)
        ]
    )

    def score(col, q1, q2, q3, invert=False):
        s = (
            F.when(F.col(col) <= F.col(q1), 1)
            .when(F.col(col) <= F.col(q2), 2)
            .when(F.col(col) <= F.col(q3), 3)
            .otherwise(4)
        )
        return (F.lit(5) - s if invert else s).cast("long")

    return pu.crossJoin(th).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        score("recency_days", "raq1", "raq2", "raq3", invert=True).alias("r"),
        score("frequency", "faq1", "faq2", "faq3").alias("f"),
        score("monetary_cents", "maq1", "maq2", "maq3").alias("m"),
    )


def q_copurchase_rules(spark, sf_dir):
    """Association-rule mining over order baskets (the market-basket
    classic): for part pairs co-occurring in ≥ 3 orders, emit
    support count, confidence(a→b) and lift — BOTH in exact integer
    MILLIONTHS (conf = 10⁶·n_ab div n_a; lift = 10⁶·n_ab·n_orders div
    (n_a·n_b)) so the scores are aggregation-order-proof cross-engine.
    Shape: one distinct-pair self-join per order (the same Σ C(k,2)
    volume as the copurchase graph build — shared at scale), one pair
    agg, two broadcast joins against the tiny per-part counts. The
    support threshold prunes BEFORE the rule expansion, so the output
    is the head of the distribution, not the quadratic tail."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = baskets.select("k").distinct().count()
    item_n = baskets.groupBy("p").agg(F.count("*").cast("long").alias("n_item"))
    a = baskets.withColumnRenamed("p", "pa")
    b = baskets.withColumnRenamed("p", "pb")
    pairs = (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    scored = (
        pairs.join(item_n.select(F.col("p").alias("pa"), F.col("n_item").alias("na")), "pa")
        .join(item_n.select(F.col("p").alias("pb"), F.col("n_item").alias("nb")), "pb")
    )
    return scored.select(
        "pa",
        "pb",
        "n_ab",
        F.expr("CAST((1000000 * n_ab) div na AS BIGINT)").alias("conf_ab_millionths"),
        F.expr("CAST((1000000 * n_ab) div nb AS BIGINT)").alias("conf_ba_millionths"),
        F.expr(
            f"CAST((1000000 * n_ab * CAST({n_orders} AS BIGINT)) div (na * nb) AS BIGINT)"
        ).alias("lift_millionths"),
    )


def q_partition_replication(spark, sf_dir):
    """Vertex-cut partition QUALITY measurement (the Libra/HDRF concern
    behind the reference's partitioner menu, SURVEY §2.3): for k = 8,
    compare vertex replication — Σ_v #distinct parts holding v — under
    (a) random edge-hash placement and (b) low-degree-anchor placement
    (every edge to the part of its LOWER-degree endpoint, which under
    the C5 orientation is exactly ``src``). Anchoring colocates all
    edges of the long tail so only hubs replicate — the degree-skew
    trade vertex-cut partitioners exist to make; the measured slot
    counts quantify it. Both placements are portable md5 arithmetic,
    so the oracle reproduces the exact placement, not a simulation."""
    o = copurchase_oriented(spark, sf_dir)
    k = 8

    def mpart(salt: str, *cols):
        return F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(salt), *cols)), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(k),
        )

    def slots(strategy: str, pcol):
        w = o.withColumn("p", pcol)
        return (
            w.select(F.col("src").alias("v"), "p")
            .unionByName(w.select(F.col("dst").alias("v"), "p"))
            .distinct()
            .agg(F.count("*").cast("long").alias("vertex_slots"))
            .select(
                F.lit(strategy).alias("strategy"),
                F.lit(k).cast("long").alias("k"),
                "vertex_slots",
            )
        )

    nv = (
        o.select(F.col("src").alias("v"))
        .unionByName(o.select(F.col("dst").alias("v")))
        .distinct()
        .agg(F.count("*").cast("long").alias("n_vertices"))
    )
    both = slots("edge_hash", mpart("ph", F.col("src"), F.col("dst"))).unionByName(
        slots("anchor_lowdeg", mpart("pv", F.col("src")))
    )
    return both.crossJoin(nv)


def q_stress_copurchase(spark, sf_dir):
    """Stress centrality from source 0 on the copurchase graph —
    Brandes' TWO-pass algorithm with every quantity a BIGINT (sigma =
    forward path counts, tau = backward DAG-path counts, stress term =
    sigma·tau). See operators/metrics.py:stress_centrality; the oracle
    unrolls both passes level-by-level."""
    from trianglecount_spark.operators.metrics import stress_centrality

    return stress_centrality(copurchase_sym(spark, sf_dir), source=0, rounds=4)


def q_link_prediction_ra(spark, sf_dir):
    """Resource-allocation link prediction in exact millionths
    (1000000 div deg(center), BIGINT sum) — the hub-damping local
    similarity index, aggregation-order-proof cross-engine. Same τ=150
    hub-center cap + matching oracle filter as q_link_prediction
    (metrics._wedge_centers); under RA the capped contract is doubly
    natural — a center above the cap contributes < 1/150 of a
    millionth-unit per pair, the scores the index itself damps."""
    from trianglecount_spark.operators.metrics import link_prediction_ra

    return link_prediction_ra(
        copurchase_sym(spark, sf_dir),
        min_common=12,
        max_center_degree=150,
    )


def q_lineitem_q6_sql(spark, sf_dir):
    """TPC-H Q6 shape through the SQL-TEXT surface: the engine's other
    public API. Registers the parquet table as a temp view and runs
    ``spark.sql(...)`` — the identical string a reference user would
    type — proving the declarative path (parser → Catalyst) serves the
    same plans as the DataFrame API. Single-table scan with three
    pushable predicates and one exact-cents aggregate; ``.explain``
    shows the filters land in PushedFilters at the parquet scan."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100
                                   + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


def q_part_avg_qty_correlated(spark, sf_dir):
    """TPC-H Q17 shape — correlated scalar subquery: lineitems whose
    quantity is below 50%% of their part's average quantity (the
    small-order tail). Spark decorrelates the subquery into an
    aggregate-then-join — the per-part avg is ONE hash agg reused
    across all probes, never a per-row subquery execution. The
    comparison stays exact: qty*100 (integer) vs the part's
    sum(qty)*50 div count (integer division both engines round the
    same way on non-negative values) — no float avg anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        F.count("*").alias("nq"),
    )
    return (
        li.join(per_part, "l_partkey")
        .where(
            F.col("l_quantity").cast("long") * 100
            < F.expr("(sq * 50) div nq")
        )
        .groupBy("l_partkey")
        .agg(
            F.count("*").cast("long").alias("n_small"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("price_cents"),
        )
    )


def q_events_sessions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn("pts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(F.col("pts").isNull(), F.lit(0))
        .when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("pts").cast("timestamp"))
            > F.lit(1800000000),
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    return gaps.groupBy("user_id").agg(
        (F.lit(1) + F.sum("new_sess")).alias("n_sessions")
    )


def q_events_transitions(spark, sf_dir):
    """First-order Markov transition counts over per-user event
    sequences — the clickstream bigram table (next-event prediction,
    funnel discovery). lead() over a window PARTITIONED by user_id
    (never global — per-user sequences are short and independent, so
    the window is a plain hash shuffle on user_id at any corpus size);
    one (from, to) partial-agg shuffle after. Ties broken by event_id
    exactly like events_sessions."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.withColumn("to_type", F.lead("event_type").over(w))
    return (
        nxt.where(F.col("to_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("to_type")
        )
        .agg(F.count("*").alias("n"))
    )


def q_events_stream_incremental(spark, sf_dir):
    """Incremental triangle maintenance over streamed micro-batches
    (streaming/incremental.py — foreachBatch, delta-proportional work,
    arrival-order attribution). The maintained totals must equal the
    batch computation exactly — which is the oracle."""
    from trianglecount_spark.streaming.incremental import incremental_triangle_count

    row = incremental_triangle_count(spark, events_pairs(spark, sf_dir), n_files=4)
    return row.select("n_edges", "n_triangles")


def q_events_stream_windows(spark, sf_dir):
    """Structured Streaming end-to-end: event-time window + watermark over
    the events table, drained with availableNow into a parquet sink and
    read back (streaming/edges_stream.py). [EXT] — the reference is
    batch-only (SURVEY §2.5)."""
    from trianglecount_spark.streaming.edges_stream import windowed_event_counts

    return windowed_event_counts(spark, sf_dir)


def q_events_stream_sessions(spark, sf_dir):
    """Stateful streaming sessionization (session_window merge state +
    watermark), availableNow-drained; the batch analog is
    q_events_sessions. [EXT]."""
    from trianglecount_spark.streaming.edges_stream import session_event_counts

    return session_event_counts(spark, sf_dir)


def q_events_stream_sliding(spark, sf_dir):
    """Streaming SLIDING-window aggregation (1h windows every 30min —
    each event in 2 windows), availableNow-drained; emission = windows
    closed by the settled watermark, enumerated closed-form by the
    oracle. [EXT]."""
    from trianglecount_spark.streaming.edges_stream import sliding_event_counts

    return sliding_event_counts(spark, sf_dir)


def q_events_stream_alarms(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running purchase spend with threshold-crossing alarm rows
    — GroupState holds one long per user, O(users) state on an
    unbounded stream. The oracle is the equivalent batch window query
    (running cents sum, emit on level increase). [EXT]."""
    from trianglecount_spark.streaming.edges_stream import spend_alarms

    return spend_alarms(spark, sf_dir, threshold_cents=5000)


def q_events_stream_upsert(spark, sf_dir):
    """foreachBatch keyed upsert (streaming MERGE pattern): per-user
    latest event + running count folded into a parquet state snapshot
    per micro-batch; associative/commutative merge ⇒ batching-
    independent final state = the closed-form latest-row-per-key query.
    [EXT] streaming/edges_stream.py:streamed_upsert_state."""
    from trianglecount_spark.streaming.edges_stream import streamed_upsert_state

    return streamed_upsert_state(spark, sf_dir)


def q_events_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix: users grouped by first-activity
    week, counted distinct per weeks-since-cohort — the standard
    retention triangle. Two hash aggregates (per-user cohort, then the
    (cohort, offset) distinct count); week buckets via date_trunc
    (ISO Monday weeks in both engines), offsets as exact day
    differences / 7."""
    ev = _t(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    cohort = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    act = ev.select("user_id", wk.alias("week")).distinct()
    return (
        act.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def q_events_user_journeys(spark, sf_dir):
    """Per-user journey strings: the full ordered event-type sequence
    per user, one hash aggregate (sort_array over collected
    (ts, event_id, type) structs — per-group in-memory sort, bounded by
    real per-user history lengths, never a global sort). The string
    form ('click>view>...') is what sequence-mining and session-model
    training consume."""
    ev = _t(spark, sf_dir, "events")
    seq = F.expr(
        "array_join(transform(sort_array(collect_list("
        "struct(ts, event_id, event_type))), x -> x.event_type), '>')"
    )
    return ev.groupBy("user_id").agg(
        seq.alias("journey"), F.count("*").alias("n_events")
    )


def q_events_props_json(spark, sf_dir):
    """JSON extraction surface (SURVEY §2.5 noted the reference has no
    json functions at all): parse the ``props`` JSON column with an
    explicit schema (``from_json`` — schema-on-read, pushdown-friendly,
    no per-row Python), then aggregate the extracted field per event
    type. Exact integers."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_if(F.col("k").isNull()).alias("n_null"),
        )
    )


def q_events_stream_attribution(spark, sf_dir):
    """Stream-STREAM interval join (streaming/edges_stream.py
    ``stream_attribution_pairs``): purchases joined to the same user's
    clicks within the preceding 30 min, watermarks on both sides. With
    watermark ≥ lookback the inner join is complete, so the drained
    output equals the batch interval join — the oracle. [EXT]."""
    from trianglecount_spark.streaming.edges_stream import stream_attribution_pairs

    return stream_attribution_pairs(spark, sf_dir)


def q_events_stream_dedup(spark, sf_dir):
    """Streaming ingest-dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type) with watermark-bounded state, availableNow-
    drained (streaming/edges_stream.py ``streamed_dedup_keys``). Emits
    the dedup key only, so the result is exactly the distinct key set —
    the oracle is closed-form SELECT DISTINCT. [EXT]."""
    from trianglecount_spark.streaming.edges_stream import streamed_dedup_keys

    return streamed_dedup_keys(spark, sf_dir)


# ---------------------------------------------------------------------------
# documents: dedup / text analysis
# ---------------------------------------------------------------------------


def q_docs_exact_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )


def q_docs_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    return w.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_types"),
    )


def q_docs_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    sw = _STOPWORDS["en"]
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    tok = w.select("doc_id", F.explode("w").alias("t"))
    return tok.groupBy("doc_id").agg(
        F.round(
            F.sum(F.when(F.col("t").isin(sw), 1).otherwise(0)) / F.count("*"), 6
        ).alias("stop_ratio"),
        F.round(F.avg(F.length("t")), 6).alias("mean_token_len"),
    )


def q_docs_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    tok = w.select("doc_id", F.explode("w").alias("t"))
    scores = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("t").isin(_STOPWORDS[lang]), 1).otherwise(0)).alias(
                f"s_{lang}"
            )
            for lang in ("en", "de", "fr", "hi")
        ]
    )
    return scores.select(
        "doc_id",
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_hi"))
            & (F.col("s_en") > 0),
            F.lit("en"),
        )
        .when(
            (F.col("s_de") >= F.col("s_fr"))
            & (F.col("s_de") >= F.col("s_hi"))
            & (F.col("s_de") > 0),
            F.lit("de"),
        )
        .when((F.col("s_fr") >= F.col("s_hi")) & (F.col("s_fr") > 0), F.lit("fr"))
        .when(F.col("s_hi") > 0, F.lit("hi"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


def q_docs_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim("text")).cast("binary")).alias("fp")
    )


def q_docs_pii_scrub(spark, sf_dir):
    """PII detection + redaction (functions/pii.py) — per-doc span
    counts by class and the md5 of the scrubbed text. The synthetic
    corpus carries no PII, so a deterministic contact block (email,
    phone, SSN, IPv4 — all derived from doc_id) is appended to 4 of
    every 5 docs first, replayed identically by the oracle; docs with
    doc_id % 5 == 0 stay untouched as the zero-match control group.
    Whole pass is row-local JVM regexp expressions — zero shuffles."""
    from trianglecount_spark.functions.pii import pii_counts, pii_redact

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    contact = F.concat(
        F.lit(" Contact user"), s(d), F.lit("@mail"), s(d % 7),
        F.lit(".example or +1 "), s(d % 800 + 100), F.lit(" 555 "),
        F.lpad(s(d % 10000), 4, "0"),
        F.lit(" ssn "), F.lpad(s(d % 1000), 3, "0"), F.lit("-"),
        F.lpad(s(d % 100), 2, "0"), F.lit("-"), F.lpad(s(d % 10000), 4, "0"),
        F.lit(" ip 10."), s(d % 256), F.lit("."), s((d * 7) % 256),
        F.lit("."), s(d % 250), F.lit(" end"),
    )
    aug = docs.select(
        "doc_id",
        F.when(d % 5 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), contact))
        .alias("t"),
    )
    t = F.col("t")
    return aug.select(
        "doc_id",
        *pii_counts(t),
        F.md5(pii_redact(t).cast("binary")).alias("red_md5"),
    )


def q_docs_jaccard_pairs(spark, sf_dir):
    from trianglecount_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(_shingles_df(spark, sf_dir), threshold=0.5)


def q_docs_ngram_jaccard(spark, sf_dir):
    """Character-5-gram Jaccard near-dup pairs (operators/dedup.py
    ``char_ngrams`` + ``jaccard_pairs``) — the sub-word complement of
    the word-shingle variant: tokenization-insensitive, so it catches
    near-dups that differ by whitespace/punctuation edits. Same
    inverted-index join shape; exact integers until one rounded
    division."""
    from trianglecount_spark.operators.dedup import char_ngrams, jaccard_pairs

    grams = char_ngrams(_t(spark, sf_dir, "documents"), n=5)
    return jaccard_pairs(grams, threshold=0.5, max_df=100)


def q_docs_window_dedup(spark, sf_dir):
    """Exact shared-window contamination pairs (operators/dedup.py
    ``window_containment_pairs``): docs sharing ≥1 identical 8-token
    window, scored by containment = shared / min-window-count — the
    substring-level dedup pass (CCNet/RefinedWeb style) that catches
    asymmetric copies symmetric Jaccard misses. Frequency-capped at
    df ≤ 10 so boilerplate windows never drive quadratic per-key pair
    expansion; the oracle applies the identical cap."""
    from trianglecount_spark.operators.dedup import window_containment_pairs

    return window_containment_pairs(
        _t(spark, sf_dir, "documents"), k=8, max_df=10
    )


def q_docs_pack_plan(spark, sf_dir):
    """Training-sequence packing plan (GPT-style concat-and-cut): docs
    are concatenated in deterministic order within each source stream
    and cut every 256 tokens; each doc reports its starting token
    offset, the training bin its first token lands in, and the offset
    within that bin. The cumulative sum runs over a window PARTITIONED
    by source — pretraining mixtures pack per-shard exactly like this,
    and the per-source window keeps the cumsum distributed (a global
    document order would serialize into one task). Exact integers
    throughout."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("tok_offset"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "tok_offset",
        F.expr("tok_offset div 256").alias("bin"),
        (F.col("tok_offset") % 256).alias("bin_offset"),
    )


def q_docs_cdc_chunks(spark, sf_dir):
    """Content-defined-chunking dedup table (operators/dedup.py
    ``content_defined_chunks``): the corpus as variable-size
    content-addressed blocks — ``chunk_hash, n_chunks, n_docs`` —
    where shared storage is every row with n_chunks > 1. Boundaries
    are local-content hashes, so edits re-align instead of shifting
    every later block (the rsync/LBFS property byte-offset blocking
    lacks). One explode + one hash agg; the oracle replays the
    identical boundary rule."""
    from trianglecount_spark.operators.dedup import content_defined_chunks

    ch = content_defined_chunks(_t(spark, sf_dir, "documents"))
    return ch.groupBy(F.md5("chunk").alias("chunk_hash")).agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def q_docs_decontamination(spark, sf_dir):
    """Benchmark decontamination scan: every training doc scored by the
    fraction of its 8-token windows that appear in the benchmark set
    (here: docs with id ≡ 0 mod 50 stand in for a held-out eval suite) —
    the pass that keeps eval answers out of pretraining data. The
    benchmark window set is tiny however large the corpus, so the probe
    is a broadcast semi-join against it; per-doc window counts are one
    partial-agg shuffle. Exact integers + one rounded division."""
    from trianglecount_spark.operators.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    wins = shingles(docs, n=8).select(
        "doc_id", F.md5(F.col("s").cast("binary")).alias("wh")
    )
    bench = wins.where(F.col("doc_id") % 50 == 0).select("wh").distinct()
    train = wins.where(F.col("doc_id") % 50 != 0)
    n_win = train.groupBy("doc_id").agg(F.count("*").alias("n_windows"))
    n_hit = (
        train.join(bench, "wh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        n_win.join(n_hit, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .withColumn(
            "frac", F.round(F.col("n_contaminated") / F.col("n_windows"), 6)
        )
    )


def q_docs_token_cms(spark, sf_dir):
    """Count-min-sketch token frequencies (operators/sketches.py):
    build the depth×width counter table in one partial-agg pass, then
    point-estimate every vocabulary token from the fixed-size sketch —
    the heavy-hitter shape that replaces exact token counting when the
    vocabulary itself is too large to shuffle. Estimates are exact
    integers (min over depth counters), so the oracle — the identical
    portable-md5 sketch in DuckDB — matches bit-for-bit, collisions
    included."""
    from trianglecount_spark.operators.sketches import cms_estimate, cms_sketch

    tok = _t(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("t")
    )
    sketch = cms_sketch(tok, "t", width=512, depth=3)
    return cms_estimate(sketch, tok.distinct(), "t", width=512, depth=3)


def q_docs_minhash_candidates(spark, sf_dir):
    from trianglecount_spark.operators.dedup import lsh_candidates, minhash_signatures

    sig = minhash_signatures(_shingles_df(spark, sf_dir), n_hashes=_MH_H)
    return lsh_candidates(sig, n_hashes=_MH_H, rows_per_band=_MH_R)


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------


def q_docs_minhash_est(spark, sf_dir):
    """Sketch-estimated Jaccard for the LSH candidate pairs: the match
    fraction of the 8 min-hash components — the estimator actually used
    at 100 TB to rank candidates WITHOUT touching the shingle sets
    again (exact Jaccard re-verification is docs_jaccard_pairs). Exact
    cross-engine: component equality is string equality of md5 minima,
    the estimate is one n/8 division."""
    from trianglecount_spark.operators.dedup import lsh_candidates, minhash_signatures

    sig = minhash_signatures(_shingles_df(spark, sf_dir), n_hashes=_MH_H)
    cand = lsh_candidates(sig, n_hashes=_MH_H, rows_per_band=_MH_R)
    sa = sig.select(
        F.col("doc_id").alias("a"), *[F.col(f"h{i}").alias(f"ha{i}") for i in range(_MH_H)]
    )
    sb = sig.select(
        F.col("doc_id").alias("b"), *[F.col(f"h{i}").alias(f"hb{i}") for i in range(_MH_H)]
    )
    n_match = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(_MH_H)
    )
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            n_match.cast("long").alias("n_match"),
            (n_match.cast("double") / F.lit(float(_MH_H))).alias("est_jaccard"),
        )
    )


def q_docs_dedup_clusters(spark, sf_dir):
    """END-TO-END near-dup deduplication — the full 100 TB training-data
    pipeline in ONE plan: word shingles → MinHash signatures → LSH band
    self-join (candidates; the only self-join, keyed on uniform md5 band
    keys so no skew) → exact Jaccard verification restricted to the
    candidate pairs (the shingle sets are re-touched ONLY for pairs that
    collided in a band — never the quadratic all-pairs join) →
    connected components over the verified similarity graph (large-star/
    small-star) → keeper election (min doc_id per cluster).

    Emits one row per clustered doc: ``doc_id, cluster, keep``. Every
    stage is a key-partitioned shuffle (doc_id / band key / component
    label); cluster sizes are bounded by real near-dup group sizes, not
    corpus size. Oracle: the identical pipeline in DuckDB — same md5
    min-hashes, bands and Jaccard arithmetic, components via an
    independent RECURSIVE min-reachable CTE — exact row-for-row."""
    from trianglecount_spark.operators.components import connected_components
    from trianglecount_spark.operators.dedup import lsh_candidates, minhash_signatures

    sh = _shingles_df(spark, sf_dir)
    sig = minhash_signatures(sh, n_hashes=_MH_H)
    cand = lsh_candidates(sig, n_hashes=_MH_H, rows_per_band=_MH_R)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("a"), "s")
    sb = sh.select(F.col("doc_id").alias("b"), "s")
    inter = (
        cand.join(sa, "a")
        .join(sb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    verified = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .where(
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6)
            >= F.lit(0.5)
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comp, _ = connected_components(verified)
    return comp.select(
        F.col("v").alias("doc_id"),
        F.col("comp").alias("cluster"),
        (F.col("v") == F.col("comp")).alias("keep"),
    )


def q_docs_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals per doc
    (functions/textqual.py): top-bigram occurrence fraction +
    duplicate-trigram fraction — the published pretraining-corpus
    boilerplate filters, as two (doc_id, gram) partial-agg shuffles.
    Oracle: identical n-gram expansion via DuckDB 1-based list
    indexing; integer arithmetic until one final round(·, 6)."""
    from trianglecount_spark.functions.textqual import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


def q_docs_cooccurrence(spark, sf_dir):
    """GloVe-style word co-occurrence counts within a ±2 token window —
    the sparse matrix an embedding trainer consumes. The pair list is
    generated POSITIONALLY in one projection per offset (a transform
    over the token array), never by a positions self-join: at 100 TB the
    self-join would shuffle every token twice and skew on stopwords,
    while this shape is scan → explode → one (a, b) partial-agg shuffle.
    Oracle: the same per-offset 1-based list expansion in DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    branches = []
    for d in (1, 2):
        w = docs.select("doc_id", F.split("text", " ").alias("w")).where(
            F.size("w") > d
        )
        branches.append(
            w.select(
                F.explode(
                    F.expr(
                        f"transform(sequence(0, size(w) - 1 - {d}), "
                        f"i -> struct(w[i] AS a, w[i + {d}] AS b))"
                    )
                ).alias("p")
            ).select("p.a", "p.b")
        )
    pairs = branches[0].unionByName(branches[1])
    return pairs.groupBy("a", "b").agg(F.count("*").alias("n"))


def q_docs_simhash(spark, sf_dir):
    from trianglecount_spark.operators.dedup import simhash64

    return simhash64(_t(spark, sf_dir, "documents"))


def q_docs_simhash_neardup(spark, sf_dir):
    """Banded SimHash near-dup pairs. The 4-band split is pigeonhole-exact
    for hamming ≤ 3, so the result equals the oracle's exhaustive
    all-pairs hamming filter."""
    from trianglecount_spark.operators.dedup import simhash64, simhash_neardup_pairs

    sim = simhash64(_t(spark, sf_dir, "documents"))
    return simhash_neardup_pairs(sim, max_hamming=3, n_bands=4)


def q_emb_knn_lsh(spark, sf_dir):
    """Approximate top-k via PORTABLE random-hyperplane LSH (the 100 TB
    scale path for emb_knn). Buckets are integer Rademacher projections
    (md5-derived ±1 planes on floor(v·1000) quantized vectors) — fully
    order-independent arithmetic, so the DuckDB oracle reproduces the
    candidate set and ranking EXACTLY; recall vs brute force is asserted
    in tests/."""
    from trianglecount_spark.operators.knn import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    return cosine_topk_lsh(qs, emb, k=5, n_planes=_LSH_P, n_tables=_LSH_T).select(
        "q", "nbr", F.round("sim", 6).alias("sim")
    )


def q_emb_knn_ivf(spark, sf_dir):
    """IVF ANN (md5-seeded centroids + one integer Lloyd pass, probe
    n=4) — portable integer arithmetic end-to-end, exactly
    oracle-checked against the same construction in DuckDB SQL."""
    from trianglecount_spark.operators.knn import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    return ivf_topk(
        qs, emb, k=5, n_centroids=_IVF_K, n_probe=_IVF_PROBE, lloyd_passes=1
    ).select("q", "nbr", F.round("sim", 6).alias("sim"))


def q_emb_knn(spark, sf_dir):
    """Exact top-k — numpy-matmul scan kernel (collected probe set,
    per-batch partial top-k, global merge; operators/knn.py)."""
    from trianglecount_spark.operators.knn import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    return cosine_topk_bruteforce(qs, emb, k=5).select(
        "q", "nbr", F.round("sim", 6).alias("sim")
    )


def q_emb_knn_quantized(spark, sf_dir):
    """Exact top-k over int8-QUANTIZED embeddings (operators/knn.py
    ``cosine_topk_quantized``) — the 4x-compressed scan used when the
    corpus no longer fits executor memory in float32. Integer dot
    products are exact BIGINTs and the similarity is three fixed-order
    IEEE ops, so unlike float cosine the ENTIRE ranking is bit-stable
    and the DuckDB oracle matches with no rounding caveat."""
    from trianglecount_spark.operators.knn import cosine_topk_quantized

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    return cosine_topk_quantized(qs, emb, k=5).select(
        "q", "nbr", "dot", F.round("sim", 6).alias("sim")
    )


def q_emb_knn_join(spark, sf_dir):
    """The LARGE-Q regime of the quantized exact top-k
    (knn.cosine_topk_quantized_join): block-pair fan-out, the query set
    never collected to the driver — bit-identical contract to
    emb_knn_quantized (same integer arithmetic), so it shares that
    oracle verbatim; registering both keeps the regime switch itself
    under the cross-engine hash gate."""
    from trianglecount_spark.operators.knn import cosine_topk_quantized_join

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    return cosine_topk_quantized_join(
        qs, emb, k=5, n_query_blocks=4, n_corpus_blocks=8
    ).select("q", "nbr", "dot", F.round("sim", 6).alias("sim"))


def q_emb_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: per query vector,
    the top-3 most-similar vectors with a DIFFERENT label — the
    negatives that actually move a contrastive loss. Runs on the int8
    quantized scan (exact BIGINT dots ⇒ bit-stable ranking), keeping
    k wide enough (25) that 3 cross-label survivors always exist before
    the label filter; the oracle applies the identical widen-then-filter
    and is exact."""
    from trianglecount_spark.operators.knn import cosine_topk_quantized

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    wide = cosine_topk_quantized(qs, emb, k=25)
    lab = emb.select("vec_id", "label")
    labeled = (
        wide.join(lab.select(F.col("vec_id").alias("q"), F.col("label").alias("ql")), "q")
        .join(lab.select(F.col("vec_id").alias("nbr"), F.col("label").alias("nl")), "nbr")
        .where(F.col("ql") != F.col("nl"))
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("nbr").asc())
    return (
        labeled.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("q", "nbr", "dot", F.round("sim", 6).alias("sim"))
    )


def q_emb_balanced_sample(spark, sf_dir):
    """Class-balanced subset selection: exactly 20 vectors per label,
    chosen by deterministic md5 rank within each label partition — the
    rebalancing pass a training mixture applies to skewed label
    distributions. Partitioned window (never global); md5 ranking makes
    the subset reproducible on any engine and partitioning."""
    emb = _t(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.concat_ws(":", F.lit("bal"), F.col("vec_id"))), "vec_id"
    )
    return (
        emb.select("vec_id", "label")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 20)
    )


def q_emb_label_spreading(spark, sf_dir):
    """Semi-supervised label spreading over the kNN graph
    (operators/lpa.py ``label_spreading``): vectors with vec_id < 100
    keep their true label, everyone else takes the 3-hop flooded mode
    of labeled kNN neighbors — small labeled set + similarity graph →
    corpus-wide weak labels. Graph = symmetrized quantized top-5
    (bit-stable, so the oracle rebuilds the identical graph and unrolls
    the same 3 synchronous rounds). Scale note: the all-vectors probe
    scan here is the oracle-exact baseline; at corpus scale the kNN
    graph construction routes through the LSH bucket join
    (operators/knn.py ``cosine_topk_lsh``) — the spreading rounds
    themselves are corpus-size-agnostic joins either way."""
    from trianglecount_spark.operators.knn import cosine_topk_quantized
    from trianglecount_spark.operators.lpa import label_spreading

    emb = _t(spark, sf_dir, "embeddings")
    topk = cosine_topk_quantized(emb, emb, k=5).select("q", "nbr")
    eg = (
        topk.select(F.col("q").alias("src"), F.col("nbr").alias("dst"))
        .unionByName(topk.select(F.col("nbr").alias("src"), F.col("q").alias("dst")))
        .distinct()
    )
    seeds = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("v"), "label"
    )
    return label_spreading(eg, seeds, rounds=3)


def q_emb_neardup_pairs(spark, sf_dir):
    """Embedding near-dup pairs via the PORTABLE-LSH candidate join +
    exact verify on candidates (knn.cosine_neardup_lsh) — the
    sub-quadratic production contract (r2 verdict #2): work is Σ
    bucket_size² per table, never N². The candidate set is
    deterministic integer arithmetic (md5 ±1 planes on floor(v·1000)),
    so the DuckDB oracle reproduces the SAME pairs bit-for-bit.
    Threshold 0.3: the driver's synthetic embeddings have no planted
    near-dups, and 0.3 yields a meaty hash-gate row set (~90 at
    sf0.01). The exact small-N path stays gated as emb_neardup_exact."""
    from trianglecount_spark.operators.knn import cosine_neardup_lsh

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_neardup_lsh(
        emb, threshold=0.3, n_planes=_LSH_P, n_tables=_LSH_T
    )


def q_emb_neardup_exact(spark, sf_dir):
    """Exact cosine near-dup pairs via BLOCKED all-pairs matmul:
    B·(B+1)/2 block-pair tasks, one numpy matmul each — no row-level
    cross join, no per-element SQL lambdas (the r1 form burned 45 s on
    2k vectors). REGIME SWITCH: this is the small-N / oracle path —
    exact but O(N²/B); at corpus scale the registered near-dup contract
    is the LSH candidate join (q_emb_neardup_pairs). Threshold 0.5: the
    tightest that yields rows on the synthetic embeddings AND whose
    round(sim, 6) boundary has no numpy-vs-DuckDB summation-order
    stragglers (0.4/0.45 each put 1-2 pairs exactly on the 6th-decimal
    boundary where np.round half-even and dot order diverge)."""
    from trianglecount_spark.operators.knn import cosine_allpairs_blocked

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_allpairs_blocked(emb, threshold=0.5, n_blocks=8)


# ---------------------------------------------------------------------------
# flagship web pipeline: pages(html) → href mining → edge table → graph ops
# ---------------------------------------------------------------------------
# The north-star input is an Iceberg pages table; here the pages are built
# DETERMINISTICALLY from the driver's `documents` table (pure doc_id
# arithmetic) so DuckDB can reconstruct the identical html strings and act
# as an independent oracle for the real mapInPandas extractor
# (functions/extract.py) and the downstream graph pipeline. Construction
# mirrors sources/pages.py: absolute + root-relative + self links, plus
# malformed anchors the miner must skip.


def web_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (url, html:binary) pages, pure column arithmetic."""
    d = _t(spark, sf_dir, "documents")
    site = F.pmod(F.col("doc_id"), F.lit(10))
    local = F.floor(F.col("doc_id") / 10).cast("long")
    t1 = F.pmod(F.col("doc_id") * 7 + 3, F.lit(997))
    url = F.format_string("https://s%d.example/d%d", site, local)
    html = F.concat(
        F.format_string("<html><head><title>Doc %d</title></head><body>\n", F.col("doc_id")),
        F.format_string(
            "<p>w%d w%d w%d</p>\n",
            F.pmod(F.col("doc_id"), F.lit(7)),
            F.pmod(F.col("doc_id"), F.lit(13)),
            F.pmod(F.col("doc_id"), F.lit(5)),
        ),
        F.format_string(
            '<a href="https://s%d.example/d%d">a</a>\n',
            F.pmod(t1, F.lit(10)),
            F.floor(t1 / 10).cast("long"),
        ),
        F.format_string('<a href="/d%d">r</a>\n', local + 1),
        F.format_string('<a href="/d%d">self</a>\n', local),
        F.lit("<a href=>broken</a><a>nohref</a>"),
        F.lit("<a href='/d9'>sq</a></body></html>"),
    )
    return d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))


def q_web_text_extraction(spark, sf_dir):
    """The input_hint per-row invariant: extractor output (url, text)
    vs the independently reconstructed golden text."""
    from trianglecount_spark.functions.extract import extract_text

    return extract_text(web_pages_from_documents(spark, sf_dir))


def q_web_edges_mined(spark, sf_dir):
    """Raw mined link table (src_url, dst_url): href parse + relative-url
    resolution, self-links retained (canonicalization is separate)."""
    from trianglecount_spark.functions.extract import extract_links

    return extract_links(web_pages_from_documents(spark, sf_dir))


def q_web_vertex_dict(spark, sf_dir):
    """Deterministic url→vid dictionary over both link endpoints (C3
    id-compaction). Runs the SCALABLE two-phase dictionary (range
    partition + offset cumsum, no global window); the oracle is plain
    row_number over sorted urls — the gate thereby proves the two-phase
    form equals the sorted-rank mapping."""
    from trianglecount_spark.functions.extract import extract_links
    from trianglecount_spark.operators.canonicalize import vertex_dictionary_scalable

    raw = extract_links(web_pages_from_documents(spark, sf_dir))
    urls = raw.select(F.col("src_url").alias("url")).unionByName(
        raw.select(F.col("dst_url").alias("url"))
    )
    return vertex_dictionary_scalable(urls, "url")


def q_web_triangle_total(spark, sf_dir):
    """End-to-end flagship: pages → mined edges → vid dictionary →
    canonicalize → degree-orient → triangle count. The dictionary is
    order-preserving (vid order == url order), so the orientation
    tie-break agrees with the oracle's url-keyed formulation."""
    from trianglecount_spark.functions.extract import edges_from_pages

    e, _verts = edges_from_pages(web_pages_from_documents(spark, sf_dir))
    oriented = orient(canonicalize_edges(e))
    return triangles_join(oriented).agg(F.count("*").alias("n_triangles"))


def q_web_pagerank(spark, sf_dir):
    """10 fixed PageRank rounds over the mined (symmetrized) web graph —
    exactly oracle-checked: the DuckDB side rebuilds the pages, mines
    the links, assigns the SAME url→vid dictionary (row_number over
    sorted urls), and unrolls the identical power iteration."""
    from trianglecount_spark.functions.extract import edges_from_pages

    e, _verts = edges_from_pages(web_pages_from_documents(spark, sf_dir))
    sym = canonicalize_edges(e)
    n = sym.select(F.col("src").alias("v")).distinct().count()
    ranks, _log = pagerank(sym, tol=0.0, max_iter=10, check_every=10, broadcast_state=True)
    return ranks.select(
        "v", F.round(F.col("rank") * F.lit(float(n)), 4).alias("rank_n")
    )


def web_directed_graph(spark, sf_dir):
    """Mined links → simple directed graph: distinct, self-loops dropped.
    The directed-analytics input (HITS, reciprocity) — unlike the
    triangle path, NOT symmetrized."""
    from trianglecount_spark.functions.extract import extract_links

    raw = extract_links(web_pages_from_documents(spark, sf_dir))
    # HITS references the edge table 2×rounds times — persist so the
    # HTML miner runs once (at crawl scale this table is a materialized
    # artifact anyway, like the mined table in edges_from_pages)
    return (
        raw.where(F.col("src_url") != F.col("dst_url"))
        .select(F.col("src_url").alias("src"), F.col("dst_url").alias("dst"))
        .distinct()
        .persist()
    )


def q_web_hits(spark, sf_dir):
    """HITS hubs & authorities, 6 exact-integer rounds over the mined
    directed web graph (operators/hits.py — unnormalized decimal
    iteration, so scores are exact BIGINTs both engines agree on
    bit-for-bit; ranking equals normalized HITS)."""
    from trianglecount_spark.operators.hits import hits

    scores = hits(web_directed_graph(spark, sf_dir), rounds=6)
    return scores.select(
        F.col("v").alias("url"),
        F.col("hub").cast("long").alias("hub"),
        F.col("auth").cast("long").alias("auth"),
    )


def q_web_hyperball(spark, sf_dir):
    """HyperBall 3-hop ball-size estimates per url over the mined
    DIRECTED web graph (operators/hyperball.py) — the neighborhood
    function behind effective-diameter / harmonic-centrality analytics
    at crawl scale. The engine propagates O(m) portable md5-HLL
    registers per vertex (never reach sets); the DuckDB oracle
    materializes the exact 3-hop reach sets (3 unrolled hop CTEs — fine
    at gate scale), sketches them once, and matches ``s_scaled`` AND the
    double ``estimate`` bit-for-bit (register max-merge over paths =
    registers of the reach set)."""
    from trianglecount_spark.operators.hyperball import hyperball

    balls = hyperball(web_directed_graph(spark, sf_dir), rounds=3)
    return balls.select(F.col("v").alias("url"), "s_scaled", "estimate")


def q_web_neighborhood_profile(spark, sf_dir):
    """Per-round neighborhood function over the mined directed web graph
    (operators/hyperball.py ``hyperball_profile``): rows (url, t,
    s_scaled) for t = 0..3 — the distance-distribution profile behind
    effective-diameter estimates, all-BIGINT so the oracle (exact
    per-round reach sets, sketched once each) matches bit-for-bit."""
    from trianglecount_spark.operators.hyperball import hyperball_profile

    prof = hyperball_profile(web_directed_graph(spark, sf_dir), rounds=3)
    return prof.select(F.col("v").alias("url"), "t", "s_scaled")


def q_web_nf_curve(spark, sf_dir):
    """Global neighborhood-function curve N(t) = Σ_v |B(v, t)| for
    t = 0..3 over the mined web graph — the curve an effective-diameter
    analysis plots (HyperBall's end product). Emitted in MILLIONTHS
    (``nf_micro``) via pure integer arithmetic: per vertex
    ``floor(ALPHA_MICRO / s_scaled)`` (integral division of the shared
    compile-time constant), then an exact BIGINT sum — no double ever
    enters, so aggregation order and float formatting can't diverge
    between engines."""
    from trianglecount_spark.operators.hyperball import hyperball_profile

    prof = hyperball_profile(web_directed_graph(spark, sf_dir), rounds=3)
    est = prof.select(
        "t",
        F.expr(
            f"CAST('{_ALPHA_MICRO}' AS DECIMAL(38,0)) div s_scaled"
        ).alias("e"),
    )
    return est.groupBy("t").agg(F.sum("e").alias("nf_micro"))


def q_web_harmonic(spark, sf_dir):
    """Per-url harmonic centrality over OUT-distances, HyperBall-style
    (Boldi & Vigna's headline application): H(v) = Σ_{t≥1} (|B(v,t)| −
    |B(v,t−1)|)/t, truncated at 3 hops. Emitted as ``h6_micro`` = 6·H in
    millionths so everything stays EXACT integers: per (v, t) the
    ball-size estimate e_t = ALPHA_MICRO div s_scaled, then the
    telescoped weighted sum −6e₀ + 3e₁ + e₂ + 2e₃ (LCM(1..3) = 6 clears
    the 1/t weights). Same register propagation as web_hyperball —
    O(m) state, never reach sets."""
    from trianglecount_spark.operators.hyperball import hyperball_profile

    prof = hyperball_profile(web_directed_graph(spark, sf_dir), rounds=3)
    e = prof.select(
        "v",
        "t",
        F.expr(f"CAST('{_ALPHA_MICRO}' AS DECIMAL(38,0)) div s_scaled").alias("e"),
    )
    w = (
        F.when(F.col("t") == 0, -6)
        .when(F.col("t") == 1, 3)
        .when(F.col("t") == 2, 1)
        .otherwise(2)
    )
    return e.groupBy(F.col("v").alias("url")).agg(
        F.sum(w * F.col("e")).cast("long").alias("h6_micro")
    )


def q_web_scc(spark, sf_dir):
    """Strongly connected components of the mined directed web graph
    (operators/scc.py — FW-BW coloring: trim, min-label color, backward
    extract). Label = min url in the SCC; the oracle computes the same
    from a recursive-CTE transitive closure (exact at gate scale)."""
    from trianglecount_spark.operators.scc import strongly_connected_components

    scc = strongly_connected_components(web_directed_graph(spark, sf_dir))
    return scc.select(F.col("v").alias("url"), "scc")


def q_web_components(spark, sf_dir):
    """Weakly connected components of the mined web graph, on STRING
    vertex keys (urls) — large-star/small-star is label-type-generic
    (all comparisons are min/least), so the same operator that labels
    int64 graphs labels url graphs; comp = lexicographic min url."""
    from trianglecount_spark.operators.components import connected_components

    comp, _log = connected_components(web_directed_graph(spark, sf_dir))
    return comp.select(F.col("v").alias("url"), "comp")


def q_web_bowtie(spark, sf_dir):
    """Bow-tie decomposition (Broder et al., WWW 2000) of the mined
    directed web graph: every url classified core / in / out / tendril /
    disconnected (operators/bowtie.py — SCC + three frontier closures).
    The oracle derives the same classes from a recursive-CTE transitive
    closure: core = largest mutual-reach class, in/out = backward/
    forward closure differences, tendril = core's weak component
    remainder."""
    from trianglecount_spark.operators.bowtie import bowtie

    return bowtie(web_directed_graph(spark, sf_dir)).select(
        F.col("v").alias("url"), "cls"
    )


def q_web_url_normalize(spark, sf_dir):
    """URL canonicalization (functions/urlnorm.py): every mined url is
    deterministically dirtied (fragment / UTM params / uppercase host /
    :443 / trailing slash, keyed by md5) and normalized back; output
    (messy, canonical). The oracle rebuilds the identical variants and
    applies an independently written SQL normalizer — for every rule the
    canonical form must agree byte-for-byte."""
    from trianglecount_spark.functions.extract import extract_links
    from trianglecount_spark.functions.urlnorm import canonical_url, messy_variant

    raw = extract_links(web_pages_from_documents(spark, sf_dir))
    urls = (
        raw.select(F.col("src_url").alias("u"))
        .unionByName(raw.select(F.col("dst_url").alias("u")))
        .distinct()
    )
    messy = urls.select(messy_variant("u").alias("messy"))
    return messy.select("messy", canonical_url("messy").alias("canonical"))


def q_web_host_graph(spark, sf_dir):
    """Domain-graph contraction: mined page-level links rolled up to
    (src_host, dst_host) with link multiplicity and distinct source
    pages — the classic Common-Crawl host-graph build. Pure string
    expr + one groupBy: fully JVM-side, one shuffle."""
    from trianglecount_spark.functions.extract import extract_links

    raw = extract_links(web_pages_from_documents(spark, sf_dir))
    host = lambda c: F.regexp_extract(c, r"^https?://([^/]+)", 1)  # noqa: E731
    return (
        raw.select(
            host("src_url").alias("src_host"), host("dst_url").alias("dst_host")
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def q_web_mirror_pages(spark, sf_dir):
    """Mirror/duplicate-page detection by content fingerprint: pages
    whose extracted BODY text (the part after the title line) collides
    under md5 — distinct urls serving the same content, the crawl-dedup
    step that runs before any graph is built. Engine side fingerprints
    the regex-extracted text; the oracle fingerprints the closed-form
    golden body — the gate therefore re-proves the extraction invariant
    through the hash. One hash agg keyed on the fingerprint."""
    from trianglecount_spark.functions.extract import extract_text

    txt = extract_text(web_pages_from_documents(spark, sf_dir))
    body = F.substring_index(F.col("text"), "\n", -1)
    return (
        txt.select("url", F.md5(body).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_pages"),
            F.min("url").alias("first_url"),
            F.max("url").alias("last_url"),
        )
        .where(F.col("n_pages") > 1)
    )


def q_web_anchor_text(spark, sf_dir):
    """Anchor-text aggregation per link TARGET — the web-search signal
    (anchor text is the linking page's description of the destination):
    (dst_url, anchor, n_refs) from `extract_links_text`, one hash agg.
    At index scale this is the anchor table fed to ranking, keyed by
    the same dst_url shuffle as the dangling-frontier pass."""
    from trianglecount_spark.functions.extract import extract_links_text

    raw = extract_links_text(web_pages_from_documents(spark, sf_dir))
    return raw.groupBy("dst_url", "anchor").agg(F.count("*").alias("n_refs"))


def q_web_dangling_links(spark, sf_dir):
    """Crawl-frontier discovery: link targets referenced by the crawl
    but not themselves crawled, with inbound reference count and the
    number of distinct referring hosts — the seed list a crawler's next
    wave starts from. Shape: one hash agg on dst_url + a left-anti join
    against the crawled url set (both sides shuffle on url; neither is
    broadcastable at 10¹²-page scale)."""
    from trianglecount_spark.functions.extract import extract_links

    pages = web_pages_from_documents(spark, sf_dir)
    crawled = pages.select("url").distinct()
    raw = extract_links(pages)
    refs = raw.groupBy(F.col("dst_url").alias("url")).agg(
        F.count("*").alias("n_refs"),
        F.countDistinct(
            F.regexp_extract("src_url", r"^https?://([^/]+)", 1)
        ).alias("n_src_hosts"),
    )
    return refs.join(crawled, "url", "left_anti")


def q_web_reciprocity(spark, sf_dir):
    """Edge reciprocity of the directed web graph: one exact row
    (n_edges, n_reciprocal, reciprocity). The reciprocal count is a
    self-semi-join on the reversed pair; the ratio is a single division
    of exact integers."""
    g = web_directed_graph(spark, sf_dir)
    rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = g.join(rev, ["src", "dst"], "left_semi").agg(
        F.count("*").alias("n_reciprocal")
    )
    n_edges = g.agg(F.count("*").alias("n_edges"))
    return n_edges.crossJoin(n_recip).select(
        "n_edges",
        "n_reciprocal",
        (F.col("n_reciprocal") / F.col("n_edges")).alias("reciprocity"),
    )


def q_web_redirects(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py pointer
    doubling, 4 doublings = chains to 16 hops). The synthetic crawl's
    redirect map is deterministic: pages whose embedded doc_id ≡ 0
    (mod 5) act as HTTP 3xx sources, Location = their min outbound
    link — both engines derive the identical map from the url shape,
    then the oracle unrolls the same 4 map-compositions."""
    from trianglecount_spark.functions.extract import extract_links
    from trianglecount_spark.operators.redirects import resolve_redirects

    mined = extract_links(web_pages_from_documents(spark, sf_dir))
    doc_id = (
        F.regexp_extract("src_url", r"/d(\d+)$", 1).cast("long") * 10
        + F.regexp_extract("src_url", r"^https://s(\d+)\.", 1).cast("long")
    )
    rmap = (
        mined.where((doc_id % 5 == 0) & (F.col("src_url") != F.col("dst_url")))
        .groupBy(F.col("src_url").alias("src"))
        .agg(F.min("dst_url").alias("dst"))
    )
    return resolve_redirects(rmap, doublings=4)


def q_web_url_templates(spark, sf_dir):
    """URL template mining: paths normalized by collapsing digit runs to
    '#', counted per (host, template) — the crawl-side structure pass
    that finds paginated/parameterized families (e.g. /d# covering
    every /d123) so schedulers can cap per-template budgets. One
    regexp projection + one hash agg; link targets included so
    templates cover the frontier, not just fetched pages."""
    from trianglecount_spark.functions.extract import extract_links

    mined = extract_links(web_pages_from_documents(spark, sf_dir))
    urls = mined.select(F.col("src_url").alias("url")).unionByName(
        mined.select(F.col("dst_url").alias("url"))
    )
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    path = F.regexp_extract("url", r"^https?://[^/]+(/.*)?$", 1)
    tmpl = F.regexp_replace(path, r"\d+", "#")
    return (
        urls.select(host.alias("host"), tmpl.alias("template"))
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
    )


def q_web_crawl_delta(spark, sf_dir):
    """Incremental recrawl delta: two deterministic crawl snapshots of
    the same site (A misses ids ≡9 mod 10, B misses ids ≡0 mod 10, and
    B sees ids ≡0 mod 7 with changed content) compared by content
    fingerprint — one full-outer join on url classifying every page as
    added / removed / changed, the incremental-indexing primitive that
    keeps a 10¹²-page index fresh without reprocessing the unchanged
    mass. Both the snapshot membership and the change marker derive
    from the url-embedded id, so the oracle rebuilds identical
    snapshots."""
    pages = web_pages_from_documents(spark, sf_dir)
    doc_id = (
        F.regexp_extract("url", r"/d(\d+)$", 1).cast("long") * 10
        + F.regexp_extract("url", r"^https://s(\d+)\.", 1).cast("long")
    )
    p = pages.select("url", "html", doc_id.alias("doc_id"))
    a = p.where(F.col("doc_id") % 10 != 9).select(
        "url", F.md5("html").alias("fpa")
    )
    marker = F.when(F.col("doc_id") % 7 == 0, F.lit(":v2")).otherwise(F.lit(""))
    b = p.where(F.col("doc_id") % 10 != 0).select(
        "url",
        F.md5(F.concat(F.col("html"), F.encode(marker, "utf-8"))).alias("fpb"),
    )
    j = a.join(b, "url", "full_outer")
    return j.select(
        "url",
        F.when(F.col("fpb").isNull(), F.lit("removed"))
        .when(F.col("fpa").isNull(), F.lit("added"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "fpa",
        "fpb",
    ).where(
        F.col("fpa").isNull() | F.col("fpb").isNull() | (F.col("fpa") != F.col("fpb"))
    ).select("url", "status")


def q_web_frontier_bloom(spark, sf_dir):
    """Crawl-frontier membership via a Bloom filter
    (operators/sketches.py): mined link targets probed against the
    fetched-url filter — \"maybe fetched\" vs \"definitely new\". The
    filter is ≤ m_bits rows however large the fetched set grows, so the
    probe join broadcasts where an exact anti-join against the full
    fetched table would shuffle both sides (that exact form is
    web_dangling_links; this is its constant-memory scale analog).
    Portable md5 bits ⇒ even false positives replay identically in the
    DuckDB oracle."""
    from trianglecount_spark.functions.extract import extract_links
    from trianglecount_spark.operators.sketches import bloom_build, bloom_maybe_contains

    pages = web_pages_from_documents(spark, sf_dir)
    mined = extract_links(pages)
    bits = bloom_build(pages, "url", m_bits=65536, k_hashes=4)
    cands = mined.select(F.col("dst_url").alias("url")).distinct()
    return bloom_maybe_contains(bits, cands, "url", m_bits=65536, k_hashes=4)


def q_web_fetch_slots(spark, sf_dir):
    """Crawl politeness scheduling: fetch slot = FIFO rank within host
    (one request per host per wave — the frontier scheduler's core
    invariant). row_number over a window PARTITIONED by host, ordered
    by url: per-host queues are independent, so the window is one hash
    shuffle on host at any frontier size — never a global window. The
    slot doubles as the round-robin wave number across hosts."""
    pages = web_pages_from_documents(spark, sf_dir)
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    w = Window.partitionBy("host").orderBy("url")
    return (
        pages.select("url", host.alias("host"))
        .withColumn("fetch_slot", F.row_number().over(w).cast("long"))
    )


def q_web_pagerank_weighted(spark, sf_dir):
    """Weighted DIRECTED PageRank over the mined link graph: edge weight
    = link multiplicity, contributions rank·w/W_out, sinks handled by
    the missing-mass closure (this graph HAS dangling urls — targets
    outside the crawl). operators/pagerank.py ``weight=``; oracle:
    the same 10 rounds unrolled with the identical weighted closure."""
    from trianglecount_spark.functions.extract import extract_links

    raw = extract_links(web_pages_from_documents(spark, sf_dir))
    wg = (
        raw.where(F.col("src_url") != F.col("dst_url"))
        .groupBy(F.col("src_url").alias("src"), F.col("dst_url").alias("dst"))
        .agg(F.count("*").alias("wt"))
        .persist()
    )
    n = (
        wg.select(F.col("src").alias("v"))
        .unionByName(wg.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    ranks, _log = pagerank(wg, tol=0.0, max_iter=10, check_every=10, weight="wt",
                        broadcast_state=True)
    return ranks.select(
        F.col("v").alias("url"),
        F.round(F.col("rank") * F.lit(float(n)), 4).alias("rank_n"),
    )


def q_emb_kmeans(spark, sf_dir):
    """Integer k-means over int8-quantized embeddings: one full Lloyd
    round (assign → floor-integer centroid update) + final assignment,
    k = 8 md5-seeded centroids — every distance an exact BIGINT, every
    updated centroid bit-identical cross-engine (floor division agrees
    on negative sums, unlike truncating div).
    operators/knn.py:kmeans_quantized."""
    from trianglecount_spark.operators.knn import kmeans_quantized

    return kmeans_quantized(
        _t(spark, sf_dir, "embeddings"), k=8, rounds=1
    )


def q_docs_curation_pipeline(spark, sf_dir):
    """END-TO-END corpus curation — the five standard pretraining
    gates composed as ONE plan, each doc tagged kept/dropped with its
    FIRST failing stage (the lineage a 100 TB curation run must emit):

      1. benchmark  — eval docs (id ≡ 0 mod 50) never train;
      2. quality    — stopword ratio < 10%% (exact test n_sw·10 < n_tok);
      3. lang       — non-English routed out (metadata column);
      4. duplicate  — exact md5 dedup, min-id keeper WITHIN the
                      surviving pool (pipeline semantics: dedup sees
                      only what earlier gates passed);
      5. contaminated — >50%% of the doc's 8-token windows appear in
                      the benchmark window set (exact 2·hits > wins).

    Every stage is a JVM expression or key-partitioned agg/semi-join;
    stages fuse into a handful of shuffles, not five passes over the
    corpus. Output: ``doc_id, keep, drop_reason``."""
    from trianglecount_spark.operators.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    sw = _STOPWORDS["en"]
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    q = tok.groupBy("doc_id").agg(
        F.sum(F.when(F.col("t").isin(sw), 1).otherwise(0)).cast("long").alias("n_sw"),
        F.count("*").cast("long").alias("n_tok"),
    )
    base = docs.select(
        "doc_id", "lang", F.md5(F.col("text").cast("binary")).alias("fp")
    ).join(q, "doc_id")
    pre = base.withColumn(
        "reason0",
        F.when(F.col("doc_id") % 50 == 0, "benchmark")
        .when(F.col("n_sw") * 10 < F.col("n_tok"), "quality")
        .when(F.col("lang") != "en", "lang"),
    )
    pool1 = pre.where(F.col("reason0").isNull())
    keepers = pool1.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    p1 = pool1.join(keepers, "fp").withColumn(
        "reason1", F.when(F.col("doc_id") != F.col("keep_id"), "duplicate")
    )
    pool2 = p1.where(F.col("reason1").isNull()).select("doc_id")
    wins = shingles(docs, n=8).select(
        "doc_id", F.md5(F.col("s").cast("binary")).alias("wh")
    )
    bench_w = wins.where(F.col("doc_id") % 50 == 0).select("wh").distinct()
    pool_w = wins.join(pool2, "doc_id", "left_semi")
    n_w = pool_w.groupBy("doc_id").agg(F.count("*").cast("long").alias("nw"))
    n_hit = (
        pool_w.join(bench_w, "wh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("nh"))
    )
    fin = (
        pool2.join(n_w, "doc_id", "left")
        .join(n_hit, "doc_id", "left")
        .withColumn(
            "reason2",
            F.when(
                F.col("nw").isNotNull()
                & (F.coalesce(F.col("nh"), F.lit(0)) * 2 > F.col("nw")),
                "contaminated",
            ),
        )
    )
    dropped_pre = pre.where(F.col("reason0").isNotNull()).select(
        "doc_id", F.lit(0).cast("long").alias("keep"), F.col("reason0").alias("drop_reason")
    )
    dropped_dup = p1.where(F.col("reason1").isNotNull()).select(
        "doc_id", F.lit(0).cast("long").alias("keep"), F.col("reason1").alias("drop_reason")
    )
    tail = fin.select(
        "doc_id",
        F.when(F.col("reason2").isNull(), 1).otherwise(0).cast("long").alias("keep"),
        F.coalesce(F.col("reason2"), F.lit("")).alias("drop_reason"),
    )
    return dropped_pre.unionByName(dropped_dup).unionByName(tail)


def q_docs_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (2 merge rounds) over the
    document corpus — pair stats on the word-frequency table, exact
    BIGINT occurrence counts, non-self-pair variant so greedy merging
    is pure set logic (functions/bpe.py). The oracle replays both
    rounds: pair formation, argmax selection, merge application with
    position renumbering."""
    from trianglecount_spark.functions.bpe import bpe_merges

    return bpe_merges(_t(spark, sf_dir, "documents"), rounds=2)


def q_docs_vocab_prune(spark, sf_dir):
    """IDF-based vocabulary pruning — the preprocessing twin of
    stopword removal for LM training corpora: tokens present in more
    than 40%% of documents carry no signal and are dropped from every
    document (exact integer test df·5 > n_docs·2); everything else is
    kept in original position order. Output ``doc_id, n_tokens,
    n_kept, pruned_text``. Shape: one posexplode, one token-keyed df
    agg (broadcastable — a vocabulary is small relative to the corpus),
    one struct-sorted per-doc rebuild — no window, no Python."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    n_docs = d.count()
    tdf = (
        toks.select("tok", "doc_id")
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    tot = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_tokens"))
    kept = (
        toks.join(tdf, "tok")
        .where(F.col("df") * 5 <= F.lit(int(n_docs)) * 2)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.expr(
                "concat_ws(' ', transform(array_sort(collect_list("
                "struct(pos, tok))), s -> s.tok))"
            ).alias("pruned_text"),
        )
    )
    return tot.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("pruned_text", F.lit("")).alias("pruned_text"),
    )


def q_web_crawl_budget(spark, sf_dir):
    """Crawl-budget apportionment: split a fixed fetch budget (10000)
    across hosts proportionally to their inbound-link counts by the
    LARGEST-REMAINDER method (Hamilton apportionment) — the standard
    exact-integer way to turn weights into a budget that sums exactly
    to B: base_i = floor(B·w_i / W), then the B − Σ base leftover slots
    go to the largest remainders (B·w_i mod W), ties to the smaller
    host name. All arithmetic is BIGINT (products ≤ B·W ≪ 2^63); the
    only window is a rank over the HOSTS table (tiny by construction —
    hosts, not pages), so nothing here is a scale hazard."""
    from trianglecount_spark.functions.extract import extract_links

    budget = 10000
    raw = extract_links(web_pages_from_documents(spark, sf_dir))
    hx = "^https?://([^/]+)"
    w = (
        raw.groupBy(F.regexp_extract("dst_url", hx, 1).alias("host"))
        .agg(F.count("*").cast("long").alias("wt"))
    )
    tot = w.agg(F.sum("wt").cast("long").alias("W"))
    scored = w.crossJoin(tot).select(
        "host",
        "wt",
        F.expr(f"CAST(({budget} * wt) div W AS BIGINT)").alias("base"),
        F.expr(f"CAST(({budget} * wt) % W AS BIGINT)").alias("rem"),
    )
    leftover = scored.agg(
        (F.lit(budget) - F.sum("base")).cast("long").alias("slots")
    )
    ranked = scored.crossJoin(leftover).select(
        "host",
        "wt",
        "base",
        (
            F.row_number().over(
                Window.orderBy(F.col("rem").desc(), F.col("host").asc())
            )
            <= F.col("slots")
        ).cast("long").alias("extra"),
    )
    return ranked.select(
        "host", "wt", (F.col("base") + F.col("extra")).cast("long").alias("budget")
    )


def q_web_boilerplate(spark, sf_dir):
    """Line-frequency boilerplate removal per host (the CCNet/C4
    preprocessing step): drop lines on more than half the host's pages
    (template chrome), keep page-specific content in original order.
    functions/extract.py:remove_boilerplate_lines."""
    from trianglecount_spark.functions.extract import remove_boilerplate_lines

    return remove_boilerplate_lines(web_pages_from_documents(spark, sf_dir))


def q_web_host_pagerank(spark, sf_dir):
    """Weighted PageRank over the CONTRACTED host graph — the standard
    crawl-prioritization signal (host-level authority is far cheaper
    than url-level PR on 10¹² pages: the contracted graph is orders of
    magnitude smaller and hub-url skew collapses into host weights).
    Composition of two registered operators: host contraction (one
    regexp + hash agg) then operators/pagerank.py ``weight=`` with the
    missing-mass closure — intra-host links dropped at the HOST level
    so the walk measures cross-host endorsement only."""
    from trianglecount_spark.functions.extract import extract_links

    raw = extract_links(web_pages_from_documents(spark, sf_dir))
    hx = "^https?://([^/]+)"
    wg = (
        raw.select(
            F.regexp_extract("src_url", hx, 1).alias("src"),
            F.regexp_extract("dst_url", hx, 1).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("wt"))
        .persist()
    )
    n = (
        wg.select(F.col("src").alias("v"))
        .unionByName(wg.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    ranks, _log = pagerank(wg, tol=0.0, max_iter=10, check_every=10, weight="wt",
                        broadcast_state=True)
    return ranks.select(
        F.col("v").alias("host"),
        F.round(F.col("rank") * F.lit(float(n)), 4).alias("rank_n"),
    )


def q_triangle_weight_total(spark, sf_dir):
    """WEIGHTED triangle count: Σ over triangles of min(w_uv, w_vw,
    w_uw) where w = co-purchase multiplicity — the strength-of-cohesion
    variant (a heavily-reinforced triangle counts more than an
    incidental one; min is the standard bottleneck semantics). Same
    wedge join + closure semi-join as the unweighted count, with each
    edge's exact-integer weight carried through and the min folded at
    the match — one extra LEAST over three BIGINTs per triangle, no new
    shuffle. Orientation still prunes the wedge volume to Σ deg+².
    operators/triangles.py:weighted_triangle_total."""
    from trianglecount_spark.operators.triangles import weighted_triangle_total

    return weighted_triangle_total(copurchase_raw(spark, sf_dir))


def q_katz_copurchase(spark, sf_dir):
    """Katz centrality with attenuation β = 1/4 truncated at walk
    length 3, in EXACT integer millionths: katz_m(v) = Σ_{i=1..3}
    walks_i(v) · (1000000 div 4^i), where walks_i(v) = number of
    length-i walks ending at v (r_i = A·r_{i−1}, r_0 = 1 — exact
    BIGINTs). Each power iteration is one join + one sum-agg keyed on
    the vertex id (the same shuffle key every round). Truncated-Katz
    is the standard scalable form — full Katz needs the spectral
    radius; the truncation IS the deterministic contract here.
    operators/metrics.py:katz_centrality."""
    from trianglecount_spark.operators.metrics import katz_centrality

    return katz_centrality(copurchase_sym(spark, sf_dir), beta_inv=4, rounds=3)


# ---------------------------------------------------------------------------
# multimodal plumbing queries (driver-visible; media derived from documents)
# ---------------------------------------------------------------------------


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media(media_id, kind, payload:binary, meta) fixture:
    payload = utf-8 text bytes, kind/meta pure doc_id arithmetic."""
    d = _t(spark, sf_dir, "documents")
    kind = F.expr(
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
    )
    meta = F.map_from_arrays(
        F.array(F.lit("n_frames")),
        F.array((F.lit(30) + F.pmod("doc_id", F.lit(100))).cast("string")),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def q_media_frame_plan(spark, sf_dir):
    """Video frame-sampling plan (metadata-driven explode — the decode
    fan-out Spark plans and partitions; decode itself is stubbed, see
    operators/multimodal.py)."""
    from trianglecount_spark.operators.multimodal import frame_sample_plan

    return frame_sample_plan(media_from_documents(spark, sf_dir), every_n=10)


def q_media_features(spark, sf_dir):
    """Deterministic fake featurizer over binary payloads (real Arrow
    batch shape). Exactly oracle-checked: features are hash-uniform
    u32/2³² values (every step exact or correctly rounded — see
    operators/multimodal.fake_image_features), reproduced in DuckDB via
    sha256(text). The float32 feature widens to double exactly before
    rounding, matching the oracle's CAST chain."""
    from trianglecount_spark.operators.multimodal import fake_image_features

    feats = fake_image_features(media_from_documents(spark, sf_dir), dim=16)
    return feats.select(
        "media_id",
        "kind",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
    )


# DuckDB reconstruction of the same pages + mining rules.
_WEB = """
WITH pg AS (
  SELECT doc_id,
         'https://s' || (doc_id % 10) || '.example/d' || (doc_id // 10) AS url,
         '<html><head><title>Doc ' || doc_id || '</title></head><body>' || chr(10) ||
         '<p>w' || (doc_id % 7) || ' w' || (doc_id % 13) || ' w' || (doc_id % 5)
           || '</p>' || chr(10) ||
         '<a href="https://s' || (((doc_id * 7 + 3) % 997) % 10) || '.example/d'
           || (((doc_id * 7 + 3) % 997) // 10) || '">a</a>' || chr(10) ||
         '<a href="/d' || (doc_id // 10 + 1) || '">r</a>' || chr(10) ||
         '<a href="/d' || (doc_id // 10) || '">self</a>' || chr(10) ||
         '<a href=>broken</a><a>nohref</a>' ||
         '<a href=''/d9''>sq</a></body></html>' AS html
  FROM documents
),
hrefs AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
  FROM pg
),
mined AS (
  SELECT src_url,
         CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
              WHEN href LIKE '/%' THEN
                regexp_extract(src_url, '^(https?://[^/]+)', 1) || href
         END AS dst_url
  FROM hrefs
  WHERE href <> '' AND (href LIKE 'http://%' OR href LIKE 'https://%'
                        OR href LIKE '/%')
)
"""

_WEB_GRAPH = _WEB + """
, und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src_url AS src, dst_url AS dst FROM mined WHERE src_url <> dst_url
    UNION ALL
    SELECT dst_url AS src, src_url AS dst FROM mined WHERE src_url <> dst_url
  )
),
deg AS (SELECT dst AS v, count(*) AS deg FROM und GROUP BY 1),
o AS (
  SELECT e.src, e.dst FROM und e
  JOIN deg ds ON ds.v = e.src JOIN deg dd ON dd.v = e.dst
  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.dst < e.src)
)
"""


def _qknn_sql(qfilter: str = "a.vec_id < 20") -> str:
    """Shared quantized-scan oracle prefix (emb_knn_quantized,
    emb_hard_negatives, emb_label_spreading): int8 quantization, exact
    BIGINT dots, 3-IEEE-op similarity, dense rank per query — mirrors
    operators/knn.py quantize_int8_vectors + cosine_topk_quantized
    bit-for-bit. ``qfilter`` restricts the probe side."""
    return (
        "WITH e AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / greatest("
        "list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))), "
        "1e-300))) AS INT)) AS qvec FROM embeddings), "
        "n AS (SELECT vec_id, qvec, CAST(list_sum(list_transform(qvec, "
        "x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS qn2 FROM e), "
        "s AS (SELECT a.vec_id AS q, b.vec_id AS nbr, "
        "CAST(list_sum(list_transform(list_zip(a.qvec, b.qvec), "
        "p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT) AS dot, "
        "a.qn2 AS qa2, b.qn2 AS cb2 FROM n a, n b "
        f"WHERE {qfilter} AND a.vec_id <> b.vec_id "
        "AND a.qn2 > 0 AND b.qn2 > 0), "
        "r AS (SELECT q, nbr, dot, dot / (sqrt(qa2) * sqrt(cb2)) AS sim, "
        "row_number() OVER (PARTITION BY q ORDER BY "
        "dot / (sqrt(qa2) * sqrt(cb2)) DESC, nbr ASC) AS rk FROM s)"
    )


_QKNN = _qknn_sql()


def _bpe_sql(rounds: int = 2) -> str:
    """Oracle for docs_bpe_merges: both BPE rounds unrolled — word
    frequency table, char explode (constant series bound; synthetic
    words are short), per-round pair counts + argmax + merge rewrite
    with per-word renumbering. Non-self-pair variant ⇒ matches never
    overlap ⇒ the rewrite is exact set logic (functions/bpe.py)."""
    sql = (
        "WITH wds AS (SELECT w, CAST(count(*) AS BIGINT) AS wn FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
        "WHERE len(w) > 0 GROUP BY 1), "
        "t1 AS (SELECT w, wn, t.i AS pos, substr(w, t.i, 1) AS tok "
        "FROM wds CROSS JOIN generate_series(1, 32) t(i) WHERE t.i <= len(w))"
    )
    for r in range(1, rounds + 1):
        sql += (
            f", p{r} AS (SELECT a.w, a.wn, a.pos, a.tok AS ta, b.tok AS tb "
            f"FROM t{r} a JOIN t{r} b ON b.w = a.w AND b.pos = a.pos + 1)"
            f", b{r} AS (SELECT ta, tb, CAST(sum(wn) AS BIGINT) AS c "
            f"FROM p{r} WHERE ta <> tb GROUP BY 1, 2 "
            f"ORDER BY c DESC, ta ASC, tb ASC LIMIT 1)"
            f", m{r} AS (SELECT p.w, p.pos FROM p{r} p, b{r} x "
            f"WHERE p.ta = x.ta AND p.tb = x.tb)"
            f", r{r} AS (SELECT t.w, t.wn, t.pos, "
            f"CASE WHEN m.pos IS NOT NULL THEN (SELECT ta || tb FROM b{r}) "
            f"ELSE t.tok END AS tok "
            f"FROM t{r} t LEFT JOIN m{r} m ON m.w = t.w AND m.pos = t.pos "
            f"WHERE NOT EXISTS (SELECT 1 FROM m{r} x WHERE x.w = t.w "
            f"AND x.pos = t.pos - 1))"
            f", t{r + 1} AS MATERIALIZED (SELECT w, wn, row_number() OVER "
            f"(PARTITION BY w ORDER BY pos) AS pos, tok FROM r{r})"
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS step, ta AS left_sym, tb AS right_sym, "
        f"ta || tb AS merged, c AS n_occurrences FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return sql + " " + selects


def _kmeans_sql(k: int = 8, rounds: int = 1, dim: int = 64, salt: str = "km") -> str:
    """Oracle for emb_kmeans: the same quantization CTEs as _qknn_sql,
    md5-ordered seed selection, then each Lloyd round unrolled —
    exact-BIGINT squared-L2 assignment (ties to the smaller cid) and
    positional floor(sum/count) centroid update over generate_series
    (the synthetic embeddings are ``dim``-wide)."""
    d2 = (
        "CAST(list_sum(list_transform(list_zip(q.qvec, c.cvec), "
        "p -> (CAST(p[1] AS BIGINT) - p[2]) * (CAST(p[1] AS BIGINT) - p[2])))"
        " AS BIGINT)"
    )
    sql = (
        "WITH e AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / greatest("
        "list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))), "
        "1e-300))) AS INT)) AS qvec FROM embeddings), "
        "n AS (SELECT vec_id, qvec, CAST(list_sum(list_transform(qvec, "
        "x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS qn2 FROM e), "
        "nq AS (SELECT vec_id, qvec FROM n WHERE qn2 > 0), "
        f"sd AS (SELECT vec_id, qvec, md5('{salt}:' || vec_id) AS h FROM nq), "
        "c0 AS (SELECT cid, list_transform(cvec, x -> CAST(x AS BIGINT)) "
        "AS cvec FROM (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 "
        f"AS cid, qvec AS cvec FROM sd) WHERE cid < {k})"
    )
    for r in range(1, rounds + 1):
        sql += (
            f", s{r} AS (SELECT q.vec_id AS vid, c.cid, {d2} AS d2 "
            f"FROM nq q CROSS JOIN c{r - 1} c)"
            f", m{r} AS (SELECT vid, cid FROM (SELECT vid, cid, "
            f"row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rk "
            f"FROM s{r}) WHERE rk = 1)"
            f", u{r} AS (SELECT m.cid, t.i, CAST(floor(sum(q.qvec[t.i]) "
            f"* 1.0 / count(*)) AS BIGINT) AS cval FROM m{r} m "
            f"JOIN nq q ON q.vec_id = m.vid "
            f"CROSS JOIN generate_series(1, {dim}) t(i) GROUP BY 1, 2)"
            f", c{r} AS (SELECT cid, list(cval ORDER BY i) AS cvec "
            f"FROM u{r} GROUP BY 1)"
        )
    f = rounds
    return sql + (
        f", sf AS (SELECT q.vec_id AS vid, c.cid, {d2} AS d2 "
        f"FROM nq q CROSS JOIN c{f} c) "
        "SELECT vid AS vec_id, cid AS cluster, d2 FROM ("
        "SELECT vid, cid, d2, row_number() OVER (PARTITION BY vid "
        "ORDER BY d2, cid) AS rk FROM sf) WHERE rk = 1"
    )


def _label_spreading_sql(rounds: int = 3) -> str:
    """Oracle for emb_label_spreading: the full quantized top-5 graph
    (probe filter TRUE), symmetrized, then ``rounds`` synchronous
    clamped-mode rounds unrolled."""
    sql = _qknn_sql("TRUE") + (
        ", eg AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT q AS src, nbr AS dst FROM r WHERE rk <= 5 "
        "UNION ALL SELECT nbr AS src, q AS dst FROM r WHERE rk <= 5)), "
        "l0 AS (SELECT vec_id AS v, label FROM embeddings WHERE vec_id < 100)"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", nb{i} AS (SELECT e.dst AS v, l.label FROM eg e "
            f"JOIN l{i - 1} l ON l.v = e.src)"
            f", cn{i} AS (SELECT v, label, count(*) AS c FROM nb{i} GROUP BY 1, 2)"
            f", cd{i} AS (SELECT v, label FROM ("
            f"SELECT v, label, row_number() OVER (PARTITION BY v "
            f"ORDER BY c DESC, label ASC) AS rk2 FROM cn{i}) WHERE rk2 = 1)"
            f", l{i} AS MATERIALIZED (SELECT v, label FROM l0 "
            f"UNION ALL SELECT c.v, c.label FROM cd{i} c "
            f"WHERE c.v NOT IN (SELECT v FROM l0))"
        )
    return sql + f" SELECT v, label FROM l{rounds}"


def _redirects_sql(k: int = 4) -> str:
    """Oracle for web_redirects: the deterministic redirect map (doc_id
    ≡ 0 mod 5 sources, min outbound Location) composed with itself k
    times — pointer doubling unrolled, hops summed exactly."""
    sql = _WEB + (
        ", m0 AS (SELECT src_url AS v, min(dst_url) AS nxt, "
        "CAST(1 AS BIGINT) AS h FROM mined "
        "WHERE src_url <> dst_url AND ("
        "CAST(regexp_extract(src_url, '/d(\\d+)$', 1) AS BIGINT) * 10 + "
        "CAST(regexp_extract(src_url, '^https://s(\\d+)\\.', 1) AS BIGINT)"
        ") % 5 = 0 GROUP BY 1)"
    )
    for r in range(1, k + 1):
        sql += (
            f", m{r} AS (SELECT a.v, coalesce(b.nxt, a.nxt) AS nxt, "
            f"a.h + coalesce(b.h, 0) AS h "
            f"FROM m{r - 1} a LEFT JOIN m{r - 1} b ON b.v = a.nxt)"
        )
    return sql + f" SELECT v AS src, nxt AS final, h AS hops FROM m{k}"


def _wpr_sql(
    k: int = 10,
    alpha: float = 0.85,
    digits: int = 4,
    wg_sql: str | None = None,
    label: str = "url",
) -> str:
    """Weighted directed PageRank (operators/pagerank.py ``weight=``)
    unrolled over the mined link graph with multiplicity weights —
    identical missing-mass closure as _pagerank_sql, per-edge fraction
    wt/W_out (exact-integer W_out, one IEEE division per edge).
    ``wg_sql`` overrides the weighted-graph CTE body (host PageRank
    contracts urls to hosts there; default = url-level multiplicity)."""
    ctes = [
        "wg AS MATERIALIZED ("
        + (
            wg_sql
            or (
                "SELECT src_url AS src, dst_url AS dst, "
                "CAST(count(*) AS BIGINT) AS wt FROM mined "
                "WHERE src_url <> dst_url GROUP BY 1, 2"
            )
        )
        + ")",
        "verts AS MATERIALIZED (SELECT src AS v FROM wg UNION SELECT dst FROM wg)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts)",
        (
            "ew AS MATERIALIZED (SELECT src, dst, CAST(wt AS DOUBLE) / "
            "(sum(wt) OVER (PARTITION BY src)) AS w FROM wg)"
        ),
        "pr0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) / (SELECT c FROM nn) AS rank FROM verts)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT e.dst AS v, CAST({alpha} AS DOUBLE) * sum(p.rank * e.w) AS rt "
            f"FROM ew e JOIN pr{i - 1} p ON p.v = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"pr{i} AS MATERIALIZED (SELECT verts.v, COALESCE(t{i}.rt, 0) + "
            f"(CAST(1.0 AS DOUBLE) - (SELECT sum(rt) FROM t{i})) / (SELECT c FROM nn) AS rank "
            f"FROM verts LEFT JOIN t{i} ON t{i}.v = verts.v)"
        )
    return (
        _WEB
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT v AS {label}, round(rank * (SELECT c FROM nn), {digits}) AS rank_n FROM pr{k}"
    )


# directed web graph for HITS / reciprocity oracles
_WEB_DIR = _WEB + """
, g AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM mined
        WHERE src_url <> dst_url)
"""


def _hits_sql(rounds: int) -> str:
    """Unrolled exact-integer HITS over _WEB_DIR's ``g`` — the DuckDB
    mirror of operators/hits.hits (HUGEINT accumulators ↔ Spark
    decimal(38,0); final CAST to BIGINT so pandas keeps int64)."""
    sql = _WEB_DIR + (
        ", vset AS (SELECT src AS v FROM g UNION SELECT dst FROM g)"
        ", h0 AS (SELECT v, CAST(1 AS HUGEINT) AS hub FROM vset)"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", a{i} AS (SELECT vs.v, COALESCE(s.a, CAST(0 AS HUGEINT)) AS auth "
            f"FROM vset vs LEFT JOIN (SELECT g.dst AS v, sum(h.hub) AS a "
            f"FROM g JOIN h{i - 1} h ON h.v = g.src GROUP BY 1) s ON s.v = vs.v)"
            f", h{i} AS (SELECT vs.v, COALESCE(s.h, CAST(0 AS HUGEINT)) AS hub "
            f"FROM vset vs LEFT JOIN (SELECT g.src AS v, sum(a.auth) AS h "
            f"FROM g JOIN a{i} a ON a.v = g.dst GROUP BY 1) s ON s.v = vs.v)"
        )
    return sql + (
        f" SELECT h{rounds}.v AS url, CAST(h{rounds}.hub AS BIGINT) AS hub, "
        f"CAST(a{rounds}.auth AS BIGINT) AS auth "
        f"FROM h{rounds} JOIN a{rounds} ON h{rounds}.v = a{rounds}.v"
    )


# ---------------------------------------------------------------------------
# registry + oracle SQL
# ---------------------------------------------------------------------------


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "copurchase_edges": q_copurchase_edges,
        "degrees": q_degrees,
        "degree_histogram": q_degree_histogram,
        "degree_powerlaw": q_degree_powerlaw,
        "oriented_edges": q_oriented_edges,
        "wedge_count": q_wedge_count,
        "triangle_total": q_triangle_total,
        "triangle_total_kernel": q_triangle_total_kernel,
        "triangle_total_metis": q_triangle_total_metis,
        "triangle_total_arrays": q_triangle_total_arrays,
        "triangles_per_vertex": q_triangles_per_vertex,
        "top_degree": q_top_degree,
        "triangle_total_bipartite": q_triangle_total_bipartite,
        "events_edges": q_events_edges,
        "events_triangle_total": q_events_triangle_total,
        "pagerank_copurchase": q_pagerank_copurchase,
        "components_copurchase": q_components_copurchase,
        "lpa_copurchase": q_lpa_copurchase,
        "mis_copurchase": q_mis_copurchase,
        "coloring_copurchase": q_coloring_copurchase,
        "matching_copurchase": q_matching_copurchase,
        "coarsen_copurchase": q_coarsen_copurchase,
        "heavy_matching_coarse": q_heavy_matching_coarse,
        "sp_counts_copurchase": q_sp_counts_copurchase,
        "stress_copurchase": q_stress_copurchase,
        "link_prediction_ra": q_link_prediction_ra,
        "katz_copurchase": q_katz_copurchase,
        "partition_replication": q_partition_replication,
        "copurchase_rules": q_copurchase_rules,
        "events_rfm": q_events_rfm,
        "densest_subgraph": q_densest_subgraph,
        "triangle_weight_total": q_triangle_weight_total,
        "web_host_pagerank": q_web_host_pagerank,
        "web_boilerplate": q_web_boilerplate,
        "web_crawl_budget": q_web_crawl_budget,
        "docs_vocab_prune": q_docs_vocab_prune,
        "docs_bpe_merges": q_docs_bpe_merges,
        "docs_curation_pipeline": q_docs_curation_pipeline,
        "emb_kmeans": q_emb_kmeans,
        "orders_priority_exists": q_orders_priority_exists,
        "lineitem_q6_sql": q_lineitem_q6_sql,
        "part_avg_qty_correlated": q_part_avg_qty_correlated,
        "orders_rolling_30d": q_orders_rolling_30d,
        "part_set_ops": q_part_set_ops,
        "events_value_iqr": q_events_value_iqr,
        "events_zorder_stats": q_events_zorder_stats,
        "triangle_list_sample": q_triangle_list_sample,
        "docs_quality_deciles": q_docs_quality_deciles,
        "modularity_lpa": q_modularity_lpa,
        "pagerank_exact10": q_pagerank_exact10,
        "components_nation": q_components_nation,
        "lpa_nation": q_lpa_nation,
        "lineitem_agg": q_lineitem_agg,
        "orders_revenue_topn": q_orders_revenue_topn,
        "region_nation_volume": q_region_nation_volume,
        "events_sessions": q_events_sessions,
        "events_transitions": q_events_transitions,
        "events_props_json": q_events_props_json,
        "events_user_journeys": q_events_user_journeys,
        "events_cohort_retention": q_events_cohort_retention,
        "events_stream_incremental": q_events_stream_incremental,
        "events_stream_windows": q_events_stream_windows,
        "events_stream_sessions": q_events_stream_sessions,
        "events_stream_sliding": q_events_stream_sliding,
        "events_stream_alarms": q_events_stream_alarms,
        "events_stream_upsert": q_events_stream_upsert,
        "events_stream_dedup": q_events_stream_dedup,
        "events_stream_attribution": q_events_stream_attribution,
        "clustering_coeff": q_clustering_coeff,
        "kcore_suppliers": q_kcore_suppliers,
        "coreness_copurchase": q_coreness_copurchase,
        "edge_support": q_edge_support,
        "ktruss_copurchase": q_ktruss_copurchase,
        "butterflies_suppliers": q_butterflies_suppliers,
        "graph_summary": q_graph_summary,
        "link_prediction": q_link_prediction,
        "link_prediction_exact": q_link_prediction_exact,
        "events_attribution": q_events_attribution,
        "events_error_overlap": q_events_error_overlap,
        "clique4": q_clique4,
        "square_count": q_square_count,
        "degree_assortativity": q_degree_assortativity,
        "docs_top_tokens": q_docs_top_tokens,
        "docs_inverted_index": q_docs_inverted_index,
        "ppr_copurchase": q_ppr_copurchase,
        "bfs_copurchase": q_bfs_copurchase,
        "sssp_copurchase": q_sssp_copurchase,
        "web_hyperball": q_web_hyperball,
        "web_harmonic": q_web_harmonic,
        "web_neighborhood_profile": q_web_neighborhood_profile,
        "web_nf_curve": q_web_nf_curve,
        "walks_copurchase": q_walks_copurchase,
        "neighbor_sample_copurchase": q_neighbor_sample_copurchase,
        "docs_repetition": q_docs_repetition,
        "docs_cooccurrence": q_docs_cooccurrence,
        "triangle_estimate_sampled": q_triangle_estimate_sampled,
        "lineitem_rollup": q_lineitem_rollup,
        "lineitem_cube": q_lineitem_cube,
        "lineitem_stats": q_lineitem_stats,
        "docs_sample_stratified": q_docs_sample_stratified,
        "docs_tfidf_top": q_docs_tfidf_top,
        "events_user_hll": q_events_user_hll,
        "events_value_outliers": q_events_value_outliers,
        "events_rolling_avg": q_events_rolling_avg,
        "events_top3_per_user": q_events_top3_per_user,
        "events_value_quantiles": q_events_value_quantiles,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_token_stats": q_docs_token_stats,
        "docs_quality": q_docs_quality,
        "docs_lang_id": q_docs_lang_id,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_pii_scrub": q_docs_pii_scrub,
        "docs_jaccard_pairs": q_docs_jaccard_pairs,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "docs_window_dedup": q_docs_window_dedup,
        "docs_token_cms": q_docs_token_cms,
        "docs_pack_plan": q_docs_pack_plan,
        "docs_decontamination": q_docs_decontamination,
        "docs_cdc_chunks": q_docs_cdc_chunks,
        "docs_minhash_candidates": q_docs_minhash_candidates,
        "docs_minhash_est": q_docs_minhash_est,
        "docs_dedup_clusters": q_docs_dedup_clusters,
        "events_funnel": q_events_funnel,
        "events_pivot": q_events_pivot,
        "docs_simhash": q_docs_simhash,
        "docs_simhash_neardup": q_docs_simhash_neardup,
        "emb_knn_lsh": q_emb_knn_lsh,
        "emb_knn_ivf": q_emb_knn_ivf,
        "emb_knn": q_emb_knn,
        "emb_knn_quantized": q_emb_knn_quantized,
        "emb_knn_join": q_emb_knn_join,
        "emb_hard_negatives": q_emb_hard_negatives,
        "emb_label_spreading": q_emb_label_spreading,
        "emb_balanced_sample": q_emb_balanced_sample,
        "emb_neardup_pairs": q_emb_neardup_pairs,
        "emb_neardup_exact": q_emb_neardup_exact,
        "web_text_extraction": q_web_text_extraction,
        "web_edges_mined": q_web_edges_mined,
        "web_vertex_dict": q_web_vertex_dict,
        "web_triangle_total": q_web_triangle_total,
        "web_pagerank": q_web_pagerank,
        "web_hits": q_web_hits,
        "web_scc": q_web_scc,
        "web_components": q_web_components,
        "web_bowtie": q_web_bowtie,
        "web_url_normalize": q_web_url_normalize,
        "web_pagerank_weighted": q_web_pagerank_weighted,
        "web_redirects": q_web_redirects,
        "web_fetch_slots": q_web_fetch_slots,
        "web_frontier_bloom": q_web_frontier_bloom,
        "web_crawl_delta": q_web_crawl_delta,
        "web_url_templates": q_web_url_templates,
        "web_host_graph": q_web_host_graph,
        "web_mirror_pages": q_web_mirror_pages,
        "web_anchor_text": q_web_anchor_text,
        "web_dangling_links": q_web_dangling_links,
        "web_reciprocity": q_web_reciprocity,
        "media_frame_plan": q_media_frame_plan,
        "media_features": q_media_features,
    }


def _sw_pred(col: str, words: list[str]) -> str:
    return "(" + " OR ".join(f"{col} = '{w}'" for w in words) + ")"


def _pagerank_sql(k: int = 10, alpha: float = 0.85, prefix: str = _CP, digits: int = 4) -> str:
    """The engine's PageRank (operators/pagerank.py) unrolled as ``k``
    chained CTEs over a symmetric edge table ``und`` supplied by
    ``prefix`` — identical damping and missing-mass closure, all
    arithmetic in DOUBLE (DuckDB decimal literals are cast explicitly so
    both engines run the same IEEE-754 ops). Final ranks scaled by N and
    rounded to ``digits`` decimals (4 by default — see q_pagerank_exact10
    on boundary-collision risk)."""
    # AS MATERIALIZED: DuckDB otherwise inlines every CTE reference, and
    # the chain re-expands the whole copurchase derivation 2^k times.
    ctes = [
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts)",
        "ew AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) / (count(*) OVER (PARTITION BY src)) AS w FROM und)",
        "pr0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) / (SELECT c FROM nn) AS rank FROM verts)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT e.dst AS v, CAST({alpha} AS DOUBLE) * sum(p.rank * e.w) AS rt "
            f"FROM ew e JOIN pr{i - 1} p ON p.v = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"pr{i} AS MATERIALIZED (SELECT verts.v, COALESCE(t{i}.rt, 0) + "
            f"(CAST(1.0 AS DOUBLE) - (SELECT sum(rt) FROM t{i})) / (SELECT c FROM nn) AS rank "
            f"FROM verts LEFT JOIN t{i} ON t{i}.v = verts.v)"
        )
    return (
        prefix
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT v, round(rank * (SELECT c FROM nn), {digits}) AS rank_n FROM pr{k}"
    )


def _ppr_sql(
    k: int = 10,
    alpha: float = 0.85,
    prefix: str = _CP,
    digits: int = 4,
    seed_mod: int = 50,
) -> str:
    """Personalized PageRank (operators/pagerank.py ``teleport``)
    unrolled as ``k`` chained CTEs: teleport uniform over the seed set
    {v : v % seed_mod == 0}, missing mass redistributed by the seed
    vector — identical IEEE-754 op tree to the engine's general closure
    path."""
    seed_s = (
        f"CASE WHEN v % {seed_mod} = 0 THEN (SELECT sv FROM ns) "
        "ELSE CAST(0.0 AS DOUBLE) END"
    )
    ctes = [
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts)",
        f"ns AS MATERIALIZED (SELECT CAST(1.0 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS sv "
        f"FROM verts WHERE v % {seed_mod} = 0)",
        "ew AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) / "
        "(count(*) OVER (PARTITION BY src)) AS w FROM und)",
        f"pr0 AS MATERIALIZED (SELECT v, {seed_s} AS rank FROM verts)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT e.dst AS v, CAST({alpha} AS DOUBLE) * "
            f"sum(p.rank * e.w) AS rt "
            f"FROM ew e JOIN pr{i - 1} p ON p.v = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"pr{i} AS MATERIALIZED (SELECT verts.v, COALESCE(t{i}.rt, 0) + "
            f"(CAST(1.0 AS DOUBLE) - (SELECT sum(rt) FROM t{i})) * "
            f"(CASE WHEN verts.v % {seed_mod} = 0 THEN (SELECT sv FROM ns) "
            f"ELSE CAST(0.0 AS DOUBLE) END) AS rank "
            f"FROM verts LEFT JOIN t{i} ON t{i}.v = verts.v)"
        )
    return (
        prefix
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT v, round(rank * (SELECT c FROM nn), {digits}) AS rank_n FROM pr{k}"
    )


# DOULION oracle: same md5 coin, same 1/inv sampled graph, same exact
# pipeline — the estimate is deterministic, so it hash-compares.
_CP_SAMPLED = f"""
WITH raw0 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
raw AS (
  SELECT src, dst FROM raw0
  WHERE CAST('0x' || substring(md5(src || '_' || dst), 1, 4) AS BIGINT)
        % {_TRI_SAMPLE_INV} = 0
),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM raw WHERE src <> dst
  )
),
deg AS (SELECT dst AS v, count(*) AS deg FROM und GROUP BY 1),
o AS (
  SELECT e.src, e.dst FROM und e
  JOIN deg ds ON ds.v = e.src JOIN deg dd ON dd.v = e.dst
  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.dst < e.src)
)
"""

_TRI_SAMPLED_SQL = _CP_SAMPLED + f"""SELECT count(*) AS n_sampled,
       count(*) * {_TRI_SAMPLE_INV ** 3} AS n_triangles_est
FROM o e1 JOIN o e2 ON e1.dst = e2.src
JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""


_BFS_SQL = _CP.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1) + """
, bfs AS (
  SELECT (SELECT min(src) FROM und) AS v, 0 AS dist
  UNION
  SELECT e.dst AS v, b.dist + 1 AS dist
  FROM bfs b JOIN und e ON e.src = b.v
  WHERE b.dist < 24
)
SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY v
"""


def _sssp_sql(rounds: int = 8) -> str:
    """The engine's fixed-round Bellman–Ford (operators/metrics.py
    ``sssp_distances``) unrolled as ``rounds`` chained CTEs over _CP's
    symmetric ``und`` with weights (src+dst)%7+1 — all-BIGINT, exact.

    Every round CTE is MATERIALIZED: each references its predecessor
    TWICE (fold + relax subquery), and DuckDB inlines un-materialized
    CTEs per reference — without the hint the unrolled plan recomputes
    s0 2^rounds times (measured 435 s vs ~2 s at sf0.01)."""
    inf = 1 << 40
    sql = _CP + (
        ", ew AS MATERIALIZED (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM und), "
        f"s0 AS MATERIALIZED (SELECT v, CASE WHEN v = (SELECT min(src) FROM und) THEN 0 "
        f"ELSE {inf} END AS d FROM (SELECT DISTINCT src AS v FROM und))"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", s{i} AS MATERIALIZED (SELECT s.v, least(s.d, COALESCE(m.md, s.d)) AS d "
            f"FROM s{i - 1} s LEFT JOIN (SELECT e.dst AS v, min(p.d + e.w) AS md "
            f"FROM ew e JOIN s{i - 1} p ON p.v = e.src GROUP BY e.dst) m "
            f"ON m.v = s.v)"
        )
    return sql + (
        f" SELECT v, CAST(d AS BIGINT) AS dist FROM s{rounds} WHERE d < {inf}"
    )


# rho expression shared by the HLL oracles: 4·(leading '0' hex chars of w)
# + a 4-way CASE on the first non-zero char + 1; all-zero w ⇒ 53
# (mirrors operators/sketches.py bit-for-bit).
_RHO_CASE = (
    "CASE WHEN w = '0000000000000' THEN 53 ELSE "
    "4 * length(regexp_extract(w, '^(0*)', 1)) + (CASE "
    "WHEN substring(w, length(regexp_extract(w, '^(0*)', 1)) + 1, 1) "
    "IN ('8','9','a','b','c','d','e','f') THEN 0 "
    "WHEN substring(w, length(regexp_extract(w, '^(0*)', 1)) + 1, 1) "
    "IN ('4','5','6','7') THEN 1 "
    "WHEN substring(w, length(regexp_extract(w, '^(0*)', 1)) + 1, 1) "
    "IN ('2','3') THEN 2 ELSE 3 END) + 1 END"
)

_ALPHA_SQL = (
    "CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / "
    "CAST(256 AS DOUBLE)) * CAST(65536 AS DOUBLE) * "
    "CAST(9007199254740992 AS DOUBLE)"
)

# alpha·m²·2^53 in MILLIONTHS, as one shared compile-time integer: both
# the Spark plan and the DuckDB oracle embed this same literal, so the
# nf-curve needs no runtime double arithmetic at all.
_ALPHA_MICRO = int(0.7213 / (1 + 1.079 / 256) * 65536 * (1 << 53) * 10**6)


def _hyperball_sql(rounds: int = 3) -> str:
    """Oracle for web_hyperball: materialize the EXACT ≤rounds-hop reach
    set of every url over _WEB_DIR's directed ``g`` (unrolled hop CTEs —
    O(V²) pairs is fine at gate scale; the engine never does this),
    sketch each set once with the portable md5 HLL, and emit the same
    (s_scaled, estimate) the register-propagating engine produces."""
    sql = _WEB_DIR + (
        ", verts AS (SELECT DISTINCT v FROM ("
        "SELECT src AS v FROM g UNION ALL SELECT dst AS v FROM g)), "
        "r0 AS MATERIALIZED (SELECT v, v AS m FROM verts)"
    )
    for i in range(1, rounds + 1):
        # MATERIALIZED: r{i-1} is referenced twice per hop — un-hinted,
        # DuckDB's per-reference inlining recomputes r0 2^rounds times
        sql += (
            f", r{i} AS MATERIALIZED (SELECT DISTINCT v, m FROM ("
            f"SELECT v, m FROM r{i - 1} UNION ALL "
            f"SELECT e.src AS v, r.m FROM r{i - 1} r JOIN g e ON e.dst = r.v))"
        )
    return sql + (
        f", hh AS (SELECT v, md5(CAST(m AS VARCHAR)) AS h FROM r{rounds}), "
        "p AS (SELECT v, CAST(('0x' || substring(h, 1, 2)) AS BIGINT) AS bucket, "
        "substring(h, 3, 13) AS w FROM hh), "
        f"rr AS (SELECT v, bucket, {_RHO_CASE} AS rho FROM p), "
        "regs AS (SELECT v, bucket, max(rho) AS m_j FROM rr GROUP BY 1, 2), "
        "s AS (SELECT v, CAST(sum(CAST(1 AS BIGINT) << (53 - m_j)) "
        "+ (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT) "
        "AS s_scaled FROM regs GROUP BY v) "
        f"SELECT v AS url, s_scaled, {_ALPHA_SQL} / s_scaled AS estimate FROM s"
    )


def _walks_sql(length: int = 4) -> str:
    """Oracle for walks_copurchase: the engine's deterministic walks
    (operators/walks.py) unrolled — per hop one min_by over the same
    ``md5(walk:id:t:src:dst)`` key. MATERIALIZED: each w{t} is
    referenced twice (next hop + final union)."""
    sql = _CP + (
        ", seeds AS (SELECT DISTINCT src AS walk FROM und WHERE src % 100 = 0), "
        "w0 AS MATERIALIZED (SELECT walk, walk AS v FROM seeds)"
    )
    for t in range(1, length + 1):
        sql += (
            f", w{t} AS MATERIALIZED (SELECT p.walk, "
            f"min_by(e.dst, md5(concat_ws(':', 'walk', p.walk, {t}, e.src, e.dst))) "
            f"AS v FROM w{t - 1} p JOIN und e ON e.src = p.v GROUP BY p.walk)"
        )
    return (
        sql
        + " SELECT walk, 0 AS step, v FROM w0"
        + "".join(
            f" UNION ALL SELECT walk, {t} AS step, v FROM w{t}"
            for t in range(1, length + 1)
        )
    )


_SAGE_SQL = _CP + """
, seeds AS (SELECT DISTINCT src AS seed FROM und WHERE src % 100 = 0),
h1s AS MATERIALIZED (SELECT seed, h1 FROM (
  SELECT s.seed, e.dst AS h1, row_number() OVER (
    PARTITION BY s.seed
    ORDER BY md5(concat_ws(':', 'sage', 1, s.seed, e.dst))) AS rn
  FROM seeds s JOIN und e ON e.src = s.seed) WHERE rn <= 2),
h2s AS (SELECT seed, h1, h2 FROM (
  SELECT h.seed, h.h1, e.dst AS h2, row_number() OVER (
    PARTITION BY h.seed, h.h1
    ORDER BY md5(concat_ws(':', 'sage', 2, h.seed, h.h1, e.dst))) AS rn
  FROM h1s h LEFT JOIN und e ON e.src = h.h1)
  WHERE rn <= 2 OR h2 IS NULL)
SELECT seed, h1, h2 FROM h2s
"""


def _hyperball_profile_sql(rounds: int = 3) -> str:
    """Oracle for web_neighborhood_profile: exact reach sets per round
    (MATERIALIZED — each r{t} feeds both the next hop and its own
    sketch), each sketched once with the portable md5 HLL; emits the
    all-BIGINT (url, t, s_scaled) profile."""
    sql = _WEB_DIR + (
        ", verts AS MATERIALIZED (SELECT DISTINCT v FROM ("
        "SELECT src AS v FROM g UNION ALL SELECT dst AS v FROM g)), "
        "r0 AS MATERIALIZED (SELECT v, v AS m FROM verts)"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", r{i} AS MATERIALIZED (SELECT DISTINCT v, m FROM ("
            f"SELECT v, m FROM r{i - 1} UNION ALL "
            f"SELECT e.src AS v, r.m FROM r{i - 1} r JOIN g e ON e.dst = r.v))"
        )
    parts = []
    for t in range(rounds + 1):
        sql += (
            f", hh{t} AS (SELECT v, md5(CAST(m AS VARCHAR)) AS h FROM r{t}), "
            f"p{t} AS (SELECT v, CAST(('0x' || substring(h, 1, 2)) AS BIGINT) "
            f"AS bucket, substring(h, 3, 13) AS w FROM hh{t}), "
            f"rr{t} AS (SELECT v, bucket, {_RHO_CASE} AS rho FROM p{t}), "
            f"regs{t} AS (SELECT v, bucket, max(rho) AS m_j FROM rr{t} "
            f"GROUP BY 1, 2), "
            f"s{t} AS (SELECT v, CAST(sum(CAST(1 AS BIGINT) << (53 - m_j)) "
            f"+ (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT) "
            f"AS s_scaled FROM regs{t} GROUP BY v)"
        )
        parts.append(f"SELECT v AS url, {t} AS t, s_scaled FROM s{t}")
    return sql + " " + " UNION ALL ".join(parts)


def _harmonic_sql(rounds: int = 3) -> str:
    """Oracle for web_harmonic: the exact-reach-set profile folded per
    vertex to 6x harmonic centrality in millionths — the identical
    telescoped integer weights (-6, 3, 1, 2 at t = 0..3)."""
    assert rounds == 3  # weights below are LCM(1..3)-specific
    return (
        "SELECT url, CAST(sum(CASE t WHEN 0 THEN -6 * e WHEN 1 THEN 3 * e "
        "WHEN 2 THEN e ELSE 2 * e END) AS BIGINT) AS h6_micro FROM ("
        f"SELECT url, t, CAST(CAST('{_ALPHA_MICRO}' AS HUGEINT) // s_scaled "
        f"AS BIGINT) AS e FROM ({_hyperball_profile_sql(rounds)})"
        ") GROUP BY url"
    )


def _nf_curve_sql(rounds: int = 3) -> str:
    """Oracle for web_nf_curve: the exact-reach-set profile, folded to
    N(t) in millionths by the same integral division + exact integer
    sum (HUGEINT // in DuckDB ≡ DECIMAL(38,0) div in Spark on
    positive operands)."""
    return (
        "SELECT t, CAST(sum(e) AS BIGINT) AS nf_micro FROM ("
        f"SELECT t, CAST(CAST('{_ALPHA_MICRO}' AS HUGEINT) // s_scaled "
        f"AS BIGINT) AS e FROM ({_hyperball_profile_sql(rounds)})"
        ") GROUP BY t"
    )


_REPETITION_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
big AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
  i -> w[i] || ' ' || w[i + 1])) AS gram FROM w),
trig AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram FROM w),
bic AS (SELECT doc_id, gram, count(*) AS c FROM big GROUP BY 1, 2),
bia AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_c
        FROM bic GROUP BY 1),
tric AS (SELECT doc_id, gram, count(*) AS c FROM trig GROUP BY 1, 2),
tria AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_c
         FROM tric GROUP BY 1)
SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
  round(COALESCE(top_c * 1.0 / n_bigrams, 0), 6) AS top_bigram_frac,
  COALESCE(n_trigrams, 0) AS n_trigrams,
  round(COALESCE(dup_c * 1.0 / n_trigrams, 0), 6) AS dup_trigram_frac
FROM documents d LEFT JOIN bia USING (doc_id) LEFT JOIN tria USING (doc_id)
"""


_COOC_SQL = """
WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
p1 AS (SELECT unnest(list_transform(range(1, len(w)),
  i -> {'a': w[i], 'b': w[i + 1]})) AS s FROM w),
p2 AS (SELECT unnest(list_transform(range(1, len(w) - 1),
  i -> {'a': w[i], 'b': w[i + 2]})) AS s FROM w),
p AS (SELECT s.a AS a, s.b AS b FROM p1
      UNION ALL SELECT s.a, s.b FROM p2)
SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2
"""


def _mis_sql(k: int = 8, salt: str = "mis", prefix: str = _CP) -> str:
    """Oracle for mis_copurchase: Luby rounds unrolled — per round the
    edge set restricted to remaining vertices, per-vertex min neighbor
    priority (md5 hex compares lexicographically in both engines),
    strict-< winners, winners + their neighborhoods removed."""
    sql = prefix + ", rem0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)"
    for r in range(1, k + 1):
        sql += (
            f", er{r} AS MATERIALIZED (SELECT e.src, e.dst FROM und e "
            f"JOIN rem{r - 1} a ON a.v = e.src JOIN rem{r - 1} b ON b.v = e.dst)"
            f", nm{r} AS (SELECT src AS v, "
            f"min(md5('{salt}:{r}:' || dst)) AS nmin FROM er{r} GROUP BY 1)"
            f", sel{r} AS MATERIALIZED (SELECT r.v FROM rem{r - 1} r "
            f"LEFT JOIN nm{r} n ON n.v = r.v "
            f"WHERE n.nmin IS NULL OR md5('{salt}:{r}:' || r.v) < n.nmin)"
            f", rm{r} AS (SELECT v FROM sel{r} UNION "
            f"SELECT e.dst AS v FROM er{r} e JOIN sel{r} s ON s.v = e.src)"
            f", rem{r} AS MATERIALIZED "
            f"(SELECT v FROM rem{r - 1} EXCEPT SELECT v FROM rm{r})"
        )
    return sql + " " + " UNION ALL ".join(
        f"SELECT v, {r} AS round FROM sel{r}" for r in range(1, k + 1)
    )


def _heavy_matching_sql(k: int = 6, salt: str = "hmatch") -> str:
    """Oracle for heavy_matching_coarse: the coarsen_copurchase
    contraction (as CTEs over the 8 unweighted matching rounds), then
    ``k`` weighted locally-minimal rounds — priority = zero-padded
    weight complement prefixed to the md5, identical string order in
    both engines."""
    tail = (
        ", rep AS (SELECT src AS v, src AS rep FROM mm "
        "UNION ALL SELECT dst AS v, src AS rep FROM mm), "
        "ce AS (SELECT coalesce(ra.rep, e.src) AS a, "
        "coalesce(rb.rep, e.dst) AS b "
        "FROM (SELECT src, dst FROM und WHERE src < dst) e "
        "LEFT JOIN rep ra ON ra.v = e.src "
        "LEFT JOIN rep rb ON rb.v = e.dst), "
        "h0 AS MATERIALIZED (SELECT least(a, b) AS src, "
        "greatest(a, b) AS dst, CAST(count(*) AS BIGINT) AS weight "
        "FROM ce WHERE a <> b GROUP BY 1, 2)"
    )
    for r in range(1, k + 1):
        pri = (
            "lpad(CAST(999999999999 - weight AS VARCHAR), 12, '0') || "
            f"md5('{salt}:{r}:' || src || ':' || dst)"
        )
        tail += (
            f", hp{r} AS MATERIALIZED (SELECT src, dst, weight, {pri} AS p "
            f"FROM h{r - 1})"
            f", hvm{r} AS (SELECT v, min(p) AS vm FROM ("
            f"SELECT src AS v, p FROM hp{r} UNION ALL "
            f"SELECT dst AS v, p FROM hp{r}) GROUP BY 1)"
            f", hwon{r} AS MATERIALIZED (SELECT x.src, x.dst FROM hp{r} x "
            f"JOIN hvm{r} a ON a.v = x.src JOIN hvm{r} b ON b.v = x.dst "
            f"WHERE x.p = a.vm AND x.p = b.vm)"
            f", hmv{r} AS (SELECT src AS v FROM hwon{r} "
            f"UNION SELECT dst AS v FROM hwon{r})"
            f", h{r} AS MATERIALIZED (SELECT src, dst, weight FROM hp{r} "
            f"WHERE src NOT IN (SELECT v FROM hmv{r}) "
            f"AND dst NOT IN (SELECT v FROM hmv{r}))"
        )
    tail += " " + " UNION ALL ".join(
        f"SELECT src, dst, {r} AS round FROM hwon{r}" for r in range(1, k + 1)
    )
    return _matching_sql(8, tail=tail)


def _sp_counts_sql(k: int = 4, source: int = 0, prefix: str = _CP) -> str:
    """Oracle for sp_counts_copurchase: level-synchronous BFS path
    counting unrolled — per level, new vertices' sigma = sum of their
    previous-level predecessors' sigmas."""
    sql = prefix + (
        f", s0 AS (SELECT CAST({source} AS BIGINT) AS v, "
        "CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma)"
    )
    for d in range(1, k + 1):
        sql += (
            f", c{d} AS (SELECT e.dst AS v, CAST({d} AS BIGINT) AS dist, "
            f"CAST(sum(f.sigma) AS BIGINT) AS sigma "
            f"FROM s{d - 1} f JOIN und e ON e.src = f.v "
            f"WHERE f.dist = {d - 1} "
            f"AND e.dst NOT IN (SELECT v FROM s{d - 1}) GROUP BY 1)"
            f", s{d} AS MATERIALIZED "
            f"(SELECT * FROM s{d - 1} UNION ALL SELECT * FROM c{d})"
        )
    return sql + f" SELECT v, dist, sigma FROM s{k}"


def _densest_sql(k: int = 8, prefix: str = _CP) -> str:
    """Oracle for densest_subgraph: the parallel Charikar peel unrolled
    — per round the (nv, de) snapshot, the integer above-average keep
    rule, the induced subgraph; final argmax by (density_millionths
    desc, round asc)."""
    sql = prefix + ", g0 AS MATERIALIZED (SELECT src, dst FROM und)"
    snaps = []
    for r in range(k + 1):
        sql += (
            f", s{r} AS (SELECT CAST(count(*) AS BIGINT) AS de, "
            f"(SELECT CAST(count(DISTINCT src) AS BIGINT) FROM g{r}) AS nv "
            f"FROM g{r})"
        )
        snaps.append(f"SELECT CAST({r} AS BIGINT) AS round, nv, de FROM s{r}")
        if r < k:
            sql += (
                f", k{r + 1} AS (SELECT dst AS v FROM g{r} GROUP BY dst "
                f"HAVING count(*) * (SELECT nv FROM s{r}) > "
                f"(SELECT de FROM s{r}))"
                f", g{r + 1} AS MATERIALIZED (SELECT g.src, g.dst FROM g{r} g "
                f"JOIN k{r + 1} a ON a.v = g.src "
                f"JOIN k{r + 1} b ON b.v = g.dst)"
            )
    return sql + (
        ", snaps AS (" + " UNION ALL ".join(snaps) + ") "
        "SELECT round, nv AS n_vertices, CAST(de // 2 AS BIGINT) AS n_edges, "
        "CAST((1000000 * de) // (2 * nv) AS BIGINT) AS density_millionths "
        "FROM snaps WHERE nv > 0 "
        "ORDER BY density_millionths DESC, round ASC LIMIT 1"
    )


def _stress_sql(k: int = 4, source: int = 0, prefix: str = _CP) -> str:
    """Oracle for stress_copurchase: both Brandes passes unrolled in
    integer arithmetic — forward sigma levels (reusing _sp_counts_sql's
    blocks), then the shortest-path DAG, then backward tau levels
    tau(v) = Σ_succ (1 + tau(w)), deepest level first."""
    base = _sp_counts_sql(k, source, prefix)
    sql = base[: base.rindex(" SELECT v, dist, sigma FROM")]
    sql += (
        f", dag AS MATERIALIZED (SELECT a.v AS u, e.dst AS w, a.dist AS du "
        f"FROM s{k} a JOIN und e ON e.src = a.v "
        f"JOIN s{k} b ON b.v = e.dst AND b.dist = a.dist + 1)"
        f", t{k} AS (SELECT v, CAST(0 AS BIGINT) AS tau "
        f"FROM s{k} WHERE dist = {k})"
    )
    for d in range(k - 1, -1, -1):
        sql += (
            f", x{d} AS (SELECT g.u AS v, CAST(sum(1 + t.tau) AS BIGINT) AS tau "
            f"FROM dag g JOIN t{d + 1} t ON t.v = g.w WHERE g.du = {d} "
            f"GROUP BY 1)"
            f", t{d} AS MATERIALIZED (SELECT * FROM t{d + 1} UNION ALL "
            f"SELECT s.v, CAST(coalesce(x.tau, 0) AS BIGINT) AS tau "
            f"FROM s{k} s LEFT JOIN x{d} x ON x.v = s.v WHERE s.dist = {d})"
        )
    return sql + (
        f" SELECT s.v, s.dist, s.sigma, t.tau, "
        f"CAST(s.sigma * t.tau AS BIGINT) AS n_paths_through "
        f"FROM s{k} s JOIN t0 t ON t.v = s.v"
    )


def _matching_sql(
    k: int = 8, salt: str = "match", prefix: str = _CP, tail: str | None = None
) -> str:
    """Oracle for matching_copurchase: locally-minimal-edge rounds
    unrolled — per round the per-vertex incident priority minimum over
    BOTH endpoint roles, winners where the edge priority equals both
    endpoint minima, matched vertices removed. ``tail`` replaces the
    default (src, dst, round) projection; it sees ``mm`` = the union of
    all winners (coarsen_copurchase builds its contraction on it)."""
    if tail is not None:
        sql = _matching_sql(k, salt, prefix)
        blocks = sql[: sql.rindex(" SELECT src, dst, 1 AS round")]
        mm = " UNION ALL ".join(
            f"SELECT src, dst FROM won{r}" for r in range(1, k + 1)
        )
        return f"{blocks}, mm AS MATERIALIZED ({mm}) {tail}"
    sql = prefix + ", e0 AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)"
    for r in range(1, k + 1):
        sql += (
            f", p{r} AS MATERIALIZED (SELECT src, dst, "
            f"md5('{salt}:{r}:' || src || ':' || dst) AS p FROM e{r - 1})"
            f", vm{r} AS (SELECT v, min(p) AS vm FROM ("
            f"SELECT src AS v, p FROM p{r} UNION ALL "
            f"SELECT dst AS v, p FROM p{r}) GROUP BY 1)"
            f", won{r} AS MATERIALIZED (SELECT x.src, x.dst FROM p{r} x "
            f"JOIN vm{r} a ON a.v = x.src JOIN vm{r} b ON b.v = x.dst "
            f"WHERE x.p = a.vm AND x.p = b.vm)"
            f", mv{r} AS (SELECT src AS v FROM won{r} "
            f"UNION SELECT dst AS v FROM won{r})"
            f", e{r} AS MATERIALIZED (SELECT src, dst FROM p{r} "
            f"WHERE src NOT IN (SELECT v FROM mv{r}) "
            f"AND dst NOT IN (SELECT v FROM mv{r}))"
        )
    return sql + " " + " UNION ALL ".join(
        f"SELECT src, dst, {r} AS round FROM won{r}" for r in range(1, k + 1)
    )


def _coloring_sql(
    n_colors: int = 4, mis_rounds: int = 4, salt: str = "color", prefix: str = _CP
) -> str:
    """Oracle for coloring_copurchase: ``luby_coloring`` unrolled —
    per color class the full MIS round machinery of ``_mis_sql`` over
    the still-uncolored universe, per-class salts."""
    sql = prefix + ", u1 AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)"
    for c in range(1, n_colors + 1):
        pri = f"md5('{salt}:{c}:"  # + '<r>:' || v + ")"
        sql += f", rem{c}_0 AS (SELECT v FROM u{c})"
        for r in range(1, mis_rounds + 1):
            sql += (
                f", er{c}_{r} AS MATERIALIZED (SELECT e.src, e.dst FROM und e "
                f"JOIN rem{c}_{r - 1} a ON a.v = e.src "
                f"JOIN rem{c}_{r - 1} b ON b.v = e.dst)"
                f", nm{c}_{r} AS (SELECT src AS v, "
                f"min({pri}{r}:' || dst)) AS nmin FROM er{c}_{r} GROUP BY 1)"
                f", sel{c}_{r} AS MATERIALIZED (SELECT r.v FROM rem{c}_{r - 1} r "
                f"LEFT JOIN nm{c}_{r} n ON n.v = r.v "
                f"WHERE n.nmin IS NULL OR {pri}{r}:' || r.v) < n.nmin)"
                f", rm{c}_{r} AS (SELECT v FROM sel{c}_{r} UNION "
                f"SELECT e.dst AS v FROM er{c}_{r} e JOIN sel{c}_{r} s ON s.v = e.src)"
                f", rem{c}_{r} AS MATERIALIZED "
                f"(SELECT v FROM rem{c}_{r - 1} EXCEPT SELECT v FROM rm{c}_{r})"
            )
        cls_union = " UNION ".join(
            f"SELECT v FROM sel{c}_{r}" for r in range(1, mis_rounds + 1)
        )
        sql += f", cls{c} AS MATERIALIZED ({cls_union})"
        sql += (
            f", u{c + 1} AS MATERIALIZED "
            f"(SELECT v FROM u{c} EXCEPT SELECT v FROM cls{c})"
        )
    return sql + " " + " UNION ALL ".join(
        f"SELECT v, {c} AS color FROM cls{c}" for c in range(1, n_colors + 1)
    )


def _lpa_sql(k: int = 10, prefix: str = _CP, tail: str | None = None) -> str:
    """The engine's synchronous LPA (operators/lpa.py) unrolled as ``k``
    chained CTEs: per round, every vertex adopts the most frequent
    neighbor label, ties to the SMALLEST label (row_number mirrors the
    engine's max_by((freq, -label)) exactly). ``tail`` replaces the
    final SELECT for oracles that post-process the round-k labels
    (e.g. modularity); it may reference ``l{k}`` and every prefix CTE."""
    ctes = [
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)",
        "l0 AS MATERIALIZED (SELECT v, v AS label FROM verts)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"f{i} AS MATERIALIZED (SELECT e.dst AS v, l.label, count(*) AS freq "
            f"FROM und e JOIN l{i - 1} l ON l.v = e.src GROUP BY e.dst, l.label)"
        )
        ctes.append(
            f"b{i} AS MATERIALIZED (SELECT v, label FROM ("
            f"SELECT v, label, row_number() OVER (PARTITION BY v "
            f"ORDER BY freq DESC, label ASC) AS rk FROM f{i}) WHERE rk = 1)"
        )
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT verts.v, "
            f"COALESCE(b{i}.label, p.label) AS label FROM verts "
            f"LEFT JOIN b{i} ON b{i}.v = verts.v "
            f"LEFT JOIN l{i - 1} p ON p.v = verts.v)"
        )
    final = tail if tail is not None else f"\nSELECT v, label FROM l{k}"
    return prefix + ", " + ",\n".join(ctes) + final


# connected components: min reachable vertex over the symmetric edge set —
# an independent RECURSIVE-CTE formulation of what large-star/small-star
# converges to (comp = min member id).
_CC_SQL = _CP + """
, verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)
SELECT v, min(m) AS comp FROM (
  WITH RECURSIVE reach(v, m) AS (
    SELECT v, v FROM verts
    UNION
    SELECT e.dst AS v, r.m FROM reach r JOIN und e ON e.src = r.v
  )
  SELECT v, m FROM reach
) GROUP BY v
"""

# web graph on vids: the url→vid dictionary (row_number over sorted urls,
# identical to vertex_dictionary) applied to the mined link table, then
# symmetrized — the `und` table _pagerank_sql iterates over.
_WEB_VID = _WEB + """
, u AS MATERIALIZED (SELECT DISTINCT url FROM (
    SELECT src_url AS url FROM mined UNION ALL SELECT dst_url AS url FROM mined)),
dict AS MATERIALIZED (SELECT url, row_number() OVER (ORDER BY url) - 1 AS vid FROM u),
ev AS MATERIALIZED (
  SELECT ds.vid AS src, dd.vid AS dst FROM mined m
  JOIN dict ds ON ds.url = m.src_url JOIN dict dd ON dd.url = m.dst_url),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM ev WHERE src <> dst
    UNION ALL SELECT dst AS src, src AS dst FROM ev WHERE src <> dst))
"""


def _lsh_buckets_sql(n_planes: int, n_tables: int) -> str:
    """Shared DuckDB replica of operators/knn.py portable LSH buckets:
    identical ±1 md5-derived planes, identical integer quantization —
    the bucket assignment is a sum of int64 products, order-independent,
    so both engines produce the SAME (vec_id, t, bucket) set
    bit-for-bit. Prefix for _lsh_sql and the emb_neardup_pairs oracle."""
    return f"""
WITH planes AS MATERIALIZED (
  SELECT t, p, d,
         CASE WHEN strpos('01234567',
              substring(md5(t || '|' || p || '|' || d), 1, 1)) > 0
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range({n_tables})) AS t),
       (SELECT unnest(range({n_planes})) AS p),
       (SELECT unnest(range((SELECT len(embedding) FROM embeddings LIMIT 1))) AS d)
),
vq AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(embedding))) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT) AS iv
  FROM embeddings
),
bits AS MATERIALIZED (
  SELECT v.vec_id, pl.t, pl.p,
         CASE WHEN sum(pl.s * v.iv) > 0 THEN 1 ELSE 0 END AS bit
  FROM vq v JOIN planes pl ON pl.d = v.d
  GROUP BY v.vec_id, pl.t, pl.p
),
buckets AS MATERIALIZED (
  SELECT vec_id, t,
         CAST(sum(bit * (1::BIGINT << CAST(p AS INT))) AS BIGINT) AS bucket
  FROM bits GROUP BY vec_id, t
)"""


def _lsh_sql(n_planes: int = 8, n_tables: int = 4, k: int = 5) -> str:
    """Exact cosine + top-k on the portable-LSH candidate set (see
    _lsh_buckets_sql for the bit-for-bit bucket parity argument)."""
    return _lsh_buckets_sql(n_planes, n_tables) + f""",
cand AS (
  SELECT DISTINCT qb.vec_id AS q, cb.vec_id AS nbr
  FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
  WHERE qb.vec_id < 20 AND qb.vec_id <> cb.vec_id
),
s AS (
  SELECT c.q, c.nbr,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(ec.embedding AS DOUBLE[])) AS sim
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.q
  JOIN embeddings ec ON ec.vec_id = c.nbr
),
r AS (SELECT q, nbr, sim,
             row_number() OVER (PARTITION BY q ORDER BY sim DESC, nbr ASC) AS rk
      FROM s)
SELECT q, nbr, round(sim, 6) AS sim FROM r WHERE rk <= {k}
"""


def _neardup_lsh_sql(
    threshold: float, n_planes: int = 8, n_tables: int = 4
) -> str:
    """DuckDB replica of knn.cosine_neardup_lsh: the SAME portable LSH
    buckets (see _lsh_buckets_sql), candidate pairs from any shared
    (table, bucket), exact cosine rounded to 6 on candidates only."""
    return _lsh_buckets_sql(n_planes, n_tables) + f""",
cand AS (
  SELECT DISTINCT qb.vec_id AS a, cb.vec_id AS b
  FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
  WHERE qb.vec_id < cb.vec_id
),
s AS (
  SELECT c.a, c.b,
         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                      CAST(eb.embedding AS DOUBLE[])), 6) AS sim
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a
  JOIN embeddings eb ON eb.vec_id = c.b
)
SELECT a, b, sim FROM s WHERE sim >= {threshold}
"""


def _ivf_sql(n_centroids: int = 16, n_probe: int = 4, k: int = 5) -> str:
    """DuckDB replica of operators/knn.py portable IVF: md5-ordered seed
    vectors, one integer Lloyd pass (floor(avg) of quantized members;
    empty clusters keep seeds), argmax-integer-dot assignment with
    (dot desc, cent asc) ties, n_probe probing, exact cosine + top-k."""
    return f"""
WITH vq AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(embedding))) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT) AS iv
  FROM embeddings
),
ranked AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cent
  FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT r.cent, v.d, v.iv AS c FROM ranked r JOIN vq v ON v.vec_id = r.vec_id
  WHERE r.cent < {n_centroids}
),
dots0 AS MATERIALIZED (
  SELECT v.vec_id, c.cent, sum(c.c * v.iv) AS dot
  FROM vq v JOIN c0 c ON c.d = v.d GROUP BY v.vec_id, c.cent
),
assign0 AS MATERIALIZED (
  SELECT vec_id, cent FROM (
    SELECT vec_id, cent,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cent ASC) AS rk
    FROM dots0) WHERE rk = 1
),
c1 AS MATERIALIZED (
  SELECT c0.cent, c0.d, COALESCE(m.m, c0.c) AS c FROM c0 LEFT JOIN (
    SELECT a.cent, v.d, CAST(floor(avg(v.iv)) AS BIGINT) AS m
    FROM assign0 a JOIN vq v ON v.vec_id = a.vec_id GROUP BY a.cent, v.d) m
  ON m.cent = c0.cent AND m.d = c0.d
),
dots1 AS MATERIALIZED (
  SELECT v.vec_id, c.cent, sum(c.c * v.iv) AS dot
  FROM vq v JOIN c1 c ON c.d = v.d GROUP BY v.vec_id, c.cent
),
assign1 AS MATERIALIZED (
  SELECT vec_id, cent FROM (
    SELECT vec_id, cent,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cent ASC) AS rk
    FROM dots1) WHERE rk = 1
),
qprobe AS (
  SELECT vec_id, cent FROM (
    SELECT vec_id, cent,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cent ASC) AS rk
    FROM dots1 WHERE vec_id < 20) WHERE rk <= {n_probe}
),
cand AS (
  SELECT DISTINCT qp.vec_id AS q, ca.vec_id AS nbr
  FROM qprobe qp JOIN assign1 ca ON ca.cent = qp.cent
  WHERE qp.vec_id <> ca.vec_id
),
s AS (
  SELECT c.q, c.nbr,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(ec.embedding AS DOUBLE[])) AS sim
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.q
  JOIN embeddings ec ON ec.vec_id = c.nbr
),
r AS (SELECT q, nbr, sim,
             row_number() OVER (PARTITION BY q ORDER BY sim DESC, nbr ASC) AS rk
      FROM s)
SELECT q, nbr, round(sim, 6) AS sim FROM r WHERE rk <= {k}
"""


# media_features oracle: the fake featurizer's f0 = u32le(sha256 bytes
# 0..3) / 2^32 cast through float32 — every step exact / correctly
# rounded, so DuckDB reproduces it bit-for-bit. payload = utf8(text), and
# DuckDB's sha256(VARCHAR) hashes the utf-8 bytes — identical digests.
_MEDIA_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         sha256(text) AS h
  FROM documents
),
u AS (
  SELECT media_id, kind,
         CAST('0x' || substring(h, 1, 2) AS BIGINT)
       + CAST('0x' || substring(h, 3, 2) AS BIGINT) * 256
       + CAST('0x' || substring(h, 5, 2) AS BIGINT) * 65536
       + CAST('0x' || substring(h, 7, 2) AS BIGINT) * 16777216 AS v0
  FROM m
)
SELECT media_id, kind,
       round(CAST(CAST(v0 / 4294967296.0 AS FLOAT) AS DOUBLE), 6) AS f0
FROM u
"""


def _kcore_sql(k: int = 30, rounds: int = 8) -> str:
    """The engine's k-core peeling (operators/metrics.py) unrolled as
    ``rounds`` chained CTEs over the part–supplier bipartite graph."""
    ctes = [
        "raw AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, "
        "1000000 + l_suppkey AS dst FROM lineitem)",
        "e0 AS MATERIALIZED (SELECT src, dst FROM raw "
        "UNION ALL SELECT dst, src FROM raw)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT src AS v, count(*) AS deg "
            f"FROM e{i - 1} GROUP BY 1)"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i - 1} e "
            f"JOIN d{i} a ON a.v = e.src JOIN d{i} b ON b.v = e.dst "
            f"WHERE a.deg >= {k} AND b.deg >= {k})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src AS v, CAST(count(*) AS BIGINT) AS deg_core "
        f"FROM e{rounds} GROUP BY src"
    )


def _coreness_sql(rounds: int = 8) -> str:
    """The engine's h-index coreness iteration (metrics.core_numbers)
    unrolled as ``rounds`` chained CTEs over the symmetric copurchase
    edges — H-index per vertex as max(least(rank, value)) with the rank
    from a value-descending window, identical arithmetic on both
    engines (all BIGINT)."""
    ctes = [
        "h0 AS MATERIALIZED (SELECT src AS v, CAST(count(*) AS BIGINT) AS h "
        "FROM und GROUP BY 1)"
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT v, max(least(rn, nh)) AS h FROM ("
            f"SELECT e.src AS v, p.h AS nh, "
            f"row_number() OVER (PARTITION BY e.src ORDER BY p.h DESC) AS rn "
            f"FROM und e JOIN h{i - 1} p ON p.v = e.dst) GROUP BY v)"
        )
    return (
        _CP
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT v, h AS coreness FROM h{rounds}"
    )


def _ktruss_sql(k: int = 10, rounds: int = 12) -> str:
    """The engine's k-truss peeling (operators/truss.py) unrolled as
    ``rounds`` chained CTEs over the canonical (src < dst) copurchase
    edges. Triangles enumerate directly off canonical edges (a<b, b<c ⇒
    a<c — each triangle found once); the final SELECT reads the last
    round's support table, which at a fixpoint IS the support measured
    inside the truss."""
    ctes = [
        "c0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "WHERE a.l_partkey < b.l_partkey)",
    ]
    for i in range(1, rounds + 1):
        prev = "c0" if i == 1 else f"e{i - 1}"
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c "
            f"FROM {prev} e1 JOIN {prev} e2 ON e2.src = e1.dst "
            f"JOIN {prev} e3 ON e3.src = e1.src AND e3.dst = e2.dst)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM ("
            f"SELECT a AS u, b AS v FROM t{i} UNION ALL "
            f"SELECT b, c FROM t{i} UNION ALL SELECT a, c FROM t{i}) GROUP BY u, v)"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT u AS src, v AS dst FROM s{i} "
            f"WHERE sup >= {k - 2})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT u AS src, v AS dst, CAST(sup AS BIGINT) AS support "
        f"FROM s{rounds} WHERE sup >= {k - 2}"
    )


_EDGE_SUPPORT_SQL = _CP + """
, canon AS (SELECT src, dst FROM und WHERE src < dst),
tri3 AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM o e1
  JOIN o e2 ON e2.src = e1.dst
  JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
sup AS (
  SELECT u, v, count(*) AS sup FROM (
    SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri3
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri3
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri3
  ) GROUP BY u, v
)
SELECT c.src, c.dst, CAST(COALESCE(s.sup, 0) AS BIGINT) AS support
FROM canon c LEFT JOIN sup s ON s.u = c.src AND s.v = c.dst
"""


_LCC_SQL = _CP + """
, tri3 AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w FROM o e1
  JOIN o e2 ON e2.src = e1.dst
  JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT u AS v FROM tri3 UNION ALL SELECT v FROM tri3
  UNION ALL SELECT w FROM tri3
),
t AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM corners GROUP BY v)
SELECT d.v, d.deg, COALESCE(t.tri, 0) AS tri,
       CASE WHEN d.deg >= 2
            THEN CAST(2.0 AS DOUBLE) * COALESCE(t.tri, 0) / (d.deg * (d.deg - 1))
            ELSE CAST(0.0 AS DOUBLE) END AS lcc
FROM deg d LEFT JOIN t ON t.v = d.v
"""


def oracle() -> dict[str, str]:
    tri_sql = (
        "SELECT count(*) AS n_triangles FROM o e1 "
        "JOIN o e2 ON e1.dst = e2.src "
        "JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst"
    )
    sw_counts = ", ".join(
        f"sum(CASE WHEN {_sw_pred('t', _STOPWORDS[lang])} THEN 1 ELSE 0 END) AS s_{lang}"
        for lang in ("en", "de", "fr", "hi")
    )
    mh_mins = ", ".join(
        f"min(md5(s || '#{i}')) AS h{i}" for i in range(_MH_H)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(h{b * _MH_R} || '|' || h{b * _MH_R + 1}) AS key FROM sig"
        for b in range(_MH_H // _MH_R)
    )
    cos = (
        "list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[]))"
    )
    from trianglecount_spark.functions.pii import PII_PATTERNS

    # patterns restricted to the Java-regex ∩ RE2 dialect (functions/pii.py),
    # shared verbatim by both engines
    pii_counts_sql = ", ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS INT) AS n_{name}"
        for name, (pat, _) in PII_PATTERNS.items()
    )
    pii_red_sql = "t"
    for pat, repl in PII_PATTERNS.values():
        pii_red_sql = f"regexp_replace({pii_red_sql}, '{pat}', '{repl}', 'g')"
    return {
        "copurchase_edges": _CP + "SELECT src, dst FROM und",
        "degrees": _CP + "SELECT v, deg FROM deg",
        "degree_histogram": _CP
        + "SELECT deg, count(*) AS n_vertices FROM deg GROUP BY deg",
        # CSN discrete MLE with d_min=1; 4-decimal rounding = the
        # pagerank_exact10 float-format guard
        "degree_powerlaw": _CP
        + (
            "SELECT CAST(count(*) AS BIGINT) AS n_vertices, "
            "round(sum(ln(deg)), 4) AS sum_ln_deg, "
            "round(1.0 + count(*) / sum(ln(deg)), 4) AS alpha_mle FROM deg"
        ),
        "oriented_edges": _CP + "SELECT src, dst FROM o",
        "wedge_count": _CP
        + "SELECT count(*) AS n_wedges FROM o e1 JOIN o e2 ON e1.dst = e2.src",
        "triangle_total": _CP + tri_sql,
        "triangle_total_kernel": _CP + tri_sql,
        "triangle_total_arrays": _CP + tri_sql,
        "triangles_per_vertex": _CP
        + (
            "SELECT e1.src AS v, count(*) AS tri FROM o e1 "
            "JOIN o e2 ON e1.dst = e2.src "
            "JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst GROUP BY e1.src"
        ),
        "top_degree": _CP
        + "SELECT v, deg FROM deg ORDER BY deg DESC, v ASC LIMIT 20",
        "triangle_total_bipartite": """
WITH raw AS (
  SELECT l_orderkey AS src, 1000000 + l_partkey AS dst FROM lineitem
),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw WHERE src <> dst
    UNION ALL SELECT dst, src FROM raw WHERE src <> dst
  )
),
deg AS (SELECT dst AS v, count(*) AS deg FROM und GROUP BY 1),
o AS (
  SELECT e.src, e.dst FROM und e
  JOIN deg ds ON ds.v = e.src JOIN deg dd ON dd.v = e.dst
  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.dst < e.src)
)
"""
        + tri_sql,
        "pagerank_exact10": _pagerank_sql(10),
        "pagerank_copurchase": _pagerank_sql(30),
        "components_copurchase": _CC_SQL,
        "mis_copurchase": _mis_sql(8),
        "coloring_copurchase": _coloring_sql(4, 4),
        "matching_copurchase": _matching_sql(8),
        "sp_counts_copurchase": _sp_counts_sql(4, 0),
        "stress_copurchase": _stress_sql(4, 0),
        "densest_subgraph": _densest_sql(8),
        "events_rfm": (
            "WITH pu AS (SELECT user_id, "
            "CAST(((SELECT max(epoch_us(ts)) FROM events) - "
            "max(epoch_us(ts))) // 86400000000 AS BIGINT) AS recency_days, "
            "CAST(count(*) AS BIGINT) AS frequency, "
            "CAST(sum(CASE WHEN event_type = 'purchase' THEN "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) "
            "AS monetary_cents FROM events GROUP BY 1), "
            "th AS (SELECT list_sort(list(recency_days)) AS ra, "
            "list_sort(list(frequency)) AS fa, "
            "list_sort(list(monetary_cents)) AS ma, "
            "CAST(count(*) AS BIGINT) AS n FROM pu), "
            "thx AS (SELECT "
            "ra[CAST(1 + (n - 1) // 4 AS INT)] AS raq1, "
            "ra[CAST(1 + (2 * (n - 1)) // 4 AS INT)] AS raq2, "
            "ra[CAST(1 + (3 * (n - 1)) // 4 AS INT)] AS raq3, "
            "fa[CAST(1 + (n - 1) // 4 AS INT)] AS faq1, "
            "fa[CAST(1 + (2 * (n - 1)) // 4 AS INT)] AS faq2, "
            "fa[CAST(1 + (3 * (n - 1)) // 4 AS INT)] AS faq3, "
            "ma[CAST(1 + (n - 1) // 4 AS INT)] AS maq1, "
            "ma[CAST(1 + (2 * (n - 1)) // 4 AS INT)] AS maq2, "
            "ma[CAST(1 + (3 * (n - 1)) // 4 AS INT)] AS maq3 FROM th) "
            "SELECT user_id, recency_days, frequency, monetary_cents, "
            "CAST(5 - (CASE WHEN recency_days <= raq1 THEN 1 "
            "WHEN recency_days <= raq2 THEN 2 "
            "WHEN recency_days <= raq3 THEN 3 ELSE 4 END) AS BIGINT) AS r, "
            "CAST(CASE WHEN frequency <= faq1 THEN 1 "
            "WHEN frequency <= faq2 THEN 2 "
            "WHEN frequency <= faq3 THEN 3 ELSE 4 END AS BIGINT) AS f, "
            "CAST(CASE WHEN monetary_cents <= maq1 THEN 1 "
            "WHEN monetary_cents <= maq2 THEN 2 "
            "WHEN monetary_cents <= maq3 THEN 3 ELSE 4 END AS BIGINT) AS m "
            "FROM pu, thx"
        ),
        "copurchase_rules": (
            "WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p "
            "FROM lineitem), "
            "no AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS n FROM b), "
            "itn AS (SELECT p, CAST(count(*) AS BIGINT) AS n_item "
            "FROM b GROUP BY 1), "
            "pr AS (SELECT x.p AS pa, y.p AS pb, "
            "CAST(count(*) AS BIGINT) AS n_ab FROM b x JOIN b y "
            "ON x.k = y.k AND x.p < y.p GROUP BY 1, 2 "
            "HAVING count(*) >= 3) "
            "SELECT pa, pb, n_ab, "
            "CAST((1000000 * n_ab) // na.n_item AS BIGINT) "
            "AS conf_ab_millionths, "
            "CAST((1000000 * n_ab) // nb.n_item AS BIGINT) "
            "AS conf_ba_millionths, "
            "CAST((1000000 * n_ab * (SELECT n FROM no)) "
            "// (na.n_item * nb.n_item) AS BIGINT) AS lift_millionths "
            "FROM pr JOIN itn na ON na.p = pr.pa JOIN itn nb ON nb.p = pr.pb"
        ),
        "partition_replication": _CP
        + (
            ", eh AS (SELECT src, dst, CAST(CAST('0x' || substring("
            "md5('ph:' || src || ':' || dst), 1, 15) AS UBIGINT) AS BIGINT) "
            "% 8 AS p FROM o), "
            "ev AS (SELECT src, dst, CAST(CAST('0x' || substring("
            "md5('pv:' || src), 1, 15) AS UBIGINT) AS BIGINT) "
            "% 8 AS p FROM o), "
            "nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices FROM "
            "(SELECT src AS v FROM o UNION SELECT dst FROM o)), "
            "sh AS (SELECT CAST(count(*) AS BIGINT) AS vertex_slots FROM "
            "(SELECT DISTINCT v, p FROM (SELECT src AS v, p FROM eh "
            "UNION ALL SELECT dst AS v, p FROM eh))), "
            "sv AS (SELECT CAST(count(*) AS BIGINT) AS vertex_slots FROM "
            "(SELECT DISTINCT v, p FROM (SELECT src AS v, p FROM ev "
            "UNION ALL SELECT dst AS v, p FROM ev))) "
            "SELECT 'edge_hash' AS strategy, CAST(8 AS BIGINT) AS k, "
            "(SELECT vertex_slots FROM sh) AS vertex_slots, "
            "(SELECT n_vertices FROM nv) AS n_vertices "
            "UNION ALL SELECT 'anchor_lowdeg', CAST(8 AS BIGINT), "
            "(SELECT vertex_slots FROM sv), (SELECT n_vertices FROM nv)"
        ),
        "katz_copurchase": _CP
        + (
            ", r1 AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS wk "
            "FROM und GROUP BY 1), "
            "r2 AS (SELECT e.dst AS v, CAST(sum(r.wk) AS BIGINT) AS wk "
            "FROM r1 r JOIN und e ON e.src = r.v GROUP BY 1), "
            "r3 AS (SELECT e.dst AS v, CAST(sum(r.wk) AS BIGINT) AS wk "
            "FROM r2 r JOIN und e ON e.src = r.v GROUP BY 1) "
            "SELECT v, CAST(sum(m) AS BIGINT) AS katz_millionths FROM ("
            "SELECT v, wk * 250000 AS m FROM r1 UNION ALL "
            "SELECT v, wk * 62500 AS m FROM r2 UNION ALL "
            "SELECT v, wk * 15625 AS m FROM r3) GROUP BY 1"
        ),
        "triangle_weight_total": _CP
        + (
            ", wsym AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS wt "
            "FROM (SELECT src, dst FROM raw WHERE src <> dst UNION ALL "
            "SELECT dst AS src, src AS dst FROM raw WHERE src <> dst) "
            "GROUP BY 1, 2), "
            "wor AS (SELECT o.src, o.dst, w.wt FROM o "
            "JOIN wsym w ON w.src = o.src AND w.dst = o.dst) "
            "SELECT CAST(count(*) AS BIGINT) AS n_triangles, "
            "CAST(sum(least(e1.wt, e2.wt, e3.wt)) AS BIGINT) AS weight_total "
            "FROM wor e1 JOIN wor e2 ON e1.dst = e2.src "
            "JOIN wor e3 ON e3.src = e1.src AND e3.dst = e2.dst"
        ),
        "docs_bpe_merges": _bpe_sql(2),
        "docs_curation_pipeline": (
            "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents), "
            f"q AS (SELECT doc_id, CAST(sum(CASE WHEN "
            f"{_sw_pred('t', _STOPWORDS['en'])} THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_sw, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY 1), "
            "base AS (SELECT d.doc_id, d.lang, md5(d.text) AS fp, "
            "q.n_sw, q.n_tok FROM documents d JOIN q USING (doc_id)), "
            "pre AS (SELECT *, CASE WHEN doc_id % 50 = 0 THEN 'benchmark' "
            "WHEN n_sw * 10 < n_tok THEN 'quality' "
            "WHEN lang <> 'en' THEN 'lang' END AS reason0 FROM base), "
            "pool1 AS (SELECT * FROM pre WHERE reason0 IS NULL), "
            "kp AS (SELECT fp, min(doc_id) AS keep_id FROM pool1 GROUP BY 1), "
            "p1 AS (SELECT pool1.doc_id, CASE WHEN pool1.doc_id <> kp.keep_id "
            "THEN 'duplicate' END AS reason1 FROM pool1 JOIN kp USING (fp)), "
            "pool2 AS (SELECT doc_id FROM p1 WHERE reason1 IS NULL), "
            "wd AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents "
            "WHERE len(string_split(text, ' ')) >= 8), "
            "wins AS (SELECT DISTINCT doc_id, md5(s) AS wh FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(t) - 6), "
            "i -> array_to_string(t[i:i+7], ' '))) AS s FROM wd)), "
            "bw AS (SELECT DISTINCT wh FROM wins WHERE doc_id % 50 = 0), "
            "pw AS (SELECT * FROM wins WHERE doc_id IN "
            "(SELECT doc_id FROM pool2)), "
            "nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_w "
            "FROM pw GROUP BY 1), "
            "nh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit FROM pw "
            "WHERE wh IN (SELECT wh FROM bw) GROUP BY 1), "
            "fin AS (SELECT p.doc_id, CASE WHEN nw.n_w IS NOT NULL AND "
            "coalesce(nh.n_hit, 0) * 2 > nw.n_w THEN 'contaminated' END "
            "AS reason2 FROM pool2 p LEFT JOIN nw USING (doc_id) "
            "LEFT JOIN nh USING (doc_id)) "
            "SELECT doc_id, CAST(0 AS BIGINT) AS keep, reason0 AS drop_reason "
            "FROM pre WHERE reason0 IS NOT NULL "
            "UNION ALL SELECT doc_id, CAST(0 AS BIGINT), 'duplicate' "
            "FROM p1 WHERE reason1 IS NOT NULL "
            "UNION ALL SELECT doc_id, "
            "CAST(CASE WHEN reason2 IS NULL THEN 1 ELSE 0 END AS BIGINT), "
            "coalesce(reason2, '') FROM fin"
        ),
        "docs_vocab_prune": (
            "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS lv "
            "FROM documents), "
            "toks AS (SELECT doc_id, t.i AS pos, lv[t.i] AS tok FROM tk "
            "CROSS JOIN generate_series(1, 128) t(i) WHERE t.i <= len(lv)), "
            "nd AS (SELECT count(*) AS n FROM documents), "
            "tdf AS (SELECT tok, count(DISTINCT doc_id) AS df "
            "FROM toks GROUP BY 1), "
            "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens "
            "FROM toks GROUP BY 1), "
            "kept AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
            "string_agg(t.tok, ' ' ORDER BY t.pos) AS pruned_text "
            "FROM toks t JOIN tdf d ON d.tok = t.tok "
            "WHERE d.df * 5 <= (SELECT n FROM nd) * 2 GROUP BY 1) "
            "SELECT t.doc_id, t.n_tokens, COALESCE(k.n_kept, 0) AS n_kept, "
            "COALESCE(k.pruned_text, '') AS pruned_text "
            "FROM tot t LEFT JOIN kept k ON k.doc_id = t.doc_id"
        ),
        "web_crawl_budget": _WEB
        + (
            ", w AS (SELECT regexp_extract(dst_url, '^https?://([^/]+)', 1) "
            "AS host, CAST(count(*) AS BIGINT) AS wt FROM mined GROUP BY 1), "
            "tt AS (SELECT CAST(sum(wt) AS BIGINT) AS W FROM w), "
            "s AS (SELECT host, wt, "
            "CAST((10000 * wt) // W AS BIGINT) AS base, "
            "CAST((10000 * wt) % W AS BIGINT) AS rem FROM w, tt), "
            "lo AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS slots FROM s), "
            "r AS (SELECT host, wt, base, CAST(CASE WHEN "
            "row_number() OVER (ORDER BY rem DESC, host ASC) <= "
            "(SELECT slots FROM lo) THEN 1 ELSE 0 END AS BIGINT) AS extra "
            "FROM s) "
            "SELECT host, wt, CAST(base + extra AS BIGINT) AS budget FROM r"
        ),
        "web_boilerplate": _WEB
        + (
            ", ls AS (SELECT url, string_split(html, chr(10)) AS lv FROM pg), "
            # constant series bound (DuckDB generate_series is not
            # lateral); the synthetic html has 6 lines, 32 is headroom
            "lines AS (SELECT url, "
            "regexp_extract(url, '^https?://([^/]+)', 1) AS host, "
            "t.i AS pos, lv[t.i] AS line FROM ls "
            "CROSS JOIN generate_series(1, 32) t(i) WHERE t.i <= len(lv)), "
            "ph AS (SELECT host, count(DISTINCT url) AS n_pages "
            "FROM lines GROUP BY 1), "
            "ldf AS (SELECT host, line, count(DISTINCT url) AS df "
            "FROM lines GROUP BY 1, 2), "
            "tot AS (SELECT url, CAST(count(*) AS BIGINT) AS n_lines "
            "FROM lines GROUP BY 1), "
            "kept AS (SELECT l.url, CAST(count(*) AS BIGINT) AS n_kept, "
            "string_agg(l.line, chr(10) ORDER BY l.pos) AS clean_text "
            "FROM lines l JOIN ldf d ON d.host = l.host AND d.line = l.line "
            "JOIN ph p ON p.host = l.host "
            "WHERE d.df * 2 <= p.n_pages OR p.n_pages < 2 GROUP BY 1) "
            "SELECT t.url, t.n_lines, COALESCE(k.n_kept, 0) AS n_kept, "
            "COALESCE(k.clean_text, '') AS clean_text "
            "FROM tot t LEFT JOIN kept k ON k.url = t.url"
        ),
        "web_host_pagerank": _wpr_sql(
            10,
            wg_sql=(
                "SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src, "
                "regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst, "
                "CAST(count(*) AS BIGINT) AS wt FROM mined "
                "WHERE regexp_extract(src_url, '^https?://([^/]+)', 1) <> "
                "regexp_extract(dst_url, '^https?://([^/]+)', 1) GROUP BY 1, 2"
            ),
            label="host",
        ),
        "link_prediction_ra": _CP
        + (
            ", ctr AS (SELECT e.src AS v, e.dst AS u, "
            "CAST(1000000 // d.deg AS BIGINT) AS ra_part "
            "FROM und e JOIN deg d ON d.v = e.src WHERE d.deg <= 150), "
            "cn AS (SELECT c.u, e2.dst AS w, count(*) AS common, "
            "CAST(sum(c.ra_part) AS BIGINT) AS ra_millionths "
            "FROM ctr c JOIN und e2 ON e2.src = c.v AND c.u < e2.dst "
            "GROUP BY 1, 2 HAVING count(*) >= 12) "
            "SELECT cn.u, cn.w, CAST(cn.common AS BIGINT) AS common, "
            "ra_millionths FROM cn "
            "LEFT JOIN und e ON e.src = cn.u AND e.dst = cn.w "
            "WHERE e.src IS NULL"
        ),
        "events_zorder_stats": (
            "WITH r0 AS (SELECT CAST(user_id AS BIGINT) AS xv, "
            "CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) "
            "AS yv FROM events), "
            "r1 AS (SELECT xv, yv, CAST("
            + _zorder_expr("xv", "yv")
            + " AS BIGINT) AS zv FROM r0) "
            "SELECT CAST(zv >> 12 AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "min(xv) AS min_user, max(xv) AS max_user, "
            "min(yv) AS min_day, max(yv) AS max_day "
            "FROM r1 GROUP BY 1"
        ),
        "events_value_iqr": (
            "WITH c AS (SELECT event_type, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events), "
            "g AS (SELECT event_type, list_sort(list(cents)) AS a, "
            "CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1) "
            "SELECT event_type, "
            "CAST(a[CAST(1 + (n - 1) // 4 AS INT)] AS BIGINT) AS p25_cents, "
            "CAST(a[CAST(1 + (3 * (n - 1)) // 4 AS INT)] AS BIGINT) AS p75_cents, "
            "CAST(a[CAST(1 + (3 * (n - 1)) // 4 AS INT)] "
            "- a[CAST(1 + (n - 1) // 4 AS INT)] AS BIGINT) AS iqr_cents FROM g"
        ),
        "orders_rolling_30d": (
            "SELECT o_orderkey, o_custkey, "
            "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "OVER (PARTITION BY o_custkey ORDER BY o_orderdate "
            "RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS rev30d_cents FROM orders"
        ),
        "part_set_ops": (
            "SELECT 'sold' AS cls, CAST(count(*) AS BIGINT) AS n FROM "
            "(SELECT p_partkey FROM part "
            "INTERSECT SELECT l_partkey FROM lineitem) "
            "UNION ALL SELECT 'shelf_only', CAST(count(*) AS BIGINT) FROM "
            "(SELECT p_partkey FROM part "
            "EXCEPT SELECT l_partkey FROM lineitem) "
            "UNION ALL SELECT 'phantom', CAST(count(*) AS BIGINT) FROM "
            "(SELECT l_partkey FROM lineitem "
            "EXCEPT SELECT p_partkey FROM part)"
        ),
        "lineitem_q6_sql": (
            "SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "CAST(count(*) AS BIGINT) AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "part_avg_qty_correlated": (
            # decorrelated form of the Q17 correlated scalar subquery;
            # the threshold stays integral (sum*50 // count) both sides
            "WITH pp AS (SELECT l_partkey, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq, "
            "CAST(count(*) AS BIGINT) AS nq FROM lineitem GROUP BY 1) "
            "SELECT li.l_partkey, CAST(count(*) AS BIGINT) AS n_small, "
            "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS price_cents "
            "FROM lineitem li JOIN pp ON pp.l_partkey = li.l_partkey "
            "WHERE CAST(li.l_quantity AS BIGINT) * 100 < (pp.sq * 50) // pp.nq "
            "GROUP BY 1"
        ),
        "orders_priority_exists": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-07-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY 1"
        ),
        "heavy_matching_coarse": _heavy_matching_sql(6),
        "triangle_list_sample": _CP + (
            ", f AS (SELECT src, dst FROM o WHERE src < 200 AND dst < 200) "
            "SELECT x.src AS a, x.dst AS b, y.dst AS c "
            "FROM f x JOIN f y ON y.src = x.dst "
            "JOIN f z ON z.src = x.src AND z.dst = y.dst"
        ),
        "docs_quality_deciles": (
            "SELECT doc_id, lang, n_chars, "
            "CAST(ntile(10) OVER (PARTITION BY lang "
            "ORDER BY n_chars, doc_id) AS BIGINT) AS decile FROM documents"
        ),
        "coarsen_copurchase": _matching_sql(
            8,
            tail=(
                ", rep AS (SELECT src AS v, src AS rep FROM mm "
                "UNION ALL SELECT dst AS v, src AS rep FROM mm), "
                "ce AS (SELECT coalesce(ra.rep, e.src) AS a, "
                "coalesce(rb.rep, e.dst) AS b "
                "FROM (SELECT src, dst FROM und WHERE src < dst) e "
                "LEFT JOIN rep ra ON ra.v = e.src "
                "LEFT JOIN rep rb ON rb.v = e.dst) "
                "SELECT least(a, b) AS src, greatest(a, b) AS dst, "
                "CAST(count(*) AS BIGINT) AS weight FROM ce "
                "WHERE a <> b GROUP BY 1, 2"
            ),
        ),
        "lpa_copurchase": _lpa_sql(10),
        # round-10 labels -> exact-integer modularity decomposition:
        # q_num = 2m*intra_sym_c - d_c^2 (DuckDB sum() is HUGEINT ->
        # CAST to BIGINT, the events_sessions lesson)
        "modularity_lpa": _lpa_sql(
            2,
            tail=(
                ", lab AS (SELECT v, label FROM l2), "
                "mm AS (SELECT count(*) AS m2 FROM und), "
                "dc AS (SELECT l.label, CAST(sum(d.deg) AS BIGINT) AS d_c, "
                "count(*) AS n_members FROM lab l JOIN deg d ON d.v = l.v "
                "GROUP BY 1), "
                "intra AS (SELECT ls.label, count(*) AS intra_sym FROM und e "
                "JOIN lab ls ON ls.v = e.src JOIN lab ld ON ld.v = e.dst "
                "WHERE ls.label = ld.label GROUP BY 1) "
                "SELECT dc.label, dc.n_members, dc.d_c, "
                "COALESCE(intra.intra_sym, 0) AS intra_sym, "
                "(SELECT m2 FROM mm) * COALESCE(intra.intra_sym, 0) "
                "- dc.d_c * dc.d_c AS q_num "
                "FROM dc LEFT JOIN intra ON intra.label = dc.label"
            ),
        ),
        "components_nation": (
            "SELECT n_nationkey AS v, "
            "min(n_nationkey) OVER (PARTITION BY n_regionkey) AS comp FROM nation"
        ),
        "lpa_nation": (
            "SELECT n_nationkey AS v, "
            "min(n_nationkey) OVER (PARTITION BY n_regionkey) AS label FROM nation"
        ),
        "events_edges": _EV + "SELECT src, dst FROM p",
        "events_stream_incremental": _EV
        + (
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_edges, "
            "(SELECT CAST(count(*) AS BIGINT) FROM p e1 "
            "JOIN p e2 ON e1.dst = e2.src "
            "JOIN p e3 ON e3.src = e1.src AND e3.dst = e2.dst) AS n_triangles"
        ),
        "events_triangle_total": _EV
        + (
            "SELECT count(*) AS n_triangles FROM p e1 "
            "JOIN p e2 ON e1.dst = e2.src "
            "JOIN p e3 ON e3.src = e1.src AND e3.dst = e2.dst"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 6) AS sum_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, "
            "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "events_sessions": (
            "WITH x AS (SELECT user_id, ts, event_id, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts "
            "FROM events) "
            # CAST: DuckDB integer sum() yields HUGEINT, which pandas
            # coerces to float64 and the comparator then formats as
            # "56.000000" vs Spark's bigint "56" — cast keeps it integral.
            "SELECT user_id, 1 + CAST(sum(CASE WHEN pts IS NULL THEN 0 "
            "WHEN epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_sessions FROM x GROUP BY user_id"
        ),
        "orders_revenue_topn": (
            "SELECT l_orderkey, o_orderdate, o_orderpriority, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2, 3 "
            "ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10"
        ),
        "region_nation_volume": (
            "SELECT n_name, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_nationkey = s_nationkey AND r_name = 'ASIA' "
            "GROUP BY 1"
        ),
        "events_transitions": (
            "WITH x AS (SELECT event_type AS from_type, "
            "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS to_type FROM events) "
            "SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n "
            "FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2"
        ),
        "events_cohort_retention": (
            # DuckDB date_trunc('week') yields DATE; Spark yields
            # TIMESTAMP — cast so the formatted values agree
            "WITH c AS (SELECT user_id, "
            "min(CAST(date_trunc('week', ts) AS TIMESTAMP)) "
            "AS cohort_week FROM events GROUP BY 1), "
            "a AS (SELECT DISTINCT user_id, "
            "CAST(date_trunc('week', ts) AS TIMESTAMP) AS week "
            "FROM events) "
            "SELECT cohort_week, "
            "CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) "
            "AS week_offset, "
            "CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users "
            "FROM a JOIN c ON c.user_id = a.user_id GROUP BY 1, 2"
        ),
        "events_user_journeys": (
            "SELECT user_id, "
            "string_agg(event_type, '>' ORDER BY ts, event_id) AS journey, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1"
        ),
        "events_props_json": (
            "SELECT event_type, "
            "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
            "AS sum_k, "
            "min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k, "
            "max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k, "
            "CAST(count(*) FILTER (WHERE json_extract(props, '$.k') IS NULL) "
            "AS BIGINT) AS n_null "
            "FROM events GROUP BY 1"
        ),
        "events_stream_attribution": (
            "SELECT c.user_id, c.event_id AS click_id, "
            "p.event_id AS purchase_id "
            "FROM events c JOIN events p ON c.user_id = p.user_id "
            "AND c.event_type = 'click' AND p.event_type = 'purchase' "
            "AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE"
        ),
        "events_stream_windows": (
            # streaming append-mode emission = windows fully closed by the
            # final watermark max(ts) - 2h (see windowed_event_counts)
            "WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events) "
            "SELECT date_trunc('hour', ts) AS win_start, event_type, "
            "count(*) AS n_events, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM events GROUP BY 1, 2 "
            "HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM wm)"
        ),
        "events_stream_sliding": (
            # each event's two member windows enumerated closed-form:
            # the 30-min floor bucket and that minus one slide; emission
            # = windows fully closed by the settled watermark max(ts)-2h
            "WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events), "
            "c AS (SELECT make_timestamp((epoch_us(ts) // 1800000000) "
            "* 1800000000) AS win_start, event_type, value FROM events "
            "UNION ALL "
            "SELECT make_timestamp((epoch_us(ts) // 1800000000) "
            "* 1800000000) - INTERVAL 30 MINUTE, event_type, value "
            "FROM events) "
            "SELECT win_start, event_type, count(*) AS n_events, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM c GROUP BY 1, 2 "
            "HAVING win_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)"
        ),
        "events_stream_upsert": (
            # closed form of the foreachBatch fold: latest event per
            # user by (ts, event_id) + total count
            "WITH r AS (SELECT user_id, event_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rk, "
            "count(*) OVER (PARTITION BY user_id) AS n FROM events) "
            "SELECT user_id, event_id AS last_event_id, "
            "event_type AS last_type, CAST(n AS BIGINT) AS n_events "
            "FROM r WHERE rk = 1"
        ),
        "events_stream_alarms": (
            # batch closed form of the GroupState operator: running
            # per-user cents sum in (ts, event_id) order, one alarm row
            # per event where cum div 5000 increases
            "WITH p AS (SELECT user_id, event_id, ts, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'purchase'), "
            "cum AS (SELECT user_id, event_id, ts, "
            "CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents FROM p), "
            "x AS (SELECT user_id, event_id, cum_cents, "
            "coalesce(lag(cum_cents) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id), 0) AS prev FROM cum) "
            "SELECT user_id, event_id, cum_cents, "
            "CAST(cum_cents // 5000 AS BIGINT) AS level FROM x "
            "WHERE cum_cents // 5000 > prev // 5000"
        ),
        "clustering_coeff": _LCC_SQL,
        "kcore_suppliers": _kcore_sql(30, 8),
        "coreness_copurchase": _coreness_sql(8),
        "edge_support": _EDGE_SUPPORT_SQL,
        "ktruss_copurchase": _ktruss_sql(10, 12),
        "butterflies_suppliers": (
            # pairs drawn from the supplier side (wedge centers = parts);
            # the total is side-independent, arithmetic all-integer
            "WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s "
            "FROM lineitem), "
            "co AS (SELECT a.s AS s1, b.s AS s2, count(*) AS x FROM e a "
            "JOIN e b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2) "
            "SELECT CAST(COALESCE(sum((x * (x - 1)) // 2), 0) AS BIGINT) "
            "AS n_butterflies FROM co"
        ),
        "events_attribution": (
            "WITH clicks AS (SELECT user_id, ts, max(event_id) AS click_id "
            "FROM events WHERE event_type = 'click' GROUP BY 1, 2), "
            "purch AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT p.event_id, p.user_id, p.ts, c.click_id FROM purch p "
            "ASOF LEFT JOIN clicks c "
            "ON p.user_id = c.user_id AND p.ts >= c.ts"
        ),
        "clique4": _CP_SAMPLED
        + (
            "SELECT CAST(count(*) AS BIGINT) AS n_4cliques "
            "FROM o ab JOIN o bc ON bc.src = ab.dst "
            "JOIN o ac ON ac.src = ab.src AND ac.dst = bc.dst "
            "JOIN o cd ON cd.src = bc.dst "
            "JOIN o ad ON ad.src = ab.src AND ad.dst = cd.dst "
            "JOIN o bd ON bd.src = ab.dst AND bd.dst = cd.dst"
        ),
        "square_count": _CP_SAMPLED
        + (
            "SELECT CAST(CAST(sum(c * (c - 1) // 2) AS BIGINT) // 2 AS BIGINT) "
            "AS n_squares FROM ("
            "SELECT e1.dst AS u, e2.dst AS w, count(*) AS c FROM und e1 "
            "JOIN und e2 ON e1.src = e2.src WHERE e1.dst < e2.dst GROUP BY 1, 2)"
        ),
        "degree_assortativity": _CP
        + (
            ", m AS (SELECT du.deg AS dx, dd.deg AS dy FROM und e "
            "JOIN deg du ON du.v = e.src JOIN deg dd ON dd.v = e.dst), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(dx) AS BIGINT) AS sx, "
            "CAST(sum(dx * dx) AS BIGINT) AS sxx, "
            "CAST(sum(dx * dy) AS BIGINT) AS sxy FROM m) "
            "SELECT n AS n_dir_edges, "
            "CAST(n * sxy - sx * sx AS BIGINT) AS num, "
            "CAST(n * sxx - sx * sx AS BIGINT) AS den, "
            "CAST(n * sxy - sx * sx AS DOUBLE) / "
            "CAST(n * sxx - sx * sx AS DOUBLE) AS assortativity FROM s"
        ),
        "docs_inverted_index": (
            "SELECT t AS token, count(DISTINCT doc_id) AS df, "
            "count(*) AS tf_total, min(doc_id) AS first_doc, "
            "max(doc_id) AS last_doc FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents) GROUP BY 1"
        ),
        "docs_top_tokens": (
            "SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest(string_split(text, ' ')) AS t FROM documents) "
            "GROUP BY t ORDER BY cnt DESC, t ASC LIMIT 20"
        ),
        "events_error_overlap": (
            "WITH err AS (SELECT user_id AS u, ts AS s, "
            "ts + INTERVAL 5 MINUTE AS e FROM events "
            "WHERE event_type = 'error'), "
            "purch AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase'), "
            "m AS (SELECT p.event_id, count(*) AS n FROM purch p "
            "JOIN err ON err.u = p.user_id AND p.ts >= err.s AND p.ts < err.e "
            "GROUP BY 1) "
            "SELECT p.event_id, p.user_id, p.ts, "
            "CAST(COALESCE(m.n, 0) AS BIGINT) AS n_error_windows "
            "FROM purch p LEFT JOIN m ON m.event_id = p.event_id"
        ),
        "link_prediction": _CP
        + (
            ", cn AS (SELECT e1.dst AS u, e2.dst AS w, count(*) AS common "
            "FROM und e1 JOIN deg dc ON dc.v = e1.src AND dc.deg <= 150 "
            "JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst "
            "GROUP BY 1, 2 HAVING count(*) >= 12), "
            "cand AS (SELECT cn.u, cn.w, cn.common FROM cn "
            "LEFT JOIN und e ON e.src = cn.u AND e.dst = cn.w "
            "WHERE e.src IS NULL) "
            "SELECT c.u, c.w, CAST(c.common AS BIGINT) AS common, "
            "CAST(c.common AS DOUBLE) / (du.deg + dw.deg - c.common) AS jaccard "
            "FROM cand c JOIN deg du ON du.v = c.u JOIN deg dw ON dw.v = c.w"
        ),
        "link_prediction_exact": _EV
        + (
            ", und AS (SELECT src, dst FROM p "
            "UNION ALL SELECT dst AS src, src AS dst FROM p), "
            "deg AS (SELECT dst AS v, count(*) AS deg FROM und GROUP BY 1), "
            "cn AS (SELECT e1.dst AS u, e2.dst AS w, count(*) AS common "
            "FROM und e1 JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst "
            "GROUP BY 1, 2 HAVING count(*) >= 8), "
            "cand AS (SELECT cn.u, cn.w, cn.common FROM cn "
            "LEFT JOIN und e ON e.src = cn.u AND e.dst = cn.w "
            "WHERE e.src IS NULL) "
            "SELECT c.u, c.w, CAST(c.common AS BIGINT) AS common, "
            "CAST(c.common AS DOUBLE) / (du.deg + dw.deg - c.common) AS jaccard "
            "FROM cand c JOIN deg du ON du.v = c.u JOIN deg dw ON dw.v = c.w"
        ),
        "graph_summary": _CP
        + (
            ", b AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices, "
            "CAST(sum(deg) // 2 AS BIGINT) AS n_edges, "
            "CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges FROM deg), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM o e1 "
            "JOIN o e2 ON e1.dst = e2.src "
            "JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst) "
            "SELECT n_vertices, n_edges, n_wedges, n_triangles, "
            "CAST(3.0 AS DOUBLE) * n_triangles / n_wedges AS transitivity "
            "FROM b, t"
        ),
        "ppr_copurchase": _ppr_sql(10),
        "bfs_copurchase": _BFS_SQL,
        "sssp_copurchase": _sssp_sql(8),
        "web_hyperball": _hyperball_sql(3),
        "web_neighborhood_profile": _hyperball_profile_sql(3),
        "web_nf_curve": _nf_curve_sql(3),
        "web_harmonic": _harmonic_sql(3),
        "walks_copurchase": _walks_sql(4),
        "neighbor_sample_copurchase": _SAGE_SQL,
        "docs_repetition": _REPETITION_SQL,
        "docs_cooccurrence": _COOC_SQL,
        "triangle_estimate_sampled": _TRI_SAMPLED_SQL,
        "docs_sample_stratified": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) "
            "AS BIGINT) % 8 < "
            "CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 ELSE 1 END"
        ),
        "events_value_outliers": (
            "WITH c AS (SELECT event_id, event_type, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events), "
            "s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(cents) AS BIGINT) AS s1, "
            "CAST(sum(cents * cents) AS BIGINT) AS s2 FROM c GROUP BY 1) "
            "SELECT event_id, c.event_type, cents, "
            "(cents * n - s1) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) AS z "
            "FROM c JOIN s ON s.event_type = c.event_type "
            "WHERE abs((cents * n - s1) / "
            "sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))) > 3"
        ),
        "events_rolling_avg": (
            "WITH c AS (SELECT user_id, event_id, ts, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events) "
            "SELECT user_id, event_id, cents, "
            "CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w AS avg3 "
            "FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        ),
        "events_user_hll": (
            "WITH h AS (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events), "
            "p AS (SELECT CAST(('0x' || substring(h, 1, 2)) AS BIGINT) AS bucket, "
            "substring(h, 3, 13) AS w FROM h), "
            "r AS (SELECT bucket, CASE WHEN w = '0000000000000' THEN 53 ELSE "
            "4 * length(regexp_extract(w, '^(0*)', 1)) + (CASE "
            "WHEN substring(w, length(regexp_extract(w, '^(0*)', 1)) + 1, 1) "
            "IN ('8','9','a','b','c','d','e','f') THEN 0 "
            "WHEN substring(w, length(regexp_extract(w, '^(0*)', 1)) + 1, 1) "
            "IN ('4','5','6','7') THEN 1 "
            "WHEN substring(w, length(regexp_extract(w, '^(0*)', 1)) + 1, 1) "
            "IN ('2','3') THEN 2 ELSE 3 END) + 1 END AS rho FROM p), "
            "regs AS (SELECT bucket, max(rho) AS m_j FROM r GROUP BY 1), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets, "
            "CAST(sum(CAST(1 AS BIGINT) << (53 - m_j)) "
            "+ (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT) "
            "AS s_scaled FROM regs), "
            "x AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact "
            "FROM events) "
            "SELECT n_exact, n_buckets, s_scaled, "
            "CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / "
            "CAST(256 AS DOUBLE)) * CAST(65536 AS DOUBLE) * "
            "CAST(9007199254740992 AS DOUBLE) / s_scaled AS estimate FROM x, s"
        ),
        "docs_tfidf_top": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents), "
            "tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf "
            "FROM toks GROUP BY 1, 2), "
            "df AS (SELECT t, CAST(count(*) AS BIGINT) AS df "
            "FROM (SELECT DISTINCT doc_id, t FROM toks) GROUP BY 1), "
            "n AS (SELECT count(*) AS n_docs FROM documents), "
            "s AS (SELECT doc_id, t, tf, df, "
            "CAST(tf * n_docs AS DOUBLE) / df AS score, "
            "row_number() OVER (PARTITION BY doc_id ORDER BY "
            "CAST(tf * n_docs AS DOUBLE) / df DESC, t ASC) AS rn "
            "FROM tf JOIN df USING (t), n) "
            "SELECT doc_id, t AS token, tf, df, score FROM s WHERE rn = 1"
        ),
        "events_top3_per_user": (
            "SELECT user_id, rn, event_id, value FROM ("
            "SELECT user_id, event_id, value, row_number() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, ts ASC, event_id ASC"
            ") AS rn FROM events) WHERE rn <= 3"
        ),
        "events_value_quantiles": (
            "WITH r AS (SELECT event_type, value, row_number() OVER ("
            "PARTITION BY event_type ORDER BY value, event_id) AS rn, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM events), "
            "qs AS (SELECT unnest(CAST([0.25, 0.5, 0.75, 0.9] AS DOUBLE[])) AS q) "
            "SELECT event_type, q, value FROM r, qs "
            "WHERE rn = CAST(ceil(q * n) AS BIGINT)"
        ),
        "lineitem_rollup": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 6) AS sum_qty, count(*) AS n_rows "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "lineitem_stats": " UNION ALL ".join(
            f"SELECT '{c}' AS column, CAST(min({c}) AS DOUBLE) AS min_v, "
            f"CAST(max({c}) AS DOUBLE) AS max_v, "
            f"CAST(count(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS ndv FROM lineitem"
            for c in ("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        ),
        "lineitem_cube": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 6) AS sum_qty, count(*) AS n_rows "
            "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
        ),
        "events_stream_dedup": (
            "SELECT DISTINCT user_id, event_type FROM events"
        ),
        "events_stream_sessions": (
            # gaps-and-islands sessionization; >= gap starts a new session
            # (session_window end bound is exclusive); emitted sessions are
            # those fully closed by the final watermark max(ts) - 2h
            "WITH x AS (SELECT user_id, ts, event_id, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts "
            "FROM events), "
            "s AS (SELECT *, sum(CASE WHEN pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) >= 1800000000 THEN 1 ELSE 0 END) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM x), "
            "g AS (SELECT user_id, sid, min(ts) AS sess_start, "
            "max(ts) + INTERVAL 30 MINUTE AS sess_end, "
            "CAST(count(*) AS BIGINT) AS n_events FROM s GROUP BY user_id, sid), "
            "wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events) "
            "SELECT sess_start, sess_end, user_id, n_events FROM g "
            "WHERE sess_end <= (SELECT w FROM wm)"
        ),
        "docs_exact_dedup": (
            "SELECT md5(text) AS text_hash, count(*) AS n_docs, "
            "min(doc_id) AS keeper FROM documents GROUP BY md5(text)"
        ),
        "docs_token_stats": (
            "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
            "len(list_distinct(string_split(text, ' '))) AS n_types FROM documents"
        ),
        "docs_quality": (
            "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents) "
            f"SELECT doc_id, round(sum(CASE WHEN {_sw_pred('t', _STOPWORDS['en'])} "
            "THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS stop_ratio, "
            "round(avg(length(t)), 6) AS mean_token_len FROM tok GROUP BY doc_id"
        ),
        "docs_lang_id": (
            "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents), "
            f"sc AS (SELECT doc_id, {sw_counts} FROM tok GROUP BY doc_id) "
            "SELECT doc_id, CASE "
            "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_hi AND s_en > 0 THEN 'en' "
            "WHEN s_de >= s_fr AND s_de >= s_hi AND s_de > 0 THEN 'de' "
            "WHEN s_fr >= s_hi AND s_fr > 0 THEN 'fr' "
            "WHEN s_hi > 0 THEN 'hi' ELSE 'und' END AS lang_pred FROM sc"
        ),
        "docs_fingerprint": (
            "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents"
        ),
        "docs_pii_scrub": (
            "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text "
            "ELSE text || ' Contact user' || doc_id || '@mail' || (doc_id % 7) "
            "|| '.example or +1 ' || (doc_id % 800 + 100) || ' 555 ' "
            "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
            "|| ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') "
            "|| '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') "
            "|| '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
            "|| ' ip 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) "
            "|| '.' || (doc_id % 250) || ' end' END AS t FROM documents) "
            f"SELECT doc_id, {pii_counts_sql}, md5({pii_red_sql}) AS red_md5 "
            "FROM aug"
        ),
        "docs_jaccard_pairs": _SHINGLES
        + (
            ", sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT a, b, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jac "
            "FROM inter JOIN sizes sa ON sa.doc_id = inter.a "
            "JOIN sizes sb ON sb.doc_id = inter.b "
            "WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5"
        ),
        "docs_ngram_jaccard": (
            "WITH sh AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(range(1, length(text) - 3), "
            "i -> substring(text, CAST(i AS INT), 5))) AS s "
            "FROM documents WHERE length(text) >= 5), "
            # identical df<=100 boilerplate-gram cap as the engine
            "dfc AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100), "
            "shc AS (SELECT sh.* FROM sh JOIN dfc USING (s)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i "
            "FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT a, b, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jac "
            "FROM inter JOIN sizes sa ON sa.doc_id = inter.a "
            "JOIN sizes sb ON sb.doc_id = inter.b "
            "WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5"
        ),
        # identical boundary rule: low nibble of md5 of the 4-char gram
        "docs_cdc_chunks": (
            "WITH d AS (SELECT doc_id, text AS t FROM documents), "
            "ch AS (SELECT doc_id, t, list_concat(list_concat([0], "
            "list_filter(range(4, length(t) + 1), "
            "i -> substring(md5(substring(t, CAST(i - 3 AS INT), 4)), 32, 1) "
            "= '0')), [length(t)]) AS bounds FROM d), "
            "chunks AS (SELECT doc_id, unnest(list_filter("
            "list_transform(range(1, len(bounds)), "
            "j -> substring(t, CAST(bounds[CAST(j AS INT)] + 1 AS INT), "
            "CAST(bounds[CAST(j AS INT) + 1] - bounds[CAST(j AS INT)] AS INT))), "
            "c -> c <> '')) AS chunk FROM ch) "
            "SELECT md5(chunk) AS chunk_hash, CAST(count(*) AS BIGINT) AS n_chunks, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
            "FROM chunks GROUP BY 1"
        ),
        # identical 8-token windows; benchmark = ids ≡ 0 mod 50
        "docs_decontamination": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents WHERE len(string_split(text, ' ')) >= 8), "
            "wins AS (SELECT DISTINCT doc_id, md5(s) AS wh FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(t) - 6), "
            "i -> array_to_string(t[i:i+7], ' '))) AS s FROM w)), "
            "bench AS (SELECT DISTINCT wh FROM wins WHERE doc_id % 50 = 0), "
            "train AS (SELECT * FROM wins WHERE doc_id % 50 <> 0), "
            "nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows "
            "FROM train GROUP BY 1), "
            "nh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated "
            "FROM train WHERE wh IN (SELECT wh FROM bench) GROUP BY 1) "
            "SELECT nw.doc_id, n_windows, "
            "coalesce(n_contaminated, 0) AS n_contaminated, "
            "round(coalesce(n_contaminated, 0) * 1.0 / n_windows, 6) AS frac "
            "FROM nw LEFT JOIN nh ON nh.doc_id = nw.doc_id"
        ),
        "docs_pack_plan": (
            "WITH d AS (SELECT doc_id, source, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "o AS (SELECT doc_id, source, n_tokens, "
            "CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source "
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS BIGINT) AS tok_offset FROM d) "
            "SELECT doc_id, source, n_tokens, tok_offset, "
            "tok_offset // 256 AS bin, tok_offset % 256 AS bin_offset FROM o"
        ),
        # identical portable count-min sketch: same md5 row-hashes, same
        # 512x3 geometry — estimates (collisions included) match exactly
        "docs_token_cms": (
            "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS x "
            "FROM documents), "
            "rws AS (SELECT x, unnest(range(3)) AS d FROM tok), "
            "sk AS (SELECT d, CAST(CAST('0x' || substring("
            "md5('cms:' || d || ':' || x), 1, 15) AS UBIGINT) AS BIGINT) "
            "% 512 AS bucket, CAST(count(*) AS BIGINT) AS n "
            "FROM rws GROUP BY 1, 2), "
            "ks AS (SELECT DISTINCT x FROM tok), "
            "pr AS (SELECT x, d, CAST(CAST('0x' || substring("
            "md5('cms:' || d || ':' || x), 1, 15) AS UBIGINT) AS BIGINT) "
            "% 512 AS bucket FROM ks, (SELECT unnest(range(3)) AS d)) "
            "SELECT x AS t, min(n) AS est_n "
            "FROM pr JOIN sk USING (d, bucket) GROUP BY 1"
        ),
        # identical 8-token windows, df-capped at 10 exactly like the
        # engine; containment over each doc's FULL distinct-window count
        "docs_window_dedup": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents WHERE len(string_split(text, ' ')) >= 8), "
            "wins AS (SELECT DISTINCT doc_id, md5(s) AS wh FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(t) - 6), "
            "i -> array_to_string(t[i:i+7], ' '))) AS s FROM w)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM wins GROUP BY 1), "
            "dfq AS (SELECT wh FROM wins GROUP BY wh "
            "HAVING count(*) BETWEEN 2 AND 10), "
            "kept AS (SELECT wins.* FROM wins JOIN dfq USING (wh)), "
            "sh AS (SELECT x.doc_id AS a, y.doc_id AS b, "
            "CAST(count(*) AS BIGINT) AS shared "
            "FROM kept x JOIN kept y USING (wh) "
            "WHERE x.doc_id < y.doc_id GROUP BY 1, 2) "
            "SELECT a, b, shared, "
            "round(shared * 1.0 / least(sa.n, sb.n), 6) AS containment "
            "FROM sh JOIN sizes sa ON sa.doc_id = sh.a "
            "JOIN sizes sb ON sb.doc_id = sh.b"
        ),
        "docs_minhash_candidates": _SHINGLES
        + (
            f", sig AS (SELECT doc_id, {mh_mins} FROM sh GROUP BY doc_id), "
            f"bands AS ({band_selects}) "
            "SELECT DISTINCT l.doc_id AS a, r.doc_id AS b "
            "FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key "
            "WHERE l.doc_id < r.doc_id"
        ),
        "docs_minhash_est": _SHINGLES
        + (
            f", sig AS (SELECT doc_id, {mh_mins} FROM sh GROUP BY doc_id), "
            f"bands AS ({band_selects}), "
            "cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b "
            "FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key "
            "WHERE l.doc_id < r.doc_id) "
            "SELECT cand.a, cand.b, CAST(("
            + " + ".join(
                f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
                for i in range(_MH_H)
            )
            + ") AS BIGINT) AS n_match, CAST(("
            + " + ".join(
                f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
                for i in range(_MH_H)
            )
            + f") AS DOUBLE) / CAST({_MH_H} AS DOUBLE) AS est_jaccard "
            "FROM cand JOIN sig sa ON sa.doc_id = cand.a "
            "JOIN sig sb ON sb.doc_id = cand.b"
        ),
        "docs_dedup_clusters": _SHINGLES
        + (
            f", sig AS (SELECT doc_id, {mh_mins} FROM sh GROUP BY doc_id), "
            f"bands AS ({band_selects}), "
            "cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b "
            "FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key "
            "WHERE l.doc_id < r.doc_id), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS (SELECT c.a, c.b, count(*) AS i "
            "FROM cand c JOIN sh sa ON sa.doc_id = c.a "
            "JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s GROUP BY 1, 2), "
            "verified AS (SELECT inter.a AS src, inter.b AS dst FROM inter "
            "JOIN sizes sa ON sa.doc_id = inter.a "
            "JOIN sizes sb ON sb.doc_id = inter.b "
            "WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5), "
            "und AS (SELECT src, dst FROM verified "
            "UNION ALL SELECT dst AS src, src AS dst FROM verified), "
            "verts AS (SELECT DISTINCT src AS v FROM und) "
            "SELECT v AS doc_id, min(m) AS cluster, v = min(m) AS keep FROM ("
            "  WITH RECURSIVE reach(v, m) AS ("
            "    SELECT v, v FROM verts UNION "
            "    SELECT e.dst AS v, r.m FROM reach r JOIN und e ON e.src = r.v) "
            "  SELECT v, m FROM reach) GROUP BY v"
        ),
        "events_pivot": (
            "SELECT user_id, "
            "CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click, "
            "CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error, "
            "CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase, "
            "CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup, "
            "CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view "
            "FROM events GROUP BY user_id"
        ),
        "events_funnel": (
            "WITH v AS (SELECT user_id, min(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "c AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN v ON v.user_id = e.user_id AND e.ts > v.t "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "p AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN c ON c.user_id = e.user_id AND e.ts > c.t "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view, "
            "(SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click, "
            "(SELECT CAST(count(*) AS BIGINT) FROM p) AS n_view_click_purchase, "
            "(SELECT CAST(count(*) AS DOUBLE) FROM c) / "
            "(SELECT CAST(count(*) AS DOUBLE) FROM v) AS cr_click, "
            "(SELECT CAST(count(*) AS DOUBLE) FROM p) / "
            "(SELECT CAST(count(*) AS DOUBLE) FROM c) AS cr_purchase"
        ),
        "docs_simhash": _SIMHASH + "SELECT doc_id, simhash FROM sh",
        "docs_simhash_neardup": _SIMHASH
        + (
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "emb_knn_lsh": _lsh_sql(_LSH_P, _LSH_T, 5),
        "emb_knn_ivf": _ivf_sql(_IVF_K, _IVF_PROBE, 5),
        "emb_knn": (
            "WITH q AS (SELECT vec_id AS q, embedding AS qv FROM embeddings "
            "WHERE vec_id < 20), "
            "c AS (SELECT vec_id AS nbr, embedding AS cv FROM embeddings), "
            f"s AS (SELECT q, nbr, {cos} AS sim FROM q, c WHERE q <> nbr), "
            "r AS (SELECT q, nbr, sim, row_number() OVER "
            "(PARTITION BY q ORDER BY sim DESC, nbr ASC) AS rk FROM s) "
            "SELECT q, nbr, round(sim, 6) AS sim FROM r WHERE rk <= 5"
        ),
        # identical int8 quantization (one scale division, one product,
        # one half-away round per element), exact BIGINT dots, and a
        # 3-IEEE-op similarity — bit-stable ranking on both engines
        "emb_kmeans": _kmeans_sql(8, 1, 64),
        "emb_knn_quantized": _QKNN
        + " SELECT q, nbr, dot, round(sim, 6) AS sim FROM r WHERE rk <= 5",
        # the large-Q block-join regime is the SAME exact contract
        "emb_knn_join": _QKNN
        + " SELECT q, nbr, dot, round(sim, 6) AS sim FROM r WHERE rk <= 5",
        # widen to top-25 on the same bit-stable quantized scan, then
        # keep the 3 best cross-label survivors — exactly as the engine
        "emb_hard_negatives": _QKNN + (
            ", wide AS (SELECT q, nbr, dot, sim FROM r WHERE rk <= 25), "
            "lab AS (SELECT vec_id, label FROM embeddings), "
            "f AS (SELECT w.q, w.nbr, w.dot, w.sim FROM wide w "
            "JOIN lab a ON a.vec_id = w.q JOIN lab b ON b.vec_id = w.nbr "
            "WHERE a.label <> b.label), "
            "r2 AS (SELECT q, nbr, dot, sim, row_number() OVER "
            "(PARTITION BY q ORDER BY sim DESC, nbr ASC) AS rk FROM f) "
            "SELECT q, nbr, dot, round(sim, 6) AS sim FROM r2 WHERE rk <= 3"
        ),
        "emb_label_spreading": _label_spreading_sql(3),
        "emb_balanced_sample": (
            "WITH r AS (SELECT vec_id, label, CAST(row_number() OVER "
            "(PARTITION BY label ORDER BY md5('bal:' || vec_id), vec_id) "
            "AS BIGINT) AS rk FROM embeddings) "
            "SELECT vec_id, label, rk FROM r WHERE rk <= 20"
        ),
        "emb_neardup_pairs": _neardup_lsh_sql(0.3, _LSH_P, _LSH_T),
        "emb_neardup_exact": (
            "WITH a AS (SELECT vec_id AS a, embedding AS qv FROM embeddings), "
            "b AS (SELECT vec_id AS b, embedding AS cv FROM embeddings) "
            f"SELECT a, b, round({cos}, 6) AS sim FROM a, b "
            f"WHERE a < b AND round({cos}, 6) >= 0.5"
        ),
        "web_text_extraction": _WEB
        + (
            "SELECT url, 'Doc ' || doc_id || chr(10) || 'w' || (doc_id % 7) "
            "|| ' w' || (doc_id % 13) || ' w' || (doc_id % 5) AS text FROM pg"
        ),
        "web_edges_mined": _WEB + "SELECT src_url, dst_url FROM mined",
        "web_vertex_dict": _WEB
        + (
            ", u AS (SELECT DISTINCT url FROM ("
            "SELECT src_url AS url FROM mined "
            "UNION ALL SELECT dst_url AS url FROM mined)) "
            "SELECT url, row_number() OVER (ORDER BY url) - 1 AS vid FROM u"
        ),
        "web_triangle_total": _WEB_GRAPH
        + (
            "SELECT count(*) AS n_triangles FROM o e1 "
            "JOIN o e2 ON e1.dst = e2.src "
            "JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst"
        ),
        # count invariant to the anchor assignment — same oracle as
        # web_triangle_total; what the hash checks is the partitioner's
        # routing (complete, unique, in-range)
        "triangle_total_metis": _WEB_GRAPH
        + (
            "SELECT count(*) AS n_triangles FROM o e1 "
            "JOIN o e2 ON e1.dst = e2.src "
            "JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst"
        ),
        "web_pagerank": _pagerank_sql(10, prefix=_WEB_VID),
        "web_pagerank_weighted": _wpr_sql(10),
        "web_redirects": _redirects_sql(4),
        "web_url_templates": _WEB + (
            ", u AS (SELECT src_url AS url FROM mined "
            "UNION ALL SELECT dst_url AS url FROM mined) "
            "SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, "
            "regexp_replace(regexp_extract(url, '^https?://[^/]+(/.*)?$', 1), "
            "'\\d+', '#', 'g') AS template, "
            "CAST(count(*) AS BIGINT) AS n_urls FROM u GROUP BY 1, 2"
        ),
        "web_crawl_delta": _WEB + (
            ", a AS (SELECT url, md5(html) AS fp FROM pg "
            "WHERE doc_id % 10 <> 9), "
            "b AS (SELECT url, md5(html || CASE WHEN doc_id % 7 = 0 "
            "THEN ':v2' ELSE '' END) AS fp FROM pg WHERE doc_id % 10 <> 0) "
            "SELECT coalesce(a.url, b.url) AS url, "
            "CASE WHEN b.url IS NULL THEN 'removed' "
            "WHEN a.url IS NULL THEN 'added' ELSE 'changed' END AS status "
            "FROM a FULL OUTER JOIN b ON a.url = b.url "
            "WHERE a.url IS NULL OR b.url IS NULL OR a.fp <> b.fp"
        ),
        "web_frontier_bloom": _WEB + (
            ", bits AS (SELECT DISTINCT CAST(CAST('0x' || substring("
            "md5('bloom:' || j || ':' || url), 1, 15) AS UBIGINT) AS BIGINT) "
            "% 65536 AS bit FROM pg, (SELECT unnest(range(4)) AS j)), "
            "cand AS (SELECT DISTINCT dst_url AS x FROM mined), "
            "pr AS (SELECT x, CAST(CAST('0x' || substring("
            "md5('bloom:' || j || ':' || x), 1, 15) AS UBIGINT) AS BIGINT) "
            "% 65536 AS bit FROM cand, (SELECT unnest(range(4)) AS j)), "
            "hits AS (SELECT x, count(*) AS h FROM pr "
            "WHERE bit IN (SELECT bit FROM bits) GROUP BY 1) "
            "SELECT c.x AS url, coalesce(h, 0) = 4 AS maybe_member "
            "FROM cand c LEFT JOIN hits ON hits.x = c.x"
        ),
        "web_fetch_slots": _WEB + (
            "SELECT url, regexp_extract(url, '^https?://([^/]+)', 1) AS host, "
            "CAST(row_number() OVER (PARTITION BY "
            "regexp_extract(url, '^https?://([^/]+)', 1) ORDER BY url) "
            "AS BIGINT) AS fetch_slot FROM pg"
        ),
        "web_hits": _hits_sql(6),
        "web_components": _WEB_GRAPH.replace("WITH pg", "WITH RECURSIVE pg", 1)
        + (
            ", verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und), "
            "reach(v, m) AS (SELECT v, v FROM verts "
            "UNION SELECT e.dst, r.m FROM reach r JOIN und e ON e.src = r.v) "
            "SELECT v AS url, min(m) AS comp FROM reach GROUP BY v"
        ),
        # SCC oracle: closed-form via recursive-CTE transitive closure —
        # scc(v) = min({v} ∪ {w : v →* w AND w →* v})
        "web_scc": _WEB_DIR.replace("WITH pg", "WITH RECURSIVE pg", 1)
        + (
            ", reach AS (SELECT src AS a, dst AS b FROM g "
            "UNION SELECT r.a, g.dst FROM reach r JOIN g ON g.src = r.b), "
            "mut AS (SELECT r1.a AS v, r1.b AS w FROM reach r1 "
            "JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a), "
            "vs AS (SELECT src AS v FROM g UNION SELECT dst FROM g) "
            "SELECT vs.v AS url, least(vs.v, coalesce(min(m.w), vs.v)) AS scc "
            "FROM vs LEFT JOIN mut m ON m.v = vs.v GROUP BY vs.v"
        ),
        # bow-tie oracle: core = largest mutual-reach class from the same
        # transitive closure as the web_scc oracle; in/out/weak follow as
        # set algebra over `reach`, tendril via an undirected closure.
        "web_bowtie": _WEB_DIR.replace("WITH pg", "WITH RECURSIVE pg", 1)
        + (
            ", reach AS (SELECT src AS a, dst AS b FROM g "
            "UNION SELECT r.a, g.dst FROM reach r JOIN g ON g.src = r.b), "
            # NB: in DuckDB 1.0, UNION inside a non-recursive CTE under
            # WITH RECURSIVE does NOT dedup — vs must be explicitly
            # DISTINCT since its rows reach the output unaggregated.
            "vs AS (SELECT DISTINCT v FROM "
            "(SELECT src AS v FROM g UNION ALL SELECT dst FROM g)), "
            "mut AS (SELECT r1.a AS v, r1.b AS w FROM reach r1 "
            "JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a), "
            "scc AS (SELECT vs.v, least(vs.v, coalesce(min(m.w), vs.v)) AS scc "
            "FROM vs LEFT JOIN mut m ON m.v = vs.v GROUP BY vs.v), "
            "core_lbl AS (SELECT scc FROM (SELECT scc, count(*) AS n "
            "FROM scc GROUP BY 1) ORDER BY n DESC, scc ASC LIMIT 1), "
            "core AS (SELECT v FROM scc WHERE scc = (SELECT scc FROM core_lbl)), "
            "fwd AS (SELECT v FROM core UNION "
            "SELECT r.b FROM reach r WHERE r.a IN (SELECT v FROM core)), "
            "bwd AS (SELECT v FROM core UNION "
            "SELECT r.a FROM reach r WHERE r.b IN (SELECT v FROM core)), "
            "und AS (SELECT src, dst FROM g UNION SELECT dst, src FROM g), "
            "weak AS (SELECT v FROM core UNION "
            "SELECT u.dst FROM weak w JOIN und u ON u.src = w.v) "
            "SELECT vs.v AS url, CASE "
            "WHEN vs.v IN (SELECT v FROM core) THEN 'core' "
            "WHEN vs.v IN (SELECT v FROM bwd) THEN 'in' "
            "WHEN vs.v IN (SELECT v FROM fwd) THEN 'out' "
            "WHEN vs.v IN (SELECT v FROM weak) THEN 'tendril' "
            "ELSE 'disconnected' END AS cls FROM vs"
        ),
        # url normalization oracle: rebuild the md5-keyed messy variants,
        # then normalize with an independent SQL rule chain (DuckDB
        # regexp_replace needs the explicit 'g' flag where Spark's is
        # global by default).
        "web_url_normalize": _WEB
        + (
            ", urls AS (SELECT DISTINCT u FROM (SELECT src_url AS u FROM mined "
            "UNION ALL SELECT dst_url AS u FROM mined)), "
            "m0 AS (SELECT u, CAST(('0x' || substring(md5(u), 1, 2)) AS BIGINT) % 6 AS k, "
            "regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) AS hp FROM urls), "
            "messy AS (SELECT CASE k "
            "WHEN 0 THEN u "
            "WHEN 1 THEN upper(hp) || substring(u, length(hp) + 1) "
            "WHEN 2 THEN hp || ':443' || substring(u, length(hp) + 1) "
            "WHEN 3 THEN u || '#section-2' "
            "WHEN 4 THEN u || '?utm_source=feed&utm_campaign=x' "
            "ELSE u || '/' END AS messy FROM m0), "
            "n1 AS (SELECT messy, regexp_replace(regexp_replace(messy, '#.*$', ''), "
            "'[?&]utm_[A-Za-z]+=[^&#]*', '', 'g') AS s FROM messy), "
            "n2 AS (SELECT messy, s, "
            "regexp_extract(s, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) AS hp FROM n1) "
            "SELECT messy, regexp_replace(regexp_replace(lower(hp), ':(443|80)$', '') "
            "|| substring(s, length(hp) + 1), '/$', '') AS canonical FROM n2"
        ),
        "web_mirror_pages": _WEB
        + (
            ", fps AS (SELECT url, md5('w' || (doc_id % 7) || ' w' || "
            "(doc_id % 13) || ' w' || (doc_id % 5)) AS fp FROM pg) "
            "SELECT fp, count(*) AS n_pages, min(url) AS first_url, "
            "max(url) AS last_url FROM fps GROUP BY 1 HAVING count(*) > 1"
        ),
        "web_anchor_text": _WEB
        + (
            ", atoks AS (SELECT url AS src_url, unnest(regexp_extract_all(html, "
            "'<a href=\"[^\"]*\"[^>]*>[^<]*</a>')) AS tok FROM pg), "
            "apairs AS (SELECT src_url, "
            "regexp_extract(tok, 'href=\"([^\"]*)\"', 1) AS href, "
            "regexp_extract(tok, '>([^<]*)</a>', 1) AS anchor FROM atoks), "
            "aresolved AS (SELECT CASE "
            "WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href "
            "WHEN href LIKE '/%' THEN "
            "regexp_extract(src_url, '^(https?://[^/]+)', 1) || href "
            "END AS dst_url, anchor FROM apairs "
            "WHERE href <> '' AND (href LIKE 'http://%' OR "
            "href LIKE 'https://%' OR href LIKE '/%')) "
            "SELECT dst_url, anchor, count(*) AS n_refs FROM aresolved "
            "GROUP BY 1, 2"
        ),
        "web_dangling_links": _WEB
        + (
            ", crawled AS (SELECT DISTINCT url FROM pg), "
            "refs AS (SELECT dst_url AS url, count(*) AS n_refs, "
            "count(DISTINCT regexp_extract(src_url, '^https?://([^/]+)', 1)) "
            "AS n_src_hosts FROM mined GROUP BY 1) "
            "SELECT r.url, r.n_refs, r.n_src_hosts FROM refs r "
            "LEFT JOIN crawled c ON c.url = r.url WHERE c.url IS NULL"
        ),
        "web_host_graph": _WEB
        + (
            "SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host, "
            "regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host, "
            "CAST(count(*) AS BIGINT) AS n_links FROM mined GROUP BY 1, 2"
        ),
        "web_reciprocity": _WEB_DIR
        + (
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_edges, "
            "(SELECT CAST(count(*) AS BIGINT) FROM g "
            " JOIN g r ON r.src = g.dst AND r.dst = g.src) AS n_reciprocal, "
            "(SELECT CAST(count(*) AS DOUBLE) FROM g "
            " JOIN g r ON r.src = g.dst AND r.dst = g.src) / "
            "(SELECT CAST(count(*) AS DOUBLE) FROM g) AS reciprocity"
        ),
        "media_frame_plan": (
            "SELECT doc_id AS media_id, "
            "unnest(range(0, 30 + doc_id % 100, 10)) AS frame_idx "
            "FROM documents WHERE doc_id % 3 = 2"
        ),
        "media_features": _MEDIA_FEATURES_SQL,
    }
