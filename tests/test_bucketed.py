from __future__ import annotations

from pyspark.sql import functions as F

from trianglecount_spark.sources.bucketed import read_bucketed, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_layout_replaces_shuffles(spark, tmp_path):
    """Storage-level co-location: (1) an agg keyed on the bucket key runs
    with ZERO Exchange over the bucketed table (raw parquet needs one);
    (2) with broadcast off, the PageRank-shaped join shuffles only the
    rank side — the bucketed scan satisfies its join requirement from
    the file layout. This is the cross-job version of the
    repartition+cache co-location the iterative ops use in-session."""
    edges = (
        spark.range(40_000)
        .select(
            (F.col("id") % 2000).alias("src"),
            ((F.col("id") * 7 + 1) % 2000).alias("dst"),
        )
        .withColumn("w", F.lit(1.0) / 20)
    )
    write_bucketed(
        edges, "ew_bucketed", str(tmp_path / "ew"), key="src", buckets=8
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        big = read_bucketed(spark, "ew_bucketed")
        raw = spark.read.parquet(str(tmp_path / "ew"))

        # (1) bucket-key aggregation: no shuffle at all
        assert _plan(big.groupBy("src").count()).count("Exchange") == 0
        assert _plan(raw.groupBy("src").count()).count("Exchange") == 1

        # (2) non-broadcast equi-join on the bucket key: only the small
        # side exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ranks = spark.range(2000).select(
            F.col("id").alias("src"), F.lit(0.0005).alias("rank")
        )
        joined = big.join(ranks, "src").groupBy("dst").agg(
            F.sum(F.col("rank") * F.col("w")).alias("contrib")
        )
        joined_raw = raw.join(ranks, "src").groupBy("dst").agg(
            F.sum(F.col("rank") * F.col("w")).alias("contrib")
        )
        n_b, n_r = _plan(joined).count("Exchange"), _plan(joined_raw).count("Exchange")
        assert n_b < n_r, (n_b, n_r)

        # result parity: bucketing is a physical property only
        got = {(r.dst, round(r.contrib, 12)) for r in joined.collect()}
        want = {(r.dst, round(r.contrib, 12)) for r in joined_raw.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS ew_bucketed")
