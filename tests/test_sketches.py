"""Deterministic HLL: accuracy envelope + partition invariance."""

from trianglecount_spark.operators.sketches import hll_sketch


def test_hll_accuracy_and_partition_invariance(spark):
    df = spark.range(0, 20000, 1, 8).selectExpr("id AS v")
    row = hll_sketch(df, "v").collect()[0]
    # m=256 => relative std error ~1.04/sqrt(256) = 6.5%; 4 sigma bound
    assert abs(row.estimate - 20000) / 20000 < 0.26, row

    # same values, duplicated and differently partitioned => identical sketch
    dup = df.unionByName(df).repartition(32)
    row2 = hll_sketch(dup, "v").collect()[0]
    assert (row.n_buckets, row.s_scaled, row.estimate) == (
        row2.n_buckets,
        row2.s_scaled,
        row2.estimate,
    )
