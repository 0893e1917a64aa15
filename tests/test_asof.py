from __future__ import annotations

from trianglecount_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, 3, "a"), (1, 5, "b"), (1, 0, "c"), (2, 9, "d"), (3, 1, "e")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 1, 10), (1, 5, 50), (2, 2, 20), (2, 2, 21)],
        "k long, t long, v long",
    )
    return left, right


def test_asof_inclusive_matches(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", value_cols=["v"])
    got = {r.name: r.asof_v for r in out.collect()}
    assert got == {
        "a": 10,   # last right at t<=3 is t=1
        "b": 50,   # equal ts matches (inclusive)
        "c": None, # nothing at or before t=0
        "d": 21,   # tie at (k=2, t=2): max right_order wins
        "e": None, # key with no right rows
    }
    # all left rows survive (left-join semantics)
    assert out.count() == left.count()


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        value_cols=["v"], strict=True,
    )
    got = {r.name: r.asof_v for r in out.collect()}
    assert got["b"] == 10  # t=5 right row no longer eligible
    assert got["a"] == 10 and got["c"] is None


def test_asof_multiple_value_cols(spark):
    left = _dfs(spark)[0]
    right = _dfs(spark)[1].withColumnRenamed("v", "price").selectExpr(
        "k", "t", "price", "price * 2 as qty"
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        value_cols=["price", "qty"], right_order=["price"],
    )
    got = {r.name: (r.asof_price, r.asof_qty) for r in out.collect()}
    assert got["d"] == (21, 42)  # both columns come from the SAME winning row
    assert got["a"] == (10, 20)
