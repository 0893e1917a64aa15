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


def test_interval_join_goldens(spark):
    from datetime import datetime

    from trianglecount_spark.operators.interval import interval_join

    T = lambda m, s=0, us=0: datetime(2024, 1, 1, 0, m, s, us)
    points = spark.createDataFrame(
        [(1, T(2)), (2, T(5)), (3, T(10)), (4, T(4, 59, 999999))],
        "pid long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [(100, T(0), T(5)), (200, T(4), T(6)), (300, T(20), T(25))],
        "iid long, s timestamp, e timestamp",
    )
    out = interval_join(points, ivals, point_ts="ts", start_col="s", end_col="e")
    got = {(r.pid, r.iid) for r in out.collect()}
    # end exclusive: pid=2 at t=5 not in [0,5); boundary microsecond is
    assert got == {(1, 100), (4, 100), (4, 200), (2, 200)}

    # bucket width smaller than intervals: same result (pure partitioning)
    out2 = interval_join(
        points, ivals, point_ts="ts", start_col="s", end_col="e", bucket_us=7_000_000
    )
    assert {(r.pid, r.iid) for r in out2.collect()} == got


def test_interval_join_keyed(spark):
    from datetime import datetime

    from trianglecount_spark.operators.interval import interval_join

    T = lambda m: datetime(2024, 1, 1, 0, m)
    points = spark.createDataFrame(
        [(1, 7, T(2)), (2, 8, T(2))], "pid long, u long, ts timestamp"
    )
    ivals = spark.createDataFrame(
        [(100, 7, T(0), T(5))], "iid long, u long, s timestamp, e timestamp"
    )
    out = interval_join(
        points, ivals, point_ts="ts", start_col="s", end_col="e", on="u"
    )
    assert {(r.pid, r.iid) for r in out.collect()} == {(1, 100)}
