"""Interval (range-containment) join — the second custom operator the
DataFrame API lacks a scalable primitive for.

Semantics: inner-join each point row to every interval row with
``start <= point_ts < end`` (optionally also equi-keyed on ``on``).

Physical shape — bucketize, don't theta-join: Spark plans a raw
``p.ts >= i.s AND p.ts < i.e`` join as BroadcastNestedLoopJoin (O(P·I)
comparisons, single-threaded per broadcast block — unusable at scale).
Instead each point maps to exactly ONE fixed-width time bucket and each
interval explodes to the buckets it covers; an equi-join on (key,
bucket) + a residual containment filter recovers the exact semantics.
Each qualifying (point, interval) pair meets in exactly one bucket (the
point's), so no post-dedup is needed. Cost: one hash shuffle keyed on
(key, bucket) — the skew/broadcast/AQE toolbox applies as with any
equi-join. Pick ``bucket_us`` near the typical interval length:
intervals then explode to ~2 rows each, and the bucket fan-out, not the
data volume, is the only tunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: str | None = None,
    bucket_us: int = 300_000_000,
) -> DataFrame:
    """Pairs of (point columns ⊕ interval columns) with
    ``start <= ts < end`` (end exclusive). Column names must be disjoint
    apart from the optional equi-key ``on``."""
    # integer div, not double /: a double quotient can round UP across a
    # bucket boundary and mis-bucket a point sitting just below it.
    # cast(... as timestamp): parquet TIMESTAMP_NTZ columns need the
    # reinterpretation before unix_micros; the bucket mapping only has
    # to be monotone and applied consistently to both sides (exact under
    # the engine's UTC session timezone), and the residual filter below
    # compares the ORIGINAL columns.
    p = points.withColumn(
        "__b", F.expr(f"unix_micros(cast({point_ts} as timestamp)) div {bucket_us}")
    )
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(cast({start_col} as timestamp)) div {bucket_us}"),
                # end is exclusive: the last covered microsecond is end-1
                F.expr(
                    f"(unix_micros(cast({end_col} as timestamp)) - 1) div {bucket_us}"
                ),
            )
        ),
    )
    keys = ["__b"] if on is None else [on, "__b"]
    return (
        p.join(i, keys)
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__b")
    )
