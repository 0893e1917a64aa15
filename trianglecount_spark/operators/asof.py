"""As-of (most-recent-at-or-before) join — a custom operator Spark's
built-in join types lack.

Semantics: for each left row, attach the value columns of the LAST right
row with the same key and ``right_ts <= left_ts`` (strictly ``<`` with
``strict=True``); nulls when no such row exists. The classic uses are
point-in-time lookups (price as of trade time) and last-touch
attribution (purchase → most recent prior click).

Physical shape — the union + ordered-window form, NOT a range join:
tag both inputs, union them, and run one window per key ordered by
(ts, side, tiebreak) carrying ``last(value, ignorenulls=true)`` over
rows UNBOUNDED PRECEDING..CURRENT. Cost is one shuffle on the key plus
one in-partition sort — linear in |L|+|R|, no per-key explode and none
of the quadratic blowup of the naive ``theta`` join (L ⋈ R on key AND
ts≥ts, then argmax), which Spark would execute as a broadcast
nested-loop at scale. Skewed keys split fine: the window is the same
hash partitioning every other per-key op in this engine uses.

Determinism: several right rows can share (key, ts); ``right_order``
columns extend the sort so ``last`` is well-defined (the max of
``right_order`` wins, matching an argmax-by-(ts, right_order) oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_order: list[str] | None = None,
    strict: bool = False,
    out_prefix: str = "asof_",
) -> DataFrame:
    """All ``left`` columns plus ``<out_prefix><c>`` for each value
    column of the most recent matching ``right`` row (null-filled when
    the key has no right row at or before the left timestamp)."""
    right_order = right_order if right_order is not None else list(value_cols)
    # left rows sort AFTER right rows at equal ts (side 1 > 0) so equal
    # timestamps match; strict mode flips the left side below the right
    # side so they don't.
    left_side, right_side = (0, 1) if strict else (1, 0)

    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(right_side).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in set(value_cols) | set(right_order)],
    )
    l = left.select(
        "*",
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(left_side).alias("__side"),
    )
    u = r.unionByName(l, allowMissingColumns=True)
    # (ts, side) separates left from right rows at equal ts (inclusive:
    # right first; strict: left first); right_order disambiguates ties
    # AMONG right rows — left rows are null there, side already placed
    # them.
    order = [F.col("__t").asc(), F.col("__side").asc()] + [
        F.col(f"__r_{c}").asc_nulls_first() for c in right_order
    ]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{out_prefix}{c}")
        for c in value_cols
    ]
    return u.select("*", *matched).where(F.col("__side") == left_side).select(
        *left.columns, *[f"{out_prefix}{c}" for c in value_cols]
    )
