"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All query logic lives in ``trianglecount_spark.plans.queries`` (one Spark
DataFrame program + one ANSI-SQL oracle per operator from SURVEY.md §2 and
the training-data pipeline set); this module is the thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trianglecount_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-vertex triangle counts
    (anchor attribution) on the part co-purchase graph — the reference's
    core computation (per-vertex g_sum + global total, SURVEY.md §2.4)."""
    return Q.q_triangles_per_vertex(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline ops)."""
    return Q.registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — EVERY registered
    query has one (iterative ops via recursive/unrolled CTEs; ANN via
    portable integer LSH/IVF arithmetic that reproduces bit-for-bit in
    SQL; the NumPy convergence oracles in tests/ cover the tol>0 modes
    the SQL unrolling can't express)."""
    return Q.oracle()
