"""Bucketed parquet storage for co-located joins ([EXT], 100 TB path).

In-session, iterative operators co-locate their big side with
``repartition(key).cache()`` (see operators/pagerank.py). Across jobs —
the regime where a 100 TB edge table is written once and joined by
thousands of later runs — the same property has to live in STORAGE:
``bucketBy(k, key)`` writes each parquet file pre-hash-partitioned on
the join key, and every subsequent equi-join on that key reads the
bucketed side with NO Exchange (Catalyst matches the table's
``HashPartitioning`` against the join requirement; only the small side
shuffles).

The reference's analog is its partitioned-CSR file set — one file per
partition, re-read by every kernel launch (`Halo_creation_preprocess.py:
259-278`); bucketing is the Spark-native equivalent that additionally
survives schema evolution and predicate pushdown.

``tests/test_bucketed.py`` asserts the plan property (bucketed scan side
has no Exchange) and result parity with the unbucketed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "src",
    buckets: int = 64,
) -> None:
    """Write ``df`` as a bucketed external parquet table: hash-bucketed
    and sorted on ``key``. ``path`` keeps the data outside the catalog
    warehouse; ``buckets`` should be sized so one bucket of the 100 TB
    table fits an executor's scan budget (here 64 to match the test
    session's shuffle partitioning)."""
    (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucketed layout only applies through the table
    identifier (a raw ``spark.read.parquet(path)`` forgets bucketing)."""
    return spark.table(table)
