"""Edge-list file scans (SURVEY.md §2.1, S1–S3).

The reference ingests four text formats
(Med_dataset/without_part_preprocess.py:126-177); each maps to a
declarative ``spark.read`` so Catalyst gets real scans (splittable,
column-pruned, parallel) instead of a driver-side pandas parse:

  S1  .tsv   GraphChallenge  ``Source\\tDest[\\tData]``
  S2  .txt   SNAP            same, ``#`` comment header lines
  S3  .mtx   MatrixMarket    ``%`` comments + a size line, 1-based ids
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def read_tsv_edges(spark: SparkSession, path: str) -> DataFrame:
    """S1: tab-separated ``Source Dest [Data]`` (weight column ignored,
    as the reference does — it reads then drops 'Data')."""
    df = spark.read.option("sep", "\t").schema("src long, dst long, data double").csv(path)
    return df.select("src", "dst")


def read_snap_edges(spark: SparkSession, path: str) -> DataFrame:
    """S2: SNAP .txt — whitespace-separated pairs, '#' comments (the
    reference hardcodes skiprows=4; the comment filter is the robust
    equivalent)."""
    lines = spark.read.text(path).where(~F.col("value").startswith("#"))
    parts = F.split(F.trim("value"), r"\s+")
    return lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())


def read_mtx_edges(spark: SparkSession, path: str) -> DataFrame:
    """S3: MatrixMarket coordinate format — '%' comments, then a
    ``rows cols nnz`` size line, then 1-based ``i j [val]`` entries.
    Ids are shifted to 0-based (scipy mmread/COO equivalence).

    The size line is dropped distributively: entries are 1-based so any
    line is a valid edge; the size line is identified as the first
    non-comment line per file via a window-free trick — it's the only
    line whose third field is missing-or-count — so we instead drop it
    positionally with a per-file row_number (cheap: one window over the
    tiny header partition set is avoided by zipWithIndex on line number
    via ``input_file_name`` + monotonic filter). For robustness and
    simplicity we drop exactly one line per file: the first non-comment.
    """
    lines = (
        spark.read.text(path)
        .where(~F.col("value").startswith("%"))
        .withColumn("fname", F.input_file_name())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fname").orderBy(F.monotonically_increasing_id())
    body = lines.withColumn("rn", F.row_number().over(w)).where(F.col("rn") > 1)
    parts = F.split(F.trim("value"), r"\s+")
    return body.select(
        (parts.getItem(0).cast("long") - 1).alias("src"),
        (parts.getItem(1).cast("long") - 1).alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
