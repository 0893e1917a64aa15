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


def _mtx_header_lines(spark: SparkSession, path: str) -> dict[str, str]:
    """file-URI → its size line ("rows cols nnz"), read driver-side via
    the Hadoop FS API: only the HEAD of each file is fetched (comments +
    one line), never the body — works on any FS Spark can reach and
    makes no assumption about how the body later splits into tasks."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(path)
    fs = root.getFileSystem(hconf)
    stack = [s for s in fs.globStatus(root) or []]
    files = []
    while stack:
        st = stack.pop()
        if st.isDirectory():
            it = fs.listStatus(st.getPath())
            stack.extend(it)
        else:
            files.append(st.getPath())
    headers: dict[str, str] = {}
    for p in files:
        stream = fs.open(p)
        reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
        try:
            line = reader.readLine()
            while line is not None and line.startswith("%"):
                line = reader.readLine()
            if line is not None:
                headers[p.toUri().toString()] = line.strip()
        finally:
            reader.close()
    return headers


def read_mtx_edges(spark: SparkSession, path: str) -> DataFrame:
    """S3: MatrixMarket coordinate format — '%' comments, then a
    ``rows cols nnz`` size line, then 1-based ``i j [val]`` entries.
    Ids are shifted to 0-based (scipy mmread/COO equivalence).

    The size line is removed by VALUE, not position: its text is read
    driver-side from each file's head (``_mtx_header_lines``) and exactly
    one occurrence per file is dropped with an occurrence-counted
    explode. No dependence on Spark's split/partition ordering — the
    previous formulation ordered a window by ``monotonically_increasing_
    id``, which is not offset-ordered once a large file splits.
    """
    headers = _mtx_header_lines(spark, path)
    hdr_df = F.broadcast(
        spark.createDataFrame(
            [(k, v) for k, v in headers.items()], "fname string, hdr string"
        )
    )
    lines = (
        spark.read.text(path)
        .where(~F.col("value").startswith("%"))
        .withColumn("fname", F.input_file_name())
        .join(hdr_df, "fname", "left")
        .withColumn(
            "is_hdr", F.coalesce(F.trim("value") == F.col("hdr"), F.lit(False))
        )
    )
    body = lines.where(~F.col("is_hdr"))
    # an entry line can textually equal the size line ("R C NNZ" as an
    # edge) — keep (m - 1) of the m matching copies per file
    dup_hdrs = (
        lines.where(F.col("is_hdr"))
        .groupBy("fname", "value")
        .agg(F.count("*").alias("m"))
        .where(F.col("m") > 1)
        .select(F.explode(F.sequence(F.lit(2), F.col("m"))).alias("_i"), "value", "fname")
        .drop("_i")
    )
    parts = F.split(F.trim("value"), r"\s+")
    return (
        body.select("value")
        .unionByName(dup_hdrs.select("value"))
        .select(
            (parts.getItem(0).cast("long") - 1).alias("src"),
            (parts.getItem(1).cast("long") - 1).alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
