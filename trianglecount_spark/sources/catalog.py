"""Pages-table readers: parquet paths and Iceberg catalogs behind one API.

The production input (BASELINE.json input_hint) is an Iceberg table of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``; test and
bench environments use parquet files of the identical schema
(sources/pages.py generates them). Downstream operators take a
DataFrame and never know the difference — this module is the only place
the source format appears.

Iceberg is a runtime catalog extension, not a Python package: the
cluster must launch with the iceberg-spark-runtime jar on the
classpath plus catalog confs, e.g. with upstream OSS settings::

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions\\
.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.crawl.type=hadoop \\
      --conf spark.sql.catalog.crawl.warehouse=<warehouse-path>

This sandbox has no Iceberg jar, so ``read_pages`` detects catalog
availability at call time and raises a clear error instead of failing
deep inside the JVM. Every Iceberg benefit the engine relies on —
snapshot-consistent reads for resumable iterative jobs, partition
pruning on ``warc_ts``, MERGE for the streaming edge state
(streaming/incremental.py) — degrades to plain parquet semantics
transparently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def iceberg_available(spark: SparkSession, catalog: str = "crawl") -> bool:
    """True iff an Iceberg catalog with this name is configured AND the
    Iceberg classes are on the JVM classpath."""
    conf = spark.conf
    try:
        impl = conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_pages(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
    snapshot_id: int | None = None,
) -> DataFrame:
    """Load the pages table.

    fmt="parquet": ``source`` is a path (file/dir glob).
    fmt="iceberg": ``source`` is ``catalog.db.table``; optional
    ``snapshot_id`` pins a snapshot (time-travel) — the property that
    makes a multi-day iterative job re-entrant against a live crawl.
    """
    if fmt == "parquet":
        return spark.read.parquet(source).select(*PAGES_COLUMNS)
    if fmt == "iceberg":
        catalog = source.split(".", 1)[0]
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured on this "
                "session; launch with the iceberg-spark-runtime jar and "
                "spark.sql.catalog.* confs (see module docstring)."
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source).select(*PAGES_COLUMNS)
    raise ValueError(f"unknown pages format: {fmt!r}")


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """WET/WARC-export-style JSON-Lines pages reader: one JSON object
    per line with at least ``url`` and ``html`` (base64 bytes land as
    strings; ``warc_ts``/``text``/``lang`` optional — absent fields
    come back null). The schema is EXPLICIT — schema inference would
    scan the corpus twice and silently widen types between crawls, so
    at 100 TB it is always pinned. Lines that fail to parse are kept in
    ``_corrupt_record`` (PERMISSIVE mode) rather than killing the job —
    crawl exports always contain some garbage."""
    schema = (
        "url string, warc_ts timestamp, html string, text string, "
        "lang string, _corrupt_record string"
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
