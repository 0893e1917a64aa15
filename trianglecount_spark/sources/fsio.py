"""Hadoop-FileSystem-routed small-file I/O for job artifacts.

The resumable pipeline (plans/pipeline.py) and the mid-iteration state
resume (operators/iterative.py) exchange stage data through parquet —
already cluster-correct — but their CONTROL artifacts (``_SUCCESS``
existence probes, fingerprint markers, ``tc.json``/``metrics.json``
sidecars) must live on the SAME filesystem as the parquet outputs, or
a cluster run with an HDFS/S3 ``out_dir`` silently degrades: markers
are never found, resume recomputes every stage, and sidecars land on
the driver's local disk divorced from the data (the r3 advisor
finding). These helpers route every such access through the Hadoop
FileSystem API via the JVM gateway — the path's scheme (``file:``,
``hdfs:``, ``s3a:``, …) picks the filesystem exactly as it does for
``spark.read``/``write``, so the identical invocation works locally
and under ``spark-submit`` against object storage.

Driver-side only, control-plane only: each call is one NameNode/S3
round-trip on KB-sized artifacts — never on the data path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, p


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Atomic-enough single-writer small-file write (overwrite=True):
    the driver is the only writer of control artifacts, matching the
    single-committer discipline of the stage parquet writes."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs_path(spark, path)
    jvm = spark._jvm  # noqa: SLF001
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Recursive delete; False when the path does not exist. Used to
    clear stale iteration-state directories before re-stamping their
    fingerprint (plans/pipeline.py) — leftover ``round=N`` dirs under a
    fresh stamp would be silently resumed as the new graph's state."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory ([] when it does not exist)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]
