"""Reference-format CSR text interchange (SURVEY.md §1.3, S4/S5).

The reference's on-disk IR is whitespace-delimited text:
    line 1: ``Nodes Edges len(row_ptr) len(col_idx)``
    line 2: row_ptr        (space-separated)
    line 3: col_idx
(written by Med_dataset/without_part_preprocess.py:298-311, read by the
fscanf loops in src/WithoutPartition/ShareKernelTCV62_update_v1.cu:196-230).

These helpers exist for interchange/parity-testing with reference
tooling, NOT as a scale path: positional CSR of the whole graph is a
single-machine artifact by construction, so the writer funnels through
one task (documented; the parquet/Iceberg edge table is the real sink,
S4's Spark mapping). Vertices must already be contiguous 0..N-1.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def write_oriented_csr(oriented: DataFrame, path: str, n_vertices: int | None = None) -> None:
    """Oriented edge DataFrame → reference ``*_output.csr`` text file."""
    pdf = oriented.select("src", "dst").toPandas()
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    n = int(n_vertices if n_vertices is not None else (max(src.max(initial=-1), dst.max(initial=-1)) + 1))
    counts = np.bincount(src, minlength=n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)])
    with open(path, "w") as f:
        f.write(f"{n} {len(dst)} {len(row_ptr)} {len(dst)}\n")
        f.write(" ".join(map(str, row_ptr.tolist())) + "\n")
        f.write(" ".join(map(str, dst.tolist())) + "\n")


def read_oriented_csr(spark: SparkSession, path: str) -> DataFrame:
    """Reference CSR text file → oriented edge DataFrame[src, dst]."""
    with open(path) as f:
        header = f.readline().split()
        n, _e, len_rp, _len_ci = (int(x) for x in header)
        row_ptr = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
        col_idx = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
    assert len(row_ptr) == len_rp
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    pairs = [(int(s), int(d)) for s, d in zip(src, col_idx)]
    return spark.createDataFrame(pairs or [], "src long, dst long")
