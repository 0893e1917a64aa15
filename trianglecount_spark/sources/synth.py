"""Deterministic synthetic power-law graph source (scaling/bench input).

The scaling-efficiency evidence (north_rule) needs an input large enough
that distributed compute — not job-fixed overhead — dominates the wall
clock at both parallelism levels. The driver testdata tops out at sf0.1
(~600k lineitem rows → ~9k-vertex co-purchase graph), which saturates in
seconds at local[32]; Amdahl overhead then masks the compute scaling.

This generator mirrors the reference's benchmark corpora shape
(web/social power-law: webbase-2001, twitter7 — SURVEY.md §6): heavy-
tailed degrees with a small hub core, which also exercises the kernel's
hub-salting path.

Determinism contract (same as sources/pages.py): every edge derives
purely from its edge index via a counter-based bijective mixer
(splitmix64 finalizer — a published public-domain construction), so ANY
partitioning of the index range yields identical rows — the property
that lets the same generator run at any scale on any cluster layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: uint64 → well-mixed uint64, vectorized."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _uniform(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """U(0,1) per index, keyed only by (seed, stream, idx)."""
    key = _mix64(
        idx.astype(np.uint64)
        ^ _mix64(np.uint64([seed]).repeat(len(idx)) + np.uint64(stream * 0x9E3779B97F4A7C15))
    )
    return (key >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def powerlaw_edges(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int,
    skew: float = 2.0,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """``n_edges`` raw directed edges over ``0..n_vertices-1``.

    Endpoint law: v = floor(N * u^skew) — heavy mass near 0 (hubs).
    skew=2.0 gives a web-like tail; self-loops/duplicates are left in
    (canonicalization is a downstream operator, as in the reference).
    Fully vectorized: two index-keyed uniforms per edge, no Python loop.
    """
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_edges, 1, n_partitions)

    def gen(it):
        for pdf in it:
            idx = pdf["id"].to_numpy()
            u0 = _uniform(idx, 0, seed)
            u1 = _uniform(idx, 1, seed)
            yield pd.DataFrame(
                {
                    "src": (n_vertices * u0**skew).astype(np.int64),
                    "dst": (n_vertices * u1**skew).astype(np.int64),
                }
            )

    return ids.mapInPandas(gen, schema="src long, dst long")
