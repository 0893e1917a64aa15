"""Vertex partition assignment (SURVEY.md §2.3, P1/P2/P3 + S8).

The reference writes a node-parts file (one partition id per vertex,
Halo_creation_preprocess.py:308-322) computed three ways: random,
contiguous blocks, METIS. Our engine's equivalents produce a
``(v, part)`` DataFrame — usually implicit via shuffle partitioning,
explicit when an algorithm wants anchor restriction (kernel TC) or
storage bucketing:

  P1 random  → deterministic hash (the reference itself benchmarks only
               the `random` strategy in its shipped scripts,
               run_subgraph_p2.sh)
  P2 contig  → floor(v / ceil(N/k)) block ranges
  P3 METIS   → no Spark analog (global min-edge-cut needs the whole
               graph in one memory space); hash partitioning is the
               supported strategy, pluggable here if an external
               partitioner materializes assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_parts(vertices: DataFrame, k: int, v_col: str = "v") -> DataFrame:
    """P1: part = pmod(xxhash64(v), k) — deterministic, skew-resistant."""
    return vertices.select(
        F.col(v_col).alias("v"), F.pmod(F.xxhash64(v_col), F.lit(k)).cast("int").alias("part")
    )


def contig_parts(vertices: DataFrame, k: int, n_vertices: int, v_col: str = "v") -> DataFrame:
    """P2: contiguous id blocks of size ceil(N/k)."""
    block = -(-n_vertices // k)
    return vertices.select(
        F.col(v_col).alias("v"),
        F.least(F.floor(F.col(v_col) / F.lit(block)).cast("int"), F.lit(k - 1)).alias("part"),
    )


def from_assignment(assign: DataFrame, v_col: str = "v", part_col: str = "part") -> DataFrame:
    """P3 hook: adapt an externally computed assignment (e.g. METIS run
    offline) to the engine's (v, part) shape."""
    return assign.select(F.col(v_col).alias("v"), F.col(part_col).cast("int").alias("part"))


def write_node_parts(assign: DataFrame, path: str) -> None:
    """S8 sink: (v, part) → parquet (the engine-native node-parts file)."""
    assign.write.mode("overwrite").parquet(path)
