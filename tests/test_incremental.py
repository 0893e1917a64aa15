"""Incremental streaming triangle maintenance == batch count."""

from pyspark.sql import functions as F

from trianglecount_spark.operators.canonicalize import canonicalize_edges, orient
from trianglecount_spark.operators.triangles import triangles_join
from trianglecount_spark.streaming.incremental import incremental_triangle_count


def _batch_triangles(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangles_join(orient(canonicalize_edges(df))).count()


def test_incremental_equals_batch_k4_with_dupes(spark):
    # K4 with duplicate and reversed rows spread over batches
    edges = [(a, b) for a in range(4) for b in range(4) if a != b] + [(0, 1), (1, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = incremental_triangle_count(spark, df, n_files=3).collect()[0]
    assert row.n_triangles == 4 == _batch_triangles(spark, edges)
    assert row.n_edges == 6
    assert row.n_batches >= 2  # genuinely incremental, not one batch


def test_incremental_equals_batch_random(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    edges = [
        (int(a), int(b)) for a, b in rng.integers(0, 40, size=(300, 2)) if a != b
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = incremental_triangle_count(spark, df, n_files=5).collect()[0]
    want = _batch_triangles(spark, edges)
    assert row.n_triangles == want, (row, want)
    sym = canonicalize_edges(spark.createDataFrame(edges, "src long, dst long"))
    assert row.n_edges == sym.count() // 2
