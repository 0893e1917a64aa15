from __future__ import annotations

from tests.conftest import GOLDEN, edges_df
from trianglecount_spark.operators import canonicalize_edges, orient, triangle_count_join
from trianglecount_spark.sources.csr_text import read_oriented_csr, write_oriented_csr


def test_csr_text_roundtrip(spark, tmp_path):
    o = orient(canonicalize_edges(edges_df(spark, GOLDEN["k4"][0])))
    path = str(tmp_path / "k4_output.csr")
    write_oriented_csr(o, path)
    with open(path) as f:
        header = f.readline().split()
    # reference header: Nodes Edges len(row_ptr) len(col_idx)
    assert header == ["4", "6", "5", "6"]
    back = read_oriented_csr(spark, path)
    assert {(r.src, r.dst) for r in back.collect()} == {
        (r.src, r.dst) for r in o.collect()
    }
    assert triangle_count_join(back) == 4


def test_undirected_csr_deg_roundtrip(spark, tmp_path):
    from trianglecount_spark.operators.canonicalize import degrees
    from trianglecount_spark.sources.csr_text import (
        read_undirected_csr_deg,
        write_undirected_csr_deg,
    )

    sym = canonicalize_edges(edges_df(spark, GOLDEN["bowtie"][0]))
    path = str(tmp_path / "bowtie_undir.csr")
    write_undirected_csr_deg(sym, path)
    back_edges, back_deg = read_undirected_csr_deg(spark, path)
    assert {(r.src, r.dst) for r in back_edges.collect()} == {
        (r.src, r.dst) for r in sym.collect()
    }
    want_deg = {r.v: r.deg for r in degrees(sym).collect()}
    got_deg = {r.v: r.deg for r in back_deg.collect() if r.deg > 0}
    assert got_deg == want_deg


def test_partitioned_csr_roundtrip_and_count(spark, tmp_path):
    import pytest

    from trianglecount_spark.plans.partitioning import hash_parts
    from trianglecount_spark.sources.csr_text import (
        read_partitioned_csr,
        triangle_count_partitioned_text,
        write_partitioned_csr,
    )

    for name in ("k4", "bowtie", "hub", "two_tris"):
        raw, want = GOLDEN[name]
        o = orient(canonicalize_edges(edges_df(spark, raw)))
        verts = (
            o.selectExpr("src AS v")
            .union(o.selectExpr("dst AS v"))
            .distinct()
        )
        for k in (1, 2, 3):
            path = str(tmp_path / f"{name}_{k}.csr")
            write_partitioned_csr(o, hash_parts(verts, k), path, n_parts=k)
            parts = read_partitioned_csr(path)
            assert len(parts) == k
            # every triangle counted exactly once at its master anchor,
            # regardless of the partitioning (T3/T6)
            assert triangle_count_partitioned_text(path) == want, (name, k)
