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
