from __future__ import annotations

import pytest

from tests.conftest import GOLDEN, edges_df
from trianglecount_spark.operators import (
    canonicalize_edges,
    orient,
    triangle_count_join,
    triangle_count_kernel,
    triangles_per_vertex_join,
)
from trianglecount_spark.operators.triangles import (
    triangle_count_arrays,
    triangles_per_vertex_arrays,
    triangles_per_vertex_kernel,
)


def _oriented(spark, name):
    raw, _ = GOLDEN[name]
    return orient(canonicalize_edges(edges_df(spark, raw)))


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_join_form_totals(spark, name):
    _, want = GOLDEN[name]
    assert triangle_count_join(_oriented(spark, name)) == want


@pytest.mark.parametrize("name", ["tri", "k4", "bowtie", "hub", "two_tris", "diamond"])
def test_kernel_form_matches_join_form(spark, name):
    o = _oriented(spark, name)
    _, want = GOLDEN[name]
    assert triangle_count_kernel(o) == want


@pytest.mark.parametrize("k", [1, 2, 4, 8])
def test_kernel_partition_invariance(spark, k):
    # mirrors the reference's partition-count sweep (k ∈ {2,4,8},
    # Halo_creation_preprocess.py:288-396): totals and per-vertex counts
    # must not depend on the partitioning.
    o = _oriented(spark, "k5")
    assert triangle_count_kernel(o, n_parts=k) == 10
    pv = {r.v: r.tri for r in triangles_per_vertex_kernel(o, n_parts=k).collect()}
    ref = {r.v: r.tri for r in triangles_per_vertex_join(o).collect()}
    assert pv == ref


def test_kernel_salting_path(spark):
    # force the hub (deg+ = large) through the salted path
    o = _oriented(spark, "hub")
    total = triangle_count_kernel(o, n_parts=4, salt_threshold=5, n_salts=4)
    assert total == 99
    pv_salted = {
        r.v: r.tri
        for r in triangles_per_vertex_kernel(o, n_parts=4, salt_threshold=5, n_salts=4).collect()
    }
    pv_plain = {r.v: r.tri for r in triangles_per_vertex_join(o).collect()}
    assert pv_salted == pv_plain


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_arrays_form_totals(spark, name):
    _, want = GOLDEN[name]
    assert triangle_count_arrays(_oriented(spark, name)) == want


def test_arrays_per_vertex_matches_join(spark):
    for name in ("k4", "bowtie", "hub", "diamond"):
        o = _oriented(spark, name)
        a = {r.v: r.tri for r in triangles_per_vertex_arrays(o).collect()}
        b = {r.v: r.tri for r in triangles_per_vertex_join(o).collect()}
        assert a == b, name


def test_per_vertex_anchor_attribution_tri(spark):
    # FIXTURES §3: all deg 2 ⇒ ties; anchor = vertex 2 (max id = minimum
    # under (deg asc, id desc)); per-vertex (0,0,1)
    o = _oriented(spark, "tri")
    pv = {r.v: r.tri for r in triangles_per_vertex_join(o).collect()}
    assert pv == {2: 1}


def test_per_vertex_sums_to_total(spark):
    for name in ("k4", "bowtie", "hub", "diamond"):
        o = _oriented(spark, name)
        pv = triangles_per_vertex_join(o)
        total = sum(r.tri for r in pv.collect())
        assert total == GOLDEN[name][1], name


def test_kernel_huge_ids_relabel_path(spark):
    # ids beyond 2^31 force the kernel's dense local relabel (the r1
    # packed-key form asserted out at 31 bits — a 10^12-vertex web graph
    # exceeds it); totals must be unchanged
    base = 1 << 40
    raw, want = GOLDEN["k4"]
    shifted = [(base + a, base + b) for a, b in raw]
    o = orient(canonicalize_edges(edges_df(spark, shifted)))
    assert triangle_count_kernel(o, n_parts=2) == want
    pv = {r.v - base: r.tri for r in triangles_per_vertex_kernel(o, n_parts=2).collect()}
    ref = {r.v - base: r.tri for r in triangles_per_vertex_join(o).collect()}
    assert pv == ref


def test_kernel_huge_ids_salted(spark):
    base = 3 << 40
    raw, want = GOLDEN["hub"]
    shifted = [(base + a, base + b) for a, b in raw]
    o = orient(canonicalize_edges(edges_df(spark, shifted)))
    assert (
        triangle_count_kernel(o, n_parts=4, salt_threshold=5, n_salts=4) == want
    )


def test_weighted_triangle_total_goldens(spark):
    from trianglecount_spark.operators.triangles import weighted_triangle_total

    # triangle with edge multiplicities 3, 2, 1 -> min = 1
    raw = spark.createDataFrame(
        [(0, 1)] * 3 + [(1, 2)] * 2 + [(0, 2)], "src long, dst long"
    )
    r = weighted_triangle_total(raw).first()
    assert (r.n_triangles, r.weight_total) == (1, 1)

    # two triangles sharing edge (0,1)x2: 0-1-2 (min 1), 0-1-3 (min 2)
    raw2 = spark.createDataFrame(
        [(0, 1)] * 2 + [(1, 2), (0, 2)] + [(1, 3)] * 2 + [(0, 3)] * 3,
        "src long, dst long",
    )
    r2 = weighted_triangle_total(raw2).first()
    assert (r2.n_triangles, r2.weight_total) == (2, 3)

    # direction-agnostic multiplicity: (0,1) and (1,0) are the same edge
    raw3 = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (0, 2)], "src long, dst long"
    )
    r3 = weighted_triangle_total(raw3).first()
    assert (r3.n_triangles, r3.weight_total) == (1, 1)
