"""SCC operator: goldens + NumPy reachability-closure cross-check."""

import numpy as np
import pytest

from trianglecount_spark.operators.scc import strongly_connected_components


def _g(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _scc_numpy(n, edges):
    a = np.eye(n, dtype=bool)
    for s, d in edges:
        a[s, d] = True
    # boolean transitive closure by repeated squaring
    r = a
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
        r = r | (r @ r)
    mutual = r & r.T
    return {v: int(np.flatnonzero(mutual[v]).min()) for v in range(n)}


def test_scc_two_cycles_and_bridge(spark):
    # 0->1->2->0 (SCC 0), bridge 2->3, 3->4->3 (SCC 3)
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    got = {r.v: r.scc for r in strongly_connected_components(_g(spark, edges)).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_scc_dag_chain_all_singletons(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    got = {r.v: r.scc for r in strongly_connected_components(_g(spark, edges)).collect()}
    assert got == {v: v for v in range(4)}


def test_scc_matches_numpy_closure(spark):
    rng = np.random.default_rng(11)
    n = 18
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, size=(45, 2)) if a != b})
    want = _scc_numpy(n, pairs)
    got = {r.v: r.scc for r in strongly_connected_components(_g(spark, pairs)).collect()}
    # operator excludes vertices with no (non-loop) incident edge
    seen = {x for e in pairs for x in e}
    assert got == {v: want[v] for v in seen}


def test_scc_distributed_path_matches_local(spark):
    # local_edges=0 forces trim + pivot FW-BW (+ coloring fallback) —
    # the 100 TB path — which must agree with the Tarjan-local default
    rng = np.random.default_rng(7)
    n = 24
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, size=(60, 2)) if a != b})
    want = _scc_numpy(n, pairs)
    got = {
        r.v: r.scc
        for r in strongly_connected_components(
            _g(spark, pairs), local_edges=0
        ).collect()
    }
    seen = {x for e in pairs for x in e}
    assert got == {v: want[v] for v in seen}


def test_scc_coloring_fallback_exact(spark):
    # max_outer=0 skips every pivot pull: the remainder lands entirely
    # on the coloring fallback, including two interlocking cycles whose
    # min labels must not split them
    edges = [(0, 1), (1, 2), (2, 0), (1, 3), (3, 4), (4, 3), (4, 5)]
    got = {
        r.v: r.scc
        for r in strongly_connected_components(
            _g(spark, edges), max_outer=0, local_edges=0
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
