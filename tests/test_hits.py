"""HITS operator: goldens + NumPy matrix-iteration cross-check."""

import numpy as np
import pytest

from trianglecount_spark.operators.hits import hits


def _g(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_hits_star(spark):
    # all spokes point at the center: center is the sole authority,
    # spokes are equal hubs
    rows = {
        r.v: (int(r.hub), int(r.auth))
        for r in hits(_g(spark, [(1, 0), (2, 0), (3, 0)]), rounds=3).collect()
    }
    assert rows[0][0] == 0 and rows[0][1] > 0  # center: pure authority
    assert rows[1] == rows[2] == rows[3]  # spokes identical
    assert rows[1][1] == 0 and rows[1][0] > 0  # spokes: pure hubs


def test_hits_matches_numpy_integer_iteration(spark):
    rng = np.random.default_rng(7)
    n = 20
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, n, size=(80, 2)) if a != b}
    edges = sorted(pairs)
    a_mat = np.zeros((n, n), dtype=object)  # object => exact bigints
    for s, d in edges:
        a_mat[s, d] = 1
    hub = np.ones(n, dtype=object)
    for _ in range(6):
        auth = a_mat.T @ hub
        hub = a_mat @ auth
    got = {
        r.v: (int(r.hub), int(r.auth))
        for r in hits(_g(spark, edges), rounds=6).collect()
    }
    # vertices with no incident edge don't appear in the edge table;
    # every vertex that does must match the matrix iteration exactly
    assert got == {
        v: (int(hub[v]), int(auth[v])) for v in got
    }
    assert len(got) == len({x for e in edges for x in e})


def test_hits_rounds_zero_is_initial_state(spark):
    # sparse state: hub_0 = 1 only where out-degree > 0 (identical to
    # every rounds>=1 output, where out-degree-0 vertices score 0)
    rows = {r.v: (int(r.hub), int(r.auth)) for r in hits(_g(spark, [(0, 1)]), rounds=0).collect()}
    assert rows == {0: (1, 0), 1: (0, 0)}


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
