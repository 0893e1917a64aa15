from __future__ import annotations

from pyspark.sql import functions as F

from trianglecount_spark.operators.canonicalize import canonicalize_edges
from trianglecount_spark.operators.metrics import clustering_coefficient, k_core


def _sym(spark, pairs):
    return canonicalize_edges(
        spark.createDataFrame(pairs, "src long, dst long")
    )


def test_clustering_coefficient_golden(spark):
    # triangle 0-1-2 with pendant 3 hanging off 2
    sym = _sym(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    got = {r.v: (r.deg, r.tri, r.lcc) for r in clustering_coefficient(sym).collect()}
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, 2 * 1 / (3 * 2))
    assert got[3] == (1, 0, 0.0)


def test_clustering_coefficient_clique(spark):
    # K4: every vertex has deg 3, tri 3, lcc 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = clustering_coefficient(_sym(spark, k4)).collect()
    assert all((r.deg, r.tri, r.lcc) == (3, 3, 1.0) for r in got)


def test_k_core_peeling_cascade(spark):
    # K4 core with a path 3-4-5-6 hanging off: k=2 peeling removes the
    # path one vertex per round (a genuine cascade), keeps the clique
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    sym = _sym(spark, k4 + [(3, 4), (4, 5), (5, 6)])
    core, log = k_core(sym, k=2, max_rounds=8)
    got = {r.v: r.deg_core for r in core.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above the degeneracy: empty core
    core3, _ = k_core(sym, k=4, max_rounds=8)
    assert core3.count() == 0


def test_k_core_fixed_rounds_match_fixpoint(spark):
    # early stop (max_rounds ample) equals exact NumPy-style peeling
    import itertools

    edges = [(a, b) for a, b in itertools.combinations(range(6), 2) if (a + b) % 3]
    sym = _sym(spark, edges)
    core, _ = k_core(sym, k=3, max_rounds=8)
    got = {(r.v, r.deg_core) for r in core.collect()}

    cur = {(s, d) for s, d in edges} | {(d, s) for s, d in edges}
    while True:
        import collections

        deg = collections.Counter(s for s, _ in cur)
        keep = {v for v, c in deg.items() if c >= 3}
        nxt = {(s, d) for s, d in cur if s in keep and d in keep}
        if nxt == cur:
            break
        cur = nxt
    import collections

    want = set(collections.Counter(s for s, _ in cur).items())
    assert got == want
