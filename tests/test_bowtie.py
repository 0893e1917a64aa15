"""Bow-tie decomposition: goldens + NumPy closure cross-check."""

import numpy as np

from trianglecount_spark.operators.bowtie import bowtie, reach_closure


def _g(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_reach_closure_chain(spark):
    g = _g(spark, [(0, 1), (1, 2), (2, 3), (5, 6)])
    seeds = spark.createDataFrame([(1,)], "v long")
    got = sorted(r.v for r in reach_closure(g, seeds).collect())
    assert got == [1, 2, 3]


def test_bowtie_textbook(spark):
    # core cycle 0<->1; 2 -> core (IN); core -> 3 (OUT);
    # 2 -> 4 going nowhere (TENDRIL via weak comp); 5 -> 6 DISCONNECTED
    edges = [(0, 1), (1, 0), (2, 0), (1, 3), (2, 4), (5, 6)]
    got = {r.v: r.cls for r in bowtie(_g(spark, edges)).collect()}
    assert got == {
        0: "core",
        1: "core",
        2: "in",
        3: "out",
        4: "tendril",
        5: "disconnected",
        6: "disconnected",
    }


def test_bowtie_tube_classified_tendril(spark):
    # IN -> tube vertex -> OUT avoiding the core: folded into 'tendril'
    edges = [(0, 1), (1, 0), (2, 0), (1, 3), (2, 9), (9, 3)]
    got = {r.v: r.cls for r in bowtie(_g(spark, edges)).collect()}
    assert got[9] == "tendril"
    assert got[2] == "in" and got[3] == "out"


def _bowtie_numpy(n, edges):
    a = np.eye(n, dtype=bool)
    for s, d in edges:
        if s != d:
            a[s, d] = True
    r = a
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
        r = r | (r @ r)
    mutual = r & r.T
    scc = np.array([int(np.flatnonzero(mutual[v]).min()) for v in range(n)])
    sizes = {lbl: int((scc == lbl).sum()) for lbl in set(scc)}
    core_lbl = min(sorted(sizes), key=lambda x: (-sizes[x], x))
    core = scc == core_lbl
    fwd = r[core].any(axis=0)
    bwd = r[:, core].any(axis=1)
    u = r | r.T
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
        u = u | (u @ u)
    weak = u[core].any(axis=0)
    out = {}
    for v in range(n):
        if core[v]:
            out[v] = "core"
        elif bwd[v]:
            out[v] = "in"
        elif fwd[v]:
            out[v] = "out"
        elif weak[v]:
            out[v] = "tendril"
        else:
            out[v] = "disconnected"
    return out


def test_bowtie_matches_numpy_closure(spark):
    rng = np.random.default_rng(7)
    n = 20
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2)) if a != b})
    used = sorted({v for e in edges for v in e})
    want = _bowtie_numpy(n, edges)
    got = {r.v: r.cls for r in bowtie(_g(spark, edges)).collect()}
    assert got == {v: want[v] for v in used}
