"""HyperBall + weighted SSSP unit tests (operators/hyperball.py,
operators/metrics.py sssp_distances).

The HyperBall invariant under test is the one the DuckDB oracle also
relies on: register max-merge propagated t rounds along reversed edges
equals the md5-HLL registers of the EXACT t-hop reach set, so sketching
the exact ball (computed here by a Python BFS) must reproduce
``s_scaled`` bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trianglecount_spark.operators.hyperball import hyperball
from trianglecount_spark.operators.metrics import sssp_distances
from trianglecount_spark.operators.sketches import hll_estimate, hll_registers

INF = 1 << 40


def _directed(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _exact_balls(pairs, rounds):
    """v -> set of vertices reachable from v in <= rounds hops."""
    out = {}
    verts = set()
    for a, b in pairs:
        out.setdefault(a, set()).add(b)
        verts.update((a, b))
    balls = {v: {v} for v in verts}
    for _ in range(rounds):
        balls = {
            v: ball | {m for u in ball for m in out.get(u, ())}
            for v, ball in balls.items()
        }
    return balls


def test_hyperball_matches_exact_reach_sketch(spark):
    # directed: a cycle 0→1→2→0, a tail 2→3→4, and an isolated edge 5→6
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 6)]
    rounds = 3
    got = {
        r.v: (r.s_scaled, r.estimate)
        for r in hyperball(_directed(spark, pairs), rounds=rounds).collect()
    }
    balls = _exact_balls(pairs, rounds)
    members = [(v, str(m)) for v, ball in balls.items() for m in ball]
    exact = spark.createDataFrame(members, "v long, val string")
    regs = hll_registers(exact, "val", keys=["v"])
    want = {
        r.v: (r.s_scaled, r.estimate)
        for r in hll_estimate(regs, keys=["v"]).collect()
    }
    assert got == want
    # after 3 rounds the cycle+tail component is fully reached from 0
    assert set(got) == {0, 1, 2, 3, 4, 5, 6}


def test_hyperball_monotone_rounds(spark):
    # a ball can only grow: s_scaled can only shrink (more/larger registers)
    pairs = [(i, i + 1) for i in range(6)]
    e = _directed(spark, pairs)
    s1 = {r.v: r.s_scaled for r in hyperball(e, rounds=1).collect()}
    s3 = {r.v: r.s_scaled for r in hyperball(e, rounds=3).collect()}
    assert set(s1) == set(s3)
    assert all(s3[v] <= s1[v] for v in s1)


def test_sssp_goldens(spark):
    # 0→1 (w1), 1→2 (w1), 0→2 (w5): two-hop path beats the direct edge
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 5)], "src long, dst long, w long"
    )
    dist, _ = sssp_distances(e, 0, rounds=8)
    got = {r.v: r.d for r in dist.collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_sssp_fixed_rounds_no_early_stop(spark):
    # chain of 5 weighted edges: after 3 rounds vertex 5 is still INF,
    # after 5 it carries the full path weight — the fixed-round contract
    # the unrolled DuckDB oracle depends on
    e = spark.createDataFrame(
        [(i, i + 1, 2) for i in range(5)], "src long, dst long, w long"
    )
    d3, _ = sssp_distances(e, 0, rounds=3)
    got3 = {r.v: r.d for r in d3.collect()}
    assert got3[3] == 6 and got3[4] == INF and got3[5] == INF
    d5, _ = sssp_distances(e, 0, rounds=5)
    got5 = {r.v: r.d for r in d5.collect()}
    assert got5 == {0: 0, 1: 2, 2: 4, 3: 6, 4: 8, 5: 10}


def test_sssp_unreachable_stays_inf(spark):
    e = spark.createDataFrame(
        [(0, 1, 3), (2, 3, 1)], "src long, dst long, w long"
    )
    dist, _ = sssp_distances(e, 0, rounds=4)
    got = {r.v: r.d for r in dist.collect()}
    assert got[0] == 0 and got[1] == 3
    assert got[2] == INF and got[3] == INF
