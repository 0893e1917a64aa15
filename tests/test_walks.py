"""Deterministic walks / neighbor sampling / repetition signals
(operators/walks.py, functions/textqual.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trianglecount_spark.functions.textqual import repetition_signals
from trianglecount_spark.operators.canonicalize import canonicalize_edges
from trianglecount_spark.operators.walks import deterministic_walks, neighbor_sample


def _sym(spark, pairs):
    return canonicalize_edges(spark.createDataFrame(pairs, "src long, dst long"))


def test_walks_are_paths_and_deterministic(spark):
    # K4 plus a tail: every hop of every emitted walk must be a real edge,
    # and re-running must give the identical corpus
    sym = _sym(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 4)])
    seeds = spark.createDataFrame([(0,), (2,)], "walk long")
    w1 = deterministic_walks(sym, seeds, length=3).collect()
    w2 = deterministic_walks(sym, seeds, length=3).collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
    # 2 walks x 4 steps (0..3), no dead ends in a connected sym graph
    assert len(w1) == 8
    edges = {(r.src, r.dst) for r in sym.collect()}
    by_walk = {}
    for r in w1:
        by_walk.setdefault(r.walk, {})[r.step] = r.v
    for walk, steps in by_walk.items():
        assert steps[0] == walk
        for t in range(1, 4):
            assert (steps[t - 1], steps[t]) in edges


def test_walk_ends_at_sink(spark):
    # directed edge table with a sink: walk stops, emitting fewer rows
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "walk long")
    rows = deterministic_walks(e, seeds, length=5).collect()
    got = {r.step: r.v for r in rows}
    assert got == {0: 0, 1: 1, 2: 2}  # vertex 2 has no out-edge


def test_neighbor_sample_fanout_bounds(spark):
    # star: hub 0 with 10 leaves; fanout (3, 2)
    sym = _sym(spark, [(0, i) for i in range(1, 11)])
    seeds = spark.createDataFrame([(0,)], "seed long")
    rows = neighbor_sample(sym, seeds, fanout1=3, fanout2=2).collect()
    h1s = {r.h1 for r in rows}
    assert len(h1s) == 3
    # each sampled leaf has exactly one neighbor (the hub)
    assert all(r.h2 == 0 for r in rows)
    # determinism
    again = neighbor_sample(sym, seeds, fanout1=3, fanout2=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_neighbor_sample_keeps_deadend_frontier(spark):
    # directed: 0->1, 1 has no out-edges -> h2 NULL row survives
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "seed long")
    rows = neighbor_sample(e, seeds, fanout1=2, fanout2=2).collect()
    assert [(r.seed, r.h1, r.h2) for r in rows] == [(0, 1, None)]


def test_repetition_signals_golden(spark):
    # "a b a b a b": bigrams {a b:3, b a:2} -> top 3/5;
    # trigrams {a b a:2, b a b:2} -> all 4 duplicated -> 1.0
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z w"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    r1 = got[1]
    assert (r1.n_bigrams, r1.top_bigram_frac) == (5, 0.6)
    assert (r1.n_trigrams, r1.dup_trigram_frac) == (4, 1.0)
    r2 = got[2]  # all grams unique
    assert (r2.n_bigrams, r2.top_bigram_frac) == (3, round(1 / 3, 6))
    assert (r2.n_trigrams, r2.dup_trigram_frac) == (2, 0.0)
    r3 = got[3]  # shorter than any gram: zero counts, zero fractions
    assert (r3.n_bigrams, r3.top_bigram_frac, r3.n_trigrams, r3.dup_trigram_frac) == (
        0,
        0.0,
        0,
        0.0,
    )


def test_redirect_chain_resolution(spark):
    from trianglecount_spark.operators.redirects import resolve_redirects

    # chain a->b->c->d (d not a redirect), plus a 2-cycle x<->y
    rmap = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    out = {r.src: (r.final, r.hops) for r in resolve_redirects(rmap, doublings=4).collect()}
    assert out["a"] == ("d", 3)
    assert out["b"] == ("d", 2)
    assert out["c"] == ("d", 1)
    # cycles report the deterministic 2^k-hop pointer: 16 hops lands home
    assert out["x"] == ("x", 16) and out["y"] == ("y", 16)


def test_redirect_long_chain_within_budget(spark):
    from trianglecount_spark.operators.redirects import resolve_redirects

    # 12-hop chain resolves fully with 4 doublings (2^4 = 16 >= 12)
    rmap = spark.createDataFrame(
        [(f"u{i}", f"u{i+1}") for i in range(12)], "src string, dst string"
    )
    out = {r.src: (r.final, r.hops) for r in resolve_redirects(rmap, doublings=4).collect()}
    assert out["u0"] == ("u12", 12)
    assert all(out[f"u{i}"] == ("u12", 12 - i) for i in range(12))
