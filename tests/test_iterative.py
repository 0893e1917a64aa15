from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import GOLDEN, edges_df
from trianglecount_spark.operators.canonicalize import canonicalize_edges
from trianglecount_spark.operators.components import (
    connected_components,
    connected_components_minlabel,
)
from trianglecount_spark.operators.lpa import label_propagation
from trianglecount_spark.operators.pagerank import pagerank


def numpy_pagerank(pairs, alpha=0.85, tol=1e-12, max_iter=500):
    """Dense power-iteration oracle on the canonical undirected graph."""
    und = {(a, b) for a, b in pairs if a != b}
    und |= {(b, a) for a, b in und}
    verts = sorted({v for e in und for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in und:
        A[idx[b], idx[a]] = 1.0
    outdeg = A.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        with np.errstate(divide="ignore", invalid="ignore"):
            contrib = np.where(outdeg > 0, r / outdeg, 0.0)
        dangling = r[outdeg == 0].sum()
        new_r = (1 - alpha) / n + alpha * (A @ contrib + dangling / n)
        if np.abs(new_r - r).sum() < tol:
            r = new_r
            break
        r = new_r
    return {v: r[idx[v]] for v in verts}


def numpy_components(pairs):
    und = {(a, b) for a, b in pairs if a != b}
    verts = sorted({v for e in und for v in e})
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in verts}


def numpy_lpa(pairs, max_iter=20):
    und = {(a, b) for a, b in pairs if a != b}
    und |= {(b, a) for a, b in und}
    verts = sorted({v for e in und for v in e})
    nbrs = {v: sorted({b for a, b in und if a == v}) for v in verts}
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


@pytest.mark.parametrize("name", ["bowtie", "hub", "path6"])
def test_pagerank_allclose_numpy(spark, name):
    raw, _ = GOLDEN[name]
    sym = canonicalize_edges(edges_df(spark, raw))
    ranks, log = pagerank(sym, tol=1e-9, max_iter=48, check_every=8)
    got = {r.v: r.rank for r in ranks.collect()}
    want = numpy_pagerank(raw)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (name, v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def numpy_pagerank_directed(pairs, alpha=0.85, n_iter=40):
    """Dense power iteration on the DIRECTED graph as given (sinks kept)."""
    dir_edges = {(a, b) for a, b in pairs if a != b}
    verts = sorted({v for e in dir_edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in dir_edges:
        A[idx[b], idx[a]] = 1.0
    outdeg = A.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        with np.errstate(divide="ignore", invalid="ignore"):
            contrib = np.where(outdeg > 0, r / outdeg, 0.0)
        dangling = r[outdeg == 0].sum()
        r = (1 - alpha) / n + alpha * (A @ contrib + dangling / n)
    return {v: r[idx[v]] for v in verts}


def test_pagerank_directed_sinks_allclose(spark):
    # 2 is a pure sink, 5 dangles off a chain — exercises the general
    # path's missing-mass closure on a graph where undelivered > 1-alpha
    raw = [(0, 1), (1, 2), (3, 2), (3, 4), (4, 0), (0, 5)]
    ranks, _ = pagerank(edges_df(spark, raw), tol=0.0, max_iter=40, check_every=40)
    got = {r.v: r.rank for r in ranks.collect()}
    want = numpy_pagerank_directed(raw)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_general_path_no_per_round_collect(spark, monkeypatch):
    # the missing-mass closure must stay PLAN-side: the only driver
    # collect() in a pagerank run is the convergence delta at each check
    # round — a per-round scalar collect serializes every round on a
    # driver round-trip at 1000 executors. Patch the CLASSIC DataFrame
    # (pyspark 4 splits classic/connect; the base class's collect is
    # overridden and never runs).
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"n": 0}
    orig = DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting)
    raw = [(0, 1), (1, 2), (3, 2), (3, 4), (4, 0)]
    pagerank(edges_df(spark, raw), tol=0.0, max_iter=6, check_every=6)
    assert calls["n"] == 1, f"expected only the delta_fn collect, saw {calls['n']}"


def test_pagerank_dangling_free_matches_default(spark):
    # symmetric graph ⇒ no dangling vertices ⇒ the one-job-per-round
    # fast path must agree with the missing-mass-closure path to FP noise
    raw, _ = GOLDEN["bowtie"]
    sym = canonicalize_edges(edges_df(spark, raw))
    a, _ = pagerank(sym, tol=0.0, max_iter=10, check_every=10)
    b, _ = pagerank(sym, tol=0.0, max_iter=10, check_every=10, dangling_free=True)
    ga = {r.v: r.rank for r in a.collect()}
    gb = {r.v: r.rank for r in b.collect()}
    assert set(ga) == set(gb)
    for v in ga:
        assert abs(ga[v] - gb[v]) < 1e-12, (v, ga[v], gb[v])


def test_pagerank_materialize_cadence_invariant(spark):
    # lazy K-round chains (materialize_every > 1) are a physical-plan
    # change only: the arithmetic graph is identical, so ranks must match
    # the eager per-round form exactly, including at a cadence that does
    # not divide max_iter
    raw, _ = GOLDEN["hub"]
    sym = canonicalize_edges(edges_df(spark, raw))
    base, _ = pagerank(
        sym, tol=0.0, max_iter=7, check_every=7, dangling_free=True,
        materialize_every=1,
    )
    gb = {r.v: r.rank for r in base.collect()}
    for k in (3, 4):
        got, _ = pagerank(
            sym, tol=0.0, max_iter=7, check_every=7, dangling_free=True,
            materialize_every=k,
        )
        gk = {r.v: r.rank for r in got.collect()}
        assert set(gk) == set(gb)
        # same arithmetic graph; only summation order inside partial
        # aggs can differ between the physical plans
        for v in gb:
            assert abs(gk[v] - gb[v]) < 1e-12, (k, v)


@pytest.mark.parametrize("name", ["two_tris", "path6", "hub"])
def test_components_both_strategies(spark, name):
    raw, _ = GOLDEN[name]
    e = edges_df(spark, raw).where("src != dst")
    want = numpy_components(raw)
    got_star, _ = connected_components(e)
    got_ml, _ = connected_components_minlabel(e, check_every=4)
    assert {r.v: r.comp for r in got_star.collect()} == want
    assert {r.v: r.comp for r in got_ml.collect()} == want


def test_components_two_tris_exact(spark):
    e = edges_df(spark, GOLDEN["two_tris"][0])
    got, _ = connected_components(e)
    comp = {r.v: r.comp for r in got.collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


@pytest.mark.parametrize("name", ["two_tris", "k4"])
def test_lpa_matches_numpy(spark, name):
    raw, _ = GOLDEN[name]
    e = edges_df(spark, raw)
    got, _ = label_propagation(e, max_iter=12)
    want = numpy_lpa(raw, max_iter=12)
    assert {r.v: r.label for r in got.collect()} == want


def test_pagerank_resume(spark, tmp_path):
    raw, _ = GOLDEN["bowtie"]
    sym = canonicalize_edges(edges_df(spark, raw))
    state_dir = str(tmp_path / "pr_state")
    # run 8 rounds (2 checks), persisting state
    r1, log1 = pagerank(sym, tol=0.0, max_iter=8, check_every=4, state_dir=state_dir)
    # resume and run to convergence; must agree with a fresh full run
    r2, log2 = pagerank(
        sym, tol=1e-10, max_iter=32, check_every=4, state_dir=state_dir, resume=True
    )
    fresh, _ = pagerank(sym, tol=1e-10, max_iter=32, check_every=4)
    a = {r.v: r.rank for r in r2.collect()}
    b = {r.v: r.rank for r in fresh.collect()}
    assert all(abs(a[v] - b[v]) < 1e-8 for v in a)
    assert log2.rounds[0]["round"] > 7  # actually resumed past round 8


def test_pagerank_resume_skips_partial_round_dir(spark, tmp_path):
    """r4 advisor: mode("overwrite") deletes the target before writing,
    so a crash mid-checkpoint leaves a partial round=N dir without its
    _SUCCESS marker — resume must fall back to the highest COMPLETE
    round, not silently read half-written state parquet."""
    import os

    raw, _ = GOLDEN["bowtie"]
    sym = canonicalize_edges(edges_df(spark, raw))
    state_dir = str(tmp_path / "pr_state")
    r1, _ = pagerank(sym, tol=0.0, max_iter=8, check_every=4, state_dir=state_dir)
    # plant the crash artifact: a higher round dir with no _SUCCESS
    os.makedirs(f"{state_dir}/round=99")
    r2, log2 = pagerank(
        sym, tol=1e-10, max_iter=32, check_every=4, state_dir=state_dir, resume=True
    )
    # resumed from the complete round 7, not the partial round 99
    # (which would have set start_round=100 >= max_iter and returned
    # the unreadable planted state outright)
    assert log2.rounds and 7 < log2.rounds[0]["round"] < 32
    fresh, _ = pagerank(sym, tol=1e-10, max_iter=32, check_every=4)
    a = {r.v: r.rank for r in r2.collect()}
    b = {r.v: r.rank for r in fresh.collect()}
    assert all(abs(a[v] - b[v]) < 1e-8 for v in a)


def test_pagerank_partition_metrics(spark):
    # north_rule: per-partition lineage + metrics — check rounds must
    # record the per-partition row histogram and a skew ratio.
    raw, _ = GOLDEN["bowtie"]
    sym = canonicalize_edges(edges_df(spark, raw))
    _, log = pagerank(sym, tol=0.0, max_iter=4, check_every=4, partition_metrics=True)
    entry = log.rounds[-1]
    assert entry["rows_total"] == sym.select("src").distinct().count()
    assert entry["rows_max_partition"] >= 1
    assert entry["skew_ratio"] >= 1.0
    assert sum(entry["rows_per_partition"]) == entry["rows_total"]


def test_pagerank_weighted_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from trianglecount_spark.operators.pagerank import pagerank

    rng = np.random.default_rng(5)
    n = 12
    rows = [
        (int(a), int(b), int(w))
        for (a, b), w in zip(
            {(int(x), int(y)) for x, y in rng.integers(0, n, size=(40, 2)) if x != y},
            rng.integers(1, 6, size=200),
        )
    ]
    wg = spark.createDataFrame(rows, "src long, dst long, wt long")
    ranks, _ = pagerank(wg, tol=0.0, max_iter=20, check_every=20, weight="wt")
    got = {r.v: r.rank for r in ranks.collect()}

    verts = sorted({x for a, b, _ in rows for x in (a, b)})
    idx = {v: i for i, v in enumerate(verts)}
    m = np.zeros((len(verts), len(verts)))
    wout = {}
    for a, b, w in rows:
        wout[a] = wout.get(a, 0) + w
    for a, b, w in rows:
        m[idx[b], idx[a]] += w / wout[a]
    r = np.full(len(verts), 1.0 / len(verts))
    for _ in range(20):
        rt = 0.85 * (m @ r)
        r = rt + (1.0 - rt.sum()) / len(verts)
    assert np.allclose([got[v] for v in verts], r, atol=1e-12)


def test_label_spreading_two_clusters(spark):
    from pyspark.sql import functions as F
    from trianglecount_spark.operators.lpa import label_spreading

    # two 5-cliques joined by one bridge edge; one seed in each clique
    left = [(a, b) for a in range(5) for b in range(5) if a < b]
    right = [(a + 10, b + 10) for a, b in left]
    edges = spark.createDataFrame(
        left + right + [(4, 10)], "src long, dst long"
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    seeds = spark.createDataFrame([(0, 7), (13, 9)], "v long, label int")
    out = {r.v: r.label for r in label_spreading(sym, seeds, rounds=3).collect()}
    # seeds clamped
    assert out[0] == 7 and out[13] == 9
    # cliques adopt their seed's label
    assert all(out[v] == 7 for v in range(5))
    assert all(out[v + 10] == 9 for v in range(5))
