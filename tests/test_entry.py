from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"v", "tri"}
    assert sum(r.tri for r in rows) > 0


def test_queries_registry_shape(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # r2 invariant: EVERY registered query has an exact oracle
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only


def test_one_query_runs(spark):
    qs = entrymod.queries()
    df = qs["degree_histogram"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_cli_list_oracle_and_unknown(capsys):
    from trianglecount_spark.__main__ import main

    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "triangle_total" in names and len(names) >= 100
    assert main(["oracle", "triangle_total"]) == 0
    assert "SELECT" in capsys.readouterr().out
    assert main(["run", "definitely_not_a_query"]) == 2
