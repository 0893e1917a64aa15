"""Command-line runner — ``python -m trianglecount_spark``.

The reference ships runnable artifacts (preprocess scripts + kernel
binaries driven from a shell, e.g. src/WithPartition/*.cu built to
executables); this is the analogous operational surface for the Spark
engine: every registered query is runnable by name against any sf_dir,
with output as JSON lines or a row count.

    python -m trianglecount_spark list
    python -m trianglecount_spark run triangle_total --sf-dir /root/testdata/sf0.01
    python -m trianglecount_spark run degrees --limit 10 --cores 8
    python -m trianglecount_spark run degrees --out /tmp/degrees.parquet
    python -m trianglecount_spark explain triangle_total  # formatted plan
    python -m trianglecount_spark oracle triangle_total   # print the DuckDB SQL
    python -m trianglecount_spark pipeline --pages synth:20000 --out /tmp/run1
    python -m trianglecount_spark pipeline --pages /data/pages --out /tmp/run1
        # resumable: re-running skips completed stages; PageRank resumes
        # mid-iteration from <out>/pr_state (plans/pipeline.py)

Exit code 0 on success; unknown query names list the registry and exit 2.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m trianglecount_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered query names")
    for name, hlp in (
        ("run", "run a registered query and print JSON rows"),
        ("explain", "print a query's formatted physical plan"),
        ("oracle", "print a query's DuckDB oracle SQL"),
    ):
        s = sub.add_parser(name, help=hlp)
        s.add_argument("query")
        if name in ("run", "explain"):
            s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
            s.add_argument("--cores", type=int, default=None)
        if name == "run":
            s.add_argument("--limit", type=int, default=20,
                           help="max rows printed (0 = count only)")
            s.add_argument("--out", default=None,
                           help="write the full result as parquet here instead")
    s = sub.add_parser(
        "pipeline",
        help="resumable end-to-end link-graph job (pages -> edges -> "
             "TC + PageRank + CC + LPA); see plans/pipeline.py",
    )
    s.add_argument("--pages", required=True,
                   help="pages parquet path, or synth:N[:SITES] for the "
                        "deterministic generator")
    s.add_argument("--out", required=True, help="output/state directory")
    s.add_argument("--pr-rounds", type=int, default=10)
    s.add_argument("--no-resume", action="store_true",
                   help="recompute every stage even if outputs exist")
    s.add_argument("--cores", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from trianglecount_spark.plans.queries import oracle, registry

    qs = registry()
    if args.cmd == "list":
        for name in sorted(qs):
            print(name)
        return 0
    if args.cmd == "pipeline":
        from trianglecount_spark.plans.pipeline import run_pipeline
        from trianglecount_spark.session import get_spark

        spark = get_spark(app_name="tc-pipeline", cores=args.cores)
        if args.pages.startswith("synth:"):
            from trianglecount_spark.sources.pages import make_pages

            parts = args.pages.split(":")
            n = int(parts[1])
            sites = int(parts[2]) if len(parts) > 2 else max(8, n // 32)
            pages = make_pages(spark, n_pages=n, n_sites=sites)
        else:
            from trianglecount_spark.sources.catalog import read_pages

            pages = read_pages(spark, args.pages)
        m = run_pipeline(
            spark, pages, args.out,
            pr_rounds=args.pr_rounds, resume=not args.no_resume,
        )
        print(json.dumps(m))
        return 0
    if args.query not in qs:
        print(f"unknown query {args.query!r}; known:", file=sys.stderr)
        for name in sorted(qs):
            print(f"  {name}", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        print(oracle()[args.query])
        return 0
    from trianglecount_spark.session import get_spark

    spark = get_spark(app_name=f"tc-{args.cmd}-{args.query}", cores=args.cores)
    df = qs[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")  # public API; prints the formatted plan
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"query": args.query, "out": args.out}))
        return 0
    if args.limit == 0:
        print(json.dumps({"query": args.query, "rows": df.count()}))
        return 0
    rows = df.limit(args.limit).collect()
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
