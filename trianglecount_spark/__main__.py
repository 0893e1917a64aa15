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
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from trianglecount_spark.plans.queries import oracle, registry

    qs = registry()
    if args.cmd == "list":
        for name in sorted(qs):
            print(name)
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
