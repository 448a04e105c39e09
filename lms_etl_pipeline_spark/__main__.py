"""CLI entry point: ``python -m lms_etl_pipeline_spark <command>``.

The reference documents a "local dry run" that is actually a no-op (no
``__main__`` guard — SURVEY.md §3 entry point 3); the engine ships a real
one.  Commands:

    list                         show every registered query
    run <query> [--sf-dir DIR]   execute one query, print rows (capped)
    explain <query> [--sf-dir DIR]  print the formatted physical plan
    sql <stmt> [--sf-dir DIR]    ad-hoc Spark SQL over the registered views
    entry                        run the flagship driver query
    bench                        run the headline benchmark (one JSON line)
    audit                        physical-plan audit over the catalog
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lms_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    runp = sub.add_parser("run")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    exp = sub.add_parser("explain")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sqlp = sub.add_parser("sql")
    sqlp.add_argument("statement")
    sqlp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sqlp.add_argument("--limit", type=int, default=20)
    sub.add_parser("entry")
    sub.add_parser("bench")
    sub.add_parser("audit")
    args = p.parse_args(argv)

    if args.cmd == "bench":
        import bench

        return bench.main()
    if args.cmd == "audit":
        from tools import audit_plans

        return audit_plans.main()

    import __spark_entry__ as entrymod

    if args.cmd == "list":
        oracles = entrymod.oracle_sql()
        for name in sorted(entrymod.queries()):
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name:36s} [{kind}]")
        return 0

    from lms_etl_pipeline_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "entry":
        entrymod.entry(spark).show(25, truncate=False)
        return 0
    if args.cmd == "run":
        queries = entrymod.queries()
        if args.query not in queries:
            print(f"unknown query {args.query!r}; `list` shows all", file=sys.stderr)
            return 2
        queries[args.query](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    if args.cmd == "explain":
        queries = entrymod.queries()
        if args.query not in queries:
            print(f"unknown query {args.query!r}; `list` shows all", file=sys.stderr)
            return 2
        queries[args.query](spark, args.sf_dir).explain("formatted")
        return 0
    if args.cmd == "sql":
        from lms_etl_pipeline_spark.sources.tables import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
