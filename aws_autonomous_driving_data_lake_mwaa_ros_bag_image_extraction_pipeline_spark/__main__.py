"""Command-line entry: run, list, or explain any registered query.

    python -m aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark list
    python -m aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark run pricing_summary --sf-dir /root/testdata/sf0.01 [--limit 20]
    python -m aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark explain minhash_dedup_pairs
    python -m aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark oracle pricing_summary

The ad-hoc surface for a user of the reference pipeline switching over:
every operator is reachable by name without writing a script, `explain`
prints the formatted physical plan (the artifact to review before a
100 TB run), and `oracle` prints the DuckDB-checkable SQL contract.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from .plans import registry

    p = argparse.ArgumentParser(prog="aads-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for name, hlp in (
        ("run", "execute a query and show rows"),
        ("explain", "print the formatted physical plan"),
        ("oracle", "print the DuckDB oracle SQL"),
    ):
        sp = sub.add_parser(name, help=hlp)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    if args.cmd == "list":
        for name, spec in sorted(registry.QUERIES.items()):
            mark = "*" if spec.headline else " "
            doc = (spec.fn.__doc__ or "").strip().splitlines()
            first = doc[0] if doc else ""
            print(f"{mark} {name:32s} {first}")
        return 0

    qs = registry.queries()
    if args.query not in qs:
        print(f"unknown query: {args.query!r} (see `list`)", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        sql = registry.oracle_sql().get(args.query)
        print(sql if sql else f"-- {args.query}: no SQL oracle (rows-only check)")
        return 0

    from .session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
