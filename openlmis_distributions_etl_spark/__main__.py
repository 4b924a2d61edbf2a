"""CLI: run queries, the ETL pipeline, or the bench from the shell.

    python -m openlmis_distributions_etl_spark list
    python -m openlmis_distributions_etl_spark query q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--show 20]
    python -m openlmis_distributions_etl_spark etl \
        --sf-dir /root/testdata/sf0.001 --out /tmp/marts
    python -m openlmis_distributions_etl_spark curate \
        --sf-dir /root/testdata/sf0.001 --out /tmp/corpus
"""

from __future__ import annotations

import argparse
import sys

from . import registry
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="openlmis_distributions_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list available queries")

    qp = sub.add_parser("query", help="run one query and show results")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--show", type=int, default=20)

    ep = sub.add_parser("etl", help="run the end-to-end ETL pipeline")
    ep.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ep.add_argument("--out", required=True)

    cp = sub.add_parser(
        "curate", help="materialize the curated training corpus")
    cp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    cp.add_argument("--out", required=True)

    args = p.parse_args(argv)
    qs = registry.queries()

    if args.cmd == "list":
        for name in sorted(qs):
            print(name)
        return 0

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "query":
            if args.name not in qs:
                print(f"unknown query: {args.name} (see `list`)",
                      file=sys.stderr)
                return 2
            qs[args.name](spark, args.sf_dir).show(args.show, truncate=False)
            return 0
        if args.cmd == "etl":
            from .plans.pipeline import run_etl
            marts = run_etl(spark, args.sf_dir, args.out)
            for name, path in marts.items():
                print(f"{name}\t{path}")
            return 0
        if args.cmd == "curate":
            from .plans.curation import run_curation
            outs = run_curation(spark, args.sf_dir, args.out)
            for name, path in outs.items():
                print(f"{name}\t{path}")
            return 0
    finally:
        spark.stop()
    return 1


if __name__ == "__main__":
    sys.exit(main())
