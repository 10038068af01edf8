"""spark-submit entry point: BM25 top-k / boolean queries over an index.

    spark-submit --py-files dist/quicker_spark.zip scripts/query_cli.py \
        --index /data/index --terms def,return --k 10 [--mode wand] \
        [--and] [--on 3] [--off 4] [--or-flag 192] [--hydrate]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--terms", required=True, help="comma-separated words")
    ap.add_argument("--field", default="content")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="auto", choices=["auto", "wand", "taat"])
    ap.add_argument("--and", dest="conj", action="store_true",
                    help="AND the terms (default OR)")
    ap.add_argument("--bool", dest="boolean", action="store_true",
                    help="unranked boolean match (reference semantics)")
    ap.add_argument("--on", type=int, default=0)
    ap.add_argument("--off", type=int, default=0)
    ap.add_argument("--or-flag", type=int, action="append", default=[])
    ap.add_argument("--hydrate", action="store_true")
    ap.add_argument("--master", type=str, default=None)
    args = ap.parse_args()

    b = SparkSession.builder.appName("quicker-query")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    from quicker_spark.engine import SearchEngine
    from quicker_spark.plans.term_query import And, NewTermQuery, Or

    leaves = [NewTermQuery(args.field, t) for t in args.terms.split(",")]
    q = And(*leaves) if args.conj else Or(*leaves)
    eng = SearchEngine(spark, args.index)
    if args.boolean:
        df = eng.search_bool(q, on=args.on, off=args.off,
                             or_flags=tuple(args.or_flag),
                             hydrate=args.hydrate)
    else:
        df = eng.search(q, k=args.k, on=args.on, off=args.off,
                        or_flags=tuple(args.or_flag), mode=args.mode,
                        hydrate=args.hydrate)
    for row in df.collect():
        print(json.dumps(row.asDict(), default=str))


if __name__ == "__main__":
    main()
