"""spark-submit entry point: BM25 top-k / boolean queries over an index.

    spark-submit --py-files dist/quicker_spark.zip scripts/query_cli.py \
        --index /data/index --terms def,return --k 10 [--mode wand] \
        [--and] [--on 3] [--off 4] [--or-flag 192] [--hydrate]

Extra verbs (each replaces the ranked search): --bool (unranked
boolean), --suggest WORD (did-you-mean over the term dictionary),
--mlt DOC_ID (more-like-this), --explain (per-term score breakdown of
the top-k), --collapse FIELD (best hit per group), --describe (index
topology report, no query needed).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    group = ap.add_mutually_exclusive_group(required=True)
    group.add_argument("--terms", help="comma-separated words")
    group.add_argument("--query", help="Lucene query string, e.g. "
                       "'merge +table -spark quer*' (plans/qparse.py)")
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
    ap.add_argument("--suggest", type=str, default=None,
                    help="spell-suggest this word instead of searching")
    ap.add_argument("--mlt", type=int, default=None,
                    help="more-like-this for this doc id")
    ap.add_argument("--explain", action="store_true",
                    help="per-term score breakdown of the top-k")
    ap.add_argument("--collapse", type=str, default=None,
                    help="best hit per this forward-index column")
    ap.add_argument("--describe", action="store_true",
                    help="print the index topology report and exit")
    ap.add_argument("--master", type=str, default=None)
    args = ap.parse_args()

    b = SparkSession.builder.appName("quicker-query")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    from quicker_spark.engine import SearchEngine
    from quicker_spark.plans.term_query import And, NewTermQuery, Or

    q = None
    if args.terms is not None:
        leaves = [NewTermQuery(args.field, t) for t in args.terms.split(",")]
        q = And(*leaves) if args.conj else Or(*leaves)
    eng = SearchEngine(spark, args.index)
    if args.describe:
        print(json.dumps(eng.describe()))
        return
    if args.query is not None:
        from quicker_spark.plans.qparse import search_string
        df = search_string(eng, args.query, k=args.k,
                           default_field=args.field, mode=args.mode,
                           on=args.on, off=args.off,
                           or_flags=tuple(args.or_flag),
                           hydrate=args.hydrate)
        for row in df.collect():
            print(json.dumps(row.asDict(), default=str))
        return
    if args.suggest is not None:
        df = eng.suggest(args.field, args.suggest, n=args.k)
    elif args.mlt is not None:
        df = eng.more_like_this(args.mlt, field=args.field, k=args.k,
                                hydrate=args.hydrate)
    elif args.explain:
        df = eng.explain(q, k=args.k, on=args.on, off=args.off,
                         or_flags=tuple(args.or_flag), mode=args.mode)
    elif args.collapse is not None:
        df = eng.search_collapse(q, by=args.collapse, k=args.k,
                                 on=args.on, off=args.off,
                                 or_flags=tuple(args.or_flag))
    elif args.boolean:
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
