"""Benchmark harness: index build + headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_sec", "value": <total>, "unit": "sec",
   "queries": {...per-stage seconds...}, "sf": <sf>,
   "docs": N, "index_build_docs_per_sec": R}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def median_time(fn, reps: int = 3) -> float:
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return statistics.median(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = 0.1

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("quicker-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        # zstd shuffle: measured faster than lz4 at every pinned level
        # on this VM (shuffle spills land on tmpfs, so shuffle bytes are
        # memory-controller traffic); see BENCH.md round-4 scaling
        .config("spark.io.compression.codec", "zstd")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quicker_spark import driver_queries as dq
    from quicker_spark.engine import SearchEngine
    from quicker_spark.operators import simsearch, textops
    from quicker_spark.operators.build import IndexConfig, build_index
    from quicker_spark.plans.term_query import And, NewTermQuery, Or

    timings: dict[str, float] = {}
    t_suite = time.time()

    # -- index build (fresh, no resume) -------------------------------------
    out_dir = tempfile.mkdtemp(prefix="quicker_bench_idx_")
    shutil.rmtree(out_dir, ignore_errors=True)
    corpus = dq.corpus_df(spark, sf_dir)
    cfg = IndexConfig(fields=dq.DRIVER_FIELDS, id_col="biz_id",
                      seg_docs=dq.DRIVER_SEG_DOCS)
    # untimed warm-up: a small build in the same JVM (JIT + codegen +
    # python worker pool) so index_build measures steady-state engine
    # throughput, not first-job JVM warm-up (same protocol as
    # scripts/scaling_bench.py; at the 5k-doc driver corpus cold-start
    # was ~half the measured time and pure noise between rounds)
    warm_dir = tempfile.mkdtemp(prefix="quicker_bench_warm_")
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, corpus.limit(2000), warm_dir, cfg, resume=False)
    shutil.rmtree(warm_dir, ignore_errors=True)
    # warm best-of-2 (same discipline as scripts/scaling_bench.py
    # --child-reps): the first full-size build in a JVM still pays
    # residual C2/codegen warm-up the small warm pass doesn't reach —
    # a per-JVM-lifetime constant, not engine throughput
    best = None
    for _rep in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        report = build_index(spark, corpus, out_dir, cfg, resume=False)
        el = time.time() - t0
        best = el if best is None else min(best, el)
    timings["index_build"] = best
    eng = SearchEngine(spark, out_dir)

    # -- query serving -------------------------------------------------------
    terms = [("query", "spark", "table"), ("merge", "join", "hash"),
             ("scan", "filter", "sort")]

    def wand_all():
        for ts in terms:
            eng.search(Or(*[NewTermQuery("content", t) for t in ts]),
                       k=10, mode="wand").collect()

    def taat_all():
        for ts in terms:
            eng.search(And(NewTermQuery("content", ts[0]),
                           NewTermQuery("content", ts[1])),
                       k=10, mode="taat").collect()

    def conj_all():
        for ts in terms:
            eng.search(And(NewTermQuery("content", ts[0]),
                           NewTermQuery("content", ts[1])),
                       k=10, mode="conj").collect()

    def batch_all():
        # the SAME 3 OR queries as wand_all, answered by ONE Spark job
        # (shared postings scan + per-segment multi-query kernel)
        qs = {f"q{i}": Or(*[NewTermQuery("content", t) for t in ts])
              for i, ts in enumerate(terms)}
        eng.search_many(qs, k=10).collect()

    timings["bm25_wand_3q"] = median_time(wand_all)
    timings["bm25_batch_3q"] = median_time(batch_all)
    timings["bm25_taat_3q"] = median_time(taat_all)
    timings["bm25_conj_3q"] = median_time(conj_all)
    # per-query latency p50 (the BASELINE.md headline query metric)
    lat = []
    for ts in terms * 2:
        t1 = time.time()
        eng.search(Or(*[NewTermQuery("content", t) for t in ts]),
                   k=10, mode="wand").collect()
        lat.append(time.time() - t1)
    timings["bm25_wand_p50"] = statistics.median(lat)
    timings["bool_and"] = median_time(
        lambda: eng.search_bool(And(NewTermQuery("content", "table"),
                                    NewTermQuery("content", "merge"))).count())

    # -- resident local serving tier (serving.LocalSearcher): the same
    # index bytes + kernels with NO Spark job in the loop. cold_first =
    # open + first pruned pyarrow read; p50 = warm resident-cache
    # latency; local_24q = 24 heterogeneous warm queries in a loop
    # (throughput shape; rank-identical to the Spark path, tested) ------
    from quicker_spark.serving import LocalSearcher

    t0 = time.time()
    ls = LocalSearcher(out_dir)
    ls.search(Or(*[NewTermQuery("content", t) for t in terms[0]]),
              k=10, mode="wand")
    timings["local_cold_first"] = time.time() - t0
    lat = []
    for ts in terms * 4:
        t1 = time.time()
        ls.search(Or(*[NewTermQuery("content", t) for t in ts]),
                  k=10, mode="wand")
        lat.append(time.time() - t1)
    timings["bm25_local_p50"] = statistics.median(lat)
    pool = ["query", "spark", "table", "merge", "join", "hash",
            "scan", "filter", "sort"]
    qs24 = {f"q{i}": Or(*[NewTermQuery("content", pool[(i + j) % len(pool)])
                          for j in range(3)]) for i in range(24)}
    t0 = time.time()
    ls.search_many(qs24, k=10)
    timings["local_24q"] = time.time() - t0

    # -- positional sidecar: build + phrase/proximity/prefix/facets ---------
    from quicker_spark.operators.positions import build_positions

    t0 = time.time()
    build_positions(spark, out_dir, fields=("content",))
    timings["positions_build"] = time.time() - t0
    timings["phrase_top10"] = median_time(
        lambda: eng.search_phrase(["table", "hash"], k=10).collect())
    timings["near_top10_gap2"] = median_time(
        lambda: eng.search_phrase(["table", "hash"], k=10, gap=2).collect())
    timings["prefix_top10"] = median_time(
        lambda: eng.search_prefix("content", "s", k=10,
                                  max_expansions=4096).collect())
    timings["facet_lang"] = median_time(
        lambda: eng.facet_counts(
            And(NewTermQuery("content", "table"),
                NewTermQuery("content", "merge"))).collect())

    # -- boosted / fuzzy / paging / highlight serving ------------------------
    or_q = Or(NewTermQuery("content", "table"),
              NewTermQuery("content", "merge"))
    timings["bm25_boosted_top10"] = median_time(
        lambda: eng.search(or_q, k=10, boosts={
            "content\x01table": 0.4, "content\x01merge": 3.0}).collect())
    timings["fuzzy_top10"] = median_time(
        lambda: eng.search_fuzzy("content", "tablr", k=10,
                                 max_edits=2).collect())
    _p1 = eng.search(or_q, k=10).collect()
    _cursor = (float(_p1[-1]["score"]), int(_p1[-1]["doc_id"]))
    timings["bm25_page2_top10"] = median_time(
        lambda: eng.search(or_q, k=10, after=_cursor).collect())
    timings["highlight_top10"] = median_time(
        lambda: eng.highlight(eng.search(or_q, k=10),
                              ["table", "merge"]).collect())
    timings["regexp_top10"] = median_time(
        lambda: eng.search_regexp("content", "s[ctl][a-z]+", k=10).collect())
    timings["wildcard_top10"] = median_time(
        lambda: eng.search_wildcard("content", "s?a*", k=10).collect())
    timings["bool_not"] = median_time(
        lambda: eng.search_bool_not(
            NewTermQuery("content", "table"),
            NewTermQuery("content", "merge")).count())
    timings["bm25_not_top10"] = median_time(
        lambda: eng.search(or_q, k=10,
                           exclude=NewTermQuery("content", "spark"))
        .collect())
    timings["boosting_top10"] = median_time(
        lambda: eng.search(or_q, k=10,
                           demote=NewTermQuery("content", "join"),
                           demote_factor=0.5)
        .collect())
    timings["rescore_top10"] = median_time(
        lambda: eng.search_rescore(
            or_q, And(NewTermQuery("content", "hash"),
                      NewTermQuery("content", "join")),
            k=10, window_size=30, rescore_weight=2.0)
        .collect())
    timings["sorted_top12"] = median_time(
        lambda: eng.search_sorted(or_q, by="doc_len", k=12).collect())
    timings["facet_stats"] = median_time(
        lambda: eng.facet_stats(
            And(NewTermQuery("content", "table"),
                NewTermQuery("content", "merge")),
            on_col="doc_len").collect())
    timings["bm25_msm_top10"] = median_time(
        lambda: eng.search(
            Or(*[NewTermQuery("content", t)
                 for t in ("query", "spark", "table")]),
            k=10, min_should_match=2).collect())
    timings["bm25_explain_top10"] = median_time(
        lambda: eng.explain(or_q, k=10).collect())
    timings["mlt_top10"] = median_time(
        lambda: eng.more_like_this(42, max_terms=5, k=10).collect())
    timings["suggest_top5"] = median_time(
        lambda: eng.suggest("content", "tabl", max_edits=2, n=5).collect())
    timings["sig_terms"] = median_time(
        lambda: eng.significant_terms(
            And(NewTermQuery("content", "table"),
                NewTermQuery("content", "merge")),
            size=10, min_doc_count=3).collect())
    timings["collapse_top5"] = median_time(
        lambda: eng.search_collapse(or_q, by="lang", k=5).collect())
    timings["facet_quantiles"] = median_time(
        lambda: eng.facet_percentiles(
            NewTermQuery("content", "table"), on_col="doc_len").collect())
    timings["facet_cardinality"] = median_time(
        lambda: eng.facet_cardinality(
            And(NewTermQuery("content", "table"),
                NewTermQuery("content", "merge")),
            on_col="repo", by=("lang",)).collect())

    from quicker_spark.plans.qparse import search_string
    timings["querystring_top10"] = median_time(
        lambda: search_string(eng, "merge +table -spark quer*", k=10,
                              max_expansions=4096).collect())
    # round-5 serving surface: phrase-as-clause (positions UNION scan),
    # nested must_not (in-tree AndNot), and the same string served from
    # the resident tier (local sidecar reads, no Spark job)
    timings["querystring_phrase_top10"] = median_time(
        lambda: search_string(eng, '+"table hash" +lang:en query',
                              k=10).collect())
    timings["querystring_nestednot_top10"] = median_time(
        lambda: search_string(eng, "query OR (table AND NOT merge)",
                              k=10).collect())
    lat = []
    for _ in range(6):
        t1 = time.time()
        search_string(ls, '+"table hash" +lang:en query', k=10)
        lat.append(time.time() - t1)
    timings["local_phrase_p50"] = statistics.median(lat)

    # -- hybrid serving: BM25 + two recall lists fused by reciprocal rank --
    from quicker_spark.plans.searcher import (KeywordRecaller,
                                              SearchContext, Searcher)

    def rrf_once():
        s = Searcher(eng, recallers=(KeywordRecaller(), KeywordRecaller()),
                     fusion="rrf")
        s.search(SearchContext(keywords=("table", "merge")), k=10).collect()

    timings["rrf_top10"] = median_time(rrf_once)

    # -- wave compaction: untimed fragmented rebuild (the shape months of
    # micro-batch upserts leave), timed layout-only merge -------------------
    from quicker_spark.operators.maintain import force_merge

    frag_dir = tempfile.mkdtemp(prefix="quicker_bench_frag_")
    shutil.rmtree(frag_dir, ignore_errors=True)
    build_index(spark, corpus, frag_dir,
                IndexConfig(fields=dq.DRIVER_FIELDS, id_col="biz_id",
                            seg_docs=dq.DRIVER_SEG_DOCS, wave_segments=2),
                resume=False)
    t0 = time.time()
    force_merge(spark, frag_dir, wave_segments=64)
    timings["force_merge"] = time.time() - t0
    shutil.rmtree(frag_dir, ignore_errors=True)

    # -- training-data operators ---------------------------------------------
    docs = dq.documents(spark, sf_dir)
    emb = dq.embeddings(spark, sf_dir)
    timings["exact_dedup"] = median_time(
        lambda: textops.exact_duplicates(docs).filter("keep").count(), 1)
    timings["minhash_lsh"] = median_time(
        lambda: textops.lsh_candidate_pairs(
            textops.minhash_signatures(docs)).count(), 1)
    timings["simhash"] = median_time(lambda: textops.simhash(docs).count(), 1)
    timings["cosine_top10"] = median_time(
        lambda: simsearch.cosine_topk(emb, 0, 10).collect())
    timings["lsh_ann_top10"] = median_time(
        lambda: simsearch.lsh_ann_topk(emb, 0, 10).collect())
    ann_dir = tempfile.mkdtemp(prefix="quicker_bench_ann_")
    shutil.rmtree(ann_dir, ignore_errors=True)
    t0 = time.time()
    simsearch.build_ann_index(emb, ann_dir)
    timings["ann_index_build"] = time.time() - t0
    timings["lsh_ann_indexed_top10"] = median_time(
        lambda: simsearch.lsh_ann_topk_indexed(spark, ann_dir, 0, 10).collect())
    ivf_dir = tempfile.mkdtemp(prefix="quicker_bench_ivf_")
    shutil.rmtree(ivf_dir, ignore_errors=True)
    t0 = time.time()
    simsearch.build_ivf_index(emb, ivf_dir)
    timings["ivf_index_build"] = time.time() - t0
    timings["ivf_ann_top10"] = median_time(
        lambda: simsearch.ivf_ann_topk(spark, ivf_dir, 0, 10).collect())
    timings["near_pairs_lsh"] = median_time(
        lambda: simsearch.near_pairs_lsh(emb, threshold=0.5).count(), 1)
    timings["token_stats"] = median_time(
        lambda: textops.token_stats(docs).agg(F.sum("n_tokens")).collect(), 1)
    timings["winnow_fp"] = median_time(
        lambda: textops.winnow_fingerprints(docs).count(), 1)
    from quicker_spark.streaming.analytics import (
        windowed_event_stats, windowed_event_stats_append)
    timings["stream_hourly"] = median_time(
        lambda: windowed_event_stats(
            spark, os.path.join(sf_dir, "events.parquet")).count(), 1)
    timings["stream_hourly_append"] = median_time(
        lambda: windowed_event_stats_append(
            spark, os.path.join(sf_dir, "events.parquet")).count(), 1)
    from quicker_spark.operators import dedup
    timings["dup_clusters"] = median_time(
        lambda: dedup.connected_components(
            textops.lsh_candidate_pairs(
                textops.minhash_signatures(docs, k=8),
                k=8, bands=4)).count(), 1)

    total = time.time() - t_suite
    out = {
        "metric": "suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "docs": report.n_docs,
        "index_build_docs_per_sec": round(report.n_docs / timings["index_build"], 1),
        "cpus": cpus,
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ann_dir, ignore_errors=True)
    shutil.rmtree(ivf_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
