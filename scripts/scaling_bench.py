"""N vs 4N scaling-efficiency evidence (north rule: >= 0.8).

Runs the identical index build + query batch at two parallelism levels
(default local[8] vs local[32] — the sandbox stand-in for N vs 4N
executor clusters) over the identical deterministic corpus, and reports
throughput at both plus efficiency = (R_4N / R_N) / 4.

Each level runs in its own child process so every measurement gets a
fresh JVM (a reused SparkSession cannot change its master).

Usage:
  python scripts/scaling_bench.py [--docs 60000]          # orchestrator
  python scripts/scaling_bench.py --single 8 --docs 60000 # one level
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_TERMS = [
    ("def", "return"), ("import", "class"), ("func", "var"),
    ("struct", "impl"), ("async", "await"), ("public", "static"),
]


def run_single(cores: int, n_docs: int) -> dict:
    from pyspark.sql import SparkSession

    from quicker_spark.engine import SearchEngine
    from quicker_spark.fixtures import corpus_df
    from quicker_spark.operators.build import IndexConfig, build_index
    from quicker_spark.plans.term_query import NewTermQuery, Or

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: small build in the same JVM (JIT + codegen + python worker
    # pool), discarded — we measure steady-state throughput
    warm_dir = tempfile.mkdtemp(prefix=f"quicker_scale_warm_{cores}_")
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, corpus_df(spark, max(n_docs // 20, 1000),
                                 partitions=cores * 2),
                warm_dir, IndexConfig(seg_docs=200_000), resume=False)
    shutil.rmtree(warm_dir, ignore_errors=True)

    out_dir = tempfile.mkdtemp(prefix=f"quicker_scale_{cores}_")
    shutil.rmtree(out_dir, ignore_errors=True)
    corpus = corpus_df(spark, n_docs, partitions=cores * 2)

    t0 = time.time()
    report = build_index(spark, corpus, out_dir,
                         IndexConfig(seg_docs=200_000), resume=False)
    build_s = time.time() - t0

    eng = SearchEngine(spark, out_dir)
    qts = []
    for a, b in QUERY_TERMS:
        q = Or(NewTermQuery("content", a), NewTermQuery("content", b))
        t1 = time.time()
        eng.search(q, k=10, mode="wand").collect()
        qts.append(time.time() - t1)
    qts.sort()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "cores": cores,
        "n_docs": n_docs,
        "build_sec": round(build_s, 2),
        "prepare_sec": round(report.prepare_secs, 2),
        "wave_secs": [round(w, 2) for w in report.wave_secs],
        "term_stats_sec": round(report.term_stats_secs, 2),
        "docs_per_sec": round(n_docs / build_s, 1),
        "query_p50_sec": round(qts[len(qts) // 2], 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60_000)
    ap.add_argument("--single", type=int, default=None)
    ap.add_argument("--levels", type=str, default="8,32")
    args = ap.parse_args()

    if args.single is not None:
        print("RESULT " + json.dumps(run_single(args.single, args.docs)))
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = []
    for c in levels:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--single", str(c), "--docs", str(args.docs)],
            capture_output=True, text=True, check=False,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"level {c} failed")
        results.append(json.loads(line[-1][len("RESULT "):]))

    lo, hi = results[0], results[-1]
    factor = hi["cores"] / lo["cores"]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / factor
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"R_{hi['cores']}/( {factor:.0f} * R_{lo['cores']} )",
        "levels": results,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
