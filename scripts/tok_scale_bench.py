"""Standalone scaling probe for the pack kernel (tokenize+count+pack).

The wave profile (scripts/wave_profile.py) shows the pack stage costing
~3.5x more CPU-seconds at 8 pinned cores than at 2 on the SAME input —
while sequential-copy bandwidth scales ~1.0 to 8 cores
(scripts/membw_bench.py). This probe runs the exact python kernel the
pack stage runs (batch_doc_term_tfs over fixture content batches) in k
isolated processes, each pinned to its own core, with NO Spark, no JVM,
no shuffle — if per-core throughput collapses here too, the degradation
is host memory-system behavior under random-access load (hash tables /
factorize / argsort are latency-bound, which STREAM-copy does not
measure); if it scales, the regression lives in the Spark data path.

Usage: python scripts/tok_scale_bench.py [--cores 1,2,8] [--docs 20000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_batch(docs: int):
    """Deterministic content batch shaped like the fixture corpus."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    words = [f"w{i:04d}" for i in range(5000)]
    content = [" ".join(rng.choice(words, size=rng.integers(40, 220)))
               for _ in range(docs)]
    return pd.DataFrame({
        "content": content,
        "repo": [f"repo{i % 97}" for i in range(docs)],
        "path": [f"src/f{i % 1013}.py" for i in range(docs)],
        "lang": ["py"] * docs,
    })


def _worker(cpu: int, docs: int, secs: float, out: "mp.Queue") -> None:
    os.sched_setaffinity(0, {cpu})
    from quicker_spark.functions.tokenize import batch_doc_term_tfs

    pdf = _mk_batch(docs)
    fields = ("content", "repo", "path", "lang")
    cols = [pdf[f] for f in fields]
    batch_doc_term_tfs(fields, cols)  # warm
    n = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        batch_doc_term_tfs(fields, cols)
        n += 1
    out.put((cpu, n / (time.time() - t0)))


def measure(k: int, docs: int, secs: float) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, docs, secs, q))
             for i in range(k)]
    for p in procs:
        p.start()
    rates = [q.get()[1] for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="1,2,8")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--secs", type=float, default=20.0)
    args = ap.parse_args()
    levels = [int(c) for c in args.cores.split(",")]
    res = {}
    for k in levels:
        rate = measure(k, args.docs, args.secs)
        res[k] = round(rate, 3)
        print(json.dumps({"cores": k, "batches_per_sec": res[k],
                          "per_core": round(rate / k, 3)}), flush=True)
    base = levels[0]
    for k in levels[1:]:
        eff = (res[k] / k) / (res[base] / base)
        print(json.dumps({"pair": f"{base}->{k}",
                          "per_core_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
