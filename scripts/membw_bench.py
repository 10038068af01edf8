"""Host memory-bandwidth ceiling evidence (STREAM-copy style).

The index-build wave moves every posting byte through the memory
controller (shuffle spills live on tmpfs, parquet output lives on
tmpfs, Arrow batches are copied between the JVM and python workers).
On a single-socket VM all cores share ONE memory controller, so once
aggregate copy bandwidth saturates, adding cores cannot speed up a
bandwidth-bound phase — the in-sandbox distortion BENCH.md documents
for the 2->8 wave ratio. On the north rule's real N vs 4N clusters
every added NODE brings its own memory controllers and storage
bandwidth, so this ceiling does not exist there.

This script measures that ceiling directly: k worker processes, each
pinned to its own CPU, each repeatedly memcpy-ing a buffer far larger
than LLC; reports aggregate GB/s at each k. If GB/s stops growing
with k, the host — not the engine — caps the large-N level.

Usage: python scripts/membw_bench.py [--cores 1,2,4,8] [--mb 512]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _worker(cpu: int, mb: int, secs: float, out: "mp.Queue") -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    src = np.random.randint(0, 255, size=mb * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    # warm both buffers (fault pages in before timing)
    np.copyto(dst, src)
    n = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        np.copyto(dst, src)
        n += 1
    dt = time.time() - t0
    # copy reads src + writes dst -> 2x buffer bytes of controller traffic
    out.put((cpu, 2.0 * n * mb / 1024.0 / dt))


def measure(k: int, mb: int, secs: float) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, mb, secs, q))
             for i in range(k)]
    for p in procs:
        p.start()
    rates = [q.get()[1] for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=str, default="1,2,4,8,16")
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for k in [int(x) for x in args.cores.split(",")]:
        best = max(measure(k, args.mb, args.secs)
                   for _ in range(max(1, args.reps)))
        results[k] = round(best, 1)
        print(f"cores={k:3d}  aggregate copy bandwidth = {best:8.1f} GB/s",
              flush=True)
    base = results[min(results)]
    print(json.dumps({
        "metric": "memcpy_aggregate_gbps",
        "levels": results,
        "scaling_vs_1": {k: round(v / base / (k / min(results)), 2)
                         for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
