"""Connected-components near-dup resolution vs a driver-side union-find."""

import random

import pytest
from pyspark.sql import functions as F

from quicker_spark.operators import dedup


def _union_find(pairs):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r["doc_id"], r["cluster_id"])
           for r in dedup.connected_components(df).collect()}
    want = set(_union_find(pairs).items())
    assert got == want


def test_cc_basic_shapes(spark):
    # chain, triangle, star, two singleton-joined comps, isolated pair
    _check(spark, [(1, 2), (2, 3), (3, 4),          # chain 1-4
                   (10, 11), (11, 12), (10, 12),    # triangle
                   (20, 21), (20, 22), (20, 23),    # star
                   (30, 31), (40, 41), (31, 40),    # merged via bridge
                   (50, 51)])


def test_cc_long_chain_converges_logarithmically(spark):
    # a 200-node path is the label-propagation worst case (diameter 200);
    # star alternation must converge in O(log^2 n) rounds, not 200
    pairs = [(i, i + 1) for i in range(200)]
    _check(spark, pairs)


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        pairs = [(a, b) for a, b in pairs if a != b]
        _check(spark, pairs)


def test_cc_duplicate_and_reversed_edges(spark):
    _check(spark, [(2, 1), (1, 2), (2, 1), (3, 2), (9, 8)])


def test_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert dedup.connected_components(df).count() == 0


def test_dedup_near_keeps_canonical_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string")
    # clusters {0,1,2}, {5,6}; singletons 3,4,7
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "a long, b long")
    kept = sorted(r["doc_id"]
                  for r in dedup.dedup_near(docs, pairs).collect())
    assert kept == [0, 3, 4, 5, 7]


def test_cc_converges_with_checkpoint_dir(spark, tmp_path):
    sc = spark.sparkContext
    before = sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        _check(spark, [(1, 2), (2, 3), (7, 8)])
    finally:
        if before is None:
            # clear via the scala setter (no python unset API)
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                sc._jvm.scala.Option.apply(None))
        else:
            sc.setCheckpointDir(before)
