"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

The reference has no vector path at all; these are the scale-path
additions a training-data pipeline needs (SURVEY.md §7). Vector math is
Catalyst higher-order functions (`zip_with` + `aggregate`) — float64,
fixed left-fold order, so a SQL oracle computing the same dot products
agrees to the ulp.

Scale notes (10^9+ vectors):
- `cosine_topk` broadcasts the query vector (a literal in the plan) and is
  one scan + TakeOrdered — the exact baseline; partial top-k per partition,
  driver merges k rows.
- `lsh_ann_topk` buckets vectors by random-hyperplane signs; the probe
  touches only matching buckets (partition-prunable when the table is
  written partitioned by bucket). Planes are generated with integer LCG
  arithmetic so every engine derives identical planes — no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic float64 order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(emb: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector.

    (id, cos) ordered by (cosine desc, id asc).
    The query row is joined in by a 1-row broadcast cross join; the scan +
    limit compiles to per-partition partial top-k.
    """
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    q = e.filter(F.col(id_col) == query_id).select(F.col("v").alias("qv"))
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def near_pairs(emb: DataFrame, threshold: float = 0.9,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(a, b, cos): all pairs (a<b) with cosine >= threshold — the exact
    (quadratic) embedding near-dup check; use `lsh_ann` buckets to
    prefilter at scale."""
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    ia, ib = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, ib > ia)
        .select(ia.alias("a"), ib.alias("b"), cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


# -- LSH-bucketed ANN ---------------------------------------------------------

def _plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random plane component in [-0.5, 0.5) from
    integer LCG arithmetic — identical in any engine, no RNG state."""
    x = (1103515245 * (p * 131 + d * 7 + 12345) + 12345) % (1 << 31)
    return x / float(1 << 31) - 0.5


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """int bucket id = sign bits of ``n_planes`` hyperplane projections."""
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(_plane_component(p, d)) for d in range(dim)])
        proj = dot(vec, plane)
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def lsh_ann_topk(emb: DataFrame, query_id: int, k: int = 10,
                 n_planes: int = 4, dim: int = 64,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket (single-probe). Same output shape as :func:`cosine_topk`.

    At scale the emb table is written `partitionBy(bucket)` so the probe
    is a partition-pruned scan of ~1/2^n_planes of the data.
    """
    e = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    e = e.withColumn("bucket", lsh_bucket(F.col("v"), n_planes, dim))
    q = (e.filter(F.col(id_col) == query_id)
          .select(F.col("v").alias("qv"), F.col("bucket").alias("qb")))
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        e.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qb")) & (F.col(id_col) != query_id))
        .select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
