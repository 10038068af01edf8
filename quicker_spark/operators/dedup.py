"""Near-duplicate resolution: connected components over candidate pairs.

The similarity operators (:mod:`quicker_spark.operators.textops`,
:mod:`quicker_spark.operators.simsearch`) stop at candidate PAIRS —
(a, b) rows saying "these two documents are near-duplicates". A
training-data pipeline needs one more step before it can act: resolve
the pair graph into duplicate CLUSTERS (a doc near-dup of b, b of c ⇒
{a, b, c} is one group even when (a, c) never collided in any band) and
keep exactly one canonical document per cluster.

That resolution is connected components over the pair graph. The
implementation is the alternating **large-star / small-star** algorithm
(Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
Components in MapReduce and Beyond", ACM SoCC'14): each round is a
constant number of DataFrame shuffles, the edge set converges to a
forest of stars (every node pointing at its component's minimum id) in
O(log² n) rounds — 2-3 rounds in practice for near-dup graphs, whose
components are shallow — and, unlike label propagation, convergence
does NOT degrade to O(component diameter) on pathological chains (LSH
transitive chains at low thresholds are exactly where diameters blow
up).

Scale notes (100 TB / 10^12 docs):
- Per round: large-star is one groupBy (map-side-combinable `min`) +
  one co-partitioned join back on the same key + one `distinct`;
  small-star the same on the large-oriented edges. No `collect_list`,
  no driver-side state — a hot node (a boilerplate file duplicated a
  million times) streams through an aggregation, never materializes a
  neighbor list.
- Skew is what the algorithm is FOR: large-star re-points high-degree
  stars at the component minimum, splitting hot nodes' edge lists
  across rounds (SoCC'14 §3 bounds the per-round degree growth).
- Each round is materialized through `checkpoint()` when the session
  has a checkpoint dir (reliable, executor-loss-safe — set one on a
  real cluster) else `localCheckpoint()` — iterative lineage otherwise
  grows exponentially and re-executes the whole history on any retry.
- The driver sees only a (count, xxhash64-sum) checksum per round — the
  convergence test — never edge data.

Reference context: quicker has no near-dup machinery at all (its
dedup is the exact business-key overwrite, index_service/indexer.go:
76-82); this module is part of the §7 training-data surface built on
top of the same corpus tables, certified against a DuckDB recursive-CTE
oracle (`dup_clusters`, `near_dedup_keep`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame) -> DataFrame:
    """Cut lineage between rounds: reliable checkpoint when the session
    has a checkpoint dir (survives executor loss — required at cluster
    scale), localCheckpoint otherwise (single-JVM test/bench mode)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint()
    return df.localCheckpoint()


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u points its LARGER neighbors at
    m = min(N(u) ∪ {u}). Emitted edges are (v, m) with v > u ≥ m, so
    the output stays self-loop-free after the u ≠ v filter."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m")))
    return (sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient every edge large→small, then point each
    node's SMALLER neighbors (and itself) at m = min of that star.
    Output rows keep the large→small orientation (u > v)."""
    o = e.select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    star = (o.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v")))
    self_edge = mins.select("u", F.col("m").alias("v"))
    return (star.union(self_edge)
            .where(F.col("u") != F.col("v"))
            .distinct())


def _checksum(e: DataFrame):
    """Order-insensitive edge-set fingerprint: one tiny aggregate job
    over the already-materialized round output."""
    # bit_xor, not sum: ANSI-overflow-free and order-insensitive; the
    # edge set is distinct, so xor cannot cancel duplicate rows
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("h")).first()
    return (row["n"], row["h"])


def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b", out_id: str = "doc_id",
                         out_comp: str = "cluster_id",
                         max_iter: int = 32) -> DataFrame:
    """(out_id, out_comp) for every node appearing in ``pairs``;
    ``out_comp`` is the MINIMUM node id of its connected component —
    deterministic, engine-independent, directly comparable with a SQL
    transitive-closure oracle.

    Alternates large-star/small-star until the small-star output's
    edge-set checksum is stable; at the fixed point the edge set is a
    star forest (SoCC'14 Thm 1), so labels are just the edges plus one
    self-row per root. Nodes with no candidate pair (singletons) do not
    appear — callers union them back (see :func:`dedup_near`, which
    keeps them implicitly via the anti-join).
    """
    e = (pairs.select(F.col(a_col).cast("long").alias("u"),
                      F.col(b_col).cast("long").alias("v"))
         .where(F.col("u") != F.col("v")))
    if e.isEmpty():
        return e.select(F.col("u").alias(out_id), F.col("v").alias(out_comp))
    e = _materialize(e.distinct())
    prev = None
    for _ in range(max_iter):
        e = _materialize(_small_star(_large_star(e)))
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(theoretical bound is O(log^2 n) — at any real n this means "
            "the input is adversarial or max_iter was set far too low)")
    labels = e.select(F.col("u").alias(out_id), F.col("v").alias(out_comp))
    roots = (e.select(F.col("v").alias(out_id)).distinct()
             .withColumn(out_comp, F.col(out_id)))
    # the star forest gives each non-root exactly one edge; the groupBy
    # is a cheap belt-and-braces collapse (and dedupes root self-rows)
    return (labels.union(roots)
            .groupBy(out_id)
            .agg(F.min(out_comp).alias(out_comp)))


def dedup_near(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
               a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Return ``df`` with near-duplicate rows removed: resolve ``pairs``
    into clusters and keep only each cluster's minimum-id document
    (plus every singleton untouched by any pair).

    One anti-join over the corpus: the loser set (cluster members that
    are not the canonical minimum) shuffles with the corpus on the id —
    the same single-exchange shape as exact dedup's semi-join. At a 50%
    dup rate the loser side is corpus-sized; an anti-join handles that,
    a broadcast would not (so none is hinted).
    """
    cc = connected_components(pairs, a_col=a_col, b_col=b_col,
                              out_id=id_col, out_comp="_comp")
    losers = (cc.where(F.col(id_col) != F.col("_comp"))
              .select(id_col))
    return df.join(losers, id_col, "left_anti")
