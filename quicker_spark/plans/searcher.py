"""Search template: pluggable recall strategies + filter chain.

Recreates the reference's demo search stack (reference:
demo/job/search/searcher.go:16-98) as thin composition over the engine:

- a ``Recaller`` builds a TermQuery + flags from the request context and
  produces a hits DataFrame (reference: recaller/keyword.go:16-48,
  keyword_author.go:16-54)
- ``Searcher.search`` runs every recaller, merges with business-id dedup
  (reference: searcher.go:62-78 — first-writer-wins channel merge; here
  max-score-wins, deterministic), then applies the filter chain
  sequentially (searcher.go:81-85)
- a ``Filter`` is any ``DataFrame -> DataFrame`` (reference:
  filter/filter.go:18-33 — the view-range filter becomes a plain column
  predicate)

The reference fans recallers out over goroutines; here each recall is an
independent DataFrame pipeline and the union IS the parallel plan —
Spark schedules both subtrees' stages concurrently. That only holds
because recall stays LAZY end to end: hydration goes through the
distributed ``hydrate_join`` (hits are k-row post-limit, so the join is
cheap and prunable), never through the collect-based point-lookup
``hydrate`` — an eager collect per recaller would serialize the fan-out
into one blocking Spark job per strategy.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quicker_spark.engine import SearchEngine
from quicker_spark.plans.term_query import And, NewTermQuery, TermQuery

Filter = Callable[[DataFrame], DataFrame]


@dataclass
class SearchContext:
    """Request context (reference: common/model.go:10-15 +
    param/search.go:3-9)."""
    keywords: tuple[str, ...] = ()
    author: str = ""
    class_bits: int = 0            # orFlags source (handler/search.go:40-52)
    extra: dict = field(default_factory=dict)


class Recaller:
    """Base recall strategy; subclasses build the query."""

    name = "base"

    def query(self, ctx: SearchContext) -> TermQuery:
        raise NotImplementedError

    def or_flags(self, ctx: SearchContext) -> tuple:
        return (ctx.class_bits,) if ctx.class_bits else ()

    def recall(self, eng: SearchEngine, ctx: SearchContext, k: int) -> DataFrame:
        q = self.query(ctx)
        # an Empty query yields a hydrated empty frame (union-compatible);
        # lazy hydrate_join (not the eager collect-based hydrate) so the
        # Searcher's union fans every recaller out in ONE Spark job
        hits = eng.search(q, k=k, or_flags=self.or_flags(ctx))
        return eng.hydrate_join(hits)


class KeywordRecaller(Recaller):
    """AND of all keywords on content, AND author if given
    (reference: recaller/keyword.go:25-36)."""

    name = "keyword"

    def query(self, ctx: SearchContext) -> TermQuery:
        leaves = [NewTermQuery("content", w) for w in ctx.keywords]
        if ctx.author:
            leaves.append(NewTermQuery("repo", ctx.author.lower()))
        return And(*leaves)


class KeywordAuthorRecaller(Recaller):
    """Keywords + session author from ctx.extra
    (reference: recaller/keyword_author.go:24-38)."""

    name = "keyword_author"

    def query(self, ctx: SearchContext) -> TermQuery:
        author = str(ctx.extra.get("user_name", "")).lower()
        if not author:
            return TermQuery()  # Empty -> recall contributes nothing
        leaves = [NewTermQuery("content", w) for w in ctx.keywords]
        leaves.append(NewTermQuery("repo", author))
        return And(*leaves)


class VectorRecaller(Recaller):
    """Vector-similarity recall strategy: a hits frame (doc_id, score)
    from an embedding top-k — exact cosine (`simsearch.cosine_topk`) or
    either ANN index (`lsh_ann_topk_indexed` / `ivf_ann_topk`) — mapped
    into the engine's hit schema and hydrated through the same LAZY join
    keyword recall uses, so one request fans out BM25 + vector recall in
    one Spark job and merges with the Searcher's best-score dedup (the
    retrieval shape a training-data dedup+retrieval pipeline runs: text
    match and embedding neighborhood as parallel strategies).

    ``topk_fn(engine, ctx, k) -> DataFrame(doc_id, score)`` supplies the
    vector hits; the embedding ids must live in the engine's doc_id
    domain (the forward index joins on doc_id). No reference analog —
    the reference's recaller seam (demo/job/search/recaller/) is the
    extension point this plugs into."""

    name = "vector"

    def __init__(self, topk_fn):
        self.topk_fn = topk_fn

    def recall(self, eng: SearchEngine, ctx: SearchContext, k: int) -> DataFrame:
        return eng.hydrate_join(self.topk_fn(eng, ctx, k))


def range_filter(col: str, lo, hi) -> Filter:
    """Post-recall range predicate; no-op when lo >= hi (reference:
    filter/filter.go:22-27 keeps all when ViewFrom >= ViewTo)."""

    def apply(df: DataFrame) -> DataFrame:
        if lo is not None and hi is not None and lo >= hi:
            return df
        out = df
        if lo is not None:
            out = out.filter(F.col(col) >= lo)
        if hi is not None:
            out = out.filter(F.col(col) <= hi)
        return out

    return apply


def rrf_fuse(frames: list[DataFrame], c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke, Büttcher SIGIR'09) over
    per-strategy hit frames: ``score(d) = Σ_lists 1/(c + rank_d)`` with
    rank 1-based by (score desc, doc_id asc) WITHIN each list. Rank
    fusion is scale-free — it merges BM25 scores with cosine scores
    without any cross-strategy calibration, which is why it is the
    standard hybrid-retrieval merge.

    Non-score columns ride along from each doc's best-ranked occurrence.
    The per-list rank window is GLOBAL (single partition) by design:
    every input frame is a k-row post-limit hit list, so the window sees
    k rows, never corpus data — same contract as the merge itself. The
    fused sum is order-independent in IEEE terms for the common 2-list
    case (one addition); 3+ lists sum in ascending-contribution order
    via a sorted array fold so the result stays engine-reproducible.
    """
    ranked = []
    for f in frames:
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ranked.append(f.withColumn("_rank", F.row_number().over(w)))
    merged = ranked[0]
    for f in ranked[1:]:
        merged = merged.unionByName(f)
    contrib = F.lit(1.0) / (F.lit(float(c)) + F.col("_rank"))
    w_pick = Window.partitionBy("doc_id").orderBy(F.asc("_rank"),
                                                  F.desc("score"))
    w_sum = Window.partitionBy("doc_id")
    return (merged
            .withColumn("_c", contrib)
            # deterministic fold order: sum the per-list contributions
            # ascending (sort_array over the collected doubles)
            .withColumn("_cs", F.sort_array(F.collect_list("_c").over(w_sum)))
            .withColumn("_rrf", F.aggregate(
                "_cs", F.lit(0.0), lambda acc, x: acc + x))
            .withColumn("_rn", F.row_number().over(w_pick))
            .filter(F.col("_rn") == 1)
            .withColumn("score", F.col("_rrf"))
            .drop("_rank", "_c", "_cs", "_rrf", "_rn"))


@dataclass
class Searcher:
    """Template method: Recall -> merge/dedup -> Filter chain
    (reference: searcher.go:87-98).

    ``fusion`` picks the merge: ``"best_score"`` (default — max-score
    business-id dedup, the reference's channel-merge made deterministic)
    or ``"rrf"`` (reciprocal-rank fusion via :func:`rrf_fuse` — the
    calibration-free hybrid merge for mixing BM25 with vector recall).
    """

    engine: SearchEngine
    recallers: tuple[Recaller, ...] = (KeywordRecaller(),)
    filters: tuple[Filter, ...] = ()
    fusion: str = "best_score"
    rrf_c: int = 60

    def search(self, ctx: SearchContext, k: int = 10) -> DataFrame:
        frames = [r.recall(self.engine, ctx, k) for r in self.recallers]
        if self.fusion == "rrf":
            out = rrf_fuse(frames, c=self.rrf_c)
        elif self.fusion == "best_score":
            merged = frames[0]
            for f in frames[1:]:
                merged = merged.unionByName(f)
            # dedup by business id, keep the best-scored occurrence
            w = Window.partitionBy("id").orderBy(F.desc("score"),
                                                 F.asc("doc_id"))
            out = (merged.withColumn("_rn", F.row_number().over(w))
                         .filter(F.col("_rn") == 1).drop("_rn"))
        else:
            raise ValueError(f"unknown fusion {self.fusion!r} "
                             "(expected 'best_score' or 'rrf')")
        for flt in self.filters:
            out = flt(out)
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
