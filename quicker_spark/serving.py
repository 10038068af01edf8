"""Resident single-node serving tier: BM25 top-k without a Spark job.

The reference serves queries from worker processes that keep their index
shard RESIDENT in process memory (``index_service/sentinel.go:137-187``
scatter-gathers RPCs over workers; each worker answers from its in-memory
reverse index, ``index_service/worker.go``). The Spark engine's
:meth:`SearchEngine.search` is the cluster scatter-gather analog, but a
solo call pays one Spark job of scheduler latency (~0.3-0.5 s) no matter
how few bytes the pruned scan touches — the right cost model for
analytics and batch serving (``search_many``), the wrong one for a
point-query serving tier.

:class:`LocalSearcher` is that serving tier. It reads the SAME on-disk
index through pyarrow's dataset API — partition-pruned to the query
terms' ``bucket=`` directories (v5 layout), row-group-pruned by the
term-sorted file statistics, i.e. exactly the reads the Spark plan
performs, minus the scheduler — and scores with the SAME
``_score_segment_rows`` numpy kernels the executor kernels run, via the
SAME ``resolve_search_spec`` strategy resolution. Every result is
therefore rank- AND score-identical to ``SearchEngine.search``
(tests/test_local_serving.py asserts bitwise equality across modes,
boosts, paging cursors, excludes, and quorums; the ``bm25_local_top10``
driver query certifies it against the DuckDB oracle).

Hot terms' postings stay resident across calls (raw rows + encoded /
decoded forms, LRU-bounded by ``max_terms``), so repeated-term workloads
serve at kernel speed — the resident-index property the reference's
workers have by construction.

Scale story: nothing here is driver-specific. At the 10^12-doc design
point this class IS the per-shard serving worker — one long-lived
process per index shard (a shard = a subtree of segment directories),
its hot postings resident, behind any RPC fabric; the scatter-gather on
top is the reference's sentinel shape. The same bytes stay queryable by
the Spark path for analytics — one index, two latency tiers.

Staleness: maintenance (upsert/delete/force_merge) rewrites
``stats.json``; the searcher records its mtime at open and raises
:class:`StaleIndexError` when it changes, mirroring the reference's
index-reload-then-reopen discipline.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np
import pandas as pd

from quicker_spark.engine import (
    _row_to_encoded,
    _score_segment_rows,
    resolve_search_spec,
)
from quicker_spark.functions.buckets import term_bucket
from quicker_spark.plans.term_query import TermQuery


class StaleIndexError(RuntimeError):
    """The index was mutated (stats.json changed) after this searcher
    opened it; re-open a fresh LocalSearcher on the new generation."""


class LocalSearcher:
    """Serve BM25 top-k point queries from an index directory built by
    :func:`quicker_spark.operators.build.build_index` — no SparkSession,
    no Spark job; pyarrow pruned reads + the engine's numpy kernels.

    ``max_terms`` bounds the resident cache (LRU over terms; a term's
    residency = its raw posting rows + encoded/decoded kernel forms).

    ``threads`` scores a query's segments concurrently (default: up to 8
    or the machine's cores). Segments are disjoint and the global merge
    is a total order on (score desc, doc_id asc), so completion order
    cannot change results — rank identity holds at any thread count
    (tested). The kernels are numpy-vectorized, so the GIL is released
    for the decode/score inner loops; one searcher instance still serves
    ONE query at a time (the per-segment caches are not locked against
    concurrent queries — give each serving thread its own instance, the
    reference's one-index-per-worker shape).
    """

    def __init__(self, index_dir: str, max_terms: int = 65536,
                 threads: int | None = None):
        import pyarrow.dataset as pads

        self.index_dir = index_dir
        self._stats_path = os.path.join(index_dir, "stats.json")
        with open(self._stats_path) as fh:
            self.stats = json.load(fh)
        self._stats_mtime = os.path.getmtime(self._stats_path)
        self._post_ds = pads.dataset(
            os.path.join(index_dir, "postings"), partitioning="hive")
        self._ts_ds = pads.dataset(os.path.join(index_dir, "term_stats"))
        self._docs_ds = pads.dataset(
            os.path.join(index_dir, "docs"), partitioning="hive")
        self._n_buckets = int(self.stats.get("term_buckets") or 0)
        self._has_bucket = ("bucket" in self._post_ds.schema.names
                            and self._n_buckets > 1)
        self.max_terms = int(max_terms)
        self.threads = (min(8, os.cpu_count() or 1)
                        if threads is None else max(1, int(threads)))
        # resident state, all keyed/evicted by term (LRU)
        self._rows: OrderedDict[str, pd.DataFrame] = OrderedDict()
        self._df_global: dict[str, int] = {}
        self._seg_enc: dict[int, dict] = {}   # segment -> {term: Encoded}
        self._seg_dec: dict[int, dict] = {}   # segment -> {term: decoded}
        # positional-sidecar residency (phrase serving): term -> sidecar
        # rows, LRU-bounded by the same cap as the postings cache
        self._pos_ds = None                   # opened lazily (optional)
        self._pos_rows: OrderedDict[str, pd.DataFrame] = OrderedDict()

    # -- residency ----------------------------------------------------------
    def _check_fresh(self) -> None:
        try:
            m = os.path.getmtime(self._stats_path)
        except FileNotFoundError:
            raise StaleIndexError(f"index gone: {self.index_dir}")
        if m != self._stats_mtime:
            raise StaleIndexError(
                "index mutated since open (stats.json changed); "
                "re-open a LocalSearcher on the new generation")

    def _evict_to_cap(self) -> None:
        while len(self._rows) > self.max_terms:
            term, _ = self._rows.popitem(last=False)
            self._df_global.pop(term, None)
            for seg_cache in self._seg_enc.values():
                seg_cache.pop(term, None)
            for seg_cache in self._seg_dec.values():
                seg_cache.pop(term, None)

    def _ensure_terms(self, terms: set[str]) -> dict[str, pd.DataFrame]:
        """Fetch every missing term's posting rows + df_global in ONE
        pruned pyarrow read each; absent terms negative-cache an empty
        frame so repeats never re-read. Returns a {term: rows} snapshot
        taken BEFORE eviction, so the current query keeps its inputs even
        when ``max_terms`` is smaller than the query's own term count."""
        import pyarrow.compute as pc

        missing = sorted(t for t in terms if t not in self._rows)
        for t in terms - set(missing):
            self._rows.move_to_end(t)
        if not missing:
            self._dfg_live = {t: self._df_global[t] for t in terms}
            return {t: self._rows[t] for t in terms}
        filt = pc.field("term").isin(missing)
        if self._has_bucket:
            # directory-level pruning: same PartitionFilters the Spark
            # plan gets from _bucket_filter
            bks = sorted({term_bucket(t, self._n_buckets) for t in missing})
            filt = pc.field("bucket").isin(bks) & filt
        pdf = self._post_ds.to_table(filter=filt).to_pandas()
        ts = self._ts_ds.to_table(
            filter=pc.field("term").isin(missing),
            columns=["term", "df_global"]).to_pandas()
        dfg = dict(zip(ts["term"], ts["df_global"].astype(np.int64)))
        for t in missing:
            rows = pdf[pdf["term"] == t]
            self._rows[t] = rows
            # engine: left join + fillna(0) — absent terms score df 0
            self._df_global[t] = int(dfg.get(t, 0))
        snapshot = {t: self._rows[t] for t in terms}
        self._dfg_live = {t: self._df_global[t] for t in terms}
        self._evict_to_cap()
        return snapshot

    def _gather(self, scan_terms: set[str]) -> pd.DataFrame:
        """Assemble the kernel input frame: one row per (segment, term in
        scan_terms) with df_global attached — the same rows the Spark
        path's pruned scan + broadcast term-stats join produces."""
        rows = self._ensure_terms(scan_terms)
        frames = [rows[t] for t in sorted(scan_terms) if len(rows[t])]
        if not frames:
            return pd.DataFrame()
        pdf = pd.concat(frames, ignore_index=True)
        # df lookups go through the live-query snapshot: eviction under a
        # tiny max_terms cap must never starve the query that triggered it
        pdf["df_global"] = (pdf["term"].map(self._dfg_live)
                            .astype(np.int64))
        return pdf

    # -- positional sidecar (phrase serving) --------------------------------
    def _positions_dataset(self, fields: set[str]):
        """Open (once) and validate the positional sidecar for the
        phrase fields — same errors as the Spark path."""
        from quicker_spark.operators.positions import positions_meta

        meta = positions_meta(self.index_dir)
        if meta is None:
            raise ValueError(
                "phrase queries need the positional sidecar; run "
                "operators.positions.build_positions(spark, index_dir) "
                "first")
        for f in fields:
            if f not in meta["fields"]:
                raise ValueError(
                    f"field {f!r} has no positions (sidecar covers "
                    f"{meta['fields']})")
        if self._pos_ds is None:
            import pyarrow.dataset as pads
            self._pos_ds = pads.dataset(
                os.path.join(self.index_dir, "positions"),
                partitioning="hive")
        return self._pos_ds

    def _gather_positions(self, terms: set[str]) -> dict[str, pd.DataFrame]:
        """Sidecar rows per phrase term — the same bucket-directory +
        term-IN pruned read the postings cache uses, LRU-resident."""
        import pyarrow.compute as pc

        missing = sorted(t for t in terms if t not in self._pos_rows)
        for t in terms - set(missing):
            self._pos_rows.move_to_end(t)
        if missing:
            filt = pc.field("term").isin(missing)
            if self._has_bucket and "bucket" in self._pos_ds.schema.names:
                bks = sorted({term_bucket(t, self._n_buckets)
                              for t in missing})
                filt = pc.field("bucket").isin(bks) & filt
            pdf = self._pos_ds.to_table(filter=filt).to_pandas()
            for t in missing:
                self._pos_rows[t] = pdf[pdf["term"] == t]
        snapshot = {t: self._pos_rows[t] for t in terms}
        while len(self._pos_rows) > self.max_terms:
            self._pos_rows.popitem(last=False)
        return snapshot

    def _phrase_extra_ids(self, phrases: tuple, segments,
                          on: int, off: int,
                          or_flags: tuple) -> dict[int, dict]:
        """Per-segment pseudo-leaf candidate arrays: fold each phrase's
        adjacency match set from the sidecar rows — the same
        phrase_match_docs kernel the Spark path runs per segment."""
        from quicker_spark.engine import PhraseSpec
        from quicker_spark.functions.phrase import (decode_positions_row,
                                                    phrase_match_docs)

        specs = tuple(PhraseSpec(*p) for p in phrases)
        self._positions_dataset({p.field for p in specs})
        pterms = {k for p in specs for k in p.term_keys}
        rows = self._gather_positions(pterms)
        by_seg: dict[int, dict] = {}
        decoded: dict[int, dict] = {}
        for t, pdf in rows.items():
            for _, r in pdf.iterrows():
                seg = int(r["segment_id"])
                decoded.setdefault(seg, {})[t] = decode_positions_row(
                    bytes(r["ids"]), bytes(r["tfs"]), bytes(r["dls"]),
                    bytes(r["bits"]), bytes(r["pos"]))
        for seg in segments:
            dec = decoded.get(seg, {})
            extra = {}
            for p in specs:
                if set(p.term_keys) <= set(dec):
                    extra[p.key] = phrase_match_docs(
                        list(p.term_keys), dec, gap=p.gap,
                        on=on, off=off, or_flags=or_flags)
                else:
                    extra[p.key] = np.empty(0, dtype=np.int64)
            by_seg[seg] = extra
        return by_seg

    # -- term-dictionary expansion (the query-string compiler's needs) ------
    def _dict_slice(self, pref: str) -> pd.DataFrame:
        """(term, df_global) rows for the ``pref`` string range — a
        pushed-down range filter over the term-sorted stats files (the
        pyarrow analog of the engine's StartsWith dictionary slice;
        '\\x80' upper-bounds every [a-z0-9_\\x01] vocabulary byte)."""
        import pyarrow.compute as pc

        filt = (pc.field("term") >= pref) & (pc.field("term")
                                             < pref + "\x80")
        return self._ts_ds.to_table(
            filter=filt, columns=["term", "df_global"]).to_pandas()

    def expand_prefix(self, field: str, prefix: str,
                      max_expansions: int = 64) -> list[str]:
        """Same contract + ordering as :meth:`SearchEngine.expand_prefix`
        (df desc, term asc, top N), served from the local stats files."""
        sl = self._dict_slice(f"{field}\x01{prefix}")
        sl = sl.sort_values(["df_global", "term"],
                            ascending=[False, True],
                            kind="mergesort")
        return sl["term"].head(int(max_expansions)).tolist()

    def expand_regexp(self, field: str, pattern: str,
                      max_expansions: int = 64) -> list[str]:
        """Same contract as :meth:`SearchEngine.expand_regexp`: any
        literal prefix of the pattern anchors the dictionary slice, then
        the WHOLE word must match. Vocabulary terms are [a-z0-9_]+ and
        the supported pattern alphabet is shared by Java and Python
        regex, so the expansion set equals the Spark path's."""
        import re as _re

        from quicker_spark.engine import SearchEngine

        lit = []
        for ch in pattern:
            if ch in SearchEngine._REGEX_META:
                break
            lit.append(ch)
        sl = self._dict_slice(f"{field}\x01" + "".join(lit))
        if not len(sl):
            return []
        words = sl["term"].str[len(field) + 1:]
        rx = _re.compile(f"^(?:{pattern})$")
        sl = sl[words.map(lambda w: rx.fullmatch(w) is not None)]
        sl = sl.sort_values(["df_global", "term"],
                            ascending=[False, True], kind="mergesort")
        return sl["term"].head(int(max_expansions)).tolist()

    def expand_fuzzy(self, field: str, word: str, max_edits: int = 1,
                     prefix_len: int = 1,
                     max_expansions: int = 64) -> list[str]:
        """Same contract + (distance asc, df desc, term asc) ordering as
        :meth:`SearchEngine.expand_fuzzy`."""
        if max_edits < 0:
            raise ValueError("max_edits must be >= 0")
        word = str(word).lower()
        pref = f"{field}\x01{word[:prefix_len]}" if prefix_len \
            else f"{field}\x01"
        sl = self._dict_slice(pref)
        if not len(sl):
            return []
        words = sl["term"].str[len(field) + 1:]
        sl = sl[(words.str.len() - len(word)).abs() <= int(max_edits)]
        if not len(sl):
            return []
        dist = sl["term"].str[len(field) + 1:].map(
            lambda t: _levenshtein(t, word))
        sl = sl.assign(_d=dist)
        sl = sl[sl["_d"] <= int(max_edits)]
        sl = sl.sort_values(["_d", "df_global", "term"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return sl["term"].head(int(max_expansions)).tolist()

    def suggest(self, field: str, word: str, max_edits: int = 2,
                prefix_len: int = 1, n: int = 5) -> pd.DataFrame:
        """Spell suggestion from the local term-stats files — same
        contract, exclusions, and (distance asc, df desc, word asc)
        ranking as :meth:`SearchEngine.suggest`; returns pandas
        (word, distance, df)."""
        if max_edits < 0:
            raise ValueError("max_edits must be >= 0")
        word = str(word).lower()
        pref = f"{field}\x01{word[:prefix_len]}" if prefix_len \
            else f"{field}\x01"
        sl = self._dict_slice(pref)
        empty = pd.DataFrame({"word": pd.Series(dtype=object),
                              "distance": pd.Series(dtype=np.int64),
                              "df": pd.Series(dtype=np.int64)})
        if not len(sl):
            return empty
        words = sl["term"].str[len(field) + 1:]
        sl = sl.assign(word=words)
        sl = sl[(sl["word"].str.len() - len(word)).abs()
                <= int(max_edits)]
        if not len(sl):
            return empty
        sl = sl.assign(distance=sl["word"].map(
            lambda t: _levenshtein(t, word)))
        sl = sl[(sl["distance"] <= int(max_edits))
                & (sl["word"] != word)]
        sl = sl.sort_values(["distance", "df_global", "word"],
                            ascending=[True, False, True],
                            kind="mergesort").head(int(n))
        return pd.DataFrame({
            "word": sl["word"].to_numpy(dtype=object),
            "distance": sl["distance"].to_numpy(dtype=np.int64),
            "df": sl["df_global"].to_numpy(dtype=np.int64)})

    # -- serving ------------------------------------------------------------
    def search(self, q: TermQuery, k: int = 10, on: int = 0, off: int = 0,
               or_flags: tuple = (), mode: str = "auto",
               boosts: dict[str, float] | None = None,
               after: tuple[float, int] | None = None,
               exclude: TermQuery | None = None,
               min_should_match: int = 0,
               phrases: tuple = (),
               demote: TermQuery | None = None,
               demote_factor: float = 0.5) -> pd.DataFrame:
        """BM25 top-k -> pandas (doc_id, score), ordered (score desc,
        doc_id asc) — same contract, arguments, validation errors, and
        bitwise scores as :meth:`SearchEngine.search` (including
        ``phrases`` pseudo-leaf clauses, served from the local
        positional sidecar, and ``demote`` boosting-query trees)."""
        self._check_fresh()
        spec = resolve_search_spec(q, mode, boosts, after, exclude,
                                   min_should_match, phrases=phrases,
                                   demote=demote,
                                   demote_factor=demote_factor)
        if spec.empty:
            return _empty_hits()
        query = json.loads(q.to_json())
        exclude_tree = (json.loads(spec.exclude_json)
                        if spec.exclude_json else None)
        demote_tree = (json.loads(spec.demote_json)
                       if spec.demote_json else None)
        pdf = self._gather(set(spec.terms) | set(spec.neg_terms))
        if len(pdf) == 0:
            return _empty_hits()
        groups = [(int(seg), g)
                  for seg, g in pdf.groupby("segment_id", sort=False)]
        extra_by_seg: dict[int, dict] = {}
        if spec.phrases:
            extra_by_seg = self._phrase_extra_ids(
                spec.phrases, [s for s, _ in groups],
                on, off, tuple(or_flags))

        def _one(seg: int, g: pd.DataFrame):
            return _score_segment_rows(
                g, query, spec.strategy, len(spec.terms),
                int(self.stats["n_docs"]), float(self.stats["avgdl"]),
                k, on, off, tuple(or_flags),
                float(self.stats["k1"]), float(self.stats["b"]),
                int(self.stats["block_size"]),
                enc_cache=self._seg_enc.setdefault(seg, {}),
                dec_cache=self._seg_dec.setdefault(seg, {}),
                boosts=boosts, after=spec.after, exclude=exclude_tree,
                exclude_only=spec.neg_terms, min_match=spec.msm,
                extra_leaf_ids=extra_by_seg.get(seg),
                demote=demote_tree, demote_factor=spec.demote_factor)

        if self.threads > 1 and len(groups) > 1:
            # the reference's per-worker scatter: disjoint segments score
            # concurrently (numpy kernels release the GIL); the total-
            # order merge below makes completion order irrelevant
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(
                    max_workers=min(self.threads, len(groups))) as ex:
                parts = list(ex.map(lambda sg: _one(*sg), groups))
        else:
            parts = [_one(seg, g) for seg, g in groups]
        out_ids = [p[0] for p in parts]
        out_scores = [p[1] for p in parts]
        ids = np.concatenate(out_ids) if out_ids else np.empty(0, np.int64)
        scores = (np.concatenate(out_scores) if out_scores
                  else np.empty(0, np.float64))
        # global merge = orderBy(score desc, doc_id asc).limit(k)
        order = np.lexsort((ids, -scores))[:k]
        return pd.DataFrame({"doc_id": ids[order].astype(np.int64),
                             "score": scores[order]})

    def search_rescore(self, q: TermQuery, rescore_q: TermQuery,
                       k: int = 10, window_size: int = 50,
                       query_weight: float = 1.0,
                       rescore_weight: float = 1.0,
                       on: int = 0, off: int = 0,
                       or_flags: tuple = ()) -> pd.DataFrame:
        """Two-phase ranking (ES rescore, score_mode=total) — same
        contract, errors, and bitwise scores as
        :meth:`SearchEngine.search_rescore`: primary top-window from the
        resident postings, secondary = the rescore query's full scored
        match set (the same TAAT kernel with nothing dropped), combined
        as query_weight * primary + rescore_weight * secondary (0 where
        the rescorer doesn't match), top-k ties doc_id asc."""
        if window_size < k:
            raise ValueError(
                f"window_size ({window_size}) must be >= k ({k}) — "
                "the rescore phase only sees the window")
        win = self.search(q, k=window_size, on=on, off=off,
                          or_flags=or_flags)
        if not len(win):
            return _empty_hits()
        # full scored match set: keep-all top-k (nothing dropped)
        sec = self.search(rescore_q, k=2 ** 62, on=on, off=off,
                          or_flags=or_flags, mode="taat")
        r = dict(zip(sec["doc_id"].to_numpy(),
                     sec["score"].to_numpy()))
        qw, rw = float(query_weight), float(rescore_weight)
        comb = np.array([qw * s + (rw * r[d] if d in r else 0.0)
                         for d, s in zip(win["doc_id"].to_numpy(),
                                         win["score"].to_numpy())],
                        dtype=np.float64)
        ids = win["doc_id"].to_numpy()
        order = np.lexsort((ids, -comb))[:k]
        return pd.DataFrame({"doc_id": ids[order].astype(np.int64),
                             "score": comb[order]})

    def search_phrase(self, words, field: str = "content", k: int = 10,
                      on: int = 0, off: int = 0, or_flags: tuple = (),
                      gap: int = 0) -> pd.DataFrame:
        """Exact-phrase / ordered-proximity BM25 top-k from the local
        positional sidecar — same contract, errors, and bitwise scores
        as :meth:`SearchEngine.search_phrase` (tested rank-identical).
        Per segment: decode the phrase terms' sidecar rows, fold the
        adjacency match set, score with the shared
        ``score_segment_phrase`` kernel; global merge is the same
        (score desc, doc_id asc) total order."""
        from quicker_spark.functions.phrase import (decode_positions_row,
                                                    score_segment_phrase)
        from quicker_spark.model import bm25_idf

        self._check_fresh()
        self._positions_dataset({field})
        words = [str(w).lower() for w in words if str(w)]
        if not words:
            return _empty_hits()
        terms = [f"{field}\x01{w}" for w in words]
        need = set(terms)
        rows = self._gather_positions(need)
        # engine parity: term stats left-join + fillna(0)
        import pyarrow.compute as pc
        ts = self._ts_ds.to_table(
            filter=pc.field("term").isin(sorted(need)),
            columns=["term", "df_global"]).to_pandas()
        dfg = dict(zip(ts["term"], ts["df_global"].astype(np.int64)))
        idf = {t: bm25_idf(int(self.stats["n_docs"]), int(dfg.get(t, 0)))
               for t in need}
        decoded: dict[int, dict] = {}
        for t, pdf in rows.items():
            for _, r in pdf.iterrows():
                seg = int(r["segment_id"])
                decoded.setdefault(seg, {})[t] = decode_positions_row(
                    bytes(r["ids"]), bytes(r["tfs"]), bytes(r["dls"]),
                    bytes(r["bits"]), bytes(r["pos"]))
        parts = []
        for seg in sorted(decoded):
            dec = decoded[seg]
            if need <= set(dec):
                parts.append(score_segment_phrase(
                    terms, dec, idf, float(self.stats["avgdl"]), k,
                    on, off, tuple(or_flags),
                    float(self.stats["k1"]), float(self.stats["b"]),
                    gap=int(gap)))
        if not parts:
            return _empty_hits()
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        order = np.lexsort((ids, -scores))[:k]
        return pd.DataFrame({"doc_id": ids[order].astype(np.int64),
                             "score": scores[order]})

    def search_many(self, queries: dict[str, TermQuery], k: int = 10,
                    **kwargs) -> pd.DataFrame:
        """Batch point serving -> (qid, doc_id, score) ordered (qid asc,
        score desc, doc_id asc). Unlike the Spark ``search_many`` (whose
        win is amortizing ONE scan+job over the batch), the local batch
        is just a loop — the resident cache already amortizes the reads;
        per-query kwargs follow :meth:`SearchEngine.search_many`'s
        ``flags``/``boosts``/``after``/``excludes``/``min_should_match``
        maps."""
        flags = kwargs.get("flags") or {}
        boosts = kwargs.get("boosts") or {}
        after = kwargs.get("after") or {}
        excludes = kwargs.get("excludes") or {}
        msm = kwargs.get("min_should_match") or {}
        on, off = int(kwargs.get("on", 0)), int(kwargs.get("off", 0))
        orf = tuple(kwargs.get("or_flags", ()))
        frames = []
        for qid in sorted(queries, key=str):
            q_on, q_off, q_orf = flags.get(qid, (on, off, orf))
            hits = self.search(
                queries[qid], k=k, on=q_on, off=q_off, or_flags=q_orf,
                boosts=boosts.get(qid), after=after.get(qid),
                exclude=excludes.get(qid),
                min_should_match=int(msm.get(qid, 0)))
            if len(hits):
                hits.insert(0, "qid", str(qid))
                frames.append(hits)
        if not frames:
            return pd.DataFrame({"qid": pd.Series([], dtype=object),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    def lookup(self, doc_ids: list[int]) -> pd.DataFrame:
        """Forward-index batch get -> pandas rows, doc_id ascending;
        missing ids absent. Same segment-directory pruning as
        :meth:`SearchEngine.lookup` (ids' segment set -> partition
        filter, doc_id IN -> row-group pruning)."""
        import pyarrow.compute as pc

        self._check_fresh()
        ids = sorted({int(i) for i in doc_ids})
        if not ids:
            return pd.DataFrame()
        seg_docs = int(self.stats["seg_docs"])
        segs = sorted({i // seg_docs for i in ids})
        pdf = self._docs_ds.to_table(
            filter=(pc.field("segment_id").isin(segs)
                    & pc.field("doc_id").isin(ids))).to_pandas()
        return pdf.sort_values("doc_id", ignore_index=True)

    def hydrate(self, hits: pd.DataFrame,
                cols: tuple[str, ...] | None = None) -> pd.DataFrame:
        """Attach forward-index columns to a hits frame, hit order
        preserved (point-read; hits are k-row serving results)."""
        if len(hits) == 0:
            return hits
        docs = self.lookup(hits["doc_id"].tolist())
        if cols is not None:
            docs = docs[["doc_id", *[c for c in cols if c != "doc_id"]]]
        return hits.merge(docs, on="doc_id", how="left", sort=False)


def _levenshtein(a: str, b: str) -> int:
    """Plain edit distance — same metric as Spark's `levenshtein`
    (substitution cost 1, no transpositions)."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _empty_hits() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                         "score": pd.Series([], dtype=np.float64)})
