"""Wave compaction (`maintain.force_merge` / `recover_merge`).

Contract (Lucene forceMerge analog for the wave layout): a pure
directory-layout rewrite — posting runs, doc ids, term stats, and every
query result are byte-identical before/after; only the wave grouping
(and so the file/directory count) changes. Crash-safe via the staged
marker + idempotent swap replay.
"""

from __future__ import annotations

import os
import shutil

import pytest

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.operators import maintain
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.operators.maintain import force_merge, recover_merge
from quicker_spark.operators.positions import build_positions
from quicker_spark.plans.term_query import NewTermQuery, Or


def _build(spark, path, wave_segments=1):
    build_index(spark, spark.createDataFrame(corpus_pdf(300)), str(path),
                IndexConfig(seg_docs=100, wave_segments=wave_segments),
                resume=False)
    return str(path)


def _q():
    return Or(NewTermQuery("content", "def"),
              NewTermQuery("content", "return"))


def _posting_runs(eng):
    """Every posting run's bytes, keyed (segment, term) — wave-free."""
    return {(r["segment_id"], r["term"]):
            (r["df"], bytes(r["ids"]), bytes(r["tfs"]),
             bytes(r["dls"]), bytes(r["bits"]))
            for r in eng.postings.collect()}


def _wave_dirs(idx, tree="postings"):
    return sorted(d for d in os.listdir(os.path.join(idx, tree))
                  if d.startswith("wave="))


def test_merge_is_layout_only(spark, tmp_path):
    idx = _build(spark, tmp_path / "idx", wave_segments=1)
    build_positions(spark, idx, fields=("content",))
    before_eng = SearchEngine(spark, idx)
    runs = _posting_runs(before_eng)
    hits = [(r["doc_id"], r["score"])
            for r in before_eng.search(_q(), k=10).collect()]
    ts = {r["term"]: r["df_global"]
          for r in before_eng.term_stats.collect()}
    ph = [(r["doc_id"], r["score"])
          for r in before_eng.search_phrase(["def", "main"], k=5).collect()]
    assert _wave_dirs(idx) == ["wave=0", "wave=1", "wave=2"]

    rep = force_merge(spark, idx, wave_segments=2)
    assert rep == {"merged": True, "waves_before": 3, "waves_after": 2,
                   "segments": 3}
    assert _wave_dirs(idx) == ["wave=0", "wave=2"]
    assert _wave_dirs(idx, "manifest") == ["wave=0", "wave=2"]
    assert _wave_dirs(idx, "positions") == ["wave=0", "wave=2"]
    assert os.path.exists(os.path.join(idx, "positions", "_meta.json"))

    eng = SearchEngine(spark, idx)
    assert _posting_runs(eng) == runs
    assert [(r["doc_id"], r["score"])
            for r in eng.search(_q(), k=10).collect()] == hits
    assert {r["term"]: r["df_global"]
            for r in eng.term_stats.collect()} == ts
    assert [(r["doc_id"], r["score"])
            for r in eng.search_phrase(["def", "main"], k=5).collect()] == ph
    assert eng.stats["wave_segments"] == 2

    # idempotent: same geometry again is a no-op
    rep2 = force_merge(spark, idx, wave_segments=2)
    assert rep2["merged"] is False and rep2["waves_before"] == 2


def test_maintenance_still_works_on_merged_index(spark, tmp_path):
    idx = _build(spark, tmp_path / "idx", wave_segments=1)
    force_merge(spark, idx, wave_segments=3)
    eng = SearchEngine(spark, idx)
    victim = int(eng.search(_q(), k=1).collect()[0]["doc_id"])
    maintain.delete_docs(spark, idx, [victim])
    eng2 = SearchEngine(spark, idx)
    assert not eng2.has(victim)
    assert victim not in {r["doc_id"]
                          for r in eng2.search(_q(), k=20).collect()}


def test_crash_between_staging_and_swap_recovers(spark, tmp_path,
                                                 monkeypatch):
    idx = _build(spark, tmp_path / "idx", wave_segments=1)
    before = _posting_runs(SearchEngine(spark, idx))

    boom = RuntimeError("crash before swap")

    def dying(base_dir, ops):
        raise boom

    monkeypatch.setattr(maintain, "_apply_dir_ops", dying)
    with pytest.raises(RuntimeError):
        force_merge(spark, idx, wave_segments=2)
    monkeypatch.undo()
    # marker + staging exist; live tree untouched
    assert os.path.exists(os.path.join(idx, "merge_pending.json"))
    assert _wave_dirs(idx) == ["wave=0", "wave=1", "wave=2"]

    # any maintenance entry point heals it
    assert maintain.recover_pending(spark, idx) is True
    assert not os.path.exists(os.path.join(idx, "merge_pending.json"))
    assert _wave_dirs(idx) == ["wave=0", "wave=2"]
    eng = SearchEngine(spark, idx)
    assert _posting_runs(eng) == before
    assert eng.stats["wave_segments"] == 2


def test_unparsable_marker_drops_staging_keeps_live(spark, tmp_path):
    idx = _build(spark, tmp_path / "idx", wave_segments=1)
    os.makedirs(os.path.join(idx, "postings_merged"), exist_ok=True)
    with open(os.path.join(idx, "merge_pending.json"), "w") as fh:
        fh.write('{"staged": tru')  # truncated
    assert recover_merge(idx) is True
    assert not os.path.isdir(os.path.join(idx, "postings_merged"))
    assert _wave_dirs(idx) == ["wave=0", "wave=1", "wave=2"]
    shutil.rmtree(idx, ignore_errors=True)
