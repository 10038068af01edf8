"""Streaming windowed analytics: both documented output modes.

`windowed_event_stats` (complete + AvailableNow) is the one-shot
oracle-hashable shape certified by the `stream_hourly` driver row;
this module certifies the PRODUCTION shape `windowed_event_stats_append`
(withWatermark + append): window finalization equals the batch
aggregation on closed windows, a too-late event is dropped after its
window closed (never re-emitted), and the aggregation state holds only
the open windows (eviction observed through the emitted/withheld rows).
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest

from quicker_spark.streaming.analytics import (windowed_event_stats,
                                               windowed_event_stats_append)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _mk(h, m, typ, val):
    return (T0 + dt.timedelta(hours=h, minutes=m), typ, float(val))


def _write(spark, rows, path):
    (spark.createDataFrame(rows, "ts timestamp, event_type string, "
                                 "value double")
     .coalesce(1).write.mode("append").parquet(path))


@pytest.fixture()
def stream_dir(tmp_path):
    return str(tmp_path / "events")


def _batch_closed(rows, window_h=1, delay_h=2, dropped=()):
    """Expected append output: per-hour aggregates of `rows` minus
    `dropped`, restricted to windows closed at max(ts) - delay."""
    live = [r for r in rows if r not in dropped]
    mx = max(r[0] for r in live)
    wm = mx - dt.timedelta(hours=delay_h)
    agg = {}
    for ts, typ, val in live:
        start = ts.replace(minute=0, second=0, microsecond=0)
        if start + dt.timedelta(hours=window_h) > wm:
            continue
        key = (start.strftime("%Y-%m-%d %H:%M:%S"), typ)
        n, s = agg.get(key, (0, 0))
        agg[key] = (n + 1, s + round(val * 100))
    return sorted((h, t, n, s) for (h, t), (n, s) in agg.items())


def test_append_closed_windows_match_batch(spark, stream_dir):
    rows = [_mk(0, 5, "a", 1.25), _mk(0, 40, "b", 2.0),
            _mk(1, 10, "a", 0.5), _mk(2, 30, "b", 3.75),
            _mk(3, 15, "a", 1.0), _mk(5, 59, "a", 9.0)]
    _write(spark, rows, stream_dir)
    out = windowed_event_stats_append(spark, stream_dir, delay="2 hours")
    got = sorted(tuple(r) for r in out.collect())
    assert got == _batch_closed(rows)
    # windows newer than max(ts) - 2h stay OPEN in state, not emitted
    assert all(h < "2024-03-01 04" for h, *_ in got)
    # and the complete-mode run over the same dir sees EVERY window
    full = windowed_event_stats(spark, stream_dir)
    assert full.count() > len(got)


def test_late_event_dropped_after_window_closes(spark, stream_dir):
    """State-eviction semantics, observed through the output: the
    watermark computed from batch N's data applies from batch N+1, a
    window is emitted+evicted at the end of the first batch whose
    watermark passed its end, and an event arriving AFTER that eviction
    is dropped (numRowsDroppedByWatermark) — never re-emitted, never
    double-counted. Three mtime-ordered files = three micro-batches."""
    # batch 0 carries event time to 06:00 -> watermark 04:00 from batch 1
    first = [_mk(0, 5, "a", 1.0), _mk(1, 20, "a", 2.0),
             _mk(6, 0, "b", 1.0)]
    _write(spark, first, stream_dir)
    time.sleep(1.1)  # distinct mtimes: the file source processes in order
    # batch 1: any row; at its END the hour-0/1 windows emit and evict
    mid = _mk(6, 10, "b", 1.0)
    _write(spark, [mid], stream_dir)
    time.sleep(1.1)
    # batch 2: one event BEHIND the watermark in an evicted window
    # (dropped) and one ahead of it (merged; still open at stream end)
    late_dead = _mk(0, 45, "a", 100.0)
    late_ok = _mk(5, 30, "b", 4.0)
    _write(spark, [late_dead, late_ok], stream_dir)
    out = windowed_event_stats_append(spark, stream_dir, delay="2 hours")
    got = sorted(tuple(r) for r in out.collect())
    rows = first + [mid, late_dead, late_ok]
    assert got == _batch_closed(rows, dropped=(late_dead,))
    # the closed windows emitted exactly once, without the dead event
    assert got == [("2024-03-01 00:00:00", "a", 1, 100),
                   ("2024-03-01 01:00:00", "a", 1, 200)]


def test_append_is_deterministic(spark, stream_dir):
    rows = [_mk(0, 1, "a", 1.0), _mk(1, 2, "b", 2.0),
            _mk(4, 3, "a", 3.0)]
    _write(spark, rows, stream_dir)
    a = sorted(tuple(r) for r in
               windowed_event_stats_append(spark, stream_dir).collect())
    b = sorted(tuple(r) for r in
               windowed_event_stats_append(spark, stream_dir).collect())
    assert a == b


SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="driver testdata not present")
def test_append_matches_driver_oracle(spark):
    """The driver-query twin at sf0.001 (same comparison the gate runs
    at sf0.01)."""
    import duckdb

    from quicker_spark.driver_queries import ORACLE_SQL

    out = windowed_event_stats_append(spark, f"{SF_DIR}/events.parquet")
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    want = sorted(tuple(r) for r in
                  con.sql(ORACLE_SQL["stream_hourly_append"]).fetchall())
    con.close()
    assert got == want and got
