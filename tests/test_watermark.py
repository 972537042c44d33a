"""Watermark / late-data tests: the policy the reference never had
(SURVEY.md §2.6 T7 — processing-time only, late events processed as if
on time). Here: event-time aggregation under ``withWatermark`` must
drop rows later than the bound and still emit closed windows."""

from __future__ import annotations

import pytest

import os

import pyarrow as pa
import pyarrow.parquet as pq

from msstreamingstack_spark.sinks.writers import CollectingSink
from msstreamingstack_spark.streaming.pipeline import read_event_stream
from msstreamingstack_spark.streaming.watermark import (
    watermarked_session_agg,
    windowed_event_counts,
)

NS = 1_000_000_000


_MTIME_SEQ = [1_700_000_000]


def _write_events(path: str, rows: list[tuple[int, int]], user_id: int = 7) -> None:
    """rows = [(event_id, ts_sec)]. Each file gets a strictly
    increasing mtime: the file source orders same-mtime files
    NONDETERMINISTICALLY, and these tests depend on drop order."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * NS for r in rows], pa.int64()),
                "user_id": pa.array([user_id] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        path,
    )
    _MTIME_SEQ[0] += 10
    os.utime(path, (_MTIME_SEQ[0], _MTIME_SEQ[0]))


def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    """Batch 2 carries an event 300 s older than the watermark bound —
    it must NOT count toward its (already-closed) window."""
    src = tmp_path / "in"
    src.mkdir()
    # batch 0: three on-time events in window [0,300) + one at t=1000
    # (advances max event time; watermark after batch 0 = 1000-600=400)
    _write_events(str(src / "f1.parquet"), [(1, 10), (2, 20), (3, 30), (4, 1000)])
    # batch 1: advances time further. NOTE Spark's late-event filter
    # lags eviction by one batch (filterWM(N) = evictionWM(N-1)), so
    # the late row goes in batch 2, when the 400 s watermark is active
    # for filtering too.
    _write_events(str(src / "f2.parquet"), [(5, 5000)])
    # batch 2: late event t=100 < wm 400 → dropped; t=20000 pushes the
    # watermark far past every earlier window so they all emit
    _write_events(str(src / "f3.parquet"), [(6, 100), (7, 20000)])

    events = read_event_stream(spark, str(src)).select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    agg = windowed_event_counts(events, watermark="10 minutes", window="5 minutes")
    sink = CollectingSink()
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    first_window = [r.n_events for r in sink.rows if r.win_start_sec == 0]
    # the [0,300) window emitted ONCE, with the 3 on-time rows only —
    # the late row (t=100, arriving after the watermark passed 400)
    # was dropped and never re-opened the closed window
    assert first_window == [3], sorted(
        (r.win_start_sec, r.n_events) for r in sink.rows
    )
    by_window = {r.win_start_sec: r.n_events for r in sink.rows}
    # the t=1000 window also closed and emitted
    assert by_window.get(900) == 1, by_window


def test_watermarked_session_agg_emits_closed_sessions(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    # one user: events 0,60,120 (one session, gap 30 min), then a jump
    # past gap+watermark so the session closes and emits
    _write_events(str(src / "f1.parquet"), [(1, 0), (2, 60), (3, 120)])
    _write_events(str(src / "f2.parquet"), [(4, 10_000)])
    _write_events(str(src / "f3.parquet"), [(5, 50_000)])

    events = read_event_stream(spark, str(src)).select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    agg = watermarked_session_agg(events, watermark="10 minutes", gap="30 minutes")
    sink = CollectingSink()
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    sessions = {(r.start_sec, r.n_events) for r in sink.rows}
    assert (0, 3) in sessions, sessions  # first session: 3 events from t=0


def test_windowed_counts_batch_mode_matches_manual(spark, sf_smoke):
    """Same operator over a batch frame (no watermark path) — sanity
    vs a hand-computed floor-window aggregation."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.sources.tables import events_with_time

    ev = events_with_time(spark, sf_smoke).select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    got = {
        (r.win_start_sec, r.event_type): r.n_events
        for r in windowed_event_counts(ev, window="5 minutes").collect()
    }
    want = {
        (r.w, r.event_type): r.n
        for r in ev.groupBy(
            (F.floor(F.col("ts_sec") / 300) * 300).alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_across_batches(spark, tmp_path):
    """The same event_id redelivered in a later micro-batch (within
    the watermark) is emitted exactly once."""
    from msstreamingstack_spark.streaming.watermark import dedup_stream

    src = tmp_path / "in3"
    src.mkdir()
    _write_events(str(src / "f1.parquet"), [(1, 100), (2, 150)])
    # f2 redelivers event 1 (same ts) and adds event 3
    _write_events(str(src / "f2.parquet"), [(1, 100), (3, 200)])

    events = read_event_stream(spark, str(src)).select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    out = dedup_stream(events, keys=["event_id"], watermark="1 hour")
    sink = CollectingSink()
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp3"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ids = [r.event_id for r in sink.rows]
    assert sorted(ids) == [1, 2, 3], ids  # no duplicate emission of id 1
    assert len(sink.batches) >= 2


@pytest.mark.slow
def test_session_rollup_timeout_closes_idle_sessions(spark, tmp_path):
    """Sessions closed by a later event emit inline; the final session
    of an idle user emits via EventTimeTimeout once the watermark
    passes, and its state is removed."""
    from msstreamingstack_spark.streaming.stateful import session_rollup_stream

    src = tmp_path / "in4"
    src.mkdir()
    # NOTE times are offset from epoch 0: the initial watermark is
    # 1970-01-01T00:00:00 and the stateful-op late filter drops rows
    # with event_time <= watermark — a t=0 event is "late" at birth.
    B = 1_000_000
    # user 7: two-event session, then a second session much later
    _write_events(str(src / "f1.parquet"), [(1, B + 0), (2, B + 60)])
    _write_events(str(src / "f2.parquet"), [(3, B + 10_000)])
    # another user's far-future events push the watermark past
    # user 7's (10_000 + gap) timeout in two successive batches
    _write_events(str(src / "f3.parquet"), [(4, B + 90_000)], user_id=8)
    _write_events(str(src / "f4.parquet"), [(5, B + 95_000)], user_id=8)

    events = read_event_stream(spark, str(src)).select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    out = session_rollup_stream(events, gap_sec=1800, watermark="10 minutes")
    sink = CollectingSink()
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp4"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rollups = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.closed_by_timeout)
        for r in sink.rows
    }
    # session A (t=B..B+60) closed inline by the later event
    assert rollups[(7, B)] == (B + 60, 2, False), rollups
    # session B (t=B+10000) closed by TIMEOUT after watermark advanced
    end, n, by_timeout = rollups[(7, B + 10_000)]
    assert (end, n, by_timeout) == (B + 10_000, 1, True), rollups


def _write_valued_events(path: str, rows: list[tuple[int, int, float]]) -> None:
    """rows = [(event_id, ts_sec, value)] — like _write_events but with
    per-event values so OHLC fields are distinguishable."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * NS for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        path,
    )
    _MTIME_SEQ[0] += 10
    os.utime(path, (_MTIME_SEQ[0], _MTIME_SEQ[0]))


def test_ohlc_candles_batch_matches_registry_twin(spark, sf_smoke):
    """ohlc_candles on a BATCH frame must equal the oracled
    resample_ohlc_hourly registry query row-for-row (win_start_sec ==
    hour_bucket)."""
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.sources.tables import events_with_time
    from msstreamingstack_spark.streaming.watermark import ohlc_candles

    ev = events_with_time(spark, sf_smoke).select(
        "event_type", "ts_sec", "event_id", "value"
    )
    got = {
        (r["event_type"], r["win_start_sec"]): (
            r["n_events"], r["open"], r["high"], r["low"], r["close"]
        )
        for r in ohlc_candles(ev).collect()
    }
    want = {
        (r["event_type"], r["hour_bucket"]): (
            r["n_events"], r["open"], r["high"], r["low"], r["close"]
        )
        for r in REGISTRY["resample_ohlc_hourly"].builder(spark, sf_smoke).collect()
    }
    assert got == want and len(got) > 0


def test_ohlc_candles_stream_equals_batch_and_splits_batches(spark, tmp_path):
    """A candle whose events SPLIT across micro-batches must merge to
    the same OHLC as batch execution — open/close ride mergeable
    struct-min/max, not arrival order. The open (t=100) arrives in a
    LATER file than a higher-t event of the same window, so any
    arrival-order implementation would get open wrong."""
    from msstreamingstack_spark.streaming.watermark import ohlc_candles

    src = tmp_path / "in"
    src.mkdir()
    # window [0, 3600): events at t=200/1000 first, then the true open
    # t=100 in the NEXT file; highs/lows spread across batches too
    _write_valued_events(str(src / "f1.parquet"), [(1, 200, 5.0), (2, 1000, 9.0)])
    _write_valued_events(str(src / "f2.parquet"), [(3, 100, 2.0), (4, 3000, 1.0)])
    # window [3600, 7200): single event; then a far-future row pushes
    # the watermark past both windows so they emit and close
    _write_valued_events(str(src / "f3.parquet"), [(5, 4000, 7.0)])
    _write_valued_events(str(src / "f4.parquet"), [(6, 100000, 3.0)])

    events = read_event_stream(spark, str(src)).select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    sink = CollectingSink()
    q = (
        ohlc_candles(events, watermark="10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    by_win = {r.win_start_sec: r for r in sink.rows}
    w0 = by_win[0]
    assert (w0.n_events, w0.open, w0.high, w0.low, w0.close) == (4, 2.0, 9.0, 1.0, 1.0)
    w1 = by_win[3600]
    assert (w1.n_events, w1.open, w1.close) == (1, 7.0, 7.0)
    # each candle emitted exactly once (append mode, closed windows)
    assert len(sink.rows) == len(by_win)
