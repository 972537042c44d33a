"""Streaming-maintained continuous aggregate: the minutely MV kept up
to date by the stream must reproduce the batch hierarchical rollup
exactly, stay correct across a checkpoint-resumed second ingest, and
only ever rewrite the minute partitions a batch actually changed."""

from __future__ import annotations

import pytest

import os

import pyarrow as pa
import pyarrow.parquet as pq

from msstreamingstack_spark.streaming.continuous_agg import (
    hourly_from_mv,
    read_mv,
    run_continuous_agg,
)

SF = "/root/testdata/sf0.001"


def _stage_drops(out_dir, n_chunks, mtime0=1_700_000_000):
    src = pq.read_table(os.path.join(SF, "events.parquet"))
    df = src.to_pandas().sort_values("ts").reset_index(drop=True)
    os.makedirs(out_dir, exist_ok=True)
    n = len(df)
    step = (n + n_chunks - 1) // n_chunks
    paths = []
    for i, lo in enumerate(range(0, n, step)):
        path = os.path.join(out_dir, f"part-{i:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df.iloc[lo : lo + step], preserve_index=False),
            path,
        )
        mt = mtime0 + i * 10
        os.utime(path, (mt, mt))
        paths.append(path)
    return paths


def _batch_hourly(spark):
    from msstreamingstack_spark.queries import REGISTRY

    return {
        (r["hour_bucket"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["n_minutes_active"]
        )
        for r in REGISTRY["hypertable_rollup"].builder(spark, SF).collect()
    }


@pytest.mark.slow
def test_mv_matches_batch_rollup_and_resumes(spark, tmp_path):
    drops = str(tmp_path / "drops")
    all_paths = _stage_drops(drops, n_chunks=4)
    # hold back the last chunk for the resume leg — move it OUT of the
    # source dir (the file source ingests anything inside, regardless
    # of extension)
    held_back = all_paths[-1]
    deferred = str(tmp_path / os.path.basename(held_back))
    os.rename(held_back, deferred)

    mv_dir = str(tmp_path / "mv")
    cp = str(tmp_path / "cp")
    q = run_continuous_agg(spark, drops, mv_dir, cp)
    q.awaitTermination(180)

    # leg 1: MV covers the first 3 chunks — spot-check shape
    mv1 = read_mv(spark, mv_dir).collect()
    assert mv1 and all(r["n"] > 0 for r in mv1)
    files_before = {
        d: sorted(os.listdir(os.path.join(mv_dir, d)))
        for d in os.listdir(mv_dir)
        if d.startswith("min_bucket=")
    }

    # leg 2: release the held-back chunk, resume from the checkpoint
    os.rename(deferred, held_back)  # noqa: same basename, back in source dir
    mt = 1_700_000_000 + 99 * 10
    os.utime(held_back, (mt, mt))
    q = run_continuous_agg(spark, drops, mv_dir, cp)
    q.awaitTermination(180)

    got = {
        (r["hour_bucket"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["n_minutes_active"]
        )
        for r in hourly_from_mv(spark, mv_dir).collect()
    }
    assert got == _batch_hourly(spark)

    # upsert locality: minute partitions untouched by the last chunk
    # kept their exact file set (no gratuitous rewrite of history)
    files_after = {
        d: sorted(os.listdir(os.path.join(mv_dir, d)))
        for d in os.listdir(mv_dir)
        if d.startswith("min_bucket=")
    }
    touched = {d for d in files_before if files_after.get(d) != files_before[d]}
    untouched = set(files_before) - touched
    assert untouched, "resume rewrote every historical minute partition"

    # MV totals must also match a direct batch recount of the raw table
    mv = {(r["min_bucket"], r["event_type"]): r["n"] for r in read_mv(spark, mv_dir).collect()}
    from msstreamingstack_spark.sources.tables import events_with_time
    from pyspark.sql import functions as F

    raw = {
        (r["b"], r["event_type"]): r["n"]
        for r in events_with_time(spark, SF)
        .groupBy(((F.col("ts_sec") / 60).cast("long") * 60).alias("b"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert mv == raw


@pytest.mark.slow
def test_mv_compaction_preserves_rollup(spark, tmp_path):
    """A long-running MV accretes one tiny file per touched minute
    partition per batch; compaction must collapse the file count
    without changing any rollup result (partition column survives as
    a data column in the compacted copy)."""
    drops = str(tmp_path / "drops")
    _stage_drops(drops, n_chunks=3)
    mv_dir = str(tmp_path / "mv")
    q = run_continuous_agg(spark, drops, mv_dir, str(tmp_path / "cp"))
    q.awaitTermination(180)

    from msstreamingstack_spark.sinks.layout import compact_parquet
    from msstreamingstack_spark.streaming.continuous_agg import hourly_from_mv

    def key(rows):
        return sorted(tuple(r) for r in rows)

    before = key(hourly_from_mv(spark, mv_dir).collect())
    n_small = sum(
        1 for _r, _d, fs in os.walk(mv_dir) for f in fs if f.endswith(".parquet")
    )
    compacted = str(tmp_path / "mv_compact")
    n_out = compact_parquet(spark, mv_dir, compacted)
    assert n_out < n_small / 10, (n_out, n_small)
    assert key(hourly_from_mv(spark, compacted).collect()) == before


def test_mv_upsert_idempotent_on_replay(spark, tmp_path):
    """foreachBatch is at-least-once: applying the SAME batch of
    changed groups twice must leave the MV exactly as applying it
    once (update rows carry complete values, and the merge anti-joins
    the previous versions out)."""
    from decimal import Decimal

    from pyspark.sql import types as T

    from msstreamingstack_spark.streaming.continuous_agg import upsert_mv

    schema = T.StructType([
        T.StructField("min_bucket", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sv", T.DecimalType(25, 6)),
    ])
    b1 = spark.createDataFrame(
        [(60, "view", 3, Decimal("1.5")), (60, "click", 1, Decimal("2.0")),
         (120, "view", 2, Decimal("4.0"))],
        schema,
    )
    mv = str(tmp_path / "mv")
    upsert_mv(b1, mv)
    # batch 2 updates one existing group and adds one, then REPLAYS
    b2 = spark.createDataFrame(
        [(60, "view", 5, Decimal("9.5")), (180, "error", 1, Decimal("0.5"))],
        schema,
    )
    upsert_mv(b2, mv)
    once = sorted(tuple(r) for r in read_mv(spark, mv).collect())
    upsert_mv(b2, mv)  # replay
    twice = sorted(tuple(r) for r in read_mv(spark, mv).collect())
    assert once == twice
    got = {(r[0], r[1]): (r[2], str(r[3])) for r in twice}
    assert got[(60, "view")] == (5, "9.500000")
    assert got[(60, "click")] == (1, "2.000000")
    assert got[(120, "view")] == (2, "4.000000")
    assert got[(180, "error")] == (1, "0.500000")
