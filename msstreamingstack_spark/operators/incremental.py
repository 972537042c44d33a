"""Incremental exact dedup against a persisted digest store.

The streaming ingest's ``dropDuplicatesWithinWatermark`` bounds its
state by TIME — a re-crawl arriving months later sails through it.
This operator closes that gap for the batch path: every increment of
new documents is deduplicated against ALL digests ever accepted, with
the store growing by digests only (16 bytes of md5 per unique doc —
a 100 TB corpus's digest store is a few hundred GB of joinable longs,
not text).

Shapes, per increment:
- in-increment dedup: one shuffle on the digest (operators/dedup.py's
  window form);
- vs-store dedup: one anti-join on the digest — AQE broadcasts the
  increment side when it's the small one, shuffles both when not;
- store append: the increment's fresh digests land in their own
  ``increment=<label>`` partition directory with OVERWRITE, and the
  known-set EXCLUDES the current label — so a replayed/retried
  increment recomputes the same fresh set and rewrites its own
  partition instead of duplicating or seeing its first attempt as
  foreign (the same idempotence discipline as the streaming sinks).

Global semantics: processing increments I1..In yields exactly the
fresh-doc set a single ``exact_dedup`` over the concatenation keeps,
with earlier increments winning ties (first-seen canonical), and the
in-increment canonical being min id — equality-tested in
tests/test_extensions.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _store_has_data(store_dir: str) -> bool:
    if not os.path.isdir(store_dir):
        return False
    for _root, _dirs, files in os.walk(store_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def dedup_increment(
    new_docs: DataFrame,
    store_dir: str,
    increment_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deduplicate one increment against itself and the store, then
    register its fresh digests. Returns the fresh (first-seen) rows of
    ``new_docs`` with their ``content_md5``.
    """
    spark = new_docs.sparkSession
    digest = F.md5(F.col(text_col).cast("binary"))
    w = Window.partitionBy("content_md5")
    in_inc = (
        new_docs.withColumn("content_md5", digest)
        .withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )
    if _store_has_data(store_dir):
        # exclude THIS increment's own prior digests: a retried/replayed
        # increment must recompute its contribution (and overwrite its
        # partition), not see its first attempt as foreign duplicates
        known = (
            spark.read.parquet(store_dir)
            .filter(F.col("increment") != increment_id)
            .select("content_md5")
            .distinct()
        )
        fresh = in_inc.join(known, "content_md5", "left_anti")
    else:
        fresh = in_inc
    # SNAPSHOT before touching the store: the fresh-set's plan reads
    # the store (anti-join), so any re-evaluation after the append
    # would see its own digests as "known" and return empty.
    # localCheckpoint cuts the lineage at materialized partitions.
    fresh = fresh.localCheckpoint(eager=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        fresh.select("content_md5")
        .withColumn("increment", F.lit(increment_id))
        .write.mode("overwrite")
        .partitionBy("increment")
        .parquet(store_dir)
    )
    return fresh


def store_digests(spark: SparkSession, store_dir: str) -> DataFrame:
    """All digests ever registered, with their increment label."""
    return spark.read.parquet(store_dir).select("content_md5", "increment")
