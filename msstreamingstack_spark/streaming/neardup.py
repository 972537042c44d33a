"""In-stream NEAR-duplicate detection — the streaming twin of the
batch MinHash+LSH kernel (operators/dedup.py::minhash_lsh_pairs).

The batch family catches near-dups across the whole corpus; the
streaming corpus ingest (streaming/corpus.py) previously deduped on
exact content hash only, so a lightly-edited re-crawl sailed through
until the next batch sweep. This module closes that gap with
Spark-managed state at BUCKET granularity:

1. Per document, compute the 16-permutation MinHash signature PER ROW
   (no aggregation, no shuffle) with an Arrow-batched pandas UDF:
   shingles → per-shingle md5-prefix hash48 → numpy min over the fixed
   permutations. BIT-IDENTICAL to the batch signature kernel
   (``minhash_signatures``: same hash48, same permutation constants —
   pinned by the parity test, which crosses the two computation
   strategies). An all-JVM HOF form was measured 3× slower even at
   26k shingles: transform()/array_min() lambda bodies evaluate
   interpreted per element.
2. Explode to the same 8 banded keys the batch LSH uses and group by
   (band, key): ``applyInPandasWithState`` keeps ONE occupant per
   bucket — the first-arriving doc's (doc_id, signature). In
   continuous deployments the occupant is evicted after
   ``state_ttl_ms`` idle time (ProcessingTimeTimeout), bounding state
   by the re-crawl window exactly like
   ``dropDuplicatesWithinWatermark`` bounds the exact-dedup state;
   drain-mode (AvailableNow) runs leave the TTL off — see
   ``bucket_verdicts`` for why.
3. Every later doc hitting an occupied bucket emits a candidate row
   with the signature-estimated jaccard (matching permutations / 16);
   a doc is flagged near-dup when ANY of its 8 buckets yields
   ``est_jaccard >= SIG_MATCH_MIN/16``. The per-doc max runs
   batch-side in ``foreachBatch`` (the 8 verdict rows of a doc land
   in the same micro-batch output).

Semantics vs the batch kernel: candidates are THE SAME banded buckets,
but verification is signature-estimated (16 components) instead of
exact-jaccard — the state store cannot hold every prior doc's shingle
set, and does not need to: identical shingle sets share all 16
components (est = 1.0), so an exact re-crawl is flagged whenever its
original (or any ≥13/16-matching doc) occupies at least one of its 8
buckets — which first-arrival occupancy makes the overwhelmingly
common case, though an adversarial arrival order can pre-claim ALL of
a doc's buckets with low-match occupants (single-occupant state is
the price of O(buckets) memory; the batch sweep downstream remains
the completeness backstop). The 13/16 threshold catches light edits
with the standard MinHash estimator error (sd ≈ 0.1 at j = 0.8).
Everything is deterministic (fixed permutations, deterministic tie
order), so the
whole pipeline is EXACTLY reproducible by the sequential reference
twin ``neardup_twin`` — the property test drains the same drops
through both and requires identical flag sets; a bridge property ties
the bucket keys to ``minhash_lsh_pairs``' candidate generator.

Scale: per-row signature is O(shingles × 16) inside the scan stage;
the only shuffle is the (band, key) state partitioning — 8 small rows
per doc (band, key, id, 16 longs), no text. Bucket state is one
occupant per distinct band key, TTL-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from msstreamingstack_spark.functions.text import shingles  # noqa: F401 — kept for the JVM twin docstring reference
from msstreamingstack_spark.operators.dedup import (
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    MOD_HASH,
    NUM_HASHES,
)

SIG_MATCH_MIN = 13  # >= 13/16 matching components ~ est jaccard >= 0.8


def minhash_signature_expr(text: Column, shingle_n: int = 3) -> Column:
    """16-long MinHash signature per ROW (no groupBy — a streaming row
    gets its signature inside the scan stage): word 3-gram shingles →
    48-bit md5-prefix hash → min over each fixed permutation. Same
    hash, same permutation constants as the batch
    ``minhash_signatures`` aggregate — the parity test crosses the two
    computation strategies and requires bit-equality.

    Arrow-batched pandas UDF rather than array HOFs: the lambda bodies
    of transform()/array_min() run INTERPRETED per element (measured
    ~0.1 ms/element — 6.5 s for 500 docs), while hashlib md5 + numpy
    min-over-permutations does the same 26k shingles in ~0.1 s.
    int64 bounds: h < 2^48, A < 2^14, B < 2^61 ⇒ h·A + B < 2^63.

    Empty shingle set (< 3 tokens) → null (such docs have no batch
    signature row either — callers filter)."""
    import hashlib

    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    a = np.array(MINHASH_A, dtype=np.int64)
    b = np.array(MINHASH_B, dtype=np.int64)

    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks = t.split(" ")
            if len(toks) < shingle_n:
                out.append(None)
                continue
            grams = {
                " ".join(toks[i : i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            }
            hs = np.fromiter(
                (
                    int(hashlib.md5(g.encode("utf-8")).hexdigest()[:12], 16)
                    for g in grams
                ),
                dtype=np.int64,
                count=len(grams),
            )
            # (len, 16): permute every hash under all 16 maps at once
            perms = (hs[:, None] * a[None, :] + b[None, :]) % MOD_HASH
            out.append(perms.min(axis=0))
        return pd.Series(out)

    return pandas_udf(_sig, "array<long>")(text)


def banded_keys_expr(sig: Column) -> Column:
    """The batch LSH's band keys ("mh_i_mh_j" string concat,
    dedup.py::minhash_lsh_pairs) over a signature ARRAY — array of
    (band, key) structs, exploded by the caller."""
    n_bands = NUM_HASHES // BAND_SIZE
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at(sig, b * BAND_SIZE + j + 1).cast("string")
                        for j in range(BAND_SIZE)
                    ],
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )


_BUCKET_STATE = T.StructType(
    [
        T.StructField("occupant", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]
)

_BUCKET_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("matched_doc", T.LongType()),
        T.StructField("n_match", T.IntegerType()),
    ]
)


def _sig_matches(a: list, b: list) -> int:
    return sum(1 for x, y in zip(a, b) if x == y)


def _make_bucket_fn(ttl_ms: int | None):
    def _bucket_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        # all chunks first, ONE deterministic order (doc_id): chunk
        # boundaries must not affect who claims the bucket
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        occupant, occ_sig = (
            (state.get[0], list(state.get[1])) if state.exists else (None, None)
        )
        out = []
        for doc_id, sig in zip(rows["doc_id"], rows["sig"]):
            sig = [int(x) for x in sig]
            if occupant is None:
                occupant, occ_sig = int(doc_id), sig
                out.append((int(doc_id), None, None))
            else:
                out.append((int(doc_id), occupant, _sig_matches(sig, occ_sig)))
        state.update((occupant, occ_sig))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["doc_id", "matched_doc", "n_match"])

    return _bucket_fn


DEFAULT_STATE_TTL_MS = 10 * 60 * 1000


def bucket_verdicts(docs: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """(streaming or batch-test) documents → per-(doc, band) verdict
    rows. Input needs (doc_id, text); docs too short to shingle are
    dropped (no signature ⇒ not near-dup-detectable, matching the
    batch kernel's domain).

    ``state_ttl_ms`` bounds bucket state for CONTINUOUS deployments
    (ProcessingTimeTimeout eviction after that much idle time — the
    re-crawl window). Leave None for drain-to-empty runs
    (Trigger.AvailableNow): a processing-time timer keeps an
    available-now query spinning EMPTY micro-batches until every
    registered timer has fired — measured ~480 empty batches / 5 min
    for a 10-minute TTL on a 1-second drain."""
    sig = docs.select(
        "doc_id", minhash_signature_expr(F.col("text")).alias("sig")
    ).filter(F.col("sig").isNotNull())
    banded = sig.select(
        "doc_id", "sig", F.explode(banded_keys_expr(F.col("sig"))).alias("bk")
    ).select(
        "doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    return banded.groupBy("band", "key").applyInPandasWithState(
        _make_bucket_fn(state_ttl_ms),
        outputStructType=_BUCKET_OUT,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


def flag_neardups(verdicts: DataFrame) -> DataFrame:
    """Per-doc near-dup decision from a MICRO-BATCH of bucket verdicts
    (batch-side, called inside foreachBatch): flagged when the best
    bucket match reaches SIG_MATCH_MIN components; partner = the
    best-matching occupant (ties → smallest doc_id)."""
    best = F.max(
        F.when(
            F.col("n_match").isNotNull(),
            F.struct(F.col("n_match"), (-F.col("matched_doc")).alias("neg")),
        )
    )
    agg = verdicts.groupBy("doc_id").agg(best.alias("best"))
    return agg.select(
        "doc_id",
        (
            F.coalesce(F.col("best.n_match"), F.lit(0)) >= SIG_MATCH_MIN
        ).alias("is_neardup"),
        F.when(
            F.coalesce(F.col("best.n_match"), F.lit(0)) >= SIG_MATCH_MIN,
            -F.col("best.neg"),
        ).alias("matched_doc"),
        (
            F.coalesce(F.col("best.n_match"), F.lit(0)).cast("double")
            / NUM_HASHES
        ).alias("est_jaccard"),
    )


def run_neardup_stream(
    spark,
    source_path: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    state_ttl_ms: int | None = None,
):
    """Wire the detector over a document file-drop stream; one verdict
    parquet per micro-batch (idempotent batch_id-scoped overwrite).
    Continuous mode (``available_now=False``) defaults the bucket-state
    TTL on; drain mode leaves it off (see bucket_verdicts)."""
    import os

    from msstreamingstack_spark.streaming.corpus import read_document_stream

    if state_ttl_ms is None and not available_now:
        state_ttl_ms = DEFAULT_STATE_TTL_MS
    docs = read_document_stream(
        spark, source_path, max_files_per_trigger
    ).select("doc_id", "text")
    verdicts = bucket_verdicts(docs, state_ttl_ms=state_ttl_ms)

    def sink(df: DataFrame, batch_id: int) -> None:
        flag_neardups(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    writer = (
        verdicts.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "cp"))
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Sequential reference twin (test oracle)
# ---------------------------------------------------------------------------
def neardup_twin(ordered_docs: list[tuple[int, list[int]]]) -> dict[int, bool]:
    """The detector's EXACT semantics as a sequential loop:
    ``ordered_docs`` is [(doc_id, 16-signature)] in arrival order
    (batch order, doc_id within batch). Returns doc_id → flagged.
    Deterministic twin for property tests — must agree with the
    streamed pipeline bit-for-bit on the same drained corpus."""
    n_bands = NUM_HASHES // BAND_SIZE
    buckets: dict[tuple[int, str], tuple[int, list[int]]] = {}
    flagged: dict[int, bool] = {}
    for doc_id, sig in ordered_docs:
        best = 0
        for b in range(n_bands):
            key = "_".join(
                str(sig[b * BAND_SIZE + j]) for j in range(BAND_SIZE)
            )
            occ = buckets.get((b, key))
            if occ is None:
                buckets[(b, key)] = (doc_id, sig)
            else:
                best = max(best, _sig_matches(sig, occ[1]))
        flagged[doc_id] = best >= SIG_MATCH_MIN
    return flagged
