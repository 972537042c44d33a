"""Property tests for the packing and gap-fill operators against
single-threaded Python models — boundary conditions (doc exactly at
capacity, oversize docs, single-bucket users, all-gap spines) land
here without hand-picking cases."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F, Window


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis needs a non-function-scoped fixture
    return spark

CAPACITY = 16

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1"]),            # source shard
        st.integers(min_value=1, max_value=40),   # n_tokens (can exceed cap)
    ),
    min_size=1,
    max_size=30,
)


def _pack_model(rows):
    """Greedy packing reference: per source in doc_id order, chunk =
    floor(pre-document running total / capacity)."""
    chunks: dict[tuple, dict] = {}
    run: dict[str, int] = {}
    for doc_id, (src, n) in enumerate(rows):
        pre = run.get(src, 0)
        idx = math.floor(pre / CAPACITY)
        run[src] = pre + n
        c = chunks.setdefault((src, idx), {"n_docs": 0, "tokens": 0})
        c["n_docs"] += 1
        c["tokens"] += n
    return chunks


@given(docs_strategy)
@settings(max_examples=12, deadline=None)
def test_packing_matches_python_model(spark_session_holder, rows):
    spark = spark_session_holder
    df = spark.createDataFrame(
        [(doc_id, src, n) for doc_id, (src, n) in enumerate(rows)],
        "doc_id long, source string, n_tokens long",
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r["source"], r["chunk_idx"]): {"n_docs": r["n_docs"], "tokens": r["tokens"]}
        for r in df.withColumn(
            "chunk_idx",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / CAPACITY
            ).cast("bigint"),
        )
        .groupBy("source", "chunk_idx")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("tokens"))
        .collect()
    }
    assert got == _pack_model(rows)


points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # user
        st.integers(min_value=0, max_value=30),   # bucket
        st.floats(min_value=0, max_value=9, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


def _ffill_model(rows):
    """Forward-fill reference: dense spine per user between min and
    max observed bucket; value = last observation at or before."""
    last = {}
    for u, b, v in rows:  # later rows win within a (u, b) — max_by ts
        last[(u, b)] = v
    out = {}
    users = {u for u, _, _ in rows}
    for u in users:
        bs = [b for (uu, b) in last if uu == u]
        cur = None
        for b in range(min(bs), max(bs) + 1):
            if (u, b) in last:
                cur = last[(u, b)]
            out[(u, b)] = (cur, (u, b) not in last)
    return out


@given(points_strategy)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_gapfill_matches_python_model(spark_session_holder, rows):
    spark = spark_session_holder
    # dedupe (u, b) keeping the last generated value, mirroring max_by
    df = spark.createDataFrame(
        [(u, b, v, i) for i, (u, b, v) in enumerate(rows)],
        "user_id long, bucket long, v double, seq long",
    )
    b = df.groupBy("user_id", "bucket").agg(F.max_by("v", "seq").alias("v"))
    spine = (
        b.groupBy("user_id")
        .agg(F.min("bucket").alias("min_b"), F.max("bucket").alias("max_b"))
        .select("user_id", F.explode(F.sequence("min_b", "max_b")).alias("bucket"))
    )
    joined = spine.join(b, ["user_id", "bucket"], "left").withColumn(
        "grp",
        F.count("v").over(
            Window.partitionBy("user_id")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_fill = Window.partitionBy("user_id", "grp").orderBy("bucket")
    got = {
        (r["user_id"], r["bucket"]): (r["v_filled"], r["was_gap"])
        for r in joined.select(
            "user_id",
            "bucket",
            F.first("v", ignorenulls=True).over(w_fill).alias("v_filled"),
            F.col("v").isNull().alias("was_gap"),
        ).collect()
    }
    want = {
        k: (v if v is not None else None, gap) for k, (v, gap) in _ffill_model(rows).items()
    }
    assert got == want
