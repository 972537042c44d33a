"""Property tests for the round-7 skew-decomposition kernels
(operators/windows.py): on random data with random bucket/salt
granularity, each twin must be BIT-identical to the plain
single-window form — the exactness claims (long partials re-add
exactly; row_number under a total order is deterministic; the global
top-k of a union is in the union of per-part top-ks) hold for every
input, not just the fixtures."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import Window, functions as F

from msstreamingstack_spark.operators.windows import (
    bucketed_percent_rank,
    bucketed_running_sum,
    topk_per_key_salted,
)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis needs a non-function-scoped fixture
    return spark


rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # hot-ish key
        st.integers(min_value=0, max_value=50),    # order / bucket feed
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    # rid is the unique tiebreaker that makes every order total
    return spark.createDataFrame(
        [(k, o, v, i) for i, (k, o, v) in enumerate(rows)],
        ["k", "o", "v", "rid"],
    )


@settings(max_examples=25, deadline=None)
@given(rows=rows_strategy, bucket_width=st.sampled_from([1, 4, 16, 1000]))
def test_bucketed_running_sum_matches_window(
    spark_session_holder, rows, bucket_width
):
    spark = spark_session_holder
    df = _df(spark, rows)
    w = (
        Window.partitionBy("k")
        .orderBy("o", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = df.withColumn("run", F.sum(F.col("v").cast("long")).over(w))
    twin = bucketed_running_sum(
        df,
        "k",
        ("o", "rid"),
        "v",
        F.floor(F.col("o") / bucket_width),
        out="run",
        prec="long",
    )
    assert sorted(map(tuple, plain.select("rid", "run").collect())) == sorted(
        map(tuple, twin.select("rid", "run").collect())
    )


@settings(max_examples=25, deadline=None)
@given(rows=rows_strategy, bucket_width=st.sampled_from([1, 4, 16, 1000]))
def test_bucketed_percent_rank_matches_window(
    spark_session_holder, rows, bucket_width
):
    spark = spark_session_holder
    df = _df(spark, rows)
    w = Window.partitionBy("k").orderBy("o", "rid")
    plain = df.withColumn("pr", F.percent_rank().over(w))
    twin = bucketed_percent_rank(
        df, "k", ("o", "rid"), F.floor(F.col("o") / bucket_width), out="pr"
    )
    assert sorted(map(tuple, plain.select("rid", "pr").collect())) == sorted(
        map(tuple, twin.select("rid", "pr").collect())
    )


@settings(max_examples=25, deadline=None)
@given(
    rows=rows_strategy,
    k=st.sampled_from([1, 3, 7]),
    p=st.sampled_from([1, 2, 64]),
)
def test_topk_per_key_salted_matches_window(
    spark_session_holder, rows, k, p
):
    spark = spark_session_holder
    df = _df(spark, rows)
    w = Window.partitionBy("k").orderBy(F.col("o").desc(), F.col("rid"))
    plain = df.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    twin = topk_per_key_salted(
        df,
        ("k",),
        (F.col("o").desc(), F.col("rid")),
        k,
        F.col("rid"),
        out="rn",
        p=p,
    )
    assert sorted(
        map(tuple, plain.select("rid", "rn").collect())
    ) == sorted(map(tuple, twin.select("rid", "rn").collect()))
