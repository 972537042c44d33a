"""Bucketed co-located join: pre-bucketing both sides of a recurring
join key eliminates the per-query shuffle entirely — THE tool for a
100 TB fact table joined on the same key by every query. Demonstrated
and pinned here: the bucketed join plan contains NO shuffle exchange,
while the identical unbucketed join does."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from msstreamingstack_spark.plans.inspect import plan_facts
from msstreamingstack_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    # tables are external (explicit path) — no warehouse-dir needed
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join(spark, left_name, right_name):
    lhs = spark.table(left_name)
    rhs = spark.table(right_name)
    return (
        lhs.join(rhs, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # disable auto-broadcast so the join strategy (not dim size)
    # decides, as it would at fact-to-fact scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        f = plan_facts(_join(spark, orders_b, lineitem_b))
        # the join itself is exchange-free: only the final groupBy
        # aggregation may shuffle
        assert "SortMergeJoin" in f.text
        join_part = f.text.split("HashAggregate")[0]
        assert "Exchange" not in join_part, f.text
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_both_sides(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF, "orders")
        li = load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        f = plan_facts(
            orders.join(li, "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert f.shuffles >= 2, f.text
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_unbucketed(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    got = {r.o_orderstatus: r.n for r in _join(spark, orders_b, lineitem_b).collect()}
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    want = {
        r.o_orderstatus: r.n
        for r in orders.join(li, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
