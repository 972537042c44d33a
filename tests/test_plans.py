"""Physical-plan shape tests — pin the 100 TB-relevant properties of
each operator family's plan: predicate pushdown to the parquet scan,
column pruning, broadcast of small sides, no Python in hot paths.

These are the ".explain and iterate" gate: a regression that silently
un-pushes a filter or turns a broadcast join into a shuffle fails here
even though correctness tests still pass.
"""

from __future__ import annotations

import pytest

from msstreamingstack_spark.plans.inspect import assert_scan_pruned, plan_facts
from msstreamingstack_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_q6_filters_reach_scan(spark):
    f = plan_facts(REGISTRY["tpch_q6_forecast_revenue"].builder(spark, SF))
    assert f.pushes_filter("GreaterThanOrEqual(l_shipdate")
    assert f.pushes_filter("LessThan(l_quantity,24.0)")
    assert f.pushes_filter("GreaterThanOrEqual(l_discount,0.04)")


def test_q6_scan_pruned_to_needed_columns(spark):
    df = REGISTRY["tpch_q6_forecast_revenue"].builder(spark, SF)
    assert_scan_pruned(
        df,
        must_read=["l_extendedprice", "l_discount"],
        must_not_read=["l_partkey", "l_returnflag", "l_orderkey"],
    )


def test_q3_dims_broadcast_and_filters_push(spark):
    f = plan_facts(REGISTRY["tpch_q3_building"].builder(spark, SF))
    assert f.broadcast_joins >= 1, f.text
    assert f.pushes_filter("EqualTo(c_mktsegment,BUILDING)")
    assert f.pushes_filter("GreaterThan(l_shipdate")


def test_q10_selective_pushdown(spark):
    f = plan_facts(REGISTRY["tpch_q10_returned_items"].builder(spark, SF))
    assert f.pushes_filter("EqualTo(l_returnflag,R)")
    assert f.broadcast_joins >= 2  # nation + customer/orders side


def test_range_join_is_broadcast_not_cartesian(spark):
    f = plan_facts(REGISTRY["range_join_price_bands"].builder(spark, SF))
    assert "BroadcastNestedLoopJoin" in f.text
    assert "CartesianProduct" not in f.text


def test_left_join_pushes_no_filter_to_preserved_side(spark):
    # left outer join: orders (preserved) scan must NOT get the
    # customer filter; broadcast on the dim side
    f = plan_facts(REGISTRY["join_left_orders_customer"].builder(spark, SF))
    assert f.broadcast_joins >= 1


def test_no_python_eval_in_relational_paths(spark):
    """Every relational/tpch/dedup query stays JVM-side end-to-end —
    Python appears only in explicitly-Python operators (multimodal
    features, SRP bucket UDF)."""
    for name, spec in REGISTRY.items():
        if name in (
            "multimodal_features",
            "similarity_ann_srp",
            "similarity_ann_ivf",
            "chunk_documents_udtf",
            "pandas_udaf_value_moments",
        ):
            continue
        if "streaming" in spec.tags:
            continue
        f = plan_facts(spec.builder(spark, SF))
        assert f.python_evals == 0, f"{name} has Python in the plan"


def test_scan_pruning_on_wide_documents(spark):
    # text_stats needs text/lang/source but not n_chars
    df = REGISTRY["text_stats"].builder(spark, SF)
    assert_scan_pruned(df, must_read=["text", "lang"], must_not_read=["n_chars"])


def test_sessionize_single_shuffle(spark):
    """Sessionization = one hash partition by user_id; window + derive
    reuse the same partitioning (no extra exchange)."""
    f = plan_facts(REGISTRY["sessionize_events"].builder(spark, SF))
    assert f.shuffles <= 2, f.text  # AQE counts logical+final exchange


@pytest.mark.parametrize("name", ["tpch_q1", "agg_events_stats"])
def test_aggregates_are_partial_then_final(spark, name):
    """Map-side combine present: HashAggregate appears above AND below
    the exchange (partial_ prefix in formatted plans)."""
    f = plan_facts(REGISTRY[name].builder(spark, SF))
    assert f.text.count("HashAggregate") >= 2
    assert "partial_" in f.text
