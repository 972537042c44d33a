"""Data-quality checks must count planted violations exactly and fuse
per-row suites into one scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from msstreamingstack_spark.operators.quality_checks import (
    check_foreign_key,
    check_in_range,
    check_in_set,
    check_not_null,
    check_unique,
    fused_row_checks,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_planted_violations_counted_exactly(spark):
    child = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (2, None, 11.0), (3, "zz", 7.0)],
        ["k", "cat", "x"],
    )
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])

    r = _one(check_unique(child, "t", ["k"]))
    assert (r["n_violations"], r["n_checked"]) == (1, 4)  # k=1 twice

    r = _one(check_not_null(child, "t", "cat"))
    assert (r["n_violations"], r["n_checked"]) == (1, 4)

    r = _one(check_in_range(child, "t", "x", 0.0, 10.0))
    assert (r["n_violations"], r["n_checked"]) == (2, 4)  # -2 and 11

    r = _one(check_in_set(child, "t", "cat", ["a", "b"]))
    assert (r["n_violations"], r["n_checked"]) == (1, 4)  # zz; null skipped

    r = _one(check_foreign_key(child, "t", "k", parent, "pk"))
    assert (r["n_violations"], r["n_checked"]) == (1, 4)  # k=3 orphan


def test_fused_suite_single_scan(spark):
    df = spark.createDataFrame(
        [(None, 5.0), ("a", -1.0), ("b", 2.0)], ["cat", "x"]
    )
    rep = fused_row_checks(
        df,
        "t",
        [
            ("not_null:cat", F.col("cat").isNull()),
            ("nonneg:x", F.col("x") < 0),
        ],
    )
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    assert got == {"not_null:cat": 1, "nonneg:x": 1}
    assert all(r["n_checked"] == 3 for r in rep.collect())
    # one scan: the physical plan contains exactly one aggregate over
    # the source (the union branches read the SAME aggregated result)
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") <= 2 or "Aggregate" in plan


def test_clean_fixture_tables_pass_all_checks(spark, sf_correctness):
    from msstreamingstack_spark.queries import REGISTRY

    rep = REGISTRY["dq_report"].builder(spark, sf_correctness).collect()
    assert len(rep) == 5
    assert all(r["n_violations"] == 0 for r in rep), rep
    assert all(r["n_checked"] > 0 for r in rep)
