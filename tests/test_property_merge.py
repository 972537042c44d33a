"""Property test: merge_upsert vs a plain-Python MERGE model on
random small target/source frames — update, source-flagged delete,
insert, and passthrough interleave freely; the algebra must match the
model row-for-row (no floats involved, so equality is exact)."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from msstreamingstack_spark.operators.merge import merge_upsert

KEYS = list(range(8))

target_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)
source_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["x", "y"]),
        st.integers(min_value=200, max_value=300),
        st.booleans(),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)


def _model(target, source):
    src = {k: (name, bal, dele) for k, name, bal, dele in source}
    out = {}
    for k, name, bal in target:
        if k in src:
            s_name, s_bal, s_del = src[k]
            if s_del:
                continue  # matched + delete condition
            out[k] = (name, s_bal)  # bal updated, name untouched
        else:
            out[k] = (name, bal)
    for k, (s_name, s_bal, s_del) in src.items():
        if all(t[0] != k for t in target):
            out[k] = (s_name, s_bal)  # insert (delete flag irrelevant)
    return out


@given(target_strategy, source_strategy)
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_merge_matches_python_model(spark, target, source):
    t = spark.createDataFrame(
        target or [(99, "zz", -1)], "id long, name string, bal long"
    )
    if not target:
        t = t.filter(F.lit(False))
    s = spark.createDataFrame(
        source or [(99, "zz", -1, False)],
        "id long, name string, bal long, is_delete boolean",
    )
    if not source:
        s = s.filter(F.lit(False))
    got = {
        r["id"]: (r["name"], r["bal"])
        for r in merge_upsert(
            t,
            s,
            key="id",
            update_cols={"bal": F.col("s_bal")},
            delete_cond=F.col("s_is_delete"),
        ).collect()
    }
    assert got == _model(target, source)
