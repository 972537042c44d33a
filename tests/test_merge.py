"""MERGE algebra semantics on hand-built frames: each clause (update,
insert, source-flagged delete, untouched passthrough) and the
duplicate-source-key guard. Oracle parity for the registry query is
covered by test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from msstreamingstack_spark.operators.merge import (
    DuplicateSourceKeyError,
    merge_upsert,
)


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )
    source = spark.createDataFrame(
        [
            (2, "b2", 200.0, False),  # matched → update bal
            (3, "c2", 300.0, True),   # matched + delete flag → drop
            (9, "new", 90.0, False),  # not matched → insert
        ],
        "id long, name string, bal double, is_delete boolean",
    )
    return target, source


def test_merge_clauses(spark, frames):
    target, source = frames
    out = {
        r["id"]: (r["name"], r["bal"])
        for r in merge_upsert(
            target,
            source,
            key="id",
            update_cols={"bal": F.col("s_bal")},
            delete_cond=F.col("s_is_delete"),
        ).collect()
    }
    assert out == {
        1: ("a", 10.0),     # untouched passthrough
        2: ("b", 200.0),    # bal updated, name NOT in update_cols → kept
        9: ("new", 90.0),   # inserted with source values
    }  # 3 deleted


def test_merge_without_delete_cond_keeps_matched(spark, frames):
    target, source = frames
    out = merge_upsert(
        target, source, key="id", update_cols={"bal": F.col("s_bal")}
    )
    assert {r["id"] for r in out.collect()} == {1, 2, 3, 9}


def test_merge_duplicate_source_key_raises(spark, frames):
    target, _ = frames
    dup = spark.createDataFrame(
        [(2, 1.0), (2, 2.0)], "id long, bal double"
    )
    with pytest.raises(DuplicateSourceKeyError):
        merge_upsert(target, dup, key="id", update_cols={})


HIGH = 253_402_300_799


def test_scd2_apply_clauses(spark):
    from msstreamingstack_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "ios", 100, HIGH, True),      # will change → close+open
            (2, "android", 100, HIGH, True),  # same attr → untouched
            (3, "web", 100, HIGH, True),      # no change row → untouched
            (1, "web", 50, 100, False),       # history → passthrough
        ],
        "user_id long, device string, valid_from_sec long, "
        "valid_to_sec long, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "mac", 200), (2, "android", 250), (9, "ios", 300)],
        "user_id long, device string, change_ts long",
    )
    rows = {
        (r["user_id"], r["device"], r["valid_from_sec"]): (
            r["valid_to_sec"],
            r["is_current"],
        )
        for r in scd2_apply(
            dim, changes, "user_id", "device", "change_ts"
        ).collect()
    }
    assert rows == {
        (1, "web", 50): (100, False),     # history untouched
        (1, "ios", 100): (200, False),    # closed at change ts
        (1, "mac", 200): (HIGH, True),    # new current version
        (2, "android", 100): (HIGH, True),  # no-op update guard
        (3, "web", 100): (HIGH, True),    # unchanged key
        (9, "ios", 300): (HIGH, True),    # new key inserted
    }


def test_scd2_apply_duplicate_change_keys_raise(spark):
    from msstreamingstack_spark.operators.merge import (
        DuplicateSourceKeyError,
        scd2_apply,
    )

    dim = spark.createDataFrame(
        [(1, "ios", 100, HIGH, True)],
        "user_id long, device string, valid_from_sec long, "
        "valid_to_sec long, is_current boolean",
    )
    dup = spark.createDataFrame(
        [(1, "mac", 200), (1, "web", 300)],
        "user_id long, device string, change_ts long",
    )
    with pytest.raises(DuplicateSourceKeyError):
        scd2_apply(dim, dup, "user_id", "device", "change_ts")
