"""MERGE INTO semantics as pure DataFrame algebra (lakehouse upsert).

Spark SQL only exposes ``MERGE INTO`` through table formats that
implement row-level operations (Delta/Iceberg); on plain parquet the
operation is still routinely needed — CDC application, dimension
upserts, GDPR deletes — and decomposes exactly into one full-outer
join plus row-wise case analysis:

- matched + delete-condition        → row dropped
- matched (else)                    → update columns applied
- source-only (WHEN NOT MATCHED)    → insert row
- target-only                       → unchanged row

That decomposition is what every MERGE implementation lowers to
(Delta's merge executes the same join under the hood), so expressing
it declaratively keeps Catalyst in charge: the join shuffles both
sides by key ONCE, the case analysis is a narrow projection, and at
100 TB the source side (a CDC batch) broadcasts when small. The
rewrite-the-table output model is parquet's contract (no row-level
ops) — partition-overwrite bounds the rewrite in production.

Determinism: the case analysis is pure column algebra (no rounding,
no floats introduced); a duplicate-key SOURCE is rejected up front
(count check) because MERGE semantics are undefined under source
duplicates (Delta raises the same error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attr: str,
    change_ts_col: str,
    valid_from: str = "valid_from_sec",
    valid_to: str = "valid_to_sec",
    current: str = "is_current",
    open_end_sec: int = 253_402_300_799,
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension (close-and-insert).

    The INCREMENTAL counterpart of building SCD2 history from scratch
    (queries_analytics.scd2_device_runs): the dimension's CURRENT rows
    full-outer-join the one-row-per-key change batch, then

    - attr changed   → current row CLOSED (valid_to = change ts,
      is_current false) + a NEW current row opened at the change ts
    - attr unchanged → current row passes through untouched (no
      spurious version — the no-op-update guard real SCD2 loaders
      need)
    - key new        → inserted as a current row
    - historical (non-current) rows pass through unjoined.

    One key shuffle for the join; the historical partition never
    shuffles at all (union only) — at 100 TB the history dwarfs the
    current set, so not moving it is the whole design. ``changes``
    must be one row per key (pre-aggregate your CDC feed to the
    latest change — same contract as :func:`merge_upsert`)."""
    if (
        changes.groupBy(key).count().filter(F.col("count") > 1).limit(1)
    ).count() > 0:
        raise DuplicateSourceKeyError(
            f"change batch has duplicate keys on '{key}'"
        )
    cur = dim.filter(F.col(current))
    hist = dim.filter(~F.col(current))
    out_cols = [key, attr, valid_from, valid_to, current]
    ch = changes.select(
        F.col(key).alias("__ck"),
        F.col(attr).alias("__new_attr"),
        F.col(change_ts_col).alias("__ts"),
    )
    j = cur.join(ch, cur[key] == ch["__ck"], "full_outer")
    matched = cur[key].isNotNull() & F.col("__ck").isNotNull()
    changed = matched & (F.col("__new_attr") != cur[attr])
    key_new = cur[key].isNull()
    closed = j.filter(changed).select(
        cur[key].alias(key),
        cur[attr].alias(attr),
        cur[valid_from].alias(valid_from),
        F.col("__ts").alias(valid_to),
        F.lit(False).alias(current),
    )
    opened = j.filter(changed | key_new).select(
        F.coalesce(cur[key], F.col("__ck")).alias(key),
        F.col("__new_attr").alias(attr),
        F.col("__ts").alias(valid_from),
        # open-ended rows carry the classic SCD2 high-date sentinel
        # (9999-12-31) rather than NULL: a nullable long round-trips
        # through Arrow/pandas as float64, which breaks cross-engine
        # value hashing AND range predicates on the column
        F.lit(open_end_sec).cast("long").alias(valid_to),
        F.lit(True).alias(current),
    )
    untouched = j.filter(~changed & cur[key].isNotNull()).select(
        *[cur[c].alias(c) for c in out_cols]
    )
    return (
        hist.select(*out_cols)
        .unionByName(untouched)
        .unionByName(closed)
        .unionByName(opened)
    )


class DuplicateSourceKeyError(ValueError):
    """Source has multiple rows per merge key — MERGE is undefined."""


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: dict[str, Column],
    delete_cond: Column | None = None,
    check_source_unique: bool = True,
) -> DataFrame:
    """Apply MERGE semantics and return the post-merge frame.

    ``update_cols``: target column name → expression over the joined
    row (reference source columns via ``F.col("s_<name>")`` — source
    columns are prefixed to avoid capture). Rows present only in the
    source are inserted with the source's values for every target
    column it shares (same-named, un-prefixed in the source schema).
    ``delete_cond``: evaluated on matched rows; True → row dropped.
    """
    if check_source_unique:
        dup = (
            source.groupBy(key).count().filter(F.col("count") > 1).limit(1)
        )
        if dup.count() > 0:
            raise DuplicateSourceKeyError(
                f"source has duplicate merge keys on '{key}'"
            )
    s = source.select(
        F.col(key).alias("__sk"),
        *[
            F.col(c).alias(f"s_{c}")
            for c in source.columns
            if c != key
        ],
    )
    j = target.join(s, target[key] == s["__sk"], "full_outer")
    matched = target[key].isNotNull() & F.col("__sk").isNotNull()
    source_only = target[key].isNull()
    if delete_cond is not None:
        j = j.filter(~(matched & delete_cond))
    out_cols = []
    for c in target.columns:
        src_val = (
            F.col(f"s_{c}") if f"s_{c}" in j.columns else F.lit(None)
        )
        if c == key:
            expr = F.when(source_only, F.col("__sk")).otherwise(target[key])
        elif c in update_cols:
            expr = (
                F.when(matched, update_cols[c])
                .when(source_only, src_val)
                .otherwise(target[c])
            )
        else:
            expr = F.when(source_only, src_val).otherwise(target[c])
        out_cols.append(expr.alias(c))
    return j.select(*out_cols)
