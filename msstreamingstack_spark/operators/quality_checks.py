"""Declarative data-quality checks over any table — the deequ-style
constraint surface a production pipeline runs before promoting data.

Each check compiles to ONE aggregate expression, and a check suite
over a table fuses into a SINGLE scan + aggregate (no per-check jobs:
at 100 TB every extra pass is its own full-size job — same argument as
``observe()`` in streaming/pipeline.py, which is this module's
streaming twin). Uniqueness/FK checks need their own shuffle by
nature and are expressed as separate single-purpose aggregates.

Output contract (one row per check, stable column set):
  (table_name, check_name, n_violations, n_checked) —
n_violations == 0 ⇔ the constraint holds; consumers gate promotion on
``max(n_violations) == 0`` without parsing check-specific payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _report(
    df: DataFrame, table: str, check: str, violations: Column, checked: Column
) -> DataFrame:
    return df.agg(
        F.lit(table).alias("table_name"),
        F.lit(check).alias("check_name"),
        violations.cast("long").alias("n_violations"),
        checked.cast("long").alias("n_checked"),
    )


def check_not_null(df: DataFrame, table: str, col: str) -> DataFrame:
    return _report(
        df,
        table,
        f"not_null:{col}",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
        F.count("*"),
    )


def check_unique(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per duplicate key (so 0 ⇔
    the key is unique). One shuffle on the key — the minimum for a
    uniqueness proof."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("_n"))
        .agg(
            F.sum(F.col("_n") - 1).alias("_viol"),
            F.sum(F.col("_n")).alias("_checked"),
        )
    )
    return dup.select(
        F.lit(table).alias("table_name"),
        F.lit(f"unique:{','.join(cols)}").alias("check_name"),
        F.coalesce(F.col("_viol"), F.lit(0)).cast("long").alias("n_violations"),
        F.coalesce(F.col("_checked"), F.lit(0)).cast("long").alias("n_checked"),
    )


def check_in_range(
    df: DataFrame, table: str, col: str, lo: float, hi: float
) -> DataFrame:
    return _report(
        df,
        table,
        f"range:{col}",
        F.sum(
            F.when(
                F.col(col).isNotNull()
                & ((F.col(col) < lo) | (F.col(col) > hi)),
                1,
            ).otherwise(0)
        ),
        F.count("*"),
    )


def check_in_set(
    df: DataFrame, table: str, col: str, allowed: list[str]
) -> DataFrame:
    return _report(
        df,
        table,
        f"in_set:{col}",
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(allowed), 1
            ).otherwise(0)
        ),
        F.count("*"),
    )


def check_foreign_key(
    child: DataFrame,
    table: str,
    col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Orphan rows: child keys with no parent. Left-anti join — at
    scale the parent side is usually the small dimension and AQE
    broadcasts it; a same-size FK check shuffles both sides once."""
    orphans = child.join(
        parent.select(F.col(parent_col).alias(col)).distinct(), col, "left_anti"
    )
    total = child.select(F.count("*").alias("_n"))
    # both sides are 1-row aggregates; broadcast EXPLICITLY — relying
    # on AQE to notice saves nothing and a missed conversion would
    # cross-join two full shuffles (queries_analytics.py:361 pattern)
    return (
        orphans.agg(F.count("*").alias("_viol"))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit(table).alias("table_name"),
            F.lit(f"fk:{col}").alias("check_name"),
            F.col("_viol").cast("long").alias("n_violations"),
            F.col("_n").cast("long").alias("n_checked"),
        )
    )


def fused_row_checks(
    df: DataFrame, table: str, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Fuse many per-row checks into ONE scan+aggregate: ``checks`` is
    [(name, violation_predicate)]; the whole suite costs a single pass
    regardless of how many constraints it carries."""
    aggs = []
    for name, pred in checks:
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"v_{name}")
        )
    aggs.append(F.count("*").cast("long").alias("_checked"))
    wide = df.agg(*aggs)
    reports = None
    for name, _ in checks:
        r = wide.select(
            F.lit(table).alias("table_name"),
            F.lit(name).alias("check_name"),
            F.col(f"v_{name}").alias("n_violations"),
            F.col("_checked").alias("n_checked"),
        )
        reports = r if reports is None else reports.unionByName(r)
    return reports
