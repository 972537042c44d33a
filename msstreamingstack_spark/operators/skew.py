"""Skew mitigation operators: salted aggregation and salted join.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew at runtime, but two shapes still need explicit salting at 100 TB:

1. A grouped aggregate where one key holds a large share of all rows —
   partial aggregation helps only when upstream partitions mix keys;
   after a shuffle ON the hot key, one reducer owns it all. Salting
   splits the hot key across ``n_salts`` reducers and re-combines.
2. A shuffle join with a hot probe-side key that AQE can't split
   (e.g. when the build side must broadcast per-salt replicas).

Both transforms are RESULT-IDENTICAL to their unsalted forms — the
salt never appears in the output — so they are oracle-checked against
the plain SQL equivalents (queries_advanced.py).

Salt derivation is deterministic (hash of a high-cardinality column,
never rand()): retries and speculative tasks must route a row to the
same salt bucket, and the DuckDB comparison needs run-stable output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 8


def _salt_col(spread_col: str, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    key: str,
    value_col: str,
    spread_col: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage salted aggregate: sum/count per ``key``.

    Stage 1 shuffles on (key, salt) — a hot key occupies ``n_salts``
    reducers instead of one; stage 2 combines the ≤ n_salts partial
    rows per key (tiny). Result ≡ ``df.groupBy(key).agg(sum, count)``.
    """
    partial = (
        df.withColumn("_salt", _salt_col(spread_col, n_salts))
        .groupBy(key, "_salt")
        .agg(
            F.sum(F.col(value_col).cast("decimal(25,6)")).alias("_psum"),
            F.count("*").alias("_pcnt"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias("sum_value"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    spread_col: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the
    right side replicated ``n_salts``× — a hot left key spreads over
    ``n_salts`` reducers. Result ≡ ``left.join(right, key)``.

    Replication cost is |right| × n_salts, so this fits dim-sized
    right sides that are just over the broadcast threshold; for truly
    large right sides, AQE skew splitting is the tool instead.
    """
    salted_l = left.withColumn("_salt", _salt_col(spread_col, n_salts))
    replicated_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_l.join(
        replicated_r,
        (F.col(left_key) == F.col(right_key)) & (salted_l["_salt"] == replicated_r["_salt"]),
    )
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Skew diagnostic for a prospective shuffle key: row/key counts,
    the heaviest key's share, and the skew factor (max-key rows vs the
    even-split ideal). This is the measurement that justifies — or
    vetoes — salting (this module), (key, bucket) windows
    (operators/windows.py, sessionize_bucketed), or AQE skew-join
    reliance before a job ships. Two tiny aggregations; output is one
    row, so the profile is free next to any real query on the table.
    """
    per_key = df.groupBy(key_col).agg(F.count("*").alias("_n"))
    return per_key.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("_n").cast("long").alias("max_key_rows"),
        F.round(
            F.max("_n").cast("double") * F.count("*") / F.sum("_n"), 9
        ).alias("skew_factor"),
    )
