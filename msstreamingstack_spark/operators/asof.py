"""As-of (point-in-time) join — an operator the reference lacks but a
time-series engine of its shape needs (SURVEY.md §2.4 notes the gap;
the reference's stream⋈state join at StructuredStreaming.scala:151-155
is the degenerate "as of now" case).

Implementation is the union + sorted-window form, NOT a range-expanded
join:

    left(key, ts)  ─┐ union by key/ts, right rows sorted
    right(key, ts) ─┘ before ties → last(right_payload ignorenulls)
                      over (partition key order ts, side) → filter left

One shuffle on the key, one window pass, zero row multiplication — at
100 TB this is the only shape that survives: a naive
``l.ts >= r.ts`` range join explodes to |L|·|R| per key before
aggregation, while this is O(|L|+|R|) rows through a single sort.

Semantics: backward inclusive (the match is the right row with the
greatest ``right_ts <= left_ts``), equivalent to DuckDB's
``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``. Right rows must
be unique per (key, ts) for deterministic output — pre-aggregate the
right side (the query layer does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join, backward (default) or forward, optionally bounded.

    ``direction='backward'``: match = right row with the greatest
    ``right_ts <= left_ts`` (DuckDB ``ASOF ... ON l.ts >= r.ts``).
    ``direction='forward'``: match = right row with the smallest
    ``right_ts >= left_ts`` (comparator flipped) — "next reading
    at-or-after", the sensor-alignment / next-conversion shape.
    ``tolerance`` (same unit as the ts columns): a match farther than
    this from ``left_ts`` is nulled out, exactly pandas
    ``merge_asof(tolerance=...)`` semantics — the window pass still
    finds the nearest row; tolerance only decides whether it counts.

    Returns all ``left`` columns plus every non-key ``right`` column
    (null when no qualifying right row exists). ``right``'s timestamp
    column rides along, so callers see *when* the matched row
    happened. Same single-shuffle union+window plan in both
    directions — never a range-expanded join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_payload = [c for c in right.columns if c != on]
    payload_struct = F.struct(*[F.col(c) for c in right_payload])

    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(payload_struct.alias("p")).schema["p"].dataType
        ).alias("_r"),
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("l")
            ).schema["l"].dataType
        ).alias("_l"),
        payload_struct.alias("_r"),
    )

    u = l2.unionByName(r2)
    if direction == "backward":
        # right rows (side 0) sort before left at equal ts → inclusive
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last("_r", ignorenulls=True).over(w)
    else:
        # forward: left rows (side 1) sort before right at equal ts,
        # window looks ahead → the first right row at-or-after
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first("_r", ignorenulls=True).over(w)
    matched = u.withColumn("_m", pick).filter(F.col("_side") == 1)
    if tolerance is not None:
        within = (
            F.abs(F.col("_ts") - F.col(f"_m.{right_ts}")) <= tolerance
        )
        matched = matched.withColumn(
            "_m", F.when(within, F.col("_m"))
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(c) for c in right_payload
    ]
    return matched.select(*out_cols)
