"""Sessionization — batch-exact semantics of the reference's T2.

The reference opens a new session when (StructuredStreaming.scala
:159-166 new-user branch, :182-189 update branch):
  * the user has never been seen (no prior state), OR
  * the inactivity gap exceeds 30 minutes —
    ``(message_date - msg_date)/60 > 30`` (strict >), OR
  * the event carries ``init_session = true`` (force-split).
Otherwise the previous session id is carried forward.

Batch-exact formulation (single shuffle on the user key):
  lag(ts) over (user, time-order)  → gap
  is_new = first-event ∨ gap > threshold ∨ init
  session_idx = running sum of is_new        (ROWS frame)
  session_id  = <user>-<min ts of session>   (deterministic; F5)

The second window (session start) partitions by (user, session_idx) —
a prefix-compatible key, so Catalyst reuses the exchange from the
first window: ONE shuffle total. At 100 TB this is shuffle-bound on
the user key; skewed users are handled by AQE skew splitting being
irrelevant here (window, not join) — monstrously hot single users are
the real risk and would need per-user sub-bucketing by day, noted in
plans/notes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from msstreamingstack_spark.functions.expressions import session_id_expr

DEFAULT_GAP_SEC = 30 * 60  # reference: 30 minutes, strict >


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    order_cols: tuple[str, ...] = ("ts_sec", "event_id"),
    gap_sec: int = DEFAULT_GAP_SEC,
    init_col: str | Column | None = None,
    out_idx: str = "session_idx",
    out_id: str = "session_id",
) -> DataFrame:
    """Stamp each row with ``session_idx`` (per-user, 1-based, long) and
    a deterministic ``session_id``.

    ``order_cols`` must be a total order within user (include a unique
    tiebreaker column — timestamps alone can collide).
    ``init_col`` optionally force-splits (reference's ``init_session``).
    """
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_ts = F.lag(ts_col).over(w)
    is_new = prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > F.lit(gap_sec))
    if init_col is not None:
        init = F.col(init_col) if isinstance(init_col, str) else init_col
        is_new = is_new | init
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn(out_idx, F.sum(is_new.cast("long")).over(run))
    w_sess = Window.partitionBy(user_col, out_idx)
    start = F.min(ts_col).over(w_sess)
    return out.withColumn(out_id, session_id_expr(F.col(user_col), start))


def sessionize_bucketed(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    order_cols: tuple[str, ...] = ("ts_sec", "event_id"),
    gap_sec: int = DEFAULT_GAP_SEC,
    init_col: str | Column | None = None,
    bucket_sec: int = 86_400,
    out_idx: str = "session_idx",
    out_id: str = "session_id",
) -> DataFrame:
    """Skew-bounded sessionization: IDENTICAL output to
    :func:`sessionize`, but the event-sized shuffle is keyed
    ``(user, time-bucket)`` instead of ``user`` — a monstrously hot
    user (bot traffic) is spread over days, so no single partition can
    exceed one user-day of events. This is the mitigation
    plans/notes.md promised, made real and equality-tested.

    Mechanics: sessionize within each (user, bucket) as usual, then
    stitch across bucket boundaries with a per-(user, bucket) SUMMARY
    pass (one tiny row per user-day): the first bucket-local session
    merges into the previous bucket's last session iff the boundary
    gap is within ``gap_sec`` and the bucket's first event is not an
    init split — exactly the conditions under which the unbucketed
    scan would NOT have started a new session. Global indices are the
    running sum of per-bucket session STARTS (local sessions minus
    merges), so chains of merges across many buckets (bucket_sec <
    gap_sec works too) compose correctly.

    Cost: two event-sized shuffles ((user, bucket) window; (user,
    global idx) session-id window) instead of one — the price of the
    skew bound. The summary pass shuffles one row per user-day.
    """
    init = (
        (F.col(init_col) if isinstance(init_col, str) else init_col)
        if init_col is not None
        else F.lit(False)
    )
    bucket = (F.col(ts_col) / bucket_sec).cast("long")
    ev = df.withColumn("_bkt", bucket).withColumn("_init", init.cast("boolean"))

    # 1. bucket-local sessionize (the skew-bounded event shuffle)
    w_b = Window.partitionBy(user_col, "_bkt").orderBy(*order_cols)
    prev_ts = F.lag(ts_col).over(w_b)
    is_new = (
        prev_ts.isNull()
        | ((F.col(ts_col) - prev_ts) > F.lit(gap_sec))
        | F.col("_init")
    )
    run = w_b.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = ev.withColumn("_lidx", F.sum(is_new.cast("long")).over(run))

    # 2. per-(user, bucket) summary: one tiny row per user-day.
    #    groupBy key is prefix-compatible with the window partitioning.
    order_struct = F.struct(*[F.col(c) for c in order_cols])
    summary = ev.groupBy(user_col, "_bkt").agg(
        F.max("_lidx").alias("_nloc"),
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
        F.min_by("_init", order_struct).alias("_first_init"),
    )
    w_u = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last = F.lag("_last_ts").over(w_u)
    merge = (
        prev_last.isNotNull()
        & ((F.col("_first_ts") - prev_last) <= F.lit(gap_sec))
        & ~F.col("_first_init")
    ).cast("long")
    summary = summary.withColumn("_merge", merge).withColumn(
        "_base",
        F.coalesce(
            F.sum(F.col("_nloc") - F.col("_merge")).over(
                w_u.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    # 3. stitch: global idx = starts before this bucket + local - merge
    out = ev.join(
        summary.select(user_col, "_bkt", "_merge", "_base"),
        [user_col, "_bkt"],
    ).withColumn(out_idx, F.col("_base") + F.col("_lidx") - F.col("_merge"))
    w_sess = Window.partitionBy(user_col, out_idx)
    start = F.min(ts_col).over(w_sess)
    return (
        out.withColumn(out_id, session_id_expr(F.col(user_col), start))
        .drop("_bkt", "_init", "_lidx", "_merge", "_base")
    )


def sessionize_oracle_sql(
    events_cte: str,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    order_sql: str = "ts_sec, event_id",
    gap_sec: int = DEFAULT_GAP_SEC,
    init_pred: str | None = None,
    select_cols: str = "*",
    strict_gt: bool = True,
) -> str:
    """DuckDB SQL twin of :func:`sessionize` over a CTE named ``e``.

    ``strict_gt`` selects the split predicate. The default strict
    ``>`` matches BOTH the reference (StructuredStreaming.scala:186)
    AND Spark's native ``session_window`` (its merge-overlap rule is
    inclusive, so an event exactly at ``prev + gap`` merges). ``>=``
    is kept for engines/specs that close sessions at the boundary.
    """
    cmp = ">" if strict_gt else ">="
    init = f" OR ({init_pred})" if init_pred else ""
    return f"""
WITH e AS ({events_cte}),
lagged AS (
  SELECT *,
         lag({ts_col}) OVER (PARTITION BY {user_col} ORDER BY {order_sql}) AS prev_ts
  FROM e
),
flagged AS (
  SELECT *,
         CASE WHEN prev_ts IS NULL OR {ts_col} - prev_ts {cmp} {gap_sec}{init} THEN 1 ELSE 0 END AS is_new
  FROM lagged
),
idx AS (
  SELECT *,
         CAST(SUM(is_new) OVER (PARTITION BY {user_col} ORDER BY {order_sql} ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT {select_cols},
       CAST({user_col} AS VARCHAR) || '-' ||
       CAST(MIN({ts_col}) OVER (PARTITION BY {user_col}, session_idx) AS VARCHAR) AS session_id
FROM idx
"""
