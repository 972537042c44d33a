"""Per-user state maintenance — batch-exact semantics of the
reference's stateful core (SURVEY.md §2.6 T1/T3/T4).

The reference keeps one mutable row per user in Redis and updates it
per event (RedisForeachWriter.scala:25-40, read back at
StructuredStreaming.scala:142-148):
  T1  last-value upsert of every tracked field;
  T3  conditional carries — cart amount / category only update on
      purchase events (``page_type = 'success'``,
      StructuredStreaming.scala:206-221), partner fields on change
      (:190-205, net effect = latest value);
  T4  each micro-batch splits events into first-seen users (cart
      seeded to 0, :175) vs returning users.

Batch formulation: ``groupBy(user).agg(max_by(col, total_order))`` —
ONE shuffle with map-side partial aggregation; no window sort needed.
``max_by`` needs a totally-ordered key, so ties are broken by the
unique event id folded into one long. The purchase-conditional carry
is a second, much smaller aggregate over the purchase subset,
left-joined back (both sides pre-aggregated ⇒ the join is on unique
keys and AQE broadcasts the smaller side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Total order for max_by: ts_sec * 10^9 + event_id. ts_sec ≈ 1.7e9 →
# product ≈ 1.7e18 < 2^63; event ids stay < 10^9 even at SF1000 of the
# driver generator (6e9 lineitem ⇒ 1e8 events).
ORDER_SCALE = 1_000_000_000


def total_order(ts_col: str = "ts_sec", id_col: str = "event_id") -> Column:
    return F.col(ts_col) * ORDER_SCALE + F.col(id_col)


def total_order_sql(ts_col: str = "ts_sec", id_col: str = "event_id") -> str:
    return f"{ts_col} * {ORDER_SCALE} + {id_col}"


def user_last_state(
    events: DataFrame,
    user_col: str = "user_id",
    purchase_pred: Column | None = None,
    last_cols: tuple[str, ...] = (),
    purchase_cols: tuple[str, ...] = (),
) -> DataFrame:
    """T1+T3 state table: one row per user.

    ``last_cols`` are carried as latest-value (T1); ``purchase_cols``
    update only on rows satisfying ``purchase_pred`` (T3), seeded with
    NULL when the user never purchased (callers coalesce — the
    reference seeds cart to "0").
    """
    ordk = total_order()
    base = events.groupBy(user_col).agg(
        F.min("ts_sec").alias("first_seen"),
        F.max("ts_sec").alias("msg_date"),
        F.count("*").alias("n_events"),
        *[F.max_by(F.col(c), ordk).alias(f"last_{c}") for c in last_cols],
    )
    if purchase_pred is None or not purchase_cols:
        return base
    purch = (
        events.filter(purchase_pred)
        .groupBy(user_col)
        .agg(
            F.max("ts_sec").alias("last_purchase_ts"),
            F.count("*").alias("n_purchases"),
            *[F.max_by(F.col(c), ordk).alias(f"purchase_{c}") for c in purchase_cols],
        )
    )
    return base.join(purch, on=user_col, how="left")


def flag_new_users(
    events: DataFrame,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts_sec", "event_id"),
    flag_col: str = "is_new",
) -> DataFrame:
    """T4: mark each user's first-ever event (the 'new user' branch,
    StructuredStreaming.scala:158-178); later events are 'returning'
    (:181-225). One window shuffle on the user key."""
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    return events.withColumn(flag_col, F.row_number().over(w) == 1)


def with_change_flags(
    events: DataFrame,
    cols: tuple[str, ...],
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts_sec", "event_id"),
) -> DataFrame:
    """T3 change detection: for each tracked column, expose the previous
    value and a changed flag (reference's partner_id/partner_name arms,
    StructuredStreaming.scala:190-205)."""
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    out = events
    for c in cols:
        prev = F.lag(c).over(w)
        out = out.withColumn(f"prev_{c}", prev).withColumn(
            f"{c}_changed", prev.isNotNull() & (prev != F.col(c))
        )
    return out
