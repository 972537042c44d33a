"""Unit tests for the reference-parity edge semantics (SURVEY.md §5.2):
device when-chain ordering/case, the strict 30-minute gap boundary,
init force-split, and the new-vs-returning split."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from msstreamingstack_spark.functions.expressions import classify_device
from msstreamingstack_spark.operators.sessionize import sessionize
from msstreamingstack_spark.operators.state import flag_new_users, user_last_state

MIN30 = 30 * 60


def _classify(spark, ua: str) -> str:
    df = spark.createDataFrame([Row(ua=ua)])
    return df.select(classify_device(F.col("ua")).alias("d")).head()["d"]


def test_device_chain_order_ipad_before_mac(spark):
    # iPad UAs contain "Mac OS X" — must classify as iPad, not iMac
    assert _classify(spark, "Mozilla (iPad; CPU OS like Mac OS X)") == "iPad"
    assert _classify(spark, "Mozilla (Macintosh; Intel Mac OS X)") == "iMac"


def test_device_chain_case_sensitive(spark):
    # reference pattern is lowercase %android% — uppercase must miss
    assert _classify(spark, "Linux; android 13") == "Android"
    assert _classify(spark, "Linux; ANDROID 13") == "Others"
    assert _classify(spark, "Windows NT 10.0") == "Windows PC"
    assert _classify(spark, "iPhone OS 16") == "iPhone"
    assert _classify(spark, "something else") == "Others"


def _sessionize_gaps(spark, gaps_and_types):
    """Build one user's events from (offset_sec, event_type) pairs."""
    rows = [
        Row(event_id=i, user_id=1, event_type=t, value=1.0, ts_sec=1_000_000 + off)
        for i, (off, t) in enumerate(gaps_and_types)
    ]
    df = spark.createDataFrame(rows)
    out = sessionize(df, init_col=(F.col("event_type") == "signup"))
    return [r["session_idx"] for r in out.orderBy("event_id").collect()]


def test_gap_boundary_strict(spark):
    # gap == exactly 30 min does NOT split (reference uses strict >,
    # StructuredStreaming.scala:186); 30min+1s does
    assert _sessionize_gaps(
        spark, [(0, "click"), (MIN30, "click")]
    ) == [1, 1]
    assert _sessionize_gaps(
        spark, [(0, "click"), (MIN30 + 1, "click")]
    ) == [1, 2]


def test_init_session_force_split(spark):
    # signup (init_session=true analogue) splits even with a tiny gap
    assert _sessionize_gaps(
        spark, [(0, "click"), (10, "signup"), (20, "click")]
    ) == [1, 2, 2]


def test_session_id_deterministic(spark):
    rows = [
        Row(event_id=0, user_id=7, event_type="click", value=1.0, ts_sec=5000),
        Row(event_id=1, user_id=7, event_type="click", value=1.0, ts_sec=5000 + MIN30 + 1),
    ]
    out = sessionize(spark.createDataFrame(rows)).orderBy("event_id").collect()
    assert out[0]["session_id"] == "7-5000"
    assert out[1]["session_id"] == f"7-{5000 + MIN30 + 1}"


def test_new_vs_returning_split(spark):
    rows = [
        Row(event_id=0, user_id=1, ts_sec=100),
        Row(event_id=1, user_id=1, ts_sec=200),
        Row(event_id=2, user_id=2, ts_sec=150),
    ]
    out = {
        (r["user_id"], r["event_id"]): r["is_new"]
        for r in flag_new_users(spark.createDataFrame(rows)).collect()
    }
    assert out == {(1, 0): True, (1, 1): False, (2, 2): True}


def test_purchase_conditional_carry(spark):
    # cart/category only move on purchase rows (T3); later non-purchase
    # events must not clobber them
    rows = [
        Row(event_id=0, user_id=1, ts_sec=100, event_type="purchase", value=9.5, category="3"),
        Row(event_id=1, user_id=1, ts_sec=200, event_type="click", value=77.0, category="8"),
        Row(event_id=2, user_id=2, ts_sec=100, event_type="click", value=5.0, category="1"),
    ]
    st = user_last_state(
        spark.createDataFrame(rows),
        purchase_pred=F.col("event_type") == "purchase",
        last_cols=("event_type", "value"),
        purchase_cols=("value", "category"),
    )
    by_user = {r["user_id"]: r for r in st.collect()}
    assert by_user[1]["purchase_value"] == 9.5  # not clobbered by click's 77.0
    assert by_user[1]["purchase_category"] == "3"
    assert by_user[1]["last_value"] == 77.0  # T1 last-value does move
    assert by_user[2]["purchase_value"] is None  # never purchased


def test_events_ts_dispatch_both_encodings(spark, tmp_path, sf_smoke):
    """events_with_time must produce identical ts_sec whether ts arrives
    as a parquet timestamp (the driver testdata's TIMESTAMP(MICROS),
    read as timestamp_ntz on Spark 4) or as int64 epoch-nanos (the
    paced generator's encoding). Guards the round-1 killer: trusting a
    conf (or a doc claim about the footer) over the read-back dtype."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from msstreamingstack_spark.sources.tables import events_with_time

    want = {
        r["event_id"]: r["ts_sec"]
        for r in events_with_time(spark, sf_smoke).collect()
    }
    assert want and all(v > 1_500_000_000 for v in want.values())

    # re-encode the same events with ts as int64 epoch-nanos
    t = pq.read_table(os.path.join(sf_smoke, "events.parquet"))
    ts_ns = pa.compute.cast(
        pa.compute.cast(t["ts"], pa.timestamp("ns")), pa.int64()
    )
    t2 = t.set_column(t.schema.get_field_index("ts"), "ts", ts_ns)
    longdir = tmp_path / "long_events"
    os.makedirs(longdir)
    pq.write_table(t2, longdir / "events.parquet")

    got = {
        r["event_id"]: r["ts_sec"]
        for r in events_with_time(spark, str(longdir)).collect()
    }
    assert got == want
