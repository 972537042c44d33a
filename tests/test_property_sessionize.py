"""Property-based test: the distributed sessionizer must agree with a
trivially-correct single-threaded Python model on arbitrary event
streams — boundary conditions (gap exactly at threshold, simultaneous
events, init force-splits, single-event users) land here without
hand-picking cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from msstreamingstack_spark.operators.sessionize import sessionize

GAP = 100  # small gap keeps generated timestamps interesting

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id
        st.integers(min_value=0, max_value=1000),   # ts_sec
        st.booleans(),                               # init flag
    ),
    min_size=1,
    max_size=40,
)


def _model(rows):
    """Reference implementation: per user, time-ordered scan."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, (u, ts, init) in enumerate(rows):
        by_user.setdefault(u, []).append((ts, eid, init))
    for u, evs in by_user.items():
        evs.sort()  # (ts, event_id) total order — matches order_cols
        prev_ts, idx = None, 0
        for ts, eid, init in evs:
            if prev_ts is None or (ts - prev_ts) > GAP or init:
                idx += 1
            out[eid] = idx
            prev_ts = ts
    return out


@given(events_strategy)
@settings(max_examples=12, deadline=None)
def test_sessionize_matches_python_model(spark_session_holder, rows):
    spark = spark_session_holder
    df = spark.createDataFrame(
        [(eid, u, ts, init) for eid, (u, ts, init) in enumerate(rows)],
        ["event_id", "user_id", "ts_sec", "init"],
    )
    got = {
        r.event_id: r.session_idx
        for r in sessionize(
            df, gap_sec=GAP, init_col=F.col("init")
        ).collect()
    }
    assert got == _model(rows)


# hypothesis needs a non-function-scoped fixture: reuse the session
# fixture through a module-level holder
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


def test_bucketed_equals_plain_on_fixture(spark):
    """Day- and hour-bucketed sessionization must equal the unbucketed
    scan exactly on the sf0.01 events (10k rows incl. signup splits)."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.operators.sessionize import (
        sessionize,
        sessionize_bucketed,
    )
    from msstreamingstack_spark.sources.tables import events_with_time

    ev = events_with_time(spark, "/root/testdata/sf0.01").select(
        "event_id", "user_id", "event_type", "ts_sec"
    )
    init = F.col("event_type") == "signup"

    def key(df):
        return sorted(
            (r["event_id"], r["session_idx"], r["session_id"])
            for r in df.collect()
        )

    want = key(sessionize(ev, init_col=init))
    assert key(sessionize_bucketed(ev, init_col=init)) == want
    assert key(sessionize_bucketed(ev, init_col=init, bucket_sec=3600)) == want


def test_bucketed_midnight_boundary_cases(spark):
    """Three crafted users around a bucket boundary (midnight = ts
    86400): gap within threshold stitches across the boundary, gap
    beyond it splits, and an init event just after the boundary splits
    even at zero gap."""
    from pyspark.sql import Row, functions as F

    from msstreamingstack_spark.operators.sessionize import (
        sessionize,
        sessionize_bucketed,
    )

    mid = 86_400
    rows = [
        # user 1: 10 min across midnight → one session
        Row(event_id=1, user_id=1, event_type="view", ts_sec=mid - 300),
        Row(event_id=2, user_id=1, event_type="view", ts_sec=mid + 300),
        # user 2: 40 min across midnight → two sessions
        Row(event_id=3, user_id=2, event_type="view", ts_sec=mid - 1200),
        Row(event_id=4, user_id=2, event_type="view", ts_sec=mid + 1200),
        # user 3: signup 1 s after midnight → force split despite gap
        Row(event_id=5, user_id=3, event_type="view", ts_sec=mid - 10),
        Row(event_id=6, user_id=3, event_type="signup", ts_sec=mid + 1),
        Row(event_id=7, user_id=3, event_type="view", ts_sec=mid + 2),
    ]
    ev = spark.createDataFrame(rows)
    init = F.col("event_type") == "signup"
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize_bucketed(ev, init_col=init).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 2, 7: 2}
    plain = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev, init_col=init).collect()
    }
    assert got == plain


@given(events_strategy, st.sampled_from([37, 100, 250, 86_400]))
@settings(max_examples=10, deadline=None)
@pytest.mark.slow
def test_bucketed_sessionize_matches_python_model(
    spark_session_holder, rows, bucket_sec
):
    """The (user, bucket)-keyed sessionizer with boundary stitching must
    agree with the single-threaded model for ANY bucket width —
    including buckets smaller than the gap (merge chains across many
    consecutive buckets) and boundary-exact timestamps."""
    from msstreamingstack_spark.operators.sessionize import (
        sessionize_bucketed,
    )

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(eid, u, ts, init) for eid, (u, ts, init) in enumerate(rows)],
        ["event_id", "user_id", "ts_sec", "init"],
    )
    got = {
        r.event_id: r.session_idx
        for r in sessionize_bucketed(
            df, gap_sec=GAP, init_col=F.col("init"), bucket_sec=bucket_sec
        ).collect()
    }
    assert got == _model(rows)
