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
