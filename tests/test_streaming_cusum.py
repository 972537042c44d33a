"""Streaming CUSUM monitor: with the reference (mu, slack, h) set to
the batch kernel's internally-derived values, the closed-hour output
must be BIT-equal to queries_analytics.anomaly_cusum_events minus each
type's final (still-open) hour; late rows are dropped and tallied,
never silently folded."""

from __future__ import annotations

import os
from collections import defaultdict
from decimal import Decimal

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from msstreamingstack_spark.streaming.cusum import (
    _make_cusum_fn,
    run_cusum_stream,
)

SF = "/root/testdata/sf0.001"


def _refs_from_raw(spark, sf_dir):
    """The batch kernel's per-type (mu, slack, h) in integer micros,
    re-derived independently (same Decimal(25,6) quantization)."""
    from msstreamingstack_spark.queries_analytics import (
        CUSUM_ALARM_DIV,
        CUSUM_SLACK_DIV,
    )
    from msstreamingstack_spark.sources.tables import events_with_time

    hourly = defaultdict(int)
    for r in events_with_time(spark, sf_dir).select(
        "event_type", "ts_sec", "value"
    ).collect():
        k = (r["event_type"], r["ts_sec"] // 3600 * 3600)
        hourly[k] += int(
            Decimal(repr(r["value"])).quantize(Decimal("0.000001"))
            * 1_000_000
        )
    tot, hrs = defaultdict(int), defaultdict(int)
    for (et, _), xi in hourly.items():
        tot[et] += xi
        hrs[et] += 1
    refs = {}
    for et in tot:
        mu = tot[et] // hrs[et]
        refs[et] = (mu, mu // CUSUM_SLACK_DIV, tot[et] // CUSUM_ALARM_DIV)
    return refs


@pytest.fixture(scope="module")
def cusum_run(spark, tmp_path_factory):
    src = pq.read_table(os.path.join(SF, "events.parquet")).to_pandas()
    src = src.sort_values("ts").reset_index(drop=True)
    drops = tmp_path_factory.mktemp("cusum_drops")
    half = (len(src) + 1) // 2
    for i, chunk in enumerate((src.iloc[:half], src.iloc[half:])):
        p = drops / f"drop-{i}.parquet"
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), p)
        mt = 1_700_000_000 + i * 10
        os.utime(p, (mt, mt))
    out = tmp_path_factory.mktemp("cusum_out")
    cp = tmp_path_factory.mktemp("cusum_cp")
    refs = _refs_from_raw(spark, SF)
    q = run_cusum_stream(spark, str(drops), str(out), str(cp), refs)
    q.awaitTermination(120)
    rows = []
    for b in sorted(os.listdir(str(out))):
        d = os.path.join(str(out), b)
        if any(f.endswith(".parquet") for f in os.listdir(d)):
            rows += spark.read.parquet(d).collect()
    return rows


def test_closed_hours_bit_equal_batch_kernel(spark, cusum_run):
    from msstreamingstack_spark.queries import REGISTRY

    batch = REGISTRY["anomaly_cusum_events"].builder(spark, SF).collect()
    last_hour = {}
    for r in batch:
        last_hour[r["event_type"]] = max(
            last_hour.get(r["event_type"], 0), r["hour_bucket"]
        )
    want = {
        (r["event_type"], r["hour_bucket"]): (
            r["n_events"],
            r["hourly_sum"],
            r["cusum_stat"],
            r["alarm"],
        )
        for r in batch
        if r["hour_bucket"] != last_hour[r["event_type"]]
    }
    got = {
        (r["event_type"], r["hour_bucket"]): (
            r["n_events"],
            r["hourly_sum"],
            r["cusum_stat"],
            r["alarm"],
        )
        for r in cusum_run
    }
    assert got == want  # bitwise: same integer micros -> same /1e6
    assert all(r["n_late"] == 0 for r in cusum_run)
    assert len(got) > 0


def test_late_rows_tallied_not_folded():
    """Direct-function contract: within a batch rows are sorted so
    nothing is late; a CROSS-batch row older than the open hour is
    dropped into n_late and never folds into any hour."""

    class FakeState:
        def __init__(self, saved=None):
            self.saved = saved

        @property
        def exists(self):
            return self.saved is not None

        @property
        def get(self):
            return self.saved

        def update(self, v):
            self.saved = v

    fn = _make_cusum_fn({"t": (0, 0, 0)})
    # batch 1: in-batch disorder is sorted away — 3600 closes first
    st = FakeState()
    b1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts_sec": [7200, 7200, 3600],
            "event_type": ["t"] * 3,
            "value": [1.0, 2.0, 4.0],
        }
    )
    out1 = list(fn(("t",), iter([b1]), st))[0]
    assert list(out1["hour_bucket"]) == [3600]
    assert out1.iloc[0]["n_late"] == 0
    assert st.saved[0] == 7200 and st.saved[1] == 2  # open hour
    # batch 2: a row older than the OPEN hour is late — tallied, the
    # open hour's accumulators untouched by it, 7200 closes with only
    # its own two rows
    b2 = pd.DataFrame(
        {
            "event_id": [4, 5],
            "ts_sec": [3700, 10800],  # 3700 -> closed 3600 bucket
            "event_type": ["t"] * 2,
            "value": [9.0, 1.0],
        }
    )
    out2 = list(fn(("t",), iter([b2]), st))[0]
    assert list(out2["hour_bucket"]) == [7200]
    assert out2.iloc[0]["n_events"] == 2
    assert out2.iloc[0]["hourly_sum"] == 3.0  # late 9.0 never folded
    assert out2.iloc[0]["n_late"] == 1
    assert st.saved[0] == 10800 and st.saved[4] == 1
