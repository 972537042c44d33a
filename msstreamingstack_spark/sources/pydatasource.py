"""Spark 4 Python DataSource: the reference's paced producer
(App.scala:29-50, 3-records-then-sleep micro-batching) as a
first-class pluggable source instead of a driver-side file-drop loop.

Batch form: ``spark.read.format("synthetic_events")`` with explicit
partition planning — N disjoint event-id ranges, each generated
executor-side as Arrow RecordBatches (vectorized numpy, no per-row
Python in the scan). At 100 TB-equivalent generation this is
embarrassingly parallel: partitions share nothing and sizing is
``n_rows / n_partitions``.

Streaming form: ``spark.readStream.format("synthetic_events")`` via
``SimpleDataSourceStreamReader`` — the offset is the event-id cursor,
so every micro-batch is a deterministic id range: replay after a
checkpoint restart regenerates byte-identical rows
(``readBetweenOffsets``), giving exactly-once semantics through the
same offset/commit contract a Kafka source uses (reference pacing
knob ``batch_size`` ≙ App.scala's 3-record flush loop).

Row formula matches ``sources/generator.py::event_batch`` — the two
producers are interchangeable, one file-based, one source-API-based.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)

NS = 1_000_000_000
EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _arrow_batch(start_id: int, n: int, t0_sec: int, step_sec: int):
    """Vectorized generation of [start_id, start_id+n) as one Arrow
    RecordBatch; same formula as generator.event_batch."""
    import numpy as np
    import pyarrow as pa

    eid = np.arange(start_id, start_id + n, dtype=np.int64)
    types = np.array(EVENT_TYPES)[eid % len(EVENT_TYPES)]
    return pa.record_batch(
        {
            "event_id": pa.array(eid),
            "ts": pa.array((t0_sec + (eid - start_id) * step_sec) * NS),
            "user_id": pa.array(eid % 25),
            "event_type": pa.array(types),
            "value": pa.array(((eid * 7) % 100).astype("float64")),
            "props": pa.array(['{"k": %d}' % k for k in (eid % 10)]),
        }
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, t0_sec: int, step_sec: int):
        self.start, self.end = start, end
        self.t0_sec, self.step_sec = t0_sec, step_sec


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.t0_sec = int(options.get("t0_sec", 0))
        self.step_sec = int(options.get("step_sec", 5))
        self.lo, self.hi = 0, self.n_rows  # id range after pushdown

    def pushFilters(self, filters):
        """Spark 4.1 filter pushdown: event_id range predicates narrow
        the GENERATED id range — the source never materializes rows
        outside [lo, hi), the generator analog of parquet row-group
        pruning.

        Handled filters are consumed (Spark skips re-evaluating them);
        the range resets at the start of every call so repeated
        filtered plans on one reader never compound.

        UPSTREAM CAVEAT (Spark 4.1, pinned in tests): the JVM caches
        the PLANNED PARTITIONS per loaded relation and refreshes them
        only on pushFilters-bearing plans — running a filtered query
        and then an UNFILTERED one on the SAME DataFrame object reuses
        the narrowed partitions (missing rows; verified identical with
        a non-consuming advisory implementation, so it is the JVM
        partition cache, not filter consumption). Use one .load() per
        query — what the registry builder does."""
        self.lo, self.hi = 0, self.n_rows
        for f in filters:
            v = getattr(f, "value", None)
            if (
                getattr(f, "attribute", None) == ("event_id",)
                and isinstance(v, int)
                and not isinstance(v, bool)
            ):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                    continue
            yield f

    def partitions(self):
        lo, hi = self.lo, self.hi
        hi = max(lo, hi)
        per = max(1, -(-(hi - lo) // self.n_partitions)) if hi > lo else 1
        parts = []
        start = lo
        while start < hi:
            end = min(start + per, hi)
            parts.append(
                _RangePartition(start, end, self.t0_sec + start * self.step_sec,
                                self.step_sec)
            )
            start = end
        # Spark requires at least one partition; an empty range yields
        # an empty generator partition
        return parts or [
            _RangePartition(lo, lo, self.t0_sec, self.step_sec)
        ]

    def read(self, partition: _RangePartition):
        if partition.end > partition.start:
            yield _arrow_batch(
                partition.start,
                partition.end - partition.start,
                partition.t0_sec,
                partition.step_sec,
            )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset = next event_id to emit. Each micro-batch is the id
    range [offset, offset + batch_size) — deterministic, so replay
    between committed offsets is byte-identical."""

    def __init__(self, options):
        self.batch_size = int(options.get("batch_size", 3))
        self.t0_sec = int(options.get("t0_sec", 0))
        self.step_sec = int(options.get("step_sec", 5))

    def initialOffset(self):
        return {"next_id": 0}

    def _rows(self, start: int, end: int):
        batch = _arrow_batch(
            start, end - start, self.t0_sec + start * self.step_sec, self.step_sec
        )
        # a materialized list iterator: the runner caches and
        # copy.copy()s it between planPartitions calls (a lazy
        # generator is not copyable there)
        return iter([tuple(r.values()) for r in batch.to_pylist()])

    def read(self, start: dict):
        s = int(start["next_id"])
        e = s + self.batch_size
        return self._rows(s, e), {"next_id": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["next_id"]), int(end["next_id"]))


class SyntheticEventsDataSource(DataSource):
    """``spark.dataSource.register(SyntheticEventsDataSource)`` then
    ``spark.read.format("synthetic_events")`` (batch) or
    ``spark.readStream.format("synthetic_events")`` (paced stream)."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)
