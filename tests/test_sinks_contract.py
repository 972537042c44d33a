"""External-sink contract tests with injected fakes — no Redis server,
Cassandra cluster, or Kafka broker needed.

Each adapter's row→command translation is a pure generator asserted
against the reference's exact semantics (RedisForeachWriter.scala:
25-40 HSET pattern, CassandraSinkForeachProcessed.scala:17-37 CQL
insert, GetProducerAPI.scala:82-105 producer records), and the full
``foreachPartition`` path is exercised end-to-end with picklable fakes
that record executor-side into files the driver then reads back.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import Row

from msstreamingstack_spark.sinks.writers import (
    cassandra_insert_statements,
    cassandra_row_writer,
    kafka_records,
    kafka_writer,
    redis_hset_commands,
    redis_writer,
)


# ---------------------------------------------------------------------------
# Picklable recording fakes: executor-side calls append JSON lines into
# a spool directory; the driver reads the files back.
# ---------------------------------------------------------------------------
def _spool(dir_: str, records: list) -> None:
    path = os.path.join(dir_, f"{uuid.uuid4().hex}.jsonl")
    with open(path, "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


def _read_spool(dir_: str) -> list:
    out = []
    for f in sorted(os.listdir(dir_)):
        with open(os.path.join(dir_, f)) as fh:
            out.extend(json.loads(ln) for ln in fh)
    return out


class FakeRedisPipeline:
    def __init__(self, dir_: str, transaction: bool) -> None:
        self.dir = dir_
        self.transaction = transaction
        self.cmds: list = []

    def hset(self, key: str, field: str, value: str) -> None:
        self.cmds.append({"op": "hset", "key": key, "field": field,
                          "value": value})

    def execute(self) -> None:
        _spool(self.dir, self.cmds)


class FakeRedisFactory:
    """jedis double: pipeline(transaction=False) → hset* → execute."""

    def __init__(self, dir_: str) -> None:
        self.dir = dir_

    def __call__(self):
        return self

    def pipeline(self, transaction: bool = True) -> FakeRedisPipeline:
        assert transaction is False, "adapter must pipeline untransacted"
        return FakeRedisPipeline(self.dir, transaction)


class FakeCassandraSessionFactory:
    """cassandra session double recording each execute(cql, params)."""

    def __init__(self, dir_: str) -> None:
        self.dir = dir_

    def __call__(self):
        return self

    def execute(self, cql: str, params) -> None:
        _spool(self.dir, [{"cql": cql, "params": list(params)}])


class FakeKafkaProducerFactory:
    """kafka producer double: send* → flush → close."""

    def __init__(self, dir_: str) -> None:
        self.dir = dir_

    def __call__(self):
        self.sent: list = []
        self.flushed = False
        self.closed = False
        return self

    def send(self, topic: str, key=None, value=None) -> None:
        self.sent.append({"topic": topic, "key": key, "value": value})

    def flush(self) -> None:
        self.flushed = True

    def close(self) -> None:
        assert self.flushed, "close before flush loses async records"
        self.closed = True
        _spool(self.dir, self.sent)


# ---------------------------------------------------------------------------
# Pure command-plan contracts (reference-exact semantics)
# ---------------------------------------------------------------------------
def test_redis_hset_pattern_matches_reference():
    rows = [
        Row(ts="t1", user_id="u1", user_device="ios", cart_amount=None),
        Row(ts="t2", user_id=None, user_device="android", cart_amount="5"),
        Row(ts="t3", user_id="", user_device="web", cart_amount="9"),
        Row(ts=None, user_id="u2", user_device="", cart_amount=7),
    ]
    got = list(redis_hset_commands(rows, "MS"))
    # row 1: null cart_amount skipped; rows 2-3: null/empty uid skip the
    # whole row; row 4: null ts + empty device skipped, int stringified
    assert got == [
        ("MS:u1", "ts", "t1"),
        ("MS:u1", "user_id", "u1"),
        ("MS:u1", "user_device", "ios"),
        ("MS:u2", "user_id", "u2"),
        ("MS:u2", "cart_amount", "7"),
    ]


def test_cassandra_insert_statement_matches_reference():
    rows = [Row(ts="t1", user_id="u1", session_id="s1", init_session=True)]
    (cql, params), = cassandra_insert_statements(rows, "ks", "processed")
    assert cql == (
        "INSERT INTO ks.processed (ts, user_id, message_date, user_agent, "
        "partner_id, partner_name, init_session, session_id, page_type, "
        "category, cart_amount, platform, user_device) "
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"
    )
    # declared column order; absent columns insert as None (CQL null)
    assert params == ("t1", "u1", None, None, None, None, True, "s1",
                      None, None, None, None, None)


def test_cassandra_insert_custom_columns():
    rows = [Row(a=1, b="x")]
    (cql, params), = cassandra_insert_statements(
        rows, "ks", "t", columns=("a", "b")
    )
    assert cql == "INSERT INTO ks.t (a, b) VALUES (?, ?)"
    assert params == (1, "x")


def test_kafka_records_key_and_json_value():
    rows = [Row(event_id=42, user_id="u1", value=1.5),
            Row(event_id=None, user_id="u2", value=None)]
    got = list(kafka_records(rows))
    assert got[0][0] == "42"
    assert json.loads(got[0][1]) == {"event_id": 42, "user_id": "u1",
                                     "value": 1.5}
    assert got[1][0] is None  # null key → partitioner decides


# ---------------------------------------------------------------------------
# End-to-end through foreachPartition (executor-side fakes)
# ---------------------------------------------------------------------------
def test_redis_writer_end_to_end(spark, tmp_path):
    spool = str(tmp_path / "redis")
    os.makedirs(spool)
    df = spark.createDataFrame(
        [("u1", "ios", "10"), (None, "web", "3"), ("u2", None, "7")],
        ["user_id", "user_device", "cart_amount"],
    ).repartition(2)
    redis_writer(key_prefix="MS", client_factory=FakeRedisFactory(spool))(df, 0)
    cmds = _read_spool(spool)
    by_key: dict = {}
    for c in cmds:
        assert c["op"] == "hset"
        by_key.setdefault(c["key"], {})[c["field"]] = c["value"]
    assert by_key == {
        "MS:u1": {"user_id": "u1", "user_device": "ios", "cart_amount": "10"},
        "MS:u2": {"user_id": "u2", "cart_amount": "7"},
    }


def test_cassandra_row_writer_end_to_end(spark, tmp_path):
    spool = str(tmp_path / "cass")
    os.makedirs(spool)
    df = spark.createDataFrame(
        [("t1", "u1", "s1"), ("t2", "u2", "s2")],
        ["ts", "user_id", "session_id"],
    ).repartition(2)
    cassandra_row_writer(
        "ks", "processed",
        session_factory=FakeCassandraSessionFactory(spool),
    )(df, 0)
    stmts = _read_spool(spool)
    assert len(stmts) == 2
    assert all(s["cql"].startswith("INSERT INTO ks.processed (ts, user_id,")
               for s in stmts)
    inserted = {tuple(s["params"][:2]) for s in stmts}
    assert inserted == {("t1", "u1"), ("t2", "u2")}


def test_cassandra_row_writer_requires_session_factory():
    import pytest

    with pytest.raises(NotImplementedError):
        cassandra_row_writer("ks", "t")


def test_kafka_writer_end_to_end(spark, tmp_path):
    spool = str(tmp_path / "kafka")
    os.makedirs(spool)
    df = spark.createDataFrame(
        [(1, "view"), (2, "click")], ["event_id", "event_type"]
    ).repartition(2)
    kafka_writer(
        "unused:9092", "events",
        producer_factory=FakeKafkaProducerFactory(spool),
    )(df, 0)
    recs = _read_spool(spool)
    assert {r["key"] for r in recs} == {"1", "2"}
    assert all(r["topic"] == "events" for r in recs)
    payloads = {r["key"]: json.loads(r["value"]) for r in recs}
    assert payloads["1"] == {"event_id": 1, "event_type": "view"}


def test_kafka_sync_strategy_awaits_each_send_before_next():
    """The reference's synchronous producer strategy
    (GetProducerAPI.scala:57-79) awaits send().get() PER RECORD:
    with sync=True the event order must be strictly
    send(k) -> get(k) -> send(k+1) -> ..., flush/close after all;
    with sync=False no get() ever happens (async discipline)."""
    from msstreamingstack_spark.sinks.writers import _kafka_write_partition

    class _Handle:
        def __init__(self, log, idx):
            self.log, self.idx = log, idx

        def get(self):
            self.log.append(("get", self.idx))

    class _SyncFake:
        def __init__(self):
            self.log = []
            self.n = 0

        def __call__(self):
            return self

        def send(self, topic, key=None, value=None):
            self.log.append(("send", self.n))
            h = _Handle(self.log, self.n)
            self.n += 1
            return h

        def flush(self):
            self.log.append(("flush", None))

        def close(self):
            self.log.append(("close", None))

    rows = [Row(event_id=i, v=i * 10) for i in range(3)]

    fake = _SyncFake()
    n = _kafka_write_partition(iter(rows), "t", "event_id", fake, sync=True)
    assert n == 3
    assert fake.log == [
        ("send", 0), ("get", 0),
        ("send", 1), ("get", 1),
        ("send", 2), ("get", 2),
        ("flush", None), ("close", None),
    ]

    fake = _SyncFake()
    _kafka_write_partition(iter(rows), "t", "event_id", fake, sync=False)
    assert [e for e in fake.log if e[0] == "get"] == []
