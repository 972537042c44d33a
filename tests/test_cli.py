"""End-to-end CLI test: produce drops → consume (availableNow) →
history sink has every event, sessionized — the reference's
producer+consumer run loop (README.md run commands) as one in-process
round trip."""

from __future__ import annotations

import os

from msstreamingstack_spark.__main__ import main


def test_produce_consume_roundtrip(spark, tmp_path):
    drops = str(tmp_path / "drops")
    hist = str(tmp_path / "hist")
    cp = str(tmp_path / "cp")

    rc = main(
        [
            "produce", "--out", drops,
            "--batches", "4", "--batch-size", "5", "--gap-sec", "2400",
        ]
    )
    assert rc == 0
    assert len(os.listdir(drops)) == 4

    rc = main(
        [
            "consume", "--source", drops, "--checkpoint", cp,
            "--parquet-out", hist, "--once",
        ]
    )
    assert rc == 0

    out = spark.read.parquet(hist)
    assert out.count() == 20  # every produced event reached the sink
    assert "session_id" in out.columns


def test_query_subcommand_runs_and_unknown_rejected(spark, capsys):
    rc = main(["query", "tpch_q1", "--sf-dir", "/root/testdata/sf0.001", "--rows", "3"])
    assert rc == 0
    rc = main(["query", "no_such_query_xyz"])
    assert rc == 2
