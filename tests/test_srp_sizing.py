"""SRP LSH sizing lever: planes_per_table is the knob that holds
bucket occupancy (and candidate join fan-out) constant as N grows —
with fixed planes, occupancy is N/2^bits and candidate volume is
~quadratic in N. Pin that (a) a non-default bits setting is still
bit-exact against its DuckDB oracle, and (b) more bits strictly
shrink the candidate set on the same corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from msstreamingstack_spark.operators.similarity import (
    embedding_neardup_lsh_pairs,
    embedding_neardup_lsh_sql,
    srp_buckets,
)
from msstreamingstack_spark.sources.tables import load_table
from tests.oracle_harness import compare, duck_connect

SF = "/root/testdata/sf0.01"
T = 0.45


def test_wider_buckets_oracle_exact(spark):
    emb = load_table(spark, SF, "embeddings")
    got = embedding_neardup_lsh_pairs(emb, T, n_tables=4, planes_per_table=8)
    con = duck_connect(SF)
    try:
        ok, msg = compare(
            got, con, embedding_neardup_lsh_sql(T, n_tables=4, planes_per_table=8)
        )
    finally:
        con.close()
    assert ok, msg


def _candidates(spark, emb, bits: int) -> int:
    def bucketed(idc):
        return emb.select(
            F.col("vec_id").alias(idc),
            F.posexplode(
                srp_buckets(F.col("embedding"), 4, bits)
            ).alias("tbl", "bucket"),
        )

    return (
        bucketed("d1")
        .join(bucketed("d2"), ["tbl", "bucket"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
        .count()
    )


def test_more_bits_fewer_candidates(spark):
    emb = load_table(spark, SF, "embeddings")
    c4 = _candidates(spark, emb, 4)
    c8 = _candidates(spark, emb, 8)
    assert c8 < c4, (c4, c8)
    # 4 extra bits ≈ 16x more buckets: expect an order-of-magnitude cut
    assert c8 * 4 < c4, (c4, c8)
