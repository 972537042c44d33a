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


def test_auto_planes_tracks_corpus_size():
    """Occupancy-constant sizing: planes grow with log2(N), floored at
    the historical default 4, capped at 24."""
    from msstreamingstack_spark.operators.similarity import (
        MAX_PLANES,
        auto_planes_per_table,
    )

    assert auto_planes_per_table(0) == 4
    assert auto_planes_per_table(500) == 4      # driver fixture sizing
    assert auto_planes_per_table(2000) == 6     # sf0.1
    assert auto_planes_per_table(32000) == 10   # 16x scale run
    assert auto_planes_per_table(10**12) == MAX_PLANES
    # monotone non-decreasing
    vals = [auto_planes_per_table(n) for n in (1, 10, 100, 10**3, 10**6, 10**9)]
    assert vals == sorted(vals)


def test_registered_oracle_tracks_fixture_sizing(spark):
    """GUARD for dedup_embedding_lsh's oracle contract: the registered
    oracle is now GENERATED from auto_planes_per_table over the driver
    fixture's parquet-footer row count — the same derivation the Spark
    builder applies — so a fixture re-size re-derives both sides in
    lockstep. Pin (a) the footer count agrees with a live count(),
    (b) the registered oracle text equals the regeneration from that
    count."""
    from msstreamingstack_spark.queries import REGISTRY  # full registry
    import msstreamingstack_spark.queries_advanced as qa
    from msstreamingstack_spark.operators.similarity import (
        auto_planes_per_table,
    )
    from msstreamingstack_spark.sources.tables import table_row_count

    n_meta = table_row_count(SF, "embeddings")
    assert n_meta == load_table(spark, SF, "embeddings").count()
    expected = embedding_neardup_lsh_sql(
        qa.NEARDUP_COS_T, planes_per_table=auto_planes_per_table(n_meta)
    )
    assert REGISTRY["dedup_embedding_lsh"].oracle == expected


def test_auto_sized_lsh_oracle_exact_at_sf01(spark):
    """The AUTO-SIZED path (no planes_per_table passed) at sf0.1 must
    derive 6 planes and stay bit-exact against the matching oracle —
    the dynamic default is as oracle-checkable as any fixed setting."""
    sf = "/root/testdata/sf0.1"
    emb = load_table(spark, sf, "embeddings")
    got = embedding_neardup_lsh_pairs(emb, T)  # pure defaults
    con = duck_connect(sf)
    try:
        ok, msg = compare(
            got, con, embedding_neardup_lsh_sql(T, planes_per_table=6)
        )
    finally:
        con.close()
    assert ok, msg


def test_more_bits_fewer_candidates(spark):
    emb = load_table(spark, SF, "embeddings")
    c4 = _candidates(spark, emb, 4)
    c8 = _candidates(spark, emb, 8)
    assert c8 < c4, (c4, c8)
    # 4 extra bits ≈ 16x more buckets: expect an order-of-magnitude cut
    assert c8 * 4 < c4, (c4, c8)
