"""Z-order clustering: encode correctness + the layout property that
justifies it (per-file 2-D boxes shrink vs an unclustered write)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from msstreamingstack_spark.operators.zorder import (
    quantize_sql,
    write_zordered,
    zvalue,
    zvalue_sql,
)
from msstreamingstack_spark.sources.tables import load_table


def test_zvalue_interleave_known_bits(spark):
    rows = spark.sql(
        f"SELECT {zvalue_sql('3', '5')} AS a, "
        f"{zvalue_sql('0', '1')} AS b, "
        f"{zvalue_sql('65535', '65535')} AS c"
    ).collect()[0]
    # x=3 (bits 0,1 -> even pos 0,2), y=5 (bits 0,2 -> odd pos 1,5)
    assert rows.a == 0b100111
    assert rows.b == 2
    assert rows.c == (1 << 32) - 1


def test_zvalue_locality_monotone(spark):
    # nearby points in both dims -> nearby z-values: the max z-gap
    # within a 4x4 tile is bounded (64), while points a full grid
    # apart differ astronomically
    df = spark.range(16).select(
        (F.col("id") % 4).alias("x"), (F.col("id") / 4).cast("long").alias("y")
    )
    zs = [r.z for r in df.select(zvalue("x", "y").alias("z")).collect()]
    assert max(zs) - min(zs) < 64
    far = spark.sql(f"SELECT {zvalue_sql('60000', '60000')} AS z").collect()[0].z
    assert far - max(zs) > 1 << 30


def _file_spans(spark, path):
    """Per parquet file: (cust span, price-grid span) box extents."""
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        row = (
            spark.read.parquet(f)
            .agg(
                (F.max("xq") - F.min("xq")).alias("dx"),
                (F.max("yq") - F.min("yq")).alias("dy"),
            )
            .collect()[0]
        )
        spans.append((row.dx, row.dy))
    return spans


@pytest.mark.parametrize("n_files", [8])
def test_zordered_files_have_compact_boxes(spark, sf_smoke, tmp_path, n_files):
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey",
        F.expr("o_custkey % 65536").alias("xq"),
        F.expr(quantize_sql("o_totalprice", 0.0, 600000.0)).alias("yq"),
    )
    zpath, upath = str(tmp_path / "zorder"), str(tmp_path / "plain")
    write_zordered(orders, zpath, "xq", "yq", n_files=n_files)
    # unclustered baseline: same file count, arbitrary (round-robin)
    # placement — every file spans nearly the full grid in both dims
    orders.repartition(n_files).write.mode("overwrite").parquet(upath)

    z_area = [dx * dy for dx, dy in _file_spans(spark, zpath)]
    u_area = [dx * dy for dx, dy in _file_spans(spark, upath)]
    assert len(z_area) == n_files
    # mean per-file 2-D box area shrinks by >=4x (empirically ~10-60x;
    # loose bound keeps the test robust at tiny SF)
    assert sum(z_area) / len(z_area) < sum(u_area) / len(u_area) / 4

    # pruning consequence: a 2-D box predicate overlaps few z files.
    # Count files whose stats-box intersects a small query box.
    def overlapping(path):
        hit = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            r = (
                spark.read.parquet(f)
                .agg(
                    F.min("xq").alias("x0"), F.max("xq").alias("x1"),
                    F.min("yq").alias("y0"), F.max("yq").alias("y1"),
                )
                .collect()[0]
            )
            if r.x0 is not None and not (r.x1 < 10 or r.x0 > 60 or r.y1 < 0 or r.y0 > 4000):
                hit += 1
        return hit

    assert overlapping(zpath) <= overlapping(upath)
