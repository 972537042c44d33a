"""Z-order (Morton-curve) multi-dimensional clustering.

The problem: hive partitioning and range-sorting cluster a table on
ONE key; a predicate on a second dimension then scans everything.
Interleaving the bits of two (or more) dimensions into a single
**z-value** and range-clustering the files on it keeps BOTH
dimensions locally compact: any 2-D box predicate touches only the
files whose z-range intersects the box, so parquet min/max stats (or
Delta/Iceberg file stats) prune most of a 100 TB table for 2-D
point/box lookups. This is the same layout idea as Delta Lake's
``OPTIMIZE ... ZORDER BY`` — built here from scratch on plain
parquet with Catalyst-native bit arithmetic (no UDF in the path).

The z-value is computed with the classic magic-mask bit spread —
O(log bits) shift/mask ops per dimension, whole-stage-codegen
friendly — emitted as SQL text that parses identically in Spark SQL
and DuckDB (only ``&``, ``|``, ``<<`` and CAST), so the clustering
computation itself is oracle-checkable bit-for-bit.

Reference parity note: the reference has no disk layout at all (its
persistence is Cassandra keyed ``(ts, user_id)``, reference
README.md:35-52); z-ordering is part of this engine's
beyond-reference 100 TB surface, alongside sinks/layout.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: magic masks spreading a 16-bit int so its bits occupy even
#: positions of a 32-bit word (Morton encode, textbook form)
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

BITS = 16  # per-dimension resolution; 2 dims -> 32-bit z-value


def spread_bits_sql(expr: str) -> str:
    """SQL spreading the low 16 bits of ``expr`` to even bit
    positions. Pure ``&``/``|``/``<<`` — parses in Spark SQL and
    DuckDB identically; fully parenthesized so precedence can't
    differ between dialects."""
    x = f"(CAST({expr} AS BIGINT) & {(1 << BITS) - 1})"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zvalue_sql(x_expr: str, y_expr: str) -> str:
    """SQL for the 32-bit Morton code of two 16-bit dimensions
    (y gets the odd bits)."""
    return f"(({spread_bits_sql(y_expr)} << 1) | {spread_bits_sql(x_expr)})"


def zvalue(x_expr: str, y_expr: str) -> Column:
    """DataFrame column of the Morton code — same generated SQL as
    the oracle side, so cross-engine parity holds by construction."""
    return F.expr(zvalue_sql(x_expr, y_expr))


def quantize_sql(expr: str, lo: float, hi: float) -> str:
    """Map a numeric expr with known bounds [lo, hi] onto the 16-bit
    grid. Bounds are caller-supplied constants (at scale: from table
    stats / a cheap agg pass), keeping the map deterministic and
    identical across engines. Scale is a power-of-two-friendly double
    op: (x-lo) * (65535/(hi-lo)) then FLOOR + clamp."""
    scale = (float(1 << BITS) - 1.0) / (float(hi) - float(lo))
    q = f"CAST(FLOOR(({expr} - {float(lo)!r}) * {scale!r}) AS BIGINT)"
    return f"LEAST(GREATEST({q}, 0), {(1 << BITS) - 1})"


def write_zordered(
    df: DataFrame,
    path: str,
    x_expr: str,
    y_expr: str,
    n_files: int,
) -> None:
    """Cluster ``df`` on the z-value of two pre-quantized dimension
    exprs and write ``n_files`` parquet files.

    ``repartitionByRange`` range-partitions on z (one shuffle; AQE
    samples the distribution so files are balanced even under skew),
    then ``sortWithinPartitions`` makes every file a contiguous
    z-range, so each file's parquet min/max stats for BOTH source
    dimensions cover a compact box — the property scan pruning needs.
    At 100 TB this is a periodic OPTIMIZE-style maintenance job, not
    a per-query cost.
    """
    zed = df.withColumn("zval", zvalue(x_expr, y_expr))
    (
        zed.repartitionByRange(n_files, F.col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
