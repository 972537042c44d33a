"""SparkSession factory and session-level configuration.

The reference configures its session at
``StructuredStreaming.scala:30-51`` (local master, shuffle.partitions=2,
connector hosts). Here the session is tuned for correctness-reproducible
local runs that still scale: AQE on, UTC timezone pinned (oracle
comparison), Arrow enabled for the pandas-UDF slow path, shuffle
partitions sized to cores rather than Spark's default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must hold on ANY session running this engine, including
# sessions created by an external harness and handed to us. All of these
# are runtime-settable SQL confs.
RUNTIME_CONFS: dict[str, str] = {
    # deterministic wall-clock-free comparisons against the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas_udf / applyInPandas / mapInPandas
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # runtime re-planning: partition coalescing, skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Spark 4.1 Python DataSource filter pushdown (sources/pydatasource
    # narrows its generated id range from pushed event_id predicates;
    # without the conf a reader implementing pushFilters() is an ERROR,
    # not a silent fallback)
    "spark.sql.python.filterPushdown.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-created session.

    Fails loud: a conf this engine depends on that cannot be set (or
    reads back different from what we set) raises, instead of leaving a
    silently-wrong session. Never rely on a conf changing *read
    behavior* (e.g. the dead ``nanosAsLong`` legacy conf on Spark 4) —
    code that cares about a read-back dtype must dispatch on the actual
    schema, as ``sources.tables.events_with_time`` does.
    """
    problems: list[str] = []
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
            got = spark.conf.get(k, None)
        except Exception as exc:  # non-settable on this build
            problems.append(f"{k}={v!r}: {exc}")
            continue
        if got != v:
            problems.append(f"{k}: set {v!r} but session reports {got!r}")
    if problems:
        raise RuntimeError(
            "engine-required Spark confs could not be applied: "
            + "; ".join(problems)
        )
    return spark


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "msstreamingstack_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    On a real cluster the same confs apply; only ``master`` changes —
    pass ``extra_conf`` or pre-create the session and call
    ``apply_runtime_confs``.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        # one JVM hosts all 32 executor threads in local mode — size the
        # heap so shuffle/broadcast buffers don't turn into GC churn
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
