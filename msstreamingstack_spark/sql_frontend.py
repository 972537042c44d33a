"""SQL front-end: run arbitrary Spark SQL over the engine's tables.

The DataFrame registry is the engine's curated surface; this module is
the open one — every fixture table registered as a temp view (plus the
``events_ts`` convenience view carrying the canonical ``ts_sec``), so
an analyst can point plain SQL at the same data the operators see.
Catalyst treats view-backed SQL and the DataFrame API identically
(same logical plans, same pushdown/pruning/AQE), so everything the
plan tests pin for the registry holds for ad-hoc SQL too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from msstreamingstack_spark.schemas import TABLE_NAMES
from msstreamingstack_spark.sources.tables import events_with_time, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every fixture table as a temp view; returns the names.

    Also registers ``events_ts`` = events + canonical integer epoch
    seconds (the dtype-dispatched ``ts_sec`` every registry query
    uses), so SQL users never re-derive event-time arithmetic.
    """
    names = []
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    events_with_time(spark, sf_dir).createOrReplaceTempView("events_ts")
    names.append("events_ts")
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the tables and run one SQL statement."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
