"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``msstreamingstack_spark.queries.REGISTRY`` — the
engine's named-query registry is the single source of truth for both
the Spark builders and the DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from msstreamingstack_spark.queries import REGISTRY  # noqa: E402
from msstreamingstack_spark.session import apply_runtime_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return REGISTRY["sessionize_events"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return REGISTRY[name].builder(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: wrap(name) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
