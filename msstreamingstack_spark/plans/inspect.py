"""Physical-plan inspection utilities — the engine's "is this the plan
I'd want at 100 TB?" feedback loop, usable from tests and notebooks.

The reference delegates all planning to Catalyst and never checks what
it got (SURVEY.md §4). At scale that's not good enough: a filter that
misses the parquet scan re-reads terabytes, a dim join that isn't
broadcast shuffles the fact table. These helpers turn
``df.explain("formatted")`` into assertable facts so every operator's
plan shape is pinned by a test (tests/test_plans.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text (physical plan + node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanFacts:
    """Assertable facts extracted from a physical plan."""

    text: str
    pushed_filters: list[str]
    read_schemas: list[str]
    broadcast_joins: int
    sortmerge_joins: int
    shuffles: int
    codegen_spans: int
    python_evals: int
    in_memory_scans: int
    broadcast_exchanges: int
    shuffle_stages: int

    @property
    def live_shuffles(self) -> int:
        """Exchange occurrences minus already-materialized query
        stages: a POPULATED cached subtree prints its finalized
        ShuffleQueryStage nodes, each accompanied by an Exchange
        line that will never re-execute — raw Exchange counts jump
        when an upstream persist turns eager while the executed
        shuffle work is unchanged. Budget pins should bound THIS."""
        return self.shuffles - self.shuffle_stages

    def pushes_filter(self, fragment: str) -> bool:
        return any(fragment in pf for pf in self.pushed_filters)

    def reads_column(self, col: str) -> bool:
        return any(col in rs for rs in self.read_schemas)


def plan_facts(df: DataFrame) -> PlanFacts:
    text = formatted_plan(df)
    return PlanFacts(
        text=text,
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: (\S+)", text),
        broadcast_joins=len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", text)),
        sortmerge_joins=len(re.findall(r"SortMergeJoin", text)),
        shuffles=len(re.findall(r"\bExchange\b|\bShuffleExchange", text)),
        codegen_spans=len(set(re.findall(r"\[codegen id : (\d+)\]", text))),
        python_evals=len(re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", text)),
        in_memory_scans=len(re.findall(r"InMemoryTableScan|Scan In-memory", text)),
        broadcast_exchanges=len(re.findall(r"BroadcastExchange", text)),
        shuffle_stages=len(re.findall(r"ShuffleQueryStage", text)),
    )


def assert_scan_pruned(df: DataFrame, must_read: list[str], must_not_read: list[str]) -> None:
    """Column pruning reached the scan: the ReadSchema includes exactly
    the needed columns and excludes the named wide ones."""
    facts = plan_facts(df)
    for c in must_read:
        assert facts.reads_column(c), f"column {c} missing from ReadSchema:\n{facts.read_schemas}"
    for c in must_not_read:
        assert not facts.reads_column(c), f"column {c} should be pruned:\n{facts.read_schemas}"
