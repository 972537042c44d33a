"""Every registered query must run at every scale factor — catches
accidental SF-dependence (hardcoded ids, empty-input crashes) that the
sf0.01 oracle tests wouldn't see."""

from __future__ import annotations

import pytest

from msstreamingstack_spark.queries import REGISTRY

SF_TINY = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_at_tiny_sf(spark, name):
    df = REGISTRY[name].builder(spark, SF_TINY)
    rows = df.limit(5).collect()
    assert df.columns, name
    assert rows is not None


def test_driver_window_invariants():
    """The correctness driver validates the FIRST 50 registry entries:
    the curated window must stay exactly 50, first in iteration order,
    fully oracled (a rows-only entry there burns a driver check as a
    red row), and every major family must keep a representative."""
    from msstreamingstack_spark.queries import DRIVER_WINDOW, REGISTRY

    assert len(DRIVER_WINDOW) == 50
    assert list(REGISTRY)[:50] == list(DRIVER_WINDOW)
    rows_only = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert rows_only == [], f"rows-only entries inside the window: {rows_only}"
    window_tags = {t for n in DRIVER_WINDOW for t in REGISTRY[n].tags}
    for family in ("reference", "relational", "tpch", "dedup", "similarity",
                   "multimodal", "skew", "pipeline", "text", "window",
                   "grouping-sets", "layout"):
        assert family in window_tags, f"family {family!r} left the window"


def test_registry_complete_under_any_first_import():
    """Direct imports of individual query modules must still yield the
    full registry with the v2 pipeline's composed oracle attached —
    the re-entrant import path (_apply_driver_window docstring) broke
    for the composed oracle when queries_pipeline's attach ran before
    its constituent modules finished registering (and extensions-first
    crashed outright on a from-import of partial-module constants)."""
    import subprocess
    import sys

    for first in (
        "msstreamingstack_spark.queries_extensions",
        "msstreamingstack_spark.queries_advanced",
        "msstreamingstack_spark.queries_pipeline",
        "msstreamingstack_spark.queries",
    ):
        code = (
            f"import {first}\n"
            "from msstreamingstack_spark.queries import REGISTRY\n"
            "assert REGISTRY['pipeline_pretrain_corpus_v2'].oracle\n"
            "assert len(REGISTRY) >= 184\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        assert r.returncode == 0, (first, r.stderr[-800:])
