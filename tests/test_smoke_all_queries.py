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
