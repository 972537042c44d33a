"""Property test: eval_overlap_stats vs a single-threaded Python
shingle model — random small corpora with overlapping vocabularies
hit the boundary cases (docs shorter than the shingle width, full
containment, zero overlap, eval-only corpora) without hand-picking."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


WORDS = ["a", "b", "c", "d", "e"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
    min_size=1,
    max_size=12,
)


def _model(token_lists, eval_every, n=3):
    """Python reference: 3-gram distinct shingles per doc; train docs'
    overlap with the union of eval docs' shingles."""
    sh = {
        i: {
            " ".join(toks[j : j + n])
            for j in range(len(toks) - n + 1)
        }
        for i, toks in enumerate(token_lists)
    }
    eval_h = set().union(
        *(s for i, s in sh.items() if i % eval_every == 0)
    ) if any(i % eval_every == 0 for i in sh) else set()
    out = {}
    for i, s in sh.items():
        if i % eval_every == 0:
            continue
        out[i] = (len(s), len(s & eval_h))
    return out


@given(corpus_strategy)
@settings(max_examples=10, deadline=None)
def test_eval_overlap_matches_python_model(spark_session_holder, token_lists):
    from msstreamingstack_spark.operators.dedup import eval_overlap_stats

    spark = spark_session_holder
    eval_every = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"])
        for r in eval_overlap_stats(
            docs, F.col("doc_id") % eval_every == 0
        ).collect()
    }
    assert got == _model(token_lists, eval_every)
