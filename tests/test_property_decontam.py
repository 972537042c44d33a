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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Verbatim n-gram contamination + span scrub (ngram13 kernels, small n)
# ---------------------------------------------------------------------------
def _ngram_model(token_lists, eval_every, n):
    """Python reference for ngram_contamination / ngram_span_scrub.

    Mirrors the engine's tokenization convention exactly: text is the
    space-join of the tokens and tokens are text.split(' ') — an empty
    doc round-trips to [''] (one empty word), same as Spark's
    split/DuckDB's string_split."""
    texts = {i: " ".join(toks) for i, toks in enumerate(token_lists)}
    words = {i: t.split(" ") for i, t in texts.items()}
    grams = {
        i: [" ".join(w[j : j + n]) for j in range(len(w) - n + 1)]
        for i, w in words.items()
    }
    eval_set = set()
    for i, gs in grams.items():
        if i % eval_every == 0:
            eval_set.update(gs)
    contam, scrub = {}, {}
    for i, gs in grams.items():
        if i % eval_every == 0:
            continue
        hits = [p for p, g in enumerate(gs, start=1) if g in eval_set]
        first = hits[0] if hits else 0
        last = (hits[-1] + n - 1) if hits else 0
        contam[i] = (len(gs), len(hits), first, last, int(bool(hits)))
        spans = []
        for p in hits:
            s, e = p, p + n - 1
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        covered = {q for s, e in spans for q in range(s, e + 1)}
        clean = " ".join(
            w for q, w in enumerate(words[i], start=1) if q not in covered
        )
        scrub[i] = (
            len(words[i]),
            len(spans),
            sum(e - s + 1 for s, e in spans),
            clean,
        )
    return contam, scrub


@given(corpus_strategy)
@settings(max_examples=10, deadline=None)
@pytest.mark.slow
def test_ngram_contamination_matches_python_model(
    spark_session_holder, token_lists
):
    from msstreamingstack_spark.operators.dedup import ngram_contamination

    spark = spark_session_holder
    eval_every, n = 3, 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_ngrams"],
            r["n_hits"],
            r["first_hit"],
            r["last_hit"],
            r["contaminated"],
        )
        for r in ngram_contamination(
            docs, F.col("doc_id") % eval_every == 0, n=n
        ).collect()
    }
    want, _ = _ngram_model(token_lists, eval_every, n)
    assert got == want


@given(corpus_strategy)
@settings(max_examples=10, deadline=None)
@pytest.mark.slow
def test_ngram_span_scrub_matches_python_model(
    spark_session_holder, token_lists
):
    from msstreamingstack_spark.operators.dedup import ngram_span_scrub

    spark = spark_session_holder
    eval_every, n = 3, 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_spans"],
            r["n_removed"],
            r["clean_text"],
        )
        for r in ngram_span_scrub(
            docs, F.col("doc_id") % eval_every == 0, n=n
        ).collect()
    }
    _, want = _ngram_model(token_lists, eval_every, n)
    assert got == want
    # internal consistency on the scrubbed docs: removed + surviving
    # word counts add up (vocab words are non-empty, so clean == ''
    # iff zero words survived; untouched docs are trivially text
    # round-trips and an EMPTY original would miscount here)
    for i, (n_words, n_spans, n_removed, clean) in want.items():
        if n_spans > 0:
            kept = len(clean.split(" ")) if clean else 0
            assert kept == n_words - n_removed
