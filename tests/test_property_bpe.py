"""Property tests: the BPE trainer (operators/bpe.py) vs a
single-threaded Python reference — random small corpora exercise the
tie-break path (tiny vocabs tie constantly), words shorter than a
pair, dry runs (rounds > available pairs), and repeated-char words
where leftmost-greedy differs from other merge orders."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.usefixtures("spark")

WORDS = ["a", "b", "ab", "aab", "ba", "aa", "abc", "ccc", ""]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=6),
    min_size=1,
    max_size=8,
)


def _bpe_model(texts: list[str], rounds: int):
    """Reference trainer. Same conventions as the engine: words from
    text.split(' '); pair counts weighted by word frequency, all
    overlapping occurrences counted; argmax by (count DESC, l, r);
    leftmost-greedy single-pair rewrite per round."""
    wc = Counter(w for t in texts for w in t.split(" "))
    syms = {w: (list(w) if w else [""]) for w in wc}
    merges = []
    for k in range(1, rounds + 1):
        cnt: Counter = Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += c
        if not cnt:
            break
        (left, right), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((k, left, right, left + right, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


@given(corpus_strategy)
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_bpe_merges_match_python_model(spark, token_lists):
    from msstreamingstack_spark.operators.bpe import bpe_learn_merges

    rounds = 5
    texts = [" ".join(toks) for toks in token_lists]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r["round"], r["merge_left"], r["merge_right"], r["merged"], r["pair_count"])
        for r in bpe_learn_merges(docs, rounds=rounds)
        .orderBy("round")
        .collect()
    ]
    want, _ = _bpe_model(texts, rounds)
    assert got == want


@given(corpus_strategy)
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_bpe_segmentation_matches_python_model(spark, token_lists):
    from msstreamingstack_spark.operators.bpe import bpe_segment_corpus

    rounds = 5
    texts = [" ".join(toks) for toks in token_lists]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_segment_corpus(docs, rounds=rounds).collect()
    }
    _, syms = _bpe_model(texts, rounds)
    want = {
        i: (
            len(t.split(" ")),
            sum(len(syms[w]) for w in t.split(" ")),
        )
        for i, t in enumerate(texts)
    }
    assert got == want


def test_bpe_merge_table_is_deterministic_under_ties(spark):
    """Every pair count ties on this fixture — the (l, r) lexicographic
    tie-break alone must pin the whole merge sequence."""
    from msstreamingstack_spark.operators.bpe import bpe_learn_merges

    docs = spark.createDataFrame(
        [(0, "xy"), (1, "yx"), (2, "zq"), (3, "qz")], ["doc_id", "text"]
    )
    rows = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_learn_merges(docs, rounds=4).orderBy("round").collect()
    ]
    assert rows == [("q", "z"), ("x", "y"), ("y", "x"), ("z", "q")]


@pytest.mark.parametrize("batch", [2, 4, 16])
def test_batched_trainer_self_pair_regression(spark, batch):
    """The r9 falsifying corpus: (c,c)=4 and (a,b)=1 are disjoint, but
    merging the SELF-PAIR (c,c) inside 'ccc' creates ('cc','c') with
    count 2, which sequentially outranks (a,b) — a batch that takes
    both emits (a,b) one turn early. The batcher must end the batch at
    the self-pair: sequential order is (c,c), (cc,c), (a,b)."""
    from msstreamingstack_spark.operators.bpe import bpe_train_batched

    texts = ["ab", "ccc", "ccc"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, vocab = bpe_train_batched(docs, rounds=6, batch=batch)
    want, wsyms = _bpe_model(texts, 6)
    assert [(m[1], m[2]) for m in want[:3]] == [
        ("c", "c"), ("cc", "c"), ("a", "b")
    ]
    assert merges == want
    got_syms = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got_syms == {w: " ".join(s) for w, s in wsyms.items()}


@given(corpus_strategy, st.sampled_from([1, 2, 4, 16]))
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_batched_trainer_bit_equals_sequential(spark, token_lists, batch):
    """The exact stop-and-truncate batching rule must reproduce the
    sequential merge SEQUENCE bit-for-bit on tie-heavy tiny corpora —
    exactly the regime where naive 'disjoint pairs commute' batching
    breaks (a new pair can lex-outrank a later batch member on a
    count tie)."""
    from msstreamingstack_spark.operators.bpe import bpe_train_batched

    rounds = 6
    texts = [" ".join(toks) for toks in token_lists]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, vocab = bpe_train_batched(docs, rounds=rounds, batch=batch)
    want, wsyms = _bpe_model(texts, rounds)
    assert merges == want
    got_syms = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got_syms == {w: " ".join(s) for w, s in wsyms.items()}


@given(corpus_strategy)
@settings(max_examples=10, deadline=None)
def test_local_trainer_bit_equals_sequential(spark, token_lists):
    """bpe_train_local (driver-side incremental loop on the collected
    vocab — the O(1)-job default) vs the Python reference: merges AND
    final segmentation."""
    from msstreamingstack_spark.operators.bpe import bpe_train_local

    rounds = 6
    texts = [" ".join(toks) for toks in token_lists]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, vocab = bpe_train_local(docs, rounds=rounds)
    want, wsyms = _bpe_model(texts, rounds)
    assert merges == want
    got_syms = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got_syms == {w: " ".join(s) for w, s in wsyms.items()}


def test_local_trainer_256_merges_in_few_jobs(spark, sf_smoke):
    """The r8 verdict's done-bar: a 256-merge train must cost <= 20
    Spark jobs (the sequential loop costs 256+). Corpus: testdata
    columns unioned for enough pair capacity (~530 possible merges).
    Also bit-checks the full 256-merge table vs the Python model."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.operators.bpe import bpe_train_local

    texts = []
    for tbl, col in [
        ("documents", "text"),
        ("events", "props"),
        ("nation", "n_name"),
        ("part", "p_name"),
        ("part", "p_type"),
        ("region", "r_name"),
    ]:
        df = spark.read.parquet(f"{sf_smoke}/{tbl}.parquet")
        texts.append(df.select(F.col(col).cast("string").alias("text")))
    corpus = texts[0]
    for t in texts[1:]:
        corpus = corpus.unionAll(t)
    docs = corpus.withColumn(
        "doc_id", F.monotonically_increasing_id()
    ).select("doc_id", "text")
    sc = spark.sparkContext
    sc.setJobGroup("bpe-local-256", "job-count pin")
    try:
        merges, _vocab = bpe_train_local(docs, rounds=256)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-local-256")
    assert len(merges) == 256, len(merges)
    assert len(jobs) <= 20, f"{len(jobs)} jobs for 256 merges"
    rows = [(r["text"],) for r in docs.collect()]
    want, _ = _bpe_model([t for (t,) in rows], 256)
    assert merges == want


def test_duckdb_twin_handles_empty_words(spark):
    """ADVICE r8 (medium): DuckDB's array_to_string([], chr(32)) is
    NULL, so empty words ('' from consecutive/leading/trailing spaces)
    NULLed the twin's char-split while Spark's otherwise('') guard
    counted 1 symbol. The COALESCE guard in _bpe_rounds_cte r0 and the
    pinned fold base must keep both engines bit-equal on these legal
    inputs — the fixtures the driver uses contain none, so only this
    test holds the line."""
    import duckdb
    import pandas as pd

    from msstreamingstack_spark.operators.bpe import (
        bpe_learn_merges,
        bpe_learn_merges_sql,
        bpe_segment_corpus,
        bpe_segment_corpus_sql,
        bpe_segment_pinned,
        bpe_segment_pinned_sql,
    )
    from tests.oracle_harness import compare

    rows = [(0, ""), (1, "a  b"), (2, " ab"), (3, "ab "), (4, "aa ab b")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    ok, msg = compare(
        bpe_learn_merges(docs, rounds=3), con, bpe_learn_merges_sql(rounds=3)
    )
    assert ok, f"learn: {msg}"
    ok, msg = compare(
        bpe_segment_corpus(docs, rounds=3),
        con,
        bpe_segment_corpus_sql(rounds=3),
    )
    assert ok, f"segment: {msg}"
    ok, msg = compare(
        bpe_segment_pinned(docs), con, bpe_segment_pinned_sql()
    )
    assert ok, f"pinned: {msg}"


def test_pinned_segmentation_matches_trained_on_fit_corpus(spark):
    """bpe_segment_pinned (serving, no training loop) must reproduce
    bpe_segment_corpus exactly on the corpus the pin was fitted on —
    the pin-faithfulness contract every resources/*.json model keeps."""
    from msstreamingstack_spark.operators.bpe import (
        bpe_segment_corpus,
        bpe_segment_pinned,
        load_bpe_pinned,
    )
    from msstreamingstack_spark.sources.tables import load_table

    pin = load_bpe_pinned()
    sf = pin["meta"]["fit_sf"]
    docs = load_table(spark, sf, "documents")
    trained = sorted(
        tuple(r) for r in bpe_segment_corpus(docs, pin["rounds"]).collect()
    )
    served = sorted(tuple(r) for r in bpe_segment_pinned(docs).collect())
    assert served == trained
