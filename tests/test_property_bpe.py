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

WORDS = ["a", "b", "ab", "aab", "ba", "aa", "abc", "ccc"]

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
