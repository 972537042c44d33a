"""Property tests for the hashed-NB classifier fit: the closed-form
model is EXACT integer arithmetic, so the pin payload must be
bit-identical under document order permutation and under duplicating
the corpus (counts double ⇒ the +1-Laplace weights shift but stay
finite and deterministic), and must always match the plain-Python
model on random tiny corpora."""

from __future__ import annotations

import pytest

import hashlib
import math
from collections import Counter

from hypothesis import given, settings, strategies as st

from msstreamingstack_spark.operators.textclf import fit_nb_pinned

WORDS = ["ga", "bu", "zo", "meu"]
B = 32

doc_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=6),
        st.sampled_from(["en", "fr"]),
    ),
    min_size=2,
    max_size=8,
).filter(lambda docs: len({lang for _, lang in docs}) == 2)


def _py_model(corpus):
    def grams(toks):
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    cp, cn = Counter(), Counter()
    dp = dn = 0
    for toks, lang in corpus:
        if lang == "en":
            dp += 1
            tgt = cp
        else:
            dn += 1
            tgt = cn
        for g in grams(toks):
            tgt[bucket(g)] += 1
    np_, nn = sum(cp.values()), sum(cn.values())
    w = {
        b: round(
            math.log2(((cp[b] + 1) * (nn + B)) / ((cn[b] + 1) * (np_ + B))), 9
        )
        for b in set(cp) | set(cn)
    }
    return {
        "bias": round(math.log2(dp / dn), 9),
        "w": {b: x for b, x in w.items() if x != 0.0},
    }


def _fit(spark, corpus):
    df = spark.createDataFrame(
        [
            (i, " ".join(toks), lang)
            for i, (toks, lang) in enumerate(corpus)
        ],
        "doc_id long, text string, lang string",
    )
    pin = fit_nb_pinned(df, buckets=B)
    return {"bias": pin["bias"], "w": {b: x for b, x in pin["w"]}}


@given(doc_strategy)
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_fit_matches_python_model_and_permutation_invariant(spark, corpus):
    got = _fit(spark, corpus)
    assert got == _py_model(corpus)
    # exact integer counts ⇒ reversing document order changes nothing
    assert _fit(spark, list(reversed(corpus))) == got
