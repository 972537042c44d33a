"""Property test: substring_dup_spans vs a single-threaded Python
model — random small corpora over a tiny vocabulary produce heavy
window collisions, overlap chains, full-doc duplication, and
under-window docs without hand-picking the cases. The model computes
the same three quantities directly: windows whose token content
appears in another doc, and the interval-union token coverage of
those windows."""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings, strategies as st

from msstreamingstack_spark.queries_extensions import SUBSTR_DUP_W

WORDS = ["x", "y", "z"]
W = SUBSTR_DUP_W

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=3 * W),
    min_size=1,
    max_size=8,
)


def _model(token_lists):
    wins = {
        i: [
            tuple(toks[j : j + W]) for j in range(len(toks) - W + 1)
        ]
        for i, toks in enumerate(token_lists)
    }
    owners = {}
    for i, ws in wins.items():
        for w in set(ws):
            owners.setdefault(w, set()).add(i)
    out = {}
    for i, toks in enumerate(token_lists):
        dup_pos = [
            j
            for j, w in enumerate(wins[i])
            if len(owners[w]) > 1
        ]
        covered = set()
        for j in dup_pos:
            covered.update(range(j, j + W))
        out[i] = (
            len(toks),
            max(len(toks) - W + 1, 0),
            len(dup_pos),
            len(covered),
        )
    return out


@given(corpus_strategy)
@settings(max_examples=8, deadline=None)
def test_substring_dup_matches_python_model(spark, token_lists):
    from msstreamingstack_spark.queries import REGISTRY

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tmp = tempfile.mkdtemp()
    df.toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_token_cov"],
        )
        for r in REGISTRY["substring_dup_spans"].builder(spark, tmp).collect()
    }
    assert got == _model(token_lists)
