"""Property test: dedup_chunk_rewrite vs a single-threaded Python
model — random small corpora over a tiny vocabulary produce aligned
copies, partial-chunk tails, full duplicates, and single-chunk docs
without hand-picking the cases. The model applies the same rule
directly: each distinct chunk content keeps only its first
(doc_id, chunk_idx) occurrence, and documents are reassembled from
their surviving chunks in order."""

from __future__ import annotations

import math
import os
import tempfile

from hypothesis import given, settings, strategies as st

from msstreamingstack_spark.queries_extensions import CHUNK_DUP_TOKENS

WORDS = ["x", "y", "z"]
K = CHUNK_DUP_TOKENS

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=3 * K),
    min_size=1,
    max_size=8,
)


def _model(token_lists):
    chunks = []
    for doc_id, toks in enumerate(token_lists):
        for i in range(math.ceil(len(toks) / K)):
            chunks.append((doc_id, i, " ".join(toks[i * K:(i + 1) * K])))
    first = {}
    for doc_id, i, ct in sorted(chunks):
        first.setdefault(ct, (doc_id, i))
    out = {}
    for doc_id, toks in enumerate(token_lists):
        n = math.ceil(len(toks) / K)
        kept = [
            " ".join(toks[i * K:(i + 1) * K])
            for i in range(n)
            if first[" ".join(toks[i * K:(i + 1) * K])] == (doc_id, i)
        ]
        out[doc_id] = (n, len(kept), " ".join(kept))
    return out


@given(corpus_strategy)
@settings(max_examples=8, deadline=None)
def test_chunk_rewrite_matches_python_model(spark, token_lists):
    from msstreamingstack_spark.queries import REGISTRY

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tmp = tempfile.mkdtemp()
    df.toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
        for r in REGISTRY["dedup_chunk_rewrite"].builder(spark, tmp).collect()
    }
    assert got == _model(token_lists)
