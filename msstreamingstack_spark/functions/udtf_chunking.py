"""Python UDTF surface (SURVEY.md §2.7 — the reference has NO UDTF;
this is the modern-Spark table-function capability added on top).

``TokenChunker``: splits a document into fixed-size token chunks —
the context-window chunking step of an LLM training-data pipeline
(doc → N model-sized pieces). One input row fans out to ceil(n/K)
output rows; the UDTF runs Arrow-batched per partition, no shuffle.

The same transform is SQL-expressible (slice + unnest), which is what
makes the queries-registry entry oracle-checkable — the UDTF exists to
demonstrate the table-function API surface on a real pipeline op.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf

CHUNK_TOKENS = 32


@udtf(returnType="chunk_idx: bigint, chunk_text: string, n_tokens: int")
class TokenChunker:
    """eval() per input row; yield one row per chunk."""

    def eval(self, doc_id: int, text: str, chunk_tokens: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        k = chunk_tokens or CHUNK_TOKENS
        for i in range(0, len(toks), k):
            piece = toks[i : i + k]
            yield (i // k, " ".join(piece), len(piece))


def chunk_documents(docs, chunk_tokens: int = CHUNK_TOKENS):
    """documents(doc_id, text, ...) → (doc_id, chunk_idx, chunk_text,
    n_tokens) via the UDTF in a LATERAL JOIN."""
    from pyspark.sql import functions as F

    return docs.select(
        "doc_id",
        F.col("text"),
    ).lateralJoin(
        TokenChunker(F.col("doc_id").outer(), F.col("text").outer(), lit(chunk_tokens))
    ).select("doc_id", "chunk_idx", "chunk_text", "n_tokens")


def chunk_documents_sql(chunk_tokens: int = CHUNK_TOKENS) -> str:
    """DuckDB twin: slice + unnest over the token array."""
    k = chunk_tokens
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / {k}.0) AS BIGINT))) AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx,
       array_to_string(toks[chunk_idx * {k} + 1 : (chunk_idx + 1) * {k}], chr(32))
         AS chunk_text,
       CAST(len(toks[chunk_idx * {k} + 1 : (chunk_idx + 1) * {k}]) AS INTEGER)
         AS n_tokens
FROM idx
"""
