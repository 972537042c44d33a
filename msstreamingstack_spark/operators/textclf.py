"""Hashed linear text classifier (fastText-style) with a pinned model.

The workhorse filter of public LLM data pipelines is a linear
classifier over hashed n-gram counts — fastText (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification") serves both as the
langid gate (lid.176) and, with wiki-vs-crawl labels, as the quality
gate in CCNet/LLaMA-style corpora. This module re-expresses that
kernel Spark-first:

- **features**: unigrams + bigrams hashed into ``B`` buckets with the
  engine's cross-engine-deterministic md5 bucket hash (the same idiom
  as the DSIR operator — DuckDB ``('0x'||substr(md5(g),1,8))::BIGINT``
  == Spark ``conv(substring(md5(g),1,8),16,10)``, bit-exact);
- **weights**: the closed-form Naive-Bayes log-count-ratio
  (Wang & Manning 2012's NB baseline — deterministic, no iterative
  solver, exact-integer inputs), fitted ONCE and **pinned** to
  ``resources/fasttext_pinned.json`` exactly like the IVF quantizer
  (operators/similarity.py): at 100 TB the model is fitted offline on
  a sample and *served*, never refitted per query;
- **serving**: one explode → per-(doc, bucket) fold → broadcast join
  against the B-row weight table → order-free DECIMAL dot product.
  The weight table is O(B) regardless of corpus size (B=2M in
  production fastText — still broadcastable), so the scoring plan has
  ZERO corpus-sized shuffles beyond the feature fold.

Cross-engine determinism: weights are fitted from exact BIGINT counts
(log2 of an exact-integer product ratio, rounded to 9 decimals before
pinning), each per-occurrence term ``c * w`` is round-then-DECIMAL-
summed (order-free), and the bias joins the fold as a DECIMAL literal
— Spark and DuckDB agree bit-for-bit.

The demonstration task on the fixture corpus is English-vs-rest
(the five-language word-soup shares ONE 31-word vocabulary across
languages, so only frequency profiles separate them — the pinned
model still lands ~83% train accuracy vs a 56% base rate); with
wiki-vs-crawl labels the identical kernel is the quality classifier.

The reference engine has no corpus/classifier surface (SURVEY.md §2.5
ABSENT) — this is a north-star extension.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, functions as F

FT_BUCKETS = 1024
FT_ROUND = 9
_PINNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "fasttext_pinned.json",
)
_PINNED_CACHE: dict | None = None


def bucket_hash(col: Column, buckets: int = FT_BUCKETS) -> Column:
    """md5-derived bucket id — bit-exact with the DuckDB twin
    ``TRY_CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % buckets``
    (both take the top 32 hash bits, so the value fits a BIGINT and
    the modulo is on the same non-negative integer)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % buckets
    )


def bucket_hash_sql(expr: str, buckets: int = FT_BUCKETS) -> str:
    return f"TRY_CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT) % {buckets}"


def hashed_gram_counts(
    docs: DataFrame,
    buckets: int = FT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, b, c) — per-document hashed unigram+bigram
    bucket counts. ONE tokenization feeding two explodes (unigrams;
    bigrams via the aligned-slice idiom — no interpreted HOF lambda),
    folded immediately to bucket counts so every downstream join moves
    |distinct (doc, bucket)| ≤ B rows per doc, never occurrences."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(id_col, *keep_cols, toks.alias("t"))
    uni = base.select(id_col, *keep_cols, F.explode("t").alias("g"))
    bi = (
        base.filter(F.size("t") >= 2)
        .select(
            id_col,
            *keep_cols,
            F.explode(
                F.expr(
                    "arrays_zip(slice(t, 1, size(t) - 1), "
                    "slice(t, 2, size(t) - 1))"
                )
            ).alias("bg"),
        )
        .select(
            id_col,
            *keep_cols,
            F.concat_ws(
                " ", F.col("bg").getField("0"), F.col("bg").getField("1")
            ).alias("g"),
        )
    )
    return (
        uni.unionByName(bi)
        .groupBy(id_col, *keep_cols, bucket_hash(F.col("g"), buckets).alias("b"))
        .agg(F.count("*").alias("c"))
    )


def hashed_grams_sql(buckets: int = FT_BUCKETS) -> str:
    """Shared DuckDB CTE prefix: per-(doc, bucket) hashed-gram counts
    (unigrams + aligned-slice bigrams — the engine's bigram-explode
    idiom, since DuckDB can't lateral-reference generate_series)."""
    return f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
uni AS (SELECT doc_id, lang, unnest(t) AS g FROM t),
bi AS (
  SELECT doc_id, lang,
         unnest(t[1:len(t)-1]) || ' ' || unnest(t[2:len(t)]) AS g
  FROM t WHERE len(t) >= 2
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
f AS (
  SELECT doc_id, lang, {bucket_hash_sql('g', buckets)} AS b, COUNT(*) AS c
  FROM grams GROUP BY 1, 2, 3
)"""


def fit_nb_pinned(
    docs: DataFrame,
    buckets: int = FT_BUCKETS,
    pos_predicate: Column | None = None,
    meta: dict | None = None,
) -> dict:
    """Fit the NB log-count-ratio model and return the pin payload.

    ``w_b = round(log2(((cp+1)·(nn+B)) / ((cn+1)·(np+B))), 9)`` with
    exact-integer products (the DSIR discipline — one cast to DOUBLE,
    never a ratio of small ratios), ``bias = round(log2(d+/d-), 9)``.
    The collect is hard-bounded at B rows + 4 scalars — model-sized,
    like the IVF centroid fit, regardless of corpus size."""
    pos = pos_predicate if pos_predicate is not None else F.col("lang") == "en"
    f = hashed_gram_counts(docs, buckets, keep_cols=("lang",)).withColumn(
        "is_pos", pos
    )
    tot = f.groupBy("is_pos").agg(F.sum("c").alias("n")).collect()
    np_ = next((r["n"] for r in tot if r["is_pos"]), 0)
    nn = next((r["n"] for r in tot if not r["is_pos"]), 0)
    docs_by = (
        f.select("doc_id", "is_pos")
        .distinct()
        .groupBy("is_pos")
        .agg(F.count("*").alias("d"))
        .collect()
    )
    dp = next((r["d"] for r in docs_by if r["is_pos"]), 0)
    dn = next((r["d"] for r in docs_by if not r["is_pos"]), 0)
    if min(np_, nn, dp, dn) == 0:
        raise ValueError(
            "textclf fit needs both classes non-empty "
            f"(pos tokens={np_}, neg tokens={nn})"
        )
    per_b = (
        f.groupBy("b")
        .agg(
            F.sum(F.when(F.col("is_pos"), F.col("c")).otherwise(0)).alias("cp"),
            F.sum(F.when(~F.col("is_pos"), F.col("c")).otherwise(0)).alias("cn"),
        )
        .collect()
    )
    import math

    w = {
        int(r["b"]): round(
            math.log2(
                ((r["cp"] + 1) * (nn + buckets))
                / ((r["cn"] + 1) * (np_ + buckets))
            ),
            FT_ROUND,
        )
        for r in sorted(per_b, key=lambda r: r["b"])
    }
    return {
        "meta": dict(meta or {}, buckets=buckets, kind="nb-logratio"),
        "bias": round(math.log2(dp / dn), FT_ROUND),
        "w": [[b, wb] for b, wb in w.items() if wb != 0.0],
    }


def load_pinned() -> dict:
    global _PINNED_CACHE
    if _PINNED_CACHE is None:
        with open(_PINNED_PATH) as fh:
            _PINNED_CACHE = json.load(fh)
    return _PINNED_CACHE


def score_pinned(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, ft_logit, ft_pred_en) with the PINNED model.

    Feature fold → broadcast join on the B-row weight table →
    round-then-DECIMAL dot product + DECIMAL bias, cast to DOUBLE
    once. Buckets absent from the pinned table carry weight 0 (their
    pos/neg rates were equal at fit time) — the left join + coalesce
    keeps them in ``n_grams`` but out of the logit."""
    pin = load_pinned()
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(int(b), float(wb)) for b, wb in pin["w"]], "b bigint, w double"
    )
    f = hashed_gram_counts(docs, pin["meta"]["buckets"])
    term = F.round(F.col("c") * F.col("w"), FT_ROUND).cast("decimal(28,9)")
    bias = F.lit(pin["bias"]).cast("decimal(28,9)")
    return (
        f.join(F.broadcast(wdf), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            # re-cast the sum (decimal(38,9)) back to (28,9) BEFORE
            # adding the bias: Spark's decimal-add result type for
            # (38,9)+(28,9) needs precision 39 > 38 and sheds a scale
            # digit instead (→ 8 decimals), silently rounding the
            # logit off the oracle
            (
                F.coalesce(
                    F.sum(term).cast("decimal(28,9)"),
                    F.lit(0).cast("decimal(28,9)"),
                )
                + bias
            )
            .cast("double")
            .alias("ft_logit"),
        )
        .withColumn("ft_pred_en", F.col("ft_logit") > 0)
    )


def pinned_weights_values_sql() -> str:
    pin = load_pinned()
    return ",\n    ".join(f"({b}, {wb!r})" for b, wb in pin["w"])


def score_pinned_sql() -> str:
    """DuckDB twin of :func:`score_pinned` — pinned weights inline as
    VALUES literals (repr round-trips doubles exactly)."""
    pin = load_pinned()
    b = pin["meta"]["buckets"]
    return f"""
{hashed_grams_sql(b)},
wt(b, w) AS (
  VALUES {pinned_weights_values_sql()}
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(COALESCE(SUM(CAST(round(c * w, {FT_ROUND}) AS DECIMAL(28,9))),
                     CAST(0 AS DECIMAL(28,9)))
            + CAST({pin["bias"]!r} AS DECIMAL(28,9)) AS DOUBLE) AS ft_logit,
       CAST(COALESCE(SUM(CAST(round(c * w, {FT_ROUND}) AS DECIMAL(28,9))),
                     CAST(0 AS DECIMAL(28,9)))
            + CAST({pin["bias"]!r} AS DECIMAL(28,9)) AS DOUBLE) > 0
         AS ft_pred_en
FROM f LEFT JOIN wt USING (b)
GROUP BY doc_id
"""
