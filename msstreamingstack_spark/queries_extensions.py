"""Extension queries: the training-data-pipeline operator families
(dedup, text analysis, similarity search) over the driver's
``documents`` and ``embeddings`` tables.

Approximate/scale-path operators that are inherently not SQL-oracle
material (SRP-ANN) are registered without an oracle — the driver then
records a rows-only check and pytest asserts recall against the exact
baseline (tests/test_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from msstreamingstack_spark.functions.text import (
    BPE_RE,
    char_trigrams_sql,
    clean_text_sql,
    distinct_token_ratio_sql,
    dup_ngram_fraction_sql,
    hash48_sql,
    langid_pred,
    langid_pred_sql,
    md5_hex,
    shingles,
    shingles_sql,
    stop_count,
    stop_count_sql,
    token_count,
    token_count_sql,
)
from msstreamingstack_spark.operators.dedup import (
    EXACT_DEDUP_SQL,
    doc_shingle_hashes_sql,
    eval_overlap_sql,
    exact_dedup,
    minhash_cross_sql,
    minhash_lsh_pairs,
    minhash_lsh_sql,
    ngram_contamination_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_sql,
    ngram_span_scrub_sql,
    simhash_pairs,
    simhash_pairs_sql,
    simhash_pairs_wide,
    simhash_pairs_wide_sql,
)
from msstreamingstack_spark.operators.similarity import (
    COS_ROUND,
    brute_force_topk,
    brute_force_topk_sql,
    cosine_sql,
    quantize_int8_sql,
    quantized_rescore_sql,
    srp_ann_sql,
    srp_ann_topk,
)
from msstreamingstack_spark.queries import register
from msstreamingstack_spark.sources.tables import load_table, spread

JACCARD_T = 0.8
N_QUERY_VECS = 10


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@register(
    "text_stats",
    f"""
SELECT doc_id, lang, source,
       length(text) AS char_len,
       {token_count_sql('text')} AS n_tokens,
       {token_count_sql('text', BPE_RE)} AS n_bpe_tokens,
       {stop_count_sql('text')} AS n_stopwords,
       CAST({stop_count_sql('text')} AS DOUBLE)
         / CAST({token_count_sql('text')} AS DOUBLE) AS stop_ratio,
       CAST(length(text) AS DOUBLE)
         / CAST({token_count_sql('text')} AS DOUBLE) AS avg_token_len
FROM documents
""",
    tags=("extension", "text"),
    doc="Per-document quality features: char/token/BPE-ish token "
    "counts, stopword ratio, mean token length — all JVM-side regex/"
    "array expressions, no UDFs.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    text = F.col("text")
    n_tok = token_count(text)
    n_stop = stop_count(text)
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length(text).alias("char_len"),
        n_tok.alias("n_tokens"),
        token_count(text, BPE_RE).alias("n_bpe_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stop_ratio"),
        (F.length(text).cast("double") / n_tok.cast("double")).alias("avg_token_len"),
    )


@register(
    "langid_heuristic",
    f"""
SELECT doc_id, lang AS lang_label, {langid_pred_sql('text')} AS lang_pred
FROM documents
""",
    tags=("extension", "text", "langid"),
    doc="Stopword-profile language heuristic (argmax over per-language "
    "profiles, deterministic tie-break by profile precedence).",
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        langid_pred(F.col("text")).alias("lang_pred"),
    )


@register(
    "doc_fingerprints",
    f"""
SELECT doc_id, md5(text) AS content_md5,
       list_min(list_transform({shingles_sql('text', 5)}, s -> md5(s)))
         AS min_shingle_md5
FROM documents
""",
    tags=("extension", "text", "fingerprint"),
    doc="Content fingerprints: whole-document digest + min 5-gram "
    "shingle digest (winnowing-style rolling fingerprint).",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        md5_hex(F.col("text")).alias("content_md5"),
        F.array_min(
            F.transform(shingles(F.col("text"), 5), lambda s: F.md5(s.cast("binary")))
        ).alias("min_shingle_md5"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    EXACT_DEDUP_SQL,
    tags=("extension", "dedup"),
    doc="Exact dedup: md5 content digest, canonical id per group, "
    "duplicate flag. Single shuffle on the digest.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(spread(load_table(spark, sf_dir, "documents")))


@register(
    "dedup_ngram_jaccard",
    ngram_jaccard_sql(JACCARD_T),
    tags=("extension", "dedup"),
    doc="Exact near-dup pairs by word-3-gram jaccard ≥ 0.8 via a "
    "shingle-hash inverted-index self-join (only 48-bit longs shuffle).",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(spread(load_table(spark, sf_dir, "documents")), JACCARD_T)


@register(
    "dedup_minhash_lsh",
    minhash_lsh_sql(JACCARD_T),
    tags=("extension", "dedup", "lsh"),
    doc="MinHash(16)+banded LSH(8×2) candidates, verified with exact "
    "jaccard ≥ 0.8. Deterministic fixed-permutation hashing makes even "
    "the LSH stage oracle-checkable bit-for-bit.",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(spread(load_table(spark, sf_dir, "documents")), JACCARD_T)


@register(
    "dedup_simhash_pairs",
    simhash_pairs_sql(6),
    tags=("extension", "dedup", "simhash"),
    doc="48-bit weighted simhash near-dup pairs (hamming ≤ 6); "
    "size-dispatched band-subset candidate generator with emit-once "
    "verification (r12) — see dedup_simhash_pairs_wide for the "
    "corpus-scale twin.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(spread(load_table(spark, sf_dir, "documents")), 6)


@register(
    "dedup_simhash_pairs_wide",
    simhash_pairs_wide_sql(6),
    tags=("extension", "dedup", "simhash", "twin", "scale"),
    doc="60-bit wide-fingerprint simhash near-dup pairs (hamming ≤ 6 "
    "over 60 bits) — the scale twin of dedup_simhash_pairs: a "
    "STRICTER near-dup predicate whose 24-bit band-subset keys keep "
    "the banded candidate join sub-quadratic where the 48-bit "
    "kernel's collision tail goes hot past ~10^5 docs (SCALE64_r12: "
    "16×→64× step 3.45 vs 6.9 for 4× data). Priced like the other "
    "insurance twins: costs ~2.6× the declared kernel at bench SF, "
    "pays for itself at corpus scale.",
)
def q_dedup_simhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs_wide(
        spread(load_table(spark, sf_dir, "documents")), 6
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
@register(
    "similarity_topk_cosine",
    brute_force_topk_sql(k=5, n_queries=N_QUERY_VECS),
    tags=("extension", "similarity"),
    doc="Brute-force cosine top-5 for the first 10 query vectors — the "
    "exact ANN baseline; query side broadcast, dot product via "
    "zip_with/aggregate fold (JVM, no UDF).",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(emb, queries, k=5)


@register(
    "similarity_ann_srp",
    srp_ann_sql(k=5, n_queries=N_QUERY_VECS),
    tags=("extension", "similarity", "ann"),
    doc="Sign-random-projection ANN top-5 (8-table × 4-plane bucket "
    "LSH, exact cosine within candidates). Approximate vs brute force "
    "(recall asserted in tests/test_extensions.py) yet fully "
    "deterministic — md5-derived planes inline into the DuckDB oracle, "
    "so even the LSH stage is hash-checked bit-for-bit, like "
    "dedup_minhash_lsh.",
)
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return srp_ann_topk(emb, queries, k=5)


@register(
    "similarity_ann_quantized",
    quantized_rescore_sql(k=5, shortlist_factor=4, n_queries=N_QUERY_VECS),
    tags=("extension", "similarity", "ann", "quantization"),
    doc="Quantized-scan ANN top-5: corpus pass reads int8 codes only "
    "(4× smaller than float32 — the 100 TB scan stays in executor "
    "memory), one numpy matmul per Arrow batch keeping a running "
    "per-partition top-M; exact float cosine re-ranks the 4k-per-query "
    "shortlist. Deterministic (rounded scores, id tiebreaks) ⇒ "
    "SQL-oracle-checked; recall bound additionally asserted in tests.",
)
def q_similarity_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.similarity import (
        quantized_rescore_topk,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return quantized_rescore_topk(emb, queries, k=5)


@register(
    "embedding_norm_stats",
    """
WITH n AS (
  SELECT label,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
       CAST(SUM(CAST(nrm AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS avg_norm
FROM n GROUP BY label
""",
    tags=("extension", "similarity", "agg"),
    doc="Per-label L2-norm statistics over the embedding column — "
    "vector math (zip_with/aggregate) feeding a grouped aggregate with "
    "the decimal-exact mean pattern.",
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.similarity import norm

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    nrm = norm(F.col("embedding")).alias("nrm")
    return (
        emb.select("label", nrm)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            (
                F.sum(F.col("nrm").cast("decimal(25,12)")).cast("double")
                / F.count("*")
            ).alias("avg_norm"),
        )
    )


@register(
    "repetition_quality",
    f"""
SELECT doc_id,
       {distinct_token_ratio_sql('text')} AS distinct_tok_ratio,
       {dup_ngram_fraction_sql('text', 2)} AS dup_bigram_frac,
       {dup_ngram_fraction_sql('text', 3)} AS dup_trigram_frac,
       {distinct_token_ratio_sql('text')} >= 0.3
         AND {dup_ngram_fraction_sql('text', 3)} <= 0.5 AS passes_quality
FROM documents
""",
    tags=("extension", "text", "quality"),
    doc="Gopher-style repetition signals: distinct-token ratio and "
    "duplicate bi/tri-gram fractions with a composite quality gate — "
    "all per-row expressions inside the scan stage, no shuffle.",
)
def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.functions.text import (
        distinct_token_ratio,
        dup_ngram_fraction,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    text = F.col("text")
    dtr = distinct_token_ratio(text)
    tri = dup_ngram_fraction(text, 3)
    return d.select(
        "doc_id",
        dtr.alias("distinct_tok_ratio"),
        dup_ngram_fraction(text, 2).alias("dup_bigram_frac"),
        tri.alias("dup_trigram_frac"),
        ((dtr >= 0.3) & (tri <= 0.5)).alias("passes_quality"),
    )


@register(
    "text_cleaning",
    f"""
SELECT doc_id,
       {clean_text_sql('text')} AS cleaned,
       length({clean_text_sql('text')}) AS cleaned_len,
       length(text) AS raw_len
FROM documents
""",
    tags=("extension", "text", "cleaning"),
    doc="Markup-strip + whitespace-collapse normalization (the "
    "ingest-side cleaning pass of a training-data pipeline); JVM "
    "regex only.",
)
def q_text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.functions.text import clean_text

    d = spread(load_table(spark, sf_dir, "documents"))
    cleaned = clean_text(F.col("text"))
    return d.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.length(cleaned).alias("cleaned_len"),
        F.length("text").alias("raw_len"),
    )


from msstreamingstack_spark.operators.dedup import dfcapped_jaccard_sql  # noqa: E402


@register(
    "dedup_jaccard_dfcapped",
    dfcapped_jaccard_sql(JACCARD_T, df_cap=5),
    tags=("extension", "dedup", "skew"),
    doc="ngram-jaccard dedup over a df-capped shingle universe: "
    "shingles in more than df_cap docs (boilerplate) are dropped "
    "before pair generation, bounding every shingle's join fan-out at "
    "df_cap^2 — the mitigation that keeps shingle-join dedup feasible "
    "on corpora where one license header appears on millions of "
    "pages. Cap=5 here so the cap provably bites at sf0.01 (max df 7).",
)
def q_dedup_jaccard_dfcapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.dedup import dfcapped_jaccard_pairs

    return dfcapped_jaccard_pairs(
        spread(load_table(spark, sf_dir, "documents")), JACCARD_T, df_cap=5
    )


# ---------------------------------------------------------------------------
# Deterministic splits & corpus mixing — the two bookkeeping operators
# every training-data pipeline needs around the cleaning/dedup stages.
# Both are pure JVM expression maps (md5 -> bucket) + one small
# aggregate: no shuffle on the wide data, no RNG, stable under
# retries/speculation and across runs — which is exactly why hash
# splits beat rand() splits at 100 TB (a re-run or a late retry must
# not reassign rows). Beyond-reference extension (SURVEY.md §2.5).
# ---------------------------------------------------------------------------
SPLIT_BUCKET_SQL = (
    "TRY_CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 10000"
)


@register(
    "hash_split_assign",
    f"""
WITH b AS (
  SELECT doc_id, n_chars, {SPLIT_BUCKET_SQL} AS bucket FROM documents
),
s AS (
  SELECT CASE WHEN bucket < 9000 THEN 'train'
              WHEN bucket < 9500 THEN 'val'
              ELSE 'test' END AS split,
         n_chars
  FROM b
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(25,6))) AS DOUBLE) AS total_chars
FROM s GROUP BY split
""",
    tags=("extension", "pipeline", "split"),
    doc="Deterministic 90/5/5 train/val/test assignment from an md5 "
    "bucket of the document id (Spark conv(hex,16,10) == DuckDB "
    "0x-cast, checked bit-exact). One narrow map + a 3-group "
    "aggregate; assignment is a pure function of the id, so adding "
    "data never reshuffles existing rows between splits.",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10000
    )
    split = (
        F.when(bucket < 9000, "train").when(bucket < 9500, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_chars"),
        )
    )


@register(
    "mix_weighted_sources",
    f"""
WITH b AS (
  SELECT doc_id, source, {SPLIT_BUCKET_SQL} AS bucket FROM documents
),
w AS (
  SELECT source, bucket,
         CASE WHEN source IN ('src0','src1','src2') THEN 10000
              WHEN source IN ('src3','src4','src5','src6') THEN 5000
              ELSE 2000 END AS keep_below
  FROM b
)
SELECT source, COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE bucket < keep_below) AS n_kept
FROM w GROUP BY source
""",
    tags=("extension", "pipeline", "sampling"),
    doc="Weighted corpus mixing by deterministic hash thresholding: "
    "high-quality sources kept at 100%%, mid at 50%%, the tail at "
    "20%% — the down-sampling step that hits a target pretraining "
    "mixture without materializing an intermediate shuffle or RNG "
    "state. Kept-set membership is stable across runs and "
    "incremental loads; per-source keep rates are data, not code "
    "(join a rates dim in production).",
)
def q_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10000
    )
    keep_below = (
        F.when(F.col("source").isin("src0", "src1", "src2"), 10000)
        .when(F.col("source").isin("src3", "src4", "src5", "src6"), 5000)
        .otherwise(2000)
    )
    return (
        d.select("source", bucket.alias("bucket"), keep_below.alias("keep_below"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(F.col("bucket") < F.col("keep_below"), 1)).alias(
                "n_kept"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Composite: the end-to-end pretraining-corpus pipeline in ONE plan.
# clean -> language gate -> quality gate -> exact dedup -> split ->
# per-split stats; every stage is the registered operator's exact
# expression (shared constants/SQL twins), so the composition is
# oracle-checkable end to end. At scale this whole chain is one scan,
# one window shuffle (dedup digest), one split aggregate — filters
# run inside the scan stage BEFORE the shuffle, so the dedup window
# only pays for surviving rows.
# ---------------------------------------------------------------------------
@register(
    "pipeline_pretrain_corpus",
    f"""
WITH scored AS (
  SELECT doc_id, text,
         {langid_pred_sql('text')} AS lang_pred,
         {token_count_sql('text')} AS n_tokens,
         {distinct_token_ratio_sql('text')} AS dtr,
         {dup_ngram_fraction_sql('text', 3)} AS tri_frac
  FROM documents
),
gated AS (
  SELECT * FROM scored
  WHERE lang_pred = 'en' AND n_tokens BETWEEN 10 AND 10000
    AND dtr >= 0.3 AND tri_frac <= 0.5
),
deduped AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
    FROM gated
  ) WHERE doc_id = keep_id
),
split AS (
  SELECT CASE WHEN {SPLIT_BUCKET_SQL} < 9000 THEN 'train'
              WHEN {SPLIT_BUCKET_SQL} < 9500 THEN 'val'
              ELSE 'test' END AS split,
         n_tokens
  FROM deduped
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS DECIMAL(25,6))) AS DOUBLE) AS total_tokens
FROM split GROUP BY split
""",
    tags=("extension", "pipeline", "composite"),
    doc="The full training-data pipeline as one declarative plan: "
    "language-ID gate + Gopher-style quality gate + token-length "
    "bounds (all per-row expressions, fused into the scan stage), "
    "exact content dedup (one digest-window shuffle over survivors "
    "only), deterministic hash split, per-split token accounting. "
    "Composes the registered operators' exact expressions, so the "
    "whole chain hash-matches the DuckDB oracle.",
)
def q_pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from msstreamingstack_spark.functions.text import (
        distinct_token_ratio,
        dup_ngram_fraction,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    text = F.col("text")
    scored = d.select(
        "doc_id",
        "text",
        langid_pred(text).alias("lang_pred"),
        token_count(text).alias("n_tokens"),
        distinct_token_ratio(text).alias("dtr"),
        dup_ngram_fraction(text, 3).alias("tri_frac"),
    )
    gated = scored.filter(
        (F.col("lang_pred") == "en")
        & F.col("n_tokens").between(10, 10000)
        & (F.col("dtr") >= 0.3)
        & (F.col("tri_frac") <= 0.5)
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    deduped = gated.withColumn("keep_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keep_id")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10000
    )
    split = (
        F.when(bucket < 9000, "train").when(bucket < 9500, "val").otherwise("test")
    )
    return (
        deduped.select(split.alias("split"), "n_tokens")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tokens").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-token-budget training
# chunks. Packing is per-source shard (PARTITION BY source) — a global
# cumulative sum would funnel every row through one partition, which
# is exactly the shape that cannot exist at 100 TB; per-shard packing
# keeps the window parallel across sources and matches how training
# shards are actually built. Greedy boundary rule: a doc starts a new
# chunk when the running total before it crosses a capacity multiple.
# ---------------------------------------------------------------------------
PACK_CAPACITY = 2048


@register(
    "pack_sequences_greedy",
    f"""
WITH toks AS (
  SELECT doc_id, source, {token_count_sql('text')} AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens) / {PACK_CAPACITY}) AS BIGINT) AS chunk_idx
  FROM toks
)
SELECT source, chunk_idx, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
FROM packed
GROUP BY source, chunk_idx
""",
    tags=("extension", "pipeline", "packing"),
    doc=f"Greedy sequence packing into {PACK_CAPACITY}-token training "
    "chunks: running token total per source shard (deterministic "
    "doc_id order), chunk index = pre-document total div capacity, "
    "then per-chunk fill stats. One window shuffle on source at bench "
    "SF; at corpus scale one source's slice is one task, so the "
    "skew_robust twin decomposes the cumsum over (source, doc-range "
    "bucket) — bit-identical, see operators/windows.py. The per-chunk "
    "token sum may overshoot capacity by at most one document (greedy "
    "semantics, documents not split).",
)
def q_pack_sequences(
    spark: SparkSession, sf_dir: str, skew_robust: bool = False
) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    if skew_robust:
        # source cardinality is FIXED (a handful of domains) while
        # rows grow with the corpus, so a window partitioned by bare
        # source pins one source's entire corpus slice to one task at
        # 100 TB — and windows, unlike joins, cannot be AQE-skew-split.
        # The prefix sum decomposes exactly over (source, doc_id-range
        # bucket): long partials re-add exactly (operators/windows.py),
        # so the twin is bit-identical; parity + plan pinned in tests.
        from msstreamingstack_spark.operators.windows import (
            bucketed_running_sum,
        )

        cum = bucketed_running_sum(
            toks,
            "source",
            ("doc_id",),
            "n_tokens",
            F.floor(F.col("doc_id") / 4096),
            out="_cum",
            prec="long",
        )
        packed = cum.withColumn(
            "chunk_idx",
            F.floor(
                (F.col("_cum") - F.col("n_tokens")) / PACK_CAPACITY
            ).cast("bigint"),
        ).drop("_cum")
    else:
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        packed = toks.withColumn(
            "chunk_idx",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / PACK_CAPACITY
            ).cast("bigint"),
        )
    return packed.groupBy("source", "chunk_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# Fixed-block packing — the GPT-style concat-and-chunk twin of
# pack_sequences_greedy: the per-shard token stream (one EOD token
# appended per doc) is sliced into EXACT BLOCK_TOKENS windows, so a
# document may straddle a block boundary; each block reports how many
# documents touch it, how many start in it, and its fill.
# ---------------------------------------------------------------------------
BLOCK_TOKENS = 512


@register(
    "pack_blocks_fixed",
    f"""
WITH toks AS (
  SELECT doc_id, source, {token_count_sql('text')} + 1 AS n_tokens
  FROM documents
),
spans AS (
  SELECT source, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS fin
  FROM toks
),
blocks AS (
  SELECT source, doc_id, n_tokens, fin - n_tokens AS st, fin,
         unnest(generate_series((fin - n_tokens) // {BLOCK_TOKENS},
                                (fin - 1) // {BLOCK_TOKENS})) AS block_id
  FROM spans
)
SELECT source, block_id,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN st // {BLOCK_TOKENS} = block_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_starts,
       CAST(SUM(LEAST(fin, (block_id + 1) * {BLOCK_TOKENS})
                - GREATEST(st, block_id * {BLOCK_TOKENS})) AS BIGINT)
         AS block_tokens
FROM blocks
GROUP BY source, block_id
""",
    tags=("extension", "pipeline", "packing"),
    doc=f"Concat-and-chunk packing: per source shard, documents are "
    "concatenated in deterministic doc_id order (one EOD token "
    f"appended each) and the token stream is sliced into exact "
    f"{BLOCK_TOKENS}-token training blocks — documents STRADDLE "
    "boundaries (every block is full), unlike pack_sequences_greedy "
    "where documents stay whole and chunks under/overfill. Per block: "
    "documents touching it, documents starting in it, and fill "
    "(= capacity except each shard's last block). The doc span "
    "[cumsum - n, cumsum) explodes to its covered block ids via "
    "sequence() — fan-out bounded by n_tokens/block + 1 per doc. One "
    "window shuffle per source shard (never a global cumsum — the "
    "single-partition shape that cannot exist at 100 TB) plus one "
    "keyed re-aggregation.",
)
def q_pack_blocks_fixed(
    spark: SparkSession, sf_dir: str, skew_robust: bool = False
) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        "source",
        (token_count(F.col("text")) + 1).alias("n_tokens"),
    )
    if skew_robust:
        # same decomposition as q_pack_sequences — see its comment
        from msstreamingstack_spark.operators.windows import (
            bucketed_running_sum,
        )

        spans = bucketed_running_sum(
            toks,
            "source",
            ("doc_id",),
            "n_tokens",
            F.floor(F.col("doc_id") / 4096),
            out="fin",
            prec="long",
        ).withColumn("st", F.col("fin") - F.col("n_tokens"))
    else:
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        spans = toks.withColumn(
            "fin", F.sum("n_tokens").over(w)
        ).withColumn("st", F.col("fin") - F.col("n_tokens"))
    blocks = spans.withColumn(
        "block_id",
        F.explode(
            F.sequence(
                F.expr(f"st div {BLOCK_TOKENS}"),
                F.expr(f"(fin - 1) div {BLOCK_TOKENS}"),
            )
        ),
    )
    cap = F.lit(BLOCK_TOKENS).cast("long")
    return blocks.groupBy("source", "block_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.expr(f"st div {BLOCK_TOKENS}") == F.col("block_id"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_starts"),
        F.sum(
            F.least(F.col("fin"), (F.col("block_id") + 1) * cap)
            - F.greatest(F.col("st"), F.col("block_id") * cap)
        )
        .cast("long")
        .alias("block_tokens"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing, stratified sampling, shard assignment — the remaining
# bookkeeping operators a pretraining corpus build needs between
# cleaning and shard write-out. All three are pure narrow expression
# maps plus at most one keyed window shuffle, so they compose into the
# scan stage of a larger pipeline at 100 TB.
# ---------------------------------------------------------------------------
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_URL_RE = "https?://[A-Za-z0-9./_-]+"
PII_PHONE_RE = "\\+\\d[\\d-]{6,}\\d"

# The synthetic corpus is PII-free word salad, so the query first
# injects deterministic synthetic PII (a pure function of doc_id) into
# ~3/7 of the rows; the scrub regexes are then genuinely exercised and
# the oracle checks both the counts and the redacted text bit-exactly.
_PII_AUG_SQL = """
SELECT doc_id,
       text || CASE
         WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com for info'
         WHEN doc_id % 7 = 3 THEN ' see https://data.example.org/doc/'
              || CAST(doc_id AS VARCHAR) || ' online'
         WHEN doc_id % 7 = 5 THEN ' call +1-555-'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') || ' soon'
         ELSE '' END AS text
FROM documents
"""


@register(
    "pii_scrub",
    f"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PII_URL_RE}')) AS n_urls,
       len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_URL_RE}', '<URL>', 'g'),
         '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM aug
""",
    tags=("extension", "pipeline", "text"),
    doc="PII redaction pass: email/URL/phone detection counts plus "
    "redacted text, as three chained JVM-side regexp_replace calls "
    "(RE2-compatible patterns, identical semantics in DuckDB with "
    "the 'g' flag). A narrow per-row map — fuses into the scan, no "
    "shuffle, no UDF. Synthetic PII is injected deterministically "
    "because the fixture corpus contains none.",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com for info"),
                ),
            )
            .when(
                F.col("doc_id") % 7 == 3,
                F.concat(
                    F.lit(" see https://data.example.org/doc/"),
                    F.col("doc_id").cast("string"),
                    F.lit(" online"),
                ),
            )
            .when(
                F.col("doc_id") % 7 == 5,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 4, "0"),
                    F.lit(" soon"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    t = F.col("text")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_URL_RE,
            "<URL>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_URL_RE)).alias("n_urls"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phones"),
        clean.alias("clean_text"),
    )


RESERVOIR_K = 50
RESERVOIR_PREFILTER = 40  # keep hash%100 < 40 before the exact window


@register(
    "sample_reservoir_stratified",
    f"""
WITH h AS (
  SELECT lang, doc_id,
         {hash48_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
  WHERE {hash48_sql("CAST(doc_id AS VARCHAR)")} % 100 < {RESERVOIR_PREFILTER}
),
r AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id)
           AS sample_rank
  FROM h
)
SELECT lang, doc_id, sample_rank FROM r WHERE sample_rank <= {RESERVOIR_K}
""",
    tags=("extension", "pipeline", "sampling"),
    doc=f"Deterministic reservoir-style sample of {RESERVOIR_K} docs "
    "per language stratum: rank by a 48-bit id hash inside each "
    "stratum, keep the lowest-hash k — equivalent to a uniform "
    "without-replacement sample that is stable across runs, retries "
    "and incremental loads (a new row only enters the reservoir by "
    "displacing the current max hash). The hash prefilter discards "
    f"~{100 - RESERVOIR_PREFILTER}%% of rows BEFORE the per-stratum "
    "window shuffle — a constant fraction, not a bound, so the "
    "skew_robust twin additionally salts the rank (topk_per_key_salted"
    ") to cap the final per-stratum sort at p×k rows.",
)
def q_sample_reservoir(
    spark: SparkSession, sf_dir: str, skew_robust: bool = False
) -> DataFrame:
    from pyspark.sql import Window

    from msstreamingstack_spark.functions.text import hash48

    d = load_table(spark, sf_dir, "documents")
    h = hash48(F.col("doc_id").cast("string"))
    cand = d.select("lang", "doc_id", h.alias("h")).filter(
        (F.col("h") % 100) < RESERVOIR_PREFILTER
    )
    if skew_robust:
        # the % prefilter trims a constant FRACTION, so a stratum's
        # candidate set still grows with the corpus and the bare
        # partitionBy(lang) rank sorts it in one task; the salted twin
        # bounds the final rank input at p×k rows per stratum — exact
        # under the (h, doc_id) total order (operators/windows.py).
        from msstreamingstack_spark.operators.windows import (
            topk_per_key_salted,
        )

        ranked = topk_per_key_salted(
            cand,
            ("lang",),
            ("h", "doc_id"),
            RESERVOIR_K,
            F.col("doc_id"),
            out="sample_rank",
        )
        return ranked.select("lang", "doc_id", "sample_rank")
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        cand.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .select("lang", "doc_id", "sample_rank")
    )


N_SHARDS = 8


@register(
    "shuffle_shard_assign",
    f"""
WITH h AS (
  SELECT doc_id, n_chars,
         {hash48_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
SELECT doc_id,
       h % {N_SHARDS} AS shard,
       ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS} ORDER BY h, doc_id)
         AS pos
FROM h
""",
    tags=("extension", "pipeline", "sharding"),
    doc=f"Deterministic global shuffle into {N_SHARDS} training "
    "shards: shard = id-hash mod N, within-shard position = rank by "
    "the same hash — a seedless Fisher-Yates stand-in whose order is "
    "a pure function of the ids, so retries/speculative tasks and "
    "re-runs produce byte-identical shards. At scale this is "
    "repartition(N, shard) + sortWithinPartitions(h): one shuffle, "
    "then a streaming write of ordered shard files.",
)
def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from msstreamingstack_spark.functions.text import hash48

    d = load_table(spark, sf_dir, "documents")
    h = hash48(F.col("doc_id").cast("string"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"))
        .withColumn("shard", F.col("h") % N_SHARDS)
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


# Every 50th doc stands in for the held-out benchmark set (the eval
# side is an input in production; here it must be a deterministic
# function of the fixture so the oracle agrees).
EVAL_EVERY = 50


@register(
    "decontaminate_eval_overlap",
    eval_overlap_sql(f"d.doc_id % {EVAL_EVERY} = 0"),
    tags=("extension", "pipeline", "decontamination"),
    doc="Benchmark decontamination: per-train-doc shingle-hash overlap "
    "with the eval set's shingle universe. The eval side collapses to "
    "a distinct-hash set and is broadcast (benchmarks are tiny next "
    "to a 100 TB corpus); the train side is one broadcast hash-join "
    "plus a per-doc count — no all-pairs stage, unlike the dedup "
    "kernels this shares its shingle table with.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.dedup import eval_overlap_stats

    d = spread(load_table(spark, sf_dir, "documents"))
    return eval_overlap_stats(d, F.col("doc_id") % EVAL_EVERY == 0)


# Fuzzy decontamination split: a tenth of the corpus plays the
# held-out benchmark (different slice than decontaminate_eval_overlap
# 's 2%, chosen so the fixture actually contains cross-slice
# near-dups to flag).
DECON_MOD, DECON_REM = 10, 7
DECON_JACCARD_T = 0.5


@register(
    "decontaminate_minhash",
    minhash_cross_sql(DECON_MOD, DECON_REM, DECON_JACCARD_T),
    tags=("extension", "pipeline", "decontamination", "lsh"),
    doc="FUZZY benchmark decontamination: train docs sharing a banded-"
    "minhash bucket with any held-out eval doc, verified with exact "
    f"jaccard >= {DECON_JACCARD_T} — the paraphrase-level complement "
    "to decontaminate_eval_overlap's exact shingle-overlap counts "
    "(an eval item lightly rewritten into the crawl never hits the "
    "exact path). Candidate generation is the train x eval bucket "
    "equi-join, bounded by the SMALL eval side's bucket occupancy — "
    "never all-pairs, and cheaper than the dedup self-join at equal "
    "corpus size; at 100 TB the eval buckets broadcast. Shares the "
    "slot-managed shingle table with the dedup family.",
)
def q_decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.dedup import minhash_cross_pairs

    d = spread(load_table(spark, sf_dir, "documents"))
    return minhash_cross_pairs(
        d, F.col("doc_id") % DECON_MOD == DECON_REM, DECON_JACCARD_T
    )


# Verbatim-span decontamination pair (GPT-3 appendix C / PaLM-style):
# same held-out slice as decontaminate_minhash so the three methods
# (exact shingle-overlap fraction, fuzzy minhash, verbatim 13-gram)
# grade the SAME benchmark split and their flag sets are comparable.
_DECON13_PRED_SQL = f"doc_id % {DECON_MOD} = {DECON_REM}"


@register(
    "decontaminate_ngram13",
    ngram_contamination_sql(_DECON13_PRED_SQL),
    tags=("extension", "pipeline", "decontamination", "ngram"),
    doc="VERBATIM benchmark decontamination (GPT-3 appendix-C style "
    "13-gram collision): a train doc is flagged when ANY 13-word "
    "n-gram of a held-out doc appears verbatim, with first/last hit "
    "positions reported so the scrub twin can excise the span rather "
    "than drop the doc. Complements decontaminate_eval_overlap "
    "(aggregate shingle fraction — misses one long quote inside a "
    "big doc) and decontaminate_minhash (paraphrase-level — blind to "
    "positions). ONE train-side pass: positional 13-gram explode "
    "(map-local, only long triples leave the scan), broadcast left "
    "join against the eval gram universe (benchmarks are tiny next "
    "to a 100 TB corpus), one per-doc agg shuffle.",
)
def q_decontaminate_ngram13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.dedup import ngram_contamination

    d = spread(load_table(spark, sf_dir, "documents"))
    return ngram_contamination(d, F.col("doc_id") % DECON_MOD == DECON_REM)


@register(
    "decontaminate_span_scrub",
    ngram_span_scrub_sql(_DECON13_PRED_SQL),
    tags=("extension", "pipeline", "decontamination", "ngram", "rewrite"),
    doc="SURGICAL decontamination — the corpus REWRITE form of "
    "decontaminate_ngram13: every eval-colliding 13-gram span is "
    "excised (overlapping/adjacent spans unioned via the islands "
    "window) and the cleaned text re-emitted for every train doc; "
    "untouched docs pass through, fully-leaked docs come back empty. "
    "Past the broadcast hit join everything runs on the HITS "
    "relation (bounded by the eval gram universe, not the corpus): "
    "the islands window partitions per doc (≤ doc-length rows — no "
    "corpus-growth skew), and only the rare dirty docs pay the "
    "posexplode/rebuild; clean docs are an anti-join projection. "
    "Output clean_text is exact cross-engine (pure word-array "
    "algebra, no floats).",
)
def q_decontaminate_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.dedup import ngram_span_scrub

    d = spread(load_table(spark, sf_dir, "documents"))
    return ngram_span_scrub(d, F.col("doc_id") % DECON_MOD == DECON_REM)


@register(
    "quality_chartrigram_df",
    f"""
WITH tri AS (
  SELECT doc_id, unnest({char_trigrams_sql('text')}) AS t FROM documents
),
freq AS (SELECT t, COUNT(*) AS cnt FROM tri GROUP BY t)
SELECT tri.doc_id,
       COUNT(*) AS n_trigrams,
       round(CAST(SUM(freq.cnt) AS DOUBLE) / COUNT(*), 9) AS avg_tri_df
FROM tri JOIN freq ON tri.t = freq.t
GROUP BY tri.doc_id
""",
    tags=("extension", "text", "quality"),
    doc="CCNet-style statistical quality score without a language "
    "model: per-doc mean corpus frequency of its char trigrams "
    "(garbled/rare text scores low, fluent text high). All-integer "
    "aggregation until one final division ⇒ exact cross-engine. Two "
    "shuffles (corpus freq table, per-doc agg); the freq table is "
    "EXPLICITLY broadcast — char-trigram cardinality is alphabet-"
    "bounded (~|charset|^3 distinct keys regardless of corpus size), "
    "so it is broadcastable at ANY scale, and leaving it to AQE let "
    "the exploded trigram relation re-shuffle (2.93x scale ratio at "
    "4x data before the fix).",
)
def q_quality_chartrigram_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.functions.text import char_trigrams

    d = spread(load_table(spark, sf_dir, "documents"))
    # round 5 plan (same algebra, same hash): fold the explode to
    # per-(doc, trigram) COUNTS first — Σc·cnt / Σc ≡ the occurrence-
    # row mean the oracle states, on the same exact integers. The
    # corpus-freq table re-aggregates the (doc, t) counts instead of a
    # SECOND trigram explosion (the old plan exploded every document
    # twice and joined at occurrence granularity — the worst 16×
    # scaler in SCALE16 at 4.53×), and the broadcast join + final agg
    # now move |distinct (doc, t)| rows, not |occurrences|.
    from msstreamingstack_spark.caching import rotating_persist

    tri_c = rotating_persist(
        d.select("doc_id", F.explode(char_trigrams(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c")),
        # referenced twice (freq build + join side) and the two
        # subtrees do NOT exchange-reuse; persisting the folded counts
        # (≪ occurrence rows, the doc_shingle_hashes discipline) keeps
        # the explode single-pass; slot-rotated so repeated
        # invocations hold ONE cache entry, not one per call
        "quality_chartrigram_df.tri_c",
    )
    # populate before freq forks under a broadcast: the broadcast
    # subtree builds eagerly and would re-run the trigram explode
    # against the unpopulated cache (A/B +13% at sf0.1; the round-8
    # span-scrub lesson, plans/notes.md)
    tri_c.count()
    freq = tri_c.groupBy("t").agg(F.sum("c").alias("cnt"))
    return (
        tri_c.join(F.broadcast(freq), "t")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_trigrams"),
            F.round(
                F.sum(F.col("c") * F.col("cnt")).cast("double") / F.sum("c"),
                9,
            ).alias("avg_tri_df"),
        )
    )


@register(
    "quality_char_entropy",
    """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
freq AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
wp AS (
  SELECT doc_id,
         CAST(c AS DOUBLE) / CAST(SUM(c) OVER (PARTITION BY doc_id) AS DOUBLE)
           AS p
  FROM freq
)
SELECT doc_id,
       CAST(SUM(CAST(round(-p * log2(p), 9) AS DECIMAL(28,9))) AS DOUBLE)
         AS char_entropy
FROM wp GROUP BY doc_id
""",
    tags=("extension", "text", "quality", "entropy"),
    doc="Per-document Shannon entropy over the character distribution "
    "— the cheapest perplexity proxy a corpus filter has: binary "
    "junk, base64 blobs and key-mash score far from natural text "
    "(English prose ≈ 4.0-4.4 bits/char). Distributed as "
    "explode → (doc, char) count → per-doc fold, the token-counting "
    "shuffle shape. Cross-engine determinism: each -p·log2(p) term is "
    "rounded to 9 decimals FIRST, then summed exactly in DECIMAL "
    "(float sum order differs between engines; decimal addition of "
    "identically-rounded terms is order-free).",
)
def q_quality_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")  # split-by-empty yields a trailing ""
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    p = F.col("c") / F.sum("c").over(Window.partitionBy("doc_id"))
    term = F.round(-p * F.log2(p), 9).cast("decimal(28,9)")
    return (
        freq.select("doc_id", term.alias("t"))
        .groupBy("doc_id")
        .agg(F.sum("t").cast("double").alias("char_entropy"))
    )


# Shared by quality_bigram_lm and the quality-weighted budget sampler
# (identical text on both engines is the no-drift guarantee).
#
# LEAVE-ONE-OUT + Laplace: the naive self-trained estimator
# P(w2|w1) = c12/c1 rates a document of globally-UNIQUE bigrams as
# perfectly predictable (its own occurrences are the only support:
# c12 = c1 ⇒ P = 1 ⇒ 0 bits — gibberish would score BEST). Each
# doc's own counts are therefore subtracted from the numerator and
# denominator (e12 = c12 − c, e1 = c1 − d1c) and the estimate is
# Laplace-smoothed over the second-word vocabulary:
# P = (e12 + 1)/(e1 + V). Unsupported bigrams now cost ≈ log2(V)
# bits; text echoed across the corpus stays cheap. All inputs are
# exact BIGINTs, so the doubles agree bit-for-bit cross-engine.
BIGRAM_LM_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bi AS (
  SELECT doc_id,
         unnest(t[1:len(t)-1]) AS w1,
         unnest(t[2:len(t)]) AS w2
  FROM t WHERE len(t) >= 2
),
dbc AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM bi GROUP BY 1, 2, 3),
c12 AS (SELECT w1, w2, SUM(c) AS c12 FROM dbc GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY 1),
d1 AS (SELECT doc_id, w1, SUM(c) AS d1c FROM dbc GROUP BY 1, 2),
v AS (SELECT COUNT(DISTINCT w2) AS vsz FROM dbc)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       round(CAST(SUM(CAST(round(
           -log2(CAST(c12 - c + 1 AS DOUBLE)
                 / CAST(c1 - d1c + vsz AS DOUBLE)) * c, 9)
         AS DECIMAL(28,9))) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 9)
         AS bits_per_bigram
FROM dbc JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
     JOIN d1 USING (doc_id, w1) CROSS JOIN v
GROUP BY doc_id
"""


def bigram_lm_scores(d: DataFrame, skew_robust: bool = False) -> DataFrame:
    """(doc_id, n_bigrams, bits_per_bigram) — the Spark twin of
    BIGRAM_LM_SQL (leave-one-out + Laplace; see the constant's comment
    and q_quality_bigram_lm's docstring for the plan rationale).

    ``skew_robust`` selects the corpus-scale plan (the house
    skew-twin discipline, cf. sessionize_events_bucketed): the default
    window plan computes c12/c1 with ``partitionBy(w1)`` over the FULL
    bigram fold, so every row whose left word is a stopword lands in
    ONE window task — bounded at bench SF (16x ratio 1.45) but growing
    linearly with corpus size at 100 TB, and window partitions, unlike
    join partitions, cannot be AQE-skew-split. The robust plan folds
    c12 through a partial-aggregated groupBy (map-side combine bounds
    hot keys at #tasks rows each), derives c1 as a window over the
    COMPACT bigram-type table (a hot w1's partition is bounded by its
    following-word vocabulary, never by corpus size), and joins back
    on (w1, w2) where AQE skew-split applies. Same-session A/B x4 at
    sf0.1: window 1.18-1.45 s vs hybrid 1.58-1.68 s, values
    bit-identical (integer counts) — the ~25% premium at uniform bench
    scale buys bounded partitions at any scale; parity and both plan
    shapes are pinned in tests."""
    from msstreamingstack_spark.caching import rotating_persist
    from msstreamingstack_spark.functions.text import doc_bigram_counts

    from pyspark.sql import Window

    # chartrigram discipline: referenced by the LM build, the per-doc
    # counts AND the scoring join; slot-rotated so repeat invocations
    # (and token_budget_quality_sample, which calls through here)
    # replace the cache instead of stacking entries
    dbc = rotating_persist(doc_bigram_counts(d), "bigram_lm_scores.dbc")
    # populate before the broadcast freq-table subtrees fork off the
    # cache (A/B +10% at sf0.1; round-8 broadcast-race lesson)
    dbc.count()
    # LM count tables as WINDOW passes instead of re-joining dbc on
    # three different keys (the round-6 plan: 3 aggregate shuffles + 3
    # join shuffles of the bigram fan-out — measured 4.4-8.3 s at
    # sf0.1 and the dominant variance source of the ensemble score).
    # c12 (count of the bigram corpus-wide) and c1 (count of the
    # left-word) SHARE one partitionBy(w1) exchange: the RANGE
    # current-row frame over ORDER BY w2 sums exactly the (w1, w2)
    # peer group, the unbounded frame sums the whole w1 partition.
    # d1c (the doc's own occurrences of w1) is one more exchange on
    # (doc_id, w1), then the per-doc fold — 3 exchanges end-to-end,
    # measured 2.5x faster and flat across repeats. Counts are exact
    # integers, so the values (and the DuckDB oracle) are unchanged.
    w_doc_w1 = Window.partitionBy("doc_id", "w1")
    # scalar |vocab(w2)| broadcast into every row (explicit-broadcast
    # scalar total — the house crossJoin discipline)
    vsz = dbc.agg(F.countDistinct("w2").alias("vsz"))
    if skew_robust:
        # corpus-scale shape: see the docstring. One partial-agg
        # shuffle to the bigram-type table, c1 as a window over THAT
        # (compact; hot-w1 partition <= following-word vocab), one
        # AQE-skew-splittable join back; d1c stays doc-bounded.
        c12t = dbc.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
        c1w = c12t.withColumn(
            "c1", F.sum("c12").over(Window.partitionBy("w1"))
        )
        scored = (
            dbc.join(c1w, ["w1", "w2"])
            .withColumn("d1c", F.sum("c").over(w_doc_w1))
            .crossJoin(F.broadcast(vsz))
        )
    else:
        w_w1 = Window.partitionBy("w1")
        w_w1w2 = (
            Window.partitionBy("w1")
            .orderBy("w2")
            .rangeBetween(Window.currentRow, Window.currentRow)
        )
        scored = (
            dbc.withColumn("c12", F.sum("c").over(w_w1w2))
            .withColumn("c1", F.sum("c").over(w_w1))
            .withColumn("d1c", F.sum("c").over(w_doc_w1))
            .crossJoin(F.broadcast(vsz))
        )
    term = F.round(
        -F.log2(
            (F.col("c12") - F.col("c") + F.lit(1)).cast("double")
            / (F.col("c1") - F.col("d1c") + F.col("vsz")).cast("double")
        )
        * F.col("c"),
        9,
    ).cast("decimal(28,9)")
    return scored.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(term).cast("double") / F.sum("c").cast("double"), 9
        ).alias("bits_per_bigram"),
    )


@register(
    "quality_bigram_lm",
    BIGRAM_LM_SQL,
    tags=("extension", "text", "quality", "lm"),
    doc="Corpus-trained bigram-LM cross-entropy per document — the "
    "perplexity-style quality filter (CCNet's wiki-LM score) without "
    "an external model: LEAVE-ONE-OUT Laplace estimate "
    "P(w2|w1) = (c12 − own + 1)/(c1 − own + V) from the corpus "
    "itself, score = mean -log2 P over the doc's bigram occurrences "
    "(low = text echoed across the corpus, high = junk/outlier "
    "vocabulary; without LOO a doc of globally-unique bigrams is its "
    "own only support and would score a perfect 0 bits). "
    "Plan: ONE bigram explode (aligned arrays_zip slices, no HOF "
    "lambda) folded to per-(doc, bigram) counts; the LM count tables "
    "re-aggregate the fold (never a second explode); occurrence terms "
    "round-then-DECIMAL-sum so the float fold is order-free "
    "cross-engine. Joins stay keyed on the bigram — the LM table is "
    "NOT broadcast because bigram vocabulary, unlike char trigrams, "
    "is corpus-sized at 100 TB.",
)
def q_quality_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_scores(spread(load_table(spark, sf_dir, "documents")))


def _ensemble_oracle() -> str:
    from msstreamingstack_spark.queries import REGISTRY

    ent = REGISTRY["quality_char_entropy"].oracle
    rep = REGISTRY["repetition_quality"].oracle
    lm = REGISTRY["quality_bigram_lm"].oracle

    def zterm(x, mu, sd, null_ok=False):
        guard = f"{x} IS NOT NULL AND {sd} > 0" if null_ok else f"{sd} > 0"
        return f"(CASE WHEN {guard} THEN ({x} - {mu}) / {sd} ELSE 0.0 END)"

    return f"""
WITH sig AS (
  SELECT r.doc_id, e.char_entropy, l.bits_per_bigram, r.distinct_tok_ratio
  FROM ({rep}) r
  JOIN ({ent}) e ON r.doc_id = e.doc_id
  LEFT JOIN ({lm}) l ON r.doc_id = l.doc_id
),
m AS (
  SELECT
    CAST(SUM(CAST(char_entropy AS DECIMAL(28,9))) AS DOUBLE)
      / COUNT(char_entropy) AS mu_e,
    CAST(SUM(CAST(char_entropy * char_entropy AS DECIMAL(38,18))) AS DOUBLE)
      / COUNT(char_entropy) AS m2_e,
    CAST(SUM(CAST(bits_per_bigram AS DECIMAL(28,9))) AS DOUBLE)
      / COUNT(bits_per_bigram) AS mu_l,
    CAST(SUM(CAST(bits_per_bigram * bits_per_bigram AS DECIMAL(38,18))) AS DOUBLE)
      / COUNT(bits_per_bigram) AS m2_l,
    CAST(SUM(CAST(distinct_tok_ratio AS DECIMAL(28,9))) AS DOUBLE)
      / COUNT(distinct_tok_ratio) AS mu_r,
    CAST(SUM(CAST(distinct_tok_ratio * distinct_tok_ratio AS DECIMAL(38,18))) AS DOUBLE)
      / COUNT(distinct_tok_ratio) AS m2_r
  FROM sig
),
sd AS (
  SELECT mu_e, sqrt(greatest(m2_e - mu_e * mu_e, 0.0)) AS sd_e,
         mu_l, sqrt(greatest(m2_l - mu_l * mu_l, 0.0)) AS sd_l,
         mu_r, sqrt(greatest(m2_r - mu_r * mu_r, 0.0)) AS sd_r
  FROM m
),
z AS (
  SELECT doc_id, char_entropy, bits_per_bigram, distinct_tok_ratio,
         round({zterm('char_entropy', 'mu_e', 'sd_e')}
               - {zterm('bits_per_bigram', 'mu_l', 'sd_l', null_ok=True)}
               + {zterm('distinct_tok_ratio', 'mu_r', 'sd_r')}, 9) AS qscore
  FROM sig CROSS JOIN sd
)
SELECT doc_id, char_entropy, bits_per_bigram, distinct_tok_ratio, qscore,
       CAST(ntile(10) OVER (ORDER BY qscore DESC, doc_id) AS BIGINT)
         AS quality_decile
FROM z
"""


@register(
    "quality_ensemble_score",
    _ensemble_oracle(),
    tags=("extension", "text", "quality", "pipeline", "lm"),
    doc="Composite quality classifier: z-score three independent "
    "oracled signals over the corpus — char entropy (up = natural "
    "text), bigram-LM cross-entropy (down = fluent), distinct-token "
    "ratio (up = non-repetitive) — and sum them into one qscore with "
    "a decile assignment, the standard shape of a pretraining "
    "quality-bucketing stage (CCNet-style ensembling without an "
    "external model). Cross-engine exactness: corpus moments go "
    "through exact DECIMAL sums (means and second moments), so "
    "mu/sd are identical doubles and every z is the same IEEE "
    "expression on both engines; docs too short for an LM score "
    "contribute z=0 instead of poisoning the composite. The decile "
    "ntile is a global sort over one row per doc — fine for the "
    "bucket-assignment OUTPUT; at 100 TB swap it for "
    "approx-quantile thresholds if the per-doc frame itself is the "
    "product.",
)
def q_quality_ensemble_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.caching import rotating_persist

    # the three-signal subtree feeds BOTH the corpus-moment aggregate
    # and the per-doc z-score frame — persist it once (rotating slot)
    # or the whole bigram-LM/entropy/repetition pipeline runs twice
    sig = rotating_persist(
        q_repetition_quality(spark, sf_dir)
        .select("doc_id", "distinct_tok_ratio")
        .join(q_quality_char_entropy(spark, sf_dir), "doc_id")
        .join(
            q_quality_bigram_lm(spark, sf_dir).select(
                "doc_id", "bits_per_bigram"
            ),
            "doc_id",
            "left",
        ),
        "quality_ensemble_score.sig",
    )

    def m2(c):
        return (
            F.sum((F.col(c) * F.col(c)).cast("decimal(38,18)")).cast("double")
            / F.count(c)
        )

    def mu(c):
        return (
            F.sum(F.col(c).cast("decimal(28,9)")).cast("double") / F.count(c)
        )

    moments = sig.agg(
        mu("char_entropy").alias("mu_e"),
        m2("char_entropy").alias("m2_e"),
        mu("bits_per_bigram").alias("mu_l"),
        m2("bits_per_bigram").alias("m2_l"),
        mu("distinct_tok_ratio").alias("mu_r"),
        m2("distinct_tok_ratio").alias("m2_r"),
    ).select(
        "mu_e",
        F.sqrt(F.greatest(F.col("m2_e") - F.col("mu_e") * F.col("mu_e"), F.lit(0.0))).alias("sd_e"),
        "mu_l",
        F.sqrt(F.greatest(F.col("m2_l") - F.col("mu_l") * F.col("mu_l"), F.lit(0.0))).alias("sd_l"),
        "mu_r",
        F.sqrt(F.greatest(F.col("m2_r") - F.col("mu_r") * F.col("mu_r"), F.lit(0.0))).alias("sd_r"),
    )

    def z(c, mu_c, sd_c, null_ok=False):
        guard = F.col(sd_c) > 0
        if null_ok:
            guard = F.col(c).isNotNull() & guard
        return F.when(
            guard, (F.col(c) - F.col(mu_c)) / F.col(sd_c)
        ).otherwise(F.lit(0.0))

    scored = sig.crossJoin(F.broadcast(moments)).withColumn(
        "qscore",
        F.round(
            z("char_entropy", "mu_e", "sd_e")
            - z("bits_per_bigram", "mu_l", "sd_l", null_ok=True)
            + z("distinct_tok_ratio", "mu_r", "sd_r"),
            9,
        ),
    )
    w = Window.orderBy(F.col("qscore").desc(), F.col("doc_id").asc())
    return scored.select(
        "doc_id",
        "char_entropy",
        "bits_per_bigram",
        "distinct_tok_ratio",
        "qscore",
        F.ntile(10).over(w).cast("long").alias("quality_decile"),
    )


SUBSTR_DUP_W = 16


@register(
    "substring_dup_spans",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, chr(32)) AS toks,
         len(string_split(text, chr(32))) AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, toks, n_tokens,
         unnest(range(0, n_tokens - {SUBSTR_DUP_W} + 1)) AS w
  FROM t WHERE n_tokens >= {SUBSTR_DUP_W}
),
h AS (
  SELECT doc_id, n_tokens, w,
         {hash48_sql(
             "array_to_string(toks[w + 1 : w + " + str(SUBSTR_DUP_W)
             + "], chr(32))"
         )} AS h
  FROM w
),
dfreq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM h GROUP BY h),
dup AS (
  SELECT doc_id, n_tokens, w,
         MAX(w + {SUBSTR_DUP_W}) OVER (
           PARTITION BY doc_id ORDER BY w
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM h JOIN dfreq USING (h) WHERE nd > 1
),
cov AS (
  SELECT doc_id, n_tokens, COUNT(*) AS n_dup_windows,
         CAST(SUM(w + {SUBSTR_DUP_W}
                  - greatest(coalesce(prev_end, 0), w)) AS BIGINT)
           AS dup_token_cov
  FROM dup GROUP BY doc_id, n_tokens
),
nw AS (
  SELECT doc_id, n_tokens,
         CAST(greatest(n_tokens - {SUBSTR_DUP_W} + 1, 0) AS BIGINT)
           AS n_windows
  FROM t
)
SELECT nw.doc_id, nw.n_tokens AS n_tokens, nw.n_windows,
       CAST(coalesce(cov.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(cov.dup_token_cov, 0) AS BIGINT) AS dup_token_cov,
       CAST(coalesce(cov.dup_token_cov, 0) AS DOUBLE) / nw.n_tokens
         AS dup_token_fraction
FROM nw LEFT JOIN cov ON nw.doc_id = cov.doc_id
""",
    tags=("extension", "dedup", "text", "pipeline", "chunking"),
    doc=f"Substring-duplication spans: slide a {SUBSTR_DUP_W}-token "
    "window at stride 1 over every document, flag windows whose "
    "content appears in at least one OTHER document, and report the "
    "fraction of token POSITIONS covered by the union of duplicated "
    "windows (interval-union via an ordered prev-end window — exact "
    "integer algebra on both engines). This is the any-alignment "
    "duplication signal fixed-chunk dedup (chunk_dup_fraction) "
    "misses: a copied paragraph straddling a chunk boundary hides "
    "from chunk hashing but lights up every sliding window it "
    "contains — the exact-substring criterion of "
    "training-data-dedup practice. Plan: windows explode 1 row per "
    "token position (linear; only 48-bit hashes shuffle), window-df "
    "aggregate is map-side combined, coverage union is one ordered "
    "window per doc; short docs (< W tokens) keep a zero row via the "
    "left join.",
)
def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.functions.text import hash48

    W = SUBSTR_DUP_W
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("t"),
    ).withColumn("n_tokens", F.size("t").cast("long"))
    wins = (
        t.filter(F.col("n_tokens") >= W)
        .select(
            "doc_id",
            "n_tokens",
            "t",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.col("n_tokens") - W
                )
            ).alias("w"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "w",
            hash48(
                F.concat_ws(
                    " ", F.slice(F.col("t"), (F.col("w") + 1).cast("int"), W)
                )
            ).alias("h"),
        )
    )
    # "appears in >1 distinct doc" ⟺ min(doc_id) != max(doc_id) over
    # the same-hash window: two cheap window aggs over ONE exchange on
    # h replace the countDistinct aggregate + join-back that moved the
    # window table through the h exchange twice (interleaved A/B at
    # sf0.1: 2.06 -> 0.94 s, output identical)
    hw = Window.partitionBy("h")
    dup = wins.withColumn(
        "_dup", F.min("doc_id").over(hw) != F.max("doc_id").over(hw)
    ).filter(F.col("_dup"))
    prev_end = F.max(F.col("w") + W).over(
        Window.partitionBy("doc_id")
        .orderBy("w")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = (
        dup.withColumn("prev_end", prev_end)
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_dup_windows"),
            F.sum(
                F.col("w")
                + W
                - F.greatest(F.coalesce(F.col("prev_end"), F.lit(0)), F.col("w"))
            )
            .cast("long")
            .alias("dup_token_cov"),
        )
        .select("doc_id", "n_dup_windows", "dup_token_cov")
    )
    nw = t.select(
        "doc_id",
        "n_tokens",
        F.greatest(F.col("n_tokens") - W + 1, F.lit(0).cast("long")).alias(
            "n_windows"
        ),
    )
    return nw.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_windows",
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias(
            "n_dup_windows"
        ),
        F.coalesce(F.col("dup_token_cov"), F.lit(0)).cast("long").alias(
            "dup_token_cov"
        ),
        (
            F.coalesce(F.col("dup_token_cov"), F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("dup_token_fraction"),
    )


CHUNK_DUP_TOKENS = 32


@register(
    "chunk_dup_fraction",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / {CHUNK_DUP_TOKENS}.0) AS BIGINT)))
           AS chunk_idx
  FROM t
),
ch AS (
  SELECT doc_id, chunk_idx,
         {hash48_sql(
             "array_to_string(toks[chunk_idx * " + str(CHUNK_DUP_TOKENS)
             + " + 1 : (chunk_idx + 1) * " + str(CHUNK_DUP_TOKENS)
             + "], chr(32))"
         )} AS h
  FROM idx
),
dfreq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_chunks,
       round(CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 9) AS shared_frac
FROM ch JOIN dfreq USING (h)
GROUP BY doc_id
""",
    tags=("extension", "dedup", "text", "pipeline", "chunking"),
    doc=f"Chunk-level duplication profile: fraction of each document's "
    f"fixed {CHUNK_DUP_TOKENS}-token chunks whose content appears in "
    "at least one OTHER document — the template/boilerplate detector "
    "that document-level dedup misses (two distinct pages sharing a "
    "footer are not near-dups, but their shared chunks are). Chunking "
    "is pure JVM (sequence explode + slice + concat_ws — the UDTF "
    "chunker's algebraic twin, no Python in the plan); only 48-bit "
    "chunk hashes shuffle, the chunk-doc-frequency aggregate is "
    "map-side combined, and the scoring join is keyed on the hash.",
)
def q_chunk_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.functions.text import hash48

    k = CHUNK_DUP_TOKENS
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    ch = (
        t.select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.ceil(F.size("t") / F.lit(float(k))) - 1).cast("long"),
                )
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            hash48(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("t"),
                        (F.col("chunk_idx") * k + 1).cast("int"),
                        k,
                    ),
                )
            ).alias("h"),
        )
    )
    # same min!=max window trick as substring_dup_spans: "shared with
    # another doc" needs only (min != max) over the same-hash window,
    # not a countDistinct + join-back (A/B 0.66 -> 0.45 s at sf0.1)
    hw = Window.partitionBy("h")
    flagged = ch.withColumn(
        "_dup", F.min("doc_id").over(hw) != F.max("doc_id").over(hw)
    )
    shared = F.sum(F.when(F.col("_dup"), 1).otherwise(0))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            shared.cast("long").alias("n_shared_chunks"),
            F.round(
                shared.cast("double") / F.count("*"), 9
            ).alias("shared_frac"),
        )
    )


QUALITY_BUDGET_PER_SOURCE = 2000


@register(
    "token_budget_quality_sample",
    f"""
WITH q AS ({BIGRAM_LM_SQL}),
t AS (
  SELECT d.doc_id, d.source, {token_count_sql('d.text')} AS n_tokens,
         q.bits_per_bigram
  FROM documents d JOIN q ON q.doc_id = d.doc_id
),
c AS (
  SELECT doc_id, source, n_tokens, bits_per_bigram,
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY bits_per_bigram ASC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, bits_per_bigram, cum_tokens
FROM c WHERE cum_tokens <= {QUALITY_BUDGET_PER_SOURCE}
""",
    tags=("extension", "pipeline", "sampling", "lm"),
    doc="Quality-weighted token-budget curation — the composition the "
    "plain token_budget_sample (largest-first) lacks: per source, "
    f"spend a {QUALITY_BUDGET_PER_SOURCE}-token budget on the most "
    "FLUENT documents first (lowest bigram-LM cross-entropy, tie → "
    "id), the 'budget to the best data' corpus-mixing policy. The "
    "LM score and the running-sum window are both existing oracled "
    "kernels; ordering on the score is exact cross-engine because "
    "the score doubles are themselves bit-identical (driver-proven "
    "by quality_bigram_lm). One extra shuffle over the plain "
    "sampler (the score join).",
)
def q_token_budget_quality_sample(
    spark: SparkSession, sf_dir: str, skew_robust: bool = False
) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    ).join(
        bigram_lm_scores(d, skew_robust=skew_robust).select(
            "doc_id", "bits_per_bigram"
        ),
        "doc_id",
    )
    if skew_robust:
        # equi-depth score bands (scores cluster around the corpus
        # mode, so fixed-width bands would not bound a hot band); see
        # equidepth_bucket for why cutpoints never affect the values.
        # Persist is load-bearing here: the frame embeds the bigram-LM
        # join, and the cutpoint actions would otherwise re-run it
        # twice more (measured 3.2x premium without, ~1.6x with).
        from msstreamingstack_spark.caching import rotating_persist
        from msstreamingstack_spark.operators.windows import (
            bucketed_running_sum,
            equidepth_bucket,
        )

        t = rotating_persist(t, "token_budget_quality.t")
        cum = bucketed_running_sum(
            t,
            "source",
            (F.col("bits_per_bigram").asc(), F.col("doc_id")),
            "n_tokens",
            equidepth_bucket(t, "bits_per_bigram"),
            out="cum_tokens",
            prec="long",
        )
    else:
        w = (
            Window.partitionBy("source")
            .orderBy(F.col("bits_per_bigram").asc(), F.col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.filter(
        F.col("cum_tokens") <= QUALITY_BUDGET_PER_SOURCE
    ).select("doc_id", "source", "n_tokens", "bits_per_bigram", "cum_tokens")


TOP_NGRAMS_K = 5


@register(
    "top_ngrams_per_lang",
    f"""
WITH g AS (
  SELECT lang, unnest({shingles_sql('text')}) AS gram FROM documents
),
c AS (SELECT lang, gram, COUNT(*) AS cnt FROM g GROUP BY lang, gram),
r AS (
  SELECT lang, gram, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, gram ASC) AS rnk
  FROM c
)
SELECT lang, gram, cnt, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {TOP_NGRAMS_K}
""",
    tags=("extension", "text", "analytics"),
    doc=f"Top-{TOP_NGRAMS_K} word trigrams per language — corpus "
    "inspection surface (boilerplate and template text shows up as "
    "dominant n-grams). Partial-aggregated count, then a per-lang "
    "top-k window over the ngram-type table (Heaps-law growth — the "
    "skew_robust twin salts the rank, bit-identical); ties broken by "
    "gram for determinism.",
)
def q_top_ngrams_per_lang(
    spark: SparkSession, sf_dir: str, skew_robust: bool = False
) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    g = d.select("lang", F.explode(shingles(F.col("text"))).alias("gram"))
    c = g.groupBy("lang", "gram").agg(F.count("*").alias("cnt"))
    order = (F.col("cnt").desc(), F.col("gram").asc())
    if skew_robust:
        # the count fold is partial-aggregated (safe), but the rank
        # window's per-lang partition is the lang's ngram-type
        # vocabulary — Heaps-law growth with the corpus, one task per
        # language; the salted twin bounds the final rank at p×k rows
        # per language (salt from the gram, a deterministic row key).
        from msstreamingstack_spark.operators.windows import (
            topk_per_key_salted,
        )

        ranked = topk_per_key_salted(
            c, ("lang",), order, TOP_NGRAMS_K, F.xxhash64("gram"), out="_rnk"
        )
        return ranked.select(
            "lang", "gram", "cnt", F.col("_rnk").cast("long").alias("rnk")
        )
    w = Window.partitionBy("lang").orderBy(*order)
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_NGRAMS_K)
        .select("lang", "gram", "cnt", "rnk")
    )


@register(
    "embedding_quantize_int8",
    quantize_int8_sql(),
    tags=("extension", "embedding", "quantization"),
    doc="Per-vector int8 min-max quantization with reconstruction "
    "error (max |err|, MSE). Scale rationale: int8 codes are 4× "
    "smaller than float32 — the ANN candidate scan over a 100 TB "
    "embedding corpus runs on codes in memory, exact re-rank reads "
    "only the shortlist's floats. Pure per-row array expressions: "
    "narrow, no shuffle, codegen inside the scan stage.",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.similarity import quantize_int8_stats

    return quantize_int8_stats(spread(load_table(spark, sf_dir, "embeddings")))


TOKEN_BUDGET_PER_SOURCE = 2000


@register(
    "token_budget_sample",
    f"""
WITH t AS (
  SELECT doc_id, source, {token_count_sql('text')} AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY n_tokens DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}
""",
    tags=("extension", "pipeline", "sampling"),
    doc=f"Token-budget subsampling: per source, keep the largest docs "
    f"(ties by id) until a {TOKEN_BUDGET_PER_SOURCE}-token budget is "
    "hit — the deterministic form of 'mix K tokens per domain' corpus "
    "curation. One shuffle (window by source) at bench SF; the "
    "skew_robust twin decomposes the cumsum over (source, length "
    "band) for corpus scale — bit-identical. Integer sort keys only, "
    "so ordering is exact cross-engine.",
)
def q_token_budget_sample(
    spark: SparkSession, sf_dir: str, skew_robust: bool = False
) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    if skew_robust:
        # prefix decomposition over (source, equi-depth length band):
        # document lengths CLUSTER, so fixed-width bands would leave a
        # hot band corpus-sized — quantile cutpoints keep expected
        # bucket depth constant as the data grows, and exactness never
        # depends on where the cutpoints fall (see equidepth_bucket).
        # Persist first: the cutpoint derivation is two extra actions
        # (count + quantile sketch) over this frame — without the slot
        # the token scan would run three times (measured 3.3x premium,
        # 1.8x with it).
        from msstreamingstack_spark.caching import rotating_persist
        from msstreamingstack_spark.operators.windows import (
            bucketed_running_sum,
            equidepth_bucket,
        )

        t = rotating_persist(t, "token_budget_sample.t")
        cum = bucketed_running_sum(
            t,
            "source",
            (F.col("n_tokens").desc(), F.col("doc_id")),
            "n_tokens",
            equidepth_bucket(t, "n_tokens", descending=True),
            out="cum_tokens",
            prec="long",
        )
    else:
        w = (
            Window.partitionBy("source")
            .orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.filter(
        F.col("cum_tokens") <= TOKEN_BUDGET_PER_SOURCE
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


@register(
    "corpus_version_diff",
    """
WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2-edit' ELSE text END) AS h
  FROM documents WHERE doc_id % 7 <> 0
),
j AS (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         v1.h AS h1, v2.h AS h2
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT CASE WHEN h1 IS NULL THEN 'added'
            WHEN h2 IS NULL THEN 'removed'
            WHEN h1 = h2 THEN 'unchanged'
            ELSE 'changed' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1
""",
    tags=("extension", "pipeline", "versioning"),
    doc="Corpus snapshot diff by content digest: added / removed / "
    "changed / unchanged counts between two corpus versions (v2 "
    "derived deterministically from the fixture: every 7th doc "
    "dropped, every 5th edited). One full-outer join on doc_id with "
    "digest compare — the release-note report every corpus version "
    "bump needs, O(corpus) with digests only in the shuffle.",
)
def q_corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h1"))
    v2 = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.col("text"), F.lit(" v2-edit")),
                )
                .otherwise(F.col("text"))
                .cast("binary")
            ).alias("h2"),
        )
    )
    j = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") == F.col("h2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------
def _hard_negatives_sql(k: int, n_queries: int) -> str:
    from msstreamingstack_spark.operators.similarity import (
        COS_ROUND,
        cosine_sql,
    )

    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS negative_id,
         round({cos}, {COS_ROUND}) AS cos
  FROM embeddings q JOIN embeddings c
    ON q.label <> c.label
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, query_label, negative_id, cos, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, negative_id) AS rank
  FROM scored)
WHERE rank <= {k}
"""


@register(
    "mine_hard_negatives",
    _hard_negatives_sql(5, N_QUERY_VECS),
    tags=("extension", "similarity", "pipeline", "contrastive"),
    doc="Hard-negative mining for contrastive training (the DPR/SimCSE "
    "data-prep step): for each query vector, the top-5 most-similar "
    "corpus vectors carrying a DIFFERENT label — the negatives that "
    "actually teach a metric model, vs random negatives that are "
    "trivially far. Exact kernel here (query side broadcast, label "
    "inequality as the join predicate, rounded-cosine rank window); "
    "at 100 TB the same label-aware shortlist comes from the IVF/SRP "
    "candidate generators (similarity_ann_*) with the label filter "
    "pushed into the candidate join — this query pins the semantics "
    "those scale paths must reproduce. Deterministic ties on "
    "negative_id; fully DuckDB-oracled.",
)
def q_mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.similarity import COS_ROUND, cosine

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("qv"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("cv"),
    )
    scored = (
        q.join(c, F.col("query_label") != F.col("neg_label"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), COS_ROUND))
        .select("query_id", "query_label", "negative_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "query_label", "negative_id", "cos", "rank")
    )


def _hard_negatives_ann_sql() -> str:
    from msstreamingstack_spark.operators.similarity import (
        hard_negatives_ann_sql,
    )

    return hard_negatives_ann_sql(n_queries=N_QUERY_VECS)


@register(
    "mine_hard_negatives_ann",
    _hard_negatives_ann_sql(),
    tags=("extension", "similarity", "pipeline", "contrastive", "ann", "ivf"),
    doc="mine_hard_negatives on the SCALE path its doc promised (r8 "
    "verdict task #5): candidates come from the pinned-IVF probe "
    "kernel (nprobe cells per query, broadcast probe join) with the "
    "label-inequality filter pushed into the candidate join — "
    "same-label vectors never reach the cosine stage, and the corpus "
    "pays ~nprobe/K of a full scan instead of |Q| x N. Identical "
    "output schema and tie discipline as the exact kernel; recall vs "
    "the exact top-5 is property-bounded in tests. Fully "
    "DuckDB-oracled (the pinned quantizer is literal-exact cross-"
    "engine), unlike typical ANN surfaces that settle for rows-only.",
)
def q_mine_hard_negatives_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.similarity import (
        hard_negatives_ann_pinned,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return hard_negatives_ann_pinned(
        emb, emb.filter(F.col("vec_id") < N_QUERY_VECS)
    )


# ---------------------------------------------------------------------------
# Event debounce (batch analogue of dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------
DEBOUNCE_GAP_SEC = 300


@register(
    "dedup_events_debounce",
    f"""
WITH ev AS (SELECT event_id, user_id, event_type,
                   epoch_ns(ts)//1000000000 AS ts_sec FROM events),
g AS (
  SELECT event_id, user_id, event_type, ts_sec,
         CASE WHEN lag(ts_sec) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts_sec, event_id) IS NULL
                OR ts_sec - lag(ts_sec) OVER (PARTITION BY user_id, event_type
                                              ORDER BY ts_sec, event_id)
                   > {DEBOUNCE_GAP_SEC}
              THEN 1 ELSE 0 END AS is_head
  FROM ev
),
s AS (
  SELECT *, SUM(is_head) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts_sec, event_id
                               ROWS UNBOUNDED PRECEDING) AS grp
  FROM g
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, event_type, grp
                            ORDER BY ts_sec, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, event_type, grp) AS n_collapsed
  FROM s
)
SELECT event_id, user_id, event_type, ts_sec,
       CAST(n_collapsed AS BIGINT) AS n_collapsed
FROM r WHERE rn = 1
""",
    tags=("extension", "dedup", "events", "debounce", "window"),
    doc=f"Gap-based event debounce — the BATCH analogue of the "
    "streaming `dropDuplicatesWithinWatermark` path "
    "(streaming/watermark.py): within each (user, event_type) key, "
    f"bursts whose inter-event gap never exceeds {DEBOUNCE_GAP_SEC}s "
    "collapse to their first event, carrying how many rows they "
    "absorbed — the duplicate-click/retry-storm suppressor a telemetry "
    "pipeline runs before aggregation. Same machinery as "
    "sessionization (ONE window shuffle on the key; gap-indicator "
    "running sum forms the debounce group, rank-1 row survives); "
    "chains with sub-gap spacing collapse regardless of total span — "
    "gap semantics, not fixed-window, exactly like the streaming "
    "twin's state eviction. Integer epoch seconds end-to-end: no "
    "float surface in the hash at all.",
)
def q_dedup_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.sources.tables import events_with_time

    ev = events_with_time(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_sec"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_sec", "event_id")
    prev = F.lag("ts_sec").over(w)
    is_head = (
        prev.isNull() | ((F.col("ts_sec") - prev) > DEBOUNCE_GAP_SEC)
    ).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.withColumn("grp", F.sum(is_head).over(run))
    wg = Window.partitionBy("user_id", "event_type", "grp")
    r = s.withColumn(
        "rn", F.row_number().over(wg.orderBy("ts_sec", "event_id"))
    ).withColumn("n_collapsed", F.count("*").over(wg))
    return r.filter(F.col("rn") == 1).select(
        "event_id",
        "user_id",
        "event_type",
        "ts_sec",
        F.col("n_collapsed").cast("long").alias("n_collapsed"),
    )


# ---------------------------------------------------------------------------
# Chunk-dedup rewrite (CCNet-style shared-passage removal)
# ---------------------------------------------------------------------------
DEDUP_CHUNK_REWRITE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / {CHUNK_DUP_TOKENS}.0) AS BIGINT)))
           AS chunk_idx
  FROM t
),
ch AS (
  SELECT doc_id, chunk_idx,
         array_to_string(toks[chunk_idx * {CHUNK_DUP_TOKENS} + 1 :
                              (chunk_idx + 1) * {CHUNK_DUP_TOKENS}], chr(32))
           AS chunk_text
  FROM idx
),
rk AS (
  SELECT doc_id, chunk_idx, chunk_text,
         row_number() OVER (PARTITION BY chunk_text
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
),
cnt AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(chunk_text, chr(32) ORDER BY chunk_idx) AS kept_text
  FROM rk WHERE rn = 1 GROUP BY doc_id
)
SELECT c.doc_id, c.n_chunks, COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.kept_text, '') AS kept_text
FROM cnt c LEFT JOIN agg a USING (doc_id)
"""


@register(
    "dedup_chunk_rewrite",
    DEDUP_CHUNK_REWRITE_SQL,
    tags=("extension", "dedup", "text", "pipeline", "chunking", "rewrite"),
    doc="CCNet-style shared-passage REMOVAL (Wenzek et al. 2020): every "
    f"{CHUNK_DUP_TOKENS}-token chunk keeps only its first corpus-wide "
    "occurrence (rank over (doc_id, chunk_idx) within equal chunk "
    "content), and each document is REASSEMBLED from its surviving "
    "chunks in order — the rewrite step that strips boilerplate from "
    "later documents instead of dropping them whole, which doc-level "
    "dedup (dedup_exact) and profiling (chunk_dup_fraction) don't do. "
    "Plan: the same pure-JVM chunker as chunk_dup_fraction (sequence "
    "explode + slice + concat_ws, no Python), ONE rank window keyed on "
    "chunk content (the only corpus-wide shuffle; at 100 TB the key is "
    "the chunk digest and the payload rides the same exchange — text "
    "must shuffle anyway for reassembly), then a per-doc ordered fold "
    "(array_sort over (idx, text) structs == string_agg ORDER BY). "
    "All-integer/string output — no float parity surface at all.",
)
def q_dedup_chunk_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.caching import rotating_persist

    k = CHUNK_DUP_TOKENS
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    ch = rotating_persist(
        t.select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.ceil(F.size("t") / F.lit(float(k))) - 1).cast("long"),
                )
            ).alias("chunk_idx"),
        ).select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(
                " ",
                F.slice(F.col("t"), (F.col("chunk_idx") * k + 1).cast("int"), k),
            ).alias("chunk_text"),
        ),
        "dedup_chunk_rewrite.ch",
    )
    w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_idx")
    kept = (
        ch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda x: x["chunk_text"],
                ),
            ).alias("kept_text"),
        )
    )
    cnt = ch.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return cnt.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection via importance resampling)
# ---------------------------------------------------------------------------
# Hashed n-gram importance weights (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): score every raw
# document by how much more likely its hashed-unigram profile is under
# the TARGET distribution (here: the English slice) than under the raw
# corpus — log w(d) = Σ_b c_b(d) · log( p̂_t(b) / p̂_r(b) ) with
# Laplace-smoothed bucket probabilities. The bucket table is O(B)
# regardless of corpus size — that's the whole trick at 100 TB: the
# "language model" ships as a broadcastable B-row table, and scoring
# is one explode → per-(doc,bucket) fold → broadcast join.
DSIR_BUCKETS = 32
DSIR_SQL = f"""
WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents
),
f AS (
  SELECT doc_id, lang,
         TRY_CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS b,
         COUNT(*) AS c
  FROM w GROUP BY 1, 2, 3
),
raw AS (SELECT b, SUM(c) AS cr FROM f GROUP BY b),
tgt AS (SELECT b, SUM(c) AS ct FROM f WHERE lang = 'en' GROUP BY b),
nt AS (SELECT SUM(c) AS n_t FROM f WHERE lang = 'en'),
nr AS (SELECT SUM(c) AS n_r FROM f)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(round(
           c * log2(CAST((COALESCE(ct, 0) + 1) * (n_r + {DSIR_BUCKETS}) AS DOUBLE)
                    / CAST((cr + 1) * (n_t + {DSIR_BUCKETS}) AS DOUBLE)), 9)
         AS DECIMAL(28,9))) AS DOUBLE) AS dsir_logratio
FROM f JOIN raw USING (b) LEFT JOIN tgt USING (b)
     CROSS JOIN nt CROSS JOIN nr
GROUP BY doc_id
"""


@register(
    "dsir_importance_weights",
    DSIR_SQL,
    tags=("extension", "pipeline", "quality", "sampling", "dsir"),
    doc="DSIR importance weights (Xie et al. 2023): per-document "
    "log-importance of the target (English-slice) hashed-unigram "
    "distribution over the raw corpus distribution, Laplace-smoothed "
    "— the data-selection score a pipeline feeds into importance "
    "resampling (emitted with n_tokens so consumers normalize per "
    "token themselves). Plan: ONE word explode folded to "
    "per-(doc, bucket) counts; the target/raw bucket tables are "
    "B-row aggregates of that SAME fold (never a second explode) and "
    "join back BROADCAST (B=32 here; B=10k in the paper — still "
    "broadcastable at any corpus size), the corpus totals are "
    "explicit-broadcast scalars. Cross-engine determinism: bucket = "
    "md5-derived integer (conv == 0x-cast, bit-exact), probability "
    "ratios are exact-integer products cast to DOUBLE once, and each "
    "occurrence term is round-then-DECIMAL-summed, so the per-doc fold "
    "is order-free. The ref engine has no corpus surface (SURVEY.md "
    "§2.5 ABSENT) — north-star extension.",
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.caching import rotating_persist

    d = spread(load_table(spark, sf_dir, "documents"))
    words = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("bigint")
        % DSIR_BUCKETS
    )
    # eager: f feeds FOUR broadcast subtrees (raw/tgt totals + the two
    # scalar counts); lazy population races per broadcast build (r10
    # A/B: 4.0 s lazy vs 2.5 s eager single-shot, EAGER_AB_r10.json)
    f = rotating_persist(
        words.groupBy("doc_id", "lang", bucket.alias("b")).agg(
            F.count("*").alias("c")
        ),
        "dsir_importance_weights.f",
        eager=True,
    )
    raw = f.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt = f.filter(F.col("lang") == "en").groupBy("b").agg(
        F.sum("c").alias("ct")
    )
    n_t = f.filter(F.col("lang") == "en").agg(F.sum("c").alias("n_t"))
    n_r = f.agg(F.sum("c").alias("n_r"))
    num = (
        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
        * (F.col("n_r") + F.lit(DSIR_BUCKETS))
    ).cast("double")
    den = ((F.col("cr") + 1) * (F.col("n_t") + F.lit(DSIR_BUCKETS))).cast(
        "double"
    )
    term = F.round(F.col("c") * F.log2(num / den), 9).cast("decimal(28,9)")
    return (
        f.join(F.broadcast(raw), "b")
        .join(F.broadcast(tgt), "b", "left")
        .crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_r))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            # total log-importance as the exact DECIMAL fold cast to
            # double once — NOT divided per-token here, because a final
            # double divide + round can land on a half-ulp rounding
            # boundary and split the engines in the 9th decimal;
            # consumers normalize by n_tokens themselves
            F.sum(term).cast("double").alias("dsir_logratio"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable frequency sketch, fully deterministic)
# ---------------------------------------------------------------------------
CMS_WIDTH = 64
CMS_DEPTH = 4


def _cms_bucket_sql(expr: str, depth: int) -> str:
    # independent rows via salted md5 — same idiom as the engine's
    # bucket hash, one hash per sketch row
    return (
        f"TRY_CAST(('0x' || substr(md5('r{depth}:' || {expr}), 1, 8)) "
        f"AS BIGINT) % {CMS_WIDTH}"
    )


@register(
    "sketch_countmin_user_events",
    f"""
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
rows_ AS (
  {" UNION ALL ".join(
      f"SELECT {d} AS d, {_cms_bucket_sql('k', d)} AS b, COUNT(*) AS c "
      f"FROM ev GROUP BY 2"
      for d in range(CMS_DEPTH)
  )}
),
truth AS (
  SELECT k, COUNT(*) AS true_count FROM ev GROUP BY k
  ORDER BY true_count DESC, k LIMIT 20
),
est AS (
  SELECT t.k, t.true_count,
         MIN(r.c) AS cms_est
  FROM truth t
  JOIN rows_ r
    ON r.b = CASE r.d
       {" ".join(
           f"WHEN {d} THEN {_cms_bucket_sql('t.k', d)}"
           for d in range(CMS_DEPTH)
       )} END
  GROUP BY t.k, t.true_count
)
SELECT k AS user_key, true_count, CAST(cms_est AS BIGINT) AS cms_est
FROM est
""",
    tags=("extension", "approx", "sketch", "countmin"),
    doc="Count-min sketch over event user keys (Cormode & "
    "Muthukrishnan 2005) — the third mergeable-sketch family next to "
    "HLL distinct and the quantile sketch, and unlike both it is "
    "FULLY oracled: the sketch is d×w integer counters built from "
    "salted md5 row hashes (deterministic cross-engine, the engine's "
    "bucket-hash idiom), so both engines materialize identical "
    "counter tables. The query reports the true top-20 keys with "
    "their point estimates (min over rows); the CMS overestimate "
    "guarantee est ≥ true is pytest-pinned with the ε·N error bound. "
    "Plan: d passes folded to (d, bucket) partial counts — d·w rows "
    "TOTAL state regardless of stream length (mergeable by addition; "
    "the streaming heavy-hitters store is the tracking counterpart). "
    "Ref has no sketch surface (SURVEY.md §2.5 ABSENT) — north-star "
    "extension.",
)
def q_sketch_countmin_user_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from msstreamingstack_spark.caching import rotating_persist
    from msstreamingstack_spark.operators.textclf import bucket_hash

    ev = rotating_persist(
        spread(load_table(spark, sf_dir, "events")).select(
            F.col("user_id").cast("string").alias("k")
        ),
        "sketch_countmin.ev",
    )
    # populate before the per-row sketch subtrees fork off the cache
    # (A/B +9% at sf0.1; round-8 broadcast-race lesson)
    ev.count()

    def row_bucket(col, d):
        return bucket_hash(F.concat(F.lit(f"r{d}:"), col), CMS_WIDTH)

    # r11 (guide §2.3): ONE pass over the cached key frame computes
    # all d row-buckets per key and folds them in one map-combined
    # (d, b) aggregate — the union-of-d-scans form re-scanned the
    # cache (and re-dispatched a scan stage) once per depth for the
    # same total hash work. Output rows are identical (d, b, c).
    rows = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            row_bucket(F.col("k"), d).alias("b"),
                        )
                        for d in range(CMS_DEPTH)
                    ]
                )
            ).alias("db")
        )
        .groupBy(F.col("db.d").alias("d"), F.col("db.b").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    truth = (
        ev.groupBy("k")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), F.col("k").asc())
        .limit(20)
    )
    probes = truth
    for d in range(CMS_DEPTH):
        probes = probes.withColumn(
            f"b{d}", row_bucket(F.col("k"), d)
        )
    est = (
        probes.join(
            F.broadcast(rows),
            F.expr(
                "b = CASE d "
                + " ".join(f"WHEN {d} THEN b{d}" for d in range(CMS_DEPTH))
                + " END"
            ),
        )
        .groupBy("k", "true_count")
        .agg(F.min("c").cast("long").alias("cms_est"))
    )
    return est.select(
        F.col("k").alias("user_key"), "true_count", "cms_est"
    )


# ---------------------------------------------------------------------------
# Gopher-style rule filter (integer rule algebra, no division anywhere)
# ---------------------------------------------------------------------------
GOPHER_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)


@register(
    "quality_gopher_rules",
    f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
f AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
a AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(SUM(c * length(word)) AS BIGINT) AS sum_word_len,
         CAST(SUM(CASE WHEN regexp_matches(word, '[a-zA-Z]')
                       THEN c ELSE 0 END) AS BIGINT) AS n_alpha_words,
         CAST(SUM(CASE WHEN word IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_stopwords,
         CAST(MAX(c) AS BIGINT) AS top_word_count
  FROM f GROUP BY doc_id
)
SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_stopwords,
       top_word_count,
       n_words BETWEEN 10 AND 100000 AS pass_word_count,
       3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
         AS pass_mean_word_len,
       5 * n_alpha_words >= 4 * n_words AS pass_alpha_ratio,
       n_stopwords >= 1 AS pass_stopwords,
       5 * top_word_count <= n_words AS pass_repetition,
       (n_words BETWEEN 10 AND 100000)
         AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
         AND 5 * n_alpha_words >= 4 * n_words
         AND n_stopwords >= 1
         AND 5 * top_word_count <= n_words AS gopher_pass
FROM a
""",
    tags=("extension", "pipeline", "quality", "gopher", "rules"),
    doc="Gopher-style quality rule filter (Rae et al. 2021 §A1.1 "
    "adapted to the fixture): per-doc word count bounds, mean word "
    "length in [3,10], ≥80% alphabetic words, ≥1 stopword, top-word "
    "share ≤20% — each emitted as its own boolean plus the composite "
    "gate. Every rule is INTEGER algebra (3n ≤ Σlen, 5·top ≤ n …), "
    "never a rounded division — divisions of exact integers can land "
    "on rounding half-boundary ties that split the engines (the "
    "PageRank lesson, plans/notes.md); consumers derive display "
    "ratios themselves. Plan: ONE word explode folded to per-(doc, "
    "word) type counts, then a per-doc fold — the token-counting "
    "shuffle shape, all JVM. Rules the fixture can't exercise "
    "(symbol ratio, bullet lines — the word-soup has no punctuation "
    "or newlines) are omitted rather than trivially-true. Ref has no "
    "corpus surface (SURVEY.md §2.5 ABSENT) — north-star extension.",
)
def q_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    f = (
        d.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    a = f.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.col("c") * F.length("word")).cast("long").alias(
            "sum_word_len"
        ),
        F.sum(
            F.when(F.col("word").rlike("[a-zA-Z]"), F.col("c")).otherwise(0)
        )
        .cast("long")
        .alias("n_alpha_words"),
        F.sum(
            F.when(F.col("word").isin(*GOPHER_STOPWORDS), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_stopwords"),
        F.max("c").cast("long").alias("top_word_count"),
    )
    n, sl = F.col("n_words"), F.col("sum_word_len")
    p_wc = n.between(10, 100000)
    p_len = (3 * n <= sl) & (sl <= 10 * n)
    p_alpha = 5 * F.col("n_alpha_words") >= 4 * n
    p_stop = F.col("n_stopwords") >= 1
    p_rep = 5 * F.col("top_word_count") <= n
    return a.select(
        "doc_id",
        "n_words",
        "sum_word_len",
        "n_alpha_words",
        "n_stopwords",
        "top_word_count",
        p_wc.alias("pass_word_count"),
        p_len.alias("pass_mean_word_len"),
        p_alpha.alias("pass_alpha_ratio"),
        p_stop.alias("pass_stopwords"),
        p_rep.alias("pass_repetition"),
        (p_wc & p_len & p_alpha & p_stop & p_rep).alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# fastText-style pinned hashed linear classifier (langid/quality gate)
# ---------------------------------------------------------------------------
def _textclf_pinned_oracle() -> str:
    from msstreamingstack_spark.operators.textclf import score_pinned_sql

    return score_pinned_sql()


@register(
    "langid_fasttext_hashed",
    _textclf_pinned_oracle(),
    tags=("extension", "pipeline", "quality", "langid", "classifier"),
    doc="fastText-style hashed linear classifier, served from the "
    "PINNED model (resources/fasttext_pinned.json — closed-form NB "
    "log-count-ratio over md5-hashed unigram+bigram buckets, fitted "
    "once at sf0.01; Joulin et al. 2016 / Wang & Manning 2012). The "
    "demonstration task is en-vs-rest (the fixture's five languages "
    "share ONE vocabulary — frequency profiles alone give ~83% vs a "
    "56% base rate, floor pytest-pinned); with wiki-vs-crawl labels "
    "the identical kernel is the CCNet/LLaMA quality gate. Plan: ONE "
    "tokenize feeding unigram+bigram explodes folded to per-(doc, "
    "bucket) counts, broadcast join on the B-row weight table (B=1024 "
    "here, 2M in production fastText — still broadcastable at any "
    "corpus size), round-then-DECIMAL dot product + DECIMAL bias — "
    "zero corpus-sized shuffles beyond the feature fold, no Python. "
    "Complements langid_heuristic (rules) with the learned-model "
    "serving shape. Ref has no corpus surface (SURVEY.md §2.5 ABSENT) "
    "— north-star extension.",
)
def q_langid_fasttext_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.textclf import score_pinned

    return score_pinned(spread(load_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Retrieval scoring (BM25) — the ranking function a data-curation /
# RAG pipeline runs over the corpus it just cleaned and deduped.
# ---------------------------------------------------------------------------
# Fixed query-term set mixing common terms ('stream' df≈888-doc-scale,
# 'window') with a rare one ('dup', df≈26 at sf0.01) so the idf
# weighting is actually exercised, not a constant factor.
BM25_TERMS = ("stream", "window", "dup")
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "retrieval_bm25_topk",
    f"""
WITH words AS (
  SELECT d.doc_id, u.word
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS u(word)
  WHERE u.word <> ''
), wc AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM wc GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
), tf AS (
  SELECT doc_id, word, tf FROM wc
  WHERE word IN {BM25_TERMS!r}
), idf AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
)
SELECT t.doc_id,
       CAST(SUM(CAST(round(
         ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
         * (t.tf * {BM25_K1 + 1.0})
         / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl / s.avgdl)),
         9) AS DECIMAL(28,9))) AS DOUBLE) AS bm25,
       COUNT(*) AS n_terms_matched
FROM tf t
JOIN idf f USING (word)
JOIN dl l USING (doc_id)
CROSS JOIN stats s
GROUP BY t.doc_id
ORDER BY bm25 DESC, t.doc_id ASC
LIMIT 20
""",
    tags=("extension", "text", "retrieval", "topk"),
    doc="BM25 top-k document retrieval for a fixed query-term set "
    "(Robertson/Sparck-Jones idf, k1=1.2 b=0.75). The corpus-sized "
    "inputs never shuffle: per-doc length dl is a PER-ROW projection "
    "(count of non-empty split tokens == the tf-table row sum the "
    "oracle states, exactly — docs with zero words drop from dl/stats "
    "in both forms), and the query-term tf fold filters to the "
    "|terms| matching occurrences BEFORE its only exchange. The "
    "3-row df table and the (n_docs, avgdl) scalar are broadcast. "
    "Per-term scores round to 9 decimals then sum in DECIMAL so the "
    "fold is order-free vs the oracle; top-20 is tie-broken by "
    "doc_id. At 100 TB nothing vocabulary- or token-sized crosses an "
    "exchange — only query-term postings do.",
)
def q_retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dl = docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), w -> w != ''))")
        .cast("long")
        .alias("dl"),
    ).filter(F.col("dl") > 0)
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    tf = (
        words.filter(F.col("word").isin(*BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    idf_df = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(idf_df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = F.round(
        idf
        * (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
            )
        ),
        9,
    ).cast("decimal(28,9)")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(term_score).cast("double").alias("bm25"),
            F.count("*").alias("n_terms_matched"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Entity resolution: blocked fuzzy matching — the record-linkage
# primitive (dedupe a noisy entity catalog without all-pairs edit
# distance).
# ---------------------------------------------------------------------------
@register(
    "entity_match_blocked",
    """
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
), blocked AS (
  SELECT p_name, n_parts, string_split(p_name, ' ')[-1] AS blk
  FROM names
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM blocked a
JOIN blocked b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
    tags=("extension", "dedup", "fuzzy", "blocking"),
    doc="Blocked fuzzy entity matching over the part-name catalog: "
    "candidate pairs come from an equi-join on a blocking key (the "
    "name's last token — the head noun), then a levenshtein<=3 "
    "residual keeps near-identical entity labels ('red bolt' ~ "
    "'blue bolt'). Two scale levers a 100 TB catalog needs: the "
    "GROUP BY collapses row count to the distinct-entity vocabulary "
    "BEFORE any pairing, and the blocking key turns all-pairs "
    "O(V^2) into sum-of-block^2 — the standard record-linkage "
    "blocking bound. Edit distance runs JVM-side (F.levenshtein), "
    "identical metric to DuckDB's levenshtein; a.p_name < b.p_name "
    "halves the pair space and makes the result orientation-"
    "deterministic.",
)
def q_entity_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
    )
    blocked = names.select(
        "p_name",
        "n_parts",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("blk"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


# ---------------------------------------------------------------------------
# Containment dedup — asymmetric overlap (|A∩B| / |smaller|): the
# excerpt/quote signal. A 50-token excerpt inside a 400-token parent
# has jaccard ≈ 0.12 (invisible to every whole-doc near-dup kernel)
# but containment ≈ 1.0. The fixture corpus has no excerpts, so the
# query deterministically DERIVES them (pii_scrub precedent: inject
# the phenomenon as a pure function of doc_id so the oracle agrees).
# ---------------------------------------------------------------------------
CONTAIN_MOD = 37
CONTAIN_T = 0.9


@register(
    "dedup_containment_pairs",
    f"""
WITH exc AS (
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(
           (string_split(text, chr(32)))[1 :
              GREATEST(len(string_split(text, chr(32))) // 2, 4)],
           chr(32)) AS text
  FROM documents WHERE doc_id % {CONTAIN_MOD} = 5
),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM exc
),
sh AS ({doc_shingle_hashes_sql('corpus')}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT CASE WHEN s1.n <= s2.n THEN d1 ELSE d2 END AS contained_id,
         CASE WHEN s1.n <= s2.n THEN d2 ELSE d1 END AS container_id,
         CAST(ni AS DOUBLE) / LEAST(s1.n, s2.n) AS containment,
         CAST(ni AS DOUBLE) / (s1.n + s2.n - ni) AS jaccard
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
)
SELECT contained_id, container_id,
       round(containment, 9) AS containment,
       round(jaccard, 9) AS jaccard
FROM scored
WHERE containment >= {CONTAIN_T} AND jaccard < {JACCARD_T}
""",
    tags=("extension", "dedup", "containment"),
    doc=f"Containment near-dup pairs: |A∩B| / |smaller shingle set| "
    f">= {CONTAIN_T} while whole-doc jaccard < {JACCARD_T} — exactly "
    "the excerpt/quote pairs every symmetric near-dup kernel in the "
    "registry is blind to (an excerpt's jaccard against its parent "
    "shrinks with the parent's length; its containment does not). "
    "Excerpt documents are derived deterministically (doc_id % "
    f"{CONTAIN_MOD} = 5 contributes its first-half prefix as doc_id "
    "+ 1e6) because the synthetic corpus contains no natural "
    "excerpts — measured: ZERO containment-only pairs at any SF "
    "without injection. Same inverted-index plan as "
    "dedup_ngram_jaccard (shingle-hash self-join, shuffled hash on "
    "h, only longs move); the direction is resolved by set size "
    "(smaller = contained).",
)
def q_dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.dedup import doc_shingle_hashes

    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    half = F.greatest(F.expr("size(split(text, ' ')) div 2"), F.lit(4))
    exc = d.filter(F.col("doc_id") % CONTAIN_MOD == 5).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, F.lit(1), half)).alias("text"),
    )
    corpus = d.unionByName(exc)
    sh = doc_shingle_hashes(corpus, slot="containment.sh", eager=True)
    # eager: A/B +15% at sf0.1 — the banded-candidate and asymmetric-
    # containment subtrees otherwise re-shingled under broadcasts
    # (round-8 broadcast-race lesson)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("d1"), "h")
        .join(
            sh.select(F.col("doc_id").alias("d2"), "h").hint("shuffle_hash"),
            "h",
        )
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("ni"))
    )
    scored = (
        inter.join(
            sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")),
            "d1",
        )
        .join(
            sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")),
            "d2",
        )
        .select(
            F.when(F.col("n1") <= F.col("n2"), F.col("d1"))
            .otherwise(F.col("d2"))
            .alias("contained_id"),
            F.when(F.col("n1") <= F.col("n2"), F.col("d2"))
            .otherwise(F.col("d1"))
            .alias("container_id"),
            (
                F.col("ni").cast("double") / F.least(F.col("n1"), F.col("n2"))
            ).alias("containment"),
            (
                F.col("ni").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("ni"))
            ).alias("jaccard"),
        )
    )
    return scored.filter(
        (F.col("containment") >= CONTAIN_T) & (F.col("jaccard") < JACCARD_T)
    ).select(
        "contained_id",
        "container_id",
        F.round("containment", 9).alias("containment"),
        F.round("jaccard", 9).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage — OOV statistics against a pinned top-N corpus
# vocabulary (tokenizer-budget planning: which sources will shatter
# into byte-fallback tokens).
# ---------------------------------------------------------------------------
VOCAB_SIZE = 16


@register(
    "vocab_oov_coverage",
    f"""
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, chr(32))) AS w
  FROM documents
),
tc AS (SELECT doc_id, source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3),
freq AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cnt FROM tc GROUP BY w),
vocab AS (SELECT w FROM freq ORDER BY cnt DESC, w LIMIT {VOCAB_SIZE}),
d AS (
  SELECT tc.doc_id, tc.source,
         CAST(SUM(tc.c) AS BIGINT) AS n_toks,
         CAST(SUM(CASE WHEN v.w IS NULL THEN tc.c ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM tc LEFT JOIN vocab v ON tc.w = v.w
  GROUP BY 1, 2
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n_oov) AS BIGINT) AS oov_tokens,
       round(CAST(SUM(n_oov) AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE), 9)
         AS oov_rate,
       CAST(SUM(CASE WHEN n_oov * 2 > n_toks THEN 1 ELSE 0 END) AS BIGINT)
         AS high_oov_docs
FROM d GROUP BY source
""",
    tags=("extension", "text", "vocab", "pipeline"),
    doc=f"Vocabulary coverage: per-source out-of-vocabulary token "
    f"statistics against the corpus' own top-{VOCAB_SIZE} word "
    "vocabulary (count-desc, word-asc total tiebreak — fully "
    "deterministic; the budget sits BELOW the fixture's 31-word "
    "observed vocabulary so a real OOV tail exists at every SF). The "
    "tokenizer-planning signal: a source whose "
    "high_oov_docs count is large will shatter into fallback tokens "
    "and blow its token budget. Plan: per-(doc, word) counts fold "
    "the explode once; the corpus frequency table re-aggregates "
    "those counts; the vocabulary is a BOUNDED sort-limit "
    f"(top-{VOCAB_SIZE} — a driver-bounded TakeOrdered, never a "
    "global sort) and joins back as a broadcast; one keyed "
    "re-aggregation per doc then per source. Everything integer "
    "until the final rate division.",
)
def q_vocab_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.functions.text import tokens

    d = spread(load_table(spark, sf_dir, "documents"))
    tc = (
        d.select(
            "doc_id", "source", F.explode(tokens(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "source", "w")
        .agg(F.count("*").alias("c"))
    )
    freq = tc.groupBy("w").agg(F.sum("c").cast("long").alias("cnt"))
    vocab = (
        freq.orderBy(F.col("cnt").desc(), F.col("w"))
        .limit(VOCAB_SIZE)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        tc.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_toks"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("n_oov"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.sum("n_oov").cast("long").alias("oov_tokens"),
        F.round(
            F.sum("n_oov").cast("double") / F.sum("n_toks").cast("double"), 9
        ).alias("oov_rate"),
        F.sum(
            F.when(F.col("n_oov") * 2 > F.col("n_toks"), 1).otherwise(0)
        )
        .cast("long")
        .alias("high_oov_docs"),
    )


# ---------------------------------------------------------------------------
# Per-source quality calibration — the cross-source comparability fix:
# raw quality scores are not comparable between a forum crawl and an
# encyclopedia, so each source is converted to its own percentile
# scale before one global keep-gate is applied.
# ---------------------------------------------------------------------------
CALIB_KEEP_PCT = 0.7


@register(
    "quality_source_calibrated",
    f"""
WITH s AS (
  SELECT doc_id, source,
         {distinct_token_ratio_sql('text')} AS score
  FROM documents
)
SELECT doc_id, source,
       round(score, 9) AS score,
       round(percent_rank() OVER (PARTITION BY source
                                  ORDER BY score, doc_id), 9) AS pct_rank,
       CAST(CASE WHEN percent_rank() OVER (PARTITION BY source
                                           ORDER BY score, doc_id)
                      >= {CALIB_KEEP_PCT}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
""",
    tags=("extension", "text", "quality", "window"),
    doc="Per-source quality calibration: the distinct-token-ratio "
    "signal is converted to a percent_rank WITHIN each source, then "
    f"one global gate (top {int((1 - CALIB_KEEP_PCT) * 100)}% of each "
    "source) is applied — quantile normalization, the standard fix "
    "for raw quality scores not being comparable across sources with "
    "different base styles. A raw global threshold would keep almost "
    "everything from the cleanest source and almost nothing from the "
    "noisiest; the calibrated gate keeps the same FRACTION of every "
    "source. One window shuffle partitioned by source — parallel "
    "ACROSS sources, one task per source WITHIN, so the skew_robust "
    "twin decomposes the rank over score bands for corpus scale "
    "(bucketed_percent_rank, bit-identical); percent_rank is pure "
    "integer-rank arithmetic (rank-1)/(n-1), bit-identical "
    "cross-engine; the doc_id tiebreak makes the ordering total so "
    "ranks are deterministic.",
)
def q_quality_source_calibrated(
    spark: SparkSession, sf_dir: str, skew_robust: bool = False
) -> DataFrame:
    from msstreamingstack_spark.functions.text import distinct_token_ratio

    d = spread(load_table(spark, sf_dir, "documents"))
    s = d.select(
        "doc_id",
        "source",
        distinct_token_ratio(F.col("text")).alias("score"),
    )
    if skew_robust:
        # the (doc_id tiebreak ⇒ total order) makes percent_rank the
        # row_number form, which decomposes exactly over score bands
        # (operators/windows.py::bucketed_percent_rank) — same integer
        # rank arithmetic, same double bits; see q_pack_sequences for
        # why bare partitionBy(source) cannot ship at corpus scale.
        from msstreamingstack_spark.caching import rotating_persist
        from msstreamingstack_spark.operators.windows import (
            bucketed_percent_rank,
            equidepth_bucket,
        )

        s = rotating_persist(s, "quality_source_calibrated.s")
        ranked = bucketed_percent_rank(
            s,
            "source",
            (F.col("score"), F.col("doc_id")),
            equidepth_bucket(s, "score"),
            out="_pr",
        )
        pr = F.col("_pr")
        src = ranked
    else:
        w = Window.partitionBy("source").orderBy("score", "doc_id")
        pr = F.percent_rank().over(w)
        src = s
    return src.select(
        "doc_id",
        "source",
        F.round(F.col("score"), 9).alias("score"),
        F.round(pr, 9).alias("pct_rank"),
        F.when(pr >= CALIB_KEEP_PCT, 1).otherwise(0).cast("long").alias("keep"),
    )


# Re-apply the driver window: when THIS module was the direct import
# target, queries.py ran before our registrations existed (see the
# _apply_driver_window docstring). When we are instead mid-way through
# ---------------------------------------------------------------------------
# BPE tokenizer training (learn merges on the vocab, segment the corpus)
# ---------------------------------------------------------------------------
from msstreamingstack_spark.operators.bpe import (  # noqa: E402
    BPE_ROUNDS,
    bpe_learn_merges_sql,
    bpe_segment_corpus_sql,
)


@register(
    "bpe_learn_merges",
    bpe_learn_merges_sql(BPE_ROUNDS),
    tags=("extension", "pipeline", "tokenizer", "iterative"),
    doc=f"BPE tokenizer TRAINING (Sennrich et al. 2016), {BPE_ROUNDS} "
    "merge rounds: the learned (round, pair, merged, weighted-count) "
    "merge table. One corpus pass builds the (word, count) vocab — "
    "bounded by the language (~10^6-10^7 words at 100 TB), not the "
    "corpus — and the merge loop then runs DRIVER-SIDE on that "
    "bounded artifact with incremental pair counts (bpe_train_local: "
    "O(1) Spark jobs for any vocab size; the r8 one-job-per-merge "
    "loop is kept as the bit-parity oracle, and an exact distributed "
    "batched trainer exists for vocabs too big to collect). Leftmost-"
    "greedy merge + (count DESC, l, r) tie-break make every round "
    "bit-exact cross-engine — the oracle replays the identical fold "
    "through chained materialized CTEs.",
)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.bpe import bpe_learn_merges

    return bpe_learn_merges(spread(load_table(spark, sf_dir, "documents")))


@register(
    "bpe_segment_corpus",
    bpe_segment_corpus_sql(BPE_ROUNDS),
    tags=("extension", "pipeline", "tokenizer", "iterative"),
    doc="TRAIN+APPLY DEMO (one query does both; production serving "
    "is bpe_segment_pinned): segment every document with the merges "
    "learned in the same plan and report true subword token counts "
    "(doc_id, n_words, n_bpe_tokens) — the honest token accounting "
    "the mixing/packing/budget family approximates with regex "
    "tokenization. The segmentation map is vocab-sized -> BROADCAST; "
    "the corpus pays one explode + one per-doc aggregate on top of "
    "the (now driver-side, O(1)-job) training loop.",
)
def q_bpe_segment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.bpe import bpe_segment_corpus

    return bpe_segment_corpus(spread(load_table(spark, sf_dir, "documents")))


def _bpe_pinned_sql() -> str:
    from msstreamingstack_spark.operators.bpe import bpe_segment_pinned_sql

    return bpe_segment_pinned_sql()


@register(
    "bpe_segment_pinned",
    _bpe_pinned_sql(),
    tags=("extension", "pipeline", "tokenizer", "pinned"),
    doc="The SERVING form of the tokenizer: segment with the PINNED "
    "merge table (resources/bpe_pinned.json, the fasttext/pca/ivf "
    "discipline) — no training loop, no driver actions, no iterative "
    "jobs. The whole pinned merge chain is ONE projection of chained "
    "JVM folds over the DISTINCT vocab (never per word occurrence), "
    "then a broadcast join back and one per-doc aggregate. Unlike "
    "the float-fitted pins this one is bit-deterministic to refit "
    "(exact integer counts + lexicographic tie-break). Output is "
    "pytest-pinned equal to bpe_segment_corpus on the fit corpus.",
)
def q_bpe_segment_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.bpe import bpe_segment_pinned

    return bpe_segment_pinned(spread(load_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Curriculum schedule (round 9) — cumulative easy-to-hard epochs by
# token-length difficulty, the standard text proxy (Bengio et al. 2009
# curriculum learning; Llama-style anneal phases are the same shape
# with quality as the key). The interesting part is the PLAN: epoch
# membership needs each doc's EXACT GLOBAL difficulty rank, and a
# global row_number window is a single task at any scale. Instead the
# rank decomposes distributedly: a token-count histogram (cardinality
# bounded by max document length, so its prefix-sum window is tiny)
# gives each n_tokens value its start rank, and a row_number
# partitioned by n_tokens (bounded tie groups) finishes it —
# grank = hist_prefix(n_tokens) + rn_within(n_tokens). The same
# order-statistics decomposition serves any global-rank need at
# 100 TB. NTILE-compatible cutoffs: epoch e covers ranks
# <= e*(N/3) + min(e, N mod 3) — exact integers, both engines.
# ---------------------------------------------------------------------------
CURRICULUM_EPOCHS = 3


@register(
    "curriculum_epoch_schedule",
    f"""
WITH t AS (
  SELECT doc_id, {token_count_sql('text')} AS n_tokens FROM documents
),
h AS (SELECT n_tokens, COUNT(*) AS c FROM t GROUP BY n_tokens),
hp AS (
  SELECT n_tokens,
         COALESCE(SUM(c) OVER (ORDER BY n_tokens
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS prefix
  FROM h
),
r AS (
  SELECT t.doc_id, t.n_tokens,
         hp.prefix + ROW_NUMBER() OVER (PARTITION BY t.n_tokens
                                        ORDER BY t.doc_id) AS grank
  FROM t JOIN hp USING (n_tokens)
),
n AS (SELECT COUNT(*) AS nn FROM t),
e(epoch) AS (VALUES (1), (2), (3)),
c AS (
  SELECT epoch, epoch * (nn // {CURRICULUM_EPOCHS})
           + LEAST(epoch, nn % {CURRICULUM_EPOCHS}) AS cutoff
  FROM e, n
),
a AS (
  SELECT c.epoch, COUNT(*) AS n_docs,
         CAST(SUM(r.n_tokens) AS BIGINT) AS sum_tokens,
         CAST(MAX(r.n_tokens) AS BIGINT) AS max_tokens
  FROM c JOIN r ON r.grank <= c.cutoff
  GROUP BY c.epoch
)
SELECT CAST(epoch AS BIGINT) AS epoch, n_docs, sum_tokens, max_tokens,
       CAST(n_docs - COALESCE(LAG(n_docs) OVER (ORDER BY epoch), 0)
            AS BIGINT) AS n_new_docs
FROM a
""",
    tags=("extension", "pipeline", "curriculum", "sampling"),
    doc="Cumulative curriculum/anneal schedule: docs ranked easy->hard "
    f"by (n_tokens, doc_id), {CURRICULUM_EPOCHS} NTILE-compatible "
    "tranches, epoch e trains on tranches 1..e; per-epoch doc/token "
    "totals and the per-epoch increment. The global difficulty rank "
    "is computed WITHOUT a single-task global window: histogram "
    "prefix (bounded by max doc length) + per-n_tokens row_number — "
    "the distributed order-statistics pattern any exact global rank "
    "uses at corpus scale. Epoch fan-out is a 3-row broadcast "
    "nested-loop, bounded by the epoch count.",
)
def q_curriculum_epoch_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    h = t.groupBy("n_tokens").agg(F.count("*").alias("c"))
    hp = h.select(
        "n_tokens",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("n_tokens").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("prefix"),
    )
    r = (
        t.join(F.broadcast(hp), "n_tokens")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("n_tokens").orderBy("doc_id")
            ),
        )
        .select("n_tokens", (F.col("prefix") + F.col("rn")).alias("grank"))
    )
    n = t.agg(F.count("*").alias("nn"))
    e = spark.range(1, CURRICULUM_EPOCHS + 1).select(
        F.col("id").alias("epoch")
    )
    c = (
        e.crossJoin(F.broadcast(n))
        .select(
            "epoch",
            (
                F.col("epoch") * F.floor(F.col("nn") / CURRICULUM_EPOCHS)
                + F.least(F.col("epoch"), F.col("nn") % CURRICULUM_EPOCHS)
            ).alias("cutoff"),
        )
    )
    a = (
        F.broadcast(c)
        .join(r, F.col("grank") <= F.col("cutoff"))
        .groupBy("epoch")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )
    return a.select(
        "epoch",
        "n_docs",
        "sum_tokens",
        "max_tokens",
        (
            F.col("n_docs")
            - F.coalesce(
                F.lag("n_docs").over(Window.orderBy("epoch")), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_new_docs"),
    )


# ---------------------------------------------------------------------------
# Corpus n-gram novelty — per-doc fraction of shingles FIRST seen in
# that doc (by doc_id order), the marginal-contribution curve behind
# "is scraping more of this source still adding new text".
# ---------------------------------------------------------------------------
NOVELTY_N = 5


@register(
    "ngram_novelty_score",
    f"""
WITH s AS (
  SELECT doc_id, unnest({shingles_sql("text", NOVELTY_N)}) AS sh
  FROM documents
),
first AS (SELECT sh, MIN(doc_id) AS first_doc FROM s GROUP BY sh),
per AS (
  SELECT s.doc_id, COUNT(*) AS total_shingles,
         SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
           AS novel_shingles
  FROM s JOIN first f ON s.sh = f.sh GROUP BY 1
)
SELECT d.doc_id, d.lang,
       COALESCE(p.total_shingles, 0) AS total_shingles,
       COALESCE(p.novel_shingles, 0) AS novel_shingles,
       COALESCE(p.novel_shingles * 100 // p.total_shingles, 100)
         AS novelty_pct
FROM documents d LEFT JOIN per p USING (doc_id)
""",
    tags=("extension", "text", "dedup", "pipeline", "novelty"),
    doc=f"Per-doc novelty: the fraction of its distinct word "
    f"{NOVELTY_N}-gram shingles whose FIRST corpus occurrence (min "
    "doc_id — ingestion order) is this doc. The aggregate novelty "
    "curve over ingestion order is the diminishing-returns signal "
    "data-sourcing decisions use ('another crawl of this domain adds "
    "2% new text'), and per-doc it is a boilerplate detector that "
    "needs no pairwise comparison at all — a TEMPLATE dedup "
    "complement to minhash (a doc of entirely-seen shingles is a "
    "near-dup of the corpus prefix even if no single doc matches "
    "it). 100 TB: shingle explode is linear, first-occurrence MIN is "
    "map-combined into one shuffle on the shingle key, the "
    "attribution join is keyed on the same shingle (no fan-out — one "
    "first_doc row per shingle), and the per-doc fold is a second "
    "map-combined count; integer division keeps it hash-exact. "
    "Extension (SURVEY.md SS2.5: no text-analysis surface in the "
    "reference).",
)
def q_ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    s = docs.select(
        "doc_id",
        F.explode(shingles(F.col("text"), NOVELTY_N)).alias("sh"),
    )
    # first-occurrence attribution as a WINDOW MIN over one exchange on
    # sh instead of groupBy(sh) + join-back of the raw occurrence table
    # (the join re-exchanged every occurrence row a second time):
    # interleaved A/B at sf0.1 1.52 -> 0.74 s, values identical. The
    # exchange partitions the same occurrence rows by the same key as
    # the old join's probe side, but BUFFERING differs (ADVICE r11):
    # WindowExec buffers each same-hash group in one task with no
    # partial aggregation, where the old groupBy side map-combined — a
    # globally hot shingle hash would spill one task here. If hot-hash
    # skew shows up at larger SF, the fallback shape is the
    # pre-aggregated groupBy(sh).min + broadcast of the (tiny) dup-key
    # set. (Same trade in the min!=max rewrites: substring_dup_spans,
    # chunk_dup_fraction.)
    per = (
        s.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("sh"))
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total_shingles"),
            F.sum(
                F.when(
                    F.col("first_doc") == F.col("doc_id"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("novel_shingles"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("total_shingles"), F.lit(0)).alias(
                "total_shingles"
            ),
            F.coalesce(F.col("novel_shingles"), F.lit(0)).alias(
                "novel_shingles"
            ),
            F.coalesce(
                F.expr("novel_shingles * 100 div total_shingles"),
                F.lit(100),
            ).alias("novelty_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Label-outlier mining — per-label centroid, then the vectors LEAST
# aligned with their own label's centroid: the standard first-pass
# mislabel / noisy-annotation detector over an embedded dataset.
# ---------------------------------------------------------------------------
LABEL_OUTLIER_K = 5


@register(
    "embedding_label_outliers",
    f"""
WITH pe AS (
  SELECT label, vec_id,
         unnest(list_transform(range(len(embedding)),
                i -> struct_pack(pos := i,
                     val := CAST(embedding[i + 1] AS DOUBLE)))) AS u
  FROM embeddings
),
pe2 AS (SELECT label, vec_id, u.pos AS pos, u.val AS val FROM pe),
cd AS (
  SELECT label, pos,
         CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE) AS s,
         COUNT(*) AS cnt
  FROM pe2 GROUP BY 1, 2
),
cent AS (
  SELECT label, list(s / cnt ORDER BY pos) AS centroid FROM cd
  GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id,
         round({cosine_sql("e.embedding", "c.centroid")}, {COS_ROUND})
           AS cos_centroid
  FROM embeddings e JOIN cent c ON e.label = c.label
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                               ORDER BY cos_centroid, vec_id) AS rn
  FROM scored
)
SELECT label, vec_id, cos_centroid, rn FROM r WHERE rn <= {LABEL_OUTLIER_K}
""",
    tags=("extension", "embedding", "quality", "outlier"),
    doc="Mislabel mining: per label an exact centroid (per-dimension "
    "DECIMAL-summed mean over the posexploded vectors — float sums "
    "are order-dependent, decimal sums are not), then every vector's "
    f"cosine to its OWN label centroid (the registry's established "
    "sequential-fold dot + round-9 discipline), bottom-"
    f"{LABEL_OUTLIER_K} per label = the annotation-noise review "
    "queue. This is the cheap first pass every labeled-embedding "
    "pipeline runs before training a classifier head: a vector "
    "anti-aligned with its label's mass is either mislabeled or an "
    "ambiguous example worth auditing. 100 TB: the posexplode fan-"
    "out is x-dims but collapses map-side into the (label, dim) "
    "centroid frame — labels x dims rows total, broadcast back; the "
    "scoring pass is embarrassingly parallel with NO shuffle beyond "
    "the bounded per-label bottom-K rank (topk_per_key_salted is the "
    "hot-label knob, same (cos, vec_id) total order). Extension "
    "(SURVEY.md SS2.5: no similarity surface in the reference).",
)
def q_embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from msstreamingstack_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("pos", "val"),
    )
    cd = pe.groupBy("label", "pos").agg(
        F.sum(F.col("val").cast("double").cast("decimal(38,12)"))
        .cast("double")
        .alias("s"),
        F.count("*").alias("cnt"),
    )
    cent = (
        cd.select(
            "label",
            F.struct(
                F.col("pos"), (F.col("s") / F.col("cnt")).alias("m")
            ).alias("pm"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("pm")),
                lambda x: x.getField("m"),
            ).alias("centroid")
        )
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        F.round(
            cosine(F.col("embedding"), F.col("centroid")), COS_ROUND
        ).alias("cos_centroid"),
    )
    wL = Window.partitionBy("label").orderBy("cos_centroid", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(wL))
        .filter(F.col("rn") <= LABEL_OUTLIER_K)
        .select("label", "vec_id", "cos_centroid", "rn")
    )


# queries.py's own bottom imports, the helper isn't defined yet — the
# getattr no-ops and queries.py's own call applies the window.
import msstreamingstack_spark.queries as _queries  # noqa: E402

getattr(_queries, "_apply_driver_window", lambda: None)()

# v2-pipeline composed-oracle retry (see queries_pipeline's bottom):
# a direct import of THIS module makes queries_pipeline's attach run
# before quality_gopher_rules / quality_ensemble_score exist; retry
# now that they do. No-op when already attached; never triggers a
# fresh queries_pipeline import.
import sys as _sys  # noqa: E402

_qp = _sys.modules.get("msstreamingstack_spark.queries_pipeline")
if _qp is not None:
    getattr(_qp, "_attach_v2_oracle", lambda: None)()
