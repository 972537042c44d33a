"""The round-8 end-to-end pretraining-corpus pipeline (v2): every
major LLM-data kernel the engine gained in rounds 6-7, composed into
ONE oracled plan.

``pipeline_pretrain_corpus`` (v1, queries_extensions.py) predates the
gopher/ensemble/semantic/decontamination/mixing kernels and stays
registered as the lean per-row-gates form (and as the cross-round
bench/scale anchor — its plan must not change under history
comparisons). v2 is the full funnel a production corpus build runs:

  documents
    -> quality gates   (gopher rule composite AND ensemble decile<=8)
    -> exact dedup     (min doc_id per md5(text) among gate survivors)
    -> fuzzy dedup     (MinHash-LSH pairs @ jaccard>=0.8: drop the
                        larger id of every verified pair)
    -> semantic dedup  (SemDeDup is_semdup from the pinned-IVF kernel,
                        embeddings joined 1:1 on doc_id = vec_id)
    -> decontamination (hold out BOTH eval slices, drop exact
                        shingle-overlap contaminated docs AND fuzzy
                        minhash-cross matched docs)
    -> mixing          (temperature alpha=0.5 per-source budgets ->
                        integer basis-point hash thresholds -- the
                        scale form of budget adherence: a pure
                        broadcast-joined row filter, never a
                        per-source rank window)
    -> packing         (pack_blocks_fixed token accounting: per-source
                        kept tokens incl. +1 EOD each and the exact
                        ceil(total/512) full-block count)

Output: ONE row per source with the whole funnel as integer counts —
n_docs >= n_gate >= n_exact >= n_fuzzy >= n_sem >= n_clean >= n_kept,
plus kept_tokens / n_blocks. All-integer output hashes bit-stably.

Cross-engine exactness: every stage reuses the REGISTERED operator's
exact SQL twin verbatim (the oracle embeds ``REGISTRY[...].oracle``
subqueries), so a constant or expression can never desynchronize the
composition from its parts — the lesson of the round-6 band-key
advice. The mixing arithmetic is mix_temperature_sources' proven
DECIMAL/sqrt form followed by an integer division to basis points.

Scale design (100 TB): the gates fuse into scans; exact dedup is one
digest window over gate survivors; fuzzy/semantic/decontamination are
the operators' own banded/bucketed/broadcast shapes (never
all-pairs); mixing is a broadcast rate join; packing statistics
reduce to per-source integer sums (the per-block detail frame remains
``pack_blocks_fixed``). The funnel aggregate itself is one
groupBy(source) over a persisted doc-level flag frame.

Reference: the reference has no corpus surface at all (SURVEY.md
§2.5 ABSENT) — this is north-star extension composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from msstreamingstack_spark.queries import REGISTRY, register
from msstreamingstack_spark.functions.text import token_count, token_count_sql
from msstreamingstack_spark.operators.dedup import (
    _band_buckets,
    doc_shingle_hashes,
    eval_overlap_stats,
    eval_overlap_sql,
    minhash_cross_pairs,
    minhash_cross_sql,
    minhash_lsh_pairs,
    minhash_lsh_sql,
    minhash_signatures,
)
# NOT a from-import: when a DIRECT `import queries_extensions` is the
# process's first query-module import, its registrations re-enter
# queries.py, whose bottom imports THIS module while queries_extensions
# is still partially initialized — a from-import of its constants
# raises ImportError at that point. Importing the MODULE binds the
# (partial) module object; every constant access below happens inside
# a function body, by which time initialization has completed.
from msstreamingstack_spark import queries_extensions as _qx
from msstreamingstack_spark.sources.tables import load_table, spread

# Funnel constants — one place, shared by builder and oracle.
ENSEMBLE_DECILE_MAX = 8     # drop the worst 2 quality deciles
FUZZY_JACCARD_T = 0.8       # the dedup family's near-identity bar
BLOCK_TOKENS_V2 = 512       # == pack_blocks_fixed's BLOCK_TOKENS
MIX_HALVING = 0.5           # temperature budget = half the clean corpus


def _v2_oracle() -> str:
    """DuckDB twin, composed from the registered operators' oracles.

    Built lazily (module bottom) because dedup_semantic's oracle is
    itself attached post-registration from the pinned-index sizing.
    """
    gopher = REGISTRY["quality_gopher_rules"].oracle
    ensemble = REGISTRY["quality_ensemble_score"].oracle
    semantic = REGISTRY["dedup_semantic"].oracle
    assert gopher and ensemble and semantic  # registration-order guard
    return f"""
WITH gop AS ({gopher}),
ens AS ({ensemble}),
fz AS (SELECT DISTINCT d2 FROM ({minhash_lsh_sql(FUZZY_JACCARD_T)})),
sem AS (SELECT vec_id FROM ({semantic}) WHERE is_semdup = 1),
ce AS (SELECT doc_id
       FROM ({eval_overlap_sql(f"d.doc_id % {_qx.EVAL_EVERY} = 0")})
       WHERE contaminated = 1),
cf AS (SELECT DISTINCT train_id
       FROM ({minhash_cross_sql(_qx.DECON_MOD, _qx.DECON_REM, _qx.DECON_JACCARD_T)})),
flags0 AS (
  SELECT d.doc_id, d.source,
         {token_count_sql('d.text')} + 1 AS n_tokens,
         {_qx.SPLIT_BUCKET_SQL.replace('doc_id', 'd.doc_id')} AS bucket,
         md5(d.text) AS digest,
         g.gopher_pass AND e.quality_decile <= {ENSEMBLE_DECILE_MAX} AS gate
  FROM documents d
  JOIN gop g ON g.doc_id = d.doc_id
  JOIN ens e ON e.doc_id = d.doc_id
),
ex AS (
  SELECT *,
         gate AND doc_id = MIN(CASE WHEN gate THEN doc_id END)
           OVER (PARTITION BY digest) AS exact_pass
  FROM flags0
),
st AS (
  SELECT doc_id, source, n_tokens, bucket, gate, exact_pass,
         exact_pass AND doc_id NOT IN (SELECT d2 FROM fz) AS fuzzy_pass,
         exact_pass AND doc_id NOT IN (SELECT d2 FROM fz)
           AND doc_id NOT IN (SELECT vec_id FROM sem) AS sem_pass,
         exact_pass AND doc_id NOT IN (SELECT d2 FROM fz)
           AND doc_id NOT IN (SELECT vec_id FROM sem)
           AND doc_id % {_qx.EVAL_EVERY} != 0
           AND doc_id % {_qx.DECON_MOD} != {_qx.DECON_REM}
           AND doc_id NOT IN (SELECT doc_id FROM ce)
           AND doc_id NOT IN (SELECT train_id FROM cf) AS clean
  FROM ex
),
cnt AS (
  SELECT source, COUNT(*) FILTER (WHERE clean) AS n_clean_src
  FROM st GROUP BY source
),
w AS (
  SELECT source, n_clean_src,
         CAST(sqrt(CAST(n_clean_src AS DOUBLE)) AS DECIMAL(18,9)) AS w_dec
  FROM cnt WHERE n_clean_src > 0
),
t AS (SELECT CAST(SUM(w_dec) AS DECIMAL(38,9)) AS tot_w,
             CAST(SUM(n_clean_src) AS BIGINT) AS total_clean FROM w),
rates AS (
  SELECT w.source,
         (10000 * CAST(FLOOR((CAST(w.w_dec AS DOUBLE) / CAST(t.tot_w AS DOUBLE))
                             * (CAST(t.total_clean AS DOUBLE) * {MIX_HALVING}))
                       AS BIGINT)) // w.n_clean_src AS keep_bp
  FROM w, t
),
kept AS (
  SELECT st.*,
         st.clean AND st.bucket < COALESCE(r.keep_bp, 0) AS keep
  FROM st LEFT JOIN rates r ON r.source = st.source
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE gate) AS n_gate,
       COUNT(*) FILTER (WHERE exact_pass) AS n_exact,
       COUNT(*) FILTER (WHERE fuzzy_pass) AS n_fuzzy,
       COUNT(*) FILTER (WHERE sem_pass) AS n_sem,
       COUNT(*) FILTER (WHERE clean) AS n_clean,
       COUNT(*) FILTER (WHERE keep) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN keep THEN n_tokens END), 0) AS BIGINT)
         AS kept_tokens,
       CAST((COALESCE(SUM(CASE WHEN keep THEN n_tokens END), 0)
             + {BLOCK_TOKENS_V2 - 1}) // {BLOCK_TOKENS_V2} AS BIGINT)
         AS n_blocks
FROM kept
GROUP BY source
"""


@register(
    "pipeline_pretrain_corpus_v2",
    None,  # attached below — depends on dedup_semantic's late oracle
    tags=("extension", "pipeline", "composite", "v2"),
    doc="The full round-8 pretraining-corpus funnel in one oracled "
    "plan: gopher+ensemble quality gates, exact (digest window) + "
    "fuzzy (MinHash-LSH 0.8) + semantic (SemDeDup) dedup, exact AND "
    "fuzzy benchmark decontamination with both eval slices held out, "
    "temperature-mixing keep rates as integer basis-point hash "
    "thresholds (the broadcast-filter form of budget adherence — "
    "never a per-source rank window), and pack_blocks_fixed token "
    "accounting (+1 EOD per doc, exact ceil(total/512) full blocks). "
    "One integer row per source: the monotone funnel "
    "n_docs>=n_gate>=n_exact>=n_fuzzy>=n_sem>=n_clean>=n_kept plus "
    "kept_tokens/n_blocks. Every stage reuses the registered "
    "operator's exact expression (the oracle embeds their SQL twins "
    "verbatim), so composition and parts cannot desynchronize. "
    "skew_robust swaps the digest window for a partial-agg + "
    "AQE-splittable join and the packing cumsum for the (source, "
    "bucket) decomposition — bit-identical, parity- and plan-pinned.",
)
def q_pipeline_pretrain_v2(
    spark: SparkSession, sf_dir: str, skew_robust: bool = True
) -> DataFrame:
    kept = pretrain_corpus_doc_flags(spark, sf_dir, skew_robust=skew_robust)

    def cnt_if(c: str, alias: str):
        return F.count(F.when(F.col(c), 1)).alias(alias)

    kept_tokens = F.coalesce(
        F.sum(F.when(F.col("keep"), F.col("n_tokens"))), F.lit(0)
    ).cast("long")
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            cnt_if("gate", "n_gate"),
            cnt_if("exact_pass", "n_exact"),
            cnt_if("fuzzy_pass", "n_fuzzy"),
            cnt_if("sem_pass", "n_sem"),
            cnt_if("clean", "n_clean"),
            cnt_if("keep", "n_kept"),
            kept_tokens.alias("kept_tokens"),
        )
        .withColumn(
            "n_blocks",
            F.expr(
                f"CAST((kept_tokens + {BLOCK_TOKENS_V2 - 1}) "
                f"div {BLOCK_TOKENS_V2} AS BIGINT)"
            ),
        )
    )


def pretrain_corpus_doc_flags(
    spark: SparkSession, sf_dir: str, skew_robust: bool = True
) -> DataFrame:
    """The v2 funnel at DOCUMENT granularity: one row per input doc
    with every stage flag (gate, exact_pass, fuzzy_pass, sem_pass,
    clean, keep) plus n_tokens and the split bucket. The registry
    query aggregates this to the per-source report;
    :func:`build_pretrain_corpus` (the ``corpus-build`` CLI) filters
    it to the kept set and re-attaches text + block positions — both
    consumers share one persisted computation of the whole chain.

    ``skew_robust`` (DEFAULT) replaces the exact-dedup digest WINDOW
    with a map-combined groupBy(digest) min + equi-join —
    bit-identical, and the join is AQE-skew-splittable where a window
    partitioned by a viral page's digest pins that whole duplicate
    group to one task (the dedup_exact twin's rationale,
    operators/dedup.py). Unlike the per-operator twins, this one is
    the default: TWINS_r8.json measured it FASTER on uniform bench
    data too (12.1 vs 14.3 s — premium 0.84, no insurance cost to
    pay), so the single-window form survives only as the
    skew_robust=False A/B arm."""
    from msstreamingstack_spark.caching import rotating_persist

    docs = spread(load_table(spark, sf_dir, "documents"))

    gop = (
        REGISTRY["quality_gopher_rules"]
        .builder(spark, sf_dir)
        .select("doc_id", "gopher_pass")
    )
    ens = (
        REGISTRY["quality_ensemble_score"]
        .builder(spark, sf_dir)
        .select("doc_id", "quality_decile")
    )
    # ONE shingle materialization feeds fuzzy dedup AND both
    # decontamination stages — the per-stage slots would explode the
    # full text three times per execution (the most expensive subtree
    # in the family; at 100 TB that's three corpus scans for one).
    # eager (r11): the shared shingle table feeds the fuzzy-dedup AND
    # both decontamination kernels, whose broadcast subtrees race a
    # lazy cache (the round-8/10 lesson); interleaved A/B below
    sh = doc_shingle_hashes(docs, slot="pipeline_v2.sh", eager=True)
    # ONE signature/bucket build feeds fuzzy dedup AND fuzzy
    # decontamination (r12): both kernels' bucket subtrees are the
    # identical expression over the shared shingle slot, so without
    # this the 16-min-aggregate signature pass over the corpus-sized
    # shingle table runs twice per execution. eager: consumed under
    # broadcast subtrees (same race as the sh slot).
    buckets = rotating_persist(
        _band_buckets(minhash_signatures(sh)),
        "pipeline_v2.buckets",
        eager=True,
    )
    fuzzy_drop = (
        minhash_lsh_pairs(
            docs, FUZZY_JACCARD_T, shingles_df=sh, buckets_df=buckets
        )
        .select(F.col("d2").alias("doc_id"))
        .distinct()
        .withColumn("_fz", F.lit(True))
    )
    sem_drop = (
        REGISTRY["dedup_semantic"]
        .builder(spark, sf_dir)
        .filter(F.col("is_semdup") == 1)
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("_sem", F.lit(True))
    )
    exact_contam = (
        eval_overlap_stats(
            docs, F.col("doc_id") % _qx.EVAL_EVERY == 0, shingles_df=sh
        )
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
        .withColumn("_ce", F.lit(True))
    )
    fuzzy_contam = (
        minhash_cross_pairs(
            docs,
            F.col("doc_id") % _qx.DECON_MOD == _qx.DECON_REM,
            _qx.DECON_JACCARD_T,
            shingles_df=sh,
            buckets_df=buckets,
        )
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("_cf", F.lit(True))
    )

    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 10000
    )
    base = docs.select(
        "doc_id",
        "source",
        (token_count(F.col("text")) + 1).alias("n_tokens"),
        bucket.alias("bucket"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
    )
    flags0 = (
        base.join(gop, "doc_id")
        .join(ens, "doc_id")
        .withColumn(
            "gate",
            F.col("gopher_pass")
            & (F.col("quality_decile") <= ENSEMBLE_DECILE_MAX),
        )
    )
    if skew_robust:
        # the flag frame feeds BOTH sides of the keep-id join; persist
        # or the gates/ensemble chain runs twice
        flags0 = rotating_persist(flags0, "pipeline_v2.flags0")
        keep_ids = flags0.groupBy("digest").agg(
            F.min(F.when(F.col("gate"), F.col("doc_id"))).alias("_keep_id")
        )
        ex = flags0.join(keep_ids, "digest").withColumn(
            "exact_pass",
            F.col("gate") & (F.col("doc_id") == F.col("_keep_id")),
        ).drop("_keep_id")
    else:
        w_digest = Window.partitionBy("digest")
        ex = flags0.withColumn(
            "exact_pass",
            F.col("gate")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("gate"), F.col("doc_id"))).over(
                    w_digest
                )
            ),
        )
    st = (
        ex.join(fuzzy_drop, "doc_id", "left")
        .join(sem_drop, "doc_id", "left")
        .join(exact_contam, "doc_id", "left")
        .join(fuzzy_contam, "doc_id", "left")
        .withColumn(
            "fuzzy_pass", F.col("exact_pass") & F.col("_fz").isNull()
        )
        .withColumn("sem_pass", F.col("fuzzy_pass") & F.col("_sem").isNull())
        .withColumn(
            "clean",
            F.col("sem_pass")
            & (F.col("doc_id") % _qx.EVAL_EVERY != 0)
            & (F.col("doc_id") % _qx.DECON_MOD != _qx.DECON_REM)
            & F.col("_ce").isNull()
            & F.col("_cf").isNull(),
        )
        .select(
            "doc_id", "source", "n_tokens", "bucket",
            "gate", "exact_pass", "fuzzy_pass", "sem_pass", "clean",
        )
    )
    # the flag frame feeds the rate aggregate AND the final funnel —
    # persist once or the whole gates/dedup/decontam chain runs twice.
    # eager (r11): the rate side ends in broadcast(rates), whose build
    # thread would otherwise race the main plan to populate this cache
    # and re-run the whole upstream funnel; interleaved best-of-3 A/B
    # at sf0.1: lazy 15.14 s vs sh+flags eager 12.87 s (flags0 eager
    # on top measured 13.46 — not adopted).
    st = rotating_persist(st, "pipeline_v2.flags", eager=True)

    cnt = st.groupBy("source").agg(
        F.count(F.when(F.col("clean"), 1)).alias("n_clean_src")
    )
    w = cnt.filter(F.col("n_clean_src") > 0).select(
        "source",
        "n_clean_src",
        F.sqrt(F.col("n_clean_src").cast("double"))
        .cast("decimal(18,9)")
        .alias("w_dec"),
    )
    t = w.agg(
        F.sum("w_dec").cast("decimal(38,9)").alias("tot_w"),
        F.sum("n_clean_src").cast("long").alias("total_clean"),
    )
    share = F.col("w_dec").cast("double") / F.col("tot_w").cast("double")
    budget = F.floor(
        share * (F.col("total_clean").cast("double") * MIX_HALVING)
    ).cast("long")
    rates = (
        w.crossJoin(F.broadcast(t))
        .withColumn("budget_docs", budget)
        .select(
            "source",
            F.expr("(10000 * budget_docs) div n_clean_src").alias("keep_bp"),
        )
    )
    return st.join(F.broadcast(rates), "source", "left").withColumn(
        "keep",
        F.col("clean") & (F.col("bucket") < F.coalesce("keep_bp", F.lit(0))),
    )


def build_pretrain_corpus(
    spark: SparkSession, sf_dir: str, skew_robust: bool = True
) -> DataFrame:
    """Materialize the corpus the v2 funnel KEEPS — the deliverable
    behind the report: (doc_id, source, n_tokens, first_block,
    block_offset, text), where first_block/block_offset place each
    document's first token in the pack_blocks_fixed layout
    (per-source concat in doc_id order, +1 EOD per doc,
    BLOCK_TOKENS_V2-token blocks). Filtering to the kept set BEFORE
    the packing window means the cumsum runs over survivors only —
    the block layout is the training layout, and at 100 TB the
    window input is already mixing-budget-bounded (~half the clean
    corpus)."""
    kept = (
        pretrain_corpus_doc_flags(spark, sf_dir, skew_robust=skew_robust)
        .filter(F.col("keep"))
        .select("doc_id", "source", "n_tokens")
    )
    if skew_robust:
        # fixed source cardinality + corpus-sized rows = the window
        # shape AQE cannot skew-split; the (source, doc-range bucket)
        # prefix decomposition is bit-identical (long partials re-add
        # exactly — operators/windows.py, same form as pack_blocks)
        from msstreamingstack_spark.operators.windows import (
            bucketed_running_sum,
        )

        spans = bucketed_running_sum(
            kept,
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
        spans = kept.withColumn(
            "fin", F.sum("n_tokens").over(w).cast("long")
        ).withColumn("st", F.col("fin") - F.col("n_tokens"))
    placed = spans.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"st div {BLOCK_TOKENS_V2}").alias("first_block"),
        F.expr(f"st % {BLOCK_TOKENS_V2}").alias("block_offset"),
    )
    text = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return placed.join(text, "doc_id").select(
        "doc_id", "source", "n_tokens", "first_block", "block_offset", "text"
    )


# dedup_semantic's oracle is attached after its registration (pinned
# IVF sizing), and this module imports after queries_advanced in
# queries.py's bottom order — so on the canonical path every
# constituent oracle exists here. But a DIRECT import of a query
# module (e.g. ``import msstreamingstack_spark.queries_advanced``)
# re-enters queries.py while that module's registrations are still
# pending, and queries.py's bottom then imports THIS module before
# dedup_semantic exists — the _apply_driver_window re-entrancy story
# exactly. So the attach is a retryable no-op-on-missing helper that
# the constituent modules' bottoms re-invoke once their
# registrations land.
def _attach_v2_oracle() -> None:
    spec = REGISTRY.get("pipeline_pretrain_corpus_v2")
    if spec is None or spec.oracle is not None:
        return
    # A constituent can be REGISTERED while its own post-registration
    # oracle attach is still pending (spec present, oracle None) —
    # dedup_semantic on a direct queries_advanced import. Defer then
    # too, not only on missing keys (ADVICE r8).
    for name in (
        "quality_gopher_rules", "quality_ensemble_score", "dedup_semantic"
    ):
        dep = REGISTRY.get(name)
        if dep is None or dep.oracle is None:
            return  # constituent mid-import; its bottom re-invokes
    spec.oracle = _v2_oracle()


_attach_v2_oracle()
