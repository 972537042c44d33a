#!/usr/bin/env python
"""Scaling sanity check: run headline operators at sf0.1 and at a
synthetically scaled multiple (default 4x) and report the runtime
ratio per query.

A healthy distributed plan scales ~linearly in rows (ratio ≈ scale,
plus fixed overheads that push small-query ratios BELOW scale); a
ratio well above the scale factor flags a super-linear kernel
(exploding join fan-out, quadratic pair generation, single-partition
window) that would not survive 100 TB.

The scaled dataset is derived from sf0.1 with shifted keys and
perturbed text (so dedup/similarity kernels see real entropy, not
k identical copies of every document — k-fold literal duplication
would quadratically inflate every duplicate group and measure the
data, not the plan). Written under /tmp; cleaned up afterwards.

Usage: python bench_scale.py [--scale 4] [--keep]
Prints one JSON line:
  {"metric": "scale_ratio", "scale": k,
   "queries": {name: {"base_s":..., "scaled_s":..., "ratio":...}}}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from msstreamingstack_spark.queries import REGISTRY  # noqa: E402
from msstreamingstack_spark.session import get_spark  # noqa: E402
from msstreamingstack_spark.sources.tables import load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

# one representative per plan family: window-sessionize, hash-agg,
# shuffle join + agg, window-pack, digest-window dedup, shingle-join
# dedup, composite pipeline, embedding kernel, broadcast-semi-join
# decontamination, corpus-freq self-join quality score
QUERIES = (
    "sessionize_events",
    "sessionize_events_bucketed",   # skew-bounded twin: ratio must track the plain form
    "tpch_q1",
    "tpch_q3_building",
    "pack_sequences_greedy",
    "dedup_exact",
    "dedup_minhash_lsh",
    "pipeline_pretrain_corpus",
    "similarity_topk_cosine",
    "decontaminate_eval_overlap",
    "quality_chartrigram_df",
    "running_revenue_bucketed",
    "quality_char_entropy",
    "dq_report",
    "dedup_embedding_lsh",
    "dedup_simhash_pairs",   # round-4 banded bucket join: must scale ~linearly now
    "lang_shingle_overlap",  # round-4: (lang, h) distinct + bounded self-join
    # round-5 additions: the r4-perf-flagged kernel (absent from both
    # r4 sweeps) and the remaining heavy hitters never scale-certified
    "dedup_jaccard_dfcapped",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    # round-5 late additions
    "dedup_cluster_canonical",
    "quality_bigram_lm",
    "token_budget_quality_sample",
    "variant_props_profile",
    "chunk_dup_fraction",
    # round-6 additions: the pinned-IVF probe (plan changed — fit
    # moved offline), its analytics reuse, and the new SQL shapes
    "similarity_ann_ivf",
    "corpus_topic_balance",
    "sql_frontend_exists_parity",
    "sql_frontend_setops_all_parity",
    # round-6 late additions: sliding-window substring detector, the
    # quality ensemble, SemDeDup, the CCNet chunk rewrite, and DSIR
    "substring_dup_spans",
    "quality_ensemble_score",
    "dedup_semantic",
    "dedup_chunk_rewrite",
    "dsir_importance_weights",
    "dedup_events_debounce",
    "sql_frontend_recursive_spine_parity",
    "sql_frontend_lateral_topk_parity",
    "mine_hard_negatives",
    # continuation additions: pinned-model serving (fastText-style
    # classifier, PCA projection)
    "langid_fasttext_hashed",
    "embedding_pca_project",
    "graph_pagerank_copurchase",
    "sql_frontend_scripting_parity",
    "merge_upsert_customers",
    "scd2_merge_device_dim",
    "asof_next_purchase_tolerance",
    "sessionize_dynamic_gap",
    "quality_gopher_rules",
    "graph_pagerank_personalized",
    "pit_device_dim_join",
    "sketch_countmin_user_events",
    # fifth/sixth-wave additions: retrieval scoring, blocked entity
    # matching, the pandas EWMA kernel, degree-oriented triangles,
    # exact-moment regression aggregates
    "retrieval_bm25_topk",
    "entity_match_blocked",
    "ewma_event_values",
    "graph_triangle_count",
    "regr_value_on_propk",
    "coreset_kcenter",
    # round-6 session-6 additions: robust MAD fences, epoch-capped
    # mixing
    "anomaly_mad_events",
    "mix_epochs_budget",
    "decontaminate_minhash",
    "pack_blocks_fixed",
    "quality_source_calibrated",
    "resample_ohlc_hourly",
    "wau_sliding_distinct",
    # round-7: mergeable HLL twin — must hold ~flat where the exact
    # form's distinct sets scale with users (r6 worst ratio 2.95)
    "wau_sliding_hll",
    "session_paths_topk",
    "event_transition_matrix",
    "vocab_oov_coverage",
    "bootstrap_ci_value_mean",
    "dedup_containment_pairs",
    "events_gap_stats",
    "rfm_segments",
    "basket_lift_pairs",
    "events_dow_profile",
    # round-10: the reworked capped basket kernel (map-combined
    # two-exchange shape) and the two new oracled sketch twins —
    # both must hold ~flat (registers/samples are bounded artifacts;
    # only the map-combined build shuffle scales with data)
    "basket_lift_pairs_capped",
    "percentile_event_values_sketch",
    "wau_sliding_hll_oracled",
    # round-11: theta-intersection sketch (samples bounded — must hold
    # ~flat like the other sketches), integer-ticket weighted sampler
    # (bounded x4 explode + map-combined MIN), CUSUM on the bounded
    # hourly frame, first-occurrence novelty (two map-combined shingle
    # shuffles), and the broadcast-centroid outlier scorer
    "segment_overlap_theta",
    "sample_weighted_tickets",
    "anomaly_cusum_events",
    "ngram_novelty_score",
    "embedding_label_outliers",
)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def build_scaled(spark, out_dir: str, k: int) -> None:
    """k-fold scale-up with disjoint keys per replica."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, BASE_SF, t)
        if t in ("region", "nation"):  # dims stay fixed
            df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
            continue
        parts = []
        for i in range(k):
            p = df
            shift = {
                "customer": [("c_custkey", 1_000_000)],
                "supplier": [("s_suppkey", 1_000_000)],
                "part": [("p_partkey", 1_000_000)],
                "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
                "lineitem": [
                    ("l_orderkey", 10_000_000),
                    ("l_partkey", 1_000_000),
                    ("l_suppkey", 1_000_000),
                ],
                "events": [("event_id", 10_000_000), ("user_id", 100_000)],
                "documents": [("doc_id", 10_000_000)],
                "embeddings": [("vec_id", 10_000_000)],
            }.get(t, [])
            for col, stride in shift:
                p = p.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "documents" and "text" in p.columns:
                # perturb text per replica so content hashes differ AND
                # shingle sets decorrelate: suffix every 3rd word with
                # the replica id, so every k-gram (k>=3) contains a
                # modified word and cross-replica jaccard collapses to
                # ~0. (A suffix-only or rotation tweak preserves ~all
                # shingles, so every doc gains 15 near-identical LSH
                # twins at 16x and pair counts inflate quadratically —
                # measuring the data, not the plan.) Intra-replica
                # duplicate structure is preserved: real duplicate
                # pairs stay duplicates within each replica.
                if i > 0:
                    p = p.withColumn(
                        "text",
                        F.concat_ws(
                            " ",
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda w, pos: F.when(
                                    pos % 3 == 0, F.concat(w, F.lit(f"_r{i}"))
                                ).otherwise(w),
                            ),
                        ),
                    )
                p = p.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{i}"))
                )
            if t == "embeddings" and i > 0:
                # cyclically rotate each vector by a per-replica offset:
                # random vectors are near-orthogonal to their rotations,
                # so replicas add entropy instead of k identical copies
                # (which would quadratically inflate every LSH near-dup
                # group and measure the data, not the plan).
                dim = 64
                off = (i * 7) % dim
                if off:
                    p = p.withColumn(
                        "embedding",
                        F.expr(
                            f"concat(slice(embedding, {off + 1}, {dim - off}), "
                            f"slice(embedding, 1, {off}))"
                        ),
                    )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def timed(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
        spark.sparkContext._jvm.System.gc()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--reuse",
        action="store_true",
        help="skip the scaled-dataset build if its directory already "
        "exists (pair with --keep for fast iteration)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the default query list",
    )
    args = ap.parse_args()
    queries = QUERIES if not args.queries else tuple(args.queries.split(","))
    unknown = [q for q in queries if q not in REGISTRY]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark(app_name="msstreamingstack-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = f"/tmp/msstream_scale_{args.scale}x"
    if not (args.reuse and os.path.isdir(scaled_dir)):
        build_scaled(spark, scaled_dir, args.scale)
    try:
        results = {}
        for name in queries:
            base = timed(spark, name, BASE_SF)
            scaled = timed(spark, name, scaled_dir)
            results[name] = {
                "base_s": round(base, 3),
                "scaled_s": round(scaled, 3),
                "ratio": round(scaled / base, 2),
            }
            print(f"# {name}: {results[name]}", file=sys.stderr)
        print(
            json.dumps(
                {"metric": "scale_ratio", "scale": args.scale, "queries": results}
            )
        )
    finally:
        if not args.keep:
            shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
