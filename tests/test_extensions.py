"""Extension-operator tests: ANN recall vs the exact baseline, LSH vs
exact jaccard agreement, and the multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from msstreamingstack_spark.extensions.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_stats,
    sample_frames,
    synthetic_media,
)
from msstreamingstack_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from msstreamingstack_spark.operators.similarity import (
    brute_force_topk,
    srp_ann_topk,
)
from msstreamingstack_spark.sources.tables import load_table


def test_minhash_lsh_finds_planted_near_dups(spark, sf_correctness):
    """LSH candidates must recover (nearly) all high-jaccard pairs the
    exact all-pairs scan finds — at jaccard ≥ 0.8, 8 bands × 2 rows
    gives pair-catch probability ≥ 1-(1-0.8^2)^8 ≈ 0.9997."""
    docs = load_table(spark, sf_correctness, "documents")
    exact = {
        (r["d1"], r["d2"]) for r in ngram_jaccard_pairs(docs, 0.8).collect()
    }
    lsh = {(r["d1"], r["d2"]) for r in minhash_lsh_pairs(docs, 0.8).collect()}
    assert exact, "test data should contain planted near-dups"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall:.3f} below bound"
    assert lsh <= exact, "verified LSH pairs must be a subset of exact pairs"


def test_jaccard_verify_array_form_matches_join_count(
    spark, sf_correctness
):
    """The array-intersect verify (r11 _jaccard_on_pairs) is exact iff
    (doc_id, h) is duplicate-free — pin BOTH: the fixture corpus holds
    the invariant at this SF, and the array form's (n_inter, n1, n2,
    jaccard) equals the old two-sided join count on the real LSH
    candidate set."""
    from msstreamingstack_spark.operators.dedup import (
        _band_buckets,
        _jaccard_on_pairs,
        doc_shingle_hashes,
        minhash_signatures,
    )

    docs = load_table(spark, sf_correctness, "documents")
    sh = doc_shingle_hashes(docs, persist=False)
    assert (
        sh.groupBy("doc_id", "h").count().filter(F.col("count") > 1).count()
        == 0
    ), "(doc_id, h) must be duplicate-free for array-intersect verify"
    buckets = _band_buckets(minhash_signatures(sh))
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    # the array form also emits zero-intersection candidates (the old
    # inner join on h dropped them); every caller filters
    # jaccard >= threshold > 0, so compare the reachable surface
    got = {
        (r["d1"], r["d2"]): (r["n_inter"], r["n1"], r["n2"], r["jaccard"])
        for r in _jaccard_on_pairs(sh, cand).collect()
        if r["n_inter"] > 0
    }
    # reference: the pre-r11 join-count form, inline
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("d1"), "h")
    b = sh.select(F.col("doc_id").alias("d2"), "h")
    ref_df = (
        cand.join(a, "d1")
        .join(b, ["d2", "h"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_inter"))
        .join(sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
        )
    )
    ref = {
        (r["d1"], r["d2"]): (r["n_inter"], r["n1"], r["n2"], r["jaccard"])
        for r in ref_df.collect()
    }
    assert ref, "candidate set should be non-empty at this SF"
    assert got == ref


def test_srp_ann_recall(spark, sf_correctness):
    emb = load_table(spark, sf_correctness, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    ann = srp_ann_topk(emb, queries, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ann_set = {(r["query_id"], r["neighbor_id"]) for r in ann}
    recall = len(exact_set & ann_set) / len(exact_set)
    # 8 tables × 4 planes measures ≈0.7 on the sf0.01 embeddings
    # (deterministic planes+data ⇒ stable); chance level is ≈1%
    assert recall >= 0.5, f"ANN recall {recall:.3f} below bound"
    assert all(r["rank"] <= 5 for r in ann)


def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, n=64)
    feats = extract_features(media).collect()
    assert len(feats) == 64
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
    # determinism
    again = extract_features(synthetic_media(spark, n=64)).collect()
    assert sorted((r["media_id"], tuple(r["feature"])) for r in feats) == sorted(
        (r["media_id"], tuple(r["feature"])) for r in again
    )


def test_multimodal_frame_sampling(spark):
    media = synthetic_media(spark, n=12)
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    assert rows, "video rows must yield sampled frames"
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    for ts_list in per_media.values():
        assert ts_list == sorted(ts_list)
        assert ts_list[0] == 0


def test_multimodal_stats(spark):
    st = {r["kind"]: r for r in media_stats(synthetic_media(spark, 64)).collect()}
    assert set(st) == {"image", "audio", "video"}
    assert st["image"]["max_width"] is not None


def test_decontamination_planted(spark):
    """A train doc identical to an eval doc → overlap_frac 1.0 and
    flagged; a disjoint-vocabulary doc → 0 overlap; a doc shorter than
    the shingle width → all-zero stats; eval docs never appear."""
    from msstreamingstack_spark.operators.dedup import eval_overlap_stats

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),  # eval
        (1, "alpha beta gamma delta epsilon zeta eta theta"),  # clone
        (2, "iota kappa llambda mu nu xi omicron pi rho"),     # disjoint
        (3, "too short"),                                      # < n tokens
        (4, "alpha beta gamma delta iota kappa llambda mu"),   # partial
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in eval_overlap_stats(
            docs, F.col("doc_id") == 0, frac_threshold=0.5
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}, "eval doc must be excluded"
    assert out[1]["overlap_frac"] == 1.0 and out[1]["contaminated"] == 1
    assert out[2]["n_overlap"] == 0 and out[2]["contaminated"] == 0
    assert out[3]["n_shingles"] == 0 and out[3]["overlap_frac"] == 0.0
    # doc 4: shingles are 3-grams; only 'alpha beta gamma' and
    # 'beta gamma delta' exist in the eval universe → 2 of 6
    assert out[4]["n_shingles"] == 6 and out[4]["n_overlap"] == 2
    assert out[4]["contaminated"] == 0


def test_quantize_int8_error_bound(spark, sf_correctness):
    """Min-max int8 reconstruction error is bounded by scale/2 =
    (mx-mn)/510 per element; MSE ≤ (scale/2)²."""
    from msstreamingstack_spark.operators.similarity import quantize_int8_stats
    from msstreamingstack_spark.sources.tables import load_table

    emb = load_table(spark, sf_correctness, "embeddings")
    for r in quantize_int8_stats(emb).collect():
        half_step = (r["mx"] - r["mn"]) / 510.0
        assert r["max_abs_err"] <= half_step + 1e-9
        assert r["mse"] <= half_step**2 + 1e-9


def test_token_budget_sample_tight(spark, sf_correctness):
    """Kept docs per source sum within budget, and the largest
    excluded doc would not have fit after the kept prefix."""
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import (
        TOKEN_BUDGET_PER_SOURCE,
    )

    rows = REGISTRY["token_budget_sample"].builder(
        spark, sf_correctness
    ).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for src, kept in per_src.items():
        assert max(r["cum_tokens"] for r in kept) <= TOKEN_BUDGET_PER_SOURCE
        ordered = sorted(kept, key=lambda r: (-r["n_tokens"], r["doc_id"]))
        assert [r["doc_id"] for r in kept] != [] and ordered[-1][
            "cum_tokens"
        ] == max(r["cum_tokens"] for r in kept)


def test_quantized_rescore_recall(spark, sf_correctness):
    """Quantized-scan ANN misses only through int8 quantization error,
    so recall vs brute force must be near-perfect, and every returned
    cos must equal the exact cos for that pair (re-rank is exact)."""
    from msstreamingstack_spark.operators.similarity import (
        quantized_rescore_topk,
    )

    emb = load_table(spark, sf_correctness, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    got = quantized_rescore_topk(emb, queries, k=5).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"quantized recall {recall:.3f}"
    assert all(len([r for r in got if r["query_id"] == q]) == 5
               for q in {r["query_id"] for r in got})


def test_quantized_scan_output_bounded_by_partitions(spark, sf_correctness):
    """The code-scan stage must emit a RUNNING per-partition top-M, so
    rows entering the global shortlist window are bounded by
    partitions × Q × M — never corpus × Q. This is the property that
    keeps the shortlist shuffle O(partitions) at 100 TB."""
    from msstreamingstack_spark.operators.similarity import (
        quantized_approx_candidates,
        quantized_rescore_topk,
    )

    emb = load_table(spark, sf_correctness, "embeddings")  # 500 vectors
    queries = emb.filter(F.col("vec_id") < 10)
    k, factor, n_q, parts = 5, 4, 10, 13

    corpus = emb.repartition(parts)
    approx = quantized_approx_candidates(corpus, queries, k=k,
                                         shortlist_factor=factor)
    n_rows = approx.count()
    bound = parts * n_q * k * factor
    corpus_scaled = 500 * n_q  # what the unbounded N×Q emission would be
    assert n_rows <= bound, f"scan emitted {n_rows} > bound {bound}"
    assert n_rows < corpus_scaled, (
        f"scan emitted {n_rows} rows — corpus-scaled, not partition-bounded"
    )

    # and the bound must not change the answer: result is invariant to
    # partitioning (rounded scores + id tiebreaks make the cut exact)
    base = sorted(tuple(r) for r in
                  quantized_rescore_topk(emb, queries, k=k,
                                         shortlist_factor=factor).collect())
    repart = sorted(tuple(r) for r in
                    quantized_rescore_topk(corpus, queries, k=k,
                                           shortlist_factor=factor).collect())
    assert base == repart, "quantized ANN result must be partitioning-invariant"


def test_embedding_lsh_neardup_recall(spark, sf_correctness):
    """SRP-bucketed near-dup pairs must be a subset of the exact
    all-pairs kernel (the verify stage is exact cosine) with recall
    above the 8-table x 4-plane collision bound for cos >= 0.45."""
    from msstreamingstack_spark.operators.similarity import (
        embedding_neardup_lsh_pairs,
        embedding_neardup_pairs,
    )

    emb = load_table(spark, sf_correctness, "embeddings")
    exact = {(r["d1"], r["d2"]) for r in embedding_neardup_pairs(emb, 0.45).collect()}
    lsh = {(r["d1"], r["d2"]) for r in embedding_neardup_lsh_pairs(emb, 0.45).collect()}
    assert exact, "test data should contain near-orthogonal dup pairs"
    assert lsh <= exact, "LSH-verified pairs must be a subset of exact pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.7, f"embedding LSH recall {recall:.3f}"


def test_incremental_dedup_equals_oneshot_and_replays(spark, sf_correctness, tmp_path):
    """Processing the corpus in two increments must keep exactly the
    docs a one-shot exact dedup keeps (earlier increments win), and
    replaying an increment must change nothing (idempotent store)."""
    from msstreamingstack_spark.operators.dedup import exact_dedup
    from msstreamingstack_spark.operators.incremental import (
        dedup_increment,
        store_digests,
    )

    docs = load_table(spark, sf_correctness, "documents")
    half1 = docs.filter(F.col("doc_id") < 250)
    half2 = docs.filter(F.col("doc_id") >= 250)
    store = str(tmp_path / "digest_store")

    fresh1 = {r["doc_id"] for r in dedup_increment(half1, store, "inc1").collect()}
    fresh2 = {r["doc_id"] for r in dedup_increment(half2, store, "inc2").collect()}
    assert fresh1 and fresh2
    assert not (fresh1 & fresh2)

    # one-shot truth: canonical keepers over the full corpus. doc_id
    # ordering makes "earlier increment wins" == "min doc_id wins".
    oneshot = {
        r["doc_id"]
        for r in exact_dedup(docs).filter(~F.col("is_dup")).collect()
    }
    assert fresh1 | fresh2 == oneshot

    # replay increment 2: store unchanged, nothing new admitted
    before = sorted(
        (r["content_md5"], r["increment"])
        for r in store_digests(spark, store).collect()
    )
    replay = {r["doc_id"] for r in dedup_increment(half2, store, "inc2").collect()}
    after = sorted(
        (r["content_md5"], r["increment"])
        for r in store_digests(spark, store).collect()
    )
    assert after == before
    assert replay == fresh2  # deterministic: same fresh set on replay


@pytest.mark.slow
def test_minhash_increment_catches_cross_increment_neardups(spark, tmp_path):
    """Near-dup counterpart of the digest store: a doc in increment 2
    that is a near-duplicate of an increment-1 doc must be matched via
    the persisted SIGNATURES (no shingles stored) and excluded from the
    fresh set; brand-new docs pass; replay is idempotent."""
    from msstreamingstack_spark.operators.incremental import minhash_increment

    base = " ".join(
        f"token{i} word{i * 7 % 41} item{i * 3 % 29}" for i in range(20)
    )  # 60 words → 58 shingles
    neardup = base + " trailing addendum"  # superset: jaccard ≈ 58/60
    fresh_text = ("completely different content about spacecraft engines "
                  "and orbital mechanics with no shared phrases at all here")

    def docs(rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    store = str(tmp_path / "sig_store")
    f1, m1 = minhash_increment(docs([(1, base)]), store, "inc1")
    assert {r["doc_id"] for r in f1.collect()} == {1}
    assert m1.count() == 0

    f2, m2 = minhash_increment(
        docs([(10, neardup), (11, fresh_text)]), store, "inc2"
    )
    assert {r["doc_id"] for r in f2.collect()} == {11}
    got = {(r["new_id"], r["old_id"]) for r in m2.collect()}
    assert got == {(10, 1)}
    assert all(r["est_jaccard"] >= 0.8 for r in m2.collect())

    # replay increment 2: identical outcome, store unchanged
    f2r, m2r = minhash_increment(
        docs([(10, neardup), (11, fresh_text)]), store, "inc2"
    )
    assert {r["doc_id"] for r in f2r.collect()} == {11}
    assert {(r["new_id"], r["old_id"]) for r in m2r.collect()} == {(10, 1)}


@pytest.mark.slow
def test_minhash_increment_nondefault_columns(spark, tmp_path):
    """text_col/id_col must thread through the WHOLE increment,
    including the in-increment LSH stage (ADVICE round-2: it hardcoded
    'text', so a non-default text_col errored — or silently deduped
    the wrong column if a 'text' column coexisted) and the empty-store
    matches schema (hardcoded long ids vs the input's actual type)."""
    from msstreamingstack_spark.operators.incremental import minhash_increment

    base = " ".join(
        f"token{i} word{i * 7 % 41} item{i * 3 % 29}" for i in range(20)
    )
    neardup = base + " trailing addendum"
    decoy = "decoy decoy decoy"  # a coexisting 'text' column to ignore

    docs1 = spark.createDataFrame(
        [(1, base, decoy)], ["uid", "body", "text"]
    )
    store = str(tmp_path / "sig_store_alt")
    f1, m1 = minhash_increment(
        docs1, store, "inc1", text_col="body", id_col="uid"
    )
    assert {r["doc_id"] for r in f1.collect()} == {1}
    # empty-store matches schema derives id type from the input
    assert dict(m1.dtypes)["new_id"] == "bigint"
    assert m1.count() == 0

    # in-increment near-dup on body (the decoy 'text' columns are
    # identical everywhere — deduping on them would drop everything)
    docs2 = spark.createDataFrame(
        [(10, neardup, decoy), (11, "totally unrelated spacecraft "
          "engine content with no shared phrases at all here", decoy)],
        ["uid", "body", "text"],
    )
    f2, m2 = minhash_increment(
        docs2, store, "inc2", text_col="body", id_col="uid"
    )
    assert {r["doc_id"] for r in f2.collect()} == {11}
    assert {(r["new_id"], r["old_id"]) for r in m2.collect()} == {(10, 1)}


@pytest.mark.slow
def test_minhash_increment_releases_caches(spark, tmp_path):
    """Continuous-ingest leak regression (ADVICE round-4): every
    minhash_increment call persisted a shingle table it never released
    and left two localCheckpoint RDDs to driver GC — one cached set per
    micro-batch in long-running mode. Pin that (a) the shingle cache is
    released inside the call, so the only blocks left behind are the
    checkpoint snapshots of the RETURNED frames, and (b)
    release_checkpoint frees those deterministically."""
    from msstreamingstack_spark.operators.incremental import (
        minhash_increment,
        release_checkpoint,
    )

    def persistent_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        it = m.keySet().iterator()
        s = set()
        while it.hasNext():
            s.add(it.next())
        return s

    def docs(rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    store = str(tmp_path / "sig_store_leak")
    base = persistent_ids()  # prior tests' leftovers may GC mid-test —
    handles = []             # compare by id SET, not global count
    for i in range(3):  # 3 "micro-batches", store non-empty from #2 on
        text = " ".join(f"w{i}x{j} y{j * 7 % 31} z{j % 13}" for j in range(20))
        f, m = minhash_increment(docs([(i, text)]), store, f"inc{i}")
        f.collect(), m.collect()
        handles.extend((f, m))
    # exactly the returned frames' checkpoint blocks remain — the
    # per-call shingle persist must NOT survive the call
    assert len(persistent_ids() - base) == len(handles)
    release_checkpoint(*handles)
    assert not (persistent_ids() - base)


@pytest.mark.slow
def test_embedding_increment_semantic_dedup(spark, tmp_path):
    """Semantic dedup across increments: a near-identical embedding in
    increment 2 must match increment 1's stored int8+SRP representation
    (cosine confirmed on the reconstructed vector); an orthogonal
    vector passes; replay is idempotent."""
    import math

    from msstreamingstack_spark.operators.incremental import (
        embedding_increment,
    )

    dim = 64

    def vec(seed, flip=0.0):
        # frequency-distinct sinusoids: pairwise |cos| < 0.03 across
        # seeds, so only the flipped copy is a near-dup
        v = [math.sin(seed * 0.7 * (i + 1)) for i in range(dim)]
        v[0] += flip
        return [float(x) for x in v]

    def embs(rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    store = str(tmp_path / "emb_store")
    f1, m1 = embedding_increment(embs([(1, vec(1)), (2, vec(2))]), store, "inc1")
    assert {r["vec_id"] for r in f1.collect()} == {1, 2}
    assert m1.count() == 0

    near = vec(1, flip=0.01)  # cos vs vec(1) ≈ 0.9999
    ortho = vec(9)
    f2, m2 = embedding_increment(embs([(10, near), (11, ortho)]), store, "inc2")
    assert {r["vec_id"] for r in f2.collect()} == {11}
    pairs = {(r["new_id"], r["old_id"]) for r in m2.collect()}
    assert pairs == {(10, 1)}
    assert all(r["approx_cos"] >= 0.9 for r in m2.collect())

    f2r, m2r = embedding_increment(embs([(10, near), (11, ortho)]), store, "inc2")
    assert {r["vec_id"] for r in f2r.collect()} == {11}
    assert {(r["new_id"], r["old_id"]) for r in m2r.collect()} == {(10, 1)}


def test_bigram_lm_ranks_gibberish_above_echoed_text(spark):
    """SEMANTIC pin for the leave-one-out Laplace estimator: a naive
    self-trained bigram LM (P = c12/c1) rates a doc of globally-unique
    bigrams as perfectly predictable (its own counts are the only
    support ⇒ 0 bits — gibberish would be the BEST-scoring doc). With
    LOO + Laplace, corpus-supported text must score strictly fewer
    bits than the unsupported-gibberish doc."""
    import msstreamingstack_spark.queries  # noqa: F401 — full registry first
    from msstreamingstack_spark.queries_extensions import bigram_lm_scores

    fluent = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, fluent) for i in range(6)]  # echoed across the corpus
    rows.append((100, "zq1 xv7 kkj9 wpm2 bbr4 ncx8 qql3 vvt6 hzd5 jfy0"))
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["bits_per_bigram"] for r in bigram_lm_scores(d).collect()}
    assert got[100] > got[0], got
    # the gibberish doc has zero external support: every bigram costs
    # about log2(V) bits
    import math

    v = len(set(" ".join([fluent] * 1 + [rows[-1][1]]).split()))  # loose bound
    assert got[100] > 0.5 * math.log2(max(v, 2))
    # echoed text is cheap: well under half the gibberish cost
    assert got[0] < got[100] / 2


def test_bigram_lm_skew_robust_twin_is_bit_identical(spark, sf_correctness):
    """The skew_robust corpus-scale plan (partial-agg + compact-window
    + join) and the default window plan produce bit-identical rows —
    both sum the same exact integer counts, so the only thing the flag
    may change is the physical shape (pinned in test_plans)."""
    import msstreamingstack_spark.queries  # noqa: F401 — full registry first
    from msstreamingstack_spark.queries_extensions import bigram_lm_scores

    d = load_table(spark, sf_correctness, "documents")
    a = sorted(map(tuple, bigram_lm_scores(d).collect()))
    b = sorted(map(tuple, bigram_lm_scores(d, skew_robust=True).collect()))
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_per_source_window_skew_robust_twins_bit_identical(
    spark, sf_correctness
):
    """The five per-source corpus operators (greedy packing ×2, token
    budget ×2, calibrated quality gate) window over partitionBy(source)
    — source cardinality is fixed while rows grow, so each has a
    skew_robust twin that decomposes the prefix sum / rank over
    (source, bucket) via operators/windows.py. The decomposition is
    exact (long partials; integer rank arithmetic), so each twin must
    be BIT-identical to its default plan."""
    import msstreamingstack_spark.queries  # noqa: F401 — full registry first
    from msstreamingstack_spark.queries_extensions import (
        q_pack_blocks_fixed,
        q_pack_sequences,
        q_quality_source_calibrated,
        q_token_budget_quality_sample,
        q_token_budget_sample,
    )

    for fn in (
        q_pack_sequences,
        q_pack_blocks_fixed,
        q_token_budget_sample,
        q_token_budget_quality_sample,
        q_quality_source_calibrated,
    ):
        a = fn(spark, sf_correctness)
        b = fn(spark, sf_correctness, skew_robust=True)
        assert a.columns == b.columns, fn.__name__
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb and len(ra) > 0, (
            f"{fn.__name__}: twin diverged "
            f"({len(ra)} vs {len(rb)} rows)"
        )


def test_exact_dedup_skew_robust_twin_bit_identical(spark, sf_correctness):
    """exact_dedup's groupBy+join twin (hot-digest-safe: a viral page's
    content group collapses map-side instead of buffering in one
    window task) must flag the identical rows."""
    docs = load_table(spark, sf_correctness, "documents")
    a = sorted(map(tuple, exact_dedup(docs).collect()))
    b = sorted(map(tuple, exact_dedup(docs, skew_robust=True).collect()))
    assert a == b and len(a) > 0


def test_topk_salted_twins_bit_identical(spark, sf_correctness):
    """The four top-K-per-hot-key operators (segment top-3, posting
    samples per term, reservoir per lang, top ngrams per lang) rank
    with a window partitioned by a key whose slice grows with the
    data; each has a skew_robust twin through
    operators/windows.py::topk_per_key_salted (salted pre-rank →
    ≤p×k survivors → exact re-rank). Under the queries' total orders
    the twin must be BIT-identical."""
    import msstreamingstack_spark.queries  # noqa: F401 — full registry first
    from msstreamingstack_spark.queries_analytics import (
        q_inverted_index_sampled,
    )
    from msstreamingstack_spark.queries_extensions import (
        q_sample_reservoir,
        q_top_ngrams_per_lang,
    )
    from msstreamingstack_spark.queries_relational import q_topk_per_segment

    for fn in (
        q_topk_per_segment,
        q_inverted_index_sampled,
        q_sample_reservoir,
        q_top_ngrams_per_lang,
    ):
        a = fn(spark, sf_correctness)
        b = fn(spark, sf_correctness, skew_robust=True)
        assert a.columns == b.columns, fn.__name__
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb and len(ra) > 0, (
            f"{fn.__name__}: twin diverged "
            f"({len(ra)} vs {len(rb)} rows)"
        )


def test_bigram_lm_increment_gates_junk_and_replays(spark, tmp_path):
    """LM-gated ingest increment: an empty store accepts everything
    (the first drop defines the corpus); afterwards a doc echoing the
    accepted corpus scores low and passes while unsupported gibberish
    pays ~log2(V) bits and is rejected; too-short docs pass with a
    null score (the token-floor gate owns them); replaying an
    increment under the same label recomputes identically; the
    returned frames' checkpoint blocks release cleanly."""
    from msstreamingstack_spark.operators.incremental import (
        bigram_lm_increment,
        release_checkpoint,
    )

    store = str(tmp_path / "lm_store")
    fluent = "the quick brown fox jumps over the lazy dog near the river bank"
    b1 = spark.createDataFrame(
        [(i, fluent) for i in range(5)], ["doc_id", "text"]
    )
    a1, s1 = bigram_lm_increment(b1, store, "inc1")
    assert a1.count() == 5  # cold start: no LM to judge against
    assert all(r["bits_per_bigram"] is None for r in s1.collect())

    b2 = spark.createDataFrame(
        [
            (10, fluent),  # echoes the accepted corpus
            (11, "zq1 xv7 kkj9 wpm2 bbr4 ncx8 qql3 vvt6 hzd5 jfy0"),
            (12, "hi"),    # too short to score
        ],
        ["doc_id", "text"],
    )
    a2, s2 = bigram_lm_increment(b2, store, "inc2", max_bits=3.0)
    scores = {r["doc_id"]: r["bits_per_bigram"] for r in s2.collect()}
    assert scores[10] is not None and scores[10] <= 3.0
    assert scores[11] is not None and scores[11] > 3.0
    assert scores[12] is None
    assert sorted(r["doc_id"] for r in a2.collect()) == [10, 12]

    # replay: same label -> own counts excluded -> identical verdicts
    a2r, s2r = bigram_lm_increment(b2, store, "inc2", max_bits=3.0)
    assert sorted(r["doc_id"] for r in a2r.collect()) == [10, 12]
    assert {r["doc_id"]: r["bits_per_bigram"] for r in s2r.collect()} == scores

    release_checkpoint(a1, s1, a2, s2, a2r, s2r)


def test_bigram_lm_increment_replay_of_first_increment(spark, tmp_path):
    """An at-least-once restart that replays the VERY FIRST increment
    finds the store non-empty but holding only its own label's prior
    output — the label-excluded LM is empty (V=0, c1 null), which under
    Spark 4 ANSI made the Laplace denominator a DIVIDE_BY_ZERO and
    crash-looped the ingest. The replay must re-take the cold-start
    accept-all branch and recompute identically."""
    from msstreamingstack_spark.operators.incremental import (
        bigram_lm_increment,
        release_checkpoint,
    )

    store = str(tmp_path / "lm_store_first_replay")
    fluent = "the quick brown fox jumps over the lazy dog near the river"
    b1 = spark.createDataFrame(
        [(i, fluent) for i in range(4)], ["doc_id", "text"]
    )
    a1, s1 = bigram_lm_increment(b1, store, "inc1")
    assert a1.count() == 4

    # replay of inc1: store has ONLY increment=inc1 — must not divide
    # by the empty excluded-LM's zero vocabulary
    a1r, s1r = bigram_lm_increment(b1, store, "inc1")
    assert sorted(r["doc_id"] for r in a1r.collect()) == [0, 1, 2, 3]
    assert all(r["bits_per_bigram"] is None for r in s1r.collect())

    # and the store still holds exactly one copy of inc1's counts:
    # a later increment scores against the same LM either way
    a2, s2 = bigram_lm_increment(
        spark.createDataFrame(
            [(10, fluent), (11, "zq1 xv7 kkj9 wpm2 bbr4 ncx8 qql3 vvt6")],
            ["doc_id", "text"],
        ),
        store,
        "inc2",
        max_bits=3.0,
    )
    assert sorted(r["doc_id"] for r in a2.collect()) == [10]
    release_checkpoint(a1, s1, a1r, s1r, a2, s2)


def test_bigram_lm_increment_nondefault_columns(spark, tmp_path):
    """text_col/id_col must thread through scoring, acceptance and the
    store registration (the minhash increment regression, round 2)."""
    from msstreamingstack_spark.operators.incremental import (
        bigram_lm_increment,
    )

    store = str(tmp_path / "lm_store_alt")
    fluent = "the quick brown fox jumps over the lazy dog near the bank"
    decoy = "decoy decoy decoy"
    d1 = spark.createDataFrame(
        [(i, fluent, decoy) for i in range(4)], ["uid", "body", "text"]
    )
    a1, s1 = bigram_lm_increment(
        d1, store, "inc1", text_col="body", id_col="uid"
    )
    assert a1.count() == 4

    d2 = spark.createDataFrame(
        [
            (10, fluent, decoy),
            (11, "zz1 yy2 xx3 ww4 vv5 uu6 tt7 ss8 rr9 qq0", decoy),
        ],
        ["uid", "body", "text"],
    )
    a2, s2 = bigram_lm_increment(
        d2, store, "inc2", max_bits=3.0, text_col="body", id_col="uid"
    )
    assert sorted(r["doc_id"] for r in a2.collect()) == [10]
    scores = {r["doc_id"]: r["bits_per_bigram"] for r in s2.collect()}
    assert scores[10] <= 3.0 < scores[11]


def test_rotating_persist_bounds_registry_query_caches(spark):
    """Round-5 ADVICE leak regression: registry query functions persist
    reused subtrees but return the frame BEFORE any action, so they can
    never unpersist — each invocation used to stack a session-lifetime
    cache entry (bigram_lm_scores.dbc, chartrigram tri_c, shingle
    tables). rotating_persist must bound that to ONE live entry per
    slot: re-invoking the same query replaces its cache instead of
    accumulating, and different slots never evict each other."""
    from msstreamingstack_spark.caching import live_slots, rotating_persist
    from msstreamingstack_spark.queries_extensions import bigram_lm_scores

    def persistent_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        it = m.keySet().iterator()
        s = set()
        while it.hasNext():
            s.add(it.next())
        return s

    base = persistent_ids()
    d = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} epsilon zeta") for i in range(6)],
        ["doc_id", "text"],
    )
    for _ in range(4):  # 4 invocations — the old code left 4 caches
        bigram_lm_scores(d).collect()
    grown = persistent_ids() - base
    assert len(grown) <= 1, grown  # one rotated slot, not one per call
    assert "bigram_lm_scores.dbc" in live_slots(spark)

    # distinct slots coexist (no cross-eviction): persist a second slot
    # and confirm the first slot's entry survives
    other = rotating_persist(d.select("doc_id"), "test.other_slot")
    other.collect()
    assert "bigram_lm_scores.dbc" in live_slots(spark)
    after_other = persistent_ids() - base
    assert len(after_other) <= 2, after_other
    # rotation of the second slot releases only its own predecessor
    other2 = rotating_persist(d.select("doc_id", "text"), "test.other_slot")
    other2.collect()
    assert len(persistent_ids() - base) <= 2
    # cleanup: rotate tiny frames through both slots, then unpersist
    for slot, df in list(live_slots(spark).items()):
        df.unpersist(blocking=False)


@pytest.mark.slow
def test_compact_store_preserves_increment_semantics(spark, tmp_path):
    """Compaction folds N increment partitions into one __base
    partition WITHOUT changing what later increments compute: the
    compacted store must drive bit-identical accept/reject decisions
    vs an uncompacted twin, shrink the partition-dir count to 1, and
    (for the LM store) re-aggregate count rows. Repeated compaction
    must mint fresh __base_<n> labels."""
    import os

    from msstreamingstack_spark.operators.incremental import (
        bigram_lm_increment,
        compact_store,
        dedup_increment,
        minhash_increment,
        release_checkpoint,
    )

    fluent = "the quick brown fox jumps over the lazy dog by the river"
    junk = "zq1 xv7 kkj9 wpm2 bbr4 ncx8 qql3 vvt6 hzd5 jfy0"

    def doc_text(i):
        # per-doc disjoint vocabulary so the in-increment near-dup
        # gate keeps every doc (the LM-side batches reuse `fluent`)
        return " ".join(f"v{i}w{k}" for k in range(12))

    def batches(texts=None):
        return [
            spark.createDataFrame(
                [
                    (b * 10 + j,
                     texts(b * 10 + j) if texts else f"{fluent} tail{b * 10 + j}")
                    for j in range(3)
                ],
                ["doc_id", "text"],
            )
            for b in range(3)
        ]

    def dirs(store):
        return sorted(
            e for e in os.listdir(store) if e.startswith("increment=")
        )

    handles = []
    # --- LM store: counts aggregate + verdict equality --------------
    lm_a, lm_b = str(tmp_path / "lm_a"), str(tmp_path / "lm_b")
    for store in (lm_a, lm_b):
        for i, b in enumerate(batches()):
            a, s = bigram_lm_increment(b, store, f"inc{i}")
            a.count()
            handles.extend((a, s))
    rows_before = spark.read.parquet(lm_a).count()
    compact_store(spark, lm_a, agg="counts")
    assert dirs(lm_a) == ["increment=__base_0"]
    assert spark.read.parquet(lm_a).count() < rows_before  # re-aggregated
    probe = spark.createDataFrame(
        [(100, fluent), (101, junk)], ["doc_id", "text"]
    )
    va, sa = bigram_lm_increment(probe, lm_a, "probe", max_bits=3.0)
    vb, sb = bigram_lm_increment(probe, lm_b, "probe", max_bits=3.0)
    score = lambda s: sorted(
        (r["doc_id"], r["bits_per_bigram"]) for r in s.collect()
    )
    assert score(sa) == score(sb)  # identical LM despite compaction
    assert sorted(r["doc_id"] for r in va.collect()) == [100]
    handles.extend((va, sa, vb, sb))

    # --- digest store: dedup agg + foreign-label semantics ----------
    dg_a, dg_b = str(tmp_path / "dg_a"), str(tmp_path / "dg_b")
    for store in (dg_a, dg_b):
        for i, b in enumerate(batches()):
            f = dedup_increment(b, store, f"inc{i}")
            f.count()
            handles.append(f)
    compact_store(spark, dg_a, agg="dedup")
    assert dirs(dg_a) == ["increment=__base_0"]
    recrawl = spark.createDataFrame(
        [(200, f"{fluent} tail0"), (201, "completely fresh words here")],
        ["doc_id", "text"],
    )
    fa = dedup_increment(recrawl, dg_a, "probe")
    fb = dedup_increment(recrawl, dg_b, "probe")
    assert (
        sorted(r["doc_id"] for r in fa.collect())
        == sorted(r["doc_id"] for r in fb.collect())
        == [201]  # the re-crawl of tail0 is caught either way
    )
    handles.extend((fa, fb))

    # --- signature store + repeated compaction labels ---------------
    sg = str(tmp_path / "sg")
    for i, b in enumerate(batches(texts=doc_text)):
        f, m = minhash_increment(b, sg, f"inc{i}")
        assert f.count() == 3  # disjoint vocab: nothing deduped
        handles.extend((f, m))
    compact_store(spark, sg)
    f2, m2 = minhash_increment(
        spark.createDataFrame(
            [(300, doc_text(11) + " extra")], ["doc_id", "text"]
        ),
        sg,
        "probe",
    )
    assert {r["old_id"] for r in m2.collect()} == {11}  # edited re-crawl
    handles.extend((f2, m2))
    compact_store(spark, sg)
    assert dirs(sg) == ["increment=__base_1"]  # fresh label each time
    release_checkpoint(*handles)


def test_substring_dup_spans_alignment_and_coverage(spark):
    """The sliding-window substring detector must (a) catch a copied
    span at ANY alignment — including one placed to straddle a
    32-token chunk boundary, where chunk_dup_fraction sees nothing —
    and (b) report interval-union token coverage, not window counts
    (overlapping dup windows must not double-count positions)."""
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import SUBSTR_DUP_W

    copied = " ".join(f"c{i}" for i in range(20))  # 20-token span
    docs = [
        # doc 0: the span sits at tokens 22..41 — straddles the 32-token
        # chunk boundary, so neither fixed chunk equals any chunk of doc 1
        (0, " ".join(f"a{i}" for i in range(22)) + " " + copied + " "
            + " ".join(f"b{i}" for i in range(22))),
        # doc 1: same span at offset 0 plus distinct tail
        (1, copied + " " + " ".join(f"z{i}" for i in range(44))),
        # doc 2: fully unique, longer than W
        (2, " ".join(f"q{i}" for i in range(40))),
        # doc 3: shorter than W -> zero row
        (3, "tiny doc under window"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    df.createOrReplaceTempView("documents")

    import duckdb
    import tempfile, os
    tmp = tempfile.mkdtemp()
    df.toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in REGISTRY["substring_dup_spans"].builder(spark, tmp).collect()
    }
    # (a) both carriers flagged; W=16 windows inside a 20-token copy:
    # 20-16+1 = 5 fully-contained windows each
    assert out[0]["n_dup_windows"] == 5 and out[1]["n_dup_windows"] == 5
    # (b) interval union: 5 overlapping windows cover exactly the
    # 20 copied positions, not 5*16
    assert out[0]["dup_token_cov"] == 20 == out[1]["dup_token_cov"]
    assert out[2]["n_dup_windows"] == 0 and out[2]["dup_token_cov"] == 0
    assert out[3]["n_windows"] == 0 and out[3]["dup_token_fraction"] == 0.0
    assert abs(out[0]["dup_token_fraction"] - 20 / 64) < 1e-12

    # the chunk detector misses this alignment entirely
    chunk = {
        r["doc_id"]: r["n_shared_chunks"]
        for r in REGISTRY["chunk_dup_fraction"].builder(spark, tmp).collect()
    }
    assert chunk[0] == 0 and chunk[1] == 0


def test_dedup_chunk_rewrite_matches_python_model(spark):
    """Hand fixture + independent Python model of the CCNet rewrite:
    keep each chunk's first corpus-wide (doc_id, chunk_idx) occurrence,
    reassemble survivors in order."""
    import math
    import os
    import tempfile

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import CHUNK_DUP_TOKENS

    k = CHUNK_DUP_TOKENS
    a_toks = [f"a{i}" for i in range(2 * k)]
    docs = [
        (0, " ".join(a_toks)),                      # 2 chunks, both first
        # chunk 0 == doc 0's chunk 1 (aligned copy) -> dropped;
        # chunk 1 unique -> kept
        (1, " ".join(a_toks[k:]) + " " + " ".join(f"u{i}" for i in range(k))),
        (2, " ".join(a_toks)),                      # full duplicate of doc 0
        (3, "tiny unique doc"),                     # single short chunk
    ]

    def model(rows):
        chunks = []
        for doc_id, text in rows:
            toks = text.split(" ")
            for i in range(math.ceil(len(toks) / k)):
                chunks.append((doc_id, i, " ".join(toks[i * k:(i + 1) * k])))
        first = {}
        for doc_id, i, ct in sorted(chunks):
            first.setdefault(ct, (doc_id, i))
        out = {}
        for doc_id, text in rows:
            toks = text.split(" ")
            n = math.ceil(len(toks) / k)
            kept = [
                " ".join(toks[i * k:(i + 1) * k])
                for i in range(n)
                if first[" ".join(toks[i * k:(i + 1) * k])] == (doc_id, i)
            ]
            out[doc_id] = (n, len(kept), " ".join(kept))
        return out

    tmp = tempfile.mkdtemp()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    df.toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
        for r in REGISTRY["dedup_chunk_rewrite"].builder(spark, tmp).collect()
    }
    assert got == model(docs)
    # headline facts the fixture encodes
    assert got[2] == (2, 0, "")          # full dup rewritten to empty
    assert got[1][1] == 1                # boilerplate chunk stripped


def test_dedup_chunk_rewrite_keeps_each_distinct_chunk_once(spark, sf_smoke):
    """Global invariant on real data: sum(n_kept) == number of DISTINCT
    chunk contents in the corpus (keep-first keeps each exactly once)."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import CHUNK_DUP_TOKENS

    out = REGISTRY["dedup_chunk_rewrite"].builder(spark, sf_smoke)
    kept_total = out.agg(F.sum("n_kept")).collect()[0][0]

    k = CHUNK_DUP_TOKENS
    d = load_table(spark, sf_smoke, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    distinct_chunks = (
        t.select(
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.ceil(F.size("t") / F.lit(float(k))) - 1).cast("long"),
                ).alias("i")
            ).alias("chunk_idx"),
            "t",
        )
        .select(
            F.concat_ws(
                " ",
                F.slice(F.col("t"), (F.col("chunk_idx") * k + 1).cast("int"), k),
            ).alias("ct")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_chunks


def test_dsir_weights_prefer_target_language(spark, sf_smoke):
    """DSIR sanity: documents IN the target slice (lang='en') must score
    a higher mean per-token log-importance than documents outside it —
    the weights are only useful if they discriminate toward the target."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.queries import REGISTRY

    w = REGISTRY["dsir_importance_weights"].builder(spark, sf_smoke)
    langs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang")
    per_tok = (F.col("dsir_logratio") / F.col("n_tokens")).alias("pt")
    rows = (
        w.join(langs, "doc_id")
        .select((F.col("lang") == "en").alias("is_en"), per_tok)
        .groupBy("is_en")
        .agg(F.avg("pt").alias("mean_pt"))
        .collect()
    )
    means = {r["is_en"]: r["mean_pt"] for r in rows}
    assert means[True] > means[False]


def test_dedup_events_debounce_gap_semantics(spark):
    """Hand fixture for the debounce rule: a sub-gap burst collapses to
    its first event even when the burst's total span exceeds the gap
    (chain semantics), a boundary-exact gap still collapses (> not >=),
    and distinct keys never interact."""
    import os
    import tempfile

    import pandas as pd

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import DEBOUNCE_GAP_SEC

    g = DEBOUNCE_GAP_SEC
    rows = [
        # u1/click: chain 0, g, 2g (each step == gap, > is false -> one
        # group spanning 2g), then 3g+1 after the last -> new group
        (1, 10, "click", 0),
        (2, 10, "click", g),
        (3, 10, "click", 2 * g),
        (4, 10, "click", 3 * g + 1),
        # u1/view: same timestamps, independent key
        (5, 10, "view", 0),
        (6, 10, "view", 1),
        # u2/click: single event
        (7, 20, "click", 5),
    ]
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
            # micros, not pandas' default nanos — Spark 4 rejects
            # TIMESTAMP(NANOS) parquet columns outright
            "ts": pd.to_datetime([r[3] for r in rows], unit="s").astype(
                "datetime64[us]"
            ),
        }
    ).to_parquet(os.path.join(tmp, "events.parquet"))

    got = {
        r["event_id"]: r["n_collapsed"]
        for r in REGISTRY["dedup_events_debounce"].builder(spark, tmp).collect()
    }
    assert got == {1: 3, 4: 1, 5: 2, 7: 1}


def test_mine_hard_negatives_matches_numpy_model(spark, sf_smoke):
    """Independent numpy model of the mining rule: per query, top-5
    cross-label cosine, ties on id — and every returned negative must
    out-rank (or tie) any same-label vector's eligibility by
    construction (labels differ from the query's)."""
    import os

    import numpy as np
    import pandas as pd

    from msstreamingstack_spark.operators.similarity import COS_ROUND
    from msstreamingstack_spark.queries import REGISTRY

    base = pd.read_parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    X = np.stack(
        [np.asarray(v, dtype="float64") for v in base["embedding"]]
    )
    labels = base["label"].to_numpy()
    ids = base["vec_id"].to_numpy()
    norms = np.linalg.norm(X, axis=1)

    want = {}
    for qi in range(len(ids)):
        if ids[qi] >= 10:
            continue
        cands = []
        for ci in range(len(ids)):
            if labels[ci] == labels[qi]:
                continue
            cos = round(float(X[qi] @ X[ci]) / float(norms[qi] * norms[ci]),
                        COS_ROUND)
            cands.append((-cos, ids[ci]))
        cands.sort()
        want[ids[qi]] = [
            (int(i), -c) for c, i in cands[:5]
        ]

    got = {}
    for r in REGISTRY["mine_hard_negatives"].builder(spark, sf_smoke).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["negative_id"], r["cos"], r["query_label"])
        )
    assert set(got) == set(want)
    for qid, rows in got.items():
        rows.sort()
        assert [(n, c) for _, n, c, _ in rows] == want[qid], qid
        # negatives all differ from the query's label
        qlabel = rows[0][3]
        assert all(
            labels[list(ids).index(n)] != qlabel for _, n, _, _ in rows
        )


def test_mine_hard_negatives_ann_recall_and_label_filter(
    spark, sf_correctness
):
    """The ANN miner (pinned-IVF probe candidates, label filter pushed
    into the candidate join) vs the exact kernel at the fit SF: the
    declared recall contract. Measured 0.86 at sf0.01 (nprobe=4);
    bound at 0.70 with margin. Every negative must carry a label
    different from its query's, and ranks must be 1..5 contiguous per
    query (the filter ran BEFORE ranking, not after)."""
    from msstreamingstack_spark.queries import REGISTRY

    exact = {
        (r["query_id"], r["negative_id"])
        for r in REGISTRY["mine_hard_negatives"]
        .builder(spark, sf_correctness)
        .collect()
    }
    rows = (
        REGISTRY["mine_hard_negatives_ann"]
        .builder(spark, sf_correctness)
        .collect()
    )
    ann = {(r["query_id"], r["negative_id"]) for r in rows}
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.70, recall
    per_q: dict = {}
    for r in rows:
        assert r["query_label"] is not None
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), qid


def test_bm25_rare_term_dominates_and_order_is_monotone(spark, sf_correctness):
    """idf separates the rare query term ('dup', df~26/500) from the
    near-ubiquitous ones: every top-20 hit must contain it, scores
    must be non-increasing, and term-match counts must stay in
    [1, |terms|]."""
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import BM25_TERMS

    rows = REGISTRY["retrieval_bm25_topk"].builder(spark, sf_correctness).collect()
    assert len(rows) == 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_terms_matched"] <= len(BM25_TERMS) for r in rows)

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_correctness}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert all("dup" in docs[r["doc_id"]].split(" ") for r in rows)


def test_bm25_matches_python_model(spark, sf_correctness):
    """Full independent BM25 model in pure Python over the same corpus
    — same tokenization, same k1/b, same rounding discipline."""
    import math

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import BM25_B, BM25_K1, BM25_TERMS

    docs = (
        spark.read.parquet(f"{sf_correctness}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    tf: dict[tuple[int, str], int] = {}
    dl: dict[int, int] = {}
    for r in docs:
        toks = [w for w in r["text"].split(" ") if w]
        dl[r["doc_id"]] = len(toks)
        for w in toks:
            if w in BM25_TERMS:
                tf[(r["doc_id"], w)] = tf.get((r["doc_id"], w), 0) + 1
    n_docs = len(dl)
    avgdl = float(sum(dl.values())) / n_docs
    df = {t: sum(1 for (_, w) in tf if w == t) for t in BM25_TERMS}
    scores: dict[int, float] = {}
    for (d, w), f in tf.items():
        idf = math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
        s = idf * (f * (BM25_K1 + 1.0)) / (
            f + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl[d] / avgdl)
        )
        scores[d] = scores.get(d, 0.0) + round(s, 9)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [
        (r["doc_id"], r["bm25"])
        for r in REGISTRY["retrieval_bm25_topk"].builder(spark, sf_correctness).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, g), (_, e) in zip(got, expect):
        assert abs(g - e) <= 1e-9


def test_entity_match_matches_python_levenshtein_model(spark, sf_correctness):
    """Independent model: distinct part names, block on last token,
    all pairs with edit distance <= 3 via a from-scratch DP
    levenshtein."""
    from msstreamingstack_spark.queries import REGISTRY

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = sorted(
        {
            r["p_name"]
            for r in spark.read.parquet(f"{sf_correctness}/part.parquet")
            .select("p_name")
            .collect()
        }
    )
    expect = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if a.rsplit(" ", 1)[-1] == b.rsplit(" ", 1)[-1] and lev(a, b) <= 3:
                expect.add((a, b))

    rows = REGISTRY["entity_match_blocked"].builder(spark, sf_correctness).collect()
    got = {(r["name_a"], r["name_b"]) for r in rows}
    assert got == expect
    assert all(r["dist"] <= 3 and r["name_a"] < r["name_b"] for r in rows)


def test_decontaminate_minhash_directed_and_verified(spark):
    """On a constructed corpus: a train doc paraphrasing an eval doc
    is flagged (train_id, eval_id); an equally-similar EVAL-EVAL pair
    is NOT (duplication inside the benchmark is not contamination);
    an unrelated train doc never appears; every output pair has
    jaccard >= the threshold and the correct split sides."""
    from msstreamingstack_spark.operators.dedup import minhash_cross_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38)) + " novelA novelB"
    other = " ".join(f"zzz{i}" for i in range(40))
    rows = [
        (7, base, "en", "s", 1),     # eval (7 % 10 == 7)
        (17, near, "en", "s", 1),    # eval too — eval-eval near-dup
        (21, near, "en", "s", 1),    # train paraphrase of doc 7
        (30, other, "en", "s", 1),   # unrelated train doc
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = minhash_cross_pairs(docs, F.col("doc_id") % 10 == 7, 0.5).collect()
    pairs = {(r["train_id"], r["eval_id"]) for r in got}
    assert (21, 7) in pairs and (21, 17) in pairs
    assert all(t % 10 != 7 and e % 10 == 7 for t, e in pairs)
    assert 30 not in {t for t, _ in pairs}
    assert all(r["jaccard"] >= 0.5 for r in got)


def test_pack_blocks_fixed_invariants(spark, sf_correctness):
    """Conservation + exact-slicing invariants: per source, block ids
    are contiguous from 0, every non-final block holds exactly
    BLOCK_TOKENS tokens, token mass is conserved (sum of block fills =
    total tokens incl. one EOD per doc), and doc-start counts sum to
    the source's doc count."""
    from collections import defaultdict

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import BLOCK_TOKENS

    rows = REGISTRY["pack_blocks_fixed"].builder(spark, sf_correctness).collect()
    docs = load_table(spark, sf_correctness, "documents")
    from msstreamingstack_spark.functions.text import token_count

    truth = {
        r["source"]: (r["n"], r["tot"])
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            (F.sum(token_count(F.col("text"))) + F.count("*")).alias("tot"),
        )
        .collect()
    }
    per_src = defaultdict(list)
    for r in rows:
        per_src[r["source"]].append(r)
    assert set(per_src) == set(truth)
    for src, blocks in per_src.items():
        blocks.sort(key=lambda r: r["block_id"])
        n_docs_src, tot_tokens = truth[src]
        assert [b["block_id"] for b in blocks] == list(range(len(blocks)))
        assert all(b["block_tokens"] == BLOCK_TOKENS for b in blocks[:-1])
        assert 0 < blocks[-1]["block_tokens"] <= BLOCK_TOKENS
        assert sum(b["block_tokens"] for b in blocks) == tot_tokens
        assert sum(b["n_starts"] for b in blocks) == n_docs_src
        # docs touching >= docs starting, and some straddling exists
        assert all(b["n_docs"] >= b["n_starts"] for b in blocks)


def test_quality_source_calibrated_gate(spark, sf_correctness):
    """Each source keeps ~the same top fraction, and within a source
    no kept doc scores strictly below a dropped doc (ties broken by
    doc_id may interleave only at equal scores)."""
    from collections import defaultdict

    from msstreamingstack_spark.queries import REGISTRY

    rows = REGISTRY["quality_source_calibrated"].builder(
        spark, sf_correctness
    ).collect()
    per_src = defaultdict(list)
    for r in rows:
        per_src[r["source"]].append(r)
    for src, rs in per_src.items():
        n = len(rs)
        kept = [r for r in rs if r["keep"] == 1]
        assert 0 < len(kept) < n
        # percent_rank >= 0.7 keeps ceil(0.3*(n-1)) + ties
        assert abs(len(kept) / n - 0.3) < 0.15
        min_kept = min(r["score"] for r in kept)
        max_drop = max(r["score"] for r in rs if r["keep"] == 0)
        assert min_kept >= max_drop or any(
            r["score"] == min_kept and r["keep"] == 0 for r in rs
        )


def test_vocab_oov_coverage_matches_counter_model(spark, sf_correctness):
    """Per-source token totals and OOV counts must match a Python
    Counter model using the same top-N (count desc, word asc)
    vocabulary."""
    from collections import Counter, defaultdict

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import VOCAB_SIZE

    docs = load_table(spark, sf_correctness, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    freq = Counter()
    for r in docs:
        freq.update(r["text"].split(" "))
    vocab = {
        w for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_SIZE]
    }
    tot = defaultdict(lambda: [0, 0, 0, 0])  # docs, toks, oov, high
    for r in docs:
        ws = r["text"].split(" ")
        oov = sum(1 for w in ws if w not in vocab)
        s = tot[r["source"]]
        s[0] += 1
        s[1] += len(ws)
        s[2] += oov
        s[3] += 1 if oov * 2 > len(ws) else 0
    got = {
        r["source"]: r
        for r in REGISTRY["vocab_oov_coverage"].builder(spark, sf_correctness).collect()
    }
    assert set(got) == set(tot)
    for src, (nd, nt, no, hi) in tot.items():
        g = got[src]
        assert (g["n_docs"], g["total_tokens"], g["oov_tokens"], g["high_oov_docs"]) == (nd, nt, no, hi)
    # the word-salad corpus must actually have an OOV tail
    assert sum(r["oov_tokens"] for r in got.values()) > 0


def test_containment_pairs_catch_excerpts_jaccard_misses(spark, sf_correctness):
    """Every injected excerpt must be flagged as contained in its
    parent; flagged pairs must be invisible to the jaccard kernel
    (jaccard < 0.8) while containment >= 0.9; direction must point
    small -> large."""
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import CONTAIN_MOD

    rows = REGISTRY["dedup_containment_pairs"].builder(
        spark, sf_correctness
    ).collect()
    assert len(rows) > 0
    got = {(r["contained_id"], r["container_id"]) for r in rows}
    # each excerpt (id+1e6) is contained in its own parent
    parents = [
        r["doc_id"]
        for r in load_table(spark, sf_correctness, "documents")
        .filter(F.col("doc_id") % CONTAIN_MOD == 5)
        .select("doc_id")
        .collect()
    ]
    assert parents and all((p + 1000000, p) in got for p in parents)
    for r in rows:
        assert r["containment"] >= 0.9
        assert r["jaccard"] < 0.8
        assert r["contained_id"] != r["container_id"]


def test_registry_metadata_consistency(spark):
    """Every registry entry carries a doc and at least one tag; every
    oracle references only fixture tables; names are unique and
    builder callables are distinct (no accidental double-register)."""
    from msstreamingstack_spark.queries import REGISTRY

    tables = {"region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"}
    builders = set()
    for name, spec in REGISTRY.items():
        assert spec.doc and len(spec.doc) > 40, name
        assert spec.tags, name
        assert id(spec.builder) not in builders, name
        builders.add(id(spec.builder))
        if spec.oracle:
            import re as _re

            refs = set(_re.findall(
                r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", spec.oracle
            ))
            # every base-table reference must be a fixture table or a
            # CTE defined inside the oracle itself
            # AS ( | AS MATERIALIZED ( — the BPE oracles pin their
            # round CTEs materialized (exponential-inlining guard)
            ctes = set(_re.findall(
                r"([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*"
                r"(?:MATERIALIZED\s*)?\(",
                spec.oracle,
            ))
            unknown = refs - tables - ctes
            assert not unknown, (name, unknown)


def test_cluster_balanced_sampler_keeps_rare_cells_whole(spark):
    """The balancing property on constructed skew: a cell with fewer
    members than the per-cell budget keeps ALL of them while a dense
    cell is cut to exactly the budget — and ranks stay deterministic
    functions of the ids."""
    from msstreamingstack_spark.functions.text import hash48
    from msstreamingstack_spark.operators.similarity import (
        load_pinned_ivf,
        pinned_cell_assign,
    )
    from msstreamingstack_spark.operators.windows import topk_per_key_salted
    from msstreamingstack_spark.queries_advanced import CLUSTER_SAMPLE_K

    from pyspark.sql import functions as F

    C, _ = load_pinned_ivf("lloyd")
    rows = [(i, [float(x) for x in C[0]]) for i in range(3)]  # rare cell
    rows += [
        (100 + i, [float(x) for x in C[1]]) for i in range(30)
    ]  # dense cell
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = emb.select(
        "vec_id",
        pinned_cell_assign(F.col("embedding")).alias("cell"),
        hash48(F.col("vec_id").cast("string")).alias("hv"),
    )
    out = topk_per_key_salted(
        a,
        ("cell",),
        (F.col("hv"), F.col("vec_id")),
        k=CLUSTER_SAMPLE_K,
        salt_col=F.col("vec_id"),
        out="samp_rank",
    ).collect()
    per_cell: dict[int, int] = {}
    for r in out:
        per_cell[r["cell"]] = per_cell.get(r["cell"], 0) + 1
    assert per_cell[0] == 3              # rare: all kept
    assert per_cell[1] == CLUSTER_SAMPLE_K  # dense: cut to budget


def test_ngram_novelty_invariants(spark, sf_correctness):
    """Conservation + boundary invariants for ngram_novelty_score:
    summed novel_shingles == number of DISTINCT shingles in the corpus
    (each shingle is novel exactly once, at its min doc_id); the
    earliest doc with any shingles scores 100; novelty_pct is the
    exact integer floor of novel*100/total."""
    from msstreamingstack_spark.functions.text import shingles
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import NOVELTY_N
    from msstreamingstack_spark.sources.tables import load_table

    rows = REGISTRY["ngram_novelty_score"].builder(
        spark, sf_correctness
    ).collect()
    docs = load_table(spark, sf_correctness, "documents")
    n_docs = docs.count()
    assert len(rows) == n_docs
    distinct_corpus = (
        docs.select(F.explode(shingles(F.col("text"), NOVELTY_N)).alias("sh"))
        .distinct()
        .count()
    )
    assert sum(r["novel_shingles"] for r in rows) == distinct_corpus
    with_sh = sorted(
        (r for r in rows if r["total_shingles"] > 0),
        key=lambda r: r["doc_id"],
    )
    assert with_sh[0]["novel_shingles"] == with_sh[0]["total_shingles"]
    assert with_sh[0]["novelty_pct"] == 100
    for r in rows:
        if r["total_shingles"]:
            assert (
                r["novelty_pct"]
                == r["novel_shingles"] * 100 // r["total_shingles"]
            )
            assert 0 <= r["novel_shingles"] <= r["total_shingles"]
        else:
            assert r["novelty_pct"] == 100 and r["novel_shingles"] == 0


def test_label_outliers_match_numpy_mirror(spark, sf_correctness):
    """numpy mirror of embedding_label_outliers: float64 per-label
    centroids, cosine to own centroid, bottom-5 per label — the chosen
    vec_ids must match exactly and the cosines to 1e-6 (the engine's
    DECIMAL centroid sums vs numpy's float64 sums differ only in last
    bits, far below the round-9 output grain)."""
    import numpy as np

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_extensions import LABEL_OUTLIER_K
    from msstreamingstack_spark.sources.tables import load_table

    emb = load_table(spark, sf_correctness, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )
    expect = {}
    for lab, vecs in by_label.items():
        cent = np.mean([v for _, v in vecs], axis=0)
        cn = np.linalg.norm(cent)
        scored = sorted(
            (
                round(float(v @ cent / (np.linalg.norm(v) * cn)), 9),
                vid,
            )
            for vid, v in vecs
        )
        expect[lab] = scored[:LABEL_OUTLIER_K]
    got = REGISTRY["embedding_label_outliers"].builder(
        spark, sf_correctness
    ).collect()
    assert len(got) == sum(len(v) for v in expect.values())
    for r in got:
        cos, vid = expect[r["label"]][r["rn"] - 1]
        assert r["vec_id"] == vid
        assert abs(r["cos_centroid"] - cos) <= 1e-6
