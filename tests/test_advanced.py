"""Unit tests for the advanced operator wave: as-of join semantics,
approximate-aggregate accuracy bounds, range-join banding, and the
multimodal plumbing (deterministic stub decode, frame sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from msstreamingstack_spark.extensions.multimodal import (
    FEATURE_DIM,
    extract_features,
    fake_decode_image,
    sample_frames,
    synthetic_media,
)
from msstreamingstack_spark.operators.asof import asof_join
from msstreamingstack_spark.queries import REGISTRY


def test_asof_backward_inclusive(spark):
    """Ties match (inclusive); the latest at-or-before right row wins;
    left rows before any right row get nulls."""
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 20), (2, 7)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (3, 1, "z")], ["k", "rts", "val"]
    )
    out = {
        (r.k, r.ts): (r.rts, r.val)
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert out[(1, 5)] == (None, None)      # before any right row
    assert out[(1, 10)] == (10, "a")        # tie is inclusive
    assert out[(1, 20)] == (15, "b")        # latest at-or-before
    assert out[(2, 7)] == (None, None)      # key with no right rows


def test_asof_forward_inclusive_and_tolerance(spark):
    """Forward: earliest at-or-after right row wins, ties inclusive;
    tolerance nulls a match farther than the bound but keeps the left
    row (pandas merge_asof semantics)."""
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 20), (2, 7)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (3, 99, "z")], ["k", "rts", "val"]
    )
    fwd = {
        (r.k, r.ts): (r.rts, r.val)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            direction="forward",
        ).collect()
    }
    assert fwd[(1, 5)] == (10, "a")      # earliest at-or-after
    assert fwd[(1, 10)] == (10, "a")     # tie is inclusive
    assert fwd[(1, 20)] == (None, None)  # nothing after
    assert fwd[(2, 7)] == (None, None)
    tol = {
        (r.k, r.ts): (r.rts, r.val)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            direction="forward", tolerance=4,
        ).collect()
    }
    assert tol[(1, 5)] == (None, None)   # 10-5 > 4 → nulled, row kept
    assert tol[(1, 10)] == (10, "a")     # within tolerance
    assert len(tol) == 4                 # no left row dropped


def test_asof_bad_direction_raises(spark):
    left = spark.createDataFrame([(1, 5)], ["k", "ts"])
    right = spark.createDataFrame([(1, 10, "a")], ["k", "rts", "val"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            direction="nearest",
        )


def test_asof_no_row_multiplication(spark):
    left = spark.createDataFrame([(1, i) for i in range(50)], ["k", "ts"])
    right = spark.createDataFrame([(1, i, i) for i in range(0, 50, 5)], ["k", "rts", "v"])
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    assert out.count() == 50  # exactly one output row per left row


def test_approx_distinct_within_rsd(spark, sf_correctness):
    approx = {
        r.event_type: (r.approx_users, r.approx_events)
        for r in REGISTRY["approx_distinct_users"].builder(spark, sf_correctness).collect()
    }
    from msstreamingstack_spark.sources.tables import events_with_time

    exact = {
        r.event_type: (r.u, r.e)
        for r in events_with_time(spark, sf_correctness)
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct("event_id").alias("e"),
        )
        .collect()
    }
    for et, (au, ae) in approx.items():
        eu, ee = exact[et]
        assert abs(au - eu) / eu <= 0.05, (et, au, eu)
        assert abs(ae - ee) / ee <= 0.05, (et, ae, ee)


def test_range_join_bands_partition_all_orders(spark, sf_correctness):
    from msstreamingstack_spark.sources.tables import load_table

    res = REGISTRY["range_join_price_bands"].builder(spark, sf_correctness).collect()
    total = sum(r.n_orders for r in res)
    assert total == load_table(spark, sf_correctness, "orders").count()
    assert len(res) <= 5 and len({r.band for r in res}) == len(res)


def test_fake_decode_deterministic_and_fixed_width():
    payload = bytes(range(100))
    f1, f2 = fake_decode_image(payload), fake_decode_image(payload)
    assert f1 == f2 and len(f1) == FEATURE_DIM
    assert fake_decode_image(None) == [0.0] * FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in f1)


def test_multimodal_features_plumbing(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert r.n_bytes > 0
    # determinism across runs (Arrow batch path)
    again = {r.media_id: list(r.feature) for r in extract_features(media).collect()}
    assert all(list(r.feature) == again[r.media_id] for r in feats)


def test_frame_sampling_counts(spark):
    media = synthetic_media(spark, n=12)
    frames = sample_frames(media, every_ms=1000)
    per_vid = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durs = {r.media_id: r.duration_ms for r in media.filter(F.col("kind") == "video").collect()}
    assert set(per_vid) == set(durs)
    for mid, n in per_vid.items():
        assert n == (durs[mid] - 1) // 1000 + 1


def test_embedding_neardup_symmetric_free(spark, sf_correctness):
    res = REGISTRY["dedup_embedding_cosine"].builder(spark, sf_correctness).collect()
    pairs = {(r.d1, r.d2) for r in res}
    assert all(d1 < d2 for d1, d2 in pairs)  # canonical orientation only
    assert all(r.cos >= 0.45 for r in res)


def test_connected_components_known_graph(spark):
    from msstreamingstack_spark.operators.components import connected_components

    # two chains and a singleton edge: {1,2,3,4}, {10,11}, {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], ["d1", "d2"]
    )
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    from msstreamingstack_spark.operators.components import connected_components

    # a 12-node path needs several propagation rounds (diameter-bound)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["d1", "d2"]
    )
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0} and len(comp) == 13


def test_dedup_keep_list_unpaired_docs_kept(spark):
    from msstreamingstack_spark.operators.components import dedup_keep_list

    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 4), (4, 5)], ["d1", "d2"])
    out = {r.doc_id: (r.cluster_id, r.keep) for r in dedup_keep_list(docs, pairs).collect()}
    assert out == {
        0: (0, True), 1: (1, True), 2: (2, True),
        3: (3, True), 4: (1, False), 5: (1, False),
    }


def test_ivf_recall_vs_brute_force(spark, sf_correctness):
    from msstreamingstack_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from msstreamingstack_spark.sources.tables import load_table

    emb = load_table(spark, sf_correctness, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=5).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, recall  # nprobe=4/16 cells on random vectors
    assert all(len([g for g in got if g[0] == q]) <= 5 for q in range(10))


def test_ivf_ml_fit_recall(spark, sf_correctness):
    """The pyspark.ml KMeans fit path (K beyond a few thousand) feeds
    the same probe/assign kernels and must hold the same recall bound
    as the hand Lloyd fit."""
    from msstreamingstack_spark.operators.similarity import (
        IVF_K,
        brute_force_topk,
        ivf_fit_ml,
        ivf_topk,
    )
    from msstreamingstack_spark.sources.tables import load_table

    emb = load_table(spark, sf_correctness, "embeddings")
    centroids = ivf_fit_ml(emb)
    assert centroids.shape == (IVF_K, 64)

    queries = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, fit="ml").collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, recall


def test_ivf_index_save_load_roundtrip(spark, sf_correctness, tmp_path):
    """Index lifecycle: fit once, persist, reload — the loaded
    quantizer is bit-identical (doubles round-trip parquet exactly)
    and the probe search over it returns EXACTLY the rows the
    fit-inline path returns."""
    import numpy as np

    from msstreamingstack_spark.operators.similarity import (
        ivf_fit,
        ivf_index_load,
        ivf_index_save,
        ivf_topk,
    )
    from msstreamingstack_spark.sources.tables import load_table

    emb = load_table(spark, sf_correctness, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    centroids = ivf_fit(emb)
    path = str(tmp_path / "ivf_index")
    ivf_index_save(centroids, spark, path)
    loaded = ivf_index_load(spark, path)
    assert np.array_equal(centroids, loaded)

    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in ivf_topk(emb, queries, k=5, centroids=centroids).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in ivf_topk(emb, queries, k=5, centroids=loaded).collect()
    )
    assert want == got and len(got) > 0


def test_ivf_pinned_probe_recall_and_fixture_integrity(spark, sf_correctness):
    """The pinned-quantizer probe (the oracled lifecycle path): both
    committed indexes must hit the same recall bound as the in-line
    fits, return exactly k ranked rows per query, and the fixture's
    precomputed ||c||² must equal the STRICTLY SEQUENTIAL float64
    fold of c*c bit-for-bit (both engines consume it as a literal —
    a drifted cc would silently skew every assignment). The fold, not
    np.dot: BLAS summation order varies by kernel dispatch, so a
    dot-based invariant is machine-dependent (it broke 1-ULP between
    sessions on the SAME host)."""
    import numpy as np

    from msstreamingstack_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_pinned,
        load_pinned_ivf,
    )
    from msstreamingstack_spark.sources.tables import load_table

    for which in ("lloyd", "ml"):
        C, cc = load_pinned_ivf(which)
        assert C.shape == (16, 64) and cc.shape == (16,)
        def _seq_sq(c) -> float:
            y = 0.0
            for x in c:
                y += float(x) * float(x)
            return y

        assert all(_seq_sq(c) == float(v) for c, v in zip(C, cc))

    emb = load_table(spark, sf_correctness, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    for which in ("lloyd", "ml"):
        rows = ivf_topk_pinned(emb, queries, which, k=5).collect()
        got = {(r.query_id, r.neighbor_id) for r in rows}
        recall = len(got & truth) / len(truth)
        assert recall >= 0.5, (which, recall)
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.rank)
        assert set(per_q) == set(range(10))
        assert all(sorted(v) == list(range(1, 6)) for v in per_q.values())


def test_dedup_semantic_matches_numpy_model_with_planted_dups(spark, sf_smoke):
    """Plant exact + near duplicates into the real embedding fixture and
    check dedup_semantic against an independent numpy model of the rule:
    duplicate <=> an earlier (lower-id) vector in the SAME pinned cell
    within cos >= SEMDEDUP_COS_T."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from msstreamingstack_spark.operators.similarity import (
        COS_ROUND,
        load_pinned_ivf,
    )
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_advanced import SEMDEDUP_COS_T

    base = pd.read_parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    vecs = np.stack([np.asarray(v, dtype="float32") for v in base["embedding"]])
    n = len(base)
    # planted: an exact copy of vec 0 and a lightly-perturbed copy of
    # vec 1 (same cell, cos ~ 0.999) — both must flag as duplicates
    near = vecs[1] + 0.01 * np.abs(vecs[1]).mean()
    planted = np.vstack([vecs, vecs[0], near.astype("float32")])
    ids = list(range(n)) + [n, n + 1]
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [planted[i] for i in range(len(ids))],
            "label": [0] * len(ids),
        }
    ).to_parquet(os.path.join(tmp, "embeddings.parquet"))

    # independent model: argmin assignment + brute-force cosines
    C, cc = load_pinned_ivf("lloyd")
    X = planted.astype("float64")
    cells = np.argmin(cc[None, :] - 2.0 * (X @ C.T), axis=1)
    norms = np.linalg.norm(X, axis=1)
    want = {}
    for i in range(len(ids)):
        nbrs = [
            round(float(X[i] @ X[j]) / float(norms[i] * norms[j]), COS_ROUND)
            for j in range(i)
            if cells[j] == cells[i]
        ]
        hits = [c for c in nbrs if c >= SEMDEDUP_COS_T]
        want[i] = (int(cells[i]), len(hits), max(hits) if hits else -1.0,
                   1 if hits else 0)

    got = {
        r["vec_id"]: (r["cell"], r["n_nbrs"], r["top_cos"], r["is_semdup"])
        for r in REGISTRY["dedup_semantic"].builder(spark, tmp).collect()
    }
    assert set(got) == set(want)
    for i in got:
        g, w = got[i], want[i]
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (i, g, w)
        assert abs(g[2] - w[2]) < 1e-9, (i, g, w)
    # the planted pair actually flags
    assert got[n][3] == 1 and got[n + 1][3] == 1


def test_dedup_semantic_refinement_is_monotone_and_modeled(spark, sf_smoke):
    """Above the pinned quantizer's design occupancy the builder derives
    SRP split bits; the refined flag set must (a) match a numpy model of
    the refined rule and (b) be a SUBSET of the unrefined flags —
    splitting cells can only remove pairs, never invent them."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from msstreamingstack_spark.operators.similarity import (
        COS_ROUND,
        SEMDEDUP_PLANE_BASE,
        _plane,
        load_pinned_ivf,
        semdedup_sub_bits,
    )
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_advanced import SEMDEDUP_COS_T

    base = pd.read_parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    vecs = np.stack([np.asarray(v, dtype="float32") for v in base["embedding"]])
    rng_rows = []
    # tile the fixture past the 0-bit boundary (K*32 = 512) with exact
    # copies at new ids — copies land in the same cell AND sub-bucket,
    # so refined detection must still flag them
    while len(rng_rows) + len(vecs) <= 600:
        rng_rows.extend(vecs)
    planted = np.vstack([vecs, np.stack(rng_rows)])[:601]
    ids = list(range(len(planted)))
    bits = semdedup_sub_bits(len(planted))
    assert bits >= 1  # the point of the fixture

    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [planted[i].astype("float32") for i in ids],
            "label": [0] * len(ids),
        }
    ).to_parquet(os.path.join(tmp, "embeddings.parquet"))

    C, cc = load_pinned_ivf("lloyd")
    X = planted.astype("float64")
    cells = np.argmin(cc[None, :] - 2.0 * (X @ C.T), axis=1)
    planes = np.array(
        [_plane(SEMDEDUP_PLANE_BASE + j) for j in range(bits)], dtype="float64"
    ).T
    subs = (((X @ planes) > 0)
            * np.array([1 << j for j in range(bits)])).sum(axis=1)
    norms = np.linalg.norm(X, axis=1)

    def flags(keys):
        out = {}
        for i in ids:
            hit = any(
                keys[j] == keys[i]
                and round(float(X[i] @ X[j]) / float(norms[i] * norms[j]),
                          COS_ROUND) >= SEMDEDUP_COS_T
                for j in range(i)
            )
            out[i] = 1 if hit else 0
        return out

    refined_model = flags(list(zip(cells, subs)))
    unrefined_model = flags(list(cells))

    got = {
        r["vec_id"]: r["is_semdup"]
        for r in REGISTRY["dedup_semantic"].builder(spark, tmp).collect()
    }
    assert got == refined_model
    # monotone: refined flags never exceed unrefined
    assert all(got[i] <= unrefined_model[i] for i in ids)
    # exact copies still detected under refinement
    assert all(got[i] == 1 for i in range(len(vecs), len(planted)))


def test_approx_percentile_tracks_exact(spark, sf_correctness):
    """The quantile sketch must land within a small value band of the
    exact per-group percentiles (rank error ~1e-4 at accuracy 10000 —
    on 10k-row groups that's a handful of ranks; bound the VALUE gap
    via neighboring exact quantiles instead of equality)."""
    from msstreamingstack_spark.queries import REGISTRY

    exact = {
        r["event_type"]: [r["p25"], r["p50"], r["p75"], r["p95"]]
        for r in REGISTRY["percentile_event_values"]
        .builder(spark, sf_correctness)
        .collect()
    }
    approx = {
        r["event_type"]: list(r["approx_quantiles"])
        for r in REGISTRY["approx_percentile_event_values"]
        .builder(spark, sf_correctness)
        .collect()
    }
    assert set(exact) == set(approx)
    for et in exact:
        for e, a in zip(exact[et], approx[et]):
            # event values are O(1-100); at this accuracy the sketch
            # answer should sit within 1% of the exact value
            assert abs(a - e) <= max(0.01 * abs(e), 1e-9), (et, e, a)


def test_percentile_sketch_sample_properties(spark, sf_correctness):
    """The oracled bottom-K quantile sketch: (1) the sample quantiles
    track the exact ones within the KMV sampling band (~1/sqrt(k)
    rank error -> a loose value band on O(1-100) values); (2) the
    sample is EXACTLY the bottom-k_used rows per group under
    (hash48(event_id), event_id) order below the threshold — i.e.
    mergeable bottom-K semantics, re-derived independently here."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.functions.text import hash48
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_advanced import (
        _QSK_K,
        _QSK_THRESH,
    )
    from msstreamingstack_spark.sources.tables import events_with_time

    rows = (
        REGISTRY["percentile_event_values_sketch"]
        .builder(spark, sf_correctness)
        .collect()
    )
    exact = {
        r["event_type"]: [r["p25"], r["p50"], r["p75"], r["p95"]]
        for r in REGISTRY["percentile_event_values"]
        .builder(spark, sf_correctness)
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    # independent bottom-K model from the raw table
    ev = events_with_time(spark, sf_correctness)
    cand = (
        ev.select(
            "event_type",
            "value",
            hash48(F.col("event_id").cast("string")).alias("hv"),
            "event_id",
        )
        .filter(F.col("hv") < _QSK_THRESH)
        .collect()
    )
    by_type: dict = {}
    for r in cand:
        by_type.setdefault(r["event_type"], []).append(
            (r["hv"], r["event_id"], r["value"])
        )
    for r in rows:
        et = r["event_type"]
        samp = sorted(by_type[et])[:_QSK_K]
        assert r["k_used"] == len(samp), et
        vals = sorted(v for _, _, v in samp)
        # python-side interpolated quantile mirror (numpy 'linear')
        import numpy as np

        for q, got in zip(
            (0.25, 0.50, 0.75, 0.95),
            (r["s25"], r["s50"], r["s75"], r["s95"]),
        ):
            want = float(np.quantile(vals, q, method="linear"))
            assert abs(got - want) <= 1e-8, (et, q, got, want)
        # sampling-accuracy band vs the exact quantiles: ~4/sqrt(k)
        # rank error covers >99.99% of KMV draws; translate to value
        # space loosely (event values are O(1-100))
        k = max(r["k_used"], 1)
        band = 6.0 / (k ** 0.5)
        for e, s in zip(exact[et], (r["s25"], r["s50"], r["s75"], r["s95"])):
            assert abs(s - e) <= max(band * max(abs(e), 1.0), 0.05), (
                et,
                e,
                s,
            )


def test_percentile_sketch_salted_twin_bit_identical(
    spark, sf_correctness
):
    """The skew_robust=True form (topk_per_key_salted bottom-K, the
    100 TB hot-type knob from the r10 verdict's task #5) must be
    BIT-identical to the single-window default: (hv, event_id) is a
    total order and the salt is a deterministic function of the row,
    so the surviving sample — and every interpolated estimate — is the
    same set."""
    from msstreamingstack_spark.queries_advanced import (
        q_percentile_event_values_sketch,
    )

    base = sorted(
        map(tuple, q_percentile_event_values_sketch(
            spark, sf_correctness
        ).collect())
    )
    salted = sorted(
        map(tuple, q_percentile_event_values_sketch(
            spark, sf_correctness, skew_robust=True
        ).collect())
    )
    assert base == salted
    assert len(base) > 0


def test_coreset_kcenter_matches_python_greedy(spark, sf_correctness):
    """Pure-Python greedy farthest-point model with the same
    round-then-exact-sum distance discipline must pick the same
    centers in the same order; selection distances must be
    non-increasing (the greedy invariant behind the 2-approximation)."""
    from decimal import Decimal

    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_advanced import KCENTER_K

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_correctness}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }

    def d2(a, b):
        return float(
            sum(Decimal(str(round((x - y) * (x - y), 9))) for x, y in zip(a, b))
        )

    seed = min(emb)
    selected = [(1, seed, 0.0)]
    min_d = {v: d2(emb[v], emb[seed]) for v in emb}
    for t in range(2, KCENTER_K + 1):
        top = max(min_d, key=lambda v: (min_d[v], -v))
        selected.append((t, top, round(min_d[top], 9)))
        for v in emb:
            min_d[v] = min(min_d[v], d2(emb[v], emb[top]))

    rows = sorted(
        REGISTRY["coreset_kcenter"].builder(spark, sf_correctness).collect(),
        key=lambda r: r["sel_round"],
    )
    got = [(r["sel_round"], r["vec_id"], r["dist2"]) for r in rows]
    assert [(t, v) for t, v, _ in got] == [(t, v) for t, v, _ in selected]
    for (_, _, g), (_, _, e) in zip(got, selected):
        assert abs(g - e) <= 1e-9
    dists = [d for t, _, d in got if t > 1]
    assert dists == sorted(dists, reverse=True)
