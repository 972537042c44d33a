"""Pinned-model serving operators: hashed NB text classifier + PCA.

Parity with the DuckDB oracles is covered by test_oracle_parity (the
registry auto-parametrizes); these tests pin the FIT semantics and
the model-quality floors the pinned artifacts must clear.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from msstreamingstack_spark.operators import pca as pca_mod
from msstreamingstack_spark.operators import textclf
from msstreamingstack_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# bucket hash: Spark == DuckDB, bit-exact
# ---------------------------------------------------------------------------
def test_bucket_hash_matches_duckdb(spark):
    import duckdb

    words = ["the", "stream fast", "row", "", "query group", "små"]
    sdf = spark.createDataFrame([(w,) for w in words], "g string").select(
        "g", textclf.bucket_hash(F.col("g")).alias("b")
    )
    got = {r["g"]: r["b"] for r in sdf.collect()}
    con = duckdb.connect()
    for w in words:
        exp = con.execute(
            f"SELECT {textclf.bucket_hash_sql('?')}", [w]
        ).fetchone()[0]
        assert got[w] == exp, w
    con.close()


# ---------------------------------------------------------------------------
# NB fit: closed-form semantics + guardrails
# ---------------------------------------------------------------------------
def test_nb_fit_matches_python_model(spark):
    """Full closed-form model recomputed in plain Python (hashlib +
    collections) — every pinned weight and the bias must match,
    collisions and all."""
    import hashlib
    from collections import Counter

    corpus = [
        (1, "aa aa bb", "en"),
        (2, "aa cc", "en"),
        (3, "bb bb cc", "fr"),
        (4, "cc cc", "fr"),
    ]
    B = 64
    docs = spark.createDataFrame(
        corpus, "doc_id long, text string, lang string"
    )
    pin = textclf.fit_nb_pinned(docs, buckets=B)
    assert pin["meta"]["buckets"] == B

    def grams(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    cp, cn = Counter(), Counter()
    for _, text, lang in corpus:
        tgt = cp if lang == "en" else cn
        for g in grams(text):
            tgt[bucket(g)] += 1
    np_, nn = sum(cp.values()), sum(cn.values())
    dp = sum(1 for _, _, lang in corpus if lang == "en")
    dn = len(corpus) - dp
    expected = {
        b: round(
            math.log2(((cp[b] + 1) * (nn + B)) / ((cn[b] + 1) * (np_ + B))), 9
        )
        for b in set(cp) | set(cn)
    }
    expected = {b: w for b, w in expected.items() if w != 0.0}
    assert pin["bias"] == pytest.approx(round(math.log2(dp / dn), 9))
    assert {b: w for b, w in pin["w"]} == pytest.approx(expected)


def test_nb_fit_single_class_raises(spark):
    docs = spark.createDataFrame(
        [(1, "aa", "en"), (2, "bb", "en")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="both classes"):
        textclf.fit_nb_pinned(docs, buckets=8)


def test_pinned_classifier_beats_base_rate(spark, sf_correctness):
    """The committed pinned model must separate en-vs-rest on the fit
    corpus well above the majority-class base rate — the fixture's
    five languages share ONE vocabulary, so this floor (75%) is real
    signal from frequency profiles alone."""
    docs = load_table(spark, sf_correctness, "documents")
    scored = textclf.score_pinned(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    agg = scored.agg(
        F.avg(
            (F.col("ft_pred_en") == (F.col("lang") == "en")).cast("double")
        ).alias("acc"),
        F.avg((F.col("lang") != "en").cast("double")).alias("base"),
    ).first()
    assert agg["acc"] >= 0.75
    assert agg["acc"] > agg["base"]


def test_score_pinned_n_grams_counts_all_grams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a", "en")],
        "doc_id long, text string, lang string",
    )
    rows = {
        r["doc_id"]: r["n_grams"]
        for r in textclf.score_pinned(docs).collect()
    }
    assert rows[1] == 5  # 3 unigrams + 2 bigrams
    assert rows[2] == 1  # 1 unigram, no bigram


# ---------------------------------------------------------------------------
# PCA fit: orthonormal, variance-ordered, matches numpy on the fixture
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pca_fit(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    return pca_mod.fit_pca_pinned(emb, q=4), emb


def test_pca_components_orthonormal(pca_fit):
    import numpy as np

    pin, _ = pca_fit
    V = np.array(pin["components"])
    G = V @ V.T
    assert np.allclose(G, np.eye(V.shape[0]), atol=1e-6)


def test_pca_evr_descending_and_bounded(pca_fit):
    pin, _ = pca_fit
    evr = pin["evr"]
    assert all(e >= 0 for e in evr)
    assert sum(evr) <= 1.0 + 1e-9
    assert evr == sorted(evr, reverse=True)


def test_pca_fit_matches_numpy(pca_fit):
    """Distributed moment fold == numpy full-matrix PCA (same data,
    both float64): eigenvalues and |projection| of the top component
    agree to 1e-6."""
    import numpy as np

    pin, emb = pca_fit
    X = np.stack(
        [r["embedding"] for r in emb.select("embedding").collect()]
    ).astype("float64")
    mu = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = evals.clip(min=0).sum()
    np_evr = evals[:4] / total
    assert np.allclose(np_evr, pin["evr"], atol=1e-6)
    assert np.allclose(mu, pin["mean"], atol=1e-6)


def test_pca_sign_pin(pca_fit):
    import numpy as np

    pin, _ = pca_fit
    for comp in pin["components"]:
        v = np.array(comp)
        assert v[int(np.argmax(np.abs(v)))] > 0


def test_pca_projection_matches_model(spark, sf_smoke):
    """Pinned projection (DECIMAL fold) == numpy (X-mu)@V.T within
    the 9-decimal rounding budget."""
    import numpy as np

    emb = load_table(spark, sf_smoke, "embeddings")
    pin = pca_mod.load_pinned()
    got = {
        r["vec_id"]: [r[f"pc{j + 1}"] for j in range(pin["meta"]["q"])]
        for r in pca_mod.project_pinned(emb).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    X = np.stack([r["embedding"] for r in rows]).astype("float64")
    ids = [r["vec_id"] for r in rows]
    V = np.array(pin["components"])
    P = (X - np.array(pin["mean"])) @ V.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], P[i], atol=1e-6), vid
