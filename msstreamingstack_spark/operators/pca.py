"""Distributed PCA over an embedding column, pinned-component serving.

Embedding post-processing in LLM data pipelines (whitening before
clustering/dedup, dimensionality reduction before ANN — e.g. the
common PCA→IVF recipe from the FAISS literature) needs principal
components of a corpus-scale ``array<float>`` column. Spark-first
split, exactly like the IVF quantizer (operators/similarity.py):

- **fit** (offline, sample-scale): one ``mapInPandas`` pass emits ONE
  partial-moment row per partition — ``(n, Σx (D), flat ΣxxT (D²))``
  — so the driver collect is bounded at ``partitions × (D² + D + 1)``
  doubles no matter the corpus size; moments → covariance → numpy
  ``eigh`` on the driver (a D×D problem, D=64 here). Component signs
  are pinned (largest-|v| element made positive, lowest index on
  ties) and values rounded to 9 decimals BEFORE pinning to
  ``resources/pca_pinned.json`` — so the pinned artifact, not the
  refit, is the source of truth.
- **serve** (corpus-scale, fully DuckDB-oracled): project every
  embedding onto the pinned components. Plan: posexplode the vector
  (narrow), broadcast-join the D-row ``(i, mu, v1..vq)`` dim table,
  fold per vec_id with round-then-DECIMAL sums — order-free, pure
  JVM codegen, ONE shuffle (the per-vector fold). No Python in the
  serving path; at 100 TB the dim table is D rows and the fold
  partial-aggregates map-side.

Cross-engine determinism: float32 inputs cast to DOUBLE exactly;
``(x_i - mu_i) * v_ji`` is one IEEE multiply on identical doubles in
both engines; each term is rounded to 9 decimals and DECIMAL-summed.

The reference engine has no linear-algebra surface (SURVEY.md §2.5
ABSENT) — north-star extension.
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

PCA_Q = 4
PCA_ROUND = 9
_PINNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "pca_pinned.json",
)
_PINNED_CACHE: dict | None = None


def fit_pca_pinned(
    embeddings: DataFrame,
    q: int = PCA_Q,
    vec_col: str = "embedding",
    meta: dict | None = None,
) -> dict:
    """Fit and return the pin payload (mean, components, evr).

    Partial second moments per partition via Arrow, exact-ish driver
    combine (math.fsum over partition partials in partition order),
    then a D×D ``eigh``. The refit is NOT required to be bit-stable —
    the committed pinned JSON is the model; tests assert properties
    (orthonormality, descending eigenvalues) rather than refit
    equality, per the IVF-precedent fit/serve split."""
    import numpy as np
    import pandas as pd

    src = embeddings.select(F.col(vec_col).alias("v"))
    n_dim = len(src.first()["v"])

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(n_dim, dtype="float64")
        ss = np.zeros((n_dim, n_dim), dtype="float64")
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy()).astype("float64")
            n += X.shape[0]
            s += X.sum(axis=0)
            ss += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = (
        src.mapInPandas(
            partial, "n long, s array<double>, ss array<double>"
        )
        .collect()
    )
    if not rows:
        raise ValueError("PCA fit on an empty embedding table")
    n = sum(r["n"] for r in rows)
    s = np.array(
        [math.fsum(r["s"][i] for r in rows) for i in range(n_dim)]
    )
    ss = np.array(
        [
            math.fsum(r["ss"][k] for r in rows)
            for k in range(n_dim * n_dim)
        ]
    ).reshape(n_dim, n_dim)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:q]
    comps = []
    for j in order:
        v = evecs[:, j]
        pivot = int(np.argmax(np.abs(v)))  # lowest index wins np ties
        if v[pivot] < 0:
            v = -v
        comps.append([round(float(x), PCA_ROUND) for x in v])
    total_var = float(np.sum(np.clip(evals, 0, None)))
    return {
        "meta": dict(meta or {}, dim=n_dim, q=q, n_fit=n),
        "mean": [round(float(x), PCA_ROUND) for x in mu],
        "components": comps,
        "evr": [
            round(float(evals[j]) / total_var, PCA_ROUND) if total_var else 0.0
            for j in order
        ],
    }


def load_pinned() -> dict:
    global _PINNED_CACHE
    if _PINNED_CACHE is None:
        with open(_PINNED_PATH) as fh:
            _PINNED_CACHE = json.load(fh)
    return _PINNED_CACHE


def project_pinned(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, pc1..pcq) — pinned-component projection.

    posexplode → broadcast D-row dim table → per-vector DECIMAL fold.
    Pure JVM; the only shuffle is the per-vector fold, which
    partial-aggregates map-side."""
    pin = load_pinned()
    q = pin["meta"]["q"]
    spark = embeddings.sparkSession
    dim_rows = [
        (i, pin["mean"][i], *[pin["components"][j][i] for j in range(q)])
        for i in range(pin["meta"]["dim"])
    ]
    schema = "i int, mu double, " + ", ".join(
        f"v{j + 1} double" for j in range(q)
    )
    dims = spark.createDataFrame(dim_rows, schema)
    ex = embeddings.select(
        id_col, F.posexplode(F.col(vec_col)).alias("i", "x")
    )
    joined = ex.join(F.broadcast(dims), "i")
    centered = (F.col("x").cast("double") - F.col("mu"))
    aggs = [
        F.sum(
            F.round(centered * F.col(f"v{j + 1}"), PCA_ROUND).cast(
                "decimal(28,9)"
            )
        )
        .cast("double")
        .alias(f"pc{j + 1}")
        for j in range(q)
    ]
    return joined.groupBy(id_col).agg(*aggs)


def project_pinned_sql() -> str:
    """DuckDB twin of :func:`project_pinned` — dim table inline as
    VALUES literals, parallel-unnest zip for the 0-based posexplode."""
    pin = load_pinned()
    q = pin["meta"]["q"]
    vals = ",\n    ".join(
        f"({i}, {pin['mean'][i]!r}, "
        + ", ".join(repr(pin["components"][j][i]) for j in range(q))
        + ")"
        for i in range(pin["meta"]["dim"])
    )
    cols = ", ".join(f"v{j + 1}" for j in range(q))
    sums = ",\n       ".join(
        f"CAST(SUM(CAST(round((CAST(x AS DOUBLE) - mu) * v{j + 1}, "
        f"{PCA_ROUND}) AS DECIMAL(28,9))) AS DOUBLE) AS pc{j + 1}"
        for j in range(q)
    )
    return f"""
WITH dims(i, mu, {cols}) AS (
  VALUES {vals}
),
ex AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS i
  FROM embeddings
)
SELECT vec_id,
       {sums}
FROM ex JOIN dims USING (i)
GROUP BY vec_id
"""
