"""Connected components over near-duplicate pair graphs — the cluster
-resolution step of a dedup pipeline: pairs (d1,d2) from any detector
(exact / minhash / simhash / embedding) → one cluster id per document
→ keep the canonical (min-id) member, drop the rest.

Algorithm: iterative min-label propagation (the standard large-graph
CC formulation, cf. GraphX/GraphFrames connectedComponents):

    label(v) ← min(label(v), min over neighbors(label(u)))

repeated until fixpoint. Each iteration is one join + one aggregate —
all distributed; the driver only checks the convergence counter (a
scalar), never collects data. Iteration count is O(graph diameter);
near-dup graphs are overwhelmingly tiny star/clique clusters, so 2-3
iterations converge in practice and ``max_iter`` bounds the worst
case.

DataFrames are localCheckpoint()ed per iteration to cut the growing
lineage (a 100 TB-run necessity: without it, plan size and stage
re-execution explode with iteration count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 20,
    pairs_unique: bool = False,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id reachable. Deterministic, oracle-free by nature
    (iterative) — correctness pinned by property tests.

    ``pairs_unique``: the caller guarantees ``pairs`` holds each
    undirected pair once (e.g. the output of a groupBy(d1, d2) pair
    kernel) — the symmetric union is then already duplicate-free and
    the edge ``distinct()`` (one full shuffle of the edge table; at
    100 TB the largest frame this operator touches) is skipped.
    Duplicate edges would not change the fixpoint labels, only the
    per-iteration join fan-out, so the flag is a pure plan
    optimization."""
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        pairs.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    if not pairs_unique:
        edges = edges.distinct()
    edges = edges.localCheckpoint(eager=False)
    # no distinct on the label init: iteration 1's groupBy(node)
    # collapses duplicates, and the convergence check below compares
    # aggregate sums, which never see row multiplicity (the old
    # changed-join needed unique labels; the sum does not) — one
    # fewer shuffle before the loop.
    labels = edges.select(F.col("a").alias("node")).withColumn(
        "comp", F.col("node")
    )
    prev_sum: object = None
    for it in range(max_iter):
        # candidate label per node = min over self and neighbor labels
        neighbor_labels = (
            edges.join(labels, edges["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        # lazy checkpoint: the convergence aggregate below is the one
        # action that BOTH materializes the checkpoint and returns the
        # monotone label sum — one job per iteration where the old
        # shape paid two (eager checkpoint + a changed-detection join)
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        # min-label propagation only ever LOWERS a node's label, so
        # the exact label sum strictly decreases until fixpoint and
        # equal consecutive sums == no node changed. DECIMAL(38,0):
        # exact at any node-id scale (2^48 ids x 1e12 nodes overflows
        # a BIGINT sum, never this).
        new_sum = new_labels.agg(
            F.coalesce(
                F.sum(F.col("comp").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        if it > 0 and new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("node", "comp")


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
    pairs_unique: bool = False,
) -> DataFrame:
    """Per-document verdict: cluster id (its own id when unpaired) and
    whether the document survives dedup (it is its cluster's min id).
    ``pairs_unique`` — see :func:`connected_components`."""
    comps = connected_components(
        pairs, src=src, dst=dst, pairs_unique=pairs_unique
    )
    return (
        docs.select(id_col)
        .join(comps, docs[id_col] == comps["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )
