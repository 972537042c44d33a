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
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id reachable. Deterministic, oracle-free by nature
    (iterative) — correctness pinned by property tests."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        # candidate label per node = min over self and neighbor labels
        neighbor_labels = (
            edges.join(labels, edges["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """Per-document verdict: cluster id (its own id when unpaired) and
    whether the document survives dedup (it is its cluster's min id)."""
    comps = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(id_col)
        .join(comps, docs[id_col] == comps["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )
