"""Fixed-point PageRank: exact equality with a pure-Python model.

DuckDB parity is covered by test_oracle_parity (registry
auto-parametrizes); these tests pin the kernel's semantics against an
independent implementation and its integer-arithmetic invariants.
"""

from __future__ import annotations

from collections import defaultdict

from msstreamingstack_spark.operators.pagerank import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    PR_TELEPORT_SCALED,
    copurchase_edges,
    pagerank,
)


def model_pagerank(edges, rounds):
    """(src, dst, cnt) triples → {node: scaled_int_rank}, pure Python
    integer arithmetic mirroring the operator's spec (NOT its code)."""
    outdeg = defaultdict(int)
    for s, _, c in edges:
        outdeg[s] += c
    nodes = sorted(outdeg)
    n = len(nodes)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(rounds):
        s = defaultdict(int)
        for u, v, c in edges:
            s[v] += (r[u] * c) // outdeg[u]
        r = {
            v: PR_TELEPORT_SCALED // n + (PR_DAMP_NUM * s[v]) // PR_DAMP_DEN
            for v in nodes
        }
    return r


def test_pagerank_matches_python_model(spark):
    # a small weighted digraph made symmetric by hand
    base = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "d", 5)]
    sym = base + [(d, s, c) for s, d, c in base]
    edges = spark.createDataFrame(sym, "src string, dst string, cnt long")
    got = {
        r["node"]: r["pagerank"] for r in pagerank(edges, rounds=4).collect()
    }
    want = {
        v: float(ri) / PR_SCALE for v, ri in model_pagerank(sym, 4).items()
    }
    assert got == want  # exact — integer kernel, single final divide


def test_pagerank_mass_conserved_within_floor_loss(spark, sf_smoke):
    """Each round loses at most (edges + 1) units of 1e-12 mass to
    floor division; total rank must sit just below 1.0 and every rank
    must be at least the teleport share."""
    from msstreamingstack_spark.sources.tables import load_table

    edges = copurchase_edges(
        load_table(spark, sf_smoke, "lineitem"),
        load_table(spark, sf_smoke, "orders"),
    )
    rows = pagerank(edges).collect()
    total = sum(r["pagerank"] for r in rows)
    assert 0.99 <= total <= 1.0 + 1e-9
    n = len(rows)
    teleport_floor = (PR_TELEPORT_SCALED // n) / PR_SCALE
    assert all(r["pagerank"] >= teleport_floor for r in rows)


def test_copurchase_graph_is_symmetric_and_dangling_free(spark, sf_smoke):
    from pyspark.sql import functions as F

    from msstreamingstack_spark.sources.tables import load_table

    e = copurchase_edges(
        load_table(spark, sf_smoke, "lineitem"),
        load_table(spark, sf_smoke, "orders"),
    )
    fwd = {(r["src"], r["dst"], r["cnt"]) for r in e.collect()}
    assert fwd == {(d, s, c) for s, d, c in fwd}  # symmetric with weights
    # symmetric ⇒ every node that receives mass also emits it
    srcs = {s for s, _, _ in fwd}
    dsts = {d for _, d, _ in fwd}
    assert srcs == dsts


def model_personalized(edges, seeds, rounds):
    """Seed-teleport variant of the model: teleport and initial mass
    land only on in-graph seeds; every seed re-receives teleport each
    round even with zero in-contributions."""
    outdeg = defaultdict(int)
    for s, _, c in edges:
        outdeg[s] += c
    nodes = sorted(outdeg)
    sset = sorted(set(seeds) & set(nodes))
    ns = len(sset)
    r = {v: (PR_SCALE // ns if v in sset else 0) for v in nodes}
    for _ in range(rounds):
        s = defaultdict(int)
        for u, v, c in edges:
            s[v] += (r[u] * c) // outdeg[u]
        r = {
            v: (PR_TELEPORT_SCALED // ns if v in sset else 0)
            + (PR_DAMP_NUM * s[v]) // PR_DAMP_DEN
            for v in nodes
        }
    return r


def test_personalized_matches_python_model(spark):
    base = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "d", 5)]
    sym = base + [(d, s, c) for s, d, c in base]
    edges = spark.createDataFrame(sym, "src string, dst string, cnt long")
    # 'z' is off-graph and must be ignored; 'd' is a leaf seed whose
    # round-1 in-contribution exists but whose teleport must persist
    seeds = spark.createDataFrame([("a",), ("d",), ("z",)], "node string")
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(edges, rounds=4, seeds=seeds).collect()
    }
    want = {
        v: float(ri) / PR_SCALE
        for v, ri in model_personalized(sym, ["a", "d", "z"], 4).items()
    }
    assert got == want


def test_personalized_mass_concentrates_on_seed_side(spark, sf_smoke):
    """Seed-relative scores: the seed set must hold more mass than
    under the uniform teleport, and total mass stays <= 1."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.sources.tables import load_table

    from msstreamingstack_spark.operators.pagerank import copurchase_node_id

    edges = copurchase_edges(
        load_table(spark, sf_smoke, "lineitem"),
        load_table(spark, sf_smoke, "orders"),
    )
    seeds = (
        load_table(spark, sf_smoke, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(copurchase_node_id(custkey="c_custkey"))
    )
    seed_keys = {r["node"] for r in seeds.collect()}
    pers = {r["node"]: r["pagerank"] for r in pagerank(edges, seeds=seeds).collect()}
    unif = {r["node"]: r["pagerank"] for r in pagerank(edges).collect()}
    assert sum(pers.values()) <= 1.0 + 1e-9
    p_seed = sum(v for k, v in pers.items() if k in seed_keys)
    u_seed = sum(v for k, v in unif.items() if k in seed_keys)
    assert p_seed > u_seed


def test_copurchase_node_codec_roundtrip(spark):
    """The BIGINT node encoding (r11: long ids through every kernel
    shuffle, strings only in the final projection) is injective across
    the two key spaces and decodes back to the exact public strings."""
    from pyspark.sql import functions as F

    from msstreamingstack_spark.operators.pagerank import (
        copurchase_node_id,
        copurchase_node_str,
    )

    keys = spark.createDataFrame(
        [(0,), (1,), (7,), (12345,), (999999,)], "k long"
    )
    cust = keys.select(copurchase_node_id(custkey="k"))
    supp = keys.select(copurchase_node_id(suppkey="k"))
    ids = {r["node"] for r in cust.collect()} | {
        r["node"] for r in supp.collect()
    }
    assert len(ids) == 10  # injective across both spaces
    got_c = [r[0] for r in cust.select(copurchase_node_str()).collect()]
    got_s = [r[0] for r in supp.select(copurchase_node_str()).collect()]
    ks = [0, 1, 7, 12345, 999999]
    assert sorted(got_c) == sorted(f"c{k}" for k in ks)
    assert sorted(got_s) == sorted(f"s{k}" for k in ks)


def test_triangle_count_matches_python_model(spark):
    """Independent model: weighted co-occurrence pairs, top-K
    strongest neighbors per node (cnt desc, id asc), symmetric-union
    KNN graph, then per-node triangles by neighbor intersection
    (every triangle counted once per member node)."""
    from msstreamingstack_spark.queries import REGISTRY
    from msstreamingstack_spark.queries_advanced import TRI_KNN_K

    sf = "/root/testdata/sf0.001"
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    from collections import Counter

    by_order: dict[int, Counter] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], Counter())[r["l_partkey"]] += 1
    # lineitem ROW pairs (multiset): an order holding part u in two
    # lines and v in one contributes 2 to cnt(u,v) — matches the SQL
    # self-join exactly
    wcnt: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                wcnt[(u, v)] = wcnt.get((u, v), 0) + parts[u] * parts[v]
    nbr_w: dict[int, list] = {}
    for (u, v), c in wcnt.items():
        nbr_w.setdefault(u, []).append((c, v))
        nbr_w.setdefault(v, []).append((c, u))
    adj: dict[int, set] = {}
    for node, lst in nbr_w.items():
        lst.sort(key=lambda cv: (-cv[0], cv[1]))
        for _, other in lst[:TRI_KNN_K]:
            adj.setdefault(node, set()).add(other)
            adj.setdefault(other, set()).add(node)
    expect = {}
    for node, nbrs in adj.items():
        t = 0
        for u in nbrs:
            t += len(nbrs & adj[u])
        # each triangle at `node` counted twice (once per ordered
        # neighbor pair)
        if t:
            expect[node] = (len(nbrs), t // 2)

    rows = REGISTRY["graph_triangle_count"].builder(spark, sf).collect()
    got = {r["node"]: (r["deg"], r["n_triangles"]) for r in rows}
    assert got == expect
