"""connected_components / dedup_clusters — transitive closure over
near-dup pair edges (functions/graph.py).

The closure is the part a pairs-only oracle cannot see: a chain
a-b, b-c with NO a-c edge must still land all three in one cluster.
Every test here includes at least one non-clique component, and the
Python union-find oracle is independent of the Spark iteration.
"""

import random

from pyspark.sql import functions as F

from debezium_incubator_spark.functions.graph import (
    connected_components,
    dedup_clusters,
)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component, only for nodes incident to an edge
    incident = sorted({x for e in edges for x in e if e[0] != e[1]})
    roots = {}
    for v in incident:
        r = find(v)
        roots.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in roots.items() for v in vs}


def _cc_dict(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["comp"] for r in connected_components(df, **kw).collect()
    }


def test_chain_converges_to_min(spark):
    # a pure path 0-1-2-...-9: diameter 9, the worst case for plain
    # label propagation; pointer jumping must still converge inside
    # max_iter and label everything 0
    edges = [(i, i + 1) for i in range(9)]
    got = _cc_dict(spark, edges, max_iter=10)
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_self_loop(spark):
    edges = [(5, 3), (3, 8), (20, 21), (7, 7)]  # self-loop is a no-op
    got = _cc_dict(spark, edges)
    assert got == {3: 3, 5: 3, 8: 3, 20: 20, 21: 20}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
        ] + [(i, i + 1) for i in range(10)]  # guarantee a chain
        want = _uf_components(n, edges)
        got = _cc_dict(spark, edges)
        assert got == want, f"trial {trial}"


def test_dedup_clusters_singletons_and_canonicals(spark):
    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )  # chain 0-1-2 (no 0-2 edge), pair 5-6; 3,4,7 singleton
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, True),
        1: (0, False),
        2: (0, False),
        3: (3, True),
        4: (4, True),
        5: (5, True),
        6: (5, False),
        7: (7, True),
    }


def test_shingle_overlap_pairs_feed(spark):
    # three docs sharing a 5-word boilerplate block chain through it;
    # the distinct payloads keep pairwise Jaccard low (the ratio-edge
    # blind spot shingle_overlap_pairs exists for)
    boiler = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, boiler + " one unique tail here first"),
            (2, boiler + " second rather different words follow"),
            (3, boiler + " third totally other content body"),
            (4, "nothing shared with anyone at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    from debezium_incubator_spark.functions.dedup_text import (
        shingle_overlap_pairs,
    )

    pairs = shingle_overlap_pairs(docs, min_overlap=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert clusters == {1: 1, 2: 1, 3: 1, 4: 4}


def test_contraction_and_edge_dedup_flags_agree(spark):
    """r6: star contraction and the dedupe_edges fast path are pure
    optimizations — all flag combinations produce the union-find answer
    on random graphs (edges pre-normalized unique a<b, as the pair
    detectors emit them)."""
    rng = random.Random(7)
    n = 80
    raw = {(min(a, b), max(a, b)) for a, b in
           ((rng.randrange(n), rng.randrange(n)) for _ in range(n))
           if a != b} | {(i, i + 1) for i in range(12)}
    edges = sorted(raw)
    want = _uf_components(n, edges)
    for contract in (True, False):
        for dedupe in (True, False):
            got = _cc_dict(spark, edges, contract=contract, dedupe_edges=dedupe)
            assert got == want, (contract, dedupe)
