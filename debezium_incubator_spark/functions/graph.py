"""Distributed connected components + duplicate-cluster assignment.

Pair detectors (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_near_dups``, ``shingle_overlap_pairs``) emit EDGES; a training
corpus needs the transitive closure — if A≈B and B≈C, all three are one
duplicate cluster and exactly one document survives. The reference
engine has no analog (it is a CDC transport); this is the LLM-pipeline
layer on top, built from the public MapReduce-CC literature (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — the
min-label + pointer-jumping family) re-expressed as DataFrame rounds.

Scale shape (100 TB corpus, O(corpus) edges from banded LSH):

* state per round is TWO slim tables — the symmetric edge list
  (persisted once; the only thing that touches raw pair output) and a
  (node, label) table. Labels are node ids, so both stay two columns.
* each round = one neighbor-min aggregation (partial-aggregated, one
  shuffle) + one pointer-jump join (one shuffle) + one scalar count
  action; no collect of anything O(n).
* label propagation alone needs O(diameter) rounds; the pointer-jump
  join (label := label(label)) halves chains each round, giving the
  O(log n) convergence of the Shiloach-Vishkin family — a 1M-doc
  boilerplate chain converges in ~20 rounds, not 1M.
* every round ends in ``localCheckpoint`` — iterative plans otherwise
  grow lineage linearly and Catalyst re-analysis dominates by round ~10
  (same trap as any iterative MLlib-style loop). On a real cluster with
  flaky executors, swap for reliable ``checkpoint()`` via
  ``spark.sparkContext.setCheckpointDir`` — localCheckpoint blocks die
  with their executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Min-label connected components over an undirected edge list.

    Returns ``(id, component)`` for every node incident to an edge;
    ``component`` is the smallest node id in the node's component
    (natural ordering of the id type — numeric for the doc corpora).

    Invariants the loop maintains (and the convergence proof):
    ``label(x) <= x`` always, labels only ever decrease, and they are
    bounded below by the component's min id — so the per-round changed
    count hits 0, and at the fixpoint labels are constant across every
    edge (both directions were propagated) ⇒ constant per component ⇒
    equal to the component min (the min node's own label can never
    drop below itself).
    """
    from pyspark import StorageLevel

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))  # self-loops are no-op edges
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # label(x) := x. localCheckpoint up front: the label table is the
    # loop-carried state and must not drag the edge-derivation plan
    # through every round's re-analysis.
    lab = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor-min: for u, the smallest label over its neighbors.
        # groupBy(min) partial-aggregates map-side — the shuffle moves
        # one (u, min) row per map task per u, not one row per edge.
        nbr = (
            sym.join(
                lab.select(F.col("id").alias("v"), F.col("comp").alias("vcomp")), "v"
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nbr_min"))
        )
        stepped = lab.join(nbr, lab["id"] == nbr["u"], "left").select(
            "id",
            "comp",
            F.least("comp", F.coalesce("nbr_min", "comp")).alias("half"),
        )
        # pointer jump: label := label(label). `half` is a node id, so the
        # lookup always lands; label(half) <= half keeps the decrease
        # monotone. This is what turns O(diameter) into O(log n).
        mapping = lab.select(F.col("id").alias("mid"), F.col("comp").alias("mcomp"))
        new = stepped.join(mapping, stepped["half"] == mapping["mid"], "left").select(
            "id",
            "comp",
            F.least("half", F.coalesce("mcomp", "half")).alias("comp2"),
        )
        new = new.localCheckpoint(eager=True)
        changed = new.filter(F.col("comp2") != F.col("comp")).count()
        lab = new.select("id", F.col("comp2").alias("comp"))
        if changed == 0:
            break
    if eager_cleanup:
        # lab is checkpointed — nothing downstream re-reads sym
        sym.unpersist(blocking=False)
    return lab


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster assignment for EVERY document: ``(doc_id, cluster_id,
    is_canonical)``. Documents in no pair are their own singleton
    cluster; the canonical survivor of each cluster is its min id (the
    deduplicated corpus is ``is_canonical`` = true).

    The join is a plain shuffle join by design: on a near-copy-heavy
    corpus the pair-incident node set can be a large fraction of the
    corpus, so broadcasting it is wrong at 100 TB; AQE will still
    broadcast when the component table happens to be small.
    """
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    out = docs.select(id_col).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    )
    cluster = F.coalesce(F.col("comp"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("is_canonical"),
    )
