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


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(u,v) ∪ (v,u) built by exploding a two-struct array — ONE
    evaluation of the edge frame (a union of two selects computes its
    input once per branch), self-loops dropped."""
    e = F.explode(
        F.array(
            F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
            F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
        )
    ).alias("e")
    return (
        edges.select(e)
        .select("e.u", "e.v")
        .filter(F.col("u") != F.col("v"))  # self-loops are no-op edges
    )


def _min_label_init(sym: DataFrame) -> DataFrame:
    """label(x) := min(x, min neighbor) — folds the first propagation
    round into initialization (one aggregation instead of a full
    join+jump round). Every incident node appears as ``u`` because sym
    carries both directions. localCheckpoint: the label table is the
    loop-carried state and must not drag the edge-derivation plan
    through every round's re-analysis."""
    return (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select(F.col("u").alias("id"), F.least("u", "__mv").alias("comp"))
        .localCheckpoint(eager=True)
    )


def _propagate(sym: DataFrame, lab: DataFrame, max_iter: int) -> DataFrame:
    """The min-label + pointer-jump fixpoint loop over a symmetric edge
    list and an initial (id, comp) label table; see
    ``connected_components`` for the invariants."""
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
    return lab


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    eager_cleanup: bool = True,
    dedupe_edges: bool = True,
    contract: bool = True,
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

    ``dedupe_edges=False`` skips the symmetric list's ``distinct`` when
    the caller guarantees unique ``src < dst`` pairs (true for every
    pair detector in this package — their pairs come out of a groupBy);
    duplicates would only cost work, never correctness, so this is a
    pure shuffle removal (guide §2.4: a distinct on already-unique
    data).

    ``contract=True`` (star contraction, the Kiveris et al. family):
    after the init round assigns every node a CONNECTED representative
    (min of itself and its neighbors), the edge list is relabeled to
    representatives and deduplicated — on the near-copy corpora this
    collapses the clique mass so the iterative rounds run over the
    contracted graph (orders of magnitude fewer edges), and the final
    labels compose back through the representative mapping. Contracting
    by a connected representative preserves components, contracted node
    ids are original node ids, so the inner fixpoint still yields the
    component min.
    """
    from pyspark import StorageLevel

    # both directions in ONE pass over the edge frame (explode of a
    # 2-struct array) — a union of two selects would evaluate the whole
    # upstream pair pipeline once per branch when the caller hands us a
    # lazy edge listing
    sym_raw = _symmetrize(edges, src, dst)
    sym = (sym_raw.distinct() if dedupe_edges else sym_raw).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    lab = _min_label_init(sym)
    if not contract:
        out = _propagate(sym, lab, max_iter)
        if eager_cleanup:
            # lab is checkpointed — nothing downstream re-reads sym
            sym.unpersist(blocking=False)
        return out
    # star contraction: edges between representatives, normalized + deduped
    cu = lab.select(F.col("id").alias("u"), F.col("comp").alias("__cu"))
    cv = lab.select(F.col("id").alias("v"), F.col("comp").alias("__cv"))
    e1 = (
        sym.join(cu, "u")
        .join(cv, "v")
        .select(
            F.least("__cu", "__cv").alias("u"), F.greatest("__cu", "__cv").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym1 = _symmetrize(e1, "u", "v").persist(StorageLevel.MEMORY_AND_DISK)
    comp1 = _propagate(sym1, _min_label_init(sym1), max_iter)
    # compose: a node's representative may itself have been relabeled;
    # representatives whose class swallowed their whole neighborhood are
    # absent from the contracted graph and keep their own label
    out = (
        lab.join(
            comp1.select(F.col("id").alias("comp"), F.col("comp").alias("__final")),
            "comp",
            "left",
        )
        .select("id", F.coalesce("__final", "comp").alias("comp"))
        .localCheckpoint(eager=True)
    )
    if eager_cleanup:
        sym.unpersist(blocking=False)
        sym1.unpersist(blocking=False)
    return out


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
    # pair detectors emit unique src < dst rows out of a groupBy — the
    # symmetric list needs no dedup shuffle (see connected_components)
    comp = connected_components(
        pairs, src=src, dst=dst, max_iter=max_iter, dedupe_edges=False
    )
    out = docs.select(id_col).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    )
    cluster = F.coalesce(F.col("comp"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("is_canonical"),
    )
