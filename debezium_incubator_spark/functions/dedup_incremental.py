"""Incremental deduplication: assign newly-ingested documents to
duplicate clusters WITHOUT re-deduplicating the corpus.

This is the bridge between the CDC engine (documents arrive in change
batches) and the batch dedup layer (`dedup_text` + `graph`): at 100 TB
you cannot re-shingle the corpus per ingest batch, so the shingle-hash
inverted index, per-doc set sizes, and cluster assignments become
DURABLE STATE, and each `add(delta)` touches only

* O(delta) shingling work (the delta is tokenized/shingled once),
* one join of the delta's exploded shingle hashes against the stored
  index (the stored side is scanned, never re-derived; AQE broadcasts
  the delta side when it is small — the common ingest-batch case),
* a connected-components run over the CLUSTER GRAPH — nodes are the
  touched cluster labels, not documents — so transitive merges caused
  by a bridging document cost O(touched clusters), not O(corpus edges).

Durability mirrors the lake's commit-then-pointer invariant
(`lake/table.py`): every `build`/`add` writes new state dirs plus a
manifest ``v{N}.json``, then atomically swings the ``_VERSION`` pointer
(`lake/checkpoint.py:_atomic_write`). A crash mid-add leaves the
previous version fully readable; re-running the add is safe (the
orphaned dirs of the failed attempt are unreferenced).

Edge semantics match the batch operators exactly:

* ``min_overlap=k`` — absolute shared-shingle edges
  (`dedup_text.shingle_overlap_pairs`): the chain-y, transitive
  relation that actually exercises closure (ratio edges are bimodal on
  near-copy corpora, so their graphs are cliques).
* ``threshold=t`` — exact Jaccard over the stored hash sets
  (`dedup_text.ngram_jaccard_pairs` semantics; xxhash64 collisions are
  the only divergence, ~2^-64 per shingle pair).

Equivalence to the batch result: after any sequence of build+add over
an append-only corpus, `clusters()` equals
`graph.dedup_clusters(all_docs, <batch pair op>(all_docs))` — every
old-old edge was found when both docs were present, every new-old /
new-new edge is found by the delta join, and cluster-graph CC preserves
the min-doc-id labeling invariant (each stored label IS its cluster's
min id, so the min over merged labels is the merged cluster's min id).
Proven in tests/test_dedup_incremental.py against the batch path.

Scope: append-only corpora (the training-data case). `remove(ids)`
tombstones documents — they leave `clusters()` and stop forming NEW
edges (their index rows are anti-joined away at candidate time), but
edges they already contributed persist, exactly like a dedup service
that never re-splits a cluster on member deletion.

df_cap note: with a cap, a shingle's document frequency is evaluated
against the frequency AT ADD TIME (stored ``dfs`` + the delta's own
counts). A shingle that later crosses the cap stops making new edges,
but edges it already made stand — the monotone guarantee an online
service gives. The batch operators compute df over the final corpus, so
capped runs can differ from batch; cap-free runs are exactly equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_incubator_spark.functions._state import VersionedState
from debezium_incubator_spark.functions.dedup_text import _shingle_sets
from debezium_incubator_spark.functions.graph import connected_components


class IncrementalDedupIndex:
    """Durable dedup state over an append-only document corpus.

    State (all slim, all columnar):
      ``inv_batch_{n}/``   (id, h)        exploded shingle xxhash64
      ``sizes_batch_{n}/`` (id, n_sh)     distinct-shingle counts
      ``clusters_v{n}/``   (id, cluster)  full assignment, rewritten
      ``dfs_v{n}/``        (h, df)        shingle document frequency
                                          (kept only when df_cap set)
      ``v{n}.json``        manifest: file lists + params + tombstones
      ``_VERSION``         atomic pointer {"version": n}
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle_n: int = 3,
        min_overlap: int | None = None,
        threshold: float | None = None,
        df_cap: int | None = None,
    ):
        if (min_overlap is None) == (threshold is None):
            raise ValueError("set exactly one of min_overlap / threshold")
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.params = {
            "shingle_n": shingle_n,
            "min_overlap": min_overlap,
            "threshold": threshold,
            "df_cap": df_cap,
        }
        self._st = VersionedState(spark, path, self.params)

    # ------------------------------------------------------------ state io
    # (delegated to VersionedState — commit-then-pointer, see _state.py)

    def version(self) -> int:
        return self._st.version()

    def _manifest(self) -> dict:
        return self._st.manifest()

    def _commit(self, manifest: dict) -> int:
        return self._st.commit(manifest)

    def _read(self, dirs: list[str]) -> DataFrame:
        return self._st.read(dirs)

    def _write(self, df: DataFrame, rel: str) -> None:
        self._st.write(df, rel)

    # ------------------------------------------------------------ shingling

    def _delta_state(self, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(id, h) exploded hashes + (id, n_sh) sizes for a batch —
        the only place raw text is touched; O(delta)."""
        sh = _shingle_sets(docs, self.id_col, self.text_col, self.params["shingle_n"])
        inv = sh.select(
            "id",
            F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("h"),
        )
        sizes = sh.select("id", F.size("sh").alias("n_sh"))
        return inv, sizes

    # ------------------------------------------------------------ edges

    def _edges(self, pair_rows: DataFrame, sizes_all: DataFrame) -> DataFrame:
        """(id_a, id_b) filtered by the configured criterion. pair_rows
        is the raw (id_a, id_b) co-occurrence stream (one row per shared
        shingle hash); one partial-aggregated count shuffle."""
        co = pair_rows.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
        if self.params["min_overlap"] is not None:
            return co.filter(F.col("inter") >= self.params["min_overlap"]).select(
                "id_a", "id_b"
            )
        t = self.params["threshold"]
        sa = sizes_all.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")
        sb = sizes_all.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")
        return (
            co.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
                >= t
            )
            .select("id_a", "id_b")
        )

    @staticmethod
    def _pair_rows(left_inv: DataFrame, right_inv: DataFrame, self_join: bool) -> DataFrame:
        """Ordered co-occurrence rows, one per shared shingle per pair.
        A self-join sees every unordered pair TWICE (a,b)+(b,a) → keep
        the `<` orientation only; a delta-vs-stored join sees it once
        with fixed sides (delta left) → order with least/greatest, else
        half the pairs (new id > old id) would be dropped."""
        j = left_inv.alias("a").join(right_inv.alias("b"), "h")
        if self_join:
            return j.filter(F.col("a.id") < F.col("b.id")).select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
        return j.filter(F.col("a.id") != F.col("b.id")).select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
        )

    def _cap_filter(self, inv: DataFrame, dfs: DataFrame | None) -> DataFrame:
        """Drop shingle hashes whose CURRENT document frequency exceeds
        df_cap (stored df + this delta's df)."""
        cap = self.params["df_cap"]
        if cap is None:
            return inv
        assert dfs is not None
        keep = dfs.filter(F.col("df") <= cap).select("h")
        return inv.join(keep, "h")

    # ------------------------------------------------------------ build/add

    def build(self, docs: DataFrame) -> int:
        """Index + cluster an initial corpus. Semantics == the batch
        `shingle_overlap_pairs`/`ngram_jaccard_pairs` → `dedup_clusters`
        composition (cap-free case exactly; see df_cap note)."""
        if self.version() != 0:
            raise RuntimeError("build() on a non-empty index; use add()")
        return self._apply(docs, initial=True)

    def add(self, docs: DataFrame, strict: bool = True) -> int:
        """Ingest a delta batch: new docs join existing clusters, and a
        delta doc similar to members of TWO old clusters merges them
        (cluster-graph transitive closure).

        Ids must be NEW (append-only contract — a changed document is
        remove() + add() under a fresh id). ``strict`` spends one scalar
        count to enforce that; pass False to skip the action when the
        caller guarantees it (e.g. monotone CDC offsets as ids)."""
        if strict:
            m = self._manifest()
            dup = (
                docs.select(F.col(self.id_col).alias("id"))
                .join(self._read([m["clusters"]]), "id", "left_semi")
                .count()
            )
            if dup:
                raise ValueError(
                    f"add(): {dup} ids already indexed (append-only contract; "
                    "remove() first or use a fresh id)"
                )
        return self._apply(docs, initial=False)

    def _apply(self, docs: DataFrame, initial: bool) -> int:
        from pyspark import StorageLevel

        vnew = self.version() + 1
        inv_dir = f"inv_batch_{vnew}"
        sizes_dir = f"sizes_batch_{vnew}"
        cap = self.params["df_cap"]

        inv_delta, sizes_delta = self._delta_state(docs)
        self._write(inv_delta, inv_dir)
        self._write(sizes_delta, sizes_dir)
        # re-read what was written: the delta pipeline runs once, and the
        # stored copy IS the long-term index — divergence impossible
        inv_delta = self._read([inv_dir])
        sizes_delta = self._read([sizes_dir])

        if initial:
            m = {"inv": [inv_dir], "sizes": [sizes_dir], "tombstones": []}
            old_inv = old_sizes = old_clusters = None
            dfs_all = (
                inv_delta.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
                if cap is not None
                else None
            )
        else:
            m = self._manifest()
            old_inv = self._anti_tombstone(self._read(m["inv"]), m)
            old_sizes = self._read(m["sizes"])
            old_clusters = self._read([m["clusters"]])
            dfs_all = None
            if cap is not None:
                delta_df = inv_delta.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
                dfs_all = (
                    self._read([m["dfs"]])
                    .unionByName(delta_df)
                    .groupBy("h")
                    .agg(F.sum("df").alias("df"))
                )
            m["inv"] = m["inv"] + [inv_dir]
            m["sizes"] = m["sizes"] + [sizes_dir]

        if dfs_all is not None:
            dfs_all = dfs_all.persist(StorageLevel.MEMORY_AND_DISK)
        inv_d = self._cap_filter(inv_delta, dfs_all).persist(
            StorageLevel.MEMORY_AND_DISK
        )

        # candidate edges: delta×delta, plus delta×stored for an add.
        # The stored side is scanned once; the delta side is the small
        # probe (AQE broadcasts it under the threshold). Hot shingles
        # are bounded by df_cap when set; cap-free corpora rely on the
        # same df distribution argument as the batch operators.
        pair_rows = self._pair_rows(inv_d, inv_d, self_join=True)
        sizes_all = sizes_delta
        if not initial:
            pair_rows = pair_rows.unionByName(
                self._pair_rows(
                    inv_d, self._cap_filter(old_inv, dfs_all), self_join=False
                )
            )
            sizes_all = sizes_all.unionByName(old_sizes)
        edges = self._edges(pair_rows, sizes_all)

        # cluster-graph closure: endpoints → current labels (old docs:
        # stored cluster; delta docs: own id), CC over the label graph,
        # then one mapped rewrite of the slim clusters table.
        delta_lab = sizes_delta.select(
            F.col("id"), F.col("id").alias("lab")
        )  # sizes_delta covers every delta doc incl. shingle-less ones
        labels = (
            delta_lab
            if initial or old_clusters is None
            else old_clusters.select("id", F.col("cluster").alias("lab")).unionByName(
                delta_lab
            )
        )
        lab_edges = (
            edges.join(labels.withColumnRenamed("id", "id_a"), "id_a")
            .withColumnRenamed("lab", "lab_a")
            .join(
                labels.withColumnRenamed("id", "id_b").withColumnRenamed(
                    "lab", "lab_b"
                ),
                "id_b",
            )
            .filter(F.col("lab_a") != F.col("lab_b"))
            .select("lab_a", "lab_b")
            .distinct()
        )
        mapping = connected_components(lab_edges, src="lab_a", dst="lab_b").select(
            F.col("id").alias("lab"), F.col("comp").alias("new_lab")
        )
        clusters = labels.join(mapping, "lab", "left").select(
            "id", F.coalesce("new_lab", "lab").alias("cluster")
        )

        clusters_dir = f"clusters_v{vnew}"
        self._write(clusters, clusters_dir)
        m["clusters"] = clusters_dir
        if cap is not None:
            dfs_dir = f"dfs_v{vnew}"
            self._write(dfs_all, dfs_dir)
            m["dfs"] = dfs_dir
            dfs_all.unpersist(blocking=False)
        inv_d.unpersist(blocking=False)
        return self._commit(m)

    def remove(self, ids: DataFrame) -> int:
        """Tombstone documents: they leave `clusters()` and stop forming
        new edges. Existing clusters are NOT re-split (see module doc)."""
        m = self._manifest()
        vnew = self.version() + 1
        ids_dir = f"tombstones_v{vnew}"
        self._write(ids.select(F.col(self.id_col).alias("id")).distinct(), ids_dir)
        m["tombstones"] = m.get("tombstones", []) + [ids_dir]
        return self._commit(m)

    # ------------------------------------------------------------ reads

    def _anti_tombstone(self, df: DataFrame, m: dict) -> DataFrame:
        tds = m.get("tombstones", [])
        if not tds:
            return df
        return df.join(F.broadcast(self._read(tds)), "id", "left_anti")

    def clusters(self) -> DataFrame:
        """(id_col, cluster_id, is_canonical) for every live document.
        The canonical survivor is the min LIVE doc id of its cluster
        (== cluster_id when nothing was removed, matching the batch
        `dedup_clusters` exactly); after a removal the flag moves to the
        next-smallest live member while cluster_id stays a stable
        label. One window-min over the slim assignment table."""
        from pyspark.sql import Window

        m = self._manifest()
        out = self._anti_tombstone(self._read([m["clusters"]]), m)
        live_min = F.min("id").over(Window.partitionBy("cluster"))
        return out.select(
            F.col("id").alias(self.id_col),
            F.col("cluster").alias("cluster_id"),
            (F.col("id") == live_min).alias("is_canonical"),
        )
