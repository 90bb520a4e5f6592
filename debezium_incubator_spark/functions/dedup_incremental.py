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
purges documents from the clusters table and stops their already-
indexed rows from forming NEW edges (version-stamped tombstones: rows
in batches ≤ the remove's ``as_of`` are anti-joined away at candidate
time), but edges they already contributed persist, exactly like a
dedup service that never re-splits a cluster on member deletion. An
updated document is `remove()` then `add()` under the SAME id — the
re-add's rows land in a batch past the stamp and live normally.

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
                                          (maintained incrementally:
                                          df_cap + heavy-shingle salting)
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
        skew_df_threshold: int = 256,
        skew_salts: int = 16,
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
        # perf knobs, not semantics — excluded from the manifest check
        self.skew_df_threshold = skew_df_threshold
        self.skew_salts = skew_salts
        self._st = VersionedState(spark, path, self.params)

    # ------------------------------------------------------------ state io
    # (delegated to VersionedState — commit-then-pointer, see _state.py)

    def version(self) -> int:
        return self._st.version()

    def meta(self) -> dict:
        """The current manifest (read-only) — carries any ``extra_meta``
        a caller attached to its commits (e.g. a consumer's changelog
        position, see jobs/dedup_index_job.py)."""
        return self._st.manifest()

    def _manifest(self) -> dict:
        return self._st.manifest()

    def _commit(self, manifest: dict) -> int:
        return self._st.commit(manifest)

    def _read(self, dirs: list[str]) -> DataFrame:
        return self._st.read(dirs)

    def _write(self, df: DataFrame, rel: str) -> None:
        self._st.write(df, rel)

    # ------------------------------------------------------------ shingling

    def _delta_state(self, docs: DataFrame):
        """(id, h) exploded hashes + (id, n_sh) sizes for a batch — the
        only place raw text is touched. The shingle sets are PERSISTED
        (returned third, caller unpersists after the state writes):
        inv and sizes are written as two separate actions, and without
        the persist each would re-run the tokenize+zip_with pipeline
        (review r5-4 #5 — the module's 'shingled once' contract)."""
        from pyspark import StorageLevel

        sh = _shingle_sets(
            docs, self.id_col, self.text_col, self.params["shingle_n"]
        ).persist(StorageLevel.MEMORY_AND_DISK)
        inv = sh.select(
            "id",
            F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("h"),
        )
        sizes = sh.select("id", F.size("sh").alias("n_sh"))
        return inv, sizes, sh

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

    def _pair_rows(
        self,
        left_inv: DataFrame,
        right_inv: DataFrame,
        self_join: bool,
        heavy: DataFrame | None = None,
    ) -> DataFrame:
        """Ordered co-occurrence rows, one per shared shingle per pair.
        A self-join sees every unordered pair TWICE (a,b)+(b,a) → keep
        the `<` orientation only; a delta-vs-stored join sees it once
        with fixed sides (delta left) → order with least/greatest, else
        half the pairs (new id > old id) would be dropped.

        ``heavy`` is the (h) set of shingle hashes whose maintained df
        exceeds ``skew_df_threshold``: those take the salted join (left
        salted by hash(id), right replicated per salt) so one
        boilerplate shingle's df² fan-out spreads over ``skew_salts``
        tasks instead of one reducer — the same hot-key fix the batch
        operators carry (dedup_text._cooccurrence_counts; review
        r5-4 #6). Coverage is exact: each shared-h pair meets on
        exactly one salt (the left row's)."""

        def ordered(j):
            if self_join:
                return j.filter(F.col("a.id") < F.col("b.id")).select(
                    F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
                )
            return j.filter(F.col("a.id") != F.col("b.id")).select(
                F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
            )

        if heavy is None:
            return ordered(left_inv.alias("a").join(right_inv.alias("b"), "h"))
        hb = F.broadcast(heavy.select("h"))
        light = ordered(
            left_inv.join(hb, "h", "left_anti")
            .alias("a")
            .join(right_inv.join(hb, "h", "left_anti").alias("b"), "h")
        )
        salts = self.skew_salts
        sa = left_inv.join(hb, "h", "left_semi").withColumn(
            "__salt", F.pmod(F.xxhash64("id"), F.lit(salts)).cast("int")
        )
        sb = right_inv.join(hb, "h", "left_semi").withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
        )
        return light.unionByName(
            ordered(sa.alias("a").join(sb.alias("b"), ["h", "__salt"]))
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

    def build(self, docs: DataFrame, extra_meta: dict | None = None) -> int:
        """Index + cluster an initial corpus. Semantics == the batch
        `shingle_overlap_pairs`/`ngram_jaccard_pairs` → `dedup_clusters`
        composition (cap-free case exactly; see df_cap note)."""
        with self._st.mutate():
            if self.version() != 0:
                raise RuntimeError("build() on a non-empty index; use add()")
            return self._apply(docs, initial=True, extra_meta=extra_meta)

    def add(
        self,
        docs: DataFrame,
        strict: bool = True,
        extra_meta: dict | None = None,
    ) -> int:
        """Ingest a delta batch: new docs join existing clusters, and a
        delta doc similar to members of TWO old clusters merges them
        (cluster-graph transitive closure).

        Ids must be NEW (append-only contract — a changed document is
        remove() + add() under a fresh id). ``strict`` spends one scalar
        count to enforce that; pass False to skip the action when the
        caller guarantees it (e.g. monotone CDC offsets as ids)."""
        with self._st.mutate():
            if strict:
                m = self._manifest()
                dup = (
                    docs.select(F.col(self.id_col).alias("id"))
                    .join(self._read([m["clusters"]]), "id", "left_semi")
                    .count()
                )
                if dup:
                    raise ValueError(
                        f"add(): {dup} ids already indexed (append-only "
                        "contract; remove() first or use a fresh id)"
                    )
            return self._apply(docs, initial=False, extra_meta=extra_meta)

    def _apply(
        self, docs: DataFrame, initial: bool, extra_meta: dict | None = None
    ) -> int:
        from pyspark import StorageLevel

        vnew = self.version() + 1
        inv_dir = f"inv_batch_{vnew}"
        sizes_dir = f"sizes_batch_{vnew}"

        inv_delta, sizes_delta, sh = self._delta_state(docs)
        self._write(inv_delta, inv_dir)
        self._write(sizes_delta, sizes_dir)
        sh.unpersist(blocking=False)
        # re-read what was written: the delta pipeline runs once, and the
        # stored copy IS the long-term index — divergence impossible
        inv_delta = self._read([inv_dir])
        sizes_delta = self._read([sizes_dir])

        delta_df = inv_delta.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        if initial:
            m = {"inv": [inv_dir], "sizes": [sizes_dir], "tombstones": []}
            old_inv = old_sizes = old_clusters = None
            dfs_all = delta_df
        else:
            m = self._manifest()
            old_inv = self._stored(m["inv"], m)
            old_sizes = self._stored(m["sizes"], m)
            old_clusters = self._read([m["clusters"]])
            # df is maintained incrementally (sum of per-batch counts) —
            # one slim agg per add, never a re-scan of the stored index.
            # Removed docs keep their counts (df slightly overcounts
            # after removes — acceptable for a cap/skew heuristic).
            dfs_all = (
                self._read([m["dfs"]])
                .unionByName(delta_df)
                .groupBy("h")
                .agg(F.sum("df").alias("df"))
            )
            m["inv"] = m["inv"] + [inv_dir]
            m["sizes"] = m["sizes"] + [sizes_dir]

        dfs_all = dfs_all.persist(StorageLevel.MEMORY_AND_DISK)
        heavy = dfs_all.filter(F.col("df") > self.skew_df_threshold)
        # one scalar existence probe on the persisted slim df table: a
        # corpus with no hot shingles (the common case) keeps the plain
        # single-join plan — the salted split otherwise adds four
        # broadcast-(anti|semi) joins per add for nothing
        if heavy.limit(1).count() == 0:
            heavy = None
        inv_d = self._cap_filter(inv_delta, dfs_all).persist(
            StorageLevel.MEMORY_AND_DISK
        )

        # candidate edges: delta×delta, plus delta×stored for an add.
        # The stored side is scanned once; the delta side is the small
        # probe (AQE broadcasts it under the threshold). Hot shingles:
        # df_cap bounds them when set, and shingles over
        # skew_df_threshold take the salted join either way.
        pair_rows = self._pair_rows(inv_d, inv_d, self_join=True, heavy=heavy)
        sizes_all = sizes_delta
        if not initial:
            pair_rows = pair_rows.unionByName(
                self._pair_rows(
                    inv_d,
                    self._cap_filter(old_inv, dfs_all),
                    self_join=False,
                    heavy=heavy,
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
        dfs_dir = f"dfs_v{vnew}"
        self._write(dfs_all, dfs_dir)
        m["dfs"] = dfs_dir
        dfs_all.unpersist(blocking=False)
        inv_d.unpersist(blocking=False)
        if extra_meta:
            m.update(extra_meta)
        return self._commit(m)

    def apply_changes(
        self,
        changes: DataFrame,
        op_col: str = "op",
        extra_meta: dict | None = None,
    ) -> int:
        """Consume one CDC change batch — the literal bridge from the
        engine's change feed to the dedup layer. ``changes`` carries
        (id_col, text_col, op_col) rows with Debezium-style ops:
        'c' insert, 'u' update, 'd' delete (row images for 'd' may have
        NULL text). Updates take the remove-then-re-add flow (the old
        content's rows go edge-dead behind the as_of stamp; the new
        content indexes fresh), so after replaying any change sequence
        the live clusters reflect each document's CURRENT text — with
        the one documented asymmetry that merges contributed by
        superseded content persist (clusters never re-split).

        The batch should be LWW-deduplicated per key first (one row per
        id — exactly what `operators/dedup.lww_latest` emits). Returns
        the committed version (two commits: removes, then adds)."""
        live = changes.filter(F.col(op_col).isin("c", "u")).select(
            self.id_col, self.text_col
        )
        # empty batch fast path: skip the clusters scan and the probes
        # entirely (a table-filtered consumer sees many all-foreign
        # epochs — review r5-5 #4); just advance the stamp
        if changes.limit(1).count() == 0:
            if self.version() == 0:
                return 0
            if extra_meta:
                with self._st.mutate():
                    m = self._manifest()
                    m.update(extra_meta)
                    self._commit(m)
            return self.version()
        # pin before probing: the existence probes and the
        # remove()/add() writes re-evaluate these frames — a
        # nondeterministic ``changes`` source would diverge them
        # (review r5-4 #3 / r5-5 #5)
        live = live.localCheckpoint(eager=True)
        # any change row whose id is CURRENTLY indexed supersedes it —
        # not just 'u'/'d': a 'c' can legitimately hit an indexed id
        # (PK-update d+c re-creates, or replayed creates), and adding it
        # without the remove would duplicate its clusters row. The
        # semi-join against the slim clusters table also drops deletes
        # of never-indexed ids (their remove would be a no-op anyway).
        if self.version() > 0:
            indexed = (
                self._read([self._manifest()["clusters"]])
                .select(F.col("id").alias(self.id_col))
            )
            dead = (
                changes.select(self.id_col)
                .distinct()
                .join(indexed, self.id_col, "left_semi")
                .localCheckpoint(eager=True)
            )
        else:
            dead = live.select(self.id_col).limit(0)
        # one scalar count decides each leg; empty legs skip their
        # commit. ``extra_meta`` (e.g. the consumer's changelog
        # position) rides the LAST commit of the batch — never earlier —
        # so a crash mid-batch replays the WHOLE batch: the re-remove is
        # idempotent and the re-add's rows land past the new stamp
        # (commit-THEN-checkpoint, the engine's own invariant).
        has_dead = bool(dead.limit(1).count()) and self.version() > 0
        has_live = bool(live.limit(1).count())
        if not has_live and self.version() == 0:
            # nothing indexed yet and nothing to index: no manifest to
            # stamp — the caller replays this (no-op) batch next run
            return 0
        if has_dead:
            self.remove(dead, extra_meta=None if has_live else extra_meta)
        if has_live:
            # strict=False: updates were just tombstoned, creates are new
            # by the CDC contract (the engine's merge enforces key
            # uniqueness upstream)
            if self.version() == 0:
                self.build(live, extra_meta=extra_meta)
            else:
                self.add(live, strict=False, extra_meta=extra_meta)
        elif not has_dead and extra_meta:
            with self._st.mutate():
                m = self._manifest()
                m.update(extra_meta)
                self._commit(m)
        return self.version()

    def remove(self, ids: DataFrame, extra_meta: dict | None = None) -> int:
        """Remove documents: purged from the clusters table immediately,
        and their ALREADY-INDEXED rows stop forming new edges (the
        tombstone is stamped ``as_of`` the current version and suppresses
        only batches ≤ as_of). Existing clusters are NOT re-split (see
        module doc) — and a later `add()` of the SAME id is a legitimate
        re-add (the updated-document flow): its NEW rows land in a batch
        past the stamp and behave like any fresh document (review
        r5-4 #1/#2 — an id-only tombstone made re-adds invisible
        forever and the strict check contradicted its own advice)."""
        with self._st.mutate():
            m = self._manifest()
            vnew = self.version() + 1
            ids_dir = f"tombstones_v{vnew}"
            self._write(
                ids.select(F.col(self.id_col).alias("id"))
                .distinct()
                .withColumn("as_of", F.lit(self.version())),
                ids_dir,
            )
            # purge AND relabel: cluster labels are doc ids, and the
            # removed doc may BE its cluster's label — if the id is
            # later re-added with new content, a stale label would
            # spuriously merge its old cluster into its new one (caught
            # by test_readd_after_remove_uses_new_content). Relabeling
            # to the min surviving member keeps the invariant every
            # build/add maintains: label == min live member id.
            from pyspark.sql import Window

            kept = self._read([m["clusters"]]).join(
                F.broadcast(self._read([ids_dir]).select("id")),
                "id",
                "left_anti",
            )
            relabeled = kept.select(
                "id",
                F.min("id").over(Window.partitionBy("cluster")).alias("cluster"),
            )
            clusters_dir = f"clusters_v{vnew}"
            self._write(relabeled, clusters_dir)
            m["clusters"] = clusters_dir
            m["tombstones"] = m.get("tombstones", []) + [ids_dir]
            if extra_meta:
                m.update(extra_meta)
            return self._commit(m)

    def compact(self, recompute_dfs: bool = True) -> int:
        """Fold the per-batch inverted-index/size chains into ONE batch
        each, tombstones applied, and clear the tombstone list. Under
        sustained `apply_changes` every batch adds a per-dir scan plus a
        broadcast-anti join to every later add's stored-side read —
        unbounded read amplification; compaction restores a single scan
        per state table, the same CoW trade as `lake/table.py:compact`.
        Semantics are unchanged: `_stored` already computes exactly this
        net view, and the live rows all land in batch ``vnew`` — past
        every possible stamp — so dropping the tombstones loses nothing.

        ``recompute_dfs`` re-derives shingle document frequency from the
        compacted live index (one slim agg), discarding the overcount
        that removed documents leave in the incrementally-maintained
        table. With ``df_cap`` set this can re-enable a shingle whose
        LIVE frequency dropped back under the cap — the frequency now
        tracks the live corpus, which is the better heuristic; pass
        False to keep the monotone at-add-time counts.

        Old dirs stay on disk until `expire()` reclaims them."""
        with self._st.mutate():
            m = self._manifest()
            if (
                len(m["inv"]) <= 1
                and len(m["sizes"]) <= 1
                and not m.get("tombstones")
            ):
                return self.version()
            vnew = self.version() + 1
            inv_dir = f"inv_batch_{vnew}"
            sizes_dir = f"sizes_batch_{vnew}"
            self._write(self._stored(m["inv"], m), inv_dir)
            self._write(self._stored(m["sizes"], m), sizes_dir)
            m["inv"] = [inv_dir]
            m["sizes"] = [sizes_dir]
            m["tombstones"] = []
            if recompute_dfs:
                dfs_dir = f"dfs_v{vnew}"
                self._write(
                    self._read([inv_dir])
                    .groupBy("h")
                    .agg(F.count(F.lit(1)).alias("df")),
                    dfs_dir,
                )
                m["dfs"] = dfs_dir
            return self._commit(m)

    def expire(self, keep_last: int = 1) -> list[str]:
        """Reclaim dirs unreferenced by the ``keep_last`` newest
        versions (run after `compact()`). See `VersionedState.expire`."""
        return self._st.expire(keep_last)

    # ------------------------------------------------------------ reads

    def _stored(self, dirs: list[str], m: dict) -> DataFrame:
        """Union the per-batch state dirs, suppressing each removed id's
        rows ONLY in batches up to its tombstone's ``as_of`` stamp — a
        re-added id's newer batches stay live."""
        tds = m.get("tombstones", [])
        ts = self._read(tds) if tds else None
        parts = []
        for d in dirs:
            v = int(d.rsplit("_", 1)[1])
            p = self._read([d])
            if ts is not None:
                dead = ts.filter(F.col("as_of") >= v).select("id")
                p = p.join(F.broadcast(dead), "id", "left_anti")
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def metrics(self) -> dict:
        """Manifest-derived operator metrics — no Spark job. Duck-types
        the M1 contract `monitoring.MetricsServer` serves (see
        `IVFIndex.metrics`)."""
        b = self._st.metrics_base()
        if b["version"]:
            b["inv_batches"] = len(self._manifest()["inv"])
        return b

    def clusters(self, as_of: int | None = None) -> DataFrame:
        """(id_col, cluster_id, is_canonical) for every live document.
        The invariant ``cluster_id == min live member id`` holds at all
        times (build/add maintain it; remove() relabels), so the
        canonical survivor is simply the label-bearing doc — a pure
        projection, no shuffle. ``as_of`` reads a PAST version still on
        disk (anything `expire()` hasn't reclaimed) — pin the exact
        dedup state a dataset snapshot was built against."""
        m = self._st.manifest(as_of)
        out = self._read([m["clusters"]])  # removes purged+relabeled
        return out.select(
            F.col("id").alias(self.id_col),
            F.col("cluster").alias("cluster_id"),
            (F.col("cluster") == F.col("id")).alias("is_canonical"),
        )
