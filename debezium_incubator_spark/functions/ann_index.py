"""Durable IVF (inverted-file) ANN index: build once, append deltas,
search without touching unprobed lists.

`similarity.ivf_topk` retrains centroids and re-assigns the corpus on
every call — right for a one-shot query, wrong for the ingest loop: at
100 TB you assign each embedding to its centroid ONCE, persist the
inverted lists, and let every later search read only the probed lists.
`IVFIndex` is that persistent form, the embedding-side sibling of
`dedup_incremental.IncrementalDedupIndex`:

* ``build(corpus)`` trains centroids (k-means over a bounded driver
  sample refining deterministic hash-sampled seeds — identical to
  `similarity._centroid_row`) and writes the corpus's inverted lists
  PARTITIONED BY centroid id.
* ``add(vectors)`` assigns only the delta to the FROZEN centroids and
  appends a new partitioned list batch — classic IVF append semantics
  (centroid drift is handled by rebuilding, not by moving old rows; the
  index records ``n_indexed`` per batch so an operator can see when the
  appended mass warrants a retrain).
* ``search(queries, k)`` computes each query's ``n_probe`` nearest
  centroids, collects the DISTINCT probed centroid ids to the driver (a
  bounded ≤ n_centroids scalar list — never corpus data), and pushes
  them as a partition filter: the parquet scan PRUNES every unprobed
  list directory (asserted in scripts/explain_audit.py). With 4096
  lists and n_probe=64 a search reads ~1.6% of the index.

Results match `similarity.ivf_topk` exactly when the index was built in
one shot (same centroid derivation, same max-sim/max-cid assignment
tie-break, same rerank ordering — proven in tests/test_ann_index.py);
an incrementally-grown index differs only in WHERE the centroids came
from (the build corpus), which is the standard IVF contract.

Durability: commit-then-pointer versioned manifests
(`functions/_state.py`), the same invariant as the lake and the dedup
index. `remove(ids)` tombstones vectors out of every later search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_incubator_spark.functions._state import VersionedState
from debezium_incubator_spark.functions.similarity import (
    _centroid_row,
    _centroid_sims,
    cosine_sim,
)


class IVFIndex:
    """State layout (under ``path``):
      ``centroids/``       (cid, vec)            frozen at build
      ``lists_batch_{n}/`` cid=*/ (neighbor_id, c_vec)  partitioned
      ``tombstones_v{n}/`` (neighbor_id, as_of)  version-stamped
      ``v{n}.json`` + ``_VERSION``               manifest + pointer
                                                 (+ per-batch n_indexed)
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int = 16,
        n_probe: int = 4,
        init: str = "kmeans",
        kmeans_iters: int = 5,
        sample_rows: int = 10_000,
    ):
        self.spark = spark
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_probe = n_probe
        self.params = {
            "n_centroids": n_centroids,
            "init": init,
            "kmeans_iters": kmeans_iters,
        }
        self._init = (init, kmeans_iters, sample_rows)
        self._st = VersionedState(spark, path, self.params)

    def version(self) -> int:
        return self._st.version()

    # ------------------------------------------------------------ write

    def build(self, corpus: DataFrame, extra_meta: dict | None = None) -> int:
        """Train centroids on ``corpus`` and index it."""
        with self._st.mutate():
            if self._st.version() != 0:
                raise RuntimeError("build() on a non-empty index; use add()")
            init, iters, sample = self._init
            cent = _centroid_row(
                corpus, self.id_col, self.vec_col,
                self.params["n_centroids"], init, iters, sample,
            )
            self._st.write(
                cent.select(F.explode("__cents").alias("c")).select("c.cid", "c.vec"),
                "centroids",
            )
            return self._append(
                corpus, {"lists": [], "tombstones": []}, extra_meta
            )

    def meta(self) -> dict:
        """The current manifest (read-only) — carries any ``extra_meta``
        a caller attached to its commits (e.g. a consumer's changelog
        position, see jobs/ann_index_job.py)."""
        return self._st.manifest()

    def add(
        self,
        vectors: DataFrame,
        strict: bool = True,
        extra_meta: dict | None = None,
    ) -> int:
        """Append a delta batch, assigned to the frozen centroids. Ids
        must be new OR previously removed — a re-add under the same id
        is the updated-vector flow (its rows land in a batch past the
        tombstone's as_of stamp, so they stay visible; review r5-4 #1).
        ``strict`` spends one count to check — column-pruned to ids,
        but it does read every list batch."""
        with self._st.mutate():
            m = self._st.manifest()
            if strict:
                dup = (
                    vectors.select(F.col(self.id_col).alias("neighbor_id"))
                    .join(
                        self._lists(m).select("neighbor_id"),
                        "neighbor_id",
                        "left_semi",
                    )
                    .count()
                )
                if dup:
                    raise ValueError(
                        f"add(): {dup} ids already indexed (append-only "
                        "contract; remove() first to replace a vector)"
                    )
            return self._append(vectors, m, extra_meta)

    def _append(
        self, vectors: DataFrame, manifest: dict, extra_meta: dict | None = None
    ) -> int:
        vnew = self._st.version() + 1
        rel = f"lists_batch_{vnew}"
        assigned = self._assign(vectors, manifest.get("centroids", "centroids"))
        self._st.write(assigned, rel, partition_by="cid")
        manifest["lists"] = manifest.get("lists", []) + [rel]
        # footer-only count of what was just written — the operator's
        # retrain signal (appended mass vs build mass, see module doc)
        manifest.setdefault("n_indexed", {})[rel] = self._st.read([rel]).count()
        if extra_meta:
            manifest.update(extra_meta)
        return self._st.commit(manifest)

    def apply_changes(
        self,
        changes: DataFrame,
        op_col: str = "op",
        extra_meta: dict | None = None,
    ) -> int:
        """Consume one CDC change batch of embeddings — (id_col,
        vec_col, op_col) rows with Debezium-style ops: 'c' insert,
        'u' update (remove-then-re-add against the frozen centroids),
        'd' delete. The batch should be LWW-deduplicated per key first.
        Same contract as `IncrementalDedupIndex.apply_changes`,
        including the bootstrap: the first live batch of an EMPTY index
        trains the centroids (build), later batches append against them.
        ``extra_meta`` (e.g. a consumer's changelog position) rides the
        LAST commit of the batch — a crash mid-batch replays the whole
        batch (the re-remove is idempotent, the re-add lands past the
        fresh tombstone stamp).

        Zero-norm / NULL vectors are UNINDEXABLE: cosine against them is
        0/0 = NaN, and Spark sorts NaN above every double, so one such
        row would rank #1 in every search probing its list (review
        r5-5 #1). A 'c'/'u' carrying one is treated as a delete — the
        id is removed if indexed and never added (a later change with a
        real vector re-adds it). Direct add()/build() keep the strict
        contract: garbage in, garbage out — this guard is the CDC
        bridge's."""
        valid = F.coalesce(
            F.exists(F.col(self.vec_col), lambda x: x != 0), F.lit(False)
        )
        live = changes.filter(F.col(op_col).isin("c", "u") & valid).select(
            self.id_col, self.vec_col
        )
        # empty batch fast path: never touch the index (the dead-probe
        # below scans every list batch — review r5-5 #4); just advance
        # the stamp so a restart skips the covered epochs
        if changes.limit(1).count() == 0:
            if self.version() == 0:
                return 0
            if extra_meta:
                with self._st.mutate():
                    m = self._st.manifest()
                    m.update(extra_meta)
                    self._st.commit(m)
            return self.version()
        # any change-row id that is CURRENTLY indexed supersedes its old
        # vector — not just 'u'/'d': a 'c' legitimately hits an indexed
        # id (delete+recreate LWW-collapsed to the 'c'), and adding it
        # without the tombstone leaves TWO live rows for the id, which
        # search's dropDuplicates then picks between nondeterministically.
        # The semi-join (id column only — pruned scan) also bounds the
        # tombstone table to ids that were actually indexed. Join
        # direction matters at scale: the CHANGE-ID set is the small
        # side, so broadcast it and keep the index scan shuffle-free —
        # the reverse orientation would shuffle (or try to broadcast)
        # the full index id column per CDC batch.
        # pin both sides before probing: the existence probes below and
        # the remove()/add() writes re-evaluate these frames, and a
        # nondeterministic ``changes`` source would let the probe and
        # the write diverge (the search-probe trap, review r5-4 #3 /
        # r5-5 #5). live also carries the (possibly expensive) vector
        # derivation — pinning runs it once for probe AND append.
        live = live.localCheckpoint(eager=True)
        has_dead = False
        dead = None
        if self.version() > 0:
            indexed = (
                self._lists(self._st.manifest())
                .select(F.col("neighbor_id").alias(self.id_col))
            )
            dead = indexed.join(
                F.broadcast(changes.select(self.id_col).distinct()),
                self.id_col,
                "left_semi",
            ).localCheckpoint(eager=True)
            has_dead = bool(dead.limit(1).count())
        has_live = bool(live.limit(1).count())
        if not has_live and self.version() == 0:
            # nothing indexed yet and nothing to index: no manifest to
            # stamp — the caller replays this (no-op) batch next run
            return 0
        if has_dead:
            self.remove(dead, extra_meta=None if has_live else extra_meta)
        if has_live:
            if self.version() == 0:
                self.build(live, extra_meta=extra_meta)
            else:
                self.add(live, strict=False, extra_meta=extra_meta)
        elif not has_dead and extra_meta:
            with self._st.mutate():
                m = self._st.manifest()
                m.update(extra_meta)
                self._st.commit(m)
        return self.version()

    def compact(self) -> int:
        """Rewrite the NET live rows into one cid-partitioned list batch
        and clear the tombstone chain. Under sustained `apply_changes`
        every batch adds one more per-dir scan plus a broadcast-anti
        tombstone join to every later search — unbounded read
        amplification; compaction restores the single-root layout (one
        partitioned read, native pruning, zero anti-joins) at the cost
        of one full index rewrite, the same CoW trade as
        `lake/table.py:compact`. ``repartition("cid")`` bounds output
        files to ~one per inverted list regardless of how many appends
        fed it. Resets the per-batch ``n_indexed`` retrain signal
        (appended-mass-vs-build-mass) — consult it BEFORE compacting.
        Old dirs stay on disk until `expire()` reclaims them."""
        with self._st.mutate():
            m = self._st.manifest()
            if len(m["lists"]) <= 1 and not m.get("tombstones"):
                return self._st.version()
            vnew = self._st.version() + 1
            rel = f"lists_batch_{vnew}"
            live = self._lists(m)
            self._st.write(live.repartition("cid"), rel, partition_by="cid")
            # fully-emptied index (every row tombstoned): a PARTITIONED
            # zero-row write lands no files and a later read fails schema
            # inference — fall back to a schema-bearing non-partitioned
            # empty batch (cid rides as a data column; searches of an
            # empty index stay correct, pruning is moot). Driver-side
            # file probe, no extra Spark job.
            import os as _os

            d = _os.path.join(self._st.path, rel)
            if not any(
                f.endswith(".parquet") for _, _, fs in _os.walk(d) for f in fs
            ):
                self._st.write(live.limit(0), rel)
            m["lists"] = [rel]
            m["tombstones"] = []
            m["n_indexed"] = {rel: self._st.read([rel]).count()}
            return self._st.commit(m)

    def retrain(self) -> int:
        """Re-train centroids on the LIVE corpus and re-index it — the
        operation behind the ``n_indexed`` drift signal (the module doc's
        'centroid drift is handled by rebuilding'). Equivalent to a
        fresh `build()` over `vectors()` under the same params (proven
        in tests), folded into one crash-safe commit: the new centroid
        generation gets its OWN versioned dir named by the manifest, so
        the pointer swing atomically pairs lists with the centroids they
        were assigned to — past versions (as_of) keep probing with
        theirs, and a crash mid-retrain leaves the old pairing intact.
        Subsumes `compact()` (one net batch, tombstones applied);
        consumer stamps (stream_pos etc.) are preserved."""
        from pyspark import StorageLevel

        with self._st.mutate():
            m = self._st.manifest()
            vnew = self._st.version() + 1
            live = (
                self._lists(m)
                .select(
                    F.col("neighbor_id").alias(self.id_col),
                    F.col("c_vec").alias(self.vec_col),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                n = live.count()
                if n == 0:
                    raise RuntimeError(
                        "retrain() on a fully-emptied index: no corpus to "
                        "train on (remove()/apply_changes drained it)"
                    )
                init, iters, sample = self._init
                cent = _centroid_row(
                    live, self.id_col, self.vec_col,
                    self.params["n_centroids"], init, iters, sample,
                )
                cent_rel = f"centroids_v{vnew}"
                self._st.write(
                    cent.select(F.explode("__cents").alias("c")).select(
                        "c.cid", "c.vec"
                    ),
                    cent_rel,
                )
                rel = f"lists_batch_{vnew}"
                self._st.write(
                    self._assign(live, cent_rel).repartition("cid"),
                    rel,
                    partition_by="cid",
                )
            finally:
                live.unpersist(blocking=False)
            m["lists"] = [rel]
            m["tombstones"] = []
            m["centroids"] = cent_rel
            m["n_indexed"] = {rel: n}
            return self._st.commit(m)

    def expire(self, keep_last: int = 1) -> list[str]:
        """Reclaim dirs unreferenced by the ``keep_last`` newest
        versions (run after `compact()`/`retrain()`); the build-time
        ``centroids`` dir is always kept (pre-retrain manifests name it
        implicitly), while retrained ``centroids_v{n}`` dirs live and
        die with the manifests that reference them. See
        `VersionedState.expire`."""
        return self._st.expire(keep_last, protect=("centroids",))

    def remove(self, ids: DataFrame, extra_meta: dict | None = None) -> int:
        """Tombstone vectors out of every later search. The stamp
        suppresses only list batches ≤ the current version, so a later
        add() of the same id (vector update) stays visible."""
        with self._st.mutate():
            m = self._st.manifest()
            vnew = self._st.version() + 1
            rel = f"tombstones_v{vnew}"
            self._st.write(
                ids.select(F.col(self.id_col).alias("neighbor_id"))
                .distinct()
                .withColumn("as_of", F.lit(self._st.version())),
                rel,
            )
            m["tombstones"] = m.get("tombstones", []) + [rel]
            if extra_meta:
                m.update(extra_meta)
            return self._st.commit(m)

    # ------------------------------------------------------------ read

    def _centroid_broadcast(self, cent_rel: str = "centroids") -> DataFrame:
        cdf = self._st.read([cent_rel])
        return F.broadcast(
            cdf.agg(
                F.collect_list(
                    F.struct(F.col("cid"), F.col("vec"))
                ).alias("__cents")
            )
        )

    def _assign(self, vectors: DataFrame, cent_rel: str = "centroids") -> DataFrame:
        """(neighbor_id, c_vec, cid): argmax-centroid assignment with the
        exact `ivf_topk` tie-break (max sim, then max cid)."""
        c = vectors.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).cast("array<double>").alias("c_vec"),
        )
        return (
            c.crossJoin(self._centroid_broadcast(cent_rel))
            .withColumn(
                "cid",
                F.array_max(_centroid_sims(F.col("c_vec"), F.col("__cents")))["cid"],
            )
            .drop("__cents")
        )

    def _lists(self, manifest: dict) -> DataFrame:
        # each batch dir is its own cid-partitioned tree — Spark refuses
        # a single multi-root partitioned read, so union per-dir scans
        # (partition pruning applies to each scan independently). A
        # tombstone suppresses a vector only in batches ≤ its as_of
        # stamp: a re-added id's newer batch stays live.
        tds = manifest.get("tombstones", [])
        ts = self._st.read(tds) if tds else None
        parts = []
        for d in manifest["lists"]:
            v = int(d.rsplit("_", 1)[1])
            p = self._st.read([d])
            if ts is not None:
                dead = ts.filter(F.col("as_of") >= v).select("neighbor_id")
                p = p.join(F.broadcast(dead), "neighbor_id", "left_anti")
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def centroids(self, as_of: int | None = None) -> DataFrame:
        m = self._st.manifest(as_of)
        return self._st.read([m.get("centroids", "centroids")])

    def metrics(self) -> dict:
        """Manifest-derived operator metrics — no Spark job. Duck-types
        the M1 contract `monitoring.MetricsServer` serves: point a
        server at a long-running index consumer with
        ``MetricsServer(index).start()`` (/metrics + /health)."""
        b = self._st.metrics_base()
        if b["version"]:
            m = self._st.manifest()
            b["list_batches"] = len(m["lists"])
            b["n_indexed"] = sum(m.get("n_indexed", {}).values())
        return b

    def vectors(self, as_of: int | None = None) -> DataFrame:
        """Every LIVE indexed vector: (neighbor_id, c_vec, cid) with
        tombstones applied — the net state `search` candidates come
        from, and what `compact()` materializes. ``as_of`` reads a past
        version still on disk (time-travel; see `search`)."""
        return self._lists(self._st.manifest(as_of))

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int | None = None,
        as_of: int | None = None,
    ) -> DataFrame:
        """(query_id, neighbor_id, rank, sim) top-k per query — the same
        output contract as `similarity.ivf_topk`. Reads ONLY the probed
        list partitions (driver collects the bounded distinct-cid set
        and pushes it as a partition filter). ``as_of`` answers from a
        PAST version still on disk (anything `expire()` hasn't
        reclaimed) — pin the exact index state a dataset was built
        against; each version probes with ITS OWN centroid generation
        (the manifest names the centroid dir, so reads across a
        retrain() stay consistent)."""
        from pyspark.sql.window import Window

        m = self._st.manifest(as_of)
        n_probe = self.n_probe if n_probe is None else n_probe
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).cast("array<double>").alias("q_vec"),
        )
        probes = (
            q.crossJoin(self._centroid_broadcast(m.get("centroids", "centroids")))
            .withColumn(
                "cid",
                F.explode(
                    F.transform(
                        F.slice(
                            F.reverse(
                                F.array_sort(
                                    _centroid_sims(F.col("q_vec"), F.col("__cents"))
                                )
                            ),
                            1,
                            n_probe,
                        ),
                        lambda s: s["cid"],
                    )
                ),
            )
            .drop("__cents")
        )
        # materialize probes ONCE: the collect below and the lists join
        # are two separate actions — without this the query-side pipeline
        # would run twice, and a nondeterministic queries DataFrame could
        # probe a cid missing from the collected partition filter,
        # silently dropping candidates (review r5-4 #3)
        probes = probes.localCheckpoint(eager=True)
        # bounded driver collect: ≤ n_centroids ints, never vector data —
        # this is what turns the scan into a partition-pruned read
        probed_cids = [
            r["cid"] for r in probes.select("cid").distinct().collect()
        ]
        lists = self._lists(m).filter(F.col("cid").isin(probed_cids))
        cands = (
            lists.join(probes, "cid")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
            .withColumn("sim", cosine_sim(F.col("q_vec"), F.col("c_vec")))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
        )
