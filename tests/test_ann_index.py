"""IVFIndex: durable inverted-file ANN — one-shot equivalence to
ivf_topk, incremental append, partition-pruned search, tombstones."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.functions.ann_index import IVFIndex
from debezium_incubator_spark.functions.similarity import ivf_topk

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("init", ["hash_sample", "kmeans"])
def test_one_shot_build_matches_ivf_topk(spark, tmp_path, init):
    """A freshly-built index answers exactly like the one-shot operator
    (same centroid derivation, assignment tie-break, rerank order) —
    the storage/pruning layer adds no drift."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init=init)
    idx.build(emb)
    assert _rows(idx.search(queries, k=5)) == _rows(
        ivf_topk(emb, queries, k=5, init=init)
    )


def test_incremental_add_matches_frozen_centroid_recompute(spark, tmp_path):
    """build(70%)+add(30%) must equal an INDEPENDENT numpy recompute of
    IVF over the same frozen centroids (assignment argmax with the
    max-sim/max-cid tie-break, n_probe lists, exact rerank) — the
    storage path (partitioned lists across two batches) adds no drift."""
    import numpy as np

    emb = _emb(spark)
    n_probe, k = 4, 5
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample", n_probe=n_probe)
    idx.build(emb.filter(F.col("vec_id") % 10 < 7))
    idx.add(emb.filter(F.col("vec_id") % 10 >= 7))
    queries = emb.filter(F.col("vec_id") < 10)
    got = _rows(idx.search(queries, k=k))

    cents = sorted(
        ((r["cid"], np.array(r["vec"])) for r in idx.centroids().collect())
    )
    C = np.array([v / max(np.linalg.norm(v), 1e-12) for _, v in cents])
    rows = [(r["vec_id"], np.array(r["embedding"])) for r in emb.collect()]
    V = {i: v / max(np.linalg.norm(v), 1e-12) for i, v in rows}

    def assign(v):
        sims = np.round(C @ v, 9)
        best = max(range(len(sims)), key=lambda i: (sims[i], i))  # max sim, max cid
        return best

    cid_of = {i: assign(v) for i, v in V.items()}
    exp = []
    for qid, _ in rows:
        if qid >= 10:
            continue
        qv = V[qid]
        sims = np.round(C @ qv, 9)
        probe = sorted(range(len(sims)), key=lambda i: (-sims[i], -i))[:n_probe]
        cand = [
            (nid, float(np.dot(V[nid], qv)))
            for nid in V
            if nid != qid and cid_of[nid] in probe
        ]
        cand.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nid, s) in enumerate(cand[:k], 1):
            exp.append((qid, nid, rank, round(s, 4)))
    assert got == sorted(exp)


def test_search_prunes_unprobed_partitions(spark, tmp_path):
    emb = _emb(spark)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample")
    idx.build(emb)
    r = idx.search(emb.filter(F.col("vec_id") < 3), k=3, n_probe=2)
    plan = r._jdf.queryExecution().executedPlan().toString()
    import re

    # the lists scan must carry a static IN partition filter (cid#<id>
    # IN (...)) — and it must be selective: ≤ n_queries × n_probe cids
    m = re.search(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)", plan)
    assert m is not None, plan[:2000]
    assert len(m.group(1).split(",")) <= 6


def test_remove_and_guards(spark, tmp_path):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    p = str(tmp_path / "ix")
    idx = IVFIndex(spark, p, init="hash_sample")
    with pytest.raises(RuntimeError):
        idx.search(queries)  # no state
    idx.build(emb)
    with pytest.raises(RuntimeError):
        idx.build(emb)  # build on non-empty
    with pytest.raises(ValueError):
        idx.add(emb.limit(3))  # duplicate ids, strict default
    before = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in idx.search(queries, k=3).collect()}
    victim = next(iter(before.values()))
    idx.remove(emb.filter(F.col("vec_id") == victim).select("vec_id"))
    after = idx.search(queries, k=3)
    assert after.filter(F.col("neighbor_id") == victim).count() == 0
    with pytest.raises(ValueError):  # param mismatch vs stored manifest
        IVFIndex(spark, p, n_centroids=32)._st.manifest()


def test_readd_after_remove_updates_vector(spark, tmp_path):
    """Review r5-4 #1: remove() + add() under the same id replaces the
    vector — the new rows land past the tombstone's as_of stamp and
    must be searchable."""
    emb = _emb(spark)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample")
    idx.build(emb)
    victim = 42
    idx.remove(emb.filter(F.col("vec_id") == victim).select("vec_id"))
    # re-add id 42 with vec_id 0's embedding → it becomes 0's nearest
    newvec = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.lit(victim).cast("long").alias("vec_id"), "embedding")
    )
    idx.add(newvec)
    top = idx.search(emb.filter(F.col("vec_id") == 0), k=1).collect()
    assert top and top[0]["neighbor_id"] == victim and top[0]["sim"] >= 0.9999


def test_apply_changes_cdc_bridge(spark, tmp_path):
    """CDC replay into the vector index: insert, update (vector
    replaced against the frozen centroids), delete."""
    emb = _emb(spark)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample")
    idx.build(emb.filter(F.col("vec_id") >= 10))
    v0 = emb.filter(F.col("vec_id") == 10).first()["embedding"]
    changes = spark.createDataFrame(
        [(1000, v0, "c"),            # insert: a clone of vector 10
         (11, v0, "u"),              # update: 11 becomes a clone of 10 too
         (12, None, "d")],           # delete 12
        f"vec_id long, embedding array<double>, op string",
    )
    idx.apply_changes(changes)
    q = emb.filter(F.col("vec_id") == 10)
    top = {r["neighbor_id"] for r in idx.search(q, k=2).collect()}
    assert top == {1000, 11}  # the two clones rank first
    assert idx.search(q, k=50).filter(F.col("neighbor_id") == 12).count() == 0

    # a 'c' on an ALREADY-indexed id (delete+recreate LWW-collapsed to
    # the create) must supersede the old vector — without the tombstone
    # there would be two live rows for id 11 and search's dropDuplicates
    # would pick between the old clone-of-10 and the new clone-of-20
    # nondeterministically
    v20 = emb.filter(F.col("vec_id") == 20).first()["embedding"]
    idx.apply_changes(
        spark.createDataFrame(
            [(11, v20, "c")], "vec_id long, embedding array<double>, op string"
        )
    )
    live11 = idx._lists(idx._st.manifest()).filter(
        F.col("neighbor_id") == 11
    ).collect()
    assert len(live11) == 1 and live11[0]["c_vec"] == list(v20)
    top20 = idx.search(emb.filter(F.col("vec_id") == 20), k=1).first()
    assert top20["neighbor_id"] == 11 and top20["sim"] >= 0.9999


def test_compact_preserves_search_and_expire_reclaims(spark, tmp_path):
    """compact() folds every list batch + tombstone into ONE partitioned
    batch: search answers are unchanged, the scan is still partition-
    pruned, and expire() physically reclaims the superseded dirs while
    the frozen centroids survive."""
    import re

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    p = str(tmp_path / "ix")
    idx = IVFIndex(spark, p, init="hash_sample")
    idx.build(emb.filter(F.col("vec_id") % 3 == 0))
    idx.add(emb.filter(F.col("vec_id") % 3 == 1))
    idx.add(emb.filter(F.col("vec_id") % 3 == 2))
    idx.remove(emb.filter(F.col("vec_id") % 17 == 0).select("vec_id"))
    before = _rows(idx.search(queries, k=5))
    n_live = idx._lists(idx._st.manifest()).count()
    idx.compact()
    m = idx._st.manifest()
    assert len(m["lists"]) == 1 and m["tombstones"] == []
    assert sum(m["n_indexed"].values()) == n_live
    assert _rows(idx.search(queries, k=5)) == before
    r = idx.search(queries.limit(3), k=3, n_probe=2)
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cid#\d+ IN \(", plan), plan[:2000]

    removed = idx.expire(keep_last=1)
    assert "lists_batch_1" in removed and "centroids" not in removed
    assert not os.path.exists(os.path.join(p, "v1.json"))
    assert _rows(idx.search(queries, k=5)) == before

    # post-compact mutations: tombstone epochs restart cleanly — a
    # remove() + re-add under the same id still replaces the vector
    victim = int(before[0][1])
    idx.remove(emb.filter(F.col("vec_id") == victim).select("vec_id"))
    newvec = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.lit(victim).cast("long").alias("vec_id"), "embedding")
    )
    idx.add(newvec)
    top = idx.search(emb.filter(F.col("vec_id") == 0), k=1).collect()
    assert top and top[0]["neighbor_id"] == victim and top[0]["sim"] >= 0.9999


def test_compact_fully_emptied_index(spark, tmp_path):
    """Every row tombstoned → a partitioned zero-row write would land no
    files and break later reads; compact() must fall back to a schema-
    bearing empty batch and the index must accept vectors again."""
    emb = _emb(spark)
    small = emb.filter(F.col("vec_id") < 20)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample")
    idx.build(small)
    idx.remove(small.select("vec_id"))
    idx.compact()
    m = idx._st.manifest()
    assert len(m["lists"]) == 1 and m["tombstones"] == []
    q = emb.filter(F.col("vec_id") < 3)
    assert idx.search(q, k=3).count() == 0
    idx.add(emb.filter(F.col("vec_id").between(30, 49)))
    assert idx.search(q, k=3, n_probe=16).count() > 0


def test_apply_changes_bootstraps_empty_index_and_stamps_meta(spark, tmp_path):
    """The resumable-consumer contract (jobs/ann_index_job.py): the
    first live CDC batch of an EMPTY index trains the centroids;
    extra_meta rides the batch's last commit; delete-only and empty
    batches against an empty index commit nothing (replayed next run);
    a no-op batch against a live index still advances the stamp."""
    emb = _emb(spark)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample")
    only_d = emb.filter(F.col("vec_id") < 3).select(
        "vec_id", "embedding", F.lit("d").alias("op")
    )
    assert idx.apply_changes(only_d, extra_meta={"stream_pos": 5}) == 0
    assert idx.version() == 0

    creates = emb.filter(F.col("vec_id") < 40).select(
        "vec_id", "embedding", F.lit("c").alias("op")
    )
    idx.apply_changes(creates, extra_meta={"stream_pos": 10})
    assert idx.meta()["stream_pos"] == 10
    assert idx.search(emb.filter(F.col("vec_id") < 2), k=3).count() > 0

    idx.apply_changes(creates.limit(0), extra_meta={"stream_pos": 11})
    assert idx.meta()["stream_pos"] == 11


def test_apply_changes_zero_vector_is_a_delete(spark, tmp_path):
    """Review r5-5 #1: cosine against a zero vector is 0/0 = NaN and
    Spark sorts NaN above every double — one indexed zero vector would
    rank #1 in every search probing its list. An unembeddable 'c'/'u'
    (zero or NULL vector) must act as a delete: removed if indexed,
    never added otherwise."""
    import math

    emb = _emb(spark)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample")
    idx.build(emb.filter(F.col("vec_id") < 40))
    dim = len(emb.first()["embedding"])
    changes = spark.createDataFrame(
        [(7, [0.0] * dim, "u"),      # indexed id becomes unembeddable
         (5000, [0.0] * dim, "c"),   # new unembeddable id
         (6000, None, "c")],         # NULL vector
        "vec_id long, embedding array<double>, op string",
    )
    idx.apply_changes(changes)
    ids = {r["neighbor_id"] for r in idx.vectors().select("neighbor_id").collect()}
    assert 7 not in ids and 5000 not in ids and 6000 not in ids
    top = idx.search(emb.filter(F.col("vec_id") < 5), k=3).collect()
    assert top and all(not math.isnan(r["sim"]) for r in top)


def test_as_of_time_travel_search(spark, tmp_path):
    """search(as_of=v) answers from the historical list/tombstone state
    (centroids are frozen, so probing is version-invariant); a reclaimed
    version fails loudly."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    idx = IVFIndex(spark, str(tmp_path / "ix"), init="hash_sample")
    v1 = idx.build(emb.filter(F.col("vec_id") % 2 == 0))
    snap = _rows(idx.search(q, k=5))
    idx.add(emb.filter(F.col("vec_id") % 2 == 1))
    assert _rows(idx.search(q, k=5, as_of=v1)) == snap
    assert _rows(idx.search(q, k=5)) != snap
    idx.compact()
    idx.expire(keep_last=1)
    with pytest.raises(RuntimeError):
        idx.search(q, k=5, as_of=v1)


def test_retrain_matches_fresh_build_over_live_corpus(spark, tmp_path):
    """retrain() == a fresh build() over the live corpus under the same
    params (centroids re-trained, lists re-assigned, tombstones folded);
    past versions keep answering with their OWN centroid generation, and
    post-retrain appends assign against the new one."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    idx = IVFIndex(spark, str(tmp_path / "a"), init="hash_sample")
    idx.build(emb.filter(F.col("vec_id") % 3 == 0))
    idx.add(emb.filter(F.col("vec_id") % 3 == 1))
    idx.remove(emb.filter(F.col("vec_id") % 11 == 0).select("vec_id"))
    pre = _rows(idx.search(q, k=5))
    v_pre = idx.version()
    idx.retrain()

    live = emb.filter((F.col("vec_id") % 3 < 2) & (F.col("vec_id") % 11 != 0))
    fresh = IVFIndex(spark, str(tmp_path / "b"), init="hash_sample")
    fresh.build(live)
    assert _rows(idx.search(q, k=5)) == _rows(fresh.search(q, k=5))

    m = idx._st.manifest()
    assert m["lists"] == [f"lists_batch_{idx.version()}"]
    assert m["tombstones"] == [] and m["centroids"].startswith("centroids_v")
    assert _rows(idx.search(q, k=5, as_of=v_pre)) == pre

    idx.add(emb.filter(F.col("vec_id") % 3 == 2))
    fresh.add(emb.filter(F.col("vec_id") % 3 == 2))
    assert _rows(idx.search(q, k=5)) == _rows(fresh.search(q, k=5))
