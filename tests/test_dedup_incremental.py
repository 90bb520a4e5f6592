"""IncrementalDedupIndex: build/add/remove equivalence to the batch
dedup path, cluster-graph merges, and the durable-state contract."""

import json
import os

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.functions.dedup_incremental import IncrementalDedupIndex
from debezium_incubator_spark.functions.dedup_text import (
    ngram_jaccard_pairs,
    shingle_overlap_pairs,
)
from debezium_incubator_spark.functions.graph import dedup_clusters

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _batch_overlap(docs, k):
    pairs = shingle_overlap_pairs(docs, min_overlap=k, df_cap=None)
    return dedup_clusters(docs, pairs)


def test_build_matches_batch(spark, tmp_path):
    docs = _docs(spark)
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=3)
    idx.build(docs)
    assert _rows(idx.clusters()) == _rows(_batch_overlap(docs, 3))


def test_incremental_matches_batch(spark, tmp_path):
    """The headline contract: build(70%) + add(20%) + add(10%) over an
    id-hash split equals one batch dedup of the full corpus — every
    cross-split edge is recovered by the delta-vs-stored join and every
    transitive merge by the cluster-graph closure."""
    docs = _docs(spark)
    part = F.pmod(F.xxhash64("doc_id", F.lit("incsplit")), F.lit(10))
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=3)
    idx.build(docs.filter(part < 7))
    idx.add(docs.filter(part.isin(7, 8)))
    idx.add(docs.filter(part == 9))
    assert _rows(idx.clusters()) == _rows(_batch_overlap(docs, 3))
    assert idx.version() == 3


def test_threshold_mode_matches_batch(spark, tmp_path):
    docs = _docs(spark)
    part = F.pmod(F.xxhash64("doc_id", F.lit("jacsplit")), F.lit(4))
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), threshold=0.7)
    idx.build(docs.filter(part < 3))
    idx.add(docs.filter(part == 3))
    pairs = ngram_jaccard_pairs(docs, threshold=0.7, df_cap=None)
    assert _rows(idx.clusters()) == _rows(dedup_clusters(docs, pairs))


def test_bridging_doc_merges_old_clusters(spark, tmp_path):
    """A delta doc similar to members of TWO pre-existing clusters must
    merge them transitively — the mutation that skips the cluster-graph
    closure (assigning the new doc to just one old cluster) fails here."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = (1, "alpha beta gamma delta epsilon zeta")
    c = (3, "eta theta iota kappa lambda mu")
    b = (2, "gamma delta epsilon zeta eta theta iota kappa")  # overlaps BOTH
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=2)
    idx.build(mk([a, c]))
    before = {r["doc_id"]: r["cluster_id"] for r in idx.clusters().collect()}
    assert before[1] != before[3]  # two singleton clusters
    idx.add(mk([b]))
    after = {r["doc_id"]: r["cluster_id"] for r in idx.clusters().collect()}
    assert after[1] == after[2] == after[3] == 1


def test_remove_moves_canonical_and_stops_edges(spark, tmp_path):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=2)
    idx.build(
        mk(
            [
                (1, "one two three four five six"),
                (2, "one two three four five six seven"),
                (7, "unrelated words entirely different content here"),
            ]
        )
    )
    idx.remove(mk([(1, "")]).select("doc_id"))
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in idx.clusters().collect()}
    assert 1 not in out
    # remove() relabels to the min SURVIVING member (a stale dead-id
    # label would collide with a future re-add of that id)
    assert out[2] == (2, True)
    assert out[7] == (7, True)
    # the tombstoned doc's index rows make no NEW edges
    idx.add(mk([(9, "one two three four five six")]))
    out2 = {r["doc_id"]: r["cluster_id"] for r in idx.clusters().collect()}
    assert out2[9] == 2  # still joins via doc 2's rows (relabeled cluster)
    idx2 = IncrementalDedupIndex(spark, str(tmp_path / "ix2"), min_overlap=2)
    idx2.build(mk([(1, "one two three four five six")]))
    idx2.remove(mk([(1, "")]).select("doc_id"))
    idx2.add(mk([(9, "one two three four five six")]))
    out3 = {r["doc_id"]: r["cluster_id"] for r in idx2.clusters().collect()}
    assert out3 == {9: 9}  # sole similar doc was tombstoned → singleton


def test_contract_guards(spark, tmp_path):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "ix")
    with pytest.raises(ValueError):
        IncrementalDedupIndex(spark, p)  # neither criterion
    with pytest.raises(ValueError):
        IncrementalDedupIndex(spark, p, min_overlap=2, threshold=0.5)  # both
    idx = IncrementalDedupIndex(spark, p, min_overlap=2)
    with pytest.raises(RuntimeError):
        idx.clusters()  # no committed state
    idx.build(mk([(1, "a b c d"), (2, "a b c d e")]))
    with pytest.raises(RuntimeError):
        idx.build(mk([(3, "x")]))  # build on non-empty
    with pytest.raises(ValueError):
        idx.add(mk([(2, "changed text")]))  # duplicate id, strict default
    with pytest.raises(ValueError):  # param mismatch vs stored manifest
        IncrementalDedupIndex(spark, p, min_overlap=3)._manifest()


def test_crash_leaves_previous_version_readable(spark, tmp_path):
    """Commit-then-pointer: state dirs written by a failed add are
    unreferenced; the previous version stays fully readable."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "ix")
    idx = IncrementalDedupIndex(spark, p, min_overlap=2)
    idx.build(mk([(1, "a b c d"), (2, "a b c d e")]))
    before = _rows(idx.clusters())
    # simulate a crash mid-add: orphan state dirs exist, pointer untouched
    os.makedirs(os.path.join(p, "inv_batch_2"), exist_ok=True)
    with open(os.path.join(p, "inv_batch_2", "junk"), "w") as f:
        f.write("partial write")
    assert idx.version() == 1
    assert _rows(idx.clusters()) == before
    with open(os.path.join(p, "v1.json")) as f:
        m = json.load(f)
    assert "inv_batch_2" not in m["inv"]
    idx.add(mk([(3, "a b c d e f")]))  # the retry simply takes version 2
    assert idx.version() == 2
    assert {r["doc_id"] for r in idx.clusters().collect()} == {1, 2, 3}


def test_readd_after_remove_uses_new_content(spark, tmp_path):
    """Review r5-4 #1/#2: remove() then add() under the SAME id is the
    updated-document flow — the re-add must be visible, cluster by its
    NEW text, and the OLD text's index rows must stay edge-dead."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=2)
    idx.build(
        mk(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "alpha beta gamma delta epsilon zeta"),
                (7, "totally different words in this one"),
            ]
        )
    )
    idx.remove(mk([(1, "")]).select("doc_id"))
    # re-add doc 1 with text similar to doc 7 now, not doc 2
    idx.add(mk([(1, "totally different words in this here")]))
    out = {r["doc_id"]: r["cluster_id"] for r in idx.clusters().collect()}
    assert out[1] == out[7] == 1  # clusters by NEW text (min id = 1)
    # doc 2 must NOT be linked to the re-added doc 1: the OLD text's
    # rows are edge-dead AND remove() relabeled doc 2's cluster off the
    # dead id (a stale label 1 would have spuriously merged 2 with 7)
    assert out[2] == 2


def test_concurrent_mutation_raises(spark, tmp_path):
    from debezium_incubator_spark.lake.table import ConcurrentWriteError

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=2)
    idx.build(mk([(1, "a b c d"), (2, "a b c d e")]))
    with idx._st.mutate():
        with pytest.raises(ConcurrentWriteError):
            idx.add(mk([(3, "a b c d e f")]))
    idx.add(mk([(3, "a b c d e f")]))  # lock released → fine
    assert idx.version() == 2  # build + add; the blocked add committed nothing


def test_salted_heavy_path_matches_batch(spark, tmp_path):
    """skew_df_threshold=1 routes EVERY shingle through the salted join;
    the result must be identical to the batch closure."""
    docs = _docs(spark)
    part = F.pmod(F.xxhash64("doc_id", F.lit("saltsplit")), F.lit(4))
    idx = IncrementalDedupIndex(
        spark, str(tmp_path / "ix"), min_overlap=3, skew_df_threshold=1, skew_salts=4
    )
    idx.build(docs.filter(part < 3))
    idx.add(docs.filter(part == 3))
    assert _rows(idx.clusters()) == _rows(_batch_overlap(docs, 3))


def test_apply_changes_cdc_bridge(spark, tmp_path):
    """Replay a CDC change sequence through apply_changes: inserts
    cluster, an update re-clusters by the NEW text, a delete drops the
    doc — live clusters reflect current text (old-content merges are
    the documented never-resplit exception, exercised separately)."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string, op string")
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=2)
    idx.build(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (5, "mu nu xi omicron pi")],
            "doc_id long, text string",
        )
    )
    # batch 1: insert doc 2 near doc 1; insert doc 9 near doc 5
    idx.apply_changes(
        mk([(2, "alpha beta gamma delta epsilon", "c"),
            (9, "mu nu xi omicron pi rho", "c")])
    )
    out = {r["doc_id"]: r["cluster_id"] for r in idx.clusters().collect()}
    assert out == {1: 1, 2: 1, 5: 5, 9: 5}
    # batch 2: doc 9 rewritten to match doc 1's family; doc 5 deleted
    idx.apply_changes(
        mk([(9, "alpha beta gamma delta zeta", "u"),
            (5, None, "d")])
    )
    out = {r["doc_id"]: r["cluster_id"] for r in idx.clusters().collect()}
    assert 5 not in out
    assert out[9] == 1 and out[1] == 1 and out[2] == 1  # re-clustered by new text
    # batch 3: a 'c' hitting an ALREADY-indexed id (PK-recreate /
    # replayed create) must supersede, never duplicate the cluster row
    idx.apply_changes(mk([(2, "entirely new unrelated text here now", "c")]))
    rows = idx.clusters().collect()
    assert len(rows) == len({r["doc_id"] for r in rows})  # no dup rows
    out = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert out == {1: 1, 9: 1, 2: 2}  # doc 2 re-clustered alone by new text


def test_compact_preserves_state_and_future_adds(spark, tmp_path):
    """compact() folds the inv/size batch chains with tombstones
    applied: clusters are unchanged, a subsequent add over the compacted
    index produces EXACTLY what an uncompacted twin produces, and
    expire() reclaims the superseded dirs from disk."""
    docs = _docs(spark)
    part = F.pmod(F.xxhash64("doc_id", F.lit("cmpsplit")), F.lit(10))
    dead = docs.filter((part == 6) & (F.col("doc_id") % 3 == 0)).select("doc_id")
    a = IncrementalDedupIndex(spark, str(tmp_path / "a"), min_overlap=3)
    b = IncrementalDedupIndex(spark, str(tmp_path / "b"), min_overlap=3)
    for ix in (a, b):
        ix.build(docs.filter(part < 6))
        ix.add(docs.filter(part.isin(6, 7)))
        ix.remove(dead)
    a.compact()
    m = a._manifest()
    assert len(m["inv"]) == 1 and len(m["sizes"]) == 1 and m["tombstones"] == []
    assert _rows(a.clusters()) == _rows(b.clusters())
    removed = a.expire(keep_last=1)
    assert any(d.startswith("inv_batch_") for d in removed)
    # review r5-5 #2: a LOOSER re-run must skip the already-reclaimed
    # manifests (keep_last raised with no commits in between), not crash
    assert a.expire(keep_last=3) == []
    for ix in (a, b):
        ix.add(docs.filter(part > 7))
    assert _rows(a.clusters()) == _rows(b.clusters())


def test_compact_then_readd_uses_new_content(spark, tmp_path):
    """After compaction a removed doc's rows are physically gone (not
    just stamp-suppressed); a re-add under the same id forms edges from
    the NEW content only."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=3)
    idx.build(
        mk(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon zeta eta"),
                (3, "one two three four five six"),
            ]
        )
    )
    idx.remove(mk([(2, "")]).select("doc_id"))
    idx.compact()
    idx.add(mk([(2, "one two three four five six seven")]))
    got = {r["doc_id"]: r["cluster_id"] for r in idx.clusters().collect()}
    assert got[2] == got[3] == 2 and got[1] == 1


def test_as_of_time_travel_reads(spark, tmp_path):
    """Any version expire() hasn't reclaimed stays queryable: clusters
    (as_of=v) reproduces the exact historical assignment — pin the dedup
    state a dataset snapshot was built against. Reclaimed or future
    versions fail loudly."""
    docs = _docs(spark)
    part = F.pmod(F.xxhash64("doc_id", F.lit("asof")), F.lit(4))
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=3)
    v1 = idx.build(docs.filter(part < 3))
    snap = _rows(idx.clusters())
    idx.add(docs.filter(part == 3))
    assert _rows(idx.clusters(as_of=v1)) == snap
    assert _rows(idx.clusters()) != snap  # the corpus really grew
    with pytest.raises(RuntimeError):
        idx.clusters(as_of=99)
    idx.expire(keep_last=1)
    with pytest.raises(RuntimeError):
        idx.clusters(as_of=v1)  # reclaimed
