"""Streaming maintenance of the durable indexes: changelog readStream →
foreachBatch → apply_changes, exactly-once via the manifest stream_pos
filter (no trust in the stream checkpoint)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.functions.ann_index import IVFIndex
from debezium_incubator_spark.functions.dedup_incremental import IncrementalDedupIndex
from debezium_incubator_spark.streaming.index_sink import (
    StreamingIndexMaintenance,
    lww_document_changes,
    lww_embedding_changes,
)


@pytest.fixture(scope="module")
def changelog_parts(spark, tmp_path_factory):
    from debezium_incubator_spark.sources.generator import gen_changelog

    d = tmp_path_factory.mktemp("sinkdata")
    log = gen_changelog(spark, n_keys=60, n_repos=4, n_slots=150).persist()
    mid = 300
    log.filter(F.col("offset") <= mid).coalesce(2).write.parquet(str(d / "p1"))
    log.filter(F.col("offset") > mid).coalesce(2).write.parquet(str(d / "p2"))
    log.unpersist()
    return d


_CLOCK = [1_700_000_000]


def _stage(src, dst):
    """Copy part files with strictly increasing mtimes in name order —
    the file source sorts deliveries by timestamp, and generator part
    files cover contiguous offset ranges in name order, so this stages
    an offset-ordered delivery (what a real segment feed provides)."""
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(f"{src}/{f}", f"{dst}/{f}")
            _CLOCK[0] += 10
            os.utime(f"{dst}/{f}", (_CLOCK[0], _CLOCK[0]))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_dedup_sink_resumes_and_filters_replay(
    spark, changelog_parts, tmp_path
):
    """Two stream runs over a growing directory == two direct
    apply_changes batches (same boundaries); a redelivery from a WIPED
    stream checkpoint and a late STALE-image file are both cut down by
    the manifest stream_pos filter — no state version moves, no stale
    content lands."""
    d = changelog_parts
    cl = str(tmp_path / "cl")
    ix = str(tmp_path / "ix")

    sink = StreamingIndexMaintenance(
        IncrementalDedupIndex(spark, ix, min_overlap=3),
        cl,
        str(tmp_path / "ck"),
        prepare=lww_document_changes,
        max_files_per_trigger=1000,  # one micro-batch per run → twin parity
    )
    _stage(str(d / "p1"), cl)
    sink.start(spark, available_now=True).awaitTermination(120)
    pos1 = sink.index.meta()["stream_pos"]
    _stage(str(d / "p2"), cl)
    sink.start(spark, available_now=True).awaitTermination(120)

    # twin: the SAME two portions through direct apply_changes
    twin = IncrementalDedupIndex(spark, str(tmp_path / "twin"), min_overlap=3)
    for part in ("p1", "p2"):
        twin.apply_changes(lww_document_changes(spark.read.parquet(str(d / part))))
    assert _rows(sink.index.clusters()) == _rows(twin.clusters())
    pos2 = sink.index.meta()["stream_pos"]
    assert pos2 > pos1

    # full redelivery: wipe the STREAM checkpoint so Spark re-sends
    # every file — the manifest filter must make it a no-op
    v = sink.index.version()
    shutil.rmtree(str(tmp_path / "ck"))
    sink.stream_checkpoint_dir = str(tmp_path / "ck2")
    sink.start(spark, available_now=True).awaitTermination(120)
    assert sink.index.version() == v
    assert sink.index.meta()["stream_pos"] == pos2

    # a late file wholly below the consumed-through stamp (a replayed
    # segment) is skipped — its payload must never LWW a stale image
    # over the newer content already in the index
    key = spark.read.parquet(cl).filter(F.col("op") == "c").orderBy("offset").first()
    src_row = (
        spark.read.parquet(cl)
        .filter(F.col("offset") == key["offset"])
        .withColumn("offset", F.lit(1).cast("long"))
        .withColumn(
            "after",
            F.col("after").withField("content", F.lit("stale garbage content")),
        )
    )
    src_row.coalesce(1).write.mode("append").parquet(cl)
    sink.start(spark, available_now=True).awaitTermination(120)
    assert sink.index.version() == v
    assert _rows(sink.index.clusters()) == _rows(twin.clusters())


def test_streaming_ann_sink_bootstraps_and_serves(spark, changelog_parts, tmp_path):
    """The embedding side: the first live micro-batch trains the frozen
    centroids; after draining the feed the index answers searches and
    carries the consumed-through stamp + embed params."""
    d = changelog_parts
    cl = str(tmp_path / "cl")
    _stage(str(d / "p1"), cl)
    _stage(str(d / "p2"), cl)
    idx = IVFIndex(spark, str(tmp_path / "ix"))
    sink = StreamingIndexMaintenance(
        idx,
        cl,
        str(tmp_path / "ck"),
        prepare=lambda b: lww_embedding_changes(b, dim=32),
        max_files_per_trigger=2,  # several micro-batches: exercise the
    )                             # per-trigger position progression
    sink.start(spark, available_now=True).awaitTermination(180)
    assert idx.version() > 0 and idx.meta()["stream_pos"] > 0
    probe = idx.vectors().limit(1).collect()[0]
    q = spark.createDataFrame(
        [(-1, probe["c_vec"])], "vec_id long, embedding array<double>"
    )
    top = idx.search(q, k=1, n_probe=16).first()
    assert top is not None and top["sim"] >= 0.9999


def test_index_metrics_served_over_http(spark, tmp_path):
    """Both indexes duck-type the MetricsServer source contract with
    manifest-derived metrics (no Spark job per scrape)."""
    import json
    import urllib.request

    from debezium_incubator_spark.monitoring import MetricsServer

    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=3)
    assert idx.metrics() == {"phase": "empty", "version": 0}
    idx.build(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
            "doc_id long, text string",
        ),
        extra_meta={"stream_pos": 7},
    )
    server = MetricsServer(idx).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics"
        ) as r:
            m = json.loads(r.read())
        assert m["phase"] == "serving" and m["stream_pos"] == 7
        assert m["inv_batches"] == 1 and m["tombstone_sets"] == 0
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/health"
        ) as r:
            h = json.loads(r.read())
        assert h["healthy"] is True
    finally:
        server.stop()


def test_mixed_batch_raises_and_extra_meta_guard(spark, changelog_parts, tmp_path):
    """Review r5-6 #2/#3: (a) a batch STRADDLING the manifest stamp
    (old + new files grouped by a wiped checkpoint) must raise
    OutOfOrderDeliveryError, not silently filter; (b) a sink whose
    stamped preparer parameters mismatch the stored index refuses to
    start."""
    d = changelog_parts
    cl = str(tmp_path / "cl")
    _stage(str(d / "p1"), cl)
    idx = IncrementalDedupIndex(spark, str(tmp_path / "ix"), min_overlap=3)
    sink = StreamingIndexMaintenance(
        idx, cl, str(tmp_path / "ck"),
        prepare=lww_document_changes, max_files_per_trigger=1000,
    )
    sink.start(spark, available_now=True).awaitTermination(120)
    v = idx.version()

    _stage(str(d / "p2"), cl)
    sink.stream_checkpoint_dir = str(tmp_path / "ck2")  # wiped → one batch
    q = sink.start(spark, available_now=True)
    with pytest.raises(Exception) as ei:
        q.awaitTermination(120)
    assert "spans index stream_pos" in str(ei.value)
    assert idx.version() == v  # nothing landed from the poisoned batch

    cl2 = str(tmp_path / "cl2")
    _stage(str(d / "p1"), cl2)
    ivf = IVFIndex(spark, str(tmp_path / "ivf"))
    s32 = StreamingIndexMaintenance(
        ivf, cl2, str(tmp_path / "cka"),
        prepare=lambda b: lww_embedding_changes(b, dim=32),
        extra_meta={"embed_dim": 32},
    )
    s32.start(spark, available_now=True).awaitTermination(120)
    assert ivf.meta()["embed_dim"] == 32
    bad = StreamingIndexMaintenance(
        ivf, cl2, str(tmp_path / "ckb"),
        prepare=lambda b: lww_embedding_changes(b, dim=64),
        extra_meta={"embed_dim": 64},
    )
    with pytest.raises(ValueError, match="embed_dim"):
        bad.start(spark, available_now=True)
