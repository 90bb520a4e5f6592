"""spark-submit entry point: maintain a duplicate-cluster index from the
CDC changelog — the training-data pipeline consuming the engine's feed.

    cd /root/repo && zip -qr /tmp/engine.zip debezium_incubator_spark
    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        jobs/dedup_index_job.py \
        --index /data/dedup_index --changelog /data/changelog \
        --min-overlap 3 --offsets-per-epoch 5000000

Consumes (repo, path, after.content, op, offset) envelopes in offset
order: per epoch, events are LWW-collapsed per key (skew-safe max_by
hash agg — `streaming/index_sink.py` preparers, shared with the
streaming sink, ≙ operators/dedup.lww_latest), keyed as
``doc_id = xxhash64(repo, path)`` (labels only need uniqueness +
ordering; a 64-bit collision over repo paths is ~never, and
deterministic either way), and fed to
`IncrementalDedupIndex.apply_changes` — inserts index, updates take
remove-then-re-add, deletes purge.

Exactly-once: the consumed-through position rides the SAME manifest
commit as the batch's final mutation (``extra_meta={"stream_pos": hi}``
— commit-THEN-checkpoint, the engine's own invariant). A crash
mid-batch replays the whole batch on restart: the re-remove is
idempotent and the re-add's rows land past the fresh tombstone stamp.
Safe to re-run any time; a fully-caught-up run is a no-op.
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--changelog", required=True)
    p.add_argument("--min-overlap", type=int)
    p.add_argument("--threshold", type=float)
    p.add_argument("--df-cap", type=int)
    p.add_argument("--offsets-per-epoch", type=int, default=1_000_000)
    p.add_argument("--table", help="optional source.table filter")
    p.add_argument("--compact", action="store_true")
    p.add_argument("--expire-keep", type=int, default=2)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from debezium_incubator_spark.functions.dedup_incremental import (
        IncrementalDedupIndex,
    )
    from debezium_incubator_spark.sources.changelog import ParquetChangelog
    from debezium_incubator_spark.streaming.index_sink import lww_document_changes

    spark = SparkSession.builder.appName("dedup-index-maintain").getOrCreate()
    idx = IncrementalDedupIndex(
        spark,
        args.index,
        min_overlap=args.min_overlap,
        threshold=args.threshold,
        df_cap=args.df_cap,
    )
    cl = ParquetChangelog(args.changelog)

    pos = -1
    if idx.version() > 0:
        pos = idx.meta().get("stream_pos", -1)
    epochs = 0
    # loop bound from footer stats (driver-side metadata walk, no Spark
    # job) — an empty SLICE must advance past the gap, not end the run:
    # an offset gap wider than --offsets-per-epoch would otherwise
    # silently strand all later history
    top = cl.max_offset(spark)
    while pos < top:
        hi = pos + args.offsets_per_epoch
        raw = cl.range(spark, pos, hi)
        # record the TRUE delivered-through offset of the UNFILTERED
        # slice, not the slice bound — later-arriving files may land
        # offsets inside (max, hi], and an all-other-tables slice must
        # still advance rather than end the run
        hi_actual = raw.agg(F.max("offset")).first()[0]
        if hi_actual is None:
            pos = hi  # gap: advance locally, nothing consumed to stamp
            continue
        # LWW per key within the epoch (skew-safe max_by form): the
        # index consumes ONE row per document (apply_changes contract) —
        # the same preparer the streaming sink uses
        latest = lww_document_changes(raw, table=args.table)
        idx.apply_changes(latest, extra_meta={"stream_pos": hi_actual})
        pos = hi_actual
        epochs += 1

    if args.compact and idx.version() > 0:
        # fold the per-batch state chains + tombstones and reclaim the
        # superseded dirs — bounded read amplification under sustained
        # ingest (functions/dedup_incremental.py:compact)
        idx.compact()
        idx.expire(keep_last=args.expire_keep)

    live = idx.clusters() if idx.version() > 0 else None
    stats = {
        "version": idx.version(),
        "stream_pos": pos,
        "epochs_applied": epochs,
        "docs": live.count() if live is not None else 0,
        "clusters": (
            live.select("cluster_id").distinct().count() if live is not None else 0
        ),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
