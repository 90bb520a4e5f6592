"""spark-submit entry point: maintain a durable IVF ANN index from the
CDC changelog — the embedding side of the training-data pipeline (the
dedup side is jobs/dedup_index_job.py).

    cd /root/repo && zip -qr /tmp/engine.zip debezium_incubator_spark
    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        jobs/ann_index_job.py \
        --index /data/ann_index --changelog /data/changelog \
        --dim 64 --n-centroids 16 --offsets-per-epoch 5000000

Consumes (repo, path, after.content, op, offset) envelopes in offset
order: per epoch, events are LWW-collapsed per key (skew-safe max_by
hash agg — `streaming/index_sink.py` preparers, shared with the
streaming sink, ≙ operators/dedup.lww_latest), keyed as
``vec_id = xxhash64(repo, path)``, embedded with the deterministic
feature-hashed n-gram encoder (`functions/text.py:
with_hashed_ngram_embedding` — a pure projection riding the changelog
scan; a neural encoder swaps in as a mapInPandas stage with the same
(id, vector) contract), and fed to `IVFIndex.apply_changes` — the
FIRST live batch trains the frozen centroids, later batches append
against them, updates take remove-then-re-add, deletes tombstone.

Exactly-once: the consumed-through position rides the SAME manifest
commit as the batch's final mutation (``extra_meta={"stream_pos": hi}``
— commit-THEN-checkpoint, the engine's own invariant). A crash
mid-batch replays the whole batch on restart: the re-remove is
idempotent and the re-add's rows land past the fresh tombstone stamp.
Safe to re-run any time; a fully-caught-up run is a no-op.

``--compact`` folds the accumulated list batches + tombstones into one
partitioned batch after catch-up and reclaims superseded state dirs
(``--expire-keep`` versions retained) — run it periodically or the
per-batch scan fan-out grows without bound. ``--retrain`` additionally
re-trains the centroids on the live corpus (use when the appended mass
``n_indexed`` says the frozen build-time centroids have drifted).
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--changelog", required=True)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--shingle-n", type=int, default=3)
    p.add_argument("--n-centroids", type=int, default=16)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--offsets-per-epoch", type=int, default=1_000_000)
    p.add_argument("--table", help="optional source.table filter")
    p.add_argument("--compact", action="store_true")
    p.add_argument("--retrain", action="store_true")
    p.add_argument("--expire-keep", type=int, default=2)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from debezium_incubator_spark.functions.ann_index import IVFIndex
    from debezium_incubator_spark.sources.changelog import ParquetChangelog
    from debezium_incubator_spark.streaming.index_sink import lww_embedding_changes

    spark = SparkSession.builder.appName("ann-index-maintain").getOrCreate()
    idx = IVFIndex(
        spark,
        args.index,
        n_centroids=args.n_centroids,
        n_probe=args.n_probe,
    )
    cl = ParquetChangelog(args.changelog)

    pos = -1
    if idx.version() > 0:
        m = idx.meta()
        # the embedding parameters are the job's, not the index's — the
        # IVF manifest can't validate them, so the job stamps and checks
        # them itself: resuming with a different dim would append
        # vectors incompatible with the frozen centroids (zip_with pads
        # the short side with nulls → NULL sims, silently garbage)
        for k, want in (("embed_dim", args.dim), ("embed_shingle_n", args.shingle_n)):
            have = m.get(k)
            if have is not None and have != want:
                raise SystemExit(
                    f"index at {args.index} was built with {k}={have}, "
                    f"rerun with matching parameters (got {want})"
                )
        pos = m.get("stream_pos", -1)
    epochs = 0
    # loop bound from footer stats (driver-side metadata walk, no Spark
    # job); empty slices advance locally past offset gaps
    top = cl.max_offset(spark)
    while pos < top:
        hi = pos + args.offsets_per_epoch
        raw = cl.range(spark, pos, hi)
        hi_actual = raw.agg(F.max("offset")).first()[0]
        if hi_actual is None:
            pos = hi
            continue
        # LWW + feature-hash embed via the shared preparer (skew-safe
        # max_by form) — the same derivation the streaming sink uses
        latest = lww_embedding_changes(
            raw, dim=args.dim, shingle_n=args.shingle_n, table=args.table
        )
        idx.apply_changes(
            latest,
            extra_meta={
                "stream_pos": hi_actual,
                "embed_dim": args.dim,
                "embed_shingle_n": args.shingle_n,
            },
        )
        pos = hi_actual
        epochs += 1

    if idx.version() > 0 and (args.compact or args.retrain):
        # --retrain answers the n_indexed drift signal (fresh centroid
        # generation over the live corpus, subsumes --compact); plain
        # --compact just folds the batch/tombstone chains
        idx.retrain() if args.retrain else idx.compact()
        idx.expire(keep_last=args.expire_keep)

    stats = {
        "version": idx.version(),
        "stream_pos": pos,
        "epochs_applied": epochs,
        "indexed": (
            idx.vectors().count() if idx.version() > 0 else 0
        ),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
