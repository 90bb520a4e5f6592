"""Structured Streaming wrapper around the batch apply core.

The reference's processors are while-loops around a batch ``process()``
(AbstractProcessor.java:50-63); the commit-log processor replays files
then watches the directory for new ones (CommitLogProcessor.java:75-94,
AbstractDirectoryWatcher.java:40-53). Our equivalent: a file-source
``readStream`` over the changelog parquet directory with ``foreachBatch``
delegating to the SAME exactly-once epoch core (CDCEngine.apply_epoch) —
the batch path is the unit of correctness, streaming is the driver loop.

``maxFilesPerTrigger`` plays the role of max.batch.size backpressure
(BlockingEventQueue.java:29-59); Spark's own checkpointLocation tracks
which files were seen, while the engine checkpoint keeps the per-bucket
offset lineage — a duplicate delivery from either layer is absorbed by
the D1 filter + idempotent epoch commit.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from debezium_incubator_spark.operators.envelope import changelog_schema
from debezium_incubator_spark.plans.pipeline import CDCEngine


class StreamingCDC:
    def __init__(
        self,
        engine: CDCEngine,
        changelog_dir: str,
        stream_checkpoint_dir: str,
        max_files_per_trigger: int = 8,
        payload_fields: list[tuple[str, str]] | None = None,
    ):
        self.engine = engine
        self.changelog_dir = changelog_dir
        self.stream_checkpoint_dir = stream_checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.schema = changelog_schema(payload_fields)

    def _apply_batch(self, batch_df, epoch_id: int) -> None:
        # foreachBatch may redeliver a batch after restart; apply_epoch's
        # summary/offset guards make the redelivery a no-op.
        if batch_df.isEmpty():
            return
        top = batch_df.agg({"offset": "max"}).first()[0]
        self.engine.apply_epoch(batch_df, stream_pos=int(top))

    def start(self, spark: SparkSession, available_now: bool = True):
        reader = (
            spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            .parquet(self.changelog_dir)
        )
        writer = (
            reader.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.stream_checkpoint_dir)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_until_caught_up(self, spark: SparkSession, timeout_s: float = 300.0) -> None:
        q = self.start(spark, available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
