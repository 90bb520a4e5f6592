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
from pyspark.sql import functions as F

from debezium_incubator_spark.operators.envelope import changelog_schema
from debezium_incubator_spark.plans.pipeline import CDCEngine


class OutOfOrderDeliveryError(RuntimeError):
    """A micro-batch mixed never-applied offsets at-or-below the
    checkpointed stream position with new ones: the file source delivered
    changelog files out of offset order. Applying it would let the D1
    high-water-mark filter silently DROP the low offsets (they look like
    replays) — data loss, not duplicate absorption. Re-deliver in order
    or drive the offset-sliced batch path (CDCEngine.run)."""


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
        # loop-carried checkpoint across triggers: with
        # checkpoint_interval > 1 a heartbeat-advanced stream_pos lives
        # only in memory between persisted checkpoints — re-reading
        # store.latest() every micro-batch would regress it (same carry
        # the batch loop and the multi-table orchestrator do)
        self._ckpt: dict | None = None

    def _apply_batch(self, batch_df, epoch_id: int) -> None:
        # ONE stats action per micro-batch (count + offset bounds) —
        # the old isEmpty + agg(max) pair cost two extra passes.
        n, lo, top = batch_df.agg(
            F.count(F.lit(1)), F.min("offset"), F.max("offset")
        ).first()
        # RECONCILED position: after a crash between commit and
        # checkpoint the manifest chain is ahead of the checkpoint file —
        # reading store.latest() raw would regress stream_pos on the next
        # heartbeat/batch and re-scan an already-applied range. The
        # carried ckpt (which may be AHEAD of the persisted file) wins;
        # _reconcile folds it forward if the table advanced elsewhere.
        ckpt = self.engine._reconcile(self._ckpt or self.engine.store.latest())
        if self._ckpt is not None:
            # heartbeat epochs inflate the carried epoch WITHOUT table
            # commits, so _reconcile cannot fold past them — if another
            # driver moved the PERSISTED position further, disk wins
            disk = self.engine._reconcile(self.engine.store.latest())
            if int(disk.get("stream_pos", -1)) > int(ckpt.get("stream_pos", -1)):
                ckpt = disk
        last = int(ckpt.get("stream_pos", -1))
        if n == 0:
            # K5 heartbeat parity with the batch loop: an idle trigger
            # still advances the epoch/checkpoint (no table commit)
            self._ckpt = self.engine.apply_epoch(batch_df, stream_pos=last, ckpt=ckpt)
            return
        lo, top = int(lo), int(top)
        if lo <= last < top:
            # mixed batch: offsets at-or-below the checkpointed position
            # arriving TOGETHER with new ones. A whole-batch redelivery
            # after restart has top <= last (absorbed below); a mix means
            # the file source's delivery order is not offset order.
            raise OutOfOrderDeliveryError(
                f"batch spans checkpointed stream_pos={last}: offsets [{lo}, {top}]"
            )
        # top <= last → byte-identical redelivery: apply_epoch's offset
        # guards make it a no-op; top > last → normal forward progress.
        self._ckpt = self.engine.apply_epoch(
            batch_df, stream_pos=max(top, last), ckpt=ckpt
        )

    def start(
        self,
        spark: SparkSession,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        """Start the stream. ``available_now=True`` drains the current
        directory contents and stops (the batch-campaign mode);
        ``processing_time="5 seconds"`` instead watches the directory
        INDEFINITELY, picking up files as they land — the reference's
        continuous directory watch (AbstractDirectoryWatcher.java:40-53,
        CommitLogProcessor.java:75-94). Idle triggers heartbeat through
        the same exactly-once epoch core; stop with ``q.stop()`` or
        ``run_until(...)``."""
        if processing_time is not None and available_now:
            available_now = False
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
        elif processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_until_caught_up(self, spark: SparkSession, timeout_s: float = 300.0) -> None:
        q = self.start(spark, available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()

    def run_until(
        self,
        spark: SparkSession,
        stop_condition,
        processing_time: str = "1 seconds",
        timeout_s: float = 300.0,
        poll_s: float = 0.5,
    ) -> None:
        """Drive the continuous trigger until ``stop_condition(engine)``
        returns True (or the timeout lapses), then stop the query — the
        testable form of an otherwise indefinite watch."""
        import time

        q = self.start(spark, processing_time=processing_time)
        deadline = time.monotonic() + timeout_s
        try:
            while time.monotonic() < deadline:
                if q.exception() is not None:
                    raise q.exception()
                if stop_condition(self.engine):
                    return
                time.sleep(poll_s)
            raise TimeoutError(f"stop_condition not met within {timeout_s}s")
        finally:
            q.stop()
