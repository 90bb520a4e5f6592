"""S3/S4/S5 — changelog source with ordered discovery + range slicing.

Reference: commit-log files are discovered, sorted by embedded
timestamp, and replayed in order (CommitLogProcessor.java:75-94,
CommitLogUtil.java:67-103); XStream attaches at a resume position and
streams LCRs (OracleStreamingChangeEventSource.java:59-90). Batch sizing
comes from the bounded queue (max.batch.size=2048,
BlockingEventQueue.java:44-59).

Our changelog is a parquet dataset of envelope rows with a total-order
``offset``. Range slicing by offset value replaces both the file
ordering and the queue: each micro-batch is ``offset ∈ (start, end]``,
a predicate Catalyst pushes into the parquet scan (min/max row-group
pruning — the at-scale replacement for "only read new files").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetChangelog:
    def __init__(self, path: str, schema=None):
        self.path = path
        self.schema = schema

    def read(self, spark: SparkSession) -> DataFrame:
        r = spark.read
        if self.schema is not None:
            r = r.schema(self.schema)
        return r.parquet(self.path)

    def max_offset(self, spark: SparkSession) -> int:
        row = self.read(spark).agg(F.max("offset")).first()
        return -1 if row[0] is None else int(row[0])

    def range(self, spark: SparkSession, start_exclusive: int, end_inclusive: int) -> DataFrame:
        """Events with offset ∈ (start, end] — pushed-down scan predicate
        (the D1 replay guard re-applies per bucket downstream)."""
        df = self.read(spark)
        return df.filter(
            (F.col("offset") > F.lit(start_exclusive)) & (F.col("offset") <= F.lit(end_inclusive))
        )


class DataFrameChangelog:
    """In-memory changelog (tests / generator output without I/O)."""

    def __init__(self, df: DataFrame):
        self.df = df

    def read(self, spark: SparkSession) -> DataFrame:
        return self.df

    def max_offset(self, spark: SparkSession) -> int:
        row = self.df.agg(F.max("offset")).first()
        return -1 if row[0] is None else int(row[0])

    def range(self, spark: SparkSession, start_exclusive: int, end_inclusive: int) -> DataFrame:
        return self.df.filter(
            (F.col("offset") > F.lit(start_exclusive)) & (F.col("offset") <= F.lit(end_inclusive))
        )
