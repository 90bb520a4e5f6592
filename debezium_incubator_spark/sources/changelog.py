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
    def __init__(self, path: str, schema=None, extra_paths: list[str] | None = None):
        """``extra_paths``: additional parquet directories read as part
        of the same log (e.g. ``_archive/`` during an out-of-band
        catch-up that needs GC-archived history — K4 heal path,
        ≙ the pluggable CommitLogTransfer restoring archived segments,
        CommitLogPostProcessor.java:38-55). Offsets stay the total
        order; WHERE a row lives is irrelevant to range()."""
        self.path = path
        self.schema = schema
        self.extra_paths = [p for p in (extra_paths or []) if p]
        self._max_offset: int | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        r = spark.read
        if self.schema is not None:
            r = r.schema(self.schema)
        return r.parquet(self.path, *self.extra_paths)

    def max_offset(self, spark: SparkSession, refresh: bool = False) -> int:
        """Top offset of the log, from parquet FOOTER statistics (a
        driver-side metadata walk — milliseconds — instead of a full
        column-scan Spark job; the reference likewise orders segments by
        file metadata, CommitLogUtil.java:67-103). Cached: a changelog
        instance models one immutable snapshot of the directory — pass
        ``refresh=True`` (or construct anew) after files are appended.
        Falls back to the Spark aggregate if any footer lacks stats."""
        if self._max_offset is not None and not refresh:
            return self._max_offset
        top = self._footer_max_offset()
        if top is None:
            row = self.read(spark).agg(F.max("offset")).first()
            top = -1 if row[0] is None else int(row[0])
        self._max_offset = top
        return top

    def _footer_max_offset(self) -> int | None:
        import os

        top = None
        try:
            files = []
            for d in (self.path, *self.extra_paths):
                files += [
                    os.path.join(d, fn)
                    for fn in os.listdir(d)
                    if fn.endswith(".parquet")
                ]
            if not files:
                return None
            for p in files:
                m = file_footer_offset_max(p)
                if m is None:
                    return None  # stats absent → Spark aggregate fallback
                top = m if top is None else max(top, m)
        except Exception:
            # not just OSError: a corrupt or mid-write segment makes
            # pyarrow raise ArrowInvalid — any unreadable footer means
            # "fall back to the Spark aggregate", same as gc.py's probe
            return None
        return top

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


def _footer_offset_stat(path: str, which: str):
    """Min/max ``offset`` across one parquet file's row-group footer
    stats; ``None`` when any row group lacks min/max statistics for the
    column. Raises whatever pyarrow raises on an unreadable/corrupt
    footer — callers decide between fallback (ParquetChangelog) and
    quarantine (gc.expire_changelog_files). One parameterized walk so
    the min/max forms cannot drift."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path).metadata
    fold = min if which == "min" else max
    out = None
    for rg in range(meta.num_row_groups):
        rgm = meta.row_group(rg)
        for ci in range(rgm.num_columns):
            col = rgm.column(ci)
            if col.path_in_schema == "offset":
                if col.statistics is None or not col.statistics.has_min_max:
                    return None
                v = int(getattr(col.statistics, which))
                out = v if out is None else fold(out, v)
    return out


def file_footer_offset_min(path: str):
    """Used by gc.restore_archived to decide which archived segments a
    bounded catch-up needs."""
    return _footer_offset_stat(path, "min")


def file_footer_offset_max(path: str):
    """Shared by the changelog top-offset walk and gc's GC-eligibility
    probe."""
    return _footer_offset_stat(path, "max")
