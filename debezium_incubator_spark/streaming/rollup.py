"""Event-time windowed rollups — batch and streaming, one definition.

The hypertable-rollup family: tumbling/sliding event-time windows with
per-group counts and exact-long sums. The SAME groupBy(window(...))
expression serves the batch recompute and the Structured Streaming
maintenance; the streaming form adds a watermark so state is bounded
and late data has a defined fate (dropped once the watermark passes —
the reference's consumers get the same contract from Kafka Streams
windows).

Scale shape: windowed aggregation is a partial-then-final hash agg on
(window, group) — map-side combine collapses each task's slice of a hot
window before the shuffle. Streaming state is one row per open
(window, group), bounded by ``watermark_delay`` — not by stream length.
Sums are cast to long by the caller (cents-style units): float
accumulators drift across a billion merges; longs don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_rollup(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time rollup.

    Emits ``window_start``/``window_end`` timestamps plus ``n_events``
    and ``sum_<c>`` per group. Works unchanged on batch and streaming
    frames (call through :func:`streaming_rollup` for the latter so a
    watermark bounds state).
    """
    group_cols = group_cols or []
    sum_cols = sum_cols or []
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        F.sum(c).cast("long").alias(f"sum_{c}") for c in sum_cols
    ]
    return (
        df.groupBy(win.alias("w"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            *[f"sum_{c}" for c in sum_cols],
        )
    )


def streaming_rollup(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str,
    watermark_delay: str,
    group_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked streaming rollup, append-output-mode ready.

    A window's row is emitted exactly once — when the watermark
    (max seen event time minus ``watermark_delay``) passes its end —
    and events arriving later than the delay are dropped by contract
    rather than corrupting an already-emitted window.
    """
    if not stream_df.isStreaming:
        raise ValueError("streaming_rollup needs a streaming DataFrame; "
                         "use windowed_rollup for batch frames")
    return windowed_rollup(
        stream_df.withWatermark(ts_col, watermark_delay),
        ts_col,
        window_duration,
        group_cols,
        sum_cols,
        slide,
    )
