"""Custom stateful streaming operator: per-key LWW change compaction via
``applyInPandasWithState``.

The foreachBatch engine (streaming/stream.py) is the system of record —
its exactly-once story lives in the table+checkpoint layer. This
operator is the STREAM-NATIVE form of the same D1/D2 semantics for
consumers that want a compacted CHANGE FEED rather than a table: state
holds, per key, the highest offset ever seen (the per-key high-water
mark ≙ FileOffsetWriter.isOffsetProcessed, FileOffsetWriter.java:92-104,
kept in Spark's state store instead of a file); each micro-batch emits
only rows that ADVANCE a key (the Kafka-compacted-topic analog,
Record.buildKey/Record.java:73-84). Duplicates and stale replays are
absorbed statefully across micro-batches, not just within one.

Scale shape: state is per-key (key bytes + one long + the last payload),
hash-partitioned by Spark's state store across executors; each
micro-batch shuffles once on the key. Arrow batches in and out — the
per-group pandas work is a vectorized idxmax, no per-row Python loop.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_TYPE = T.StructType(
    [
        T.StructField("max_offset", T.LongType()),
        T.StructField("payload_json", T.StringType()),
    ]
)


def lww_changes_stream(
    events: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    offset_col: str = "offset",
    op_col: str = "op",
) -> DataFrame:
    """Stateful streaming LWW: emit one row per key per micro-batch IFF
    the batch advanced that key's offset high-water mark; carry the op so
    downstream consumers see deletes. Payload values are emitted as
    strings (a change-feed wire format; the typed path is the foreachBatch
    engine)."""
    out_fields = (
        [events.schema[k] for k in key_cols]
        + [T.StructField(offset_col, T.LongType()), T.StructField(op_col, T.StringType())]
        + [T.StructField(c, T.StringType()) for c in payload_cols]
    )
    out_type = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # per-key constant cost is THE scale limit at millions of keys
        # per micro-batch (the API hands groups one at a time, so a
        # cross-key batch emit isn't possible) — so: no pd.concat (scan
        # the chunk iterator), ndarray argmax instead of idxmax/loc, and
        # the stale-replay exit happens before any payload work
        best_off = -(1 << 62)
        best_row = None
        for pdf in pdfs:
            if not len(pdf.index):
                continue
            col = pdf[offset_col].values
            i = int(col.argmax())
            if int(col[i]) > best_off:
                best_off = int(col[i])
                best_row = pdf.iloc[i]
        if best_row is None:
            return
        prev_off = int(state.get[0]) if state.exists else -(1 << 62)
        if best_off <= prev_off:
            return  # replay/stale: absorbed by state, nothing emitted
        payload = {
            c: (None if pd.isna(best_row[c]) else str(best_row[c])) for c in payload_cols
        }
        state.update((best_off, json.dumps(payload)))
        row = dict(zip(key_cols, key))
        row[offset_col] = best_off
        row[op_col] = str(best_row[op_col])
        row.update(payload)
        yield pd.DataFrame([row], columns=out_cols)

    grouped = events.groupBy(*key_cols)
    return grouped.applyInPandasWithState(
        update, out_type, STATE_TYPE, "update", GroupStateTimeout.NoTimeout
    )


def lww_changes_stream_tws(
    events: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    offset_col: str = "offset",
    op_col: str = "op",
) -> DataFrame:
    """Same semantics as :func:`lww_changes_stream` on Spark 4's newer
    ``transformWithStateInPandas`` API (RocksDB state store v2). The
    prototype exists to measure whether the newer state-access path
    breaks applyInPandasWithState's ~8k keys/s per-group Arrow floor —
    the handler is still invoked once per key, but the state round-trip
    runs over the v2 state-server channel instead of per-group Arrow
    state rows. Requires
    ``spark.sql.streaming.stateStore.providerClass=
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    """
    try:
        import google.protobuf  # noqa: F401 — the state-v2 worker channel dependency
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package on the "
            "Python workers (Spark's state-v2 server channel speaks protobuf); "
            "it is not available in this environment, so the measured floor "
            "comparison could not run (BENCH.md). Use lww_changes_stream "
            "(applyInPandasWithState) or the foreachBatch engine for "
            "millions-of-keys workloads."
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_fields = (
        [events.schema[k] for k in key_cols]
        + [T.StructField(offset_col, T.LongType()), T.StructField(op_col, T.StringType())]
        + [T.StructField(c, T.StringType()) for c in payload_cols]
    )
    out_type = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]
    neg_inf = -(1 << 62)

    class _LWWProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._hwm = handle.getValueState("hwm", STATE_TYPE)

        def handleInputRows(self, key, rows, timer_values):  # noqa: N802 (API name)
            best_off = neg_inf
            best_row = None
            for pdf in rows:
                if not len(pdf.index):
                    continue
                col = pdf[offset_col].values
                i = int(col.argmax())
                if int(col[i]) > best_off:
                    best_off = int(col[i])
                    best_row = pdf.iloc[i]
            if best_row is None:
                return
            prev = self._hwm.get()
            if prev is not None and best_off <= int(prev[0]):
                return  # replay/stale: absorbed by state, nothing emitted
            payload = {
                c: (None if pd.isna(best_row[c]) else str(best_row[c]))
                for c in payload_cols
            }
            self._hwm.update((best_off, json.dumps(payload)))
            row = dict(zip(key_cols, key))
            row[offset_col] = best_off
            row[op_col] = str(best_row[op_col])
            row.update(payload)
            yield pd.DataFrame([row], columns=out_cols)

        def close(self) -> None:
            pass

    return events.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_LWWProcessor(),
        outputStructType=out_type,
        outputMode="Update",
        timeMode="None",
    )
