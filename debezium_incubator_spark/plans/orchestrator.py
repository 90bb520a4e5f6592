"""Multi-table CDC orchestration: one changelog, N independent tables.

The reference agent captures ALL CDC-enabled tables: the snapshot
processor loops over the table set (SnapshotProcessor.java:132-137), the
offset writer keeps per-table positions (FileOffsetWriter.java:75-118),
and the schema cache is per-table (SchemaHolder.java:25-52). Here each
table gets its own CDCEngine (own LakeTable, own CheckpointStore) under
one root directory, and a JSON registry makes the table set itself
restart-durable.

Scale shape: the shared changelog carries ``source.table``; each table's
epoch slice filters on it, a predicate Catalyst pushes into the parquet
scan (column-chunk dictionary/stats pruning — at 100 TB a table touching
1% of events reads ~1% of the pages). Tables are fully independent —
per-table offsets, per-table exactly-once, per-table counters — so a
scheduler can drive them concurrently on a cluster; this driver loops
them sequentially (the reference's single agent thread does too).

A mid-stream ``CREATE TABLE`` DDL provisions a new table + engine from
the parsed column list (the one DDL path the reference fully applies,
OracleSchemaChangeEventEmitter.java:65-80); ``DROP TABLE`` tears the
table down and deregisters it.
"""

from __future__ import annotations

import json
import os
import uuid
import warnings
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_incubator_spark.lake.table import LakeTable
from debezium_incubator_spark.plans.pipeline import CDCEngine


class TableSlice:
    """A per-table view over a shared changelog: same offsets, rows
    filtered to one ``source.table``. The filter rides into the scan
    (nested-field predicate pushdown), so each table's epoch reads only
    its pages."""

    def __init__(self, inner, table: str, table_field: str = "source.table"):
        self.inner = inner
        self.table = table
        self.table_field = table_field

    def max_offset(self, spark: SparkSession, **kw) -> int:
        return self.inner.max_offset(spark, **kw)

    def range(self, spark: SparkSession, start_exclusive: int, end_inclusive: int) -> DataFrame:
        df = self.inner.range(spark, start_exclusive, end_inclusive)
        return df.filter(F.col(self.table_field) == F.lit(self.table))


def _atomic_write(path: str, data: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class MultiTableCDC:
    def __init__(self, spark: SparkSession, root: str, **engine_defaults: Any):
        """``root`` holds everything: ``tables/<name>`` (LakeTables),
        ``ckpt/<name>`` (checkpoints), ``_registry.json`` (the durable
        table set ≙ the reference's CDC-enabled-table config). Engines
        for registered tables are reconstructed on restart."""
        self.spark = spark
        self.root = root
        self.engine_defaults = engine_defaults
        self.engines: dict[str, CDCEngine] = {}
        os.makedirs(root, exist_ok=True)
        for name, cfg in self._registry().items():
            self.engines[name] = self._mk_engine(name, cfg)

    # ------------------------------------------------------------- registry
    def _registry_path(self) -> str:
        return os.path.join(self.root, "_registry.json")

    def _registry(self) -> dict[str, dict]:
        try:
            with open(self._registry_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _save_registry(self, reg: dict[str, dict]) -> None:
        _atomic_write(self._registry_path(), json.dumps(reg, indent=1))

    def _mk_engine(self, name: str, cfg: dict) -> CDCEngine:
        kwargs = dict(self.engine_defaults)
        kwargs.update({k: v for k, v in cfg.items() if k not in ("payload_fields",)})
        if cfg.get("payload_fields"):
            kwargs["payload_fields"] = [tuple(x) for x in cfg["payload_fields"]]
        return CDCEngine(
            self.spark,
            os.path.join(self.root, "tables", name),
            os.path.join(self.root, "ckpt", name),
            **kwargs,
        )

    # ------------------------------------------------------------- table set
    def create_table(
        self,
        name: str,
        key_cols: list[str] | None = None,
        payload_fields: list[tuple[str, str]] | None = None,
        ddl_action: dict | None = None,
        **overrides: Any,
    ) -> CDCEngine:
        """Register + provision one table (idempotent on re-register).
        With ``ddl_action`` the typed schema + PK come from the parsed
        CREATE TABLE; such a table joins mid-stream without a snapshot
        source, so it skips straight to streaming (snapshot_mode=never)
        and replays the full changelog history into its fresh target."""
        if name in self.engines:
            return self.engines[name]
        cfg: dict[str, Any] = dict(overrides)
        if key_cols:
            cfg["key_cols"] = key_cols
        if payload_fields:
            cfg["payload_fields"] = [list(x) for x in payload_fields]
        if ddl_action is not None:
            cfg["snapshot_mode"] = cfg.get("snapshot_mode", "never")
        eng = self._mk_engine(name, cfg)
        if not LakeTable.exists(eng.table_path):
            if ddl_action is not None:
                eng.provision_from_ddl(ddl_action)
                eng.bootstrap(None)  # mode=never: flip phase, no source read
            else:
                eng.create_target()
        # persist the engine's EFFECTIVE key/payload config (DDL
        # provisioning derives them from the parsed columns) so restarts
        # reconstruct an identical engine
        cfg["key_cols"] = list(eng.key_cols)
        cfg["payload_fields"] = [list(x) for x in eng.payload_fields]
        reg = self._registry()
        reg[name] = cfg
        self._save_registry(reg)
        self.engines[name] = eng
        return eng

    def drop_table(self, name: str) -> bool:
        eng = self.engines.pop(name, None)
        reg = self._registry()
        reg.pop(name, None)
        self._save_registry(reg)
        path = (
            eng.table_path if eng is not None else os.path.join(self.root, "tables", name)
        )
        return LakeTable.drop(path)

    def apply_ddl_statements(self, statements: list[str]) -> int:
        """Route parsed DDL by its table: CREATE TABLE provisions a new
        engine mid-stream (schema + PK from the parsed columns), DROP
        TABLE deregisters + removes, ALTER goes to the owning engine;
        DDL for unregistered tables is the warn-and-skip path."""
        from debezium_incubator_spark.sources.ddl import (
            parse_ddl_batch,
            schema_from_create_action,
        )

        applied = 0
        for action in parse_ddl_batch(statements):
            tbl = action.get("table")
            name = tbl.split(".")[-1] if tbl else None
            if name is not None and name not in self.engines:
                # Oracle folds unquoted identifiers to UPPER; our
                # changelog's source.table is the connector's (lowercase)
                # name. Resolve case-insensitively; a NEW unquoted name
                # registers lowercased so it meets the changelog field.
                ci = {k.lower(): k for k in self.engines}
                name = ci.get(name.lower(), name.lower())
            kind = action.get("action")
            if kind == "create_table":
                schema_from_create_action(action)  # validate before registering
                self.create_table(name, ddl_action=action)
                applied += 1
            elif kind == "drop_table":
                if self.drop_table(name):
                    applied += 1
                else:
                    warnings.warn(f"DROP TABLE {tbl}: not registered, skipped")
            elif name in self.engines:
                applied += self.engines[name].apply_ddl_events([action])
            else:
                warnings.warn(f"DDL for unregistered table {tbl!r} skipped: {kind}")
        return applied

    # ------------------------------------------------------------- lifecycle
    def bootstrap(self, source: DataFrame, table_col: str = "src_table") -> dict[str, dict]:
        """Snapshot phase for every registered table (the reference's
        per-table snapshot loop). ``source`` carries ``table_col``
        assigning each row to a table; each engine sees only its rows."""
        out = {}
        for name, eng in self.engines.items():
            rows = source.filter(F.col(table_col) == F.lit(name)).drop(table_col)
            out[name] = eng.bootstrap(rows)
        return out

    def run(
        self,
        changelog,
        offsets_per_epoch: int = 400_000,
        max_epochs: int | None = None,
        table_field: str = "source.table",
    ) -> dict[str, list[dict]]:
        """Stream every registered table from the shared changelog. Each
        table resumes from ITS OWN checkpointed position — a table added
        mid-stream starts at -1 and replays the full history into its
        fresh target (deterministic, exactly-once per table)."""
        out = {}
        for name, eng in self.engines.items():
            sl = TableSlice(changelog, name, table_field)
            out[name] = eng.run(sl, offsets_per_epoch=offsets_per_epoch, max_epochs=max_epochs)
        return out

    # ------------------------------------------------------------- reads / metrics
    def final_state(self, name: str) -> DataFrame:
        return self.engines[name].final_state()

    def metrics(self) -> dict[str, dict]:
        """Per-table counters + lineage (≙ per-table offset files,
        FileOffsetWriter.java:75-118)."""
        return {name: eng.metrics() for name, eng in self.engines.items()}
