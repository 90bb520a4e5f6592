"""debezium_incubator_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the semantics of the debezium-incubator reference connectors
(Cassandra commit-log agent + Oracle XStream connector) as an idiomatic
Spark pipeline over a transactional, bucketed lake table:

* change-event envelopes ``{offset, op, ts_ms, before, after, source}``
  (reference: Record.java:27-97, XStreamChangeRecordEmitter.java:34-62),
* snapshot-then-stream handoff (SnapshotProcessor.java:99-220,
  OracleSnapshotChangeEventSource.java:55-139),
* exactly-once apply = offset-skip filter + last-writer-wins dedup +
  idempotent epoch-stamped transactional commits
  (FileOffsetWriter.java:75-118, LcrEventHandler.java:53-65,
  KafkaRecordEmitter.java:58-100),
* schema evolution by field-id column mapping
  (OracleSchemaChangeEventEmitter.java:42-80).

Everything is DataFrame-declarative; Catalyst handles pushdown/pruning,
AQE handles skew. Python touches rows only through Arrow-vectorized
pandas UDFs.
"""

__version__ = "0.1.0"

from debezium_incubator_spark.session import get_spark  # noqa: F401
