from debezium_incubator_spark.lake.table import LakeTable, ConcurrentWriteError  # noqa: F401
from debezium_incubator_spark.lake.checkpoint import CheckpointStore  # noqa: F401
