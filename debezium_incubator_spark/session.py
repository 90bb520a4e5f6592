"""SparkSession factory with scale-appropriate defaults.

Tuned for correctness at local[N] and for the 1000-executor mental
model: AQE on (runtime re-plan + skew-join splitting), adaptive
shuffle-partition coalescing, Arrow for every Python<->JVM hop.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "debezium-incubator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic timestamps across Spark and DuckDB oracles
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalescing + skew-join splitting — the scale story
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow everywhere Python touches data
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # keep scans bounded so a 100 TB table splits into sane tasks
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate adds a redundant `size(gen_expr)>0`
        # filter under every explode of a COMPUTED array; Catalyst then
        # pushes that filter below any Exchange, re-evaluating the whole
        # generator pipeline (tokenize+shingle) a second time on the
        # PRE-shuffle partitioning — measured as a single-task 26 s
        # stage at a 50k-doc corpus (the scan is one file → one task)
        # vs 3.3 s with the rule excluded. The filter is semantically
        # redundant (explode drops empty arrays), so excluding the rule
        # is a pure win for every shingle/, hash- and band-explode in
        # the engine at any scale.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
