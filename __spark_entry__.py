"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC pipeline end-to-end on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 (CDC operators over ``events``, training-data ops over
``documents``/``embeddings``), hash-compared against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: generator → snapshot bootstrap → stream epochs →
    LWW dedup → copy-on-write merge → final table (sf0.001 scale)."""
    from debezium_incubator_spark.entry_queries import q_cdc_pipeline_replay

    return q_cdc_pipeline_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from debezium_incubator_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from debezium_incubator_spark.entry_queries import ORACLES

    return dict(ORACLES)
