from debezium_incubator_spark.sources.generator import (  # noqa: F401
    gen_source_table,
    gen_changelog,
)
