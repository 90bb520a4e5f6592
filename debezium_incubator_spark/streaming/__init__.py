from debezium_incubator_spark.streaming.stream import StreamingCDC  # noqa: F401
