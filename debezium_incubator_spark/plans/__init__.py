from debezium_incubator_spark.plans.pipeline import CDCEngine  # noqa: F401
