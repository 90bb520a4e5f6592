"""Change-data-feed read-amplification probe: a commit touching 1 of
N buckets must cost ~1/N of a full two-version diff.

Builds a 64-bucket table (~200k rows), commits a single-bucket rewrite,
then times step_changes (manifest-pruned) against the same
classification run over ALL buckets, adjacent in one warm session.
Prints one JSON line; representative numbers live in BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_incubator_spark.session import get_spark  # noqa: E402


def main():
    from pyspark.sql import functions as F

    import debezium_incubator_spark.lake.cdf as cdf
    from debezium_incubator_spark.lake.table import LakeTable

    n_rows = int(os.environ.get("CDF_BENCH_ROWS", "200000"))
    spark = get_spark(app_name="bench_cdf")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm/bench_cdf"
    shutil.rmtree(base, ignore_errors=True)
    rows = spark.range(n_rows).select(
        F.concat(F.lit("r"), (F.col("id") % 97)).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.col("id").alias("v"),
    )
    t = LakeTable.create(
        base, rows.schema, bucket_cols=["repo", "path"], num_buckets=64
    )
    t.commit(t.with_bucket(rows), replace_buckets=range(64), summary={})
    b0 = t.read(spark, buckets=[0]).withColumn("v", F.col("v") + 1)
    t.commit(t.with_bucket(b0), replace_buckets=[0], summary={})

    def run(label, buckets_override):
        orig = cdf.changed_buckets
        if buckets_override is not None:
            cdf.changed_buckets = lambda *_a, **_k: buckets_override
        try:
            t0 = time.time()
            n = cdf.step_changes(t, spark, 2, ["repo", "path"]).count()
            return time.time() - t0, n
        finally:
            cdf.changed_buckets = orig

    # warmup (codegen/JIT), then adjacent timed pair ×2
    run("warm", None)
    out = {"rows": n_rows, "buckets": 64, "pairs": []}
    for _ in range(2):
        s_pruned, n1 = run("pruned", None)
        s_full, n2 = run("full", list(range(64)))
        assert n1 == n2, (n1, n2)
        out["pairs"].append(
            {"pruned_s": round(s_pruned, 2), "full_s": round(s_full, 2)}
        )
    out["changes"] = n1
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)  # /dev/shm is RAM — clean up


if __name__ == "__main__":
    main()
