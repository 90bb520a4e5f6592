"""Benchmark harness: CDC apply throughput + headline operator timings.

Prints ONE JSON line:
  {"metric": "cdc_apply_e2e", "value": <sec>, "unit": "sec",
   "sf": 0.1, "queries": {...per-query sec...},
   "events": N, "events_per_sec": X, ...}

Scale knobs come from the sf dir ($SPARK_GRAFT_SF_DIR) so the same
harness runs at sf0.01 while iterating and sf0.1 per-round. The CDC
input (source table + changelog parquet) is generated deterministically
(seed 42) and cached under /tmp/cdc_bench_cache keyed by scale.

Scaling-efficiency evidence (N vs 4N cores) lives in
scripts/bench_scaling.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# events ≈ slots * 1.14 (d/pk expansion) * 1.02 (dups)
SCALES = {
    # sf: (n_keys, n_repos, n_slots, num_buckets, offsets_per_epoch)
    0.001: (2_000, 40, 6_000, 8, 12_000),
    0.01: (20_000, 120, 60_000, 16, 120_000),
    0.1: (200_000, 400, 600_000, 32, 1_200_000),
    0.3: (200_000, 400, 2_000_000, 32, 4_000_000),
    0.6: (400_000, 600, 4_000_000, 32, 8_000_000),
    2.0: (800_000, 800, 12_000_000, 32, 48_000_000),
    1.0: (2_000_000, 1200, 6_000_000, 64, 12_000_000),
}

BENCH_QUERIES = [
    "d1_offset_filter",
    "d2_lww_dedup",
    "d3_merge_effect",
    "t11_envelope_assembly",
    "s7_ddl_parse",
    "exact_dedup",
    "dedup_clusters",
    "minhash_lsh_dups",
    "ngram_jaccard_dups",
    "simhash_near_dups",
    "knn_cosine",
    "ann_lsh_topk",
    "multimodal_features",
    "hash_split",
    "ngram_contamination",
    "quality_score",
]


def sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    return float(name.replace("sf", "")) if name.startswith("sf") else 0.1


def prepare_inputs(spark, sf: float, cache_root: str = "/tmp/cdc_bench_cache"):
    from debezium_incubator_spark.sources.generator import gen_changelog, gen_source_table

    n_keys, n_repos, n_slots, num_buckets, ope = SCALES[min(SCALES, key=lambda k: abs(k - sf))]
    tag = f"k{n_keys}_s{n_slots}"
    src_p = f"{cache_root}/{tag}/source"
    log_p = f"{cache_root}/{tag}/changelog"
    if not os.path.exists(f"{log_p}/_SUCCESS"):
        gen_source_table(spark, n_keys=n_keys, n_repos=n_repos).write.mode(
            "overwrite"
        ).parquet(src_p)
        gen_changelog(spark, n_keys=n_keys, n_repos=n_repos, n_slots=n_slots).write.mode(
            "overwrite"
        ).parquet(log_p)
    return src_p, log_p, num_buckets, ope


def run_cdc_pipeline(spark, src_p, log_p, num_buckets, offsets_per_epoch, work_dir):
    from debezium_incubator_spark.plans.pipeline import CDCEngine
    from debezium_incubator_spark.sources.changelog import ParquetChangelog

    shutil.rmtree(work_dir, ignore_errors=True)
    eng = CDCEngine(spark, f"{work_dir}/table", f"{work_dir}/ckpt", num_buckets=num_buckets)
    eng.create_target()
    t0 = time.time()
    eng.bootstrap(spark.read.parquet(src_p))
    snap_s = time.time() - t0
    t1 = time.time()
    eng.run(ParquetChangelog(log_p), offsets_per_epoch=offsets_per_epoch)
    stream_s = time.time() - t1
    m = eng.metrics()
    events = m["counters"].get("events_in", 0)
    return {
        "snapshot_sec": round(snap_s, 2),
        "stream_sec": round(stream_s, 2),
        "total_sec": round(snap_s + stream_s, 2),
        "events": events,
        "epochs": m["epoch"] + 1,
        "events_per_sec": round(events / (snap_s + stream_s), 1),
    }


def run_multi_table(
    spark,
    sf: float,
    n_tables: int = 4,
    triggers: int = 4,
    max_parallel_tables: int | None = None,
    cache_root: str = "/tmp/cdc_bench_cache",
    work_root: str = "/tmp",
):
    """Orchestrator overhead benchmark: one shared changelog feeding
    ``n_tables`` tables through ``triggers`` apply_batch micro-batches
    (the StreamingMultiTableCDC per-trigger path: stats pass + per-table
    routed merges on the driver thread pool). Sized at ~1/4 the
    single-table volume so the per-trigger ORCHESTRATION cost dominates
    the measurement rather than raw apply throughput."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.plans.orchestrator import MultiTableCDC
    from debezium_incubator_spark.sources.generator import gen_changelog, gen_source_table

    n_keys, n_repos, n_slots, _, _ = SCALES[min(SCALES, key=lambda k: abs(k - sf))]
    n_keys, n_slots = max(n_keys // 4, 400), max(n_slots // 4, 1_200)
    tag = f"mt{n_tables}_k{n_keys}_s{n_slots}"
    src_p, log_p = f"{cache_root}/{tag}/source", f"{cache_root}/{tag}/changelog"
    if not os.path.exists(f"{log_p}/_SUCCESS"):
        gen_source_table(
            spark, n_keys=n_keys, n_repos=n_repos, n_tables=n_tables
        ).write.mode("overwrite").parquet(src_p)
        gen_changelog(
            spark, n_keys=n_keys, n_repos=n_repos, n_slots=n_slots, n_tables=n_tables
        ).write.mode("overwrite").parquet(log_p)

    work = f"{work_root}/cdc_bench_mt_{sf}"
    shutil.rmtree(work, ignore_errors=True)
    kw = {} if max_parallel_tables is None else {"max_parallel_tables": max_parallel_tables}
    orch = MultiTableCDC(spark, work, num_buckets=16, **kw)
    for i in range(n_tables):
        orch.create_table(f"files_{i:02d}")
    orch.bootstrap(spark.read.parquet(src_p))
    log = spark.read.parquet(log_p)
    top = int(log.agg(F.max("offset")).first()[0])
    cuts = [top * (i + 1) // triggers for i in range(triggers)]
    t0 = time.time()
    lo = -1
    for cut in cuts:
        orch.apply_batch(log.filter((F.col("offset") > lo) & (F.col("offset") <= cut)))
        lo = cut
    wall = time.time() - t0
    events = sum(
        m["counters"].get("events_in", 0) for m in orch.metrics().values()
    )
    return {"sec": round(wall, 3), "events": events, "tables": n_tables,
            "triggers": triggers, "sec_per_trigger": round(wall / triggers, 3)}


def main():
    from debezium_incubator_spark.session import get_spark
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_of(sf_dir)
    # scratch on tmpfs: a real cluster's shuffle/local disks scale with
    # executors; the VM's single virtual disk would serialize everything
    local_dir = "/dev/shm/cdc_bench_local" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": local_dir} if local_dir else {}
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    src_p, log_p, num_buckets, ope = prepare_inputs(spark, sf)
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    cdc = run_cdc_pipeline(
        spark, src_p, log_p, num_buckets, ope, f"{work_root}/cdc_bench_run_{sf}"
    )

    mt = run_multi_table(spark, sf, work_root=work_root)

    qs = entry_mod.queries()
    q_times = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        q_times[name] = round(time.time() - t0, 3)
        _ = n
        # release plan-keyed persists so each query is timed from a
        # clean cache and blocks don't accumulate across the suite
        spark.catalog.clearCache()

    out = {
        "metric": "cdc_apply_e2e",
        "value": cdc["total_sec"],
        "unit": "sec",
        "sf": sf,
        "queries": q_times,
        "events": cdc["events"],
        "events_per_sec": cdc["events_per_sec"],
        "snapshot_sec": cdc["snapshot_sec"],
        "stream_sec": cdc["stream_sec"],
        "epochs": cdc["epochs"],
        "multi_table": mt,
        "cores": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
