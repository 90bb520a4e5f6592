"""Time a subset of BENCH_QUERIES with bench.py's exact methodology
(same session config, .count(), clearCache between queries).

Usage: python scripts/bench_queries.py [sf_dir] [names...]
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    from debezium_incubator_spark.session import get_spark
    import __spark_entry__ as entry_mod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    local_dir = "/dev/shm/cdc_bench_local" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": local_dir} if local_dir else {}
    spark = get_spark(app_name="bench_queries", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus), extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench:{name}")
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()

if __name__ == "__main__":
    main()
