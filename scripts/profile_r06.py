"""Round-6 profiling: decompose the hot bench queries (noop-isolated).

Usage: python scripts/profile_r06.py [sf_dir] [which ...]
Times sub-stages of ngram_jaccard / dedup_clusters / simhash / minhash
with the same session config as bench.py, and prints fan-out stats
(inverted-index size, sum df^2, CC rounds). Guide §1: measure first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s -> {out}")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()
    return "ok"


def main():
    from debezium_incubator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    which = set(sys.argv[2:]) or {"stats", "ngram", "clusters", "simhash", "minhash"}
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    local_dir = "/dev/shm/cdc_prof_local" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": local_dir} if local_dir else {}
    spark = get_spark(app_name="profile_r06", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus), extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from debezium_incubator_spark.entry_queries import _docs
    from debezium_incubator_spark.functions.dedup_text import (
        _capped_inverted_index, _shingle_sets, _cooccurrence_counts)

    qs = entry.queries()

    if "stats" in which:
        print("== corpus / fanout stats ==")
        docs = _docs(spark, sf_dir)
        t("docs", lambda: docs.count())
        sh = _shingle_sets(docs, "doc_id", "text", 3)
        t("avg shingles/doc", lambda: sh.select(F.avg(F.size("sh"))).first()[0])
        inv = _capped_inverted_index(sh, 1000)
        inv2 = inv.persist()
        t("inv rows", lambda: inv2.count())
        dfc = inv2.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        t("distinct shingles / sum df^2 / max df", lambda: tuple(
            dfc.agg(F.count(F.lit(1)), F.sum(F.col("df") * F.col("df")), F.max("df")).first()))
        t("df>256 shingles / their df^2", lambda: tuple(
            dfc.filter(F.col("df") > 256).agg(
                F.count(F.lit(1)), F.sum(F.col("df") * F.col("df"))).first()))
        inv2.unpersist()

    if "ngram" in which:
        print("== ngram_jaccard decomposition ==")
        docs = _docs(spark, sf_dir)
        sh = _shingle_sets(docs, "doc_id", "text", 3)
        from pyspark import StorageLevel
        inv = _capped_inverted_index(sh, 1000).persist(StorageLevel.MEMORY_AND_DISK)
        t("materialize inv (count)", lambda: inv.count())
        co = _cooccurrence_counts(inv, 1000, 256, 16)
        t("cooccurrence pairs (count)", lambda: co.count())
        co2 = co.filter(F.col("inter") >= 1)
        t("pair rows total inter sum", lambda: co.agg(F.sum("inter")).first()[0])
        inv.unpersist()
        _ = co2
        spark.catalog.clearCache()
        t("full q_ngram_jaccard_dups count", lambda: qs["ngram_jaccard_dups"](spark, sf_dir).count())
        spark.catalog.clearCache()

    if "clusters" in which:
        print("== dedup_clusters decomposition ==")
        docs = _docs(spark, sf_dir)
        from debezium_incubator_spark.functions.dedup_text import shingle_overlap_pairs
        t0 = time.time()
        pairs = shingle_overlap_pairs(docs, min_overlap=3)
        print(f"  shingle_overlap_pairs (finalized localCkpt): {time.time()-t0:.2f}s rows={pairs.count()}")
        from debezium_incubator_spark.functions.graph import connected_components
        t0 = time.time()
        comp = connected_components(pairs)
        print(f"  connected_components: {time.time()-t0:.2f}s rows={comp.count()}")
        spark.catalog.clearCache()
        t("full q_dedup_clusters count", lambda: qs["dedup_clusters"](spark, sf_dir).count())
        spark.catalog.clearCache()

    if "simhash" in which:
        print("== simhash decomposition ==")
        from debezium_incubator_spark.functions.dedup_text import (
            _simhash_from_hashes, _tokens, portable_token_hash)
        docs = _docs(spark, sf_dir)
        toks = docs.select(F.col("doc_id").alias("id"), _tokens(F.col("text")).alias("__tk"))
        hashed = toks.select(
            "id", F.transform(F.col("__tk"), portable_token_hash).alias("__hs"),
            F.size(F.col("__tk")).cast("long").alias("__n"))
        t("token-hash arrays (noop)", lambda: noop(hashed))
        fp = hashed.select("id", _simhash_from_hashes(F.col("__hs"), F.col("__n"), 56).alias("simhash"))
        t("simhash fold (noop)", lambda: noop(fp))
        spark.catalog.clearCache()
        t("full q_simhash_near_dups count", lambda: qs["simhash_near_dups"](spark, sf_dir).count())
        spark.catalog.clearCache()

    if "minhash" in which:
        print("== minhash decomposition ==")
        from debezium_incubator_spark.functions.dedup_text import minhash_signatures
        docs = _docs(spark, sf_dir)
        sig = minhash_signatures(docs, "doc_id", "text", 64, 3, 42, None)
        t("signatures (noop)", lambda: noop(sig))
        spark.catalog.clearCache()
        t("full q_minhash_lsh_dups count", lambda: qs["minhash_lsh_dups"](spark, sf_dir).count())
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
