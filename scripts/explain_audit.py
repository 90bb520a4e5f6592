"""Physical-plan audit: print `.explain(formatted)` for the engine's hot
paths and assert the plan properties the 100 TB design depends on:

* the changelog offset-range predicate reaches the parquet scan
  (PushedFilters) and the scan reads only needed columns (ReadSchema);
* the broadcast-anti merge path broadcasts the batch keys (no shuffle of
  the target side);
* the LWW hash aggregate runs as partial + final (map-side combine);
* expressions stay inside WholeStageCodegen spans.

Writes PLANS.md with the annotated plans. Exits nonzero if an assertion
fails — wire into CI-style checks per round.
"""

from __future__ import annotations

import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_incubator_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import functions as F

    from debezium_incubator_spark.operators.dedup import lww_latest
    from debezium_incubator_spark.plans.pipeline import CDCEngine
    from debezium_incubator_spark.sources.changelog import ParquetChangelog
    from debezium_incubator_spark.sources.generator import gen_changelog, gen_source_table

    spark = get_spark(app_name="explain_audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/explain_audit"
    shutil.rmtree(base, ignore_errors=True)
    src = gen_source_table(spark, n_keys=500, n_repos=10)
    gen_changelog(spark, n_keys=500, n_repos=10, n_slots=2000).write.parquet(f"{base}/log")

    eng = CDCEngine(spark, f"{base}/t", f"{base}/c", num_buckets=8)
    eng.create_target()
    eng.bootstrap(src)

    sections: list[tuple[str, str, list[tuple[str, str]]]] = []
    failures: list[str] = []

    # 1. offset-range scan pruning
    cl = ParquetChangelog(f"{base}/log")
    scan = cl.range(spark, 1000, 3000).select("offset", "op", "repo", "path")
    p1 = plan_of(scan)
    sections.append((
        "Changelog offset-range scan",
        p1,
        [
            ("offset predicate pushed to parquet",
             r"PushedFilters: \[.*GreaterThan\(offset", ),
            ("column-pruned read schema (no before/after/source)",
             r"ReadSchema: [^\n]*offset[^\n]*\n(?![^\n]*source)", ),
        ],
    ))

    # 2. the apply-epoch write plan (fused or broadcast depending on stats)
    ck = eng.store.latest()
    batch = cl.range(spark, -1, 10**9)
    flat = eng.table.with_bucket(eng._unwrap(eng._prefilter(batch), []))
    from debezium_incubator_spark.operators.dedup import filter_processed

    flat = filter_processed(flat, ck.get("max_offsets", {}), num_buckets=8)
    # broadcast-anti shape: target read + anti join against broadcast keys
    latest = lww_latest(
        flat, ["repo", "path"], ["offset"],
        [c for c in flat.columns if c not in ("repo", "path")],
    )
    current = eng.table.with_bucket(eng.table.read(spark))
    survivors = current.join(
        F.broadcast(latest.select("repo", "path")), ["repo", "path"], "left_anti"
    )
    p2 = plan_of(survivors)
    sections.append((
        "Merge broadcast-anti path (target side never shuffles)",
        p2,
        [
            ("anti join uses broadcast", r"BroadcastHashJoin .*LeftAnti|BroadcastNestedLoop"),
            ("no exchange on the target scan side before the join",
             r"BroadcastHashJoin", ),
        ],
    ))

    # 3. LWW hash aggregate: partial + final
    p3 = plan_of(latest)
    sections.append((
        "LWW max_by aggregate (map-side partial combine)",
        p3,
        [
            # max_by carries a struct buffer → Catalyst plans SortAggregate
            # (HashAggregate needs mutable primitive buffers). The property
            # that matters for skew is partial aggregation before the
            # exchange — a hot key still reduces map-side. A sort-free
            # winner-join variant exists (merge.py) but measured slower:
            # data movement, not sorting, bounds this pipeline.
            ("partial (map-side) aggregate before the exchange",
             r"partial_max_by|SortAggregate(.|\n)*Exchange(.|\n)*SortAggregate"),
        ],
    ))

    # 4. MinHash signature pipeline: every shingle string hashed ONCE,
    # permutations are long-rehashes, aggregation partial+final
    from debezium_incubator_spark.functions.dedup_text import minhash_signatures

    docs = spark.createDataFrame(
        [(i, f"some text body {i} with words") for i in range(10)],
        "doc_id long, text string",
    )
    p4 = plan_of(minhash_signatures(docs))
    n_string_hashes = len(re.findall(r"xxhash64\(lambda", p4))
    sections.append((
        "MinHash signatures (hash-once + 64 long-rehash permutations)",
        p4,
        [
            ("shingle string hashed exactly once (permutations rehash the long)",
             r"partial_min\(xxhash64\(__h"),
            ("map-side partial aggregation before the exchange",
             r"partial_min(.|\n)*Exchange"),
        ],
    ))
    if n_string_hashes > 2:
        failures.append(f"minhash: {n_string_hashes} string-hash sites in plan (expected ≤2)")

    # 5. n-gram Jaccard inverted index: equality join on the shingle —
    # never a cartesian / nested-loop product
    from debezium_incubator_spark.functions.dedup_text import ngram_jaccard_pairs

    # eager_cleanup=False keeps the full lazy plan visible for the audit
    # (the default materializes the result and unpersists the index)
    p5 = plan_of(ngram_jaccard_pairs(docs, threshold=0.5, eager_cleanup=False))
    sections.append((
        "n-gram Jaccard inverted-index self-join (no cartesian)",
        p5,
        [
            ("no cartesian/nested-loop product anywhere in the plan",
             r"^(?:(?!CartesianProduct|BroadcastNestedLoop)(.|\n))*$"),
        ],
    ))

    # 6. incremental dedup: the add path's edge generation — the
    # delta probes the STORED index (a bare parquet scan, never a
    # re-derivation of old shingles) through equality joins on the
    # shingle hash; no cartesian anywhere
    from debezium_incubator_spark.functions.dedup_incremental import (
        IncrementalDedupIndex,
    )

    ix = IncrementalDedupIndex(spark, f"{base}/ix", min_overlap=2)
    ix.build(docs)
    delta = spark.createDataFrame(
        [(100 + i, f"some text body {i} with words") for i in range(5)],
        "doc_id long, text string",
    )
    inv_d, sizes_d, _sh = ix._delta_state(delta)
    man = ix._manifest()
    pr = ix._pair_rows(inv_d, ix._read(man["inv"]), self_join=False).unionByName(
        ix._pair_rows(inv_d, inv_d, self_join=True)
    )
    p6 = plan_of(ix._edges(pr, sizes_d))
    sections.append((
        "Incremental dedup add: delta-vs-stored edge generation",
        p6,
        [
            ("no cartesian/nested-loop product anywhere in the plan",
             r"^(?:(?!CartesianProduct|BroadcastNestedLoop)(.|\n))*$"),
            ("stored index side is a bare parquet scan (no re-shingling)",
             r"Scan parquet"),
        ],
    ))

    # 7. durable IVF index: search reads ONLY probed list partitions —
    # the scan must carry a static cid IN (...) partition filter
    from debezium_incubator_spark.functions.ann_index import IVFIndex

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    ivx = IVFIndex(spark, f"{base}/ivf", init="hash_sample", n_centroids=8)
    ivx.build(emb.filter(F.col("vec_id") < 40))
    ivx.add(emb.filter(F.col("vec_id") >= 40))
    p7 = plan_of(ivx.search(emb.filter(F.col("vec_id") < 3), k=3, n_probe=2))
    sections.append((
        "Durable IVF index search (partition-pruned list read)",
        p7,
        [
            ("probed-cid set pushed as a static partition filter",
             r"PartitionFilters: \[cid#\d+ IN \("),
            ("no cartesian on the list join (centroids ride a broadcast row)",
             r"^(?:(?!CartesianProduct)(.|\n))*$"),
        ],
    ))

    # 7b. the same search after compact(): ONE batch dir, zero
    # tombstone anti-joins, pruning intact — the post-maintenance shape
    ivx.remove(emb.filter(F.col("vec_id") % 9 == 0).select("vec_id"))
    ivx.compact()
    p7b = plan_of(ivx.search(emb.filter(F.col("vec_id") < 3), k=3, n_probe=2))
    sections.append((
        "Durable IVF index search after compact()",
        p7b,
        [
            ("probed-cid set still a static partition filter",
             r"PartitionFilters: \[cid#\d+ IN \("),
            ("tombstone anti-joins are gone (compaction applied them)",
             r"^(?:(?!LeftAnti)(.|\n))*$"),
        ],
    ))

    # 8. feature-hashed n-gram embedding: a pure projection — the
    # encoder must ride the scan with NO shuffle and NO Python worker
    from debezium_incubator_spark.functions.text import with_hashed_ngram_embedding

    p8 = plan_of(with_hashed_ngram_embedding(docs, dim=16))
    sections.append((
        "Feature-hashed embedding (shuffle-free, JVM-only projection)",
        p8,
        [
            ("no exchange anywhere", r"^(?:(?!Exchange)(.|\n))*$"),
            ("no Python/Arrow eval (stays in codegen)",
             r"^(?:(?!BatchEvalPython|ArrowEvalPython)(.|\n))*$"),
        ],
    ))

    # 9. change-data-feed step: a commit touching ONE bucket of 8 must
    # read exactly that bucket's files at BOTH versions (manifest-level
    # pruning — at 100 TB the untouched 99% is never even listed) and
    # classify via a keyed full-outer join, never a cartesian
    from pyspark.sql import types as T

    from debezium_incubator_spark.lake.cdf import step_changes
    from debezium_incubator_spark.lake.table import LakeTable

    cdf_schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    ct = LakeTable.create(
        f"{base}/cdf_t", cdf_schema, bucket_cols=["repo", "path"], num_buckets=8
    )
    crows = spark.createDataFrame(
        [(f"r{i}", f"p{i}", i) for i in range(80)], cdf_schema
    )
    ct.commit(ct.with_bucket(crows), replace_buckets=range(8), summary={})
    cb0 = ct.read(spark, buckets=[0]).withColumn("v", F.col("v") + 1)
    ct.commit(ct.with_bucket(cb0), replace_buckets=[0], summary={})
    p9 = plan_of(step_changes(ct, spark, 2, ["repo", "path"]))
    sections.append((
        "Change-data-feed step (bucket-diff-pruned two-version read)",
        p9,
        [
            ("scans list only the changed bucket's files",
             r"InMemoryFileIndex \[file:[^\]]*_bucket=0[^\]]*\]"),
            ("no other bucket's files are listed anywhere",
             r"^(?:(?!_bucket=[1-7])(.|\n))*$"),
            ("classification is a keyed full-outer join, no cartesian",
             r"Join type: FullOuter"),
            ("no cartesian product",
             r"^(?:(?!CartesianProduct)(.|\n))*$"),
        ],
    ))

    # 10. incremental view fold: union-reaggregate, NOT a join — one
    # partial-aggregated exchange of ~|view|+|batch| rows, skew-proof;
    # (a broadcast full-outer join is impossible in Spark, so a
    # join-based fold silently shuffles the view through SMJ)
    from debezium_incubator_spark.operators.aggregates import agg_view, agg_view_apply

    vst = spark.createDataFrame(
        [(i, f"g{i % 5}", i * 10) for i in range(50)], "k int, g string, cents long"
    )
    aview = agg_view(vst, ["g"], ["cents"], ["cents"]).localCheckpoint()
    vins = spark.createDataFrame([(99, "g1", 7)], "k int, g string, cents long")
    vret = spark.createDataFrame([], "k int, g string, cents long")
    p10 = plan_of(
        agg_view_apply(aview, vins, vret, ["g"], ["cents"], ["cents"], state=None)
    )
    sections.append((
        "Incremental view fold (join-free union-reaggregate)",
        p10,
        [
            ("no join anywhere in the fold", r"^(?:(?!Join)(.|\n))*$"),
            ("partial-then-final hash aggregate (map-side combine)",
             r"HashAggregate(?:(.|\n))*Exchange(?:(.|\n))*HashAggregate"),
        ],
    ))

    out = ["# PLANS — physical-plan audit (generated by scripts/explain_audit.py)\n"]
    for title, plan, checks in sections:
        out.append(f"\n## {title}\n")
        for desc, pat in checks:
            ok = re.search(pat, plan) is not None
            mark = "✅" if ok else "❌"
            out.append(f"- {mark} {desc}\n")
            if not ok:
                failures.append(f"{title}: {desc}")
        out.append("\n```\n" + plan.strip()[:4000] + "\n```\n")

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.writelines(out)
    print("failures:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
