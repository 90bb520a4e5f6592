"""Set-construction operators: deterministic splits, stratified
sampling, benchmark decontamination."""

from pyspark.sql import functions as F

from debezium_incubator_spark.functions.sampling import (
    hash_split,
    ngram_contamination,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de").otherwise("fr").alias("lang"),
        F.concat(F.lit("document body text number "), F.col("id").cast("string")).alias("text"),
    )


def test_hash_split_deterministic_and_proportional(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b  # pure function of (id, seed)
    counts = {}
    for v in a.values():
        counts[v] = counts.get(v, 0) + 1
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.06 < counts["val"] / 2000 < 0.14
    # different seed → different assignment, same proportions
    c = {r["doc_id"]: r["split"] for r in hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7).collect()}
    assert c != a
    # repartitioning must not change the assignment (randomSplit fails this)
    d = {r["doc_id"]: r["split"] for r in hash_split(docs.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert d == a


def test_stratified_sample_rates(spark):
    docs = _docs(spark, 3000)
    out = stratified_sample(docs, {"en": 1.0, "de": 0.5}, "lang", default_rate=0.0)
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by["en"] == 1000          # rate 1.0 keeps every row
    assert 400 < by["de"] < 600      # ~0.5
    assert "fr" not in by            # default 0.0 drops the stratum
    # deterministic subset: sampled ids are stable
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in stratified_sample(docs, {"en": 1.0, "de": 0.5}, "lang").collect()}
    assert ids1 == ids2 | ids1  # second call default_rate=0.0 differs only via fr


def test_ngram_contamination_finds_verbatim_overlap(spark):
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog every single day"),
            (1, "completely unrelated content with no overlap whatsoever in it"),
            (2, "prefix words then the quick brown fox jumps over the lazy dog every single day"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog every single day")],
        "doc_id long, text string",
    )
    hits = {
        (r["train_id"], r["bench_id"]): r["shared_grams"]
        for r in ngram_contamination(train, bench, n=8).collect()
    }
    assert (0, 100) in hits and (2, 100) in hits
    assert 1 not in {t for t, _ in hits}
    # doc 0 == benchmark verbatim: shares every one of its 12-8+1 = 5 8-grams
    assert hits[(0, 100)] == 5
