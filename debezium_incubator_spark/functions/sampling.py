"""Training-data set construction: deterministic splits, stratified
sampling, benchmark-contamination detection.

These are the set-level operators a 100 TB training pipeline runs after
dedup/quality filtering:

* ``hash_split`` — train/val/test assignment as a PURE FUNCTION of the
  document id (salted hash bucketing): reproducible across runs and
  clusters, no shuffled RNG state, stable under re-partitioning — the
  property ``DataFrame.randomSplit`` does NOT give (its sampling is
  partition-order dependent). One projection, no shuffle.
* ``stratified_sample`` — per-stratum deterministic rate sampling by the
  same salted-hash trick; at scale this is a scan + filter (no groupBy),
  with exact per-stratum rates in expectation and zero coordination.
* ``ngram_contamination`` — flag training documents that share ≥ k
  consecutive-word n-grams with an evaluation benchmark (the standard
  13-gram collision test from GPT-3/PaLM data decontamination): an
  inverted-index equality join on the n-gram — only documents sharing a
  gram ever meet, the benchmark side is tiny and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_incubator_spark.functions.dedup_text import _tokens, shingles_from_tokens


def split_bucket(id_col: Column, seed: int = 42, buckets: int = 10_000) -> Column:
    """Deterministic uniform bucket in [0, buckets) from the id — the
    salted-hash primitive under hash_split/stratified_sample.

    md5-based (56-bit, big-endian hex slice) rather than xxhash64: a
    split assignment must be reproducible ACROSS ENGINES AND YEARS —
    any system that can md5 a string re-derives the same buckets
    (DuckDB: ``('0x'||substr(md5(seed||'|'||id),17,14))::BIGINT % buckets``),
    which is also exactly what the driver oracle does."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), id_col.cast("string"))), 17, 14),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    buckets: int = 10_000,
) -> DataFrame:
    """Assign every row to a named split with probability ∝ weight,
    deterministically in (id, seed). Weights need not sum to 1 (they are
    normalized). Adds a ``split`` column; one stateless projection."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = split_bucket(F.col(id_col), seed, buckets)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * buckets
        cond = b < F.lit(int(round(acc)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 42,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically in
    (id, seed): scan + filter, no shuffle, exact reproducibility.
    Strata absent from ``rates`` use ``default_rate``."""
    b = split_bucket(F.col(id_col), seed, buckets)
    rate = F.lit(float(default_rate))
    for k, v in rates.items():
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(b < rate * F.lit(float(buckets)))


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Documents sharing ≥ ``min_hits`` distinct word n-grams with any
    benchmark document (GPT-3-style 13-gram decontamination). Returns
    (train doc id, benchmark doc id, n shared grams). The benchmark side
    is small → its exploded gram index broadcasts; the train side is one
    scan + explode, met only on equal grams."""
    # grams ride as xxhash64 longs: the join, distinct and per-pair
    # distinct-count only need equality, and fixed-width longs beat the
    # ~50-char 13-gram strings through the broadcast and the aggregation
    # (guide §2.3 "narrower types"; same accepted collision class as the
    # MinHash/shingle-index hashing — 2⁻⁶⁴ per distinct-gram pair)
    def grams(df, alias):
        toks = df.select(F.col(id_col).alias(alias), _tokens(F.col(text_col)).alias("__tk"))
        return toks.select(
            alias,
            F.explode(
                F.transform(
                    shingles_from_tokens(F.col("__tk"), n), lambda g: F.xxhash64(g)
                )
            ).alias("gram"),
        )

    t = grams(train, "train_id")
    b = grams(benchmark, "bench_id").distinct()
    hits = (
        t.join(F.broadcast(b), "gram")
        .groupBy("train_id", "bench_id")
        .agg(F.count_distinct("gram").alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_hits)
    )
    return hits.select("train_id", "bench_id", "shared_grams")
