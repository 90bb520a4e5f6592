"""Document deduplication at training-data scale.

Four strategies, each chosen for a different scale/accuracy point:

* exact           — sha256 hash-groupBy; one shuffle keyed on the hash.
* n-gram Jaccard  — exact set similarity via a shingle-inverted-index
                    self-join; quadratic only within shared shingles.
* MinHash + LSH   — shingle→minhash signature→banded bucket join; the
                    100 TB path: candidate generation never compares
                    documents pairwise, only bucket-collided ones.
* SimHash         — 64-bit near-dup fingerprint; hamming-band join.

Everything is native Column/aggregate work (codegen); no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """Deterministic tokenization shared by all strategies (and by the
    DuckDB oracles): lowercase, non-alnum → space, split."""
    cleaned = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    return F.when(F.length(cleaned) == 0, F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles."""
    toks = _tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )
    # sequence(1, k) is DESCENDING for k<1 — guard short docs explicitly
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


# ------------------------------------------------------------------ exact

def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: keeper = min id per content hash.
    One hash-shuffle; skew-free (hash keys are uniform)."""
    h = F.lower(F.sha2(F.col(text_col), 256))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# ------------------------------------------------------------------ jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted index:
    explode shingles → self-join on shingle → count co-occurrences →
    |A∩B| / (|A|+|B|−|A∩B|). The join is on the shingle value, so only
    documents sharing a shingle ever meet (no cross join)."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    sizes = sh.select("id", F.size("shingles").alias("n_sh"))
    inv = sh.select("id", F.explode("shingles").alias("shingle"))
    co = (
        inv.alias("a")
        .join(inv.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        co.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


# ------------------------------------------------------------------ minhash/LSH

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """num_perm-wide MinHash signature per doc. Implemented as ONE
    aggregate over the exploded shingle index with num_perm min()
    columns — a single shuffle keyed on the doc id, partial-aggregated
    map-side (each task reduces its shingles before moving data)."""
    inv = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sig = inv.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Banded LSH candidate generation + exact-Jaccard verification.

    Scale path: docs land in (band, band_hash) buckets; only bucket
    collisions produce candidate pairs, verified against real shingle
    sets. With r=num_perm/bands rows per band the collision curve is the
    classic (1-(1-s^r)^b)."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm, shingle_n, seed)
    band_entries = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    cands = (
        band_entries.alias("a")
        .join(band_entries.alias("b"), ["band", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify candidates with exact jaccard over shingle sets
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_n).alias("sh")
    )
    out = (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


# ------------------------------------------------------------------ simhash

def simhash64(text: Column) -> Column:
    """64-bit SimHash from token hashes: per bit, sum ±1 weighted votes
    over tokens; bit set when the vote is positive. Pure aggregate-free
    Column expression (higher-order functions fold over the token
    array), so it rides inside codegen per row."""
    toks = _tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit(i: int) -> Column:
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        return F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for i in range(64):
        out = out + F.shiftleft(bit(i), i)
    return out


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into `bands` chunks —
    any pair within hamming ≤ bands-1 shares at least one exact chunk
    (pigeonhole), so the candidate join is an equality join on
    (band, chunk), never a cross join. Verified with exact popcount."""
    width = 64 // bands
    sh = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("simhash"))
    chunks = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    cands = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["band", "chunk"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
