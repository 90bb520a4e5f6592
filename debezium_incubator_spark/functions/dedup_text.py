"""Document deduplication at training-data scale.

Four strategies, each chosen for a different scale/accuracy point:

* exact           — sha256 hash-groupBy; one shuffle keyed on the hash.
* n-gram Jaccard  — exact set similarity via a shingle-inverted-index
                    self-join; quadratic only within shared shingles,
                    with a document-frequency cap so one ubiquitous
                    shingle (license header, blank-ish line) cannot
                    create a quadratic hot-key blowup at 100 TB.
* MinHash + LSH   — shingle→minhash signature→banded bucket join; the
                    100 TB path: candidate generation never compares
                    documents pairwise, only bucket-collided ones.
* SimHash         — 64-bit near-dup fingerprint; hamming-band join.

Everything is native Column/aggregate work (codegen); no per-row Python.

Hashing cost discipline (the at-scale hot loop): every strategy hashes
each variable-length string (shingle/token) EXACTLY ONCE; all derived
values (the 64 MinHash permutations, the 64 SimHash bit votes) are cheap
fixed-width long operations on that one hash.
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


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array, built as
    zip_with chains over shifted slices — NO per-element references back
    to ``toks``.

    Why this shape: Catalyst re-inlines projected expressions when it
    moves predicates (CollapseProject/PushDownPredicates), and
    InferFiltersFromGenerate plants an implicit `size(...) > 0` filter
    under every explode of this expression — there is no way to stop the
    tokenizer from being re-evaluated inside pushed-down copies. The old
    `transform(sequence, i -> element_at(toks, i+j))` form re-evaluated
    its ARGUMENT (potentially the whole tokenize pipeline) once per
    element per n — measured as a 40+ s single-task pre-shuffle Filter
    at sf0.1. Here each re-evaluation costs n slices + n−1 zip_with over
    the array — O(n·tokens) total, safe to inline anywhere.

    zip_with pads the shorter side with nulls (concat_ws skips them), so
    the trailing partial grams are sliced off at the end; the size<n
    guard costs one more cheap re-evaluation at worst."""
    grams = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(grams, 1, F.size(toks) - (n - 1))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(full)
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles straight from text. Convenience/API
    form — the batch operators below go through ``shingles_from_tokens``
    over a projected token column instead (see its docstring)."""
    return shingles_from_tokens(_tokens(text), n)


def portable_token_hash(t: Column) -> Column:
    """56-bit token hash computable identically in Spark AND DuckDB
    (`('0x' || substr(md5(t), 17, 14))::BIGINT` on the DuckDB side) —
    used by the driver-oracle variants so the full SimHash pipeline is
    verifiable bit-for-bit across engines. The engine default stays
    xxhash64 (cheaper); only the hash expression swaps."""
    return F.conv(F.substring(F.md5(t), 17, 14), 16, 10).cast("long")


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

def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # Two projections: tokens materialize first, shingles read the column
    # (CollapseProject keeps them apart because __tk is multi-referenced).
    # Deliberately NO `filter(size(sh) > 0)` here: Catalyst pushes such a
    # filter below both projections, inlining the whole shingle pipeline
    # (with its per-element re-tokenization) into a pre-shuffle Filter —
    # measured as a 50 s single-task stage at sf0.1. Empty shingle sets
    # are harmless downstream: explode() drops them and the verify joins
    # never meet them.
    toks = df.select(F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__tk"))
    return toks.select("id", shingles_from_tokens(F.col("__tk"), n).alias("sh"))


def _verify_jaccard(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    the full shingle sets. Filter on the UNROUNDED ratio (matching the
    DuckDB oracle); round only in the final select."""
    out = (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "__j",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("__j") >= threshold)
    )
    return out.select("id_a", "id_b", F.round("__j", 4).alias("jaccard"))


def _capped_inverted_index(sh: DataFrame, df_cap: int | None) -> DataFrame:
    """Explode shingle sets into the skinny (id, shingle-HASH) inverted
    index, dropping shingles whose document frequency exceeds ``df_cap``
    (the 100 TB boilerplate guard — see ``ngram_jaccard_pairs``). With a
    cap the ``__df`` count rides along for the salted heavy-shingle
    split.

    The index carries ``xxhash64(shingle)`` instead of the string:
    every consumer (df-cap count, self-join, salt split) only needs
    EQUALITY, and fixed-width longs shuffle/sort/hash several times
    faster than variable-length shingle strings (guide §2.3 "narrower
    types" — measured 39 s → 13 s for the sf1.0 co-occurrence join+agg).
    Two distinct shingles colliding (2⁻⁶⁴ per pair, ~10⁻⁸ for a 10⁹-
    shingle corpus) could overcount one pair's ``inter`` by 1 — the same
    accepted-risk class as the MinHash/SimHash hashing this module
    already runs on; the driver-oracle corpora are verified identical."""
    inv = sh.select(
        "id",
        F.explode(F.transform(F.col("sh"), lambda s: F.xxhash64(s))).alias("shingle"),
    )
    if df_cap is not None:
        keep = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= df_cap)
        )
        inv = inv.join(keep, "shingle")
    return inv


def _cooccurrence_counts(
    inv: DataFrame,
    df_cap: int | None,
    skew_df_threshold: int,
    skew_salts: int,
    agg_partitions: int | None = None,
) -> DataFrame:
    """Per-pair shared-shingle counts from a (persisted) inverted index:
    self-join on shingle hash → count per (id_a, id_b). Shingles with
    df > ``skew_df_threshold`` take the salted self-join (left side
    salted by hash(id), right side replicated per salt) so one hot
    shingle's df² fan-out spreads over ``skew_salts`` tasks instead of
    one reducer — see ``ngram_jaccard_pairs`` for the full rationale.

    The pair aggregation is the volume wall (Σ df² rows, nearly all
    distinct — map-side partial aggregation reduces almost nothing and
    its overflowing hash tables fall back to sort-based spill). Two
    measured fixes (sf1.0: 24 s → 9 s):

    * when both ids are non-negative integers < 2³², the pair is PACKED
      into one long (id_a << 32 | id_b) so the aggregate hashes one
      primitive key instead of a two-column row (bounds probed with one
      cheap agg over the persisted index; non-integral or out-of-range
      ids fall back to the two-column key);
    * the aggregation is hash-repartitioned over ``agg_partitions``
      (default 4× defaultParallelism — scale-adaptive, not a local
      constant) BEFORE grouping, so per-task hash tables stay small
      instead of spilling, and the exchange moves the raw pair rows
      (barely wider than the post-partial rows it replaces)."""
    spark = inv.sparkSession
    id_type = dict(inv.dtypes)["id"]
    packable = id_type in ("tinyint", "smallint", "int", "bigint")
    if packable:
        lo, hi = inv.agg(F.min("id"), F.max("id")).first()
        packable = lo is not None and int(lo) >= 0 and int(hi) < (1 << 32)
    if packable:
        group_cols = ["pk"]

        def pair_sel(a_id, b_id):
            return [
                F.shiftleft(a_id.cast("long"), 32)
                .bitwiseOR(b_id.cast("long"))
                .alias("pk")
            ]

    else:
        group_cols = ["id_a", "id_b"]

        def pair_sel(a_id, b_id):
            return [a_id.alias("id_a"), b_id.alias("id_b")]

    def _pair_rows(idx, join_keys):
        return (
            idx.alias("a")
            .join(idx.alias("b"), join_keys)
            .filter(F.col("a.id") < F.col("b.id"))
            .select(*pair_sel(F.col("a.id"), F.col("b.id")))
        )

    if df_cap is not None and df_cap > skew_df_threshold:
        light = inv.filter(F.col("__df") <= skew_df_threshold)
        heavy = inv.filter(F.col("__df") > skew_df_threshold)
        heavy_a = heavy.withColumn(
            "__salt", F.pmod(F.xxhash64("id"), F.lit(skew_salts)).cast("int")
        )
        heavy_b = heavy.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(skew_salts - 1)))
        )
        heavy_pairs = (
            heavy_a.alias("a")
            .join(heavy_b.alias("b"), ["shingle", "__salt"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(*pair_sel(F.col("a.id"), F.col("b.id")))
        )
        pair_rows = _pair_rows(light, ["shingle"]).unionByName(heavy_pairs)
    else:
        pair_rows = _pair_rows(inv, ["shingle"])
    if agg_partitions is None:
        agg_partitions = 4 * spark.sparkContext.defaultParallelism
    co = (
        pair_rows.repartition(agg_partitions, *group_cols)
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if packable:
        co = co.select(
            F.shiftrightunsigned(F.col("pk"), 32).cast(id_type).alias("id_a"),
            F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).cast(id_type).alias("id_b"),
            "inter",
        )
    return co


def shingle_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 3,
    df_cap: int | None = 1000,
    eager_cleanup: bool = True,
    skew_df_threshold: int = 256,
    skew_salts: int = 16,
) -> DataFrame:
    """(id_a, id_b, inter) pairs sharing ≥ ``min_overlap`` distinct
    n-gram shingles — an ABSOLUTE-overlap edge generator, vs the RATIO
    thresholds of Jaccard/MinHash.

    Why it exists: ratio edges are bimodal on near-copy corpora (a pair
    is either ~0.9 or ~0.02), so their duplicate graph is all cliques.
    Absolute-overlap edges also connect documents that merely share a
    boilerplate block (license header, template preamble) — a chain-y,
    transitive relation that is what ``dedup_clusters`` (connected
    components) exists to close over. Same machinery and skew handling
    as ``ngram_jaccard_pairs``: inverted index, df-cap, salted heavy
    shingles; only the final filter differs (inter ≥ k instead of a
    Jaccard ratio)."""
    from debezium_incubator_spark.functions._cache import scoped

    sh = _shingle_sets(df, id_col, text_col, n)
    inv = scoped(_capped_inverted_index(sh, df_cap), eager_cleanup)
    co = _cooccurrence_counts(inv, df_cap, skew_df_threshold, skew_salts)
    return co.filter(F.col("inter") >= min_overlap).select("id_a", "id_b", "inter")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = 1000,
    eager_cleanup: bool = True,
    skew_df_threshold: int = 256,
    skew_salts: int = 16,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted index:
    explode shingles → self-join on shingle → per-pair co-occurrence
    count → |A∩B| / (|A|+|B|−|A∩B|). Only skinny (id, shingle) rows ever
    shuffle; the join meets only documents sharing a shingle.

    ``df_cap`` drops shingles whose document frequency exceeds the cap
    from the index BEFORE the self-join: a shingle shared by 10^6
    documents would otherwise produce 10^12 join rows on one key. The df
    count is a partial-aggregated groupBy (skew-safe). With a cap active,
    intersections over capped shingles are not counted, so a boundary
    pair whose overlap is mostly boilerplate is (conservatively) missed —
    never overcounted. ``df_cap=None`` is fully exact; the default 1000
    is far above any df in the test corpora (max 25 at sf0.1), so results
    there are exact AND the DuckDB oracle mirrors the same cap.

    Boundary-skew handling (VERDICT r2 #4): a shingle AT the cap still
    fans out df² join rows on ONE key — ~10^6 rows in a single task at
    the default cap, a hot reducer on boilerplate-heavy corpora. Shingles
    with df > ``skew_df_threshold`` therefore take a SALTED self-join:
    the left side gets salt = hash(id) % skew_salts, the right side is
    replicated once per salt, and the join keys on (shingle, salt) — each
    pair still meets exactly once (at the left doc's salt), but the df²
    fan-out spreads over skew_salts tasks. Light shingles skip the
    replication entirely. Requires the df counts, so it applies only
    when ``df_cap`` is set."""
    from debezium_incubator_spark.functions._cache import scoped

    # the shingle frame feeds BOTH the size table and the inverted
    # index — scope it so the tokenize+shingle pipeline runs once
    sh = scoped(_shingle_sets(df, id_col, text_col, n), eager_cleanup)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    # the skinny (id, hash) index feeds both sides of the self-join
    # (and the df-cap count) — scope it so the cap join runs once
    inv = scoped(_capped_inverted_index(sh, df_cap), eager_cleanup)
    co = _cooccurrence_counts(inv, df_cap, skew_df_threshold, skew_salts)
    out = (
        co.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "__j",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("__j") >= threshold)
    )
    return out.select("id_a", "id_b", F.round("__j", 4).alias("jaccard"))


# ------------------------------------------------------------------ minhash/LSH

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    df_cap: int | None = None,
) -> DataFrame:
    """num_perm-wide MinHash signature per doc.

    Each shingle string is hashed ONCE (xxhash64 → long); the num_perm
    "permutations" are cheap fixed-width rehashes of that long
    (xxhash64(h, i) — the ANSI-safe equivalent of the classic affine
    (a_i·h + b_i) mod p construction, which Spark 4's ANSI mode would
    reject for its deliberate int64 wraparound). One aggregate with
    num_perm min() columns — a single shuffle keyed on the doc id,
    partial-aggregated map-side (each task reduces its shingles before
    moving data).

    ``df_cap`` drops ubiquitous shingles (document frequency > cap) from
    the signature input — at 100 TB a boilerplate shingle otherwise drags
    every document's min-hashes toward the same values."""
    sh = _shingle_sets(df, id_col, text_col, shingle_n)
    return _minhash_from_sets(sh, num_perm, seed, df_cap)


def _minhash_from_sets(
    sh: DataFrame, num_perm: int, seed: int, df_cap: int | None
) -> DataFrame:
    """Signature aggregation from an (id, sh) shingle-set frame — split
    out so ``minhash_lsh_pairs`` can derive BOTH the signatures and the
    exact-Jaccard verification from one persisted shingle frame instead
    of running the tokenize+shingle pipeline twice."""
    if df_cap is None:
        inv = sh.select(
            "id",
            F.explode(
                F.transform(F.col("sh"), lambda s: F.xxhash64(s, F.lit(seed)))
            ).alias("__h"),
        )
    else:
        # hash at explode time: the df-cap count and join only need
        # equality, and fixed-width longs beat shingle strings through
        # the shuffle (guide §2.3; same trade as _capped_inverted_index)
        raw = sh.select(
            "id",
            F.explode(
                F.transform(F.col("sh"), lambda s: F.xxhash64(s, F.lit(seed)))
            ).alias("__h"),
        )
        keep = (
            raw.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= df_cap)
            .select("__h")
        )
        inv = raw.join(keep, "__h")
    mins = [
        F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"h{i}") for i in range(num_perm)
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
    df_cap: int | None = None,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Banded LSH candidate generation + exact-Jaccard verification.

    Scale path: docs land in (band, band_hash) buckets; only bucket
    collisions produce candidate pairs, verified against real shingle
    sets. With r=num_perm/bands rows per band the collision curve is the
    classic (1-(1-s^r)^b) — at b=16/r=4 a true pair with s=0.9 is missed
    with probability 4e-8, which is why the driver oracle for this query
    can be the exact-Jaccard result set (equality, not containment).

    ``df_cap`` (optional) additionally drops ubiquitous shingles from the
    signature input — at 100 TB a boilerplate shingle otherwise drags
    every document's min-hashes toward the same values."""
    from debezium_incubator_spark.functions._cache import scoped

    rows_per_band = num_perm // bands
    # ONE scoped shingle frame feeds both the signature aggregation
    # and the exact-Jaccard verification below — the tokenize+shingle
    # pipeline used to run twice (once inside minhash_signatures, once
    # for the verify sets)
    sh = scoped(_shingle_sets(df, id_col, text_col, shingle_n), eager_cleanup)
    # both sides of the band self-join (and nothing else) read sig —
    # scope the slim (id, 64×long) rows so the signature aggregation
    # runs once, not once per join side
    sig = scoped(_minhash_from_sets(sh, num_perm, seed, df_cap), eager_cleanup)
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
    # verify candidates with exact jaccard over the SAME scoped
    # shingle sets the signatures were derived from; the result stays
    # lazy — the caller's one action computes it once
    return _verify_jaccard(cands, sh, threshold)


# ------------------------------------------------------------------ simhash

def _simhash_from_hashes(hashes: Column, n_tokens: Column, bits: int) -> Column:
    """Fold a MATERIALIZED array<long> of token hashes into a ``bits``-wide
    SimHash: per bit, sum ±1 weighted votes; bit set when the vote is
    positive (votes_i > 0 ⇔ 2·set_count_i > n_tokens). ONE pass over the
    hash array with an array<long> set-count accumulator — the old form
    ran 64 separate folds, rehashing every token 64 times."""
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    counts = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("long")
                    for i in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    # powers of two as literals; bit 63 is the wrapped negative long —
    # summing distinct powers never overflows (it's a bitwise OR in
    # disguise), so this stays ANSI-safe
    p2 = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(bits)
        ]
    )
    contribs = F.zip_with(
        counts, p2, lambda c, p: F.when(c * 2 > n_tokens, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(contribs, F.lit(0).cast("long"), lambda acc, v: acc + v)


def simhash64(text: Column, bits: int = 64, token_hash=None) -> Column:
    """``bits``-wide SimHash straight from a text column (API form; the
    batch operator below projects token hashes into a column first so the
    tokenizer runs exactly once per row).

    ``token_hash`` swaps the per-token hash expression (default
    xxhash64; ``portable_token_hash`` for cross-engine oracles, with
    ``bits=56``)."""
    token_hash = token_hash or (lambda t: F.xxhash64(t))
    toks = _tokens(text)
    return _simhash_from_hashes(
        F.transform(toks, token_hash), F.size(toks).cast("long"), bits
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 64,
    token_hash=None,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the ``bits`` into ``bands`` chunks —
    any pair within hamming ≤ bands-1 shares at least one exact chunk
    (pigeonhole), so the candidate join is an equality join on
    (band, chunk), never a cross join. Verified with exact popcount.

    With ``max_hamming <= bands - 1`` the banding is COMPLETE: the output
    is exactly every pair with simhash-hamming ≤ max_hamming (this is
    what makes the portable-hash variant oracle-checkable as an equality
    against an all-pairs DuckDB popcount)."""
    from debezium_incubator_spark.functions._cache import scoped

    width = bits // bands
    token_hash = token_hash or (lambda t: F.xxhash64(t))
    toks = df.select(F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__tk"))
    hashed = toks.select(
        "id",
        F.transform(F.col("__tk"), token_hash).alias("__hs"),
        F.size(F.col("__tk")).cast("long").alias("__n"),
    )
    # both sides of the chunk self-join read the fingerprints — scope
    # the slim (id, long) rows so the tokenize+fold pipeline runs once
    sh = scoped(
        hashed.select(
            "id", _simhash_from_hashes(F.col("__hs"), F.col("__n"), bits).alias("simhash")
        ),
        eager_cleanup,
    )
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
    # Dedup WITHOUT a shuffle: a pair colliding in k bands used to ride
    # k times into a .distinct() over (ids, fingerprints) — on a
    # near-copy corpus that aggregation was the operator's wall (the
    # qualifying-pair set alone is quadratic-ish; sf1.0: 25M pairs, 150M+
    # candidate rows shuffled). Instead keep a candidate row only in the
    # pair's FIRST agreeing band — computable row-locally from the XOR
    # (array_position finds the first zero chunk), so each pair survives
    # exactly once and the join is the ONLY exchange; the hamming filter
    # also runs before any data moves again (guide §1.2: remove the
    # shuffle outright rather than speed it up).
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    # first agreeing band as a when-chain over the shifted XOR — no
    # per-row array allocation (this predicate runs once per candidate
    # row, ~150M times at sf1.0)
    first_band = F.lit(-1)
    for i in reversed(range(bands)):
        chunk_xor = F.shiftright(xor, i * width).bitwiseAND(F.lit((1 << width) - 1))
        first_band = F.when(chunk_xor == 0, F.lit(i)).otherwise(first_band)
    return (
        chunks.alias("a")
        .join(chunks.alias("b"), ["band", "chunk"])
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("hamming", F.bit_count(xor))
        .filter((F.col("hamming") <= max_hamming) & (F.col("band") == first_band))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "hamming",
        )
    )
