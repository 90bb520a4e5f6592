"""Text-analysis functions for training-data pipelines.

All hot-path expressions are JVM-side Column ops (whole-stage codegen);
the only pandas UDF is the rolling-hash fingerprint where a loop over
characters is genuinely needed. Every oracle-checked function is written
so the identical formula is expressible in ANSI SQL (DuckDB parity):
explicit character classes, explicit tie-break order, round(…, 4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# deliberately explicit classes — \w/\s differ between regex engines
WORD_RE = "[A-Za-z0-9]+"
BPE_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]"
PUNCT_RE = "[^A-Za-z0-9 \\t\\n\\r]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "los", "de", "que", "y", "una", "por", "con"],
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, "[ \\t\\n\\r]+"))
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks."""
    return F.regexp_count(text, F.lit(BPE_RE))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        *[c for c in df.columns if c != text_col],
        ws_token_count(t).alias("ws_tokens"),
        bpe_token_count(t).alias("bpe_tokens"),
        F.length(t).alias("char_count"),
    )


def _stop_hits(text_lower: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text_lower, F.lit(pat))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation + low
    punctuation density + stopword presence. Formula is fixed and
    documented so the DuckDB oracle computes the identical expression."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    punct = F.regexp_count(t, F.lit(PUNCT_RE)).cast("double")
    words = ws_token_count(t).cast("double")
    stops = _stop_hits(F.lower(t), STOPWORDS["en"]).cast("double")
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(words > 0, stops / words).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(500.0))
        + F.lit(0.4) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(5.0)))
        + F.lit(0.2) * F.least(F.lit(1.0), stop_ratio * F.lit(8.0))
    )
    return df.select(
        *[c for c in df.columns if c != text_col],
        n.cast("long").alias("n_chars_m"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free language ID heuristic: stopword-hit argmax with a
    fixed tie-break order (en > de > fr > es), 'und' (undetermined) when
    no dictionary hits at all."""
    t = F.lower(F.col(text_col))
    hits = {lg: _stop_hits(t, ws) for lg, ws in STOPWORDS.items()}
    best = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]), F.lit("de"))
        .when(hits["fr"] >= hits["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    total = hits["en"] + hits["de"] + hits["fr"] + hits["es"]
    return df.select(
        *[c for c in df.columns if c != text_col],
        F.when(total == 0, F.lit("und")).otherwise(best).alias("pred_lang"),
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["fr"].alias("hits_fr"),
        hits["es"].alias("hits_es"),
    )


@pandas_udf(T.LongType())
def rolling_fingerprint(s: pd.Series) -> pd.Series:
    """Polynomial (Karp-Rabin) document fingerprint, NUMPY-vectorized.

    fp = Σ byte_i · BASE^(n-1-i) (mod p) evaluated as a vectorized
    power-sum — no per-byte Python loop. Computed independently under two
    Mersenne-31 moduli and packed into one 62-bit long (single-modulus
    31-bit would collide too easily for a dedup pre-filter). byte·P < 2^39
    and partial sums of ≤2^24 terms stay inside uint64, so the arithmetic
    is exact; longer documents reduce chunk-wise."""
    import numpy as np

    P1, P2 = (1 << 31) - 1, (1 << 29) - 3
    BASE = 1_000_003
    CHUNK = 1 << 24

    pows: dict[int, np.ndarray] = {P1: np.array([1], dtype=np.uint64),
                                   P2: np.array([1], dtype=np.uint64)}

    def powers(p: int, n: int) -> np.ndarray:
        cur = pows[p]
        if len(cur) < n:
            ext = [int(cur[-1])]
            for _ in range(n - len(cur)):
                ext.append(ext[-1] * BASE % p)
            cur = np.concatenate([cur[:-1], np.array(ext, dtype=np.uint64)])
            pows[p] = cur
        return cur

    def fp_mod(b: np.ndarray, p: int) -> int:
        n = len(b)
        P = powers(p, n)[:n][::-1]
        acc = 0
        for i in range(0, n, CHUNK):
            terms = (b[i : i + CHUNK] * P[i : i + CHUNK]) % p
            acc = (acc + int(terms.sum())) % p
        return acc

    def fp(v):
        if v is None:
            return None
        b = np.frombuffer(v.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        return (fp_mod(b, P1) << 31) | fp_mod(b, P2)

    return s.map(fp)


def doc_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        *[c for c in df.columns if c != text_col],
        rolling_fingerprint(F.col(text_col)).alias("fingerprint"),
        F.lower(F.sha2(F.col(text_col), 256)).alias("sha256"),
    )


def with_hashed_ngram_embedding(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Append a feature-hashed word-n-gram embedding (the hashing trick,
    Weinberger et al. 2009): every distinct shingle lands in dimension
    ``pmod(xxhash64(s), dim)`` with a ±1 sign hash, summed, then
    L2-normalized — so cosine over the output approximates n-gram-set
    Jaccard structure. A PURE PROJECTION: no shuffle, no Python, fully
    whole-stage-codegen (asserted in tests) — at 100 TB embedding
    generation rides the same scan as the rest of the row transforms.
    This is the deterministic stand-in for a neural encoder; a real
    model swaps in as a mapInPandas stage with the same (id, vector)
    contract (`multimodal.py` documents that seam).

    NULL text → NULL embedding (delete images); empty/short text → the
    zero vector. Reuses the re-evaluation-safe shingle pipeline
    (`dedup_text.shingles_from_tokens` — see its Catalyst notes)."""
    from debezium_incubator_spark.functions.dedup_text import (
        _tokens,
        shingles_from_tokens,
    )

    sh = (
        df.withColumn("__tk", _tokens(F.col(text_col)))
        .withColumn("__sh", shingles_from_tokens(F.col("__tk"), shingle_n))
        .drop("__tk")
    )

    def sign(s):
        return F.when(
            F.pmod(F.xxhash64(s, F.lit("sign")), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))

    folded = sh.withColumn(
        "__e",
        F.aggregate(
            F.col("__sh"),
            F.array_repeat(F.lit(0.0), dim),
            # O(dim) cheap hash re-evals per shingle — never a reference
            # back into the shingle pipeline itself
            lambda acc, s: F.transform(
                acc,
                lambda x, i: x
                + F.when(F.pmod(F.xxhash64(s), F.lit(dim)) == i, sign(s)).otherwise(
                    F.lit(0.0)
                ),
            ),
        ),
    ).drop("__sh")
    norm = F.sqrt(F.aggregate(F.col("__e"), F.lit(0.0), lambda a, x: a + x * x))
    return folded.withColumn(
        out_col,
        F.transform(F.col("__e"), lambda x: x / F.greatest(norm, F.lit(1e-12))),
    ).drop("__e")
