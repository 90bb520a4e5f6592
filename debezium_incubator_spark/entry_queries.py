"""Driver-contract queries: one entry per SURVEY.md §2 operator.

Each ``q_*`` takes (spark, sf_dir) and returns a DataFrame whose column
names/values match the DuckDB SQL in ``ORACLES`` exactly (the driver
hash-compares them at sf0.01). CDC operators are expressed over the
``events`` table (event_id ≙ offset, user_id ≙ key); training-data ops
run over ``documents``/``embeddings``. Where a callable drives real
engine code, the operator function is imported — these are not
re-implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_incubator_spark.functions.dedup_text import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from debezium_incubator_spark.functions.multimodal import extract_features, pack_media
from debezium_incubator_spark.functions.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dups,
    ivf_topk,
    lsh_ann_topk,
)
from debezium_incubator_spark.functions.text import lang_id, quality_score, token_counts
from debezium_incubator_spark.functions.text import BPE_RE, PUNCT_RE, STOPWORDS
from debezium_incubator_spark.operators.dedup import filter_processed, lww_latest
from debezium_incubator_spark.operators.envelope import (
    NO_TIMESTAMP,
    classify_row_op,
    deletion_ts_micros,
)
from debezium_incubator_spark.operators.filters import emit_tombstones, sanitize_name

# offset-skip marks used by d1 (per 4-way key partition)
D1_MARKS = {"0": 2000, "1": 4000, "2": 6000, "3": 8000}

_STOP_PAT = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/events.parquet")


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    # test-scale parquet is one small file → one input partition; spread
    # it so the shingle/hash pipelines use every core (at real scale the
    # scan splits naturally via maxPartitionBytes and this is a no-op
    # relative to the data volume)
    df = spark.read.parquet(f"{sf}/documents.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.read.parquet(f"{sf}/embeddings.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


# --------------------------------------------------------------- D operators

def q_d2_lww_dedup(spark, sf):
    """D2 — last-writer-wins per key (row_number()=1 / max_by)."""
    ev = _events(spark, sf).select("user_id", "event_id", "event_type", "value")
    out = lww_latest(ev, ["user_id"], ["event_id"], ["event_id", "event_type", "value"])
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def q_d1_offset_filter(spark, sf):
    """D1 — per-partition offset-skip replay guard."""
    ev = _events(spark, sf).withColumn(
        "part_bucket", F.pmod(F.col("user_id"), F.lit(4)).cast("int")
    )
    out = filter_processed(
        ev, D1_MARKS, bucket_col="part_bucket", offset_col="event_id", num_buckets=4
    )
    return out.select("event_id", "user_id", "part_bucket", "event_type")


def q_d4_max_offset_checkpoint(spark, sf):
    """D4 — per-partition max-offset high-water marks + counters."""
    ev = _events(spark, sf).withColumn(
        "part_bucket", F.pmod(F.col("user_id"), F.lit(4)).cast("int")
    )
    return ev.groupBy("part_bucket").agg(
        F.max("event_id").alias("max_offset"), F.count(F.lit(1)).alias("n_events")
    )


def q_d3_merge_effect(spark, sf):
    """D3 — upsert-apply effect: LWW per key, deletes drop the key."""
    ev = _events(spark, sf).withColumn(
        "op",
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u")),
    )
    latest = lww_latest(
        ev.select("user_id", "event_id", "op", "value"),
        ["user_id"],
        ["event_id"],
        ["event_id", "op", "value"],
    )
    return latest.filter(F.col("op") != "d").select(
        "user_id",
        F.col("op").alias("last_op"),
        F.col("event_id").alias("event_id"),
        F.col("value").alias("value"),
    )


def q_d6_snapshot_stream_handoff(spark, sf):
    """D6 — snapshot∪stream precedence: snapshot rows at offset -1 lose
    to any stream event for the same key."""
    ev = _events(spark, sf)
    snap = ev.groupBy("user_id").agg(F.min("value").alias("value")).select(
        F.lit(-1).cast("long").alias("event_id"), "user_id", F.lit("r").alias("op"), "value"
    )
    stream = ev.select("event_id", "user_id", F.lit("u").alias("op"), "value")
    both = snap.unionByName(stream)
    latest = lww_latest(both, ["user_id"], ["event_id"], ["event_id", "op", "value"])
    return latest.select("user_id", F.col("op").alias("src_op"), "event_id", "value")


# --------------------------------------------------------------- S operators

def q_d5_batch_slicing(spark, sf):
    """D5 — bounded emit batches: events sliced into max.batch.size=2048
    drain batches in offset order (BlockingEventQueue.java:44-59,
    CassandraConnectorConfig.java:186-187)."""
    ev = _events(spark, sf)
    batch_id = F.floor(F.col("event_id") / F.lit(2048)).cast("long")
    return (
        ev.groupBy(batch_id.alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("batch_size"),
            F.min("event_id").alias("first_offset"),
            F.max("event_id").alias("last_offset"),
        )
        .orderBy("batch_id")
    )


def q_s1_snapshot_read(spark, sf):
    """S1/S2 — snapshot scan → READ envelopes with default offset."""
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    return cust.select(
        F.lit("r").alias("op"),
        F.lit(-1).cast("long").alias("offset"),
        F.lit(True).alias("snapshot"),
        F.col("c_custkey").alias("key_custkey"),
        F.col("c_name").alias("c_name"),
        F.col("c_acctbal").alias("c_acctbal"),
    )


def q_s3_segment_order(spark, sf):
    """S3 — commit-log segment discovery & ordering (segment = offset
    range; ordered replay with per-segment bounds)."""
    ev = _events(spark, sf).withColumn(
        "segment", F.floor(F.col("event_id") / F.lit(1000)).cast("long")
    )
    return (
        ev.groupBy("segment")
        .agg(
            F.min("event_id").alias("first_offset"),
            F.max("event_id").alias("last_offset"),
            F.count(F.lit(1)).alias("n_mutations"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------- T operators

def q_t2_row_classifier(spark, sf):
    """T1/T2 — row-mutation classification from liveness/deletion
    timestamps (CommitLogReadHandlerImpl.java:141-202 semantics), driven
    by the real classifier over synthesized mutation metadata."""
    ev = _events(spark, sf)
    liveness = F.when(
        F.col("event_type") == "signup", F.col("event_id")
    ).otherwise(F.lit(NO_TIMESTAMP))
    deletion = F.when(
        F.col("event_type") == "error", F.unix_millis(F.col("ts").cast("timestamp"))
    ).otherwise(F.lit(NO_TIMESTAMP))
    has_range = F.col("event_type") == "purchase"  # ≙ unsupported range tombstone
    op = classify_row_op(liveness, deletion, has_range)
    return ev.select("event_id", op.alias("op"))


def q_t5_ttl_deletion_ts(spark, sf):
    """T5 — TTL → deletion-ts micros arithmetic."""
    ev = _events(spark, sf)
    exec_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    ttl_s = F.round(F.col("value"), 0).cast("int")
    return ev.select(
        "event_id",
        exec_ms.alias("exec_ms"),
        ttl_s.alias("ttl_s"),
        deletion_ts_micros(exec_ms, ttl_s).alias("deletion_ts"),
    )


def q_t6_field_blacklist(spark, sf):
    """T6 — field blacklist projection (column pruned at the scan)."""
    return _docs(spark, sf).drop("text").select("doc_id", "lang", "source", "n_chars")


def q_t7_table_whitelist(spark, sf):
    """T7 — regex whitelist row pruning (predicate pushdown)."""
    ev = _events(spark, sf)
    return ev.filter(F.col("event_type").rlike("^(click|view)$")).select(
        "event_id", "user_id", "event_type"
    )


def q_t8_tombstone_emission(spark, sf):
    """T8 — delete → delete + tombstone pair (null value image)."""
    ev = _events(spark, sf).filter(F.col("event_type") == "error")
    env = ev.select(
        "event_id",
        "user_id",
        F.lit("d").alias("op"),
        F.struct(F.col("value").alias("value")).alias("after"),
    )
    out = emit_tombstones(env)
    return out.select(
        "event_id", "user_id", "op", F.col("after.value").alias("after_value")
    )


def q_t9_op_mapping(spark, sf):
    """T9 — source command → envelope op (COMMIT-class rows dropped)."""
    ev = _events(spark, sf)
    op = (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .when(F.col("event_type").isin("click", "view"), F.lit("u"))
        .otherwise(F.lit(None).cast("string"))  # 'purchase' ≙ COMMIT → dropped
    )
    return ev.select("event_id", op.alias("op")).filter(F.col("op").isNotNull())


def q_t11_envelope_assembly(spark, sf):
    """T3/T11 — envelope assembly + payload fingerprint invariant."""
    ev = _events(spark, sf)
    return ev.select(
        F.col("event_id").alias("offset"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("user_id").alias("key_id"),
        F.lower(F.sha2(F.col("props"), 256)).alias("payload_sha256"),
    )


def q_t12_numeric_width(spark, sf):
    """T12 — NUMBER(p,s) width-class inference ladder."""
    ev = _events(spark, sf)
    v = F.round(F.col("value") * 100, 0).cast("long")
    width = (
        F.when((v >= -128) & (v <= 127), F.lit("int8"))
        .when((v >= -32768) & (v <= 32767), F.lit("int16"))
        .when((v >= -(1 << 31)) & (v <= (1 << 31) - 1), F.lit("int32"))
        .otherwise(F.lit("int64"))
    )
    return ev.select("event_id", v.alias("value_scaled"), width.alias("width_class"))


def q_t13_route_naming(spark, sf):
    """T13 — topic/route naming with char sanitation."""
    ev = _events(spark, sf).select("event_type").distinct()
    return ev.select(
        "event_type",
        F.concat_ws(
            ".", F.lit("cdc"), F.lit("events"), sanitize_name(F.col("event_type"))
        ).alias("route"),
    )


# ------------------------------------------------------- training-data ops

def q_exact_dedup(spark, sf):
    return exact_dedup_groups(_docs(spark, sf)).select(
        "content_hash", "keep_id", "dup_count"
    )


def q_token_counts(spark, sf):
    return token_counts(_docs(spark, sf).select("doc_id", "text")).select(
        "doc_id", "ws_tokens", "bpe_tokens", "char_count"
    )


def q_quality_score(spark, sf):
    return quality_score(_docs(spark, sf).select("doc_id", "text")).select(
        "doc_id", "punct_ratio", "stopword_ratio", "quality"
    )


def q_lang_id(spark, sf):
    return lang_id(_docs(spark, sf).select("doc_id", "text")).select(
        "doc_id", "pred_lang", "hits_en"
    )


def q_ngram_jaccard_dups(spark, sf):
    return ngram_jaccard_pairs(_docs(spark, sf), threshold=0.5)


def q_knn_cosine(spark, sf):
    emb = _emb(spark, sf).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5)


# rows-only (non-SQL-expressible: cross-engine hash functions / pandas UDFs)

def q_minhash_lsh_dups(spark, sf):
    return minhash_lsh_pairs(_docs(spark, sf), threshold=0.5)


def q_simhash_near_dups(spark, sf):
    return simhash_near_dups(_docs(spark, sf), max_hamming=8)


def q_ann_lsh_topk(spark, sf):
    emb = _emb(spark, sf).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return lsh_ann_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64, n_planes=8, n_tables=2
    )


def q_embedding_near_dups(spark, sf):
    """Embedding-cosine near-dup pairs, exact mode."""
    return embedding_near_dups(_emb(spark, sf), threshold=0.5)


def q_ann_ivf_topk(spark, sf):
    emb = _emb(spark, sf).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16, n_probe=4
    )


def q_multimodal_features(spark, sf):
    packed = pack_media(_docs(spark, sf).select("doc_id", "text"), "text", "image", "png")
    return extract_features(packed).select("doc_id", "feature_norm")


def q_cdc_pipeline_replay(spark, sf):
    """Flagship rows-only: the full engine — generator → snapshot →
    stream epochs → LWW → merge — on a deterministic mini dataset."""
    import shutil
    import tempfile

    from debezium_incubator_spark.plans.pipeline import CDCEngine
    from debezium_incubator_spark.sources.changelog import DataFrameChangelog
    from debezium_incubator_spark.sources.generator import gen_changelog, gen_source_table

    base = tempfile.mkdtemp(prefix="cdc_entry_")
    shutil.rmtree(base, ignore_errors=True)
    src = gen_source_table(spark, n_keys=300, n_repos=10)
    log = gen_changelog(spark, n_keys=300, n_repos=10, n_slots=1200)
    eng = CDCEngine(spark, f"{base}/table", f"{base}/ckpt", num_buckets=8)
    eng.create_target()
    eng.bootstrap(src)
    eng.run(DataFrameChangelog(log), offsets_per_epoch=2000)
    return eng.final_state().select("repo", "path", "commit", "lang", "content_sha256")


QUERIES = {
    "d1_offset_filter": q_d1_offset_filter,
    "d2_lww_dedup": q_d2_lww_dedup,
    "d3_merge_effect": q_d3_merge_effect,
    "d4_max_offset_checkpoint": q_d4_max_offset_checkpoint,
    "d5_batch_slicing": q_d5_batch_slicing,
    "d6_snapshot_stream_handoff": q_d6_snapshot_stream_handoff,
    "s1_snapshot_read": q_s1_snapshot_read,
    "s3_segment_order": q_s3_segment_order,
    "t2_row_classifier": q_t2_row_classifier,
    "t5_ttl_deletion_ts": q_t5_ttl_deletion_ts,
    "t6_field_blacklist": q_t6_field_blacklist,
    "t7_table_whitelist": q_t7_table_whitelist,
    "t8_tombstone_emission": q_t8_tombstone_emission,
    "t9_op_mapping": q_t9_op_mapping,
    "t11_envelope_assembly": q_t11_envelope_assembly,
    "t12_numeric_width": q_t12_numeric_width,
    "t13_route_naming": q_t13_route_naming,
    "exact_dedup": q_exact_dedup,
    "token_counts": q_token_counts,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "knn_cosine": q_knn_cosine,
    "embedding_near_dups": q_embedding_near_dups,
    "minhash_lsh_dups": q_minhash_lsh_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "multimodal_features": q_multimodal_features,
    "cdc_pipeline_replay": q_cdc_pipeline_replay,
}

_WS = "[ \\t\\n\\r]+"

ORACLES = {
    "d1_offset_filter": f"""
        SELECT event_id, user_id, (user_id % 4)::INT AS part_bucket, event_type
        FROM events
        WHERE event_id > CASE (user_id % 4)::INT
            WHEN 0 THEN 2000 WHEN 1 THEN 4000 WHEN 2 THEN 6000 ELSE 8000 END
    """,
    "d2_lww_dedup": """
        WITH ranked AS (
          SELECT user_id, event_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
               value AS last_value
        FROM ranked WHERE rn = 1
    """,
    "d3_merge_effect": """
        WITH mapped AS (
          SELECT user_id, event_id, value,
                 CASE WHEN event_type = 'signup' THEN 'c'
                      WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM mapped)
        SELECT user_id, op AS last_op, event_id, value
        FROM ranked WHERE rn = 1 AND op <> 'd'
    """,
    "d4_max_offset_checkpoint": """
        SELECT (user_id % 4)::INT AS part_bucket,
               max(event_id) AS max_offset, count(*) AS n_events
        FROM events GROUP BY 1
    """,
    "d5_batch_slicing": """
        SELECT (event_id // 2048)::BIGINT AS batch_id,
               count(*) AS batch_size,
               min(event_id) AS first_offset, max(event_id) AS last_offset
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "d6_snapshot_stream_handoff": """
        WITH snap AS (
          SELECT -1::BIGINT AS event_id, user_id, 'r' AS op, min(value) AS value
          FROM events GROUP BY user_id),
        stream AS (
          SELECT event_id, user_id, 'u' AS op, value FROM events),
        both_src AS (
          SELECT * FROM snap UNION ALL SELECT * FROM stream),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM both_src)
        SELECT user_id, op AS src_op, event_id, value FROM ranked WHERE rn = 1
    """,
    "s1_snapshot_read": """
        SELECT 'r' AS op, -1::BIGINT AS "offset", TRUE AS snapshot,
               c_custkey AS key_custkey, c_name, c_acctbal
        FROM customer
    """,
    "s3_segment_order": """
        SELECT (event_id // 1000)::BIGINT AS segment,
               min(event_id) AS first_offset, max(event_id) AS last_offset,
               count(*) AS n_mutations
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "t2_row_classifier": """
        SELECT event_id,
               CASE WHEN event_type = 'purchase' THEN NULL
                    WHEN event_type = 'error' THEN 'd'
                    WHEN event_type = 'signup' THEN 'c'
                    ELSE 'u' END AS op
        FROM events
    """,
    "t5_ttl_deletion_ts": """
        SELECT event_id, epoch_ms(ts) AS exec_ms, round(value)::INT AS ttl_s,
               epoch_ms(ts) * 1000 + round(value)::INT::BIGINT * 1000000 AS deletion_ts
        FROM events
    """,
    "t6_field_blacklist": """
        SELECT doc_id, lang, source, n_chars FROM documents
    """,
    "t7_table_whitelist": """
        SELECT event_id, user_id, event_type FROM events
        WHERE regexp_matches(event_type, '^(click|view)$')
    """,
    "t8_tombstone_emission": """
        SELECT event_id, user_id, 'd' AS op, value AS after_value
        FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT event_id, user_id, 't' AS op, NULL::DOUBLE AS after_value
        FROM events WHERE event_type = 'error'
    """,
    "t9_op_mapping": """
        SELECT event_id,
               CASE WHEN event_type = 'signup' THEN 'c'
                    WHEN event_type = 'error' THEN 'd'
                    WHEN event_type IN ('click','view') THEN 'u' END AS op
        FROM events WHERE event_type <> 'purchase'
    """,
    "t11_envelope_assembly": """
        SELECT event_id AS "offset", epoch_ms(ts) AS ts_ms, user_id AS key_id,
               lower(sha256(props)) AS payload_sha256
        FROM events
    """,
    "t12_numeric_width": """
        SELECT event_id, round(value * 100)::BIGINT AS value_scaled,
               CASE WHEN round(value*100)::BIGINT BETWEEN -128 AND 127 THEN 'int8'
                    WHEN round(value*100)::BIGINT BETWEEN -32768 AND 32767 THEN 'int16'
                    WHEN round(value*100)::BIGINT BETWEEN -2147483648 AND 2147483647 THEN 'int32'
                    ELSE 'int64' END AS width_class
        FROM events
    """,
    "t13_route_naming": """
        SELECT DISTINCT event_type,
               'cdc.events.' || regexp_replace(event_type, '[^a-zA-Z0-9._-]', '_', 'g') AS route
        FROM events
    """,
    "exact_dedup": """
        SELECT lower(sha256(text)) AS content_hash, min(doc_id) AS keep_id,
               count(*) AS dup_count
        FROM documents GROUP BY 1
    """,
    "token_counts": f"""
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '{_WS}')) END AS ws_tokens,
               len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens,
               length(text) AS char_count
        FROM documents
    """,
    "quality_score": f"""
        WITH m AS (
          SELECT doc_id,
                 length(text)::DOUBLE AS n,
                 len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE AS punct,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '{_WS}')) END::DOUBLE AS words,
                 len(regexp_extract_all(lower(text), '{_STOP_PAT}'))::DOUBLE AS stops
          FROM documents),
        r AS (
          SELECT doc_id,
                 CASE WHEN n > 0 THEN punct / n ELSE 0.0 END AS punct_ratio,
                 CASE WHEN words > 0 THEN stops / words ELSE 0.0 END AS stop_ratio, n
          FROM m)
        SELECT doc_id, round(punct_ratio, 4) AS punct_ratio,
               round(stop_ratio, 4) AS stopword_ratio,
               round(0.4 * least(1.0, n / 500.0)
                   + 0.4 * (1.0 - least(1.0, punct_ratio * 5.0))
                   + 0.2 * least(1.0, stop_ratio * 8.0), 4) AS quality
        FROM r
    """,
    "lang_id": None,  # filled below (long, built from STOPWORDS)
    "ngram_jaccard_dups": """
        WITH toks AS (
          SELECT doc_id,
                 string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
          FROM documents
          WHERE length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) > 0),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(t) - 1),
                     i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingles
          FROM toks WHERE len(t) >= 3),
        sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        co AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM inv a JOIN inv b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(inter / (sa.n_sh + sb.n_sh - inter)::DOUBLE, 4) AS jaccard
        FROM co
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE inter / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.5
    """,
    "embedding_near_dups": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.5
    """,
    "knn_cosine": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_cosine_similarity(qv, cv) AS sim_raw
          FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
        ranked AS (
          SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, rank::INT AS rank, round(sim_raw, 4) AS sim
        FROM ranked WHERE rank <= 5
    """,
}


def _langid_sql() -> str:
    def hits(lg):
        pat = r"\b(" + "|".join(STOPWORDS[lg]) + r")\b"
        return f"len(regexp_extract_all(lower(text), '{pat}'))"

    return f"""
        WITH h AS (
          SELECT doc_id, {hits('en')} AS he, {hits('de')} AS hd,
                 {hits('fr')} AS hf, {hits('es')} AS hs
          FROM documents)
        SELECT doc_id,
               CASE WHEN he + hd + hf + hs = 0 THEN 'und'
                    WHEN he >= hd AND he >= hf AND he >= hs THEN 'en'
                    WHEN hd >= hf AND hd >= hs THEN 'de'
                    WHEN hf >= hs THEN 'fr'
                    ELSE 'es' END AS pred_lang,
               he AS hits_en
        FROM h
    """


ORACLES["lang_id"] = _langid_sql()
# rows-only checks (cross-engine hash seeds / pandas UDFs not expressible
# in ANSI SQL): minhash_lsh_dups, simhash_near_dups, ann_lsh_topk,
# multimodal_features, cdc_pipeline_replay
ORACLES = {k: v for k, v in ORACLES.items() if v is not None}
