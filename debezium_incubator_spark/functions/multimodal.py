"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED (no image or
audio libraries in this environment): ``decode_image`` raises
NotImplementedError by design, and ``extract_features`` uses a
deterministic hash-derived fake so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 32


def pack_media(df: DataFrame, payload_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap an existing column as an opaque media payload + metadata."""
    raw = F.encode(F.col(payload_col).cast("string"), "utf-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(raw).cast("long").alias("size_bytes"),
    )
    return df.withColumn("media", raw).withColumn("media_meta", meta)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode requires PIL/libjpeg — not present here.
    The pipeline seam is real; the codec is not."""
    raise NotImplementedError(
        "image decoding requires an imaging library not available in this environment"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: FEATURE_DIM
    floats derived from sha256 of the payload. Keeps the downstream
    schema/contract identical to a real model's output.

    The counter-mode stretch chains HEX STRINGS (not raw digests) so the
    whole derivation is replicable in DuckDB SQL (`sha256` there accepts
    VARCHAR only) — the driver oracle recomputes feature_norm bit-exactly:
    block_i = sha256_hex(sha256_hex(payload) || str(i)),
    v_j = int(block_i[8j:8j+8], 16), feature = v/2^32*2-1."""
    import hashlib

    d = hashlib.sha256(payload).hexdigest()
    out = []
    i = 0
    while len(out) < FEATURE_DIM:
        block = hashlib.sha256((d + str(i)).encode()).hexdigest()
        for j in range(0, 64, 8):
            if len(out) >= FEATURE_DIM:
                break
            v = int(block[j : j + 8], 16)
            out.append((v / float(1 << 32)) * 2.0 - 1.0)
        i += 1
    return out


def extract_features(
    df: DataFrame, media_col: str = "media", id_cols: list[str] | None = None
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, (ids, features,
    feature_norm) out. Partition-parallel; the per-batch loop touches
    numpy/bytes only."""
    id_cols = id_cols or [c for c in df.columns if c not in (media_col, "media_meta")]
    in_cols = id_cols + [media_col]
    schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("feature_norm", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            feats = pdf[media_col].map(lambda b: _fake_features(bytes(b)))
            out = pdf[id_cols].copy()
            out["features"] = feats
            out["feature_norm"] = feats.map(lambda v: math.sqrt(sum(x * x for x in v)))
            yield out

    return df.select(*in_cols).mapInPandas(run, schema)


def sample_frames(
    df: DataFrame, media_col: str = "media", every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling seam for video payloads: emits (frame_idx, frame)
    rows per media row. Decode stubbed — frames are deterministic hash
    slices standing in for decoded frames, but the explode/partition
    shape matches a real sampler."""
    meta = F.col("media_meta")
    n_frames = F.greatest(
        F.coalesce((meta["duration_ms"] / F.lit(every_ms)).cast("int"), F.lit(1)), F.lit(1)
    )
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    out = df.select("*", idx)
    frame = F.sha2(
        F.concat(F.col(media_col).cast("string"), F.col("frame_idx").cast("string")), 256
    )
    return out.withColumn("frame", F.encode(frame, "utf-8"))
