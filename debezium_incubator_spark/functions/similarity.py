"""Embedding similarity search.

* ``cosine_topk_bruteforce`` — the exact baseline: query×corpus join
  with a JVM-side dot product (F.zip_with + F.aggregate, stays in
  codegen). Correct at any scale when the query set is small enough to
  broadcast; cost is |Q|·|C|.
* ``lsh_ann_topk`` — the scale path: random-hyperplane LSH buckets
  (deterministic pseudo-hyperplanes derived from a seed), candidates =
  bucket collisions across probe permutations, exact re-rank inside.
  At 100 TB the corpus is scanned once to bucket, and each query only
  meets its bucket's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): broadcast the
    query set, rank by (sim desc, neighbor id) for determinism."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_sim(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (hash-derived, no RNG
    state): component j = scaled centered hash of (plane, j, seed)."""
    import hashlib

    out = []
    for j in range(dim):
        h = int.from_bytes(
            hashlib.sha256(f"{seed}:{plane}:{j}".encode()).digest()[:8], "big"
        )
        out.append((h / float(1 << 64)) * 2.0 - 1.0)
    return out


def rp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-projection sign bucket: bit i = sign(v · h_i)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, arr) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    use_lsh: bool = False,
    **lsh_kwargs,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ t).

    Exact mode pairs every vector (fine ≤ ~10^5 rows per executor-chunk);
    ``use_lsh=True`` routes candidate generation through the sign-LSH
    buckets for the 100 TB path (recall < 1, verified sims exact)."""
    c = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    d = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    if use_lsh:
        dim = lsh_kwargs.pop("dim", 64)
        pairs = lsh_ann_topk(
            corpus, corpus, id_col=id_col, vec_col=vec_col,
            k=lsh_kwargs.pop("k", 20), dim=dim, **lsh_kwargs,
        ).filter(F.col("query_id") < F.col("neighbor_id"))
        return (
            pairs.filter(F.col("sim") >= threshold)
            .select(F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b"), "sim")
        )
    joined = c.join(d, F.col("id_a") < F.col("id_b"))
    out = joined.withColumn("sim", F.round(cosine_sim(F.col("va"), F.col("vb")), 4))
    return out.filter(F.col("sim") >= threshold).select("id_a", "id_b", "sim")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus rows are assigned to their nearest
    centroid once (the 100 TB pass: one scan, equality-partitionable by
    centroid id); each query probes only its ``n_probe`` nearest
    centroid lists and re-ranks exactly inside them.

    Centroids are picked deterministically from the corpus itself (the
    n_centroids rows with the smallest seeded hash — a k-means-free
    sampling that keeps the whole pipeline seed-reproducible)."""
    from pyspark.sql.window import Window

    # deterministic centroid sample (small collect — n_centroids rows)
    cent_rows = (
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("__h", F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r["v"]) for r in cent_rows]

    def centroid_sims(vec: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.round(cosine_sim(vec, F.array(*[F.lit(float(x)) for x in c])), 9).alias("sim"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(cents)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
    )
    # corpus assignment: argmax centroid (array_max on (sim, cid) structs)
    c = c.withColumn("cid", F.array_max(centroid_sims(F.col("c_vec")))["cid"])

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    probes = q.withColumn(
        "cid",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(centroid_sims(F.col("q_vec")))), 1, n_probe),
                lambda s: s["cid"],
            )
        ),
    )
    cands = (
        c.join(probes, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("sim", cosine_sim(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: n_tables independent sign-LSH bucketings;
    candidates = same (table, bucket); exact cosine re-rank. Equality
    join on the bucket key — shuffle proportional to bucket sizes, never
    |Q|·|C|."""
    from pyspark.sql.window import Window

    tables = []
    for t in range(n_tables):
        planes = [_hyperplane(dim, t * n_planes + i, seed) for i in range(n_planes)]
        tables.append((t, planes))

    def with_buckets(df, idn, vecn):
        parts = []
        for t, planes in tables:
            parts.append(
                df.select(
                    F.col(id_col).alias(idn),
                    F.col(vec_col).alias(vecn),
                    F.lit(t).alias("table"),
                    rp_bucket(F.col(vec_col), planes).alias("bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    cb = with_buckets(corpus, "neighbor_id", "c_vec")
    qb = with_buckets(queries, "query_id", "q_vec")
    cands = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("sim", cosine_sim(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )
