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
* ``ivf_topk`` — inverted-file ANN: one corpus pass assigns each row to
  its nearest centroid; queries probe only their n_probe nearest lists.
  Centroids ride a single broadcast row (array<struct>) — never plan
  literals — so centroid counts in the thousands keep the plan small.
* ``embedding_near_dups`` — near-duplicate pairs; LSH candidates by
  default (the 100 TB shape), exact all-pairs only under an explicit
  small-corpus flag (it doubles as the recall baseline in tests).
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
    """Random-projection sign bucket: bit i = sign(v · h_i). Literal
    form — fine for a handful of planes; the batch operators below carry
    planes as a broadcast ARRAY column instead (rp_bucket_from_planes),
    because dim×planes×tables inlined literals blow up the plan (measured
    multi-second codegen at 2×8×64)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, arr) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def rp_bucket_from_planes(vec: Column, planes_col: Column, n_planes: int) -> Column:
    """Sign bucket where the hyperplanes ride a column
    (array<array<double>>, one entry per plane): bit i = sign(v · h_i),
    summed as distinct powers of two. Bit-identical to rp_bucket for the
    same plane values (same left-fold dot order)."""
    p2 = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda i: F.when(
            _dot(vec, F.element_at(planes_col, i + 1)) > 0,
            F.element_at(p2, i + 1),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, v: a + v)


def _planes_row(spark, tables: list[tuple[int, list[list[float]]]]):
    """One-row DataFrame carrying every table's hyperplanes as
    array<array<array<double>>> (indexed [table+1][plane+1][dim]) — a
    single broadcast instead of thousands of plan literals."""
    payload = [[p for p in planes] for _, planes in tables]
    return spark.createDataFrame(
        [(payload,)], "__pl array<array<array<double>>>"
    )


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    mode: str = "lsh",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ t).

    ``mode="lsh"`` (default — the 100 TB shape): sign-LSH bucket
    collisions generate candidates, exact cosine verifies. Few planes +
    many tables tune for HIGH-similarity pairs: at sim 0.95 the per-table
    collision prob is (1-θ/π)^4 ≈ 0.66, so 8 tables miss a true pair
    with prob (1-0.66)^8 ≈ 2e-4 (recall asserted ≥0.95 vs exact in
    tests/test_training_ops.py). The join is equality on (table,bucket) —
    shuffle ∝ bucket sizes, never |C|².

    ``mode="exact"`` pairs every vector via a cartesian — correct at any
    similarity but O(|C|²); only for small corpora / as the recall
    baseline (the driver oracle runs this mode so DuckDB can replicate
    it exactly)."""
    if mode not in ("lsh", "exact"):
        raise ValueError(f"mode must be 'lsh' or 'exact', got {mode!r}")
    c = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    d = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    if mode == "lsh":
        from pyspark import StorageLevel

        tables = [
            (t, [_hyperplane(dim, t * n_planes + i, seed) for i in range(n_planes)])
            for t in range(n_tables)
        ]
        planes_row = F.broadcast(_planes_row(corpus.sparkSession, tables))
        withp = c.crossJoin(planes_row)
        cb = withp.select(
            "id_a", "va",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_tables - 1)),
                    lambda t: F.struct(
                        t.alias("table"),
                        rp_bucket_from_planes(
                            F.col("va"), F.element_at(F.col("__pl"), t + 1), n_planes
                        ).alias("bucket"),
                    ),
                )
            ).alias("tb"),
        ).select("id_a", "va", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))
        # both sides of the bucket self-join read the bucketed corpus
        cb = cb.persist(StorageLevel.MEMORY_AND_DISK)
        cands = (
            cb.alias("x")
            .join(cb.alias("y"), ["table", "bucket"])
            .filter(F.col("x.id_a") < F.col("y.id_a"))
            .select(
                F.col("x.id_a").alias("id_a"),
                F.col("y.id_a").alias("id_b"),
                F.col("x.va").alias("va"),
                F.col("y.va").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        out = cands.withColumn("__s", cosine_sim(F.col("va"), F.col("vb")))
    else:
        out = c.join(d, F.col("id_a") < F.col("id_b")).withColumn(
            "__s", cosine_sim(F.col("va"), F.col("vb"))
        )
    result = (
        out.withColumn("sim", F.round(F.col("__s"), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
    if mode == "lsh":
        from debezium_incubator_spark.functions._cache import finalize

        result = finalize(result, [cb], eager_cleanup)
    return result


def _centroid_row(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    init: str,
    kmeans_iters: int,
    sample_rows: int,
) -> DataFrame:
    """One-row DataFrame carrying array<struct<cid,vec>> centroids.

    ``init="hash_sample"``: the n_centroids corpus rows with the smallest
    md5(id) — deterministic AND replicable in any SQL engine (the driver
    oracle re-derives the same centroids in DuckDB).
    ``init="kmeans"``: Lloyd iterations over a bounded sample refine the
    hash-sampled seeds (driver-side numpy on ≤sample_rows rows; the
    corpus-wide pass stays distributed). Better recall, not
    SQL-replicable — covered by the recall pytest instead."""
    spark = corpus.sparkSession
    seeds = (
        corpus.select(
            F.col(id_col).cast("string").alias("__id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("__h", F.md5(F.col("__id")))
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r["v"]) for r in seeds]
    if init == "kmeans":
        import numpy as np

        sample = np.array(
            [
                list(r["v"])
                for r in corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
                .limit(sample_rows)
                .collect()
            ]
        )
        C = np.array(cents)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        Sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        for _ in range(kmeans_iters):
            assign = (Sn @ Cn.T).argmax(axis=1)
            for ci in range(len(cents)):
                members = Sn[assign == ci]
                if len(members):
                    m = members.mean(axis=0)
                    Cn[ci] = m / max(float(np.linalg.norm(m)), 1e-12)
        cents = [list(map(float, row)) for row in Cn]
    rows = [(i, cents[i]) for i in range(len(cents))]
    cdf = spark.createDataFrame(rows, "cid int, vec array<double>")
    return cdf.agg(
        F.collect_list(F.struct(F.col("cid"), F.col("vec"))).alias("__cents")
    )


def _centroid_sims(vec: Column, cents: Column, digits: int = 9) -> Column:
    """array<struct<sim,cid>> of rounded cosine sims to every centroid —
    a per-row transform over the broadcast centroid array (no plan
    literals, no shuffle)."""
    return F.transform(
        cents,
        lambda c: F.struct(
            F.round(cosine_sim(vec, c["vec"]), digits).alias("sim"),
            c["cid"].alias("cid"),
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    init: str = "kmeans",
    kmeans_iters: int = 5,
    sample_rows: int = 10_000,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus rows are assigned to their nearest
    centroid once (the 100 TB pass: one scan, equality-partitionable by
    centroid id); each query probes only its ``n_probe`` nearest
    centroid lists and re-ranks exactly inside them.

    Centroids travel as ONE broadcast row of array<struct<cid,vec>> and
    are compared per-row with a higher-order transform — realistic
    centroid counts (thousands) no longer inflate the plan (the old form
    inlined dim×n_centroids literals). Assignment argmax and the query's
    probe list tie-break identically (max sim, then max cid), matching
    the DuckDB oracle's row_number ordering.

    The DEFAULT init is the recall-tested k-means refinement (Lloyd over
    a bounded sample); ``init="hash_sample"`` keeps the SQL-replicable
    raw seeds for cross-engine oracles."""
    from pyspark.sql.window import Window

    cent = F.broadcast(
        _centroid_row(corpus, id_col, vec_col, n_centroids, init, kmeans_iters, sample_rows)
    )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
    )
    # corpus assignment: argmax centroid (array_max on (sim, cid) structs)
    c = c.crossJoin(cent).withColumn(
        "cid", F.array_max(_centroid_sims(F.col("c_vec"), F.col("__cents")))["cid"]
    ).drop("__cents")

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    probes = q.crossJoin(cent).withColumn(
        "cid",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_centroid_sims(F.col("q_vec"), F.col("__cents")))),
                    1,
                    n_probe,
                ),
                lambda s: s["cid"],
            )
        ),
    ).drop("__cents")
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
    |Q|·|C|. Recall vs the exact baseline is asserted in
    tests/test_training_ops.py; the driver oracle replicates the exact
    plane constants in DuckDB SQL, so the result set is equality-checked
    cross-engine."""
    from pyspark.sql.window import Window

    tables = []
    for t in range(n_tables):
        planes = [_hyperplane(dim, t * n_planes + i, seed) for i in range(n_planes)]
        tables.append((t, planes))
    planes_row = F.broadcast(_planes_row(corpus.sparkSession, tables))

    def with_buckets(df, idn, vecn):
        # one broadcast planes row + a posexplode over tables — keeps the
        # plan free of dim×planes×tables literals (measured multi-second
        # codegen in the literal form)
        withp = df.crossJoin(planes_row)
        return withp.select(
            F.col(id_col).alias(idn),
            F.col(vec_col).alias(vecn),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_tables - 1)),
                    lambda t: F.struct(
                        t.alias("table"),
                        rp_bucket_from_planes(
                            F.col(vec_col), F.element_at(F.col("__pl"), t + 1), n_planes
                        ).alias("bucket"),
                    ),
                )
            ).alias("tb"),
        ).select(idn, vecn, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))

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
