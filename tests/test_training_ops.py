"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing. Correctness against hand-computed / brute-force
oracles on tiny inputs."""

import math

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.functions import dedup_text as dd
from debezium_incubator_spark.functions import multimodal as mm
from debezium_incubator_spark.functions import similarity as sim
from debezium_incubator_spark.functions import text as tx

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (3, "completely different content about spark engines and data"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(spark, docs):
    got = {r["doc_id"]: r for r in tx.token_counts(docs).collect()}
    assert got[0]["ws_tokens"] == 9
    assert got[4]["ws_tokens"] == 0
    assert got[0]["bpe_tokens"] == 9  # no punctuation
    df = spark.createDataFrame([(0, "a,b c!")], "doc_id long, text string")
    assert tx.token_counts(df).first()["bpe_tokens"] == 5  # a , b c !


def test_quality_score_bounds_and_formula(spark, docs):
    got = {r["doc_id"]: r for r in tx.quality_score(docs).collect()}
    for r in got.values():
        assert 0.0 <= r["quality"] <= 1.0
    # doc 0: 44 chars (counted 43? compute), 2 'the' stopword hits
    n = len(DOCS[0][1])
    expected = round(
        0.4 * min(1.0, n / 500.0) + 0.4 * 1.0 + 0.2 * min(1.0, (3 / 9) * 8), 4
    )  # the(2)+over? 'the','over'? stoplist: the,and,of,to,in,is,a,that → 'the' x2 + 'over' not in list
    # hand count: tokens=9, stopword hits: 'the' twice, 'over' no → 2? plus 'a'? no standalone 'a'.
    expected = round(0.4 * min(1.0, n / 500.0) + 0.4 * 1.0 + 0.2 * min(1.0, (2 / 9) * 8), 4)
    assert got[0]["quality"] == expected
    assert got[4]["quality"] == round(0.4 * 0 + 0.4 * 1.0 + 0.2 * 0.0, 4)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat and it is happy"),
            (1, "der hund ist nicht in das haus und die katze"),
            (2, "le chat est dans la maison et les chiens"),
            (3, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in tx.lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_rolling_fingerprint_deterministic(spark, docs):
    a = {r["doc_id"]: r["fingerprint"] for r in tx.doc_fingerprints(docs).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in tx.doc_fingerprints(docs).collect()}
    assert a == b
    assert a[0] == a[2] and a[0] != a[1]  # exact dups match, near-dups don't


def test_exact_dedup(spark, docs):
    groups = dd.exact_dedup_groups(docs).collect()
    dup = [g for g in groups if g["dup_count"] > 1]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0 and dup[0]["dup_count"] == 2


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 2)] == 1.0  # exact dup
    # docs 0/1 share 6 of 7 shingles per side: |∩|=6, |∪|=8 → 0.75
    assert pairs[(0, 1)] == 0.75
    assert not any({a, b} == {0, 3} for a, b in pairs)


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] == 0.75
    # verified jaccard must equal the exact computation
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    for k, v in pairs.items():
        assert exact[k] == v


def test_simhash_near_dups(spark, docs):
    sh = docs.select("doc_id", dd.simhash64(F.col("text")).alias("s")).collect()
    vals = {r["doc_id"]: r["s"] for r in sh}
    assert vals[0] == vals[2]
    pairs = {(r["id_a"], r["id_b"]) for r in dd.simhash_near_dups(docs, max_hamming=16).collect()}
    assert (0, 2) in pairs and (0, 1) in pairs


def _brute_topk(vecs, queries, k):
    out = {}
    for qid, q in queries:
        sims = []
        nq = math.sqrt(sum(x * x for x in q))
        for cid, c in vecs:
            if cid == qid:
                continue
            dot = sum(a * b for a, b in zip(q, c))
            nc = math.sqrt(sum(x * x for x in c))
            sims.append((round(dot / (nq * nc), 4), cid))
        sims.sort(key=lambda t: (-t[0], t[1]))
        out[qid] = [(cid, r + 1) for r, (s, cid) in enumerate(sims[:k])]
    return out


def test_cosine_topk_matches_python_bruteforce(spark):
    import random

    rnd = random.Random(7)
    vecs = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = sim.cosine_topk_bruteforce(df, df.filter(F.col("vec_id") < 3), k=4).collect()
    exp = _brute_topk(vecs, vecs[:3], 4)
    for r in got:
        assert (r["neighbor_id"], r["rank"]) in exp[r["query_id"]]


def test_lsh_ann_subset_of_exact_ranking(spark):
    import random

    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    # clustered vectors → LSH must find same-cluster neighbors
    vecs = []
    for i in range(40):
        c = [x + rnd.uniform(-0.05, 0.05) for x in base] if i % 2 == 0 else [
            -x + rnd.uniform(-0.05, 0.05) for x in base
        ]
        vecs.append((i, c))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = sim.lsh_ann_topk(
        df, df.filter(F.col("vec_id") == 0), k=3, dim=16, n_planes=4, n_tables=3
    ).collect()
    assert len(got) == 3
    assert all(r["neighbor_id"] % 2 == 0 for r in got)  # same cluster
    assert all(r["sim"] > 0.9 for r in got)


def test_multimodal_plumbing(spark, docs):
    packed = mm.pack_media(docs.filter(F.col("doc_id") < 3), "text", "image", "png")
    assert packed.schema["media"].dataType.typeName() == "binary"
    feats = mm.extract_features(packed).collect()
    assert len(feats) == 3
    by_id = {r["doc_id"]: r for r in feats}
    assert len(by_id[0]["features"]) == mm.FEATURE_DIM
    assert by_id[0]["features"] == by_id[2]["features"]  # deterministic on same bytes
    assert by_id[0]["features"] != by_id[1]["features"]
    assert by_id[0]["feature_norm"] > 0
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc")


def test_frame_sampling_shape(spark, docs):
    packed = mm.pack_media(docs.filter(F.col("doc_id") == 0), "text", "video", "mp4")
    packed = packed.withColumn(
        "media_meta", F.col("media_meta").withField("duration_ms", F.lit(3500).cast("long"))
    )
    frames = mm.sample_frames(packed, every_ms=1000).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]
    assert len({bytes(r["frame"]) for r in frames}) == 3


def test_ivf_topk_finds_cluster_neighbors(spark):
    import random

    rnd = random.Random(11)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    vecs = []
    for i in range(60):
        c = (
            [x + rnd.uniform(-0.05, 0.05) for x in base]
            if i % 2 == 0
            else [-x + rnd.uniform(-0.05, 0.05) for x in base]
        )
        vecs.append((i, c))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = sim.ivf_topk(
        df, df.filter(F.col("vec_id") < 2), k=3, n_centroids=6, n_probe=3
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 3
        assert all(r["neighbor_id"] % 2 == q % 2 for r in rows)  # same cluster
        assert all(r["sim"] > 0.9 for r in rows)
