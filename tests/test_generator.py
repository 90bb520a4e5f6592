"""Generator guarantees (FIXTURES.md F1/F2): determinism, per-key
sequence validity, skew, duplicate injection, offset uniqueness."""

from pyspark.sql import functions as F

from debezium_incubator_spark.sources.generator import gen_changelog, gen_source_table


def test_source_table_deterministic(spark):
    a = gen_source_table(spark, n_keys=100, n_repos=5).orderBy("repo", "path").collect()
    b = gen_source_table(spark, n_keys=100, n_repos=5).orderBy("repo", "path").collect()
    assert a == b
    assert len(a) == 100
    assert all(len(r["commit"]) == 40 for r in a)
    assert all(r["content"].endswith("\n") for r in a)


def test_changelog_deterministic_and_offsets_unique_modulo_dups(spark):
    log = gen_changelog(spark, n_keys=100, n_repos=5, n_slots=400)
    pdf = log.select("offset", "op").toPandas()
    vc = pdf["offset"].value_counts()
    assert (vc <= 2).all()  # dups are exact re-emissions, at most one replay
    dups = vc[vc == 2]
    assert len(dups) > 0  # duplicate replays ARE injected
    # a duplicated offset has identical payload
    off = int(dups.index[0])
    rows = log.filter(F.col("offset") == off).drop("source").collect()
    assert rows[0] == rows[1]


def test_per_key_sequences_valid(spark):
    """c before u/d; no event after a delete except a (re-)create."""
    log = gen_changelog(
        spark, n_keys=80, n_repos=4, n_slots=500, dup_per_mille=0, new_key_frac=1.0
    )
    pdf = (
        log.filter(F.col("op") != "t")
        .orderBy("offset")
        .select("repo", "path", "op")
        .toPandas()
    )
    state = {}  # key -> exists?
    for _, r in pdf.iterrows():
        k = (r["repo"], r["path"])
        if r["op"] == "c":
            assert not state.get(k, False), f"create on live key {k}"
            state[k] = True
        elif r["op"] == "u":
            # u on a snapshotted key: key_id < n_keys → exists pre-stream
            if k in state:
                assert state[k], f"update on deleted key {k}"
            state[k] = True
        elif r["op"] == "d":
            if k in state:
                assert state[k], f"double delete {k}"
            state[k] = False


def test_hot_repo_skew_exists(spark):
    src = gen_source_table(spark, n_keys=2000, n_repos=50, repo_skew=2.0)
    counts = [r["n"] for r in src.groupBy("repo").agg(F.count("*").alias("n")).collect()]
    assert max(counts) > 5 * (sum(counts) / len(counts))  # hot repo ≫ mean


def test_content_sha_invariant_recomputable(spark):
    """content is a pure function of (repo, path, commit) → the sha256
    invariant can be recomputed from scratch by anyone."""
    src = gen_source_table(spark, n_keys=20, n_repos=3)
    import hashlib

    for r in src.collect():
        assert r["content"].startswith(f"// {r['repo']}/{r['path']} @ {r['commit']}\n")
        # stable across calls
        h1 = hashlib.sha256(r["content"].encode()).hexdigest()
        assert len(h1) == 64
