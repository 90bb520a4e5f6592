"""LakeTable unit tests (≙ FileOffsetWriterTest.java:39-126 +
SchemaProcessorTest.java:18-52 territory: persistence round-trips,
locking, schema evolution)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_incubator_spark.lake.table import (
    BUCKET_COL,
    ConcurrentWriteError,
    LakeTable,
    bucket_expr,
)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, tmp_table, rows):
    t = LakeTable.create(tmp_table, SCHEMA, bucket_cols=["repo", "path"], num_buckets=4)
    df = spark.createDataFrame(rows, SCHEMA)
    df = t.with_bucket(df)
    t.commit(df, replace_buckets=range(4), summary={"epoch": 0})
    return t


def test_create_commit_read_roundtrip(spark, tmp_table):
    rows = [("r1", f"p{i}", i) for i in range(20)]
    t = _mk(spark, tmp_table, rows)
    got = sorted(tuple(r) for r in t.read(spark).collect())
    assert got == sorted(rows)
    assert t.version() == 1
    assert t.summary()["epoch"] == 0


def test_bucket_pruning_reads_subset(spark, tmp_table):
    rows = [(f"r{i}", f"p{i}", i) for i in range(40)]
    t = _mk(spark, tmp_table, rows)
    m = t.manifest()
    some = [int(b) for b in list(m["buckets"])[:2]]
    df = t.read(spark, buckets=some)
    # every row read must hash into the requested buckets
    chk = df.withColumn(BUCKET_COL, bucket_expr(["repo", "path"], 4))
    assert chk.filter(~F.col(BUCKET_COL).isin(some)).count() == 0
    assert 0 < df.count() < 40


def test_copy_on_write_only_touched_buckets(spark, tmp_table):
    rows = [(f"r{i}", f"p{i}", i) for i in range(40)]
    t = _mk(spark, tmp_table, rows)
    m1 = t.manifest()
    # rewrite bucket 0 only
    b0 = t.read(spark, buckets=[0]).withColumn("v", F.col("v") + 100)
    t.commit(t.with_bucket(b0), replace_buckets=[0], summary={"epoch": 1})
    m2 = t.manifest()
    for b in m2["buckets"]:
        if int(b) == 0:
            assert m2["buckets"][b] != m1["buckets"].get(b)
        else:
            assert m2["buckets"][b] == m1["buckets"][b]  # untouched files reused


def test_time_travel(spark, tmp_table):
    rows = [("r1", f"p{i}", i) for i in range(10)]
    t = _mk(spark, tmp_table, rows)
    upd = t.read(spark).withColumn("v", F.col("v") * 10)
    t.commit(t.with_bucket(upd), replace_buckets=range(4), summary={"epoch": 1})
    assert t.read(spark, version=1).agg(F.sum("v")).first()[0] == sum(range(10))
    assert t.read(spark).agg(F.sum("v")).first()[0] == sum(range(10)) * 10


def test_schema_add_rename_drop_mapping(spark, tmp_table):
    rows = [("r1", f"p{i}", i) for i in range(5)]
    t = _mk(spark, tmp_table, rows)
    t.add_column("stars", "bigint")
    # old files must read with null stars
    df = t.read(spark)
    assert df.columns == ["repo", "path", "v", "stars"]
    assert df.filter(F.col("stars").isNull()).count() == 5
    # write with stars, rename v->version: old files map by field id
    df2 = t.with_bucket(df.withColumn("stars", F.lit(7)))
    t.commit(df2, replace_buckets=range(4), summary={})
    t.rename_column("v", "version")
    got = t.read(spark)
    assert got.columns == ["repo", "path", "version", "stars"]
    assert got.agg(F.sum("version")).first()[0] == sum(range(5))
    t.drop_column("stars")
    assert t.read(spark).columns == ["repo", "path", "version"]


def test_writer_lock_excludes_second_writer(spark, tmp_table):
    t = _mk(spark, tmp_table, [("r1", "p1", 1)])
    with open(os.path.join(t.meta_dir, "LOCK"), "w") as f:
        f.write("1")  # pid 1: alive, not ours
    with pytest.raises(ConcurrentWriteError):
        with t._writer_lock():
            pass
    os.unlink(os.path.join(t.meta_dir, "LOCK"))
    # stale lock from a dead pid is stolen
    with open(os.path.join(t.meta_dir, "LOCK"), "w") as f:
        f.write("999999999")
    with t._writer_lock():
        pass


def test_expire_versions_gc(spark, tmp_table):
    t = _mk(spark, tmp_table, [("r1", f"p{i}", i) for i in range(8)])
    for e in range(3):
        df = t.with_bucket(t.read(spark).withColumn("v", F.col("v") + 1))
        t.commit(df, replace_buckets=range(4), summary={"epoch": e + 1})
    removed = t.expire_versions(keep_last=2)
    assert removed and max(removed) < t.version() - 1
    assert t.read(spark).count() == 8  # current still readable
    with pytest.raises(FileNotFoundError):
        t.manifest(0)


def test_compaction_merges_small_files(spark, tmp_table):
    t = _mk(spark, tmp_table, [("r1", f"p{i}", i) for i in range(8)])
    # create file churn: 5 single-row CoW commits into the same buckets
    for e in range(5):
        one = t.read(spark).filter(F.col("path") == f"p{e}").withColumn(
            "v", F.col("v") + 100
        )
        t.commit(t.with_bucket(one).unionByName(
            t.with_bucket(t.read(spark)).join(
                t.with_bucket(one).select("repo", "path"), ["repo", "path"], "left_anti"
            )
        ), replace_buckets=range(4), summary={"epoch": e + 1})
    m = t.manifest()
    n_files_before = sum(len(fs) for fs in m["buckets"].values())
    before = sorted(tuple(r) for r in t.read(spark).collect())

    compacted = t.compact(spark, min_files=1)
    assert compacted  # something was rewritten
    m2 = t.manifest()
    n_files_after = sum(len(fs) for fs in m2["buckets"].values())
    assert n_files_after <= n_files_before
    after = sorted(tuple(r) for r in t.read(spark).collect())
    assert after == before  # logical no-op
    assert m2["summary"].get("epoch") == m["summary"].get("epoch")  # lineage kept
