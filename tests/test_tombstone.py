"""Tombstone / delete / PK-change suite (≙ OracleConnectorIT.java:369-499:
insert/update/delete, PK-update → delete+tombstone+insert, tombstone
suppression)."""

from pyspark.sql import functions as F

from debezium_incubator_spark.plans.pipeline import CDCEngine
from debezium_incubator_spark.sources.generator import gen_changelog
from tests.helpers import mk_events


def _engine(spark, tmp_path, **kw):
    eng = CDCEngine(
        spark, str(tmp_path / "table"), str(tmp_path / "ckpt"), num_buckets=4, **kw
    )
    eng.create_target()
    return eng


IMG = lambda v: {"commit": "c" * 40, "lang": "py", "content": v}  # noqa: E731


def test_delete_and_tombstone_remove_key(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.bootstrap(spark.createDataFrame([], "repo string, path string, commit string, lang string, content string"))
    ev = mk_events(
        spark,
        [
            {"offset": 1, "op": "c", "repo": "r", "path": "a", "after": IMG("v1\n")},
            {"offset": 2, "op": "c", "repo": "r", "path": "b", "after": IMG("w1\n")},
            {"offset": 3, "op": "d", "repo": "r", "path": "a",
             "after": {"commit": None, "lang": None, "content": None}},
            {"offset": 4, "op": "t", "repo": "r", "path": "a", "after": None},
        ],
    )
    eng.apply_epoch(ev, stream_pos=4)
    got = eng.final_state().collect()
    assert [(r["repo"], r["path"]) for r in got] == [("r", "b")]


def test_pk_update_triple_moves_key(spark, tmp_path):
    """PK change = d + t on the old key, c on the new key
    (OracleConnectorIT.java:391-446)."""
    eng = _engine(spark, tmp_path)
    eng.bootstrap(spark.createDataFrame([], "repo string, path string, commit string, lang string, content string"))
    ev = mk_events(
        spark,
        [
            {"offset": 1, "op": "c", "repo": "r", "path": "old", "after": IMG("v\n")},
            {"offset": 2, "op": "d", "repo": "r", "path": "old",
             "after": {"commit": None, "lang": None, "content": None}},
            {"offset": 3, "op": "t", "repo": "r", "path": "old", "after": None},
            {"offset": 4, "op": "c", "repo": "r", "path": "new", "after": IMG("v\n")},
        ],
    )
    eng.apply_epoch(ev, stream_pos=4)
    got = eng.final_state().collect()
    assert [(r["path"], r["content"]) for r in got] == [("new", "v\n")]


def test_generator_emits_tombstone_pairs_and_pk_triples(spark):
    log = gen_changelog(spark, n_keys=100, n_repos=5, n_slots=600, dup_per_mille=0)
    pdf = log.orderBy("offset").select("offset", "op", "repo", "path").toPandas()
    by_off = pdf.set_index("offset")
    d_offsets = by_off[by_off["op"] == "d"].index
    assert len(d_offsets) > 0
    for off in d_offsets:
        assert by_off.loc[off + 1, "op"] == "t"  # every delete followed by its tombstone
        assert by_off.loc[off + 1, "path"] == by_off.loc[off, "path"]
    # PK triples: a 'c' at idx 2 of a slot means (d,t,c) with a new path
    pk_c = pdf[(pdf["op"] == "c") & (pdf["offset"] % 4 == 2)]
    assert len(pk_c) > 0
    for _, r in pk_c.iterrows():
        assert r["path"].split(".moved-")[0] == by_off.loc[r["offset"] - 2, "path"]


def test_tombstones_off_mode(spark):
    log = gen_changelog(spark, n_keys=100, n_repos=5, n_slots=400, tombstones=False)
    assert log.filter(F.col("op") == "t").count() == 0
    assert log.filter(F.col("op") == "d").count() > 0
