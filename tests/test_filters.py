"""T6/T7/T8/T13 tests (≙ OracleConnectorFilterIT, RecordMaker tombstone
behavior, CassandraTopicSelector naming)."""

from pyspark.sql import functions as F

from debezium_incubator_spark.operators.filters import (
    drop_envelope_fields,
    emit_tombstones,
    route_for,
    sanitize_name,
    table_filter,
)
from tests.helpers import mk_events


def _ev(spark):
    return mk_events(
        spark,
        [
            {"offset": 1, "op": "c", "repo": "org/app", "path": "a.py",
             "after": {"commit": "c1", "lang": "py", "content": "x\n"}},
            {"offset": 2, "op": "u", "repo": "org/app", "path": "a.py",
             "before": {"commit": "c1", "lang": "py", "content": "x\n"},
             "after": {"commit": "c2", "lang": "py", "content": "y\n"}},
            {"offset": 3, "op": "d", "repo": "org/lib", "path": "b.py",
             "after": {"commit": "c9", "lang": "py", "content": "z\n"}},
            {"offset": 4, "op": "c", "repo": "_system/meta", "path": "s.py",
             "after": {"commit": "c3", "lang": "py", "content": "s\n"}},
        ],
    )


def test_field_blacklist_never_touches_deletes(spark):
    """FieldFilterSelector.java:40-44: deletes are never field-filtered."""
    out = drop_envelope_fields(_ev(spark), ["content"])
    rows = {r["offset"]: r for r in out.collect()}
    assert rows[1]["after"]["content"] is None  # blacklisted on insert
    assert rows[2]["after"]["content"] is None  # and update
    assert rows[2]["before"]["content"] is None
    assert rows[3]["after"]["content"] == "z\n"  # delete untouched


def test_table_whitelist_wins_and_system_excluded(spark):
    ev = _ev(spark)
    got = table_filter(ev, include_regex=r"^org/app$", exclude_regex=r".*")
    assert {r["repo"] for r in got.collect()} == {"org/app"}
    # no include → exclude applies; system repos always dropped
    got2 = table_filter(ev, exclude_regex=r"^org/lib$")
    assert {r["repo"] for r in got2.collect()} == {"org/app"}
    got3 = table_filter(ev)
    assert "_system/meta" not in {r["repo"] for r in got3.collect()}


def test_tombstone_emission_pairs(spark):
    """RecordMaker.java:53-57: delete → delete + tombstone (same key,
    null value); off → deletes only."""
    ev = table_filter(_ev(spark))
    on = emit_tombstones(ev)
    tombs = on.filter(F.col("op") == "t").collect()
    assert len(tombs) == 1
    assert tombs[0]["repo"] == "org/lib" and tombs[0]["after"] is None
    off = emit_tombstones(ev, enabled=False)
    assert off.filter(F.col("op") == "t").count() == 0


def test_route_sanitation(spark):
    df = spark.createDataFrame([("my ks!", "tab$le",)], "ks string, tab string")
    got = df.select(
        sanitize_name(F.col("ks")).alias("s"),
        route_for("pfx", F.col("ks"), F.col("tab")).alias("route"),
    ).first()
    assert got["s"] == "my_ks_"
    assert got["route"] == "pfx.my_ks_.tab_le"
