"""Nested-type VALUE path through the envelope and the full engine —
the CassandraTypeDeserializer family's round-trip guarantee
(CassandraTypeDeserializerTest golden cases territory): list/set/map/
tuple/UDT payload columns must survive envelope → merge → final state
byte-identically."""

from pyspark.sql import functions as F

from debezium_incubator_spark.functions.types import (
    map_string_keys,
    set_to_array,
    tuple_field_name,
    tuple_to_struct,
    udt_to_struct,
)
from debezium_incubator_spark.plans.pipeline import CDCEngine
from tests.helpers import mk_events

NESTED_PAYLOAD = [
    ("commit", "string"),
    ("tags", "array<string>"),                 # list / set
    ("attrs", "map<string,bigint>"),           # map
    ("geo", "struct<field1:double,field2:double>"),  # tuple → field1/field2 (1-based, TupleTypeDeserializer.java:71-74)
]


def test_set_map_tuple_udt_converters(spark):
    df = spark.createDataFrame(
        [([3, 1, 2, 1], {1: "a", 2: "b"}, (1.5, -2.5), {"lat": 1.0, "lon": 2.0})],
        "s array<int>, m map<int,string>, t struct<_1:double,_2:double>, "
        "u struct<lat:double,lon:double>",
    )
    row = df.select(
        set_to_array(F.col("s")).alias("s"),
        map_string_keys(F.col("m")).alias("m"),
        tuple_to_struct(F.col("t._1"), F.col("t._2")).alias("t"),
        udt_to_struct(F.col("u"), ["lat", "lon"]).alias("u"),
    ).first()
    assert row["s"] == [1, 2, 3]                      # sorted + dedup
    assert row["m"] == {"1": "a", "2": "b"}           # keys stringified
    assert row["t"].asDict() == {"field1": 1.5, "field2": -2.5}
    assert tuple_field_name(0) == "field1"            # 1-based, matches cassandra_to_spark
    assert row["u"].asDict() == {"lat": 1.0, "lon": 2.0}


def test_nested_payload_through_engine(spark, tmp_path):
    """Envelope assembly, LWW merge, and the final table all carry
    array/map/struct payload columns; DDL-added nested columns read back
    as typed nulls (not string nulls)."""
    eng = CDCEngine(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "c"),
        num_buckets=4,
        payload_fields=NESTED_PAYLOAD,
        content_field="__none__",  # no content column → no normalization
    )
    eng.create_target()
    src = spark.createDataFrame(
        [
            ("r1", "a", "c0", ["x", "y"], {"n": 1}, (1.0, 2.0)),
            ("r1", "b", "c0", ["z"], {"n": 2}, (3.0, 4.0)),
        ],
        "repo string, path string, commit string, tags array<string>, "
        "attrs map<string,bigint>, geo struct<field1:double,field2:double>",
    )
    eng.bootstrap(src)

    ev = mk_events(
        spark,
        [
            {"offset": 10, "op": "u", "repo": "r1", "path": "a",
             "after": {"commit": "c1", "tags": ["p", "q", "p"],
                       "attrs": {"n": 7, "m": 8}, "geo": (9.0, -1.0)}},
            {"offset": 11, "op": "d", "repo": "r1", "path": "b",
             "after": {"commit": None, "tags": None, "attrs": None, "geo": None}},
        ],
        payload_fields=NESTED_PAYLOAD,
    )
    eng.apply_epoch(ev, stream_pos=11)
    rows = {r["path"]: r for r in eng.final_state().collect()}
    assert set(rows) == {"a"}  # b deleted
    a = rows["a"]
    assert a["tags"] == ["p", "q", "p"]  # list order preserved
    assert dict(a["attrs"]) == {"n": 7, "m": 8}
    assert a["geo"].asDict() == {"field1": 9.0, "field2": -1.0}

    # DDL-added nested column: null must be typed from the TABLE schema
    eng.apply_ddl_events([{"action": "add_column", "name": "extra", "dtype": "array<int>"}])
    ev2 = mk_events(
        spark,
        [{"offset": 12, "op": "u", "repo": "r1", "path": "a",
          "after": {"commit": "c2", "tags": ["t"], "attrs": {"n": 1}, "geo": (0.0, 0.0)}}],
        payload_fields=NESTED_PAYLOAD,  # written BEFORE the add_column
    )
    eng.apply_epoch(ev2, stream_pos=12)
    out = eng.final_state()
    assert dict(out.dtypes)["extra"] == "array<int>"
    row = out.filter(F.col("path") == "a").first()
    assert row["extra"] is None and row["commit"] == "c2"
