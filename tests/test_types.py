"""Datatype goldens (≙ CassandraTypeDeserializerTest 447 LoC one-test-
per-type + AbstractOracleDatatypesTest fixtures): type-mapping table +
value converters."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_incubator_spark.functions import types as tp


def test_cassandra_scalar_map():
    cases = {
        "text": T.StringType(),
        "ascii": T.StringType(),
        "boolean": T.BooleanType(),
        "blob": T.BinaryType(),
        "tinyint": T.ByteType(),
        "smallint": T.ShortType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "counter": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "uuid": T.StringType(),
        "inet": T.StringType(),
    }
    for name, expected in cases.items():
        assert tp.cassandra_to_spark(name) == expected


def test_cassandra_nested_types():
    assert tp.cassandra_to_spark("list<int>") == T.ArrayType(T.IntegerType())
    assert tp.cassandra_to_spark("set<text>") == T.ArrayType(T.StringType())
    # map keys coerced to string (MapTypeDeserializer.java:20-50)
    assert tp.cassandra_to_spark("map<int,double>") == T.MapType(
        T.StringType(), T.DoubleType()
    )
    t = tp.cassandra_to_spark("tuple<int,text>")
    assert [f.name for f in t.fields] == ["field1", "field2"]
    nested = tp.cassandra_to_spark("list<map<text,list<int>>>")
    assert nested == T.ArrayType(T.MapType(T.StringType(), T.ArrayType(T.IntegerType())))


def test_cassandra_decimal_parity_mode():
    # reference is lossy decimal→double (CassandraTypeDeserializer.java:64)
    assert tp.cassandra_to_spark("decimal", decimal_parity_mode=True) == T.DoubleType()
    assert isinstance(tp.cassandra_to_spark("decimal"), T.DecimalType)


def test_cassandra_unsupported_raises():
    with pytest.raises(ValueError):
        tp.cassandra_to_spark("frozen_banana")


def test_oracle_number_width_ladder():
    # OracleValueConverters.java:82-111 width = p - s
    assert tp.oracle_number_to_spark(2, 0) == T.ByteType()
    assert tp.oracle_number_to_spark(4, 0) == T.ShortType()
    assert tp.oracle_number_to_spark(9, 0) == T.IntegerType()
    assert tp.oracle_number_to_spark(18, 0) == T.LongType()
    assert tp.oracle_number_to_spark(20, 0) == T.DecimalType(20, 0)
    # negative scale widens (NUMBER(2,-1) ≙ width 3 → int16)
    assert tp.oracle_number_to_spark(2, -1) == T.ShortType()
    assert tp.oracle_number_to_spark(6, 2) == T.DecimalType(6, 2)
    assert tp.oracle_number_to_spark(None, None) == T.DecimalType(38, 18)


def test_oracle_strings_and_temporals():
    assert tp.oracle_to_spark("varchar2") == T.StringType()
    assert tp.oracle_to_spark("nchar") == T.StringType()
    assert tp.oracle_to_spark("binary_float") == T.FloatType()
    assert tp.oracle_to_spark("binary_double") == T.DoubleType()
    assert tp.oracle_to_spark("date") == T.TimestampType()
    assert tp.oracle_to_spark("timestamp(6)") == T.TimestampType()
    # TSTZ → ISO string (ZonedTimestamp, OracleValueConverters.java:71-73)
    assert tp.oracle_to_spark("timestamp(6) with time zone") == T.StringType()
    assert tp.oracle_to_spark("interval day to second") == T.LongType()


def test_timestamp_epoch_micros_roundtrip(spark):
    # Oracle TIMESTAMP ↔ epoch micros (OracleValueConverters.java:373-385)
    df = spark.createDataFrame([("2019-02-06 10:54:18.654321",)], "s string")
    got = df.select(
        tp.timestamp_to_epoch_micros(F.to_timestamp("s")).alias("us")
    ).first()["us"]
    assert got % 1_000_000 == 654_321  # micros preserved exactly
    back = (
        spark.range(1)
        .select(tp.epoch_millis_to_timestamp(F.lit(got // 1000)).alias("t"))
        .first()["t"]
    )
    assert back.strftime("%Y-%m-%d %H:%M:%S") == "2019-02-06 10:54:18"


def test_interval_conversions(spark):
    df = spark.range(1)
    # -3y -6m ≙ reference fixture (OracleValueConverters fixed 30-day months)
    ytm = df.select(
        tp.interval_ytm_to_micros(F.lit(-3), F.lit(-6)).alias("us")
    ).first()["us"]
    assert ytm == -(3 * 12 + 6) * 30 * 24 * 3600 * 1_000_000
    dts = df.select(
        tp.interval_dts_to_micros(
            F.lit(1), F.lit(2), F.lit(3), F.lit(4), F.lit(5)
        ).alias("us")
    ).first()["us"]
    assert dts == ((((1 * 24 + 2) * 60 + 3) * 60) + 4) * 1_000_000 + 5


def test_zoned_timestamp_to_iso(spark):
    """VERDICT r4 #7 — ZonedTimestamp value conversion
    (OracleValueConverters.java:388-390): ISO_OFFSET_DATE_TIME strings,
    matching java.time — fraction in groups of 3 only when non-zero,
    'Z' for zero offset, DST-aware named zones."""
    cases = [
        # (utc instant, zone, expected ISO string)
        ("2019-02-06 10:54:18.654321", "UTC", "2019-02-06T10:54:18.654321Z"),
        ("2019-02-06 10:54:18.654000", "+05:30", "2019-02-06T16:24:18.654+05:30"),
        ("2019-02-06 10:54:18", "-08:00", "2019-02-06T02:54:18-08:00"),
        # DST: New York is -05:00 in winter, -04:00 in summer
        ("2019-01-15 12:00:00", "America/New_York", "2019-01-15T07:00:00-05:00"),
        ("2019-07-15 12:00:00.123456", "America/New_York", "2019-07-15T08:00:00.123456-04:00"),
    ]
    df = spark.createDataFrame([(s, z, e) for s, z, e in cases], "s string, z string, e string")
    rows = df.select(
        tp.zoned_timestamp_to_iso(F.to_timestamp("s"), F.col("z")).alias("iso"),
        "e",
    ).collect()
    for r in rows:
        assert r["iso"] == r["e"], r


def test_uuid_canonical(spark):
    raw = bytes(range(16))
    df = spark.createDataFrame([(raw,)], "b binary")
    got = df.select(tp.uuid_canonical(F.col("b")).alias("u")).first()["u"]
    assert got == "00010203-0405-0607-0809-0a0b0c0d0e0f"


def test_duration_struct(spark):
    df = spark.createDataFrame([(1, 2, 3)], "m int, d int, n long")
    got = df.select(
        tp.duration_struct(F.col("m"), F.col("d"), F.col("n")).alias("dur")
    ).first()["dur"]
    assert (got["months"], got["days"], got["nanos"]) == (1, 2, 3)


def test_cassandra_type_converter_matrix():
    """Port of CassandraTypeConverterTest.java:45-230 — the CQL →
    engine-type matrix, incl. the frozen<> cases (frozen is a storage
    property: element types convert identically) and nested generics."""
    import pyspark.sql.types as T

    from debezium_incubator_spark.functions.types import cassandra_to_spark as c2s

    assert c2s("ascii") == T.StringType()
    assert c2s("text") == T.StringType()
    assert c2s("varchar") == T.StringType()
    assert c2s("blob") == T.BinaryType()
    assert c2s("bigint") == T.LongType()
    assert c2s("counter") == T.LongType()
    assert c2s("boolean") == T.BooleanType()
    assert c2s("tinyint") == T.ByteType()
    assert c2s("smallint") == T.ShortType()
    assert c2s("int") == T.IntegerType()
    assert c2s("float") == T.FloatType()
    assert c2s("double") == T.DoubleType()
    assert c2s("date") == T.DateType()
    # decimal: exact by default; reference-parity mode is the lossy
    # double (CassandraTypeDeserializer decimal → double)
    assert c2s("decimal", decimal_parity_mode=True) == T.DoubleType()
    # frozen vs non-frozen convert to the same logical type
    assert c2s("list<int>") == T.ArrayType(T.IntegerType())
    assert c2s("frozen<list<int>>") == T.ArrayType(T.IntegerType())
    assert c2s("set<text>") == T.ArrayType(T.StringType())
    assert c2s("frozen<set<text>>") == T.ArrayType(T.StringType())
    assert c2s("map<text,int>") == T.MapType(T.StringType(), T.IntegerType())
    assert c2s("frozen<map<text,int>>") == T.MapType(T.StringType(), T.IntegerType())
    # nested generics: a generic KEY must not break the map split
    assert c2s("map<frozen<list<int>>, text>") == T.MapType(
        T.StringType(), T.StringType()
    )
    assert c2s("map<text, frozen<map<text,bigint>>>") == T.MapType(
        T.StringType(), T.MapType(T.StringType(), T.LongType())
    )
    assert c2s("list<frozen<tuple<int,text>>>") == T.ArrayType(
        T.StructType(
            [
                T.StructField("field1", T.IntegerType()),
                T.StructField("field2", T.StringType()),
            ]
        )
    )
