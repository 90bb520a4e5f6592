"""Type system: reference source types → Spark types + value converters.

Mirrors the two reference ladders:
* Cassandra driver types → Avro (CassandraTypeDeserializer.java:58-111,
  CassandraTypeToAvroSchemaMapper.java:31-47, per-type deserializers)
* Oracle JDBC/oracle.sql types → Connect schemas
  (OracleValueConverters.java:52-139; NUMBER(p,s) width inference
  :82-111,141-168; temporal conversions :347-441)

Where the reference is lossy we keep a parity mode and a better default:
Cassandra decimal→double is lossy (CassandraTypeDeserializer.java:64);
we default to DecimalType and offer ``decimal_parity_mode`` for
bit-exact reference behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- mapping

# Cassandra type name → Spark type (CassandraTypeDeserializer.java:58-111)
CASSANDRA_TYPE_MAP: dict[str, T.DataType] = {
    "ascii": T.StringType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "boolean": T.BooleanType(),
    "blob": T.BinaryType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "counter": T.LongType(),
    "time": T.LongType(),  # nanos-of-day as long
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),  # reference: lossy double (:64)
    "date": T.DateType(),
    "timestamp": T.TimestampType(),  # epoch millis in reference
    "uuid": T.StringType(),
    "timeuuid": T.StringType(),
    "inet": T.StringType(),
    "duration": T.StructType(  # DurationTypeDeserializer.java:17-39
        [
            T.StructField("months", T.IntegerType()),
            T.StructField("days", T.IntegerType()),
            T.StructField("nanos", T.LongType()),
        ]
    ),
}


def cassandra_to_spark(
    type_name: str, decimal_parity_mode: bool = False
) -> T.DataType:
    base = type_name.strip().lower()
    # frozen<> is a storage property, not a logical type: the converter
    # preserves frozen-ness on the Cassandra side
    # (CassandraTypeConverterTest.java:176-199 frozen list/map/set cases)
    # but the element/value types are identical — unwrap recursively
    if base.startswith("frozen<") and base.endswith(">"):
        return cassandra_to_spark(base[7:-1], decimal_parity_mode)
    if base.startswith("list<") or base.startswith("set<"):
        inner = base[base.index("<") + 1 : -1]
        return T.ArrayType(cassandra_to_spark(inner, decimal_parity_mode))
    if base.startswith("map<"):
        # depth-aware split: the KEY may itself be generic
        # (map<frozen<list<int>>, text> is legal CQL) — a naive
        # split(',', 1) would cut inside the key's type arguments
        k, v = _split_args(base[4:-1])
        # map keys coerced to string (MapTypeDeserializer.java:20-50)
        return T.MapType(T.StringType(), cassandra_to_spark(v, decimal_parity_mode))
    if base.startswith("tuple<"):
        parts = _split_args(base[6:-1])
        return T.StructType(
            [
                T.StructField(f"field{i+1}", cassandra_to_spark(p, decimal_parity_mode))
                for i, p in enumerate(parts)
            ]
        )
    if base == "decimal" and decimal_parity_mode:
        return T.DoubleType()
    if base not in CASSANDRA_TYPE_MAP:
        raise ValueError(f"unsupported cassandra type: {type_name}")
    return CASSANDRA_TYPE_MAP[base]


def _split_args(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def oracle_number_to_spark(precision: int | None, scale: int | None) -> T.DataType:
    """NUMBER(p,s) width inference (OracleValueConverters.java:82-111):
    scale 0 → narrowest int by width p; s>0 → Decimal(p,s);
    unknown/variable scale → 'variable scale decimal' ≙ Decimal(38,18)."""
    if precision is None:
        return T.DecimalType(38, 18)
    if scale is not None and scale <= 0:
        width = precision - (scale or 0)
        if width < 3:
            return T.ByteType()
        if width < 5:
            return T.ShortType()
        if width < 10:
            return T.IntegerType()
        if width < 19:
            return T.LongType()
        return T.DecimalType(min(precision, 38), 0)
    if scale is not None:
        return T.DecimalType(min(precision, 38), min(scale, 37))
    return T.DecimalType(38, 18)


ORACLE_TYPE_MAP: dict[str, T.DataType] = {
    # OracleValueConverters.java:52-139 + OracleDdlParser.java:80-118
    "char": T.StringType(),
    "varchar2": T.StringType(),
    "nchar": T.StringType(),
    "nvarchar2": T.StringType(),
    "clob": T.StringType(),
    "blob": T.BinaryType(),
    "binary_float": T.FloatType(),
    "binary_double": T.DoubleType(),
    "float": T.DoubleType(),
    "date": T.TimestampType(),  # Oracle DATE has time-of-day
    "timestamp": T.TimestampType(),  # µs precision (epoch micros)
    "timestamp with time zone": T.StringType(),  # ZonedTimestamp ISO string
    "timestamp with local time zone": T.StringType(),
    "interval year to month": T.LongType(),  # micro-duration
    "interval day to second": T.LongType(),
}


def oracle_to_spark(type_name: str, precision=None, scale=None) -> T.DataType:
    base = type_name.strip().lower()
    if base.startswith("number"):
        return oracle_number_to_spark(precision, scale)
    if base.startswith("timestamp") and "time zone" in base:
        return ORACLE_TYPE_MAP["timestamp with time zone"]
    if base.startswith("timestamp"):
        return T.TimestampType()
    if base not in ORACLE_TYPE_MAP:
        raise ValueError(f"unsupported oracle type: {type_name}")
    return ORACLE_TYPE_MAP[base]


# ---------------------------------------------------------------- nested types
# Cassandra collection/tuple/UDT VALUE conversion, mirroring the
# transforms/type/deserializer family (CassandraTypeDeserializer.java:92-111):
#   ListTypeDeserializer  → array (order preserved)
#   SetTypeDeserializer   → array (Avro has no set; we additionally sort +
#                           dedup so the distributed result is canonical —
#                           the JVM set's iteration order is not)
#   MapTypeDeserializer   → map, keys stringified when not already string
#                           (Avro map keys must be strings)
#   TupleTypeDeserializer → struct with fields field1..fieldN (1-based)
#   UserTypeDeserializer  → struct with the UDT's own field names


def list_to_array(col: Column) -> Column:
    """ListTypeDeserializer: identity — Spark arrays are ordered."""
    return col


def set_to_array(col: Column) -> Column:
    """SetTypeDeserializer → array; canonicalized (sorted, distinct) so
    the same logical set always serializes identically across tasks."""
    return F.array_sort(F.array_distinct(col))


def map_string_keys(col: Column) -> Column:
    """MapTypeDeserializer: 'squish the keys down into strings' when the
    key type is not string (MapTypeDeserializer.java:21-40)."""
    entries = F.transform(
        F.map_entries(col),
        lambda e: F.struct(e["key"].cast("string").alias("key"), e["value"].alias("value")),
    )
    return F.map_from_entries(entries)


def tuple_field_name(i: int) -> str:
    """TupleTypeDeserializer field naming — 'begin indexing at 1'
    (TupleTypeDeserializer.java:71-74): field1..fieldN. Must agree with
    cassandra_to_spark's tuple schema (same module, same names)."""
    return f"field{i + 1}"


def tuple_to_struct(*cols: Column) -> Column:
    """TupleTypeDeserializer: positional tuple → record{field1..fieldN}."""
    return F.struct(*[c.alias(tuple_field_name(i)) for i, c in enumerate(cols)])


def udt_to_struct(col: Column, field_names: list[str]) -> Column:
    """UserTypeDeserializer: UDT value → record with the UDT's field
    names (order given by the type definition)."""
    return F.struct(*[col[n].alias(n) for n in field_names])


# ---------------------------------------------------------------- converters

def timestamp_to_epoch_micros(ts: Column) -> Column:
    """Oracle TIMESTAMP → epoch micros (OracleValueConverters.java:373-385,
    asserted OracleConnectorIT.java:584-586)."""
    return F.unix_micros(ts)


def epoch_millis_to_timestamp(ms: Column) -> Column:
    """Cassandra timestamp ← epoch millis (TimestampTypeDeserializer)."""
    return F.timestamp_millis(ms)


def zoned_timestamp_to_iso(ts: Column, zone: Column | str) -> Column:
    """TIMESTAMP WITH (LOCAL) TIME ZONE → ISO-8601 offset string
    (OracleValueConverters.java:388-390: ZonedTimestamp emits
    ISO_OFFSET_DATE_TIME). ``ts`` is the instant (UTC); ``zone`` is the
    zone the value was written in (named id or fixed offset). Matches
    java.time's formatter: fractional seconds in groups of 3 only when
    non-zero, offset ``Z`` for zero, ``±HH:MM[:SS]`` otherwise (seconds
    only for pre-standardization LMT offsets).

    Pure Column ops — the zone offset at the instant is recovered as the
    internal-micros shift ``from_utc_timestamp`` applies, so named zones
    with DST resolve correctly without a UDF."""
    z = F.lit(zone) if isinstance(zone, str) else zone
    wall = F.from_utc_timestamp(ts, z)
    us = F.unix_micros(ts)
    off_s = F.floor((F.unix_micros(wall) - us) / F.lit(1_000_000)).cast("long")
    a = F.abs(off_s)
    oh = F.floor(a / 3600).cast("int")
    om = F.floor(F.pmod(a, 3600) / 60).cast("int")
    osec = F.pmod(a, 60).cast("int")
    offset = F.when(off_s == 0, F.lit("Z")).otherwise(
        F.concat(
            F.when(off_s < 0, F.lit("-")).otherwise(F.lit("+")),
            F.format_string("%02d:%02d", oh, om),
            F.when(osec != 0, F.format_string(":%02d", osec)).otherwise(F.lit("")),
        )
    )
    frac_us = F.pmod(us, F.lit(1_000_000)).cast("long")
    frac = (
        F.when(frac_us == 0, F.lit(""))
        .when(
            F.pmod(frac_us, 1000) == 0,
            F.format_string(".%03d", F.floor(frac_us / 1000).cast("int")),
        )
        .otherwise(F.format_string(".%06d", frac_us.cast("int")))
    )
    return F.concat(F.date_format(wall, "yyyy-MM-dd'T'HH:mm:ss"), frac, offset)


def interval_ytm_to_micros(years: Column, months: Column) -> Column:
    """INTERVAL YEAR TO MONTH → micro-duration using the reference's
    fixed-length month convention (NumberConversions.DOUBLE semantics,
    OracleValueConverters.java:392-410): year=12 months, month=30 days."""
    days = ((years * 12 + months) * F.lit(30)).cast("long")
    return days * F.lit(24 * 3600 * 1_000_000).cast("long")


def interval_dts_to_micros(
    days: Column, hours: Column, minutes: Column, seconds: Column, micros: Column
) -> Column:
    """INTERVAL DAY TO SECOND → micros (OracleValueConverters.java:412-441)."""
    total_s = (((days * 24 + hours) * 60 + minutes) * 60 + seconds).cast("long")
    return total_s * F.lit(1_000_000).cast("long") + micros


def uuid_canonical(uuid_bytes: Column) -> Column:
    """fixed(16) UUID bytes → canonical hex string (UuidUtil semantics)."""
    h = F.lower(F.hex(uuid_bytes))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def duration_struct(months: Column, days: Column, nanos: Column) -> Column:
    """Cassandra duration → record{months,days,nanos}
    (CassandraTypeToAvroSchemaMapper.java:37-41)."""
    return F.struct(
        months.cast("int").alias("months"),
        days.cast("int").alias("days"),
        nanos.cast("long").alias("nanos"),
    )
