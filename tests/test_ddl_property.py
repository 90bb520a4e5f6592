"""Property test: any well-formed column list rendered to DDL text must
parse back verbatim (names, widths, nullability) — the fuzz coverage the
reference gets from ANTLR's grammar we get from round-tripping."""

from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_incubator_spark.functions.types import oracle_number_to_spark
from debezium_incubator_spark.sources.ddl import parse_ddl

_name = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,14}", fullmatch=True).filter(
    # avoid clause keywords that a real grammar also reserves
    lambda s: s.upper() not in {"NOT", "NULL", "DEFAULT", "PRIMARY", "KEY", "CONSTRAINT", "ADD", "DROP"}
)

_coldef = st.tuples(
    _name,
    st.sampled_from(["varchar2", "nvarchar2", "char", "clob", "blob", "date", "timestamp"]),
    st.booleans(),  # not null
) | st.tuples(_name, st.just("number"), st.booleans())


@settings(max_examples=60, deadline=None)
@given(st.lists(_coldef, min_size=1, max_size=6), st.integers(1, 30), st.integers(0, 5))
def test_alter_add_roundtrip(cols, p, s):
    s = min(s, p)
    rendered = []
    expected = []
    seen = set()
    for name, typ, not_null in cols:
        if name.upper() in seen:
            continue
        seen.add(name.upper())
        if typ == "number":
            rendered.append(f"{name} NUMBER({p},{s}){' NOT NULL' if not_null else ''}")
            dtype = oracle_number_to_spark(p, s).simpleString()
        elif typ in ("varchar2", "nvarchar2", "char"):
            rendered.append(f"{name} {typ}(40){' NOT NULL' if not_null else ''}")
            dtype = "string"
        else:
            rendered.append(f"{name} {typ}{' NOT NULL' if not_null else ''}")
            dtype = {"clob": "string", "blob": "binary", "date": "timestamp", "timestamp": "timestamp"}[typ]
        expected.append((name.upper(), dtype, not not_null))
    stmt = f"ALTER TABLE ks.tbl ADD ({', '.join(rendered)});"
    acts = parse_ddl(stmt)
    got = [(a["name"], a["dtype"], a["nullable"]) for a in acts]
    assert got == expected
    assert all(a["action"] == "add_column" and a["table"] == "KS.TBL" for a in acts)
