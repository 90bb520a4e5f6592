"""S7 DDL parser — ports the reference's OracleDdlParserTest.java:44-156
cases (create_table.sql fixture, the alter add/drop sequences, and
Gunnar's simple create) onto parse_ddl, plus the engine wiring
(apply_ddl_statements → schema commits → replay across the rename)."""

import pytest

from debezium_incubator_spark.sources.ddl import parse_ddl, parse_ddl_batch

# the reference's src/test/resources/ddl/create_table.sql verbatim
CREATE_TABLE_SQL = """create table DEBEZIUM
(id number(19) not null,
col1 number(4,2),
col2 varchar2(255) default 'debezium' not null ,
col3 nvarchar2(255) not null,
col4 char(4),
col5 nchar(4),
col6 float(126),
col7 date,
col8 timestamp,
col9 blob,
col10 clob,
primary key (id));"""


def test_parse_reference_create_table():
    (act,) = parse_ddl(CREATE_TABLE_SQL)
    assert act["action"] == "create_table"
    assert act["table"] == "DEBEZIUM"
    names = [c["name"] for c in act["columns"]]
    # OracleDdlParserTest asserts exactly these columns in this order
    assert names == [
        "ID", "COL1", "COL2", "COL3", "COL4", "COL5",
        "COL6", "COL7", "COL8", "COL9", "COL10",
    ]
    assert act["primary_key"] == ["ID"]
    cols = {c["name"]: c for c in act["columns"]}
    assert cols["ID"]["nullable"] is False
    assert cols["ID"]["dtype"] == "decimal(19,0)"   # NUMBER(19,0): 19 digits > long
    assert cols["COL1"]["dtype"] == "decimal(4,2)"  # NUMBER(4,2)
    assert cols["COL2"]["dtype"] == "string" and cols["COL2"]["default"] == "debezium"
    assert cols["COL2"]["nullable"] is False
    assert cols["COL3"]["nullable"] is False
    assert cols["COL4"]["dtype"] == "string"
    assert cols["COL6"]["dtype"] == "double"        # FLOAT(126)
    assert cols["COL7"]["dtype"] == "timestamp"     # DATE has time-of-day
    assert cols["COL8"]["dtype"] == "timestamp"
    assert cols["COL9"]["dtype"] == "binary"        # BLOB
    assert cols["COL10"]["dtype"] == "string"       # CLOB


def test_parse_alter_add_multi():
    # OracleDdlParserTest: "alter table DEBEZIUM add (col21 varchar2(20), col22 number(19));"
    acts = parse_ddl("alter table DEBEZIUM add (col21 varchar2(20), col22 number(19));")
    assert [(a["action"], a["name"], a["dtype"]) for a in acts] == [
        ("add_column", "COL21", "string"),
        ("add_column", "COL22", "decimal(19,0)"),
    ]
    # single-column un-parenthesized form (Oracle's grammar rejects it;
    # the reference test documents that — we accept it)
    (a,) = parse_ddl("alter table DEBEZIUM add col23 varchar2(20);")
    assert (a["action"], a["name"], a["dtype"]) == ("add_column", "COL23", "string")
    # NOT NULL inside the parens
    (a,) = parse_ddl("alter table DEBEZIUM add (col23 varchar2(20) not null);")
    assert a["name"] == "COL23" and a["nullable"] is False


def test_parse_alter_drop_and_drop_table():
    acts = parse_ddl("alter table DEBEZIUM drop (col22, col23);")
    assert [(a["action"], a["name"]) for a in acts] == [
        ("drop_column", "COL22"),
        ("drop_column", "COL23"),
    ]
    (a,) = parse_ddl("alter table DEBEZIUM drop column col21;")
    assert (a["action"], a["name"]) == ("drop_column", "COL21")
    (a,) = parse_ddl("drop table DEBEZIUM;")
    assert (a["action"], a["table"]) == ("drop_table", "DEBEZIUM")


def test_parse_simple_create_gunnar():
    # OracleDdlParserTest.shouldParseCreateTable
    (act,) = parse_ddl(
        "create table debezium.customer ("
        "  id int not null, "
        "  name varchar2(1000), "
        "  score decimal(6, 2), "
        "  registered date, "
        "  primary key (id)"
        ");"
    )
    assert act["table"] == "DEBEZIUM.CUSTOMER"
    cols = {c["name"]: c for c in act["columns"]}
    assert set(cols) == {"ID", "NAME", "SCORE", "REGISTERED"}
    assert cols["ID"]["nullable"] is False
    assert cols["NAME"]["dtype"] == "string"
    assert cols["SCORE"]["dtype"] == "decimal(6,2)"
    assert cols["REGISTERED"]["dtype"] == "timestamp"
    assert act["primary_key"] == ["ID"]


def test_parse_rename_and_unsupported():
    (a,) = parse_ddl("ALTER TABLE repos.files RENAME COLUMN lang TO language;")
    assert a == {
        "action": "rename_column",
        "table": "REPOS.FILES",
        "name": "LANG",
        "new_name": "LANGUAGE",
    }
    # constraints stay unsupported (reference todo); MODIFY we parse and
    # apply as a widening (exceeds parity — OracleDdlParserTest todo)
    (a,) = parse_ddl(
        "ALTER TABLE DEBEZIUM ADD CONSTRAINT FK FOREIGN KEY (col1) REFERENCES r(ID);"
    )
    assert a["action"] == "unsupported"
    (a,) = parse_ddl("ALTER TABLE DEBEZIUM MODIFY COL1 varchar2(50) not null;")
    assert (a["action"], a["name"], a["dtype"], a["nullable"]) == (
        "modify_column", "COL1", "string", False,
    )
    (a,) = parse_ddl("GRANT SELECT ON DEBEZIUM TO PUBLIC;")
    assert a["action"] == "unsupported"


def test_quoted_identifiers_preserve_case():
    # quoted QUALIFIED names fold per part (whole-string stripping would
    # leave embedded quotes: 'MySchema"."MyTable')
    (a,) = parse_ddl('ALTER TABLE "MySchema"."MyTable" DROP COLUMN c;')
    assert a["table"] == "MySchema.MyTable" and a["name"] == "C"
    (a,) = parse_ddl('ALTER TABLE t ADD ("mixedCase" number(2));')
    assert a["name"] == "mixedCase" and a["dtype"] == "tinyint"
    (a,) = parse_ddl('ALTER TABLE t ADD ("mixedCase" number(3));')
    assert a["name"] == "mixedCase" and a["dtype"] == "smallint"


def test_engine_applies_parsed_ddl(spark, tmp_path):
    """End to end: DDL text → parse → schema commits → envelopes written
    under the OLD name still apply (rename mapping) — the reference's
    schema-history replay guarantee."""
    import warnings

    from debezium_incubator_spark.plans.pipeline import CDCEngine

    eng = CDCEngine(spark, str(tmp_path / "t"), str(tmp_path / "c"), num_buckets=4)
    eng.create_target()
    n = eng.apply_ddl_statements(
        [
            "ALTER TABLE repos.files ADD (stars NUMBER(9,0));",
            "ALTER TABLE repos.files RENAME COLUMN stars TO stargazers;",
        ]
    )
    assert n == 2
    fields = {f["name"]: f["type"] for f in eng.table.current_fields()}
    assert fields["STARGAZERS".lower() if "stargazers" in fields else "STARGAZERS"]
    # identifier folding: engine columns are whatever the parser emitted
    assert "STARGAZERS" in fields and fields["STARGAZERS"] == "int"
    # MODIFY widening applies end to end (int -> bigint, metadata-only)
    n = eng.apply_ddl_statements(["ALTER TABLE repos.files MODIFY stargazers NUMBER(18,0);"])
    assert n == 1
    fields = {f["name"]: f["type"] for f in eng.table.current_fields()}
    assert fields["STARGAZERS"] == "bigint"
    # narrowing is refused
    with pytest.raises(ValueError, match="lossless"):
        eng.apply_ddl_statements(["ALTER TABLE repos.files MODIFY stargazers NUMBER(3,0);"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        n = eng.apply_ddl_statements(["GRANT SELECT ON repos.files TO PUBLIC;"])
    assert n == 0 and any("unsupported" in str(x.message) for x in w)


def test_parse_batch_order():
    acts = parse_ddl_batch(
        [
            "ALTER TABLE t ADD (a number(3));",
            "ALTER TABLE t RENAME COLUMN a TO b;",
            "ALTER TABLE t DROP COLUMN b;",
        ]
    )
    assert [a["action"] for a in acts] == ["add_column", "rename_column", "drop_column"]
