"""S7 — DDL statement parser: Oracle DDL text → schema-change actions.

The reference parses DDL through ANTLR (OracleDdlParser.java:44-110;
listeners AlterTableParserListener.java:76-133, column extraction
ColumnDefinitionParserListener; golden-tested in
OracleDdlParserTest.java:44-156 against
src/test/resources/ddl/create_table.sql). We don't need a full PL/SQL
grammar — the CDC control stream only ever carries table DDL — so this
is a small recursive regex parser over the statement forms the reference
tests exercise:

* CREATE TABLE [db.]tbl (col TYPE [(p[,s])] [DEFAULT lit] [NOT NULL],
  ..., PRIMARY KEY (cols)) — one ``create_table`` action carrying the
  column list (names upper-cased like Oracle's identifier folding) and
  the primary key.
* ALTER TABLE tbl ADD (col TYPE [NOT NULL], ...) and the single-column
  ``ADD [COLUMN] col TYPE`` form (which Oracle's own grammar rejects
  without parens — we accept both, noting the reference test's comment).
* ALTER TABLE tbl RENAME COLUMN a TO b → ``rename_column``.
* ALTER TABLE tbl DROP COLUMN c / DROP (c1, c2) → ``drop_column`` each.
* DROP TABLE tbl → ``drop_table``.

Oracle types map to Spark types through functions/types.py
(``oracle_to_spark`` / ``oracle_number_to_spark``), so a parsed
``add_column`` action feeds ``CDCEngine.apply_ddl_events`` directly.
"""

from __future__ import annotations

import re

from debezium_incubator_spark.functions.types import (
    oracle_number_to_spark,
    oracle_to_spark,
)

_IDENT = r'(?:"[^"]+"|[A-Za-z_][A-Za-z0-9_$#]*)'
_QUALIFIED = rf"{_IDENT}(?:\s*\.\s*{_IDENT})?"

_CREATE_RE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?P<table>{_QUALIFIED})\s*\((?P<body>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<table>{_QUALIFIED})\s+(?P<rest>.*?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TABLE_RE = re.compile(
    rf"^\s*DROP\s+TABLE\s+(?P<table>{_QUALIFIED})\b.*$", re.IGNORECASE | re.DOTALL
)
_COLDEF_RE = re.compile(
    rf"^(?P<name>{_IDENT})\s+(?P<type>[A-Za-z_][A-Za-z0-9_ ]*?)"
    r"(?:\s*\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+)\s*)?\))?"
    r"(?P<tail>(?:\s+.*)?)$",
    re.IGNORECASE | re.DOTALL,
)
_DEFAULT_RE = re.compile(r"\bDEFAULT\s+('(?:[^']*)'|[^\s,]+)", re.IGNORECASE)

# Oracle synonyms that land on NUMBER semantics (ANSI numeric names are
# NUMBER under the hood — OracleDdlParserTest's `int` / `decimal(6,2)`)
_NUMBER_ALIASES = {"number", "int", "integer", "smallint", "decimal", "numeric", "dec"}


def _ident(s: str) -> str:
    """Oracle folds unquoted identifiers to upper case; quoted keep case."""
    s = s.strip()
    if s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    return s.upper()


def _qualified(s: str) -> str:
    """Fold a possibly schema-qualified name part by part, so
    '"MySchema"."MyTable"' → 'MySchema.MyTable' (a whole-string _ident
    would strip only the outermost quote pair)."""
    parts = re.findall(_IDENT, s)
    return ".".join(_ident(p) for p in parts)


def _split_top(body: str) -> list[str]:
    """Split on commas at paren depth 0, respecting quoted strings."""
    out, depth, cur, in_str = [], 0, [], False
    for ch in body:
        if in_str:
            cur.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _spark_dtype(type_name: str, p: int | None, s: int | None) -> str:
    base = type_name.strip().lower()
    if base in _NUMBER_ALIASES:
        if base in ("int", "integer"):
            p = p if p is not None else 38
            s = s if s is not None else 0
        if base == "smallint":
            p, s = (p if p is not None else 4), (s if s is not None else 0)
        return oracle_number_to_spark(p, s if s is not None else (0 if p is not None else None)).simpleString()
    if base == "float":
        # FLOAT(binary precision) is NUMBER-backed but converts to double
        return "double"
    return oracle_to_spark(base, p, s).simpleString()


def _parse_coldef(text: str, table: str) -> dict | None:
    m = _COLDEF_RE.match(text.strip())
    if not m:
        return None
    type_name = m.group("type").strip()
    tail = m.group("tail") or ""
    dm = _DEFAULT_RE.search(tail)
    default = dm.group(1).strip("'") if dm else None
    not_null = re.search(r"\bNOT\s+NULL\b", tail, re.IGNORECASE) is not None
    return {
        "action": "add_column",
        "table": table,
        "name": _ident(m.group("name")),
        "dtype": _spark_dtype(type_name, _int(m.group("p")), _int(m.group("s"))),
        "nullable": not not_null,
        "default": default,
    }


def _int(v: str | None) -> int | None:
    return int(v) if v is not None else None


def parse_ddl(statement: str) -> list[dict]:
    """Parse ONE DDL statement into schema-change action rows (the input
    format of ``CDCEngine.apply_ddl_events``). Unsupported statements
    (GRANT, CREATE INDEX, ALTER ... MODIFY, constraints) return a single
    ``{"action": "unsupported"}`` row — the engine warns and skips them,
    matching the reference's warn-and-continue on unhandled DDL
    (OracleSchemaChangeEventEmitter:42-80)."""
    stmt = statement.strip().rstrip(";").strip()
    m = _CREATE_RE.match(statement)
    if m:
        table = _qualified(m.group("table"))
        cols, pk = [], []
        for item in _split_top(m.group("body")):
            pkm = re.match(r"^PRIMARY\s+KEY\s*\(([^)]*)\)$", item, re.IGNORECASE)
            if pkm:
                pk = [_ident(c) for c in pkm.group(1).split(",")]
                continue
            if re.match(r"^(CONSTRAINT|UNIQUE|CHECK|FOREIGN)\b", item, re.IGNORECASE):
                continue
            cd = _parse_coldef(item, table)
            if cd:
                cols.append({k: cd[k] for k in ("name", "dtype", "nullable", "default")})
        return [
            {"action": "create_table", "table": table, "columns": cols, "primary_key": pk}
        ]
    m = _DROP_TABLE_RE.match(stmt)
    if m:
        return [{"action": "drop_table", "table": _qualified(m.group("table"))}]
    m = _ALTER_RE.match(statement)
    if m:
        table = _qualified(m.group("table"))
        rest = m.group("rest").strip().rstrip(";").strip()
        am = re.match(r"^ADD\s*(?:COLUMN\s+)?\((?P<body>.*)\)$", rest, re.IGNORECASE | re.DOTALL)
        if am:
            out = []
            for item in _split_top(am.group("body")):
                cd = _parse_coldef(item, table)
                if cd:
                    out.append(cd)
            return out or [{"action": "unsupported", "table": table, "text": stmt}]
        am = re.match(r"^ADD\s+(?:COLUMN\s+)?(?P<def>.+)$", rest, re.IGNORECASE | re.DOTALL)
        if am and not re.match(r"^CONSTRAINT\b", am.group("def"), re.IGNORECASE):
            cd = _parse_coldef(am.group("def"), table)
            if cd:
                return [cd]
        rm = re.match(
            rf"^RENAME\s+COLUMN\s+(?P<old>{_IDENT})\s+TO\s+(?P<new>{_IDENT})$",
            rest,
            re.IGNORECASE,
        )
        if rm:
            return [
                {
                    "action": "rename_column",
                    "table": table,
                    "name": _ident(rm.group("old")),
                    "new_name": _ident(rm.group("new")),
                }
            ]
        dm = re.match(r"^DROP\s*\((?P<cols>[^)]*)\)$", rest, re.IGNORECASE)
        if dm:
            return [
                {"action": "drop_column", "table": table, "name": _ident(c)}
                for c in dm.group("cols").split(",")
            ]
        dm = re.match(rf"^DROP\s+COLUMN\s+(?P<col>{_IDENT})$", rest, re.IGNORECASE)
        if dm:
            return [{"action": "drop_column", "table": table, "name": _ident(dm.group("col"))}]
        mm = re.match(r"^MODIFY\s+(?:COLUMN\s+)?(?P<def>.+)$", rest, re.IGNORECASE | re.DOTALL)
        if mm:
            # type change (the reference's OracleDdlParserTest leaves
            # MODIFY as a todo; we parse + apply widenings — see
            # LakeTable.modify_column)
            cd = _parse_coldef(mm.group("def"), table)
            if cd:
                cd["action"] = "modify_column"
                return [cd]
        return [{"action": "unsupported", "table": table, "text": stmt}]
    return [{"action": "unsupported", "table": None, "text": stmt}]


def schema_from_create_action(action: dict) -> tuple[list[tuple[str, str]], list[str]]:
    """``create_table`` action → ((name, spark_type) field list, primary
    key columns) — the provisioning input for a LakeTable (columns become
    field-id'd schema entries; the PK becomes the bucket columns). ≙ the
    one DDL path the reference FULLY applies: CREATE TABLE → registered
    table schema, OracleSchemaChangeEventEmitter.java:65-80."""
    if action.get("action") != "create_table":
        raise ValueError(f"not a create_table action: {action.get('action')!r}")
    fields = [(c["name"], c["dtype"]) for c in action.get("columns", [])]
    if not fields:
        raise ValueError(f"create_table for {action.get('table')!r} carries no columns")
    names = {n for n, _ in fields}
    by_ci = {n.lower(): n for n, _ in fields}
    pk = []
    for c in action.get("primary_key", []):
        if c in names:
            pk.append(c)
        elif c.lower() in by_ci:
            # unquoted PK names fold to UPPER while quoted column names
            # keep case — resolve case-insensitively rather than silently
            # dropping the key (bucketing on the wrong columns would only
            # surface as an opaque failure at the first epoch)
            pk.append(by_ci[c.lower()])
        else:
            raise ValueError(
                f"create_table for {action.get('table')!r}: PRIMARY KEY column "
                f"{c!r} is not among the declared columns {sorted(names)}"
            )
    return fields, pk


def parse_ddl_batch(statements: list[str]) -> list[dict]:
    """Parse many statements in order (a DDL control-stream epoch)."""
    out = []
    for s in statements:
        out.extend(parse_ddl(s))
    return out


_STMT_KEYWORD = re.compile(r"\s*(?:CREATE|ALTER|GRANT|DROP\s+TABLE)\b", re.IGNORECASE)


def split_ddl_script(text: str) -> list[str]:
    """Split a DDL script into statements: ;-separated AND
    newline-separated (a newline followed by a statement-STARTING
    keyword opens a new statement even without a ';'). Bare DROP is
    deliberately NOT in the lookahead: a multi-line
    "ALTER TABLE t\\n  DROP (a, b);" legally continues with DROP — but
    "DROP TABLE" is unambiguous (no ALTER clause starts with it), so it
    splits like CREATE/ALTER/GRANT rather than being silently glued
    onto the previous statement.

    Separators inside single-quoted string literals are inert (ADVICE
    r4): a DEFAULT 'a;b' or a literal whose next line begins with
    CREATE must not split mid-statement — the warn-and-skip apply path
    would then silently drop both halves. Oracle escapes a quote inside
    a literal by doubling it ('') — that keeps the quote state. A
    ``--`` line comment (outside a literal) is skipped without quote
    tracking: an apostrophe in prose ("-- don't touch") must not flip
    the quote state and glue every following statement into one
    unparseable blob (review r5 #5)."""
    stmts: list[str] = []
    buf: list[str] = []
    in_quote = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if not in_quote and ch == "-" and text[i : i + 2] == "--":
            # drop the comment (through end of line): quotes inside it
            # are prose, not literal delimiters, and keeping it would
            # surface comment text as a bogus statement at the next
            # newline-keyword split
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch == "'":
            if in_quote and i + 1 < n and text[i + 1] == "'":
                buf.append("''")
                i += 2
                continue
            in_quote = not in_quote
        elif not in_quote:
            if ch == ";":
                stmts.append("".join(buf))
                buf = []
                i += 1
                continue
            if ch == "\n" and "".join(buf).strip() and _STMT_KEYWORD.match(text, i + 1):
                stmts.append("".join(buf))
                buf = []
                i += 1
                continue
        buf.append(ch)
        i += 1
    if buf:
        stmts.append("".join(buf))
    return [s.strip() + ";" for s in stmts if s.strip()]
