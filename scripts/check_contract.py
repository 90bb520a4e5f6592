"""Simulate the driver's correctness gate: run every queries() entry and
its oracle_sql() DuckDB twin at sf0.01, compare row count + column set +
order-insensitive value hash. Exit nonzero on any mismatch."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for t in pdf.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in t))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.17g}"  # full precision: catch ulp drift the driver would
    try:
        import pandas as pd

        if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
    except Exception:
        pass
    return str(v)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod
    from debezium_incubator_spark.session import get_spark

    spark = get_spark(app_name="check_contract")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf).toPandas()
            # the dedup/ANN operators persist slim self-join inputs;
            # those cache entries are plan-keyed and live until the
            # session ends — release them between queries so a 35-query
            # session doesn't accumulate /dev/shm-backed blocks
            spark.catalog.clearCache()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"· {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            if len(got) == 0 and name != "heartbeat":
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"✗ {name}: oracle error: {e}")
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"✗ {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            # show a sample diff for debugging
            cols = sorted(set(got.columns) & set(exp.columns))
            if cols and len(got) == len(exp):
                g = got[cols].sort_values(cols).reset_index(drop=True)
                e = exp[cols].sort_values(cols).reset_index(drop=True)
                neq = (g.astype(str) != e.astype(str)).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    print(f"  first diff row {i}:\n   got {g.iloc[i].to_dict()}\n   exp {e.iloc[i].to_dict()}")
        else:
            print(f"✓ {name}: {len(got)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
