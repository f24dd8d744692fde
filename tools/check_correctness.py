"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 on Spark AND its oracle_sql() on DuckDB, compare row count,
column names, and an order-insensitive value multiset.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from catalogue_pipeline_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def spark_type_family(simple: str) -> str:
    """Coarse dtype family for a Spark simpleString()."""
    s = simple.lower()
    if s.startswith(("array", "struct", "map")):
        return s.split("<")[0]
    if s in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "int"
    if s.startswith("decimal") or s in ("double", "float"):
        return "float"
    if s in ("timestamp", "timestamp_ntz"):
        return "ts"  # Spark LTZ renders identically to NTZ under a UTC session
    return {"string": "str", "boolean": "bool"}.get(s, s)


def duckdb_type_family(t) -> str:
    """Coarse dtype family for a DuckDB column type. TIMESTAMPTZ is kept
    distinct from TIMESTAMP on purpose: the driver's schema compare treats
    them as different, so an oracle drifting to `to_timestamp()` (TZ-aware)
    must fail here too."""
    s = str(t).upper()
    if s.startswith(("STRUCT", "MAP")):
        return s.split("(")[0].lower()
    if s.endswith("[]") or s.startswith("LIST"):
        return "array"
    if "TIME ZONE" in s or s == "TIMESTAMPTZ":
        return "tstz"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s.startswith("DECIMAL") or s in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    return {"VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
            "BLOB": "binary"}.get(s, s.lower())


def main():
    only = set(sys.argv[1:])
    spark = build_session("cps-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {e!r}"[:300])
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e!r}"[:300])
            failures.append(name)
            continue
        scols = [c.lower() for c in cols]
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures.append(name)
            continue
        stypes = {f.name.lower(): spark_type_family(f.dataType.simpleString())
                  for f in df.schema.fields}
        otypes = {c.lower(): duckdb_type_family(t)
                  for c, t in zip(rel.columns, rel.types)}
        bad = {c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes[c]}
        if bad:
            print(f"FAIL {name}: dtype mismatch {bad}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures.append(name)
            continue
        sm = rows_to_multiset(srows, scols)
        om = rows_to_multiset(orows, ocols)
        if sm != om:
            diff_s = list((sm - om).items())[:3]
            diff_o = list((om - sm).items())[:3]
            print(f"FAIL {name}: value mismatch; spark-only={diff_s} oracle-only={diff_o}"[:500])
            failures.append(name)
            continue
        print(f"ok   {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
