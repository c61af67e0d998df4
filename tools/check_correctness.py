"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf=0.01 and compares it
to the matching ``oracle_sql()`` via DuckDB: row count, column names
(sorted), and an order-insensitive value compare (rows sorted after
sorting columns by name; values stringified). Strict equality so we catch
float drift before the driver does.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sc = [cols[i] for i in order]
    out = sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
    return sc, out


def type_family(t):
    """Collapse a type name into the family the driver's typed hash sees.

    The driver compares at the Arrow layer, so an integer width mismatch
    (DuckDB sum(INT) -> HUGEINT vs Spark BIGINT) fails its hash even when
    the stringified values match. Flag those here. Temporal and decimal
    kinds are collapsed since the driver normalizes them.
    """
    t = str(t).lower()
    if t in ("tinyint", "int8"):
        return "i8"
    if t in ("smallint", "int16"):
        return "i16"
    if t in ("int", "integer", "int32"):
        return "i32"
    if t in ("bigint", "long", "int64"):
        return "i64"
    if t in ("hugeint", "int128", "uhugeint"):
        return "i128"
    if t in ("float", "real", "float32"):
        return "f32"
    if t in ("double", "float64"):
        return "f64"
    if t.startswith("decimal"):
        return "dec"
    if t.startswith(("timestamp", "date")):
        return "temporal"
    if t in ("string", "varchar", "text"):
        return "str"
    if t in ("binary", "blob"):
        return "bin"
    if t in ("boolean", "bool"):
        return "bool"
    return t


def type_mismatches(scols, stypes, dcols, dtypes):
    """Return integer/float-family mismatches between Spark and DuckDB."""
    smap = {c: type_family(t) for c, t in zip(scols, stypes)}
    dmap = {c: type_family(t) for c, t in zip(dcols, dtypes)}
    out = []
    for c in smap:
        a, b = smap[c], dmap.get(c)
        if b is None or a == b:
            continue
        numeric = {"i8", "i16", "i32", "i64", "i128", "f32", "f64", "dec"}
        if a in numeric or b in numeric:
            out.append(f"{c}: spark={a} duck={b}")
    return out


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from dotnetspider_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("correctness-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        tmis = type_mismatches(
            scols, [f.dataType.simpleString() for f in sdf.schema.fields],
            dcols, dtypes,
        )
        if tmis:
            failures.append((name, f"numeric type mismatch: {tmis}"))
            print(f"FAIL {name}: numeric type mismatch: {tmis}")
            continue
        sc, sr = normalize(scols, srows)
        dc, dr = normalize(dcols, drows)
        if sc != dc:
            failures.append((name, f"schema: spark={sc} duck={dc}"))
            print(f"FAIL {name}: schema: spark={sc} duck={dc}")
        elif len(sr) != len(dr):
            failures.append((name, f"rowcount: spark={len(sr)} duck={len(dr)}"))
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
            )
            failures.append((name, f"values differ, first at {diff}"))
            print(f"FAIL {name}: first diff {diff}")
        else:
            print(f"OK   {name}: {len(sr)} rows")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
