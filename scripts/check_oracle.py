"""Local mirror of the driver's correctness gate: run queries() on
Spark and oracle_sql() on DuckDB over the same parquet tables, compare
row count, sorted-by-name schema, and a value hash.

Usage: python scripts/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
No names = every query that has an oracle entry.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{_norm_cell(v[k])}" for k in sorted(v)
        ) + "}"
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or [n for n in qs if n in oracles]
    failures = []
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN queries()")
            failures.append(name)
            continue
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                rows_ok = len(srows) == len(orows)
                schema_ok = sorted(scols) == sorted(ocols)
                hash_ok = _hash_rows(scols, srows) == _hash_rows(ocols, orows)
                ok = rows_ok and schema_ok and hash_ok
                print(
                    f"{name}: {'PASS' if ok else 'FAIL'} "
                    f"rows={len(srows)}/{len(orows)} schema={schema_ok} "
                    f"hash={hash_ok}"
                )
                if not ok:
                    failures.append(name)
                    if not schema_ok:
                        print(f"  spark cols:  {sorted(scols)}")
                        print(f"  oracle cols: {sorted(ocols)}")
                    if rows_ok and schema_ok and not hash_ok:
                        order = sorted(
                            range(len(scols)), key=lambda i: scols[i]
                        )
                        oorder = sorted(
                            range(len(ocols)), key=lambda i: ocols[i]
                        )
                        sset = sorted(
                            "\x1f".join(_norm_cell(r[i]) for i in order)
                            for r in srows
                        )
                        oset = sorted(
                            "\x1f".join(_norm_cell(r[i]) for i in oorder)
                            for r in orows
                        )
                        for a, b in zip(sset, oset):
                            if a != b:
                                print(f"  spark : {a[:200]}")
                                print(f"  oracle: {b[:200]}")
                                break
            else:
                print(f"{name}: rows-only rows={len(srows)}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    if failures:
        print("failures:", ", ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
