"""Driver-fidelity oracle parity: for every oracle-backed query in
``__spark_entry__``, run the Spark DataFrame AND the DuckDB SQL twin on
the same sf0.01 parquet tables and compare row count, column names, and
(column-name-sorted) values — the same contract the external driver's
CORRECTNESS gate applies. Catches Spark/SQL drift before the driver does.

Mirrors the reference's golden-output eval discipline
(/root/reference/internal/eval/eval.go:533-607: run + rubric on the
same fixture) as a pytest suite.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round-trip through 9 significant digits: catches real drift,
        # forgives last-ulp differences in agg accumulation order
        return float(f"{v:.9g}")
    if isinstance(v, bytes):
        return v.hex()
    import datetime

    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    try:  # Decimal and numpy scalars
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(f"{float(v):.9g}")
    except Exception:
        pass
    return v


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t),
    )


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


ORACLE_KEYS = sorted(entry.oracle_sql().keys())


@pytest.mark.slow
@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, duck, key):
    q = entry.queries()[key]
    sdf = q(spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry.oracle_sql()[key])
    duck_cols = [d[0] for d in res.description]
    duck_arrow = res.arrow()
    duck_rows = [tuple(r.values()) for r in duck_arrow.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{key}: column mismatch {spark_cols} vs {duck_cols}"
    )

    # Typed check (driver fidelity): the driver's value-hash is TYPED —
    # r2 lost two rows to DuckDB widening SUM(BIGINT) to HUGEINT
    # (arrow decimal128) against Spark's int64, with every value equal.
    # Compare coarse arrow-type families so that class of drift fails
    # here first. Int widths are allowed to differ (both sides
    # canonicalize to int64-representable values).
    def family(t) -> str:
        import pyarrow as pa

        if pa.types.is_boolean(t):
            return "bool"
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_decimal(t):
            return "decimal"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "binary"
        if pa.types.is_timestamp(t):
            return "timestamp"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return "list"
        return str(t)

    _SPARK_FAMILY = {
        "BooleanType": "bool", "ByteType": "int", "ShortType": "int",
        "IntegerType": "int", "LongType": "int", "FloatType": "float",
        "DoubleType": "float", "StringType": "string",
        "BinaryType": "binary", "TimestampType": "timestamp",
        "TimestampNTZType": "timestamp", "DateType": "date",
    }
    for f in sdf.schema.fields:
        tname = type(f.dataType).__name__
        sfam = _SPARK_FAMILY.get(
            tname, "decimal" if tname == "DecimalType" else
            "list" if tname == "ArrayType" else tname
        )
        dfam = family(duck_arrow.schema.field(f.name).type)
        assert sfam == dfam, (
            f"{key}.{f.name}: typed mismatch — Spark {tname} ({sfam}) vs "
            f"DuckDB arrow {duck_arrow.schema.field(f.name).type} ({dfam}); "
            "the driver's typed value-hash will fail on this even if "
            "values are identical (cast the oracle)"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{key}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sm = _rows_multiset(spark_cols, spark_rows)
    dm = _rows_multiset(duck_cols, duck_rows)
    if sm != dm:
        diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
        pytest.fail(f"{key}: value mismatch, first diffs: {diff}")
