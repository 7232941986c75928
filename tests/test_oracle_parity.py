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
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{key}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{key}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sm = _rows_multiset(spark_cols, spark_rows)
    dm = _rows_multiset(duck_cols, duck_rows)
    if sm != dm:
        diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
        pytest.fail(f"{key}: value mismatch, first diffs: {diff}")
