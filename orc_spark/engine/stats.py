"""Column statistics sampling (the codec selector's global view).

``stats_sample`` is deliberately expressed in plain DataFrame
aggregations (SQL-expressible — it gets a DuckDB oracle twin in
__spark_entry__), mirroring the reference's stats aggregation package
(/root/reference/internal/stats/stats.go:233-480). Per-stripe dynamic
stats live in selector.stripe_stats; this module is the table-level
profile used for planning and reporting.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats_sample(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Tall per-column profile: (column, n, n_null, n_distinct,
    min_str, max_str, avg_len).

    String lengths for string columns; NULL avg_len otherwise. min/max
    are stringified so one tall schema fits every column type.
    """
    cols = columns or df.columns
    parts = []
    for c in cols:
        is_str = dict(df.dtypes)[c] == "string"
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_str"),
                F.max(F.col(c)).cast("string").alias("max_str"),
                (
                    F.avg(F.length(F.col(c))) if is_str else F.lit(None).cast("double")
                ).alias("avg_len"),
            )
        )
    return reduce(DataFrame.unionAll, parts)


def stats_sample_sql(table: str, columns: list[str], str_columns: set[str]) -> str:
    """The DuckDB-oracle twin of :func:`stats_sample`."""
    selects = []
    for c in columns:
        avg_len = f"AVG(LENGTH({c}))" if c in str_columns else "CAST(NULL AS DOUBLE)"
        selects.append(
            f"SELECT '{c}' AS column, COUNT(*) AS n, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_str, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_str, "
            f"{avg_len} AS avg_len FROM {table}"
        )
    return " UNION ALL ".join(selects)
