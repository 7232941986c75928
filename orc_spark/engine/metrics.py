"""Metrics-table reporting — the reference's ``stats`` package
(/root/reference/internal/stats/stats.go:233-480) re-expressed as
DataFrame aggregations over the lineage ledger (SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compression_by_column(lineage: DataFrame) -> DataFrame:
    """Per-column bytes in/out, ratio, throughput — the headline report.
    Blob-free nested-stats rows (codec='stats') carry no bytes and
    would only add 0/0 ratio noise — excluded."""
    return (
        lineage.filter(F.col("codec") != "stats")
        .groupBy("column")
        .agg(
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("encode_ms").alias("encode_ms"),
        )
        .withColumn("ratio", F.col("bytes_in") / F.col("bytes_out"))
        .withColumn(
            "mb_per_s", F.col("bytes_in") / 1e6 / (F.col("encode_ms") / 1e3)
        )
        .orderBy("column")
    )


def compression_by_codec(lineage: DataFrame) -> DataFrame:
    return (
        lineage.filter(F.col("codec") != "stats")
        .groupBy("codec")
        .agg(
            F.count(F.lit(1)).alias("n_stripes"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
        )
        .withColumn("ratio", F.col("bytes_in") / F.col("bytes_out"))
        .orderBy(F.desc("bytes_in"), "codec")
    )


def success_rate(lineage: DataFrame) -> DataFrame:
    """Completed share + avg/p95 encode time — mirrors the reference's
    success-rate and avg/P95 aggregations
    (/root/reference/internal/stats/stats.go:276-329)."""
    return lineage.agg(
        F.count(F.lit(1)).alias("n_stripes"),
        (
            F.avg(F.when(F.col("status") == "completed", 1.0).otherwise(0.0)) * 100
        ).alias("success_pct"),
        F.avg("encode_ms").alias("avg_encode_ms"),
        F.percentile_approx("encode_ms", 0.95).alias("p95_encode_ms"),
    )


def failure_categories(lineage: DataFrame) -> DataFrame:
    """Failure-category breakdown: count + percent of failed stripes,
    count-desc then name-asc — mirrors the reference's failure stats
    (/root/reference/internal/stats/stats.go:399-437)."""
    from pyspark.sql import Window

    failed = lineage.filter(F.col("status") == "failed")
    by_cat = failed.groupBy("failure_category").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    return (
        by_cat.withColumn("pct_of_failed", F.col("n") * 100.0 / total)
        .orderBy(F.desc("n"), "failure_category")
    )


def merge_child_runs(
    parent: DataFrame, children: dict[str, DataFrame]
) -> DataFrame:
    """Fold child-run lineage into a parent ledger with prefixed run ids.

    Mirrors the reference's hierarchical cost merge, where a child
    workflow's per-phase ledger is folded into the parent under
    ``prefix/name`` keys (/root/reference/internal/state/costs.go:101-128).
    The engine analogue: a streaming ingest (or composite pipeline)
    produces epoch-scoped child runs whose lineage rolls up under
    ``parent_run/child_run`` so run_summary() reports both levels.
    """
    merged = parent
    for prefix, child in children.items():
        merged = merged.unionByName(
            child.withColumn(
                "run_id", F.concat(F.lit(prefix + "/"), F.col("run_id"))
            )
        )
    return merged


def run_summary(lineage: DataFrame) -> DataFrame:
    """Per-run rollup (≙ run-result.json / RunResult,
    /root/reference/internal/state/runresult.go:11-32)."""
    return (
        lineage.groupBy("run_id")
        .agg(
            F.countDistinct("partition_id").alias("n_partitions"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
            F.sum("encode_ms").alias("total_encode_ms"),
            F.min("ts").alias("started"),
            F.max("ts").alias("finished"),
        )
        .withColumn("ratio", F.col("bytes_in") / F.col("bytes_out"))
        .orderBy("run_id")
    )
