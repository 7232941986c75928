"""Run-history retention — the reference's history archive + prune
(/root/reference/internal/state/history.go:111-183: keep the newest
``history-limit`` runs, default 10, delete the rest).

Our runs live inside shared stripes/lineage parquet directories, so
pruning rewrites the tables without the expired run_ids (the parquet
stand-in for Iceberg ``expire_snapshots``; with an Iceberg catalog
this whole module is one DDL call). Rewrites are atomic: new data is
written to a temp dir, then swapped in.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import lineage as lineage_mod

DEFAULT_HISTORY_LIMIT = 10  # reference default: internal/config/validate.go:88-90


def list_runs(spark: SparkSession, out_dir: str) -> list[str]:
    """run_ids newest-first (by latest lineage timestamp)."""
    lin = lineage_mod.read_lineage(spark, out_dir)
    rows = (
        lin.groupBy("run_id")
        .agg(F.max("ts").alias("latest"))
        .orderBy(F.desc("latest"))
        .collect()
    )
    return [r.run_id for r in rows]


def _rewrite_without(spark: SparkSession, path: str, keep_runs: list[str], schema=None):
    if not os.path.exists(path):
        return
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path).filter(F.col("run_id").isin(keep_runs))
    tmp = path + ".retention_tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path + ".retention_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def prune_history(
    spark: SparkSession, out_dir: str, limit: int = DEFAULT_HISTORY_LIMIT
) -> list[str]:
    """Keep the newest ``limit`` runs; returns the expired run_ids."""
    runs = list_runs(spark, out_dir)
    expired = runs[limit:]
    if not expired:
        return []
    keep = runs[:limit]
    _rewrite_without(
        spark, lineage_mod.stripes_dir(out_dir), keep
    )
    _rewrite_without(
        spark, lineage_mod.lineage_dir(out_dir), keep, lineage_mod.LINEAGE_SCHEMA
    )
    return expired
