"""Incremental encode of a growing crawl directory (Structured Streaming).

A production crawl lands new parquet files continuously; this module
encodes each arrival exactly once:

- the file source + checkpointLocation give exactly-once progress over
  *files* (Spark's own WAL — which files were consumed);
- each micro-batch runs the same resumable encode job as batch mode
  (`pipeline.run_encode_job`) under an epoch-scoped run_id, so the
  stripe/lineage layout is identical to batch output and the per-
  partition manifest still guards against double-encode inside a batch
  (driver crash mid-epoch ⇒ the epoch replays, completed partitions
  anti-join away — the reference's resume-after-interrupt semantics,
  /root/reference/internal/runner/runner.go:316-322).

At cluster scale the pattern is unchanged: `trigger(processingTime=...)`
instead of `availableNow`, and the checkpoint dir on shared storage.
No watermark is needed — encoding is per-row work with no event-time
aggregation (late files are just... files).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import SparkSession

from orc_spark.engine import pipeline


def incremental_encode(
    spark: SparkSession,
    input_dir: str,
    schema,
    cfg: pipeline.EncodeJobConfig,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> list[pipeline.EncodeJobResult]:
    """Encode every not-yet-consumed parquet file under ``input_dir``.

    Runs with trigger(availableNow=True): drains the backlog, then
    stops — call again after more files land (or swap the trigger for
    a long-lived run). Returns one EncodeJobResult per micro-batch.
    """
    results: list[pipeline.EncodeJobResult] = []

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _encode_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch_cfg = replace(cfg, run_id=f"{cfg.run_id}-e{epoch_id}")
        results.append(pipeline.run_encode_job(spark, batch_df, epoch_cfg))

    (
        stream.writeStream.foreachBatch(_encode_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return results


def incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    output_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
) -> int:
    """Cross-micro-batch exact dedup: a STATEFUL streaming aggregation
    over the growing crawl (`groupBy(sha2(text)).agg(min id, count)`,
    output mode *complete*) — the streaming counterpart of
    dedup.exact_dedup with identical output columns and keeper rule.

    The aggregation state (one row per distinct content hash) lives in
    Spark's streaming state store across micro-batches, so a duplicate
    arriving three files later still folds into its keeper — something
    per-batch dedup cannot see. Each trigger rewrites ``output_dir``
    with the complete keeper table (foreachBatch overwrite = the
    idempotent sink for complete mode). Runs with
    trigger(availableNow=True): drains the backlog, then stops; call
    again after more files land and the state resumes from
    ``checkpoint_dir``.

    At 10^12 docs the state is one (sha, min_id, count) row per
    DISTINCT document — the same cardinality any exact dedup must
    materialize — hash-partitioned across executors by the state
    store; use RocksDB state store + processingTime trigger in
    production. Returns the number of micro-batches processed.
    """
    from pyspark.sql import functions as F

    n_batches = 0

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    keepers = (
        stream.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )

    def _write_batch(batch_df, epoch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        batch_df.write.mode("overwrite").parquet(output_dir)

    (
        keepers.writeStream.foreachBatch(_write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return n_batches
