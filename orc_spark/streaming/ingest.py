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
