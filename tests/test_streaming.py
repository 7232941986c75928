"""Incremental ingestion: new crawl files are encoded exactly once and
decode back bit-identically; already-consumed files are never re-read."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from orc_spark.engine import lineage, pipeline
from orc_spark.streaming import ingest


def test_incremental_encode_exactly_once(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    out_dir = str(tmp_path / "encoded")
    ckpt = str(tmp_path / "ckpt")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)

    first.coalesce(1).write.mode("append").parquet(str(in_dir))
    cfg = pipeline.EncodeJobConfig(
        out_dir=out_dir, run_id="stream", key="doc_id", n_partitions=4
    )
    r1 = ingest.incremental_encode(spark, str(in_dir), docs.schema, cfg, ckpt)
    assert sum(r.partitions_encoded for r in r1) == 4

    # drain again with no new files: nothing to do
    r2 = ingest.incremental_encode(spark, str(in_dir), docs.schema, cfg, ckpt)
    assert sum(r.partitions_encoded for r in r2) == 0

    # second arrival: only the new file is consumed
    second.coalesce(1).write.mode("append").parquet(str(in_dir))
    r3 = ingest.incremental_encode(spark, str(in_dir), docs.schema, cfg, ckpt)
    assert sum(r.partitions_encoded for r in r3) == 4

    # all epochs together decode back to the full table, bit-identical
    lin = lineage.read_lineage(spark, out_dir)
    run_ids = [r.run_id for rs in (r1, r3) for r in rs]
    assert set(run_ids) == {
        r.run_id for r in lin.select("run_id").distinct().collect()
    }
    decoded = [
        pipeline.decode_job(spark, out_dir, rid, docs.schema) for rid in run_ids
    ]
    alldec = decoded[0]
    for d in decoded[1:]:
        alldec = alldec.unionAll(d)
    v = pipeline.verify_roundtrip(docs, alldec, "doc_id")
    assert v["count_original"] == v["count_decoded"]
    assert v["missing_from_decoded"] == 0 and v["extra_in_decoded"] == 0


def test_incremental_encode_faulted_batch_then_recovery(spark, tmp_path):
    """A fault inside one micro-batch leaves failed ledger rows but does
    not kill the stream; a later batch-mode resume of that epoch's
    run_id re-encodes the failed partitions whole (epoch 1) and the
    epoch decodes bit-identically — streaming output shares all batch
    failure-recovery semantics because it IS the batch job per epoch."""
    from dataclasses import replace

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    out_dir = str(tmp_path / "enc2")
    ckpt = str(tmp_path / "ckpt2")
    docs.coalesce(1).write.mode("append").parquet(str(in_dir))

    cfg = pipeline.EncodeJobConfig(
        out_dir=out_dir, run_id="sfault", key="doc_id", n_partitions=4,
        fault_spec={"columns": ["text"], "partitions": [0]},
    )
    r1 = ingest.incremental_encode(spark, str(in_dir), docs.schema, cfg, ckpt)
    assert sum(r.partitions_failed for r in r1) == 1
    lin = lineage.read_lineage(spark, out_dir)
    assert lin.filter(F.col("status") == "failed").count() == 1

    # resume THAT epoch's run in batch mode, fault removed
    epoch_run = r1[0].run_id
    r2 = pipeline.run_encode_job(
        spark, docs,
        replace(cfg, run_id=epoch_run, fault_spec=None),
    )
    assert r2.partitions_encoded == 1 and r2.partitions_skipped == 3
    dec = pipeline.decode_job(spark, out_dir, epoch_run, docs.schema)
    v = pipeline.verify_roundtrip(docs, dec, "doc_id")
    assert v["missing_from_decoded"] == 0 and v["extra_in_decoded"] == 0


def test_incremental_dedup_state_spans_batches(spark, tmp_path):
    """The keeper table folds duplicates ACROSS micro-batches: a text
    whose copies arrive in different files ends with the global min id
    and the full copy count; resuming with a new file updates state
    rather than restarting it."""
    from pyspark.sql import functions as F

    from orc_spark.streaming import ingest

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "keepers")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(4, "shared text alpha"), (6, "only in batch one")]
    rows2 = [(1, "shared text alpha"), (9, "only in batch two")]
    schema = "doc_id long, text string"
    df1 = spark.createDataFrame(rows1, schema)
    df2 = spark.createDataFrame(rows2, schema)
    df1.coalesce(1).write.mode("append").parquet(in_dir)
    df2.coalesce(1).write.mode("append").parquet(in_dir)

    n = ingest.incremental_dedup(
        spark, in_dir, df1.schema, ckpt, out_dir, max_files_per_trigger=1
    )
    assert n >= 2
    got = {
        r.keeper_id: r.n_copies for r in spark.read.parquet(out_dir).collect()
    }
    # the cross-batch duplicate folded: keeper is the GLOBAL min (1,
    # from batch 2), count spans both batches
    assert got == {1: 2, 6: 1, 9: 1}, got

    # resume with one more file: state continues, not restarts
    df3 = spark.createDataFrame([(2, "shared text alpha")], schema)
    df3.coalesce(1).write.mode("append").parquet(in_dir)
    ingest.incremental_dedup(
        spark, in_dir, df3.schema, ckpt, out_dir, max_files_per_trigger=1
    )
    got2 = {
        r.keeper_id: r.n_copies for r in spark.read.parquet(out_dir).collect()
    }
    assert got2 == {1: 3, 6: 1, 9: 1}, got2


def test_windowed_agg_watermark_drops_late_rows(spark, tmp_path):
    """Event-time windowed aggregation with a watermark (append mode):
    windows are emitted once finalized, and a row arriving AFTER the
    watermark passed its window end is dropped — the late-data
    contract a crawl-timestamp rollup relies on. Window boundaries are
    epoch-aligned 7-day buckets; watermark restores from the
    checkpoint across runs."""
    import datetime

    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_rows: list = []

    def day(d):
        return datetime.datetime(2024, 1, d)

    schema = "event_id long, ts timestamp"
    # epoch-aligned 7-day windows: A=[2023-12-28, 2024-01-04) holds
    # Jan 1-3; B=[2024-01-04, 2024-01-11) holds Jan 4-7
    file1 = [(i, day(i)) for i in range(1, 8)] + [(99, day(20))]
    spark.createDataFrame(file1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .withWatermark("ts", "3 days")
            .groupBy(F.window("ts", "7 days").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

        def sink(batch_df, epoch_id):
            out_rows.extend(
                (r.w.start.isoformat(), r.n) for r in batch_df.collect()
            )

        (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    # second arrival: one LATE row (Jan 3 — its window end Jan 4 is
    # far behind the restored watermark Jan 17) plus a fresh row
    file2 = [(100, day(3)), (101, day(25))]
    spark.createDataFrame(file2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run()

    got = dict(out_rows)
    assert len(got) == len(out_rows), out_rows  # each window emitted once
    # finalized windows carry exactly the on-time rows; the late Jan 3
    # row did NOT bump window A from 3 to 4
    assert got.get("2023-12-28T00:00:00") == 3, got
    assert got.get("2024-01-04T00:00:00") == 4, got
    # the unfinalized tail windows (Jan 20 / Jan 25) were not emitted
    assert all(s < "2024-01-11" for s in got), got


def test_windowed_event_counts_emits_closed_windows_only(spark, tmp_path):
    """The library entry point (memory sink, availableNow): cumulative
    append output equals exactly the windows whose end is at or below
    max(ts) - delay; the open tail window is withheld and sums are
    exact."""
    import datetime

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, event_type string, value double"
    rows = [
        (datetime.datetime(2024, 1, d), t, float(d))
        for d in range(1, 15)
        for t in ("a", "b")
    ]
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("append").parquet(in_dir)

    out = ingest.windowed_event_counts(
        spark, in_dir, df.schema, ckpt, window="7 days", delay="1 day"
    )
    got = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    # windows: [12-28,01-04) days 1-3, [01-04,01-11) days 4-10,
    # [01-11,01-18) days 11-14; watermark = Jan 14 - 1d = Jan 13, so
    # only the first two windows closed
    assert got == {
        ("2023-12-28T00:00:00", "a"): (3, 6.0),
        ("2023-12-28T00:00:00", "b"): (3, 6.0),
        ("2024-01-04T00:00:00", "a"): (7, 49.0),
        ("2024-01-04T00:00:00", "b"): (7, 49.0),
    }, got


def _dir_bytes(path) -> int:
    import os

    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def test_incremental_dedup_update_cost_tracks_novelty(spark, tmp_path):
    """The update-mode sink's per-trigger write is proportional to the
    batch's NOVELTY, not the keeper-table size (VERDICT r4 #3): after a
    large first batch builds a big keeper table, a tiny second batch
    writes a tiny delta — and the folded read equals batch exact_dedup
    of the full corpus."""
    import os

    from orc_spark.streaming import ingest
    from orc_spark.textops import dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    big = spark.createDataFrame(
        [(i, f"document body number {i} with unique content") for i in range(500)],
        schema,
    )
    big.coalesce(1).write.mode("append").parquet(in_dir)
    n = ingest.incremental_dedup_update(
        spark, in_dir, big.schema, ckpt, out_dir, max_files_per_trigger=1
    )
    assert n == 1
    updates = os.path.join(out_dir, "updates")
    first_bytes = _dir_bytes(os.path.join(updates, "epoch-0"))

    # second arrival: 5 new docs + 5 duplicates of existing ones
    small = spark.createDataFrame(
        [(1000 + i, f"fresh content {i}") for i in range(5)]
        + [(2000 + i, f"document body number {i} with unique content") for i in range(5)],
        schema,
    )
    small.coalesce(1).write.mode("append").parquet(in_dir)
    ingest.incremental_dedup_update(
        spark, in_dir, small.schema, ckpt, out_dir, max_files_per_trigger=1
    )
    epoch_dirs = sorted(d for d in os.listdir(updates) if d.startswith("epoch-"))
    assert len(epoch_dirs) == 2
    second_bytes = _dir_bytes(os.path.join(updates, epoch_dirs[1]))
    # the delta carries ~10 changed rows, not the ~505-row keeper table
    assert second_bytes < first_bytes / 3, (first_bytes, second_bytes)
    second_rows = spark.read.parquet(
        os.path.join(updates, epoch_dirs[1])
    ).count()
    assert second_rows == 10

    # folded view == batch exact dedup of everything seen so far
    whole = big.unionByName(small)
    expect = {
        (r.content_sha, r.keeper_id, r.n_copies)
        for r in dedup.exact_dedup(whole).collect()
    }
    got = {
        (r.content_sha, r.keeper_id, r.n_copies)
        for r in ingest.read_dedup_keepers(spark, out_dir).collect()
    }
    assert got == expect

    # compaction folds the deltas into base; the read is unchanged
    folded = ingest.compact_dedup_updates(spark, out_dir)
    assert folded == 2
    assert not any(
        d.startswith("epoch-") for d in os.listdir(updates)
    )
    got2 = {
        (r.content_sha, r.keeper_id, r.n_copies)
        for r in ingest.read_dedup_keepers(spark, out_dir).collect()
    }
    assert got2 == expect

    # post-compaction arrivals keep working: base + new delta fold
    third = spark.createDataFrame([(3000, "fresh content 0")], schema)
    third.coalesce(1).write.mode("append").parquet(in_dir)
    ingest.incremental_dedup_update(
        spark, in_dir, third.schema, ckpt, out_dir, max_files_per_trigger=1
    )
    got3 = {
        (r.content_sha, r.keeper_id, r.n_copies)
        for r in ingest.read_dedup_keepers(spark, out_dir).collect()
    }
    expect3 = {
        (r.content_sha, r.keeper_id, r.n_copies)
        for r in dedup.exact_dedup(whole.unionByName(third)).collect()
    }
    assert got3 == expect3


def test_streaming_sessionize_merges_across_batches(spark, tmp_path):
    """A session spanning two micro-batches merges in state (one row,
    not two); the open tail session is withheld."""
    import datetime
    import os
    import time

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, user_id long, value double"

    def t(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    # user 1: events at 00:00, 01:00 (file A) and 01:30 (file B) — one
    # session [00:00, 01:30+gap); then 09:00 (new session, still open
    # at watermark max-2h = 07:00)
    file_a = [(t(0), 1, 1.0), (t(1), 1, 2.0)]
    file_b = [(t(1, 30), 1, 4.0), (t(9), 1, 8.0)]
    spark.createDataFrame(file_a, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    # pin file order: the second file must be the newer one
    time.sleep(1.1)
    spark.createDataFrame(file_b, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    newest = max(
        (os.path.join(in_dir, f) for f in os.listdir(in_dir)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )

    df = spark.createDataFrame(file_a + file_b, schema)
    out = ingest.streaming_sessionize(
        spark, in_dir, df.schema, ckpt, gap="1 hour", delay="2 hours"
    )
    rows = [
        (r.s_start.isoformat(), r.s_end.isoformat(), r.n_events, r.sum_value)
        for r in out.orderBy("s_start").collect()
    ]
    # merged session: start 00:00, end = 01:30 + 1h = 02:30, 3 events
    assert rows == [
        ("2024-01-01T00:00:00", "2024-01-01T02:30:00", 3, 7.0)
    ], (rows, newest)


def test_streaming_interval_join_matches_within_range_only(spark, tmp_path):
    """Pairs emit iff same key and right ts in [left ts, left ts +
    interval]; cross-batch pairs match via join state."""
    import datetime
    import time

    l_dir = str(tmp_path / "l")
    r_dir = str(tmp_path / "r")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, user_id long, event_id long"

    def t(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    # left: impression u1@01:00, u2@02:00
    spark.createDataFrame(
        [(t(1), 1, 10), (t(2), 2, 20)], schema
    ).coalesce(1).write.mode("append").parquet(l_dir)
    # right file 1: u1 click in range (01:30), u1 click out of range
    # (03:00), u2 click before the impression (01:30 — no match)
    spark.createDataFrame(
        [(t(1, 30), 1, 11), (t(3), 1, 12), (t(1, 30), 2, 21)], schema
    ).coalesce(1).write.mode("append").parquet(r_dir)
    time.sleep(1.1)
    # right file 2 (second batch): u2 click in range at 02:45
    spark.createDataFrame(
        [(t(2, 45), 2, 22)], schema
    ).coalesce(1).write.mode("append").parquet(r_dir)

    df = spark.createDataFrame([(t(0), 0, 0)], schema)
    out = ingest.streaming_interval_join(
        spark, l_dir, r_dir, df.schema, ckpt, within="1 hour",
        delay="10 hours",
    )
    got = sorted((r.user_id, r.l_id, r.r_id) for r in out.collect())
    assert got == [(1, 10, 11), (2, 20, 22)], got


def test_streaming_enrich_broadcast_left_join(spark, tmp_path):
    """Stream-static enrichment: multi-trigger (one file per batch),
    LEFT semantics keep unmatched rows with a NULL attribute, and
    matched rows carry the dim value."""
    from pyspark.sql import functions as F

    from orc_spark.streaming import ingest

    ev = spark.createDataFrame(
        [(i, i % 4, f"t{i % 2}") for i in range(40)],
        "event_id bigint, user_id bigint, event_type string",
    )
    dim = spark.createDataFrame(
        [(0, "gold"), (1, "silver"), (2, "bronze")],  # user 3 missing
        "c_custkey bigint, seg string",
    )
    in_dir = str(tmp_path / "in")
    ev.repartition(2).write.mode("append").parquet(in_dir)
    out = ingest.streaming_enrich(
        spark, in_dir, ev.schema, dim, str(tmp_path / "ckpt"),
        stream_key="user_id", dim_key="c_custkey",
        max_files_per_trigger=1,
    )
    rows = {r.event_id: r.seg for r in out.collect()}
    assert len(rows) == 40  # no event dropped
    for eid, seg in rows.items():
        want = {0: "gold", 1: "silver", 2: "bronze", 3: None}[eid % 4]
        assert seg == want, (eid, seg)


def test_streaming_anomaly_state_crosses_batches(spark, tmp_path):
    """applyInPandasWithState: a spike in batch 2 is judged against
    state built ENTIRELY in batch 1 — per-batch-only state would see
    n_prior=0 and flag nothing; min_n withholds early rows."""
    import datetime as dt

    from orc_spark.streaming import ingest

    base = dt.datetime(2024, 1, 1)
    rows1 = [
        (i, base + dt.timedelta(minutes=i), 7, 10.0 + (i % 3) * 0.01)
        for i in range(12)
    ]
    # batch 2: the very first row is a huge spike
    rows2 = [(100, base + dt.timedelta(hours=2), 7, 500.0)] + [
        (101 + i, base + dt.timedelta(hours=2, minutes=1 + i), 7, 10.01)
        for i in range(3)
    ]
    schema = "event_id bigint, ts timestamp_ntz, user_id bigint, value double"
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    out = ingest.streaming_anomaly(
        spark, in_dir,
        spark.createDataFrame(rows1, schema).schema,
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    flagged = {r.event_id: r.n_prior for r in out.collect()}
    assert 100 in flagged and flagged[100] == 12  # state from batch 1
    # the stable rows never flag, and nothing below min_n flags
    assert all(e == 100 for e in flagged), flagged
