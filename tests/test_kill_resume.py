"""Crash resumability: SIGKILL the driver mid-run, resubmit with the
same run_id, and the manifest anti-join completes only what's missing —
the reference's interrupt->resume discipline
(/root/reference/internal/runner/runner.go:316-322, state saved after
every phase) at process-kill fidelity."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import pytest

SCRIPT = """
import sys
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
from orc_spark.engine import pipeline
spark = (SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
cfg = pipeline.EncodeJobConfig(
    out_dir={out!r}, run_id="kill-e2e", key="doc_id",
    n_partitions=8, waves=8)
res = pipeline.run_encode_job(spark, df, cfg)
print("RESULT " + str((res.partitions_encoded, res.partitions_skipped)))
spark.stop()
"""


@pytest.mark.slow
def test_sigkill_mid_run_then_resume():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tempfile.mkdtemp(prefix="orcspark_kill_")
    lineage_dir = os.path.join(out, "lineage")
    code = SCRIPT.format(root=root, out=out)

    # First run: kill -9 as soon as the first wave has committed.
    p = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=root,
    )
    deadline = time.time() + 300
    committed = False
    while time.time() < deadline and p.poll() is None:
        if os.path.isdir(lineage_dir) and any(
            f.endswith(".parquet") for f in os.listdir(lineage_dir)
        ):
            committed = True
            break
        time.sleep(0.2)
    if p.poll() is None:
        p.kill()
        p.wait()
    assert committed, "no wave committed before the run finished/was killed"

    # Second run, same run_id: must skip the committed partitions and
    # finish the rest.
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=root,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")][-1]
    encoded, skipped = eval(line.split(" ", 1)[1])
    assert skipped >= 1, "resume did not skip any committed partition"
    assert encoded + skipped == 8

    # And the union decodes bit-identically.
    import duckdb

    import pyarrow.parquet as pq

    sys.path.insert(0, root)
    from pyspark.sql import SparkSession

    from orc_spark.engine import pipeline

    spark = SparkSession.builder.getOrCreate()
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dec = pipeline.decode_job(spark, out, "kill-e2e", df.schema)
    v = pipeline.verify_roundtrip(df, dec, "doc_id")
    assert v["count_original"] == v["count_decoded"] == 500
    assert v["missing_from_decoded"] == 0 and v["extra_in_decoded"] == 0


def test_resume_identity_guard_and_persisted_config(spark, tmp_path):
    """Resuming with a different key/salt/n_partitions than the run's
    persisted config raises instead of silently re-assigning rows;
    compact defaults its identity from the stored config."""
    import pytest as _pytest

    from orc_spark.engine import pipeline, webgen

    df = webgen.generate_spark(spark, 2000).select("url", "lang")
    out = str(tmp_path / "idg")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="idg1", key="url", n_partitions=4
    )
    pipeline.run_encode_job(spark, df, cfg)
    stored = pipeline.load_run_config(out, "idg1")
    assert (stored["key"], stored["n_partitions"]) == ("url", 4)

    for bad in (
        dict(n_partitions=8),
        dict(salt=7),
        dict(key="lang"),
    ):
        cfg_bad = pipeline.EncodeJobConfig(
            out_dir=out, run_id="idg1", key="url", n_partitions=4
        )
        for k, v in bad.items():
            setattr(cfg_bad, k, v)
        with _pytest.raises(ValueError, match="partition identity"):
            pipeline.run_encode_job(spark, df, cfg_bad)

    # same identity resumes fine (no-op: everything completed)
    res = pipeline.run_encode_job(
        spark, df,
        pipeline.EncodeJobConfig(out_dir=out, run_id="idg1", key="url", n_partitions=4),
    )
    assert res.partitions_skipped == 4

    # compact pulls key/partitions from the stored config
    res2 = pipeline.compact_run(spark, out, "idg1", df.schema)
    assert res2.partitions_encoded == 4


SWAP_KILL_SCRIPT = """
import os, signal, sys
sys.path.insert(0, {root!r})
from orc_spark.engine import retention

_real_rename = os.rename
def killing_rename(src, dst):
    _real_rename(src, dst)
    os.kill(os.getpid(), signal.SIGKILL)  # die INSIDE the swap window

os.rename = killing_rename
retention._swap_in({path!r}, {tmp!r})
"""


def test_sigkill_between_swap_renames_leaves_table_readable(spark, tmp_path):
    """VERDICT r3 #6: retention/vacuum's two-rename swap had a crash
    window where the live table dir is ABSENT. A SIGKILL injected
    right after the first rename must leave the table recoverable —
    every read path calls recover_swap, which restores the parked
    pre-rewrite copy."""
    import shutil

    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, retention

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "job")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="swapkill", key="doc_id", n_partitions=4
    )
    pipeline.run_encode_job(spark, df, cfg)
    sdir = os.path.join(out, "stripes")
    n_before = pipeline.read_stripes(spark, out, "swapkill").count()

    # stage a rewrite result (what vacuum would have written) and kill
    # the swapper between its two renames — real _swap_in code path
    tmp = sdir + ".vacuum_tmp"
    shutil.copytree(sdir, tmp)
    p = subprocess.run(
        [sys.executable, "-c",
         SWAP_KILL_SCRIPT.format(root=root, path=sdir, tmp=tmp)],
        cwd=root, capture_output=True,
    )
    assert p.returncode == -signal.SIGKILL
    assert not os.path.exists(sdir)  # the crash window, on disk
    assert os.path.exists(sdir + retention._SWAP_OLD)

    # any read path recovers: the table is back, bit-identical rows
    stripes = pipeline.read_stripes(spark, out, "swapkill")
    assert stripes.count() == n_before
    assert os.path.exists(sdir)
    assert not os.path.exists(sdir + retention._SWAP_OLD)
    dec = pipeline.decode_job(spark, out, "swapkill", df.schema)
    chk = pipeline.verify_roundtrip(df, dec, "doc_id")
    assert chk["missing_from_decoded"] == 0 and chk["extra_in_decoded"] == 0

    # idempotence: a crash AFTER the second rename (old left behind
    # with a live dir) just drops the stale copy
    shutil.copytree(sdir, sdir + retention._SWAP_OLD)
    assert retention.recover_swap(sdir) is False
    assert not os.path.exists(sdir + retention._SWAP_OLD)


def test_writer_lock_serializes_and_breaks_stale(tmp_path):
    """ADVICE r4 #1: rewrites take an advisory O_EXCL writer lock —
    a second writer times out while the first holds it, a lock whose
    holder pid is dead is broken, and the lock always releases."""
    import os

    import pytest

    from orc_spark.engine import retention

    path = str(tmp_path / "stripes")
    with retention.writer_lock(path):
        assert os.path.exists(path + retention._LOCK_SUFFIX)
        with pytest.raises(TimeoutError, match="writer lock"):
            with retention.writer_lock(path, timeout_s=0.3):
                pass
    assert not os.path.exists(path + retention._LOCK_SUFFIX)

    # stale: write a lock owned by a pid that cannot exist, then acquire
    lock = path + retention._LOCK_SUFFIX
    with open(lock, "w") as fh:
        fh.write("999999999 0")
    assert retention._lock_is_stale(lock)
    with retention.writer_lock(path, timeout_s=1.0):
        pass  # broke the stale lock and took it
    assert not os.path.exists(lock)

    # garbled lock: treated as live -> contender times out
    with open(lock, "w") as fh:
        fh.write("not-a-pid")
    with pytest.raises(TimeoutError):
        with retention.writer_lock(path, timeout_s=0.3):
            pass
    os.unlink(lock)
