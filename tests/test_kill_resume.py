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
