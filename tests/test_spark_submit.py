"""Deployment e2e: the engine runs under spark-submit --py-files with
the package shipped as a zip (the north rule's launch mechanism), and a
second submit with the same run_id resumes instead of re-encoding."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest


def _make_pkg_zip(tmpdir: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(tmpdir, "orc_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(root, "orc_spark")):
            dirnames[:] = [d for d in dirnames if d not in ("__pycache__", "_native_build")]
            for fn in filenames:
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, root))
    return zpath


@pytest.mark.slow
def test_spark_submit_py_files_roundtrip_and_resume():
    submit = shutil.which("spark-submit")
    if submit is None:
        import pyspark

        submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        if not os.path.exists(submit):
            pytest.skip("spark-submit not available")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="orcspark_submit_")
    zpath = _make_pkg_zip(tmp)
    out_dir = os.path.join(tmp, "encoded")

    def run():
        cmd = [
            submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            os.path.join(root, "scripts", "submit_encode.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out_dir,
            "--run-id", "submit-e2e",
            "--key", "doc_id",
            "--partitions", "8",
            "--verify",
        ]
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the package must come from the zip
        env.setdefault("PYSPARK_PYTHON", sys.executable)
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=600, cwd=tmp, env=env
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    first = run()
    assert first["status"] == "completed"
    assert first["partitions_encoded"] == 8 and first["partitions_skipped"] == 0
    assert first["verify"]["missing_from_decoded"] == 0
    assert first["verify"]["extra_in_decoded"] == 0
    assert first["bytes_out"] < first["bytes_in"]

    second = run()  # same run_id: the manifest anti-join skips everything
    assert second["partitions_encoded"] == 0 and second["partitions_skipped"] == 8

    shutil.rmtree(tmp, ignore_errors=True)
