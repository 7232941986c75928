"""Unit tests for bench/pipeline helper functions (no Spark)."""

from __future__ import annotations

import importlib.util
import os
import sys

from orc_spark.engine import pipeline


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_parse_bytes_suffixes():
    assert pipeline._parse_bytes("134217728") == 134217728
    assert pipeline._parse_bytes("128m") == 128 << 20
    assert pipeline._parse_bytes("128MB") == 128 << 20
    assert pipeline._parse_bytes("4g") == 4 << 30
    assert pipeline._parse_bytes(" 16k ") == 16 << 10


def test_probe_host_health_shape():
    p = _bench().probe_host_health()
    assert set(p) == {"fresh_mb_s", "warm_mb_s", "healthy"}
    assert p["fresh_mb_s"] > 0 and p["warm_mb_s"] > 0


def test_descendant_pids_contains_self():
    pids = _bench()._descendant_pids()
    assert os.getpid() in pids


def test_compact_headline_under_tail_window():
    """The printed bench line must stay <2 KB (VERDICT r3 #1: the r3
    full-detail line outgrew the driver's tail capture and the round's
    perf snapshot parsed as null) while carrying the headline fields."""
    import json

    fake = {
        "metric": "orc_spark_headline_sec", "value": 60.0, "unit": "sec",
        "queries": {f"q{i}": 9.999 for i in range(12)},
        "sf": "/root/testdata/sf0.1", "web_rows": 300000,
        "web_ratio": 2.179, "encode_web_mb_s": 103.1,
        "decode_web_mb_s": 193.2, "web_ratio_zlib": 3.605,
        "encode_web_zlib_mb_s": 150.0, "decode_web_zlib_mb_s": 93.1,
        "documents_ratio": 6.4,
        "point_lookup_speedup_vs_full_decode": 2.5,
        "main_phase": {"host_probes": [{}] * 4,
                       "measured_during_degraded_host": False},
        "scaling": {
            "parallelism_small": 1, "parallelism_large": 4,
            "mb_s_small": 51.3, "mb_s_large": 181.3, "efficiency": 0.884,
            "n_probes": 14, "n_healthy_probes": 3,
            "measured_during_degraded_host": False,
            "estimator": "e" * 200,
            "rounds": [{"runs_small_sec": [1.0] * 6,
                        "runs_large_sec": [1.0] * 6,
                        "efficiency": 0.8}] * 4,
            "host_probes": [{"fresh_mb_s": 9999, "warm_mb_s": 99999,
                             "healthy": True}] * 8,
            "best_observed_on_host": {
                "efficiency": 0.884, "mb_s_small": 51.3,
                "mb_s_large": 181.3, "measured_at": 1786964365,
                "method": "m" * 150, "method_hash": "abc"},
        },
        "point_lookup_best_observed_on_host": {
            "rows": 600000, "decode_sec": 91.5, "point_lookup_sec": 4.3,
            "speedup": 21.23, "measured_at": 1786995379,
            "method": "m" * 150, "method_hash": "def"},
        "scale_smoke": {
            "rows": 600000, "bytes_in": 10**9, "ratio": 2.18,
            "encode_sec": 12.0, "encode_mb_s": 88.0, "decode_sec": 9.0,
            "decode_mb_s": 110.0, "decoded_rows": 600000,
            "point_lookup_sec": 1.2, "point_lookup_rows": 1,
            "point_lookup_speedup_vs_full_decode": 7.5,
            "measured_during_degraded_host": False,
            "host_probes": [{}] * 6},
    }
    bench = _bench()
    line = json.dumps(bench.compact_headline(fake))
    assert len(line) < 2048, len(line)
    got = json.loads(line)
    assert got["queries"] and got["scaling"]["efficiency"] == 0.884
    assert got["scale_smoke"]["rows"] == 600000
    assert "rounds" not in got.get("scaling", {})
    # skipped smoke stays small too
    fake["scale_smoke"] = {"skipped": "s" * 500, "host_probes": [{}] * 6}
    line2 = json.dumps(bench.compact_headline(fake))
    assert len(line2) < 2048


def test_reference_orc_phase_records_contrast(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    b = _bench()
    p = str(tmp_path / "web.parquet")
    pq.write_table(
        pa.table({"url": [f"https://e.x/{i}" for i in range(2000)],
                  "text": [f"row text {i} " * 5 for i in range(2000)]}),
        p,
    )
    extras = {}
    b.reference_orc_phase(extras, p, rows=2000)
    ro = extras["reference_orc"]
    assert ro["rows"] == 2000
    for mode in ("uncompressed", "zlib"):
        assert ro[mode]["write_mb_s"] > 0
        assert ro[mode]["read_mb_s"] > 0
        assert ro[mode]["ratio"] > 0
