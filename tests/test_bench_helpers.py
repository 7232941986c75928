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
