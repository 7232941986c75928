"""Shared fixtures. Spark session is session-scoped (JVM start is slow)."""

from __future__ import annotations

import os

import pytest

# First-touch page faults on this virtualized host are intermittently
# ~1000x slow; large numpy temps default to mmap/munmap churn that
# re-pays the fault on every allocation. Keep big allocations on the
# retained heap (Arrow's system pool obeys the same tunables). Set
# before the JVM / Python workers fork. See bench.py for measurements.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("orc_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
