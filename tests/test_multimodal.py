"""Multimodal plumbing tests: schema, determinism, batch shapes.
Decode is stubbed (no media libs in container) — see multimodal.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_spark.textops import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rng = np.random.default_rng(3)
    rows = [(i, rng.bytes(256 + i * 37)) for i in range(64)]
    return spark.createDataFrame(rows, "media_id long, payload binary").cache()


def test_media_metadata(spark, media):
    meta = multimodal.media_metadata(media, "media_id", "payload", "image")
    rows = {r.media_id: r for r in meta.collect()}
    assert len(rows) == 64
    assert rows[0].n_bytes == 256 and rows[63].n_bytes == 256 + 63 * 37
    assert all(len(r.sha) == 64 for r in rows.values())
    assert set(meta.columns) == {
        "media_id", "kind", "n_bytes", "sha", "width", "height", "duration_ms"
    }


def test_feature_extraction_deterministic(spark, media):
    f1 = {r.media_id: r.feature for r in multimodal.extract_features(media, "media_id", "payload").collect()}
    f2 = {r.media_id: r.feature for r in multimodal.extract_features(media, "media_id", "payload").collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    # L2-normalized
    for v in f1.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # content-sensitive: different payloads -> different features
    assert f1[0] != f1[1]


def test_frame_sampling_shapes(spark, media):
    frames = multimodal.frame_sample_stub(media, "media_id", "payload", every_ms=200)
    agg = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    by_id = {r.media_id: r.n for r in agg}
    assert all(1 <= n <= 8 for n in by_id.values())
    r0 = frames.filter(F.col("media_id") == 63).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in r0] == list(range(len(r0)))
    assert all(len(r.frame_bytes) <= 64 for r in r0)
