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


class TestWavHeaders:
    def test_parse_real_header_with_trailing_chunks(self):
        from orc_spark.textops import multimodal as m

        # fmt + an extraneous LIST chunk before data (chunk scan must
        # skip unknown chunks and honor word alignment)
        hdr = (
            b"RIFF" + (1000).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (44100).to_bytes(4, "little") + (88200).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # odd+pad
            + b"data" + (88200).to_bytes(4, "little")
        )
        assert m.parse_wav_header(hdr) == (44100, 1, 16, 1000)

    def test_parse_rejects_garbage(self):
        from orc_spark.textops import multimodal as m

        assert m.parse_wav_header(b"") == (None, None, None, None)
        assert m.parse_wav_header(b"RIFFxxxxNOPE") == (None, None, None, None)
        assert m.parse_wav_header(b"\x89PNG\r\n\x1a\n") == (None, None, None, None)

    def test_synth_probe_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from orc_spark.textops import multimodal as m

        df = spark.createDataFrame(
            [(1, 8000, 1, 4000), (2, 44100, 2, 44100)],
            ["id", "rate", "ch", "ns"],
        )
        wavs = df.select(
            "id",
            m.synth_wav_expr(F.col("rate"), F.col("ch"), F.col("ns")).alias("audio"),
        )
        out = {r.media_id: r for r in m.probe_audio_headers(wavs, "id", "audio").collect()}
        assert out[1].sample_rate == 8000 and out[1].duration_ms == 500
        assert out[2].sample_rate == 44100 and out[2].channels == 2
        assert out[2].duration_ms == 1000


def test_mp4_parser_real_and_garbage(spark):
    from orc_spark.textops import multimodal as mm

    # spec-built header parses exactly
    hdr = (
        bytes.fromhex("0000001066747970" + "69736F6D" + "00000200")
        + bytes.fromhex("000000246D6F6F76")
        + bytes.fromhex(
            "0000001C6D766864" + "00000000" + "00000000" + "00000000"
            + "000003E8" + "00013880"
        )
    )
    assert mm.parse_mp4_header(hdr) == ("isom", 1000, 80000)
    # garbage / truncated / zero-size boxes never raise
    assert mm.parse_mp4_header(b"") == (None, None, None)
    assert mm.parse_mp4_header(b"\x00" * 40) == (None, None, None)
    assert mm.parse_mp4_header(hdr[:20]) == (None, None, None)

    # synth -> probe round trip through Spark matches the arithmetic
    from pyspark.sql import functions as F

    df = spark.range(6).select(
        F.col("id").alias("doc_id"),
        mm.synth_mp4_expr(
            (F.lit(1000) * (1 + F.col("id") % 2)).cast("long"),
            (F.lit(100) + F.col("id") * 7).cast("long"),
        ).alias("video"),
    )
    rows = {
        r.media_id: (r.brand, r.timescale, r.duration_ms)
        for r in mm.probe_video_headers(df, "doc_id", "video").collect()
    }
    for i in range(6):
        ts = 1000 * (1 + i % 2)
        dur = 100 + i * 7
        assert rows[i] == ("isom", ts, dur * 1000 // ts), i
