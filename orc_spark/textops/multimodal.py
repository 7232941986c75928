"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque ``binary`` columns with typed metadata;
the decode / feature-extraction steps run as Arrow-batched
``mapInArrow`` stages. The actual media codecs (PIL/ffmpeg/torchcodec)
are NOT present in this environment, so the decode kernel is STUBBED:
``decode_image_stub`` derives deterministic pseudo-features from the
bytes (documented below). The Spark-side plumbing — schemas, batch
shapes, partitioning, UDF signatures — is real and tested; swapping
the stub for a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("n_bytes", LongType(), False),
        StructField("sha", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def media_metadata(df: DataFrame, id_col: str, bytes_col: str, kind: str) -> DataFrame:
    """Typed metadata for an opaque media column — pure JVM expressions
    (length, sha) plus stub header probes."""
    b = F.col(bytes_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def parse_image_header(data: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from real image headers — pure Python
    over the public PNG / GIF / JPEG specs, no image libraries.

    - PNG: 8-byte signature, IHDR chunk => width/height big-endian u32
      at offsets 16/20.
    - GIF: 'GIF87a'/'GIF89a', logical-screen width/height little-endian
      u16 at offsets 6/8.
    - JPEG: marker scan from SOI to the first SOFn segment (C0-CF minus
      C4/C8/CC), which carries height/width big-endian u16.

    Unknown/truncated payloads => (None, None, None).
    """
    try:
        if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return "png", w, h
        if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
            w = int.from_bytes(data[6:8], "little")
            h = int.from_bytes(data[8:10], "little")
            return "gif", w, h
        if len(data) >= 4 and data[:2] == b"\xff\xd8":
            pos, limit = 2, min(len(data), 1 << 16)
            while pos + 4 <= limit:
                if data[pos] != 0xFF:
                    pos += 1  # spec allows fill bytes; resync
                    continue
                marker = data[pos + 1]
                if marker == 0xFF:
                    pos += 1
                    continue
                if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                    pos += 2  # standalone markers carry no length
                    continue
                seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if pos + 9 <= len(data):
                        h = int.from_bytes(data[pos + 5 : pos + 7], "big")
                        w = int.from_bytes(data[pos + 7 : pos + 9], "big")
                        return "jpeg", w, h
                    break
                pos += 2 + seg_len
            return "jpeg", None, None
    except (IndexError, ValueError):
        pass
    return None, None, None


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def probe_media_headers(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """(media_id, format, width, height) via the real header parsers,
    Arrow-batched mapInArrow. The per-row work is a bounded header
    inspection (tens of bytes; the JPEG marker scan is inherently
    sequential per the spec), so this stays cheap even though it runs
    in Python."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col)
            blobs = batch.column(bytes_col)
            fmts, ws, hs = [], [], []
            for b in blobs:
                data = b.as_py() if b.is_valid else b""
                fmt, w, h = parse_image_header(data or b"")
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(fmts, type=pa.string()),
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                ],
                names=["media_id", "format", "width", "height"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col)
    ).mapInArrow(fn, PROBE_SCHEMA)


def synth_image_expr(fmt_col, w_col, h_col):
    """Deterministic spec-conformant image HEADER bytes as a binary
    column (pure JVM hex concat + unhex — no UDF): fmt 'png'|'gif'|
    'jpeg' with the given dimensions. Only headers (+ a JFIF APP0
    segment for jpeg so the marker scan is exercised), no pixel data —
    these exist to verify :func:`probe_media_headers` against an
    arithmetic SQL oracle."""
    w, h = w_col.cast("long"), h_col.cast("long")
    be32 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    be16 = lambda c: F.lpad(F.hex(c), 4, "0")  # noqa: E731
    le16 = lambda c: F.concat(  # noqa: E731
        F.lpad(F.hex(c.bitwiseAND(F.lit(255))), 2, "0"),
        F.lpad(F.hex(F.shiftright(c, 8).bitwiseAND(F.lit(255))), 2, "0"),
    )
    png = F.concat(
        F.lit("89504E470D0A1A0A"),  # signature
        F.lit("0000000D49484452"),  # IHDR length + type
        be32(w), be32(h),
        F.lit("0806000000"),  # bit depth, color type, etc.
    )
    gif = F.concat(F.lit("474946383961"), le16(w), le16(h), F.lit("F70000"))
    jpeg = F.concat(
        F.lit("FFD8"),  # SOI
        F.lit("FFE000104A46494600010200004800480000"),  # APP0/JFIF
        F.lit("FFC0001108"), be16(h), be16(w), F.lit("03"),  # SOF0
    )
    return F.unhex(
        F.when(fmt_col == "png", png)
        .when(fmt_col == "gif", gif)
        .otherwise(jpeg)
    )


def decode_image_stub(data: bytes, dim: int = 16) -> np.ndarray:
    """STUB decoder (no image libs in this container).

    Real implementation would be e.g. PIL.Image.open + resize +
    normalize. The stub produces a deterministic pseudo-feature: the
    byte histogram of sha-seeded samples, L2-normalized — stable,
    content-sensitive, and the right shape for the pipeline.
    """
    if not data:
        return np.zeros(dim, dtype=np.float32)
    h = hashlib.blake2b(data, digest_size=8).digest()
    (seed,) = struct.unpack("<Q", h)
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=dim)[:dim].astype(np.float64)
    rng = np.random.default_rng(seed)
    hist = hist + rng.random(dim)  # deterministic tie-break jitter
    norm = np.linalg.norm(hist)
    return (hist / (norm or 1.0)).astype(np.float32)


def extract_features(
    df: DataFrame, id_col: str, bytes_col: str, dim: int = 16
) -> DataFrame:
    """mapInArrow feature extraction over a binary media column.

    Batch shape: input batches of (id, bytes); output batches of
    (media_id, feature array<float>) — the exact plumbing a real
    decoder plugs into (CPU-heavy per row, Arrow in/out).
    """
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col)
            blobs = batch.column(bytes_col)
            feats = [
                decode_image_stub(b.as_py() if b.is_valid else b"", dim)
                for b in blobs
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(
                        [f.tolist() for f in feats], type=pa.list_(pa.float32())
                    ),
                ],
                names=["media_id", "feature"],
            )

    return df.select(id_col, bytes_col).mapInArrow(fn, FEATURE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, id_col: str, bytes_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing (STUB): emits (media_id, frame_idx,
    frame_bytes) rows where frame_bytes is a deterministic slice of the
    source — the explode/repartition shape a real ffmpeg stage needs."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_bytes", BinaryType(), False),
        ]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids, blobs = batch.column(id_col), batch.column(bytes_col)
            o_ids, o_idx, o_frames = [], [], []
            for i in range(batch.num_rows):
                data = blobs[i].as_py() or b""
                n_frames = max(1, min(8, len(data) // max(every_ms, 1)))
                step = max(1, len(data) // n_frames)
                for k in range(n_frames):
                    o_ids.append(ids[i].as_py())
                    o_idx.append(k)
                    o_frames.append(data[k * step : k * step + 64])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_ids, type=pa.int64()),
                    pa.array(o_idx, type=pa.int32()),
                    pa.array(o_frames, type=pa.binary()),
                ],
                names=["media_id", "frame_idx", "frame_bytes"],
            )

    return df.select(id_col, bytes_col).mapInArrow(fn, out_schema)


def parse_wav_header(data: bytes):
    """(sample_rate, channels, bits, duration_ms) from a real RIFF/WAVE
    header — pure Python over the public WAV spec, no audio libraries.

    Chunk-scans from offset 12: the 'fmt ' chunk carries channels
    (u16 LE @+2), sample rate (u32 LE @+4) and bits/sample (u16 LE
    @+14); the 'data' chunk's declared size gives the duration as
    data_bytes * 1000 // byte_rate (exact integer math — portable to
    the SQL twin). Unknown/truncated payloads => all-None."""
    none = (None, None, None, None)
    try:
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return none
        pos = 12
        rate = channels = bits = data_size = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if cid == b"fmt " and pos + 24 <= len(data):
                channels = int.from_bytes(data[pos + 10 : pos + 12], "little")
                rate = int.from_bytes(data[pos + 12 : pos + 16], "little")
                bits = int.from_bytes(data[pos + 22 : pos + 24], "little")
            elif cid == b"data":
                data_size = size  # declared size: header-only synths ok
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if rate and channels and bits:
            dur = None
            if data_size is not None:
                dur = data_size * 1000 // (rate * channels * (bits // 8))
            return rate, channels, bits, dur
    except (IndexError, ValueError, ZeroDivisionError):
        pass
    return none


AUDIO_PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bits", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def probe_audio_headers(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """(media_id, sample_rate, channels, bits, duration_ms) via the
    real WAV parser, Arrow-batched mapInArrow — same bounded-header
    posture as probe_media_headers."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col)
            blobs = batch.column(bytes_col)
            rs, cs, bs, ds = [], [], [], []
            for b in blobs:
                data = b.as_py() if b.is_valid else b""
                r, c, bi, d = parse_wav_header(data or b"")
                rs.append(r)
                cs.append(c)
                bs.append(bi)
                ds.append(d)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(rs, type=pa.int32()),
                    pa.array(cs, type=pa.int32()),
                    pa.array(bs, type=pa.int32()),
                    pa.array(ds, type=pa.int64()),
                ],
                names=["media_id", "sample_rate", "channels", "bits",
                       "duration_ms"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col)
    ).mapInArrow(fn, AUDIO_PROBE_SCHEMA)


def synth_wav_expr(rate_col, channels_col, n_samples_col):
    """Deterministic spec-conformant 16-bit-PCM WAV HEADER bytes as a
    binary column (pure JVM hex concat + unhex — no UDF): the 'data'
    chunk declares n_samples*channels*2 bytes without carrying them —
    these exist to verify :func:`probe_audio_headers` against an
    arithmetic SQL oracle."""
    rate = rate_col.cast("long")
    ch = channels_col.cast("long")
    nsamp = n_samples_col.cast("long")
    byte_rate = rate * ch * 2
    block = ch * 2
    dsize = nsamp * ch * 2

    def le(c, nbytes):
        parts = [
            F.lpad(
                F.hex(F.shiftright(c, 8 * i).bitwiseAND(F.lit(255))), 2, "0"
            )
            for i in range(nbytes)
        ]
        return F.concat(*parts)

    return F.unhex(
        F.concat(
            F.lit("52494646"),            # 'RIFF'
            le(dsize + F.lit(36), 4),     # riff size
            F.lit("57415645"),            # 'WAVE'
            F.lit("666D7420"), le(F.lit(16), 4),   # 'fmt ', size 16
            F.lit("0100"),                # PCM
            le(ch, 2), le(rate, 4), le(byte_rate, 4),
            le(block, 2), le(F.lit(16), 2),        # block align, bits
            F.lit("64617461"), le(dsize, 4),       # 'data', size
        )
    )


def parse_mp4_header(data: bytes):
    """(brand, timescale, duration_ms) from a real ISO BMFF (MP4)
    header — pure Python over the public ISO 14496-12 box grammar, no
    video libraries. Top-level boxes are [u32 BE size][4CC]; the
    'ftyp' payload leads with the major brand; 'moov' nests child
    boxes, and 'mvhd' (version 0) carries timescale (u32 BE @+12 of
    its payload) and duration in timescale units (u32 BE @+16).
    duration_ms = duration * 1000 // timescale (exact integer math —
    portable to the SQL oracle). Unknown/truncated => all-None."""
    none = (None, None, None)
    try:
        pos = 0
        brand = timescale = duration = None
        while pos + 8 <= len(data):
            size = int.from_bytes(data[pos : pos + 4], "big")
            typ = data[pos + 4 : pos + 8]
            if size < 8:
                return none
            if typ == b"ftyp" and pos + 12 <= len(data):
                brand = data[pos + 8 : pos + 12].decode("ascii", "replace")
            elif typ == b"moov":
                ipos = pos + 8
                end = min(pos + size, len(data))
                while ipos + 8 <= end:
                    isize = int.from_bytes(data[ipos : ipos + 4], "big")
                    ityp = data[ipos + 4 : ipos + 8]
                    if isize < 8:
                        break
                    if ityp == b"mvhd" and ipos + 28 <= end:
                        ver = data[ipos + 8]
                        if ver == 0:
                            timescale = int.from_bytes(
                                data[ipos + 20 : ipos + 24], "big"
                            )
                            duration = int.from_bytes(
                                data[ipos + 24 : ipos + 28], "big"
                            )
                    ipos += isize
            pos += size
        if brand is not None and timescale:
            dur_ms = (
                duration * 1000 // timescale if duration is not None else None
            )
            return brand, timescale, dur_ms
    except (IndexError, ValueError):
        pass
    return none


VIDEO_PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("brand", StringType(), True),
        StructField("timescale", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def probe_video_headers(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """(media_id, brand, timescale, duration_ms) via the real ISO BMFF
    parser, Arrow-batched mapInArrow — same bounded-header posture as
    the image/audio probes (headers only; frame decode stays behind
    the labeled stub)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col)
            blobs = batch.column(bytes_col)
            brs, tss, ds = [], [], []
            for b in blobs:
                data = b.as_py() if b.is_valid else b""
                br, ts, d = parse_mp4_header(data or b"")
                brs.append(br)
                tss.append(ts)
                ds.append(d)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(brs, type=pa.string()),
                    pa.array(tss, type=pa.int32()),
                    pa.array(ds, type=pa.int64()),
                ],
                names=["media_id", "brand", "timescale", "duration_ms"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col)
    ).mapInArrow(fn, VIDEO_PROBE_SCHEMA)


def synth_mp4_expr(timescale_col, duration_units_col):
    """Deterministic spec-conformant MP4 HEADER bytes (ftyp 'isom' +
    moov/mvhd v0) as a binary column — pure JVM hex concat + unhex,
    no UDF; box sizes declared exactly, so the parser's size walk is
    exercised for real. Exists to verify :func:`probe_video_headers`
    against an arithmetic SQL oracle."""
    ts = timescale_col.cast("long")
    dur = duration_units_col.cast("long")

    def be(c, nbytes):
        return F.lpad(F.hex(c), 2 * nbytes, "0")

    mvhd = F.concat(
        be(F.lit(28), 4), F.lit("6D766864"),      # size 28, 'mvhd'
        F.lit("00000000"),                         # version 0 + flags
        F.lit("00000000"), F.lit("00000000"),      # ctime, mtime
        be(ts, 4), be(dur, 4),                     # timescale, duration
    )
    return F.unhex(
        F.concat(
            # ftyp: size 16, major brand isom, minor version 0x200
            be(F.lit(16), 4), F.lit("66747970"),
            F.lit("69736F6D"), F.lit("00000200"),
            # moov: size 8 + 28
            be(F.lit(36), 4), F.lit("6D6F6F76"),
            mvhd,
        )
    )
