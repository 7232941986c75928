"""Frame-level round-trips: arrow column -> blob -> arrow column,
bit-identical including nulls, unicode, and the None-vs-"" distinction
(FIXTURES.md F2 str_with_nulls)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from orc_spark.codecs import column_checksum, decode_frame, encode_frame

RNG = np.random.default_rng(42)


def roundtrip(arr: pa.Array, codec: str):
    out = decode_frame(encode_frame(arr, codec))
    if out.type != arr.type:
        out = out.cast(arr.type)
    assert out.equals(arr), f"{codec} {arr.type}"
    assert column_checksum(out) == column_checksum(arr)
    return out


INT_CODECS = ["raw", "rle_auto", "rle_sr", "rle_direct", "rle_delta", "rle_pb"]
STR_CODECS = ["raw", "fsst", "dict", "prefix"]


@pytest.mark.parametrize("codec", INT_CODECS)
def test_int64(codec):
    roundtrip(pa.array(RNG.integers(-1000, 1000, 2048), type=pa.int64()), codec)


@pytest.mark.parametrize("codec", ["raw", "rle_auto"])
def test_int_nulls(codec):
    vals = [int(x) if RNG.random() > 0.1 else None for x in RNG.integers(0, 50, 500)]
    roundtrip(pa.array(vals, type=pa.int64()), codec)


def test_int32():
    roundtrip(pa.array(RNG.integers(0, 100, 500).astype(np.int32)), "rle_auto")


@pytest.mark.parametrize("tz", [None, "UTC"])
def test_timestamp_us(tz):
    base = 1_760_000_000_000_000
    arr = pa.array(
        base + RNG.integers(0, 86_400_000_000, 3000), type=pa.timestamp("us", tz=tz)
    )
    roundtrip(arr, "for_ts")


@pytest.mark.parametrize("codec", STR_CODECS)
def test_strings(codec):
    words = [f"word{i}" for i in range(9)]
    arr = pa.array([words[i] for i in RNG.integers(0, 9, 2048)])
    roundtrip(arr, codec)


@pytest.mark.parametrize("codec", STR_CODECS)
def test_strings_nulls_vs_empty(codec):
    arr = pa.array(["", None, "héllo", "殊字", "🎉🎉", None, "x"] * 64, type=pa.string())
    out = roundtrip(arr, codec)
    # None and "" must stay distinct
    assert out[0].as_py() == ""
    assert out[1].as_py() is None


@pytest.mark.parametrize("codec", STR_CODECS)
def test_binary(codec):
    arr = pa.array([bytes([i % 256]) * (i % 64) for i in range(512)], type=pa.binary())
    roundtrip(arr, codec)


def test_prefix_front_coding_clustered_urls():
    """Front coding on a url-clustered column: bit-identical roundtrip,
    smaller than both raw and fsst (the host/path prefix repeats), and
    correct across the prefix cap (values longer than 255 shared
    bytes), empty strings, and duplicate-of-previous values."""
    urls = sorted(
        f"https://www.host{i % 23:02d}.example.com/{i % 7}/page/{i:06d}"
        for i in range(4000)
    )
    long = "q" * 300
    arr = pa.array(
        urls + [long, long + "tail", long[:260], "", "a", "a"], type=pa.string()
    )
    out = roundtrip(arr, "prefix")
    assert out.to_pylist() == arr.to_pylist()
    sz = {c: len(encode_frame(arr, c, state={})) for c in ("raw", "fsst", "prefix")}
    assert sz["prefix"] < sz["fsst"] < sz["raw"], sz


def test_prefix_correct_on_unshared_strings():
    """No adjacent overlap: the codec must still roundtrip exactly (the
    selector would prune it, but a forced override may not)."""
    vals = [f"{i * 2654435761 % 999983:x}-{i}" for i in range(3000)]
    roundtrip(pa.array(vals, type=pa.string()), "prefix")


def test_prefix_selector_gate():
    """choose_codec keeps prefix only when sampled adjacent overlap
    clears the threshold: clustered urls keep it, body text drops it."""
    from orc_spark.engine import selector

    chain = ["dict", "prefix", "fsst", "raw"]
    urls = pa.array(
        sorted(f"https://www.h{i % 5}.org/p/{i:07d}" for i in range(3000))
    )
    assert "prefix" in selector.choose_codec(urls, chain)
    text = pa.array(
        [f"{i * 7919 % 104729} unique sentence body {i}" for i in range(3000)]
    )
    assert "prefix" not in selector.choose_codec(text, chain)


def test_float64():
    vals = RNG.random(1000)
    vals[::97] = np.nan
    arr = pa.array(vals, type=pa.float64())
    out = decode_frame(encode_frame(arr, "raw"))
    # NaN != NaN; compare bit patterns
    assert (
        out.to_numpy(zero_copy_only=False).view(np.uint64)
        == arr.to_numpy(zero_copy_only=False).view(np.uint64)
    ).all()


@pytest.mark.parametrize(
    "typ,codec",
    [
        (pa.int64(), "rle_auto"),
        (pa.string(), "fsst"),
        (pa.string(), "dict"),
        (pa.string(), "prefix"),
        (pa.float64(), "raw"),
    ],
)
def test_empty_and_all_null(typ, codec):
    roundtrip(pa.array([], type=typ), codec)
    roundtrip(pa.array([None, None, None], type=typ), codec)


def test_checksum_distinguishes_null_from_empty():
    a = pa.array(["", "x"], type=pa.string())
    b = pa.array([None, "x"], type=pa.string())
    assert column_checksum(a) != column_checksum(b)


def test_checksum_is_layout_independent():
    a = pa.array(["aa", "bb", "cc"])
    sliced = pa.array(["zz", "aa", "bb", "cc"]).slice(1, 3)
    assert column_checksum(a) == column_checksum(sliced)


# --------------------------------------------------- block compression

def _rt_compressed(arr: pa.Array, codec: str, level: int = 1):
    blob = encode_frame(arr, codec, compression="zlib", compression_level=level)
    out = decode_frame(blob)
    if out.type != arr.type:
        out = out.cast(arr.type)
    assert out.equals(arr), f"zlib {codec} {arr.type}"
    assert column_checksum(out) == column_checksum(arr)
    return blob


@pytest.mark.parametrize(
    "arr,codec",
    [
        (pa.array(list(range(4000)) + [None] * 5), "rle_auto"),
        (pa.array(["paragraph %d of web text" % (i % 97) for i in range(3000)]), "fsst"),
        (pa.array(["en", "fr", "de", None] * 800), "dict"),
        (pa.array([b"\x00\xffhtml" * 40] * 500, type=pa.binary()), "raw"),
    ],
)
def test_zlib_layer_roundtrips_and_shrinks(arr, codec):
    blob = _rt_compressed(arr, codec)
    plain = encode_frame(arr, codec)
    assert blob[5] & 2  # flag bit set: deflate won on these payloads
    assert len(blob) < len(plain)


def test_zlib_flag_clear_when_deflate_loses_or_payload_tiny():
    tiny = pa.array([1, 2, 3])
    assert not (encode_frame(tiny, "raw", compression="zlib")[5] & 2)
    # high-entropy payload: deflate can't win, frame stays lightweight
    rng = np.random.default_rng(7)
    noise = pa.array([bytes(rng.integers(0, 256, 64, dtype=np.uint8).tobytes()) for _ in range(64)], type=pa.binary())
    blob = encode_frame(noise, "raw", compression="zlib")
    assert decode_frame(blob).equals(noise)


def test_uncompressed_frames_decode_unchanged():
    # bit 2 clear (the r1/r2 on-disk format) must keep decoding as-is
    arr = pa.array(["legacy", "frame", None, ""])
    blob = encode_frame(arr, "raw")
    assert not (blob[5] & 2)
    assert decode_frame(blob).equals(arr)


def test_zlib_adaptive_skip_after_consecutive_misses():
    """A column whose frames keep deflating to >95% stops paying the
    attempt (per-task state); a compressible column never trips it."""
    import numpy as np

    rng = np.random.default_rng(3)
    # random int64 payloads: deflate gains ~nothing
    incompressible = pa.array(rng.integers(-2**62, 2**62, 2000))
    st = {}
    for _ in range(4):
        encode_frame(incompressible, "raw", state=st, compression="zlib")
    assert st.get("zlib_skip", 0) >= 2
    blob = encode_frame(incompressible, "raw", state=st, compression="zlib")
    assert not (blob[5] & 2)  # attempt skipped entirely
    assert decode_frame(blob).equals(incompressible)

    compressible = pa.array(["boiler plate " * 10] * 500)
    st2 = {}
    for _ in range(4):
        blob = encode_frame(compressible, "raw", state=st2, compression="zlib")
    assert st2.get("zlib_skip", 0) == 0
    assert blob[5] & 2


def test_zlib_skip_counts_once_per_stripe_and_rearms():
    """ADVICE r3 (low): the miss counter must advance once per STRIPE
    even when encode_with_fallback walks a multi-codec chain (each
    attempt deflates the same data), and skip mode must re-probe every
    Nth frame so a column that turns compressible mid-partition
    re-arms instead of shipping uncompressed forever."""
    import numpy as np

    from orc_spark.codecs import framing
    from orc_spark.engine.encode import encode_with_fallback

    rng = np.random.default_rng(7)
    incompressible = pa.array(rng.integers(-2**62, 2**62, 4000))
    st = {}
    # one stripe through a 2+-codec chain: exactly ONE miss recorded
    encode_with_fallback(
        incompressible, ["rle_auto", "raw"], state=st, compression="zlib"
    )
    assert st.get("zlib_skip", 0) == 1, st

    # drive into skip mode, then feed compressible stripes: within
    # _COMPRESS_REPROBE frames a probe fires, wins, and resets
    for _ in range(3):
        encode_frame(incompressible, "raw", state=st, compression="zlib")
    assert st.get("zlib_skip", 0) >= framing._COMPRESS_SKIP_AFTER
    compressible = pa.array(["boiler plate " * 10] * 500)
    rearmed = False
    for _ in range(framing._COMPRESS_REPROBE + 1):
        blob = encode_frame(compressible, "raw", state=st, compression="zlib")
        if blob[5] & 2:
            rearmed = True
    assert rearmed and st.get("zlib_skip", 0) == 0
    # once re-armed, the very next compressible frame deflates again
    assert encode_frame(compressible, "raw", state=st, compression="zlib")[5] & 2


# ----------------------------------------------------------- lzma tier

@pytest.mark.parametrize(
    "arr,codec",
    [
        (pa.array(list(range(4000)) + [None] * 5), "rle_auto"),
        (pa.array(["paragraph %d of web text" % (i % 97) for i in range(3000)]), "fsst"),
        (pa.array(["en", "fr", "de", None] * 800), "dict"),
        (pa.array([b"\x00\xffhtml" * 40] * 500, type=pa.binary()), "raw"),
    ],
)
def test_lzma_layer_roundtrips_and_flags(arr, codec):
    blob = encode_frame(arr, codec, compression="lzma")
    out = decode_frame(blob)
    if out.type != arr.type:
        out = out.cast(arr.type)
    assert out.equals(arr)
    assert column_checksum(out) == column_checksum(arr)
    assert blob[5] & 4 and not (blob[5] & 2)  # lzma flag, not zlib's
    assert len(blob) < len(encode_frame(arr, codec))


def test_lzma_denser_than_zlib_on_repetitive_text():
    arr = pa.array(
        ["<div class=nav>boilerplate %d</div>" % (i % 13) for i in range(5000)]
    )
    z = encode_frame(arr, "raw", compression="zlib")
    x = encode_frame(arr, "raw", compression="lzma", compression_level=6)
    assert len(x) <= len(z)
    assert decode_frame(x).equals(arr)


def test_mixed_compressor_frames_decode_side_by_side():
    """Per-frame flags: one table may hold zlib, lzma, and plain
    frames; each decodes from its own flag with no global config."""
    arr = pa.array(["mix %d" % (i % 7) for i in range(2000)])
    for blob in (
        encode_frame(arr, "dict"),
        encode_frame(arr, "dict", compression="zlib"),
        encode_frame(arr, "dict", compression="lzma"),
    ):
        assert decode_frame(blob).equals(arr)


def test_unknown_compression_is_loud():
    arr = pa.array(list(range(1000)))
    with pytest.raises(ValueError, match="unknown compression"):
        encode_frame(arr, "raw", compression="zstd")
