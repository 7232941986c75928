"""Per-codec round-trip unit tests — FIXTURES.md F2, the reference's
TestReader/TestWriter round-trip suites re-expressed as pytest
(reference test style: table-driven per package, e.g.
/root/reference/internal/runner/runner_test.go)."""

from __future__ import annotations

import numpy as np
import pytest

from orc_spark.codecs import bitpack, fsst, rle
from orc_spark.codecs.framing import decode_ints_auto, encode_ints_auto

RNG = np.random.default_rng(42)

INT_FIXTURES = {
    "ints_empty": np.array([], dtype=np.int64),
    "ints_single": np.array([42], dtype=np.int64),
    "ints_all_equal": np.full(4096, 7, dtype=np.int64),
    "ints_monotonic": np.arange(0, 4096 * 3, 3, dtype=np.int64),
    "ints_small_range": RNG.integers(100, 132, 4096).astype(np.int64),
    "ints_outliers": np.where(
        RNG.random(4096) < 0.01, 2**62, RNG.integers(0, 256, 4096)
    ).astype(np.int64),
    "ints_negative": np.array(
        [np.iinfo(np.int64).min, -1, 0, 1, np.iinfo(np.int64).max] * 100,
        dtype=np.int64,
    ),
    "ints_runs": np.repeat(RNG.integers(-50, 50, 64), RNG.integers(1, 200, 64)).astype(
        np.int64
    ),
}

INT_CODECS = {
    "rle_sr": (rle.rle_sr_encode, rle.rle_sr_decode),
    "rle_direct": (rle.rle_direct_encode, rle.rle_direct_decode),
    "rle_delta": (rle.rle_delta_encode, rle.rle_delta_decode),
    "rle_pb": (rle.rle_pb_encode, rle.rle_pb_decode),
}


@pytest.mark.parametrize("codec", sorted(INT_CODECS))
@pytest.mark.parametrize("fixture", sorted(INT_FIXTURES))
def test_int_codec_roundtrip(codec, fixture):
    enc, dec = INT_CODECS[codec]
    arr = INT_FIXTURES[fixture]
    out = dec(enc(arr), len(arr))
    assert out.dtype == np.int64
    assert (out == arr).all()


@pytest.mark.parametrize("fixture", sorted(INT_FIXTURES))
def test_ints_auto_roundtrip_and_never_worse(fixture):
    arr = INT_FIXTURES[fixture]
    blob = encode_ints_auto(arr)
    assert (decode_ints_auto(blob, len(arr)) == arr).all()
    if len(arr) >= 64:
        # the auto selection must never exceed raw by more than framing slop
        assert len(blob) <= arr.nbytes + 64


def test_ints_auto_picks_compressive_modes():
    assert len(encode_ints_auto(INT_FIXTURES["ints_all_equal"])) < 128
    mono = encode_ints_auto(INT_FIXTURES["ints_monotonic"])
    assert len(mono) < 4096  # delta: ~2 bits/value
    out = encode_ints_auto(INT_FIXTURES["ints_outliers"])
    assert len(out) < 4096 * 2  # patched base, not 62-bit direct


def test_bitpack_widths():
    for w in [0, 1, 3, 5, 8, 13, 31, 33, 63, 64]:
        if w == 64:
            vals = RNG.integers(0, 2**63, 100, dtype=np.int64).astype(np.uint64) * 2
        else:
            vals = RNG.integers(0, 2**w if w else 1, 100).astype(np.uint64)
        assert (bitpack.unpack(bitpack.pack(vals, w), w, 100) == vals).all(), w


STR_FIXTURES = {
    "empty": b"",
    "single": b"a",
    "all_ff": b"\xff" * 100,
    "ff_runs_gt8": b"\xff" * 64 + b"a" + b"\xff" * 9,
    "all_bytes": bytes(range(256)) * 10,
    "tiny_repeat": b"ab" * 5,
    "english": b"the quick brown fox jumps over the lazy dog " * 500,
    "random": RNG.integers(0, 256, 50000).astype(np.uint8).tobytes(),
    "unicode": ("héllo wörld 殊字 🎉 combining ́ marks " * 300).encode(),
    "long_x": b"x" * ((1 << 20) + 5),
}


@pytest.mark.parametrize("fixture", sorted(STR_FIXTURES))
def test_fsst_roundtrip(fixture):
    data = STR_FIXTURES[fixture]
    comp = fsst.compress(data)
    assert fsst.decompress(comp) == data


def test_fsst_compresses_repetitive_text():
    data = STR_FIXTURES["english"]
    assert len(fsst.compress(data)) < len(data) / 3


def test_fsst_numpy_and_native_paths_agree():
    """The C fast path must emit the same token stream as numpy."""
    from orc_spark.codecs import _native

    if _native.get_lib() is None:
        pytest.skip("no C compiler in environment")
    data = STR_FIXTURES["english"] + STR_FIXTURES["all_bytes"] + b"\xff" * 40
    table = fsst.train(data)
    buf = np.frombuffer(data, dtype=np.uint8)
    nc, nl, ns = fsst._tokenize_native(buf, table, want_starts=True)
    ml, mc = fsst._match_arrays(buf, table)
    pc, plp, ps = fsst._greedy_walk(ml, mc)
    assert (nc == pc).all()
    assert nl == buf[plp].tobytes()
    assert (ns == ps).all()


def test_fsst_over_255_symbol_pressure():
    # >255 distinct frequent grams force escapes; round-trip must hold
    parts = [f"tok{i:04d}".encode() for i in range(600)]
    data = b"|".join(parts * 3)
    assert fsst.decompress(fsst.compress(data)) == data


def test_fsst_table_determinism():
    data = STR_FIXTURES["english"]
    t1 = fsst.train(data)
    t2 = fsst.train(data)
    assert t1.symbols == t2.symbols
