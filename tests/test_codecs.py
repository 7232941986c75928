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


# ------------------------------------------------------------------ alp

ALP_RNG = np.random.default_rng(7)

ALP_FIXTURES = {
    "alp_empty": np.zeros(0, dtype=np.float64),
    "alp_single": np.array([3.25]),
    "alp_prices_2dec": np.round(ALP_RNG.uniform(0, 1e5, 4096), 2),
    "alp_ints_as_double": ALP_RNG.integers(1, 51, 4096).astype(np.float64),
    "alp_4dec": np.round(ALP_RNG.uniform(0, 1, 4096), 4),
    "alp_all_equal": np.full(1024, 2.71),
    "alp_specials": np.array(
        [np.nan, np.inf, -np.inf, -0.0, 0.0, 1e300, -1e-300,
         float(2**60), 0.1 + 0.2, 7.5, -99.99, 1.23456789012345e-5]
    ),
    "alp_true_reals": ALP_RNG.standard_normal(4096),
    "alp_mixed": np.where(
        ALP_RNG.random(4096) < 0.02,
        ALP_RNG.standard_normal(4096),
        np.round(ALP_RNG.uniform(-500, 500, 4096), 2),
    ),
}


@pytest.mark.parametrize("fixture", sorted(ALP_FIXTURES))
def test_alp_roundtrip_bit_identical(fixture):
    """decode(encode(x)) reproduces every float64 BITWISE (incl. NaN
    payloads, -0.0, infinities — they ride the exception path)."""
    import pyarrow as pa

    from orc_spark.codecs import framing

    v = ALP_FIXTURES[fixture]
    arr = pa.array(v, type=pa.float64())
    back = framing.decode_frame(framing.encode_frame(arr, "alp"))
    assert framing.column_checksum(back) == framing.column_checksum(arr)
    got = back.to_numpy(zero_copy_only=False)
    assert np.array_equal(got.view(np.int64), v.view(np.int64))


def test_alp_compresses_decimals_not_reals():
    import pyarrow as pa

    from orc_spark.codecs import framing

    prices = pa.array(ALP_FIXTURES["alp_prices_2dec"])
    assert len(framing.encode_frame(prices, "alp")) < prices.nbytes * 0.5
    # true reals: nearly everything patches -> bigger than raw, and the
    # selector prunes alp for such columns up front
    from orc_spark.engine import selector

    reals = pa.array(ALP_FIXTURES["alp_true_reals"])
    assert not selector.stripe_stats(reals)["alp_viable"]
    assert selector.choose_codec(reals, ["alp", "raw"]) == ["raw"]
    assert selector.stripe_stats(prices)["alp_viable"]
    assert selector.choose_codec(prices, ["alp", "raw"])[0] == "alp"


def test_alp_nulls_preserved():
    import pyarrow as pa

    from orc_spark.codecs import framing

    arr = pa.array([1.25, None, 3.5, None, -0.0, np.nan], type=pa.float64())
    back = framing.decode_frame(framing.encode_frame(arr, "alp"))
    assert framing.column_checksum(back) == framing.column_checksum(arr)
    assert back.null_count == 2


def test_alp_float32_falls_back_to_raw():
    import pyarrow as pa

    from orc_spark.codecs import framing

    arr = pa.array(
        ALP_RNG.standard_normal(256).astype(np.float32), type=pa.float32()
    )
    blob = framing.encode_frame(arr, "alp")
    back = framing.decode_frame(blob)
    assert framing.column_checksum(back) == framing.column_checksum(arr)


# ----------------------------------------------------------------- xorf

XORF_RNG = np.random.default_rng(41)
XORF_FIXTURES = {
    "xorf_empty": np.zeros(0, dtype=np.float64),
    "xorf_single": np.array([2.5]),
    # float32-precision doubles: low 29 mantissa bits dead -> >=3 of 8
    # byte planes all-zero after XOR
    "xorf_f32_precision": XORF_RNG.uniform(-1e4, 1e4, 4096)
    .astype(np.float32)
    .astype(np.float64),
    "xorf_all_equal": np.full(2048, 1.0 / 3.0),
    "xorf_specials": np.array(
        [np.nan, -np.nan, np.inf, -np.inf, -0.0, 0.0, 5e-324, 1.7e308]
    ),
    "xorf_true_reals": XORF_RNG.standard_normal(4096),
}


@pytest.mark.parametrize("fixture", sorted(XORF_FIXTURES))
def test_xorf_roundtrip_bit_identical(fixture):
    """decode(encode(x)) reproduces every float64 BITWISE — xorf is a
    pure bit transform (XOR + byte-plane split), so NaN payloads, -0.0
    and denormals need no exception path at all."""
    import pyarrow as pa

    from orc_spark.codecs import framing

    v = XORF_FIXTURES[fixture]
    arr = pa.array(v, type=pa.float64())
    back = framing.decode_frame(framing.encode_frame(arr, "xorf"))
    assert framing.column_checksum(back) == framing.column_checksum(arr)
    got = back.to_numpy(zero_copy_only=False)
    assert np.array_equal(got.view(np.int64), v.view(np.int64))


def test_xorf_float32_roundtrip():
    import pyarrow as pa

    from orc_spark.codecs import framing

    v = XORF_RNG.integers(0, 512, 4096).astype(np.float32)
    arr = pa.array(v, type=pa.float32())
    blob = framing.encode_frame(arr, "xorf")
    back = framing.decode_frame(blob)
    assert framing.column_checksum(back) == framing.column_checksum(arr)
    # small-int floats: sign/exponent-heavy planes mostly survive but
    # the low mantissa planes die -> real saving without any entropy
    # coder
    assert len(blob) < arr.nbytes


def test_xorf_nulls_preserved():
    import pyarrow as pa

    from orc_spark.codecs import framing

    arr = pa.array(
        [1.25, None, float("nan"), None, -0.0, 2.0**-1030],
        type=pa.float64(),
    )
    back = framing.decode_frame(framing.encode_frame(arr, "xorf"))
    assert framing.column_checksum(back) == framing.column_checksum(arr)
    assert back.null_count == 2


def test_xorf_selector_and_budget():
    """f32-precision doubles defeat ALP (not decimal-scalable) but
    xorf drops >=3 byte planes; true random doubles prune xorf in the
    sampled gate and the budget walk lands on raw."""
    import pyarrow as pa

    from orc_spark.codecs import framing
    from orc_spark.engine import encode, selector

    f32ish = pa.array(XORF_FIXTURES["xorf_f32_precision"])
    chain = selector.plan_for_schema(
        pa.schema([("x", pa.float64())])
    )["x"].chain
    assert chain == ["alp", "xorf", "raw"]
    stats = selector.stripe_stats(f32ish)
    assert not stats["alp_viable"]
    assert stats["xorf_zero_planes"] >= 3
    codec, blob, _ = encode.encode_with_fallback(f32ish, chain)
    assert codec == "xorf"
    assert len(blob) <= 0.67 * f32ish.nbytes
    back = framing.decode_frame(blob)
    assert framing.column_checksum(back) == framing.column_checksum(f32ish)

    reals = pa.array(XORF_FIXTURES["xorf_true_reals"])
    assert selector.stripe_stats(reals)["xorf_zero_planes"] == 0
    assert "xorf" not in selector.choose_codec(reals, list(chain))
    codec_r, _, _ = encode.encode_with_fallback(reals, chain)
    assert codec_r == "raw"

    # float32 columns now carry the xorf chain too
    chain4 = selector.plan_for_schema(
        pa.schema([("y", pa.float32())])
    )["y"].chain
    assert chain4 == ["xorf", "raw"]


# --------------------------------------------------------- bool/decimal

def test_bool_roundtrip_rle_and_raw():
    import pyarrow as pa

    from orc_spark.codecs import framing

    rng = np.random.default_rng(11)
    fixtures = [
        pa.array([], type=pa.bool_()),
        pa.array([True] * 1000),
        pa.array([False] * 7),
        pa.array(rng.random(4096) < 0.3),
        pa.array([True, None, False, None, True]),
    ]
    for arr in fixtures:
        for codec in ("rle_auto", "raw"):
            back = framing.decode_frame(framing.encode_frame(arr, codec))
            assert back.type == pa.bool_()
            assert framing.column_checksum(back) == framing.column_checksum(arr)
            assert back.to_pylist() == arr.to_pylist()


def test_bool_rle_compresses_runs():
    import pyarrow as pa

    from orc_spark.codecs import framing

    arr = pa.array([True] * 50000)
    blob = framing.encode_frame(arr, "rle_auto")
    assert len(blob) < 1000  # 50k identical bools -> a handful of runs


def test_decimal128_roundtrip_int64_path():
    """precision <= 18 rides the rle int64 path; values + type params
    (precision, scale) must round-trip exactly."""
    import decimal

    import pyarrow as pa

    from orc_spark.codecs import framing

    vals = [
        decimal.Decimal("12345.67"), decimal.Decimal("-0.01"),
        decimal.Decimal("0.00"), None, decimal.Decimal("99999999999999.99"),
        decimal.Decimal("-99999999999999.99"),
    ]
    arr = pa.array(vals, type=pa.decimal128(16, 2))
    for codec in ("rle_auto", "raw"):
        back = framing.decode_frame(framing.encode_frame(arr, codec))
        assert back.type == pa.decimal128(16, 2)
        assert back.to_pylist() == vals
        assert framing.column_checksum(back) == framing.column_checksum(arr)


def test_decimal128_wide_precision_raw_fallback():
    """precision > 18 can't fit int64: rle_auto request must fall back
    to the 16-byte verbatim path and still be exact."""
    import decimal

    import pyarrow as pa

    from orc_spark.codecs import framing

    big = decimal.Decimal(2**90) + decimal.Decimal("0.123456789")
    vals = [big, -big, decimal.Decimal("1.000000000"), None]
    arr = pa.array(vals, type=pa.decimal128(38, 9))
    blob = framing.encode_frame(arr, "rle_auto")
    back = framing.decode_frame(blob)
    assert back.type == pa.decimal128(38, 9)
    assert back.to_pylist() == vals


def test_selector_chains_bool_decimal():
    import pyarrow as pa

    from orc_spark.engine import selector

    schema = pa.schema(
        [("flag", pa.bool_()), ("amount", pa.decimal128(12, 2))]
    )
    plans = selector.plan_for_schema(schema)
    assert plans["flag"].chain == ["rle_auto", "raw"]
    assert plans["amount"].chain == ["rle_auto", "raw"]
