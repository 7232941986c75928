"""Property-based round-trip guarantees (hypothesis) — the codec layer
must be bit-exact for *arbitrary* inputs, not just the fixtures
(SURVEY.md §5: seeded random arrays per dtype, decode(encode(x)) == x).

No Spark here: kernels are pure numpy/Arrow, so hundreds of examples
run in seconds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_spark.codecs import bitpack, framing, fsst, rle

I64 = st.integers(min_value=-(2**62), max_value=2**62 - 1)


@st.composite
def int_arrays(draw):
    shape = draw(st.sampled_from(["random", "runs", "monotonic", "outliers"]))
    n = draw(st.integers(min_value=0, max_value=400))
    if shape == "random":
        vals = draw(st.lists(I64, min_size=n, max_size=n))
    elif shape == "runs":
        base = draw(st.lists(I64, min_size=1, max_size=6))
        reps = draw(
            st.lists(st.integers(1, 40), min_size=len(base), max_size=len(base))
        )
        vals = [v for v, r in zip(base, reps) for _ in range(r)][:n] or [0]
    elif shape == "monotonic":
        start = draw(I64)
        step = draw(st.integers(-1000, 1000))
        vals = [start + i * step for i in range(n or 1)]
    else:  # outliers: small values + a few huge ones
        vals = draw(
            st.lists(st.integers(-100, 100), min_size=max(n, 1), max_size=max(n, 1))
        )
        for i in draw(st.lists(st.integers(0, max(n - 1, 0)), max_size=4)):
            vals[i] = draw(I64)
    return np.array(vals, dtype=np.int64)


@settings(max_examples=150, deadline=None)
@given(int_arrays())
def test_ints_auto_roundtrip(vals):
    blob = framing.encode_ints_auto(vals)
    out = framing.decode_ints_auto(blob, len(vals))
    assert np.array_equal(out, vals)


@settings(max_examples=100, deadline=None)
@given(int_arrays())
def test_rle_direct_and_pb_roundtrip(vals):
    for enc, dec in (
        (rle.rle_direct_encode, rle.rle_direct_decode),
        (rle.rle_pb_encode, rle.rle_pb_decode),
        (rle.rle_delta_encode, rle.rle_delta_decode),
    ):
        out = dec(enc(vals), len(vals))
        assert np.array_equal(out, vals), enc.__name__


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 2**32 - 1), max_size=300),
    st.integers(min_value=1, max_value=64),
)
def test_bitpack_roundtrip(vals, width):
    arr = np.array(vals, dtype=np.uint64)
    arr &= (1 << width) - 1 if width < 64 else ~np.uint64(0)
    out = bitpack.unpack(bitpack.pack(arr, width), width, len(arr))
    assert np.array_equal(out.astype(np.uint64), arr)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4000))
def test_fsst_roundtrip_arbitrary_bytes(data):
    assert fsst.decompress(fsst.compress(data)) == data


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=60)), max_size=120
    ),
    st.sampled_from(["fsst", "dict", "raw", "prefix"]),
)
def test_string_frame_roundtrip_with_nulls(strings, codec):
    arr = pa.array(strings, type=pa.string())
    blob = framing.encode_frame(arr, codec)
    out = framing.decode_frame(blob)
    assert out.equals(arr)
    assert framing.column_checksum(out) == framing.column_checksum(arr)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), I64), max_size=150))
def test_int_frame_roundtrip_with_nulls(ints):
    arr = pa.array(ints, type=pa.int64())
    blob = framing.encode_frame(arr, "rle_delta")
    out = framing.decode_frame(blob)
    assert out.equals(arr)
    assert framing.column_checksum(out) == framing.column_checksum(arr)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=120,
    )
)
def test_float_frame_roundtrip_nan_inf(floats):
    arr = pa.array(floats, type=pa.float64())
    blob = framing.encode_frame(arr, "raw")
    out = framing.decode_frame(blob)
    # NaN != NaN, so compare via checksum (bit-level) + null mask
    assert framing.column_checksum(out) == framing.column_checksum(arr)
    assert out.is_null().equals(arr.is_null())


# ------------------------------------------------------------- alp (r3)

@st.composite
def float_arrays(draw):
    """Decimal-ish, true-real, and special-value-laced float64s."""
    n = draw(st.integers(min_value=0, max_value=300))
    specials = [
        float("nan"), float("inf"), float("-inf"), -0.0, 0.0,
        5e-324, 1.7e308, float(2**53), float(2**60),
    ]
    elem = st.one_of(
        st.sampled_from(specials),
        st.integers(-10**6, 10**6).map(lambda v: v / 100.0),  # 2-dec
        st.floats(allow_nan=True, allow_infinity=True, width=64),
    )
    return np.array(draw(st.lists(elem, min_size=n, max_size=n)), dtype=np.float64)


@settings(max_examples=120, deadline=None)
@given(float_arrays())
def test_alp_roundtrip_bitwise_property(vals):
    """decode(encode(x, 'alp')) is BITWISE x for arbitrary float64
    content — NaN payloads, infinities, signed zero, subnormals."""
    arr = pa.array(vals, type=pa.float64())
    back = framing.decode_frame(framing.encode_frame(arr, "alp"))
    got = back.to_numpy(zero_copy_only=False)
    assert np.array_equal(
        got.view(np.int64), vals.view(np.int64)
    ), "alp round trip not bit-identical"


@settings(max_examples=80, deadline=None)
@given(float_arrays())
def test_zone_stats_bound_all_values(vals):
    """Zone-map float stats, when present, truly bound every value —
    a violated bound is a wrong pruning decision waiting to happen."""
    from orc_spark.engine import zonemap

    arr = pa.array(vals, type=pa.float64())
    s = zonemap.stripe_zone_stats(arr)
    if s["min_num"] is None:
        return  # empty / NaN-poisoned: no bounds, never pruned
    assert not np.isnan(vals).any()  # NaN must have suppressed stats
    assert s["min_num"] <= vals.min() and vals.max() <= s["max_num"]


@settings(max_examples=80, deadline=None)
@given(int_arrays())
def test_zone_stats_int_bounds_property(vals):
    from orc_spark.engine import zonemap

    arr = pa.array(vals, type=pa.int64())
    s = zonemap.stripe_zone_stats(arr)
    if len(vals):
        assert s["min_int"] == int(vals.min())
        assert s["max_int"] == int(vals.max())
    else:
        assert s["min_int"] is None


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40), st.just("")),
        max_size=200,
    ),
    st.sampled_from(["raw", "fsst", "dict", "prefix"]),
)
def test_string_frame_roundtrip_compressed(strings, codec):
    """The zlib layer must be transparent for arbitrary string frames
    (incl. None-vs-"" distinction) at any level-1 outcome."""
    arr = pa.array(strings, type=pa.string())
    blob = framing.encode_frame(arr, codec, state={}, compression="zlib")
    out = framing.decode_frame(blob)
    assert out.equals(arr)
    assert framing.column_checksum(out) == framing.column_checksum(arr)


@settings(max_examples=80, deadline=None)
@given(int_arrays())
def test_int_frame_roundtrip_compressed(vals):
    arr = pa.array(vals, type=pa.int64())
    blob = framing.encode_frame(arr, "rle_auto", state={}, compression="zlib")
    out = framing.decode_frame(blob)
    assert out.equals(arr)


# ----------------------------------------------- nested types (r5)

_SCALARS = [pa.int64(), pa.float64(), pa.string(), pa.bool_()]


@st.composite
def nested_arrays(draw):
    """Arbitrary nested arrays over {list, struct, map} x scalar leaves,
    depth <= 2, with nulls at every level."""
    def leaf_values(t, n):
        if t == pa.int64():
            v = st.none() | st.integers(-(2**62), 2**62 - 1)
        elif t == pa.float64():
            v = st.none() | st.floats(allow_nan=False, width=64)
        elif t == pa.string():
            v = st.none() | st.text(max_size=12)
        else:
            v = st.none() | st.booleans()
        return draw(st.lists(v, min_size=n, max_size=n))

    kind = draw(st.sampled_from(["struct", "list", "map", "struct_in_list"]))
    n = draw(st.integers(min_value=0, max_value=60))
    t1 = draw(st.sampled_from(_SCALARS))
    t2 = draw(st.sampled_from(_SCALARS))
    if kind == "struct":
        typ = pa.struct([("a", t1), ("b", t2)])
        a, b = leaf_values(t1, n), leaf_values(t2, n)
        nulls = draw(st.lists(st.booleans(), min_size=n, max_size=n))
        vals = [
            None if nz else {"a": x, "b": y}
            for x, y, nz in zip(a, b, nulls)
        ]
    elif kind == "list":
        typ = pa.list_(t1)
        vals = [
            draw(st.none() | st.just(leaf_values(t1, draw(st.integers(0, 5)))))
            for _ in range(n)
        ]
    elif kind == "map":
        typ = pa.map_(pa.string(), t1)
        vals = []
        for i in range(n):
            if draw(st.booleans()):
                m = draw(st.integers(0, 4))
                vals.append(
                    [(f"k{j}", v) for j, v in enumerate(leaf_values(t1, m))]
                )
            else:
                vals.append(None)
    else:  # struct_in_list
        typ = pa.list_(pa.struct([("q", t1)]))
        vals = []
        for i in range(n):
            if draw(st.booleans()):
                m = draw(st.integers(0, 3))
                vals.append([{"q": v} for v in leaf_values(t1, m)])
            else:
                vals.append(None)
    return pa.array(vals, type=typ)


@settings(max_examples=60, deadline=None)
@given(nested_arrays())
def test_nested_frame_roundtrip(arr):
    codec = ("struct" if pa.types.is_struct(arr.type)
             else "map" if pa.types.is_map(arr.type) else "list")
    for compression in (None, "zlib", "lzma"):
        blob = framing.encode_frame(arr, codec, compression=compression)
        out = framing.decode_frame(blob)
        assert out.type == arr.type
        assert out.to_pylist() == arr.to_pylist()
        assert framing.column_checksum(out) == framing.column_checksum(arr)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(min_size=0, max_size=40)),
        min_size=1, max_size=200,
    ),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
        min_size=1, max_size=12,
    ),
)
def test_token_bloom_never_false_negative(strings, token):
    """The token bloom may keep a stripe that lacks the token (false
    positive — the residual resolves it) but must NEVER veto a stripe
    that contains it."""
    import re

    from orc_spark.engine import zonemap

    arr = pa.array(strings, type=pa.string())
    blob = zonemap.stripe_bloom(arr, token_mode=True)
    present = any(
        s is not None and token in re.split("[^a-z0-9]+", s.lower())
        for s in strings
    )
    if blob is None:
        return  # no sketch -> probe keeps by construction
    pairs, domain = zonemap._probe_hash_pairs("contains_token", token)
    keep = bool(zonemap.bloom_membership([blob], pairs, domain)[0])
    if present:
        assert keep, (token, strings)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(min_size=0, max_size=30),
            st.integers(-(2**40), 2**40).map(str),
        ),
        min_size=1, max_size=150,
    ),
    st.text(min_size=0, max_size=8),
)
def test_prefix_overlap_never_prunes_matching_stripe(strings, prefix):
    """like_prefix zone keep: a stripe containing a match must keep."""
    from orc_spark.engine import zonemap

    non_null = [s for s in strings if s is not None]
    if not non_null:
        return
    lo, hi = min(non_null), max(non_null)
    has_match = any(s.startswith(prefix) for s in non_null)
    upper = zonemap._prefix_upper(prefix)
    keep = (not prefix) or (
        hi >= prefix and (upper is None or lo < upper)
    )
    if has_match:
        assert keep, (prefix, lo, hi)
