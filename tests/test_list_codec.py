"""LIST-column framing (codecs/framing.py dt=_DT_LIST): the ORC v1
LIST type analogue — a LENGTH stream through the int auto-selector plus
a recursively-framed child column. Round trips must be bit-identical
across nulls (list-level and element-level), empties, nesting, slicing,
and both list/large_list, with checksum agreement."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from orc_spark.codecs import framing as fr
from orc_spark.engine import selector

CASES = [
    pa.array([[1.0, 2.5], [3.25], None, []], type=pa.list_(pa.float32())),
    pa.array([[1, 2, None], None, [], [5]], type=pa.list_(pa.int64())),
    pa.array([["a", None, "bb"], [], None, ["ccc"]], type=pa.list_(pa.string())),
    pa.array(
        [[[1.0], [2.0]], None, [[]], []],
        type=pa.list_(pa.list_(pa.float64())),
    ),
    pa.array([[1.5] * 32] * 100, type=pa.large_list(pa.float32())),
    pa.array([], type=pa.list_(pa.float32())),
    pa.array([None, None], type=pa.list_(pa.int32())),
]


@pytest.mark.parametrize("arr", CASES, ids=lambda a: str(a.type)[:40])
@pytest.mark.parametrize("compression", [None, "zlib"])
def test_list_roundtrip(arr, compression):
    blob = fr.encode_frame(arr, "list", compression=compression)
    out = fr.decode_frame(blob)
    assert out.equals(arr)
    assert fr.column_checksum(out) == fr.column_checksum(arr)


def test_child_field_identity_roundtrips():
    """Parquet names list children 'element', arrow defaults to 'item';
    the decoded type must carry the ORIGINAL field name/nullability or
    checksum verification (which hashes the type string) would
    spuriously fail on parquet-sourced lists."""
    for f in (
        pa.field("element", pa.float32()),
        pa.field("v", pa.int64(), nullable=False),
        pa.field("item", pa.string()),
    ):
        arr = pa.array([[None] if f.nullable else [0], []], type=pa.list_(f))
        got = fr.decode_frame(fr.encode_frame(arr, "list"))
        assert got.type == arr.type
        assert fr.column_checksum(got) == fr.column_checksum(arr)


def test_raw_aliases_list():
    """The budget fallback chain terminates at 'raw' for every type;
    for lists the structural encoding IS the floor, so raw must alias
    it rather than error."""
    arr = CASES[0]
    assert fr.decode_frame(fr.encode_frame(arr, "raw")).equals(arr)


def test_sliced_offsets():
    big = pa.array(
        [[float(i), float(i + 1)] for i in range(1000)],
        type=pa.list_(pa.float32()),
    )
    sl = big.slice(100, 300)
    got = fr.decode_frame(fr.encode_frame(sl, "list"))
    assert got.to_pylist() == sl.to_pylist()


def test_uniform_length_lists_compress():
    """Uniform-length int lists: the LENGTH stream RLEs to a few bytes
    and the child rides rle_auto — structural overhead must not eat
    the win."""
    ints = pa.array([list(range(32))] * 2000, type=pa.list_(pa.int64()))
    blob = fr.encode_frame(ints, "list")
    assert ints.nbytes / len(blob) > 8


def test_selector_plans_list_chain():
    schema = pa.schema([("embedding", pa.list_(pa.float32()))])
    plans = selector.plan_for_schema(schema)
    assert plans["embedding"].chain == ["list"]


def test_unsupported_child_rejected():
    # duration children are not in the type registry (struct/list/map
    # now are); the frame must refuse rather than mis-encode
    arr = pa.array([[1, 2]], type=pa.list_(pa.duration("s")))
    with pytest.raises(TypeError):
        fr.encode_frame(arr, "list")


def test_string_child_uses_fsst_when_big():
    texts = pa.array(
        [["the quick brown fox jumps over the lazy dog"] * 8] * 200,
        type=pa.list_(pa.string()),
    )
    blob = fr.encode_frame(texts, "list")
    assert fr.decode_frame(blob).equals(texts)
    assert len(blob) < texts.nbytes  # fsst child actually saved bytes
