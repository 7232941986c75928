"""STRUCT-column framing (codecs/framing.py dt=_DT_STRUCT): the ORC v1
STRUCT type analogue — the struct column itself carries only a PRESENT
stream; each field is a recursively self-describing child frame picking
its codec by type family. Round trips must be bit-identical across
parent nulls, field nulls, nesting (struct-in-struct, list-in-struct,
struct-in-list), slicing, and the raw/zlib aliases, with checksum
agreement. Semantics follow the public ORC v1 spec only — not a port.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from orc_spark.codecs import framing as fr
from orc_spark.engine import selector

CASES = [
    pa.array(
        [{"x": 1, "s": "ab"}, {"x": 2, "s": "cd"}, None, {"x": None, "s": "ee"}],
        type=pa.struct([("x", pa.int64()), ("s", pa.string())]),
    ),
    pa.array(
        [
            {"v": [1.0, 2.0], "inner": {"k": "a"}},
            {"v": [], "inner": None},
            None,
            {"v": None, "inner": {"k": None}},
        ],
        type=pa.struct(
            [("v", pa.list_(pa.float32())), ("inner", pa.struct([("k", pa.string())]))]
        ),
    ),
    pa.array(
        [{"b": True, "d": 1.25}, {"b": None, "d": None}, {"b": False, "d": -0.0}],
        type=pa.struct([("b", pa.bool_()), ("d", pa.float64())]),
    ),
    pa.array([], type=pa.struct([("x", pa.int64())])),
    pa.array([None, None], type=pa.struct([("x", pa.int32())])),
    pa.array([{}, {}, None], type=pa.struct([])),
]


@pytest.mark.parametrize("arr", CASES, ids=lambda a: str(a.type)[:48])
@pytest.mark.parametrize("compression", [None, "zlib"])
def test_struct_roundtrip(arr, compression):
    blob = fr.encode_frame(arr, "struct", compression=compression)
    out = fr.decode_frame(blob)
    assert out.equals(arr)
    assert fr.column_checksum(out) == fr.column_checksum(arr)


def test_struct_in_list_roundtrip():
    arr = pa.array(
        [[{"q": 1}, {"q": 2}], None, [], [{"q": None}]],
        type=pa.list_(pa.struct([("q", pa.int32())])),
    )
    out = fr.decode_frame(fr.encode_frame(arr, "list"))
    assert out.equals(arr)
    assert fr.column_checksum(out) == fr.column_checksum(arr)


def test_struct_slice_roundtrips():
    """flatten() (not .field(i)) keeps slice offsets aligned."""
    big = pa.array(
        [{"x": i, "s": str(i)} for i in range(100)],
        type=pa.struct([("x", pa.int64()), ("s", pa.string())]),
    )
    sl = big.slice(10, 30)
    out = fr.decode_frame(fr.encode_frame(sl, "struct"))
    assert out.to_pylist() == sl.to_pylist()
    assert fr.column_checksum(out) == fr.column_checksum(sl)


def test_raw_aliases_struct():
    """'raw' must alias the structural floor so budget chains terminate."""
    arr = CASES[0]
    out = fr.decode_frame(fr.encode_frame(arr, "raw"))
    assert out.equals(arr)


def test_selector_routes_struct_chain():
    schema = pa.schema(
        [("id", pa.int64()), ("meta", pa.struct([("k", pa.string())]))]
    )
    plans = selector.plan_for_schema(schema)
    assert plans["meta"].chain == ["struct"]


def test_field_nullability_and_names_roundtrip():
    t = pa.struct(
        [
            pa.field("req", pa.int64(), nullable=False),
            pa.field("opt", pa.string(), nullable=True),
        ]
    )
    arr = pa.array([{"req": 1, "opt": None}, {"req": 2, "opt": "z"}], type=t)
    out = fr.decode_frame(fr.encode_frame(arr, "struct"))
    assert out.type == t
    assert out.equals(arr)


def test_sibling_fields_do_not_share_fsst_state():
    """A symbol table trained on one field must not be reused for a
    sibling with a different distribution — sub-state isolation."""
    import pyarrow as pa

    a = ["the quick brown fox jumps over the lazy dog " * 4] * 300
    b = ["0123456789abcdef" * 12] * 300
    arr = pa.StructArray.from_arrays(
        [pa.array(a), pa.array(b)], names=["eng", "hexy"]
    )
    state: dict = {}
    blob = fr.encode_frame(arr, "struct", state=state)
    assert fr.decode_frame(blob).equals(arr)
    kids = state.get("\x00children", {})
    # both children trained their OWN table (big enough corpora)
    assert "fsst_table" in kids.get("eng", {})
    assert "fsst_table" in kids.get("hexy", {})
    assert kids["eng"]["fsst_table"] != kids["hexy"]["fsst_table"]
