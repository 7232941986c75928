"""MAP-column framing (codecs/framing.py dt=_DT_MAP): the ORC v1 MAP
type analogue — PRESENT + LENGTH streams over parallel key/value child
columns, structurally a LIST of pairs. Round trips must be
bit-identical across map nulls, value nulls, empties, nesting, slicing
(MapArray.keys/.items are not slice-aware — _map_parts realigns via
offsets), and the raw/zlib aliases, with checksum agreement."""

from __future__ import annotations

import pyarrow as pa
import pytest

from orc_spark.codecs import framing as fr
from orc_spark.engine import selector

CASES = [
    pa.array(
        [[("a", 1), ("b", 2)], None, [], [("c", None)]],
        type=pa.map_(pa.string(), pa.int64()),
    ),
    pa.array(
        [[("k%d" % (i % 5), "v%d" % i)] for i in range(200)],
        type=pa.map_(pa.string(), pa.string()),
    ),
    pa.array(
        [[("x", [1.0, 2.0])], None],
        type=pa.map_(pa.string(), pa.list_(pa.float64())),
    ),
    pa.array([], type=pa.map_(pa.string(), pa.int64())),
    pa.array([None, None], type=pa.map_(pa.int64(), pa.float64())),
]


@pytest.mark.parametrize("arr", CASES, ids=lambda a: str(a.type)[:48])
@pytest.mark.parametrize("compression", [None, "zlib"])
def test_map_roundtrip(arr, compression):
    blob = fr.encode_frame(arr, "map", compression=compression)
    out = fr.decode_frame(blob)
    assert out.type == arr.type
    assert out.to_pylist() == arr.to_pylist()
    assert fr.column_checksum(out) == fr.column_checksum(arr)


def test_map_slice_roundtrips():
    big = CASES[1]
    sl = big.slice(50, 60)
    out = fr.decode_frame(fr.encode_frame(sl, "map"))
    assert out.to_pylist() == sl.to_pylist()
    assert fr.column_checksum(out) == fr.column_checksum(sl)


def test_map_in_struct_roundtrips():
    arr = pa.array(
        [{"m": [("a", 1)]}, {"m": None}, None],
        type=pa.struct([("m", pa.map_(pa.string(), pa.int32()))]),
    )
    out = fr.decode_frame(fr.encode_frame(arr, "struct"))
    assert out.to_pylist() == arr.to_pylist()
    assert fr.column_checksum(out) == fr.column_checksum(arr)


def test_raw_aliases_map():
    out = fr.decode_frame(fr.encode_frame(CASES[0], "raw"))
    assert out.to_pylist() == CASES[0].to_pylist()


def test_selector_routes_map_chain():
    schema = pa.schema(
        [("id", pa.int64()), ("attrs", pa.map_(pa.string(), pa.string()))]
    )
    assert selector.plan_for_schema(schema)["attrs"].chain == ["map"]
