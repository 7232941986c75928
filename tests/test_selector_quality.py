"""Codec auto-selector quality: the chain-walk choice must land within
15% of the best codec found by exhaustive search, per stripe shape.
(The selector is the engine's optimizer — SURVEY.md §4; a selector that
passes round-trips but picks bloated codecs would silently forfeit the
compression target.)"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from orc_spark.codecs import encode_frame
from orc_spark.engine import encode as encode_mod
from orc_spark.engine import selector, webgen

STRING_CODECS = ["dict", "prefix", "fsst", "raw"]
INT_CODECS = ["rle_auto", "rle_delta", "rle_direct", "rle_pb", "for_ts", "raw"]


def _best_size(arr, codecs):
    best = None
    for c in codecs:
        try:
            best = min(best or 1 << 62, len(encode_frame(arr, c)))
        except Exception:
            continue
    return best


def _cases():
    rng = np.random.default_rng(11)
    web = webgen.generate(20_000)
    return [
        ("lang_lowcard", web.column("lang").combine_chunks(), STRING_CODECS),
        ("text_zipf", web.column("text").combine_chunks(), STRING_CODECS),
        ("url_unique", web.column("url").combine_chunks(), STRING_CODECS),
        (
            "url_sorted",
            web.column("url").combine_chunks().sort(),
            STRING_CODECS,
        ),
        (
            "ts_runs",
            web.column("warc_ts").combine_chunks(),
            INT_CODECS,
        ),
        (
            "int_monotonic",
            pa.array(np.arange(50_000, dtype=np.int64) * 3),
            INT_CODECS,
        ),
        (
            "int_runs",
            pa.array(np.repeat(rng.integers(0, 50, 2_000), 25).astype(np.int64)),
            INT_CODECS,
        ),
        (
            "int_outliers",
            pa.array(
                np.where(
                    rng.random(50_000) < 0.01,
                    rng.integers(0, 2**60, 50_000),
                    rng.integers(0, 100, 50_000),
                ).astype(np.int64)
            ),
            INT_CODECS,
        ),
        (
            "int_random_wide",
            pa.array(rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)),
            INT_CODECS,
        ),
    ]


@pytest.mark.parametrize("name,arr,codecs", _cases(), ids=lambda c: c if isinstance(c, str) else "")
def test_selector_within_15pct_of_best(name, arr, codecs):
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())  # frame layer stores ts as int64 anyway
    plan_chain = (
        ["dict", "prefix", "fsst", "raw"]
        if pa.types.is_string(arr.type)
        else ["rle_auto", "raw"]
    )
    codec, blob, _ = encode_mod.encode_with_fallback(arr, plan_chain)
    best = _best_size(arr, codecs)
    assert best is not None
    assert len(blob) <= best * 1.15, (
        f"{name}: selector chose {codec} at {len(blob)}B, best is {best}B"
    )
    # and never worse than raw + framing slack
    assert len(blob) <= len(encode_frame(arr, "raw")) * 1.01
