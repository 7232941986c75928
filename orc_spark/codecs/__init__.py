"""Pure-numpy codec kernels + stripe framing (no Spark imports here).

Public surface:
- :mod:`bitpack` — fixed-width bit packing, zigzag
- :mod:`rle` — integer codecs (short-repeat / direct / delta / patched-base)
- :mod:`fsst` — FSST-style string compression (VLDB 2020 semantics)
- :mod:`framing` — pyarrow column <-> self-describing encoded blob,
  including dictionary encoding, null handling, and checksums
"""

from . import bitpack, fsst, framing, rle  # noqa: F401

encode_frame = framing.encode_frame
decode_frame = framing.decode_frame
column_checksum = framing.column_checksum
