"""External corpus sources beyond parquet: WARC/WET (Common-Crawl
native formats) and the ORC interchange living in engine.storage."""

from .warc import (  # noqa: F401
    format_warc,
    parse_warc,
    read_warc,
    read_wet,
    write_warc,
    write_wet,
)
