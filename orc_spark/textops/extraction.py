"""HTML -> text extraction (the input_hint per-row invariant).

The engine's input table carries both ``html`` (raw page bytes) and
``text`` (extracted text); the north-rule invariant is *byte-identical
extracted text per url*. This module provides the deterministic
extractor and its inverse-checkable constructor:

- ``wrap_html_expr``: JVM-side expression building a page from a title
  and a text column, HTML-escaping the text (``& < >``). Used to state
  the invariant as an oracle-checkable query: ``extract_text(wrap_html
  (text)) == text`` byte-for-byte.
- ``extract_text``: Arrow-vectorized pandas UDF implementing a fixed,
  documented rule set (drop script/style/comments, body-only slice,
  tag strip, entity decode, whitespace collapse). Every step is a
  pandas C-side string op — no per-row Python in the hot path except
  numeric entity references (rare; callable replacement).

Extraction policy (deterministic, version-tagged so lineage rows can
record which extractor produced a column):

1. decode bytes as UTF-8 (errors='replace');
2. remove <script>...</script>, <style>...</style>, <!-- comments -->;
3. keep only the <body>...</body> slice when present (title/head
   boilerplate is not page text);
4. strip all remaining tags;
5. decode entities: named subset (&amp; &lt; &gt; &quot; &#39;
   &nbsp;) + numeric (&#NNN; / &#xHH;); &amp; decoded last per the
   HTML spec so double-escapes survive;
6. collapse whitespace runs to single spaces and trim (disable with
   ``collapse_ws=False`` when byte-preserving pre-formatted text).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EXTRACTOR_VERSION = "1"

_SCRIPT_RE = re.compile(r"(?is)<script\b.*?</script\s*>")
_STYLE_RE = re.compile(r"(?is)<style\b.*?</style\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_BODY_RE = re.compile(r"(?is)<body\b[^>]*>(.*?)</body\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"\s+")
_DEC_ENT_RE = re.compile(r"&#(\d{1,7});")
_HEX_ENT_RE = re.compile(r"&#[xX]([0-9a-fA-F]{1,6});")


def _decode_numeric(m: re.Match) -> str:
    try:
        cp = int(m.group(1), 16 if m.group(0)[2] in "xX" else 10)
        return chr(cp) if 0 < cp <= 0x10FFFF else ""
    except (ValueError, OverflowError):
        return ""


def html_escape_expr(col: Column) -> Column:
    """JVM-side HTML escaping of text content (& first, then < >)."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def wrap_html_expr(title: Column, text: Column) -> Column:
    """Build a page (binary) whose extraction returns ``text`` exactly
    (mirrors the synthetic generator's page shape, webgen.py)."""
    return F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            html_escape_expr(title),
            F.lit("</title></head><body><p>"),
            html_escape_expr(text),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )


def extract_series(html: pd.Series, body_only: bool = True, collapse_ws: bool = True) -> pd.Series:
    """The extraction pipeline over a pandas Series (str or bytes)."""
    # Sniff bytes-vs-str from the first NON-NULL element: a batch whose
    # first value is NULL but holds bytes rows must still take the
    # decode path, or pandas .str ops raise on inferred dtype bytes.
    first = html.dropna()
    if len(first) and isinstance(first.iloc[0], (bytes, bytearray)):
        s = html.map(
            lambda b: b.decode("utf-8", errors="replace")
            if isinstance(b, (bytes, bytearray))
            else b
        )
    else:
        s = html.astype("object")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_STYLE_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    if body_only:
        body = s.str.extract(_BODY_RE, expand=False)
        s = body.where(body.notna(), s)  # pages without <body>: whole doc
    s = s.str.replace(_TAG_RE, " ", regex=True)
    # entities: named subset, numeric, &amp; last (HTML spec ordering)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " ")):
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_DEC_ENT_RE, _decode_numeric, regex=True)
    s = s.str.replace(_HEX_ENT_RE, _decode_numeric, regex=True)
    s = s.str.replace("&amp;", "&", regex=False)
    if collapse_ws:
        s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


def extract_text_col(html_col, body_only: bool = True, collapse_ws: bool = True) -> Column:
    """``extract_text`` as a column expression (vectorized pandas UDF)."""

    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        return extract_series(html, body_only, collapse_ws)

    return _extract(html_col if isinstance(html_col, Column) else F.col(html_col))


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted",
    body_only: bool = True,
    collapse_ws: bool = True,
) -> DataFrame:
    """Append the extracted-text column for every page."""
    return df.withColumn(
        out_col, extract_text_col(F.col(html_col), body_only, collapse_ws)
    )


# href attribute + scheme://host of a URL (Spark and DuckDB both run
# these verbatim — keep the patterns engine-portable: no lookaround,
# no \p classes)
HREF_PATTERN = 'href="([^"]+)"'
HOST_PATTERN = "^[a-z][a-z0-9+.-]*://([^/]+)"


def link_graph(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Host-level link graph from raw pages: extract every href from
    the page markup, reduce both endpoints to their hosts, and count
    edges — the web-graph side-product (host in/out-degree, PageRank
    input, spam-cluster signal) a Common-Crawl-scale pipeline derives
    during the same pass that extracts text.

    Plan at scale: regexp_extract_all + explode is map-side (JVM regex,
    zero Python); the only shuffle is the (src_host, dst_host) count
    aggregation, which map-side-combines to one row per edge. Binary
    pages decode via cast(binary as string) — UTF-8, JVM-side.
    """
    html_str = F.col(html_col).cast("string")
    links = df.select(
        F.lower(F.regexp_extract(F.col(url_col), HOST_PATTERN, 1)).alias(
            "src_host"
        ),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(HREF_PATTERN), F.lit(1))
        ).alias("href"),
    )
    return (
        links.select(
            "src_host",
            F.lower(F.regexp_extract("href", HOST_PATTERN, 1)).alias(
                "dst_host"
            ),
        )
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def link_graph_sql(table: str, html_col: str = "html", url_col: str = "url") -> str:
    """DuckDB twin of :func:`link_graph` (same patterns, same host
    normalization, same edge-count aggregation)."""
    return (
        "WITH links AS (SELECT "
        f"lower(regexp_extract({url_col}, '{HOST_PATTERN}', 1)) AS src_host, "
        f"unnest(regexp_extract_all({html_col}, '{HREF_PATTERN}', 1)) AS href "
        f"FROM {table}), "
        "edges AS (SELECT src_host, "
        f"lower(regexp_extract(href, '{HOST_PATTERN}', 1)) AS dst_host "
        "FROM links) "
        "SELECT src_host, dst_host, count(*) AS n_links FROM edges "
        "WHERE src_host != '' AND dst_host != '' "
        "GROUP BY src_host, dst_host"
    )


def url_host_filter(
    df: DataFrame,
    blocklist: list[str],
    spam_pattern: str = r"(porn|casino|viagra)",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level corpus filtering — the first, cheapest gate in a
    crawl curation pipeline: drop documents whose host is on an exact
    blocklist or matches a spam regex, BEFORE any text processing
    spends cycles on them.

    Plan at scale: pure map-side (host regex + isin + rlike inside
    whole-stage codegen); the blocklist is a literal IN-list (Catalyst
    folds small lists; for a multi-million-entry blocklist switch to a
    broadcast anti-join — same semantics, documented seam). No
    shuffle, no Python.

    Returns (doc_id, url, host) for the SURVIVORS, order by doc_id.
    """
    host = F.lower(F.regexp_extract(F.col(url_col), HOST_PATTERN, 1))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        host.alias("host"),
    )
    return (
        out.where(
            (~F.col("host").isin(blocklist))
            & (~F.col("host").rlike(spam_pattern))
        )
        .orderBy("doc_id")
    )


def url_host_filter_sql(
    table: str,
    blocklist: list[str],
    spam_pattern: str = "(porn|casino|viagra)",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`url_host_filter` (same host extraction,
    same exact + regex rejection)."""
    bl = ", ".join("'" + b.replace("'", "''") + "'" for b in blocklist)
    return (
        f"WITH h AS (SELECT {id_col} AS doc_id, {url_col} AS url, "
        f"lower(regexp_extract({url_col}, '{HOST_PATTERN}', 1)) AS host "
        f"FROM {table}) "
        f"SELECT doc_id, url, host FROM h "
        f"WHERE host NOT IN ({bl}) "
        f"AND NOT regexp_matches(host, '{spam_pattern}') "
        f"ORDER BY doc_id"
    )


ANCHOR_PATTERN = r'<a\s+href="([^"]+)"[^>]*>([^<]*)</a>'


def anchor_text_index(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Anchor-text aggregation — the relevance/quality signal search
    and curation pipelines mine from the link graph: what OTHER pages
    call a host. Extracts every ``<a href>`` tag, pairs the target
    host with the anchor's visible text, and aggregates per host.

    Plan at scale: tag extraction + href/text recovery is all JVM
    regex map-side; the one shuffle is the per-host aggregation.
    ``texts`` is a sorted-distinct digest (collect_set) — anchor
    vocabulary per host is small in practice; for adversarial hosts
    cap it upstream with a (host, text) distinct + per-host window
    limit (same WindowGroupLimit seam as domain_cap).

    Returns (dst_host, n_anchors, n_texts, texts), order by dst_host.
    """
    html_str = F.col(html_col).cast("string")
    tags = df.select(
        F.explode(
            F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), F.lit(0))
        ).alias("tag")
    )
    pairs = tags.select(
        F.lower(
            F.regexp_extract(
                F.regexp_extract("tag", ANCHOR_PATTERN, 1), HOST_PATTERN, 1
            )
        ).alias("dst_host"),
        F.regexp_extract("tag", ANCHOR_PATTERN, 2).alias("anchor_text"),
    ).where((F.col("dst_host") != "") & (F.col("anchor_text") != ""))
    return (
        pairs.groupBy("dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.countDistinct("anchor_text").alias("n_texts"),
            F.array_join(
                F.array_sort(F.collect_set("anchor_text")), "|"
            ).alias("texts"),
        )
        .orderBy("dst_host")
    )


def anchor_text_index_sql(
    table: str, html_col: str = "html", url_col: str = "url"
) -> str:
    """DuckDB twin of :func:`anchor_text_index` (same tag pattern,
    same host extraction, same sorted-distinct text digest)."""
    return (
        "WITH tags AS (SELECT unnest(regexp_extract_all("
        f"{html_col}, '{ANCHOR_PATTERN}')) AS tag FROM {table}), "
        "pairs AS (SELECT "
        f"lower(regexp_extract(regexp_extract(tag, '{ANCHOR_PATTERN}', 1), "
        f"'{HOST_PATTERN}', 1)) AS dst_host, "
        f"regexp_extract(tag, '{ANCHOR_PATTERN}', 2) AS anchor_text "
        "FROM tags) "
        "SELECT dst_host, count(*) AS n_anchors, "
        "count(DISTINCT anchor_text) AS n_texts, "
        "string_agg(DISTINCT anchor_text, '|' ORDER BY anchor_text) AS texts "
        "FROM pairs WHERE dst_host != '' AND anchor_text != '' "
        "GROUP BY dst_host ORDER BY dst_host"
    )


def attr_escape_expr(col: Column) -> Column:
    """HTML attribute-value escaping (& first, then < > \")."""
    return F.regexp_replace(html_escape_expr(col), '"', "&quot;")


def _unescape_expr(c: Column) -> Column:
    """Inverse of attr_escape_expr/html_escape_expr for the basic
    entity set (&amp; last, per the HTML spec, so double-escapes
    survive the round trip)."""
    c = F.regexp_replace(c, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&quot;", '"')
    return F.regexp_replace(c, "&amp;", "&")


def page_with_meta_expr(title: Column, desc: Column, text: Column) -> Column:
    """Build a page (binary) carrying <title> and a description
    <meta>, whose extract_title_meta returns (title, desc) exactly —
    the oracle-checkable inverse, like wrap_html_expr for body text."""
    return F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            html_escape_expr(title),
            F.lit('</title><meta name="description" content="'),
            attr_escape_expr(desc),
            F.lit('"></head><body><p>'),
            html_escape_expr(text),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )


def extract_title_meta(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Pull <title> and the description <meta> out of raw page bytes —
    head metadata extract_text deliberately drops (it is body-only).

    Pure JVM regexp over the decoded page — zero Python, zero shuffle,
    map-only at 100 TB. Missing title/meta come back as empty strings
    (regexp_extract's no-match value), not nulls."""
    page = F.decode(F.col(html_col), "UTF-8")
    title = F.regexp_extract(page, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    desc = F.regexp_extract(
        page,
        r'(?is)<meta\s+name="description"\s+content="([^"]*)"',
        1,
    )
    return df.select(
        F.col(id_col).alias("id"),
        _unescape_expr(title).alias("title"),
        _unescape_expr(desc).alias("description"),
    )


def robots_directives(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Crawl-policy head metadata: the robots <meta> directives
    (noindex/nofollow) and the canonical <link> target — the gate a
    crawl pipeline applies before a page may enter the corpus, plus
    the dedup hint search engines honor.

    Pure JVM regexp over the decoded page, map-only, zero Python.
    Absent directives read as False / empty canonical."""
    page = F.decode(F.col(html_col), "UTF-8")
    robots = F.lower(
        F.regexp_extract(
            page,
            r'(?is)<meta\s+name="robots"\s+content="([^"]*)"',
            1,
        )
    )
    canonical = F.regexp_extract(
        page,
        r'(?is)<link\s+rel="canonical"\s+href="([^"]*)"',
        1,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.coalesce(robots.contains("noindex"), F.lit(False)).alias("noindex"),
        F.coalesce(robots.contains("nofollow"), F.lit(False)).alias("nofollow"),
        _unescape_expr(canonical).alias("canonical"),
    )


def text_density(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Text-density boilerplate signal (the jusText/boilerpipe-family
    heuristic): extracted-text bytes over raw page bytes — chrome-heavy
    pages (nav, ads, markup soup) score low, article-like pages high.

    Pure JVM byte arithmetic over columns the scan already reads:
    zero shuffle, zero Python; fuses into any pass that touches the
    page."""
    tb = F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
    hb = F.greatest(F.octet_length(F.col(html_col)), F.lit(1))
    return df.select(
        F.col(id_col).alias("id"),
        tb.alias("text_bytes"),
        F.octet_length(F.col(html_col)).alias("html_bytes"),
        F.round(tb / hb, 6).alias("density"),
    )
