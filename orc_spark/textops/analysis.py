"""Text analysis for training-data curation: token counting, quality
scoring, language ID, document fingerprinting. All JVM-side column
expressions (SQL-expressible -> DuckDB oracle twins), except where
noted."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists (public common words); enough for a
# frequency heuristic, deliberately not a trained model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "et", "des", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "de", "y", "que", "en", "un", "una", "es"],
    "pt": ["o", "a", "os", "de", "e", "que", "em", "um", "uma", "para"],
    "ru": ["и", "в", "не", "на", "что", "с", "это", "как", "по", "но"],
}


def token_count(text_col):
    """Whitespace token count (0 for empty/null)."""
    t = F.trim(F.coalesce(text_col, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


# BPE-style pre-tokenizer (GPT-2 family, simplified to the subset both
# Java regex and RE2 support — no lookarounds): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def subword_token_count(text_col):
    """BPE-ish subword token count (0 for empty/null) — the unit a
    training pipeline budgets by, approximated JVM-side (no UDF)."""
    t = F.coalesce(text_col, F.lit(""))
    return F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, n_subword_tokens, avg_token_len)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        subword_token_count(t).alias("n_subword_tokens"),
        (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tok, F.lit(1)))
        .alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite 0..1 score.

    Features (each JVM-side regex/length arithmetic):
    - len_score: saturating length preference (100..2000 chars)
    - alpha_ratio: alphabetic chars / non-space chars
    - punct_ratio: punctuation / non-space chars (penalized when high)
    - digit_ratio: digits / non-space chars (penalized when high)
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    nonspace = F.greatest(F.length(F.regexp_replace(t, r"\s", "")), F.lit(1))
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z\p{L}]", ""))
    digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    alpha_ratio = alpha / nonspace
    digit_ratio = digit / nonspace
    punct_ratio = punct / nonspace
    score = (
        len_score * 0.4
        + alpha_ratio * 0.4
        + (1 - F.least(digit_ratio * 4, F.lit(1.0))) * 0.1
        + (1 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.1
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.length(t).alias("n_chars"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-frequency language guess over STOPWORDS lists.

    Returns (id, lang_guess, lang_score). Pure column expressions:
    per language, the fraction of tokens found in its stopword list;
    argmax wins, 'und' (undetermined) when every score is 0.
    """
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda tok: F.array_contains(arr, tok)))
        scores.append(F.struct((hits / n).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        F.round(best["score"], 6).alias("lang_score"),
    )


TOKEN_STATS_SQL = (
    "SELECT doc_id AS id, LENGTH(text) AS n_chars, "
    "CASE WHEN TRIM(text) = '' THEN 0 ELSE "
    "LEN(string_split_regex(TRIM(text), '\\s+')) END AS n_tokens, "
    "LEN(regexp_extract_all(COALESCE(text, ''), "
    "'''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'"
    ")) AS n_subword_tokens, "
    "LENGTH(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / "
    "GREATEST(CASE WHEN TRIM(text) = '' THEN 0 ELSE "
    "LEN(string_split_regex(TRIM(text), '\\s+')) END, 1) AS avg_token_len "
    "FROM {table}"
)

FINGERPRINT_SQL = (
    "SELECT doc_id AS id, sha256(text) AS content_sha, "
    "sha256(array_to_string(list_sort(list_distinct("
    "string_split_regex(LOWER(COALESCE(text,'')), '\\s+'))), chr(0))) AS tokenset_sha "
    "FROM {table}"
)

def quality_score_sql(table: str) -> str:
    """DuckDB twin of quality_score. Char-class caveat: Spark's alpha
    class is [a-zA-Z\\p{L}]; the twin uses [a-zA-Z] — identical on
    ASCII corpora (the synthetic tables), divergent on non-Latin
    scripts. (Built by concatenation: the punct char class contains
    braces that str.format would mangle.)"""
    return (
    r"WITH f AS (SELECT doc_id, COALESCE(text,'') AS t, "
    r"GREATEST(LENGTH(regexp_replace(COALESCE(text,''), '\s', '', 'g')), 1) AS nonspace, "
    r"LENGTH(regexp_replace(COALESCE(text,''), '[^a-zA-Z]', '', 'g')) AS alpha, "
    r"LENGTH(regexp_replace(COALESCE(text,''), '[^0-9]', '', 'g')) AS digit, "
    r"LENGTH(regexp_replace(COALESCE(text,''), '[^!-/:-@\[-`{-~]', '', 'g')) AS punct "
    r"FROM {table}) "
    r"SELECT doc_id AS id, LENGTH(t) AS n_chars, "
    r"ROUND(alpha * 1.0 / nonspace, 6) AS alpha_ratio, "
    r"ROUND(digit * 1.0 / nonspace, 6) AS digit_ratio, "
    r"ROUND(punct * 1.0 / nonspace, 6) AS punct_ratio, "
    r"ROUND(LEAST(LENGTH(t) / 500.0, 1.0) * 0.4 + (alpha * 1.0 / nonspace) * 0.4 "
    r"+ (1 - LEAST(digit * 4.0 / nonspace, 1.0)) * 0.1 "
    r"+ (1 - LEAST(punct * 4.0 / nonspace, 1.0)) * 0.1, 6) AS quality FROM f"
    ).replace("{table}", table)

EXACT_DEDUP_SQL = (
    "SELECT sha256(text) AS content_sha, "
    "CAST(MIN(doc_id) AS BIGINT) AS keeper_id, COUNT(*) AS n_copies "
    "FROM {table} GROUP BY 1 ORDER BY content_sha"
)


def language_id_sql(table: str) -> str:
    """DuckDB twin of language_id, generated from the same STOPWORDS
    (argmax tie-break = larger lang string, matching Spark's struct
    max ordering)."""
    values = ", ".join(
        "('{}', [{}])".format(lang, ", ".join(f"'{w}'" for w in words))
        for lang, words in STOPWORDS.items()
    )
    return (
        "WITH t AS (SELECT doc_id, string_split_regex(LOWER(COALESCE(text, '')), "
        f"'\\s+') AS toks FROM {table}), "
        f"s AS (SELECT doc_id, l.lang, len(list_filter(toks, x -> "
        "list_contains(l.words, x))) * 1.0 / GREATEST(len(toks), 1) AS score "
        f"FROM t, (VALUES {values}) AS l(lang, words)), "
        "best AS (SELECT doc_id, lang, score, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM s) "
        "SELECT doc_id AS id, CASE WHEN score > 0 THEN lang ELSE 'und' END "
        "AS lang_guess, ROUND(score, 6) AS lang_score FROM best WHERE rn = 1"
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic 64-bit-ish fingerprints: full-text sha256 (hex)
    plus a locality-insensitive token-set hash (order-independent)."""
    toks = F.array_sort(
        F.array_distinct(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.sha2(F.col(text_col), 256).alias("content_sha"),
        F.sha2(F.concat_ws("\x00", toks), 256).alias("tokenset_sha"),
    )


# ------------------------------------------------------------- PII scrub

# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs. Order matters (email before
# phone so the digits in a mailbox name aren't half-redacted); both
# engines apply the same chain in the same order.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[-. ]\(?\d{3}\)?[-. ]\d{3}[-. ]?\d{4}", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers — the standard
    pre-training privacy scrub, pure JVM `regexp_replace` chain (zero
    UDF, map-only, no shuffle). Returns (id, scrubbed, n_redactions).
    """
    scrubbed = F.coalesce(F.col(text_col), F.lit(""))
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    n_red = (
        F.size(F.split(scrubbed, "<EMAIL>|<IP>|<PHONE>")) - 1
    )
    return df.select(
        F.col(id_col).alias("id"),
        scrubbed.alias("scrubbed"),
        n_red.cast("int").alias("n_redactions"),
    )


def pii_scrub_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`pii_scrub` (same chain, same order; RE2
    and Java agree on these conservative patterns)."""
    expr = f"COALESCE({text_col}, '')"
    for _, pat, repl in PII_PATTERNS:
        # DuckDB single-quoted strings are NOT backslash-escaped, so
        # the raw regex goes in verbatim (only quotes need doubling)
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return (
        f"SELECT {id_col} AS id, {expr} AS scrubbed, "
        f"CAST(len(string_split_regex({expr}, '<EMAIL>|<IP>|<PHONE>')) - 1 AS INT) "
        f"AS n_redactions FROM {table} ORDER BY id"
    )


def normalized_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup over NORMALIZED text (lowercase, whitespace runs
    collapsed, trimmed): catches trivially-reformatted copies that
    byte-exact dedup misses. One shuffle on the normalized hash."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    )
    return (
        df.groupBy(F.sha2(norm, 256).alias("norm_sha"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("norm_sha")
    )


NORMALIZED_DEDUP_SQL = (
    "SELECT sha256(TRIM(regexp_replace(LOWER(COALESCE(text, '')), '\\s+', ' ', 'g'))) "
    "AS norm_sha, CAST(MIN(doc_id) AS BIGINT) AS keeper_id, COUNT(*) AS n_copies "
    "FROM {table} GROUP BY 1 ORDER BY norm_sha"
)


def repetition_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Gopher/MassiveText-style intra-document repetition signal: the
    fraction of word n-grams that are duplicates of an earlier n-gram
    in the same document (1 - distinct/total). High values flag
    boilerplate and looping generations — a standard pretraining-data
    quality filter. Pure JVM expressions (split -> transform(sequence)
    n-gram build -> array_distinct): zero shuffle, map-only at any
    scale.
    """
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col).alias("id"),
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        F.round(
            F.when(total > 0, 1.0 - distinct / total).otherwise(F.lit(0.0)), 6
        ).alias("repetition"),
    ).orderBy("id")


def repetition_ratio_sql(table: str, n: int = 3) -> str:
    """DuckDB twin of :func:`repetition_ratio` — same n-gram
    construction via 1-indexed list_transform, same rounding."""
    joined = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return (
        f"WITH t AS (SELECT doc_id AS id, "
        f"string_split_regex(TRIM(COALESCE(text, '')), '\\s+') AS w "
        f"FROM {table}), g AS (SELECT id, CASE WHEN len(w) >= {n} THEN "
        f"list_transform(range(1, len(w) - {n - 2}), i -> {joined}) "
        f"ELSE [] END AS ng FROM t) "
        f"SELECT id, CAST(len(ng) AS INT) AS n_ngrams, "
        f"CAST(len(list_distinct(ng)) AS INT) AS n_distinct, "
        f"ROUND(CASE WHEN len(ng) > 0 THEN 1.0 - "
        f"len(list_distinct(ng)) * 1.0 / len(ng) ELSE 0.0 END, 6) "
        f"AS repetition FROM g ORDER BY id"
    )


def url_canonicalize(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical URL form for crawl dedup (every rule deterministic and
    RE2-portable so the DuckDB twin is exact):

    1. strip the fragment;
    2. lowercase scheme://host[:port] (path/query keep their case);
    3. drop default ports (http:80, https:443);
    4. sort query parameters byte-wise;
    5. strip one trailing slash.

    Pure JVM expressions, map-only. Returns (id, canonical_url).
    """
    u = F.regexp_replace(F.coalesce(F.col(url_col), F.lit("")), "#.*$", "")
    prefix = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", 0)
    lowered = F.concat(
        F.lower(prefix), F.substring(u, F.length(prefix) + 1, F.length(u))
    )
    no_port = F.regexp_replace(
        F.regexp_replace(lowered, "^(http://[^/:?]+):80(?=[/?]|$)", "$1"),
        "^(https://[^/:?]+):443(?=[/?]|$)",
        "$1",
    )
    base = F.regexp_replace(no_port, "\\?.*$", "")
    qs = F.regexp_extract(no_port, "\\?(.*)$", 1)
    sorted_q = F.array_join(F.sort_array(F.split(qs, "&")), "&")
    with_q = F.when(
        no_port.contains("?"), F.concat(base, F.lit("?"), sorted_q)
    ).otherwise(no_port)
    canon = F.regexp_replace(with_q, "/$", "")
    return df.select(
        F.col(id_col).alias("id"), canon.alias("canonical_url")
    ).orderBy("id")


def url_canonicalize_sql(table: str, url_col: str = "url", id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`url_canonicalize` (RE2 syntax: backrefs in
    replacements are \\1; lookahead is unsupported in RE2, so the
    default-port rule matches the port's follower explicitly)."""
    u = f"regexp_replace(COALESCE({url_col}, ''), '#.*$', '')"
    prefix = f"coalesce(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', 0), '')"
    lowered = f"(lower({prefix}) || substr({u}, length({prefix}) + 1))"
    no_port = (
        f"regexp_replace(regexp_replace({lowered}, "
        f"'^(http://[^/:?]+):80([/?]|$)', '\\1\\2'), "
        f"'^(https://[^/:?]+):443([/?]|$)', '\\1\\2')"
    )
    base = f"regexp_replace({no_port}, '\\?.*$', '')"
    qs = f"coalesce(regexp_extract({no_port}, '\\?(.*)$', 1), '')"
    sorted_q = f"array_to_string(list_sort(string_split({qs}, '&')), '&')"
    with_q = (
        f"CASE WHEN contains({no_port}, '?') "
        f"THEN {base} || '?' || {sorted_q} ELSE {no_port} END"
    )
    return (
        f"SELECT {id_col} AS id, "
        f"regexp_replace({with_q}, '/$', '') AS canonical_url "
        f"FROM {table} ORDER BY id"
    )


HASH_SPLIT_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "valid", "test"),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/valid/test assignment by keyed hash bucket —
    the training-corpus split primitive. Properties a random() split
    lacks, all load-bearing at 10^12 docs:

    - STABLE: a document's split depends only on (salt, id), so
      re-runs, backfills, and incremental crawls never migrate a
      document across splits (no eval contamination over time);
    - PORTABLE: the bucket is md5-derived with pure-SQL arithmetic,
      so any engine (the DuckDB twin here) reproduces it bit-for-bit;
    - MAP-ONLY: one JVM expression chain, zero shuffles, zero Python.

    ``salt`` versions the assignment: bump it to re-deal the corpus
    without correlation to the previous split.
    """
    if len(weights) != len(names) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must match names and sum to 1")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long") % HASH_SPLIT_BUCKETS
    cuts = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w
        cuts.append(int(round(acc * HASH_SPLIT_BUCKETS)))
    split = F.when(bucket < cuts[0], names[0])
    for i in range(1, len(cuts)):
        split = split.when(bucket < cuts[i], names[i])
    split = split.otherwise(names[-1])
    return df.select(
        F.col(id_col).alias("id"), bucket.alias("bucket"), split.alias("split")
    ).orderBy("id")


def hash_split_sql(
    table: str,
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "valid", "test"),
    salt: str = "split-v1",
) -> str:
    """DuckDB twin of :func:`hash_split` — identical md5 bucket, so a
    document lands in the same split under either engine."""
    if len(weights) != len(names) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must match names and sum to 1")
    bucket = (
        f"(('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {HASH_SPLIT_BUCKETS})"
    )
    cuts = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w
        cuts.append(int(round(acc * HASH_SPLIT_BUCKETS)))
    case = "CASE "
    for cut, name in zip(cuts, names[:-1]):
        case += f"WHEN {bucket} < {cut} THEN '{name}' "
    case += f"ELSE '{names[-1]}' END"
    return (
        f"SELECT {id_col} AS id, CAST({bucket} AS BIGINT) AS bucket, "
        f"{case} AS split FROM {table} ORDER BY id"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum subsampling — the corpus-rebalancing
    primitive (e.g. downsample English to 10%, keep low-resource
    languages whole). Same md5-bucket machinery as :func:`hash_split`,
    so the properties carry over verbatim:

    - STABLE: keep/drop depends only on (salt, id), so backfills and
      re-runs never resample a document;
    - PORTABLE: pure-SQL md5 arithmetic — the DuckDB twin reproduces
      every keep decision bit-for-bit;
    - MAP-ONLY: one JVM expression chain, zero shuffles, zero Python —
      at 10^12 docs this is a pushdown-friendly filter, not a job.

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed keep ``default_rate``. Returns kept rows as (id, stratum).
    """
    rates = rates or {}
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0,1], got {v}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long") % HASH_SPLIT_BUCKETS
    cut = None
    for k, v in sorted(rates.items()):
        c = int(round(v * HASH_SPLIT_BUCKETS))
        cut = (F.when(F.col(strata_col) == k, c) if cut is None
               else cut.when(F.col(strata_col) == k, c))
    default_cut = int(round(default_rate * HASH_SPLIT_BUCKETS))
    cut = F.lit(default_cut) if cut is None else cut.otherwise(default_cut)
    return (
        df.where(bucket < cut)
        .select(F.col(id_col).alias("id"), F.col(strata_col).alias("stratum"))
        .orderBy("id")
    )


def stratified_sample_sql(
    table: str,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> str:
    """DuckDB twin of :func:`stratified_sample` — identical md5 bucket
    and cut arithmetic, so both engines keep the exact same rows."""
    rates = rates or {}
    bucket = (
        f"(('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {HASH_SPLIT_BUCKETS})"
    )
    default_cut = int(round(default_rate * HASH_SPLIT_BUCKETS))
    if rates:
        case = "CASE "
        for k, v in sorted(rates.items()):
            case += f"WHEN {strata_col} = '{k}' THEN {int(round(v * HASH_SPLIT_BUCKETS))} "
        case += f"ELSE {default_cut} END"
    else:
        case = str(default_cut)
    return (
        f"SELECT {id_col} AS id, {strata_col} AS stratum FROM {table} "
        f"WHERE {bucket} < ({case}) ORDER BY id"
    )


def top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 25
) -> DataFrame:
    """Vocabulary statistics by DOCUMENT frequency (not raw term count):
    the per-doc distinct step bounds each document's contribution at 1,
    so boilerplate-heavy pages can't dominate the ranking. Plan at
    scale: array_distinct caps the explode at vocab-per-doc, the
    groupBy count does map-side partial aggregation, and the top-k is
    a TakeOrderedAndProject (per-partition heap + driver merge of k
    rows), never a full sort. Ties break on term asc — (df, term) is a
    total order, so the k-row result is deterministic."""
    toks = df.select(
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("term")
    )
    return (
        toks.where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(k)
    )


def top_terms_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id", k: int = 25
) -> str:
    """DuckDB twin of :func:`top_terms` (same tokenizer regex, same
    per-doc distinct, same (df desc, term asc) total order)."""
    return (
        "WITH t AS (SELECT unnest(list_distinct("
        f"string_split_regex(lower({text_col}), '\\s+'))) AS term FROM {table}) "
        "SELECT term, count(*) AS df FROM t WHERE term != '' "
        f"GROUP BY term ORDER BY df DESC, term LIMIT {k}"
    )


def sequence_pack(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    shards: int = 8,
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign every document a (shard, sequence, offset) slot for
    fixed-length training-sequence packing — the step that turns a
    curated corpus into model-ready sequences of exactly ``budget``
    tokens (documents may span a sequence boundary; the trainer masks
    across the seam).

    Layout rule, purely arithmetic so any engine reproduces it:
    documents are dealt to ``shards`` by the same portable md5 bucket
    as :func:`hash_split` (stable under re-runs and backfills), packed
    within a shard in doc-id order by a running token cumsum;
    ``seq_id = floor(start / budget)`` and ``seq_off = start % budget``
    where ``start`` is the cumsum before this document.

    Scale plan: ONE shuffle (by shard), one incrementally-evaluated
    running-sum window per shard. At 100 TB raise ``shards`` so each
    shard's stream fits a task (packing is embarrassingly parallel
    across shards by construction); the window never materializes its
    frame. Zero Python, zero explode.
    """
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    shard = (bucket % F.lit(shards)).alias("shard")
    toks = token_count(F.col(text_col)).cast("long").alias("tokens")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(F.col(id_col).alias("id"), shard, toks)
    start = (F.sum("tokens").over(w) - F.col("tokens")).alias("start")
    return (
        base.select("id", "shard", "tokens", start)
        .select(
            "id",
            "shard",
            "tokens",
            (F.col("start") / F.lit(budget)).cast("long").alias("seq_id"),
            (F.col("start") % F.lit(budget)).alias("seq_off"),
        )
        .orderBy("id")
    )


def sequence_pack_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    shards: int = 8,
    salt: str = "pack-v1",
) -> str:
    """DuckDB twin of :func:`sequence_pack` — same md5 shard deal,
    same doc-id-ordered cumsum, same integer slot arithmetic."""
    bucket = (
        f"(('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {shards})"
    )
    toks = (
        f"CASE WHEN trim(COALESCE({text_col}, '')) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim(COALESCE({text_col}, '')), "
        "'\\s+')) END"
    )
    return (
        f"WITH b AS (SELECT {id_col} AS id, {bucket} AS shard, "
        f"CAST({toks} AS BIGINT) AS tokens FROM {table}), "
        "s AS (SELECT id, shard, tokens, "
        "CAST(SUM(tokens) OVER (PARTITION BY shard ORDER BY id "
        "ROWS UNBOUNDED PRECEDING) - tokens AS BIGINT) AS start FROM b) "
        f"SELECT id, shard, tokens, "
        f"CAST(start // {budget} AS BIGINT) AS seq_id, "
        f"CAST(start % {budget} AS BIGINT) AS seq_off FROM s ORDER BY id"
    )


def domain_mix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain token inventory and the sampling weight that flattens
    the mix to uniform — the knob a pretraining pipeline turns to hit
    a target data mixture (weight > 1: upsample; < 1: downsample).

    share = domain_tokens / total_tokens; weight = (1/n_domains) /
    share. Plan at scale: the groupBy is the only full-data shuffle
    (map-side combined to one row per domain per task); the
    total/count pass is a window over the POST-aggregation frame —
    #domains rows, so the single-partition window is a driver-scale
    triviality, never a data-scale one.
    """
    from pyspark.sql import Window

    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("long")).alias("tokens"),
    )
    wall = Window.partitionBy()
    total = F.sum("tokens").over(wall)
    ndom = F.count("*").over(wall)
    share = F.col("tokens") / total
    return agg.select(
        "source",
        "n_docs",
        "tokens",
        F.round(share, 6).alias("share_r"),
        F.round((F.lit(1.0) / ndom) / share, 6).alias("weight_r"),
    ).orderBy("source")


def domain_mix_sql(
    table: str, source_col: str = "source", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`domain_mix` (same tokenizer, same
    share/weight arithmetic and rounding)."""
    toks = (
        f"CASE WHEN trim(COALESCE({text_col}, '')) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim(COALESCE({text_col}, '')), "
        "'\\s+')) END"
    )
    return (
        f"WITH a AS (SELECT {source_col} AS source, COUNT(*) AS n_docs, "
        f"CAST(SUM(CAST({toks} AS BIGINT)) AS BIGINT) AS tokens "
        f"FROM {table} GROUP BY 1) "
        "SELECT source, n_docs, tokens, "
        "ROUND(tokens / (SUM(tokens) OVER ()), 6) AS share_r, "
        "ROUND((1.0 / (COUNT(*) OVER ())) / "
        "(tokens / (SUM(tokens) OVER ())), 6) AS weight_r "
        "FROM a ORDER BY source"
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    df_cap: int = 50,
    min_len: int = 3,
) -> DataFrame:
    """Inverted index (term -> sorted posting list + document
    frequency) over a corpus — the retrieval-side data structure a
    training pipeline builds for decontamination lookups and corpus
    search.

    Scale shape: per-doc ``array_distinct`` caps each document's vote
    at one; the df aggregation is map-side partial; and the DF-CAP is
    applied BEFORE postings are collected — stopword-grade terms
    (df > cap) never materialize a list, so no collect_list ever
    exceeds ``df_cap`` elements (the same inverted-index df-cap bound
    as dedup.ngram_jaccard). One groupBy + one term-keyed join.
    (term, df, postings) is a deterministic total order: postings are
    array_sort'ed and every surviving list is complete (cap filters
    terms, never truncates lists).
    """
    toks = df.select(
        F.col(id_col).alias("pid"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("term"),
    ).where(F.length("term") >= min_len)
    dfc = (
        toks.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= df_cap))
    )
    return (
        toks.join(dfc, "term")
        .groupBy("term", "df")
        .agg(F.array_sort(F.collect_list("pid")).alias("postings"))
        .select("term", "df", "postings")
    )


def inverted_index_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    df_cap: int = 50,
    min_len: int = 3,
) -> str:
    """DuckDB twin of :func:`inverted_index` (same tokenizer, same
    df-cap-before-collect, same sorted complete postings)."""
    return (
        f"WITH toks AS (SELECT {id_col} AS pid, "
        f"unnest(list_distinct(string_split_regex(lower({text_col}), "
        f"'\\s+'))) AS term FROM {table}), "
        f"t AS (SELECT * FROM toks WHERE length(term) >= {min_len}), "
        "dfc AS (SELECT term, count(*) AS df FROM t GROUP BY term "
        f"HAVING count(*) >= {min_df} AND count(*) <= {df_cap}) "
        "SELECT t.term, any_value(dfc.df) AS df, "
        "list_sort(list(t.pid)) AS postings "
        "FROM t JOIN dfc USING (term) GROUP BY t.term"
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic relevance
    weighting (tf * ln(N / df)) used for keyword extraction, domain
    tagging, and quality heuristics over a web corpus.

    Scale plan: term frequencies and document frequencies are two
    map-side-combining aggregations over the same exploded token
    stream; N is one scalar broadcast (crossJoin of a 1-row agg —
    Catalyst turns it into BroadcastNestedLoopJoin); the per-doc top-k
    is a row_number window over doc_id partitions, never a global
    sort. Ties break (score desc, term asc) — a total order per doc,
    so the k rows are deterministic in both engines.

    Returns (doc_id, term, tf, score), ordered by doc_id, score desc,
    term asc.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df_count")
    )
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs") / F.col("df_count")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "score")
        .orderBy("doc_id", F.desc("score"), "term")
    )


def tfidf_top_terms_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` (same tokenizer, same
    tf * ln(N/df) weight, same (score desc, term asc) tie-break)."""
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(string_split_regex(lower({text_col}), '\s+')) AS term
  FROM {table}
),
tok2 AS (SELECT * FROM toks WHERE term != ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df_count FROM tok2 GROUP BY term),
n AS (SELECT count(DISTINCT {id_col}) AS n_docs FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln(n.n_docs * 1.0 / dfreq.df_count) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, score FROM ranked WHERE rn <= {k}
ORDER BY doc_id, score DESC, term
"""


def mojibake_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encoding-anomaly scoring — the cheap filter a Common-Crawl
    pipeline runs before any model-based quality pass: count U+FFFD
    replacement characters (the scar a mis-declared charset leaves
    after UTF-8 decode) and raw C0 control characters (binary junk
    inside a text field), and flag the document if either appears.

    Pure map-side JVM regex — no shuffle, no Python; at 100 TB this
    fuses into whatever scan already reads the text column.

    Returns (doc_id, n_replacement, n_control, is_suspect),
    order by doc_id.
    """
    repl = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("�"), F.lit(0))
    )
    ctrl = F.size(
        F.regexp_extract_all(
            F.col(text_col),
            F.lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"),
            F.lit(0),
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        repl.alias("n_replacement"),
        ctrl.alias("n_control"),
        ((repl > 0) | (ctrl > 0)).alias("is_suspect"),
    ).orderBy("doc_id")


def mojibake_score_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`mojibake_score` (same patterns; chr(65533)
    is U+FFFD so the SQL string stays pure ASCII)."""
    return rf"""
SELECT {id_col} AS doc_id,
       len(regexp_extract_all({text_col}, chr(65533))) AS n_replacement,
       len(regexp_extract_all({text_col}, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS n_control,
       (len(regexp_extract_all({text_col}, chr(65533))) > 0
        OR len(regexp_extract_all({text_col}, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) > 0)
       AS is_suspect
FROM {table} ORDER BY doc_id
"""


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    salt: str = "cap-v1",
) -> DataFrame:
    """Per-domain document cap — the anti-monoculture step of crawl
    curation: keep at most ``cap`` documents per domain, chosen by a
    deterministic salted-hash priority (NOT first-seen order, which
    would bias toward crawl order; the salt versions the draw so a
    re-run or backfill keeps the SAME survivors).

    Scale plan: one shuffle on domain; the rn<=cap filter is a window
    group limit — Spark's WindowGroupLimit pushes the top-k below the
    exchange (per-partition partial top-k before the shuffle), so a
    100M-page domain ships ~cap rows per input partition, not 100M.
    Priority = md5(salt:id) with id as tiebreak — a total order, so
    both engines pick identical survivors.

    Returns (doc_id, domain, priority_rank), order by domain, rank.
    """
    from pyspark.sql import Window

    pri = F.md5(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("domain").orderBy(F.col("pri"), F.col("doc_id"))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(domain_col).alias("domain"),
            pri.alias("pri"),
        )
        .withColumn("priority_rank", F.row_number().over(w))
        .where(F.col("priority_rank") <= cap)
        .select("doc_id", "domain", "priority_rank")
        .orderBy("domain", "priority_rank")
    )


def domain_cap_sql(
    table: str,
    domain_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    salt: str = "cap-v1",
) -> str:
    """DuckDB twin of :func:`domain_cap` (same salted md5 priority,
    same total order, same cap)."""
    return f"""
WITH p AS (
  SELECT {id_col} AS doc_id, {domain_col} AS domain,
         md5('{salt}:' || CAST({id_col} AS VARCHAR)) AS pri
  FROM {table}
),
r AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY pri, doc_id)
         AS priority_rank
  FROM p
)
SELECT doc_id, domain, priority_rank FROM r
WHERE priority_rank <= {cap} ORDER BY domain, priority_rank
"""


def bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus bigram language model — the classic n-gram statistic
    behind perplexity-style quality filters and contamination probes:
    conditional probability P(w2 | w1) = c(w1,w2) / c(w1,·) over every
    adjacent token pair.

    Scale plan: bigrams reuse :func:`orc_spark.textops.dedup.shingles`
    (JVM higher-order functions — no Python); ONE map-side-combining
    shuffle for the pair counts; the left-context total is a window
    sum over the w1 partition — the pair-count table is already
    grouped, so the window input is vocab²-bounded, tiny next to the
    corpus. min_count filters AFTER totals, so probabilities stay
    exact over the full distribution.

    Returns (w1, w2, c, prob), order by w1, w2.
    """
    from pyspark.sql import Window

    from orc_spark.textops.dedup import shingles

    bg = df.select(
        F.explode(shingles(text_col, 2)).alias("bg")
    ).where(F.col("bg").rlike(r"^\S+ \S+$"))
    pairs = bg.select(
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("w1")
    return (
        counts.withColumn("prob", F.col("c") / F.sum("c").over(w))
        .where(F.col("c") >= min_count)
        .select("w1", "w2", "c", "prob")
        .orderBy("w1", "w2")
    )


def bigram_lm_sql(
    table: str,
    text_col: str = "text",
    min_count: int = 5,
) -> str:
    """DuckDB twin of :func:`bigram_lm` (same tokenizer/shingler, same
    windowed totals, same post-total min_count filter). The rlike
    guard on the Spark side only rejects sub-2-token documents (whose
    whole-text fallback shingle has no space); the twin applies the
    same len(t) >= 2 condition directly."""
    return rf"""
WITH toks AS (
  SELECT string_split_regex(lower({text_col}), '\s+') AS t FROM {table}
),
pairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
counts AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2),
tot AS (
  SELECT w1, w2, c, c * 1.0 / sum(c) OVER (PARTITION BY w1) AS prob
  FROM counts
)
SELECT w1, w2, c, prob FROM tot WHERE c >= {min_count} ORDER BY w1, w2
"""


# Gopher-style rule filter (public DeepMind Gopher / RedPajama rule
# set; the canonical stopword octet from the paper)
GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Rule-based document filter after the public Gopher quality
    rules (word-count window, mean word length, symbol ratio, bullet/
    ellipsis line ratios, alphabetic-word ratio, stopword presence).

    Every feature is a JVM column expression (split + higher-order
    filters) — zero Python, zero shuffle; ``keep`` is the AND of all
    rules so the filter composes as one map-only stage at 100 TB.
    The alpha rule uses [A-Za-z] (as published) — non-Latin scripts
    fail it by design; route those through language_id first."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    tr = F.trim(t)
    toks = F.split(tr, r"\s+")
    n_words = F.when(F.length(tr) == 0, F.lit(0)).otherwise(F.size(toks))
    nw1 = F.greatest(n_words, F.lit(1))
    mean_wl = F.length(F.regexp_replace(tr, r"\s+", "")) / nw1
    hash_cnt = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    ell_cnt = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), F.lit(0)))
    symbol_ratio = (hash_cnt + ell_cnt) / nw1
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_ratio = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
        / n_lines
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
        / n_lines
    )
    alpha_ratio = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))) / nw1
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOP])
    stop_hits = F.size(
        F.filter(toks, lambda w: F.array_contains(stop_arr, F.lower(w)))
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_ratio <= max_bullet_ratio)
        & (ellipsis_ratio <= max_ellipsis_ratio)
        & (alpha_ratio >= min_alpha_word_ratio)
        & (stop_hits >= min_stop_hits)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def gopher_rules_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> str:
    """DuckDB twin of :func:`gopher_rules` (same rules, same unrounded
    comparisons; thresholds are exact doubles from small-int ratios so
    keep cannot drift across engines)."""
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOP)
    return (
        rf"WITH f AS (SELECT {id_col} AS id, COALESCE({text_col},'') AS t, "
        rf"TRIM(COALESCE({text_col},'')) AS tr FROM {table}), "
        r"g AS (SELECT id, t, tr, "
        r"CASE WHEN LENGTH(tr)=0 THEN 0 ELSE len(string_split_regex(tr, '\s+')) END AS n_words, "
        r"string_split_regex(tr, '\s+') AS toks, "
        r"string_split(t, chr(10)) AS lines FROM f), "
        r"h AS (SELECT id, n_words, GREATEST(n_words, 1) AS nw1, "
        r"LENGTH(regexp_replace(tr, '\s+', '', 'g')) AS nonspace, "
        r"LENGTH(t) - LENGTH(replace(t, '#', '')) AS hash_cnt, "
        r"len(regexp_extract_all(t, '\.\.\.|…')) AS ell_cnt, "
        r"GREATEST(len(lines), 1) AS n_lines, "
        r"len(list_filter(lines, l -> regexp_matches(TRIM(l), '^[-*•]'))) AS bullet_lines, "
        r"len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS ell_lines, "
        r"len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words, "
        rf"len(list_filter(toks, w -> list_contains([{stops}], lower(w)))) AS stop_hits "
        r"FROM g) "
        r"SELECT id, n_words, "
        r"ROUND(nonspace * 1.0 / nw1, 6) AS mean_word_len, "
        r"ROUND((hash_cnt + ell_cnt) * 1.0 / nw1, 6) AS symbol_ratio, "
        r"ROUND(bullet_lines * 1.0 / n_lines, 6) AS bullet_ratio, "
        r"ROUND(ell_lines * 1.0 / n_lines, 6) AS ellipsis_ratio, "
        r"ROUND(alpha_words * 1.0 / nw1, 6) AS alpha_word_ratio, stop_hits, "
        rf"(n_words BETWEEN {min_words} AND {max_words}) "
        r"AND (nonspace * 1.0 / nw1 BETWEEN 3.0 AND 10.0) "
        r"AND ((hash_cnt + ell_cnt) * 1.0 / nw1 <= 0.1) "
        r"AND (bullet_lines * 1.0 / n_lines <= 0.9) "
        r"AND (ell_lines * 1.0 / n_lines <= 0.3) "
        r"AND (alpha_words * 1.0 / nw1 >= 0.8) "
        r"AND stop_hits >= 2 AS keep "
        r"FROM h ORDER BY id"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split long documents into fixed-size overlapping token windows
    (the context-window chunking a training/RAG pipeline runs before
    embedding or packing).

    Map-only: split + sequence + explode + slice, all JVM expressions,
    zero shuffle — each task chunks its own documents, so the operator
    scales linearly with corpus bytes at 100 TB. Window starts step by
    ``chunk - overlap``; the final window may be shorter (never
    empty). Output grows by ~n_tokens/(chunk-overlap) rows per doc."""
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    step = chunk - overlap
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    base = (
        df.select(F.col(id_col).alias("id"), F.split(t, r"\s+").alias("toks"))
        .where(F.length(t) > 0)
    )
    exploded = base.select(
        "id",
        F.size("toks").alias("n"),
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(step))
        ).alias("chunk_start"),
    )
    return exploded.select(
        "id",
        "chunk_start",
        F.least(F.lit(chunk), F.col("n") - F.col("chunk_start")).alias(
            "chunk_tokens"
        ),
        F.array_join(
            F.slice("toks", F.col("chunk_start") + 1, chunk), " "
        ).alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 64,
    overlap: int = 8,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (range(0, n, step) ==
    sequence(0, n-1, step) for positive step; 1-based inclusive list
    slices match Spark's slice(start, length))."""
    step = chunk - overlap
    return (
        rf"WITH toks AS (SELECT {id_col} AS id, "
        rf"string_split_regex(TRIM(COALESCE({text_col},'')), '\s+') AS t "
        rf"FROM {table} WHERE LENGTH(TRIM(COALESCE({text_col},''))) > 0), "
        rf"st AS (SELECT id, t, len(t) AS n, "
        rf"unnest(range(0, len(t), {step})) AS chunk_start FROM toks) "
        rf"SELECT id, chunk_start, "
        rf"LEAST({chunk}, n - chunk_start) AS chunk_tokens, "
        rf"array_to_string(t[chunk_start + 1 : chunk_start + {chunk}], ' ') "
        r"AS chunk_text FROM st ORDER BY id, chunk_start"
    )


# Power-of-2 token-length bucket floors, shared by the Spark and SQL
# sides so the CASE ladders cannot drift (integer comparisons only —
# no cross-engine log2/floor float hazard).
LENGTH_BUCKET_FLOORS = [0, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


def length_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token-length histogram over power-of-2 buckets — the batching
    report a padding-efficient training loader plans from (docs per
    bucket, token inventory, mean length).

    One map-side-combined groupBy over ≤len(LENGTH_BUCKET_FLOORS)
    groups; the CASE ladder is integer-only so the bucket id is
    bit-portable across engines."""
    n_tok = token_count(F.col(text_col))
    bucket = F.lit(LENGTH_BUCKET_FLOORS[0])
    for lo in LENGTH_BUCKET_FLOORS[1:]:
        bucket = F.when(n_tok >= lo, F.lit(lo)).otherwise(bucket)
    return (
        df.select(bucket.alias("bucket_lo"), n_tok.alias("n_tok"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
        )
    )


def length_buckets_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`length_buckets`, CASE ladder generated
    from the same LENGTH_BUCKET_FLOORS."""
    ladder = "CASE "
    for lo in reversed(LENGTH_BUCKET_FLOORS[1:]):
        ladder += f"WHEN n_tok >= {lo} THEN {lo} "
    ladder += f"ELSE {LENGTH_BUCKET_FLOORS[0]} END"
    return (
        rf"WITH f AS (SELECT CASE WHEN TRIM(COALESCE({text_col},'')) = '' "
        rf"THEN 0 ELSE len(string_split_regex(TRIM(COALESCE({text_col},'')), "
        rf"'\s+')) END AS n_tok FROM {table}) "
        rf"SELECT {ladder} AS bucket_lo, COUNT(*) AS n_docs, "
        r"CAST(SUM(n_tok) AS BIGINT) AS total_tokens, "
        r"ROUND(AVG(n_tok), 6) AS avg_tokens "
        r"FROM f GROUP BY 1 ORDER BY bucket_lo"
    )


def nfc_normalize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization (NFC by default) — the canonicalization a
    dedup/tokenize stage runs so that composed and decomposed encodings
    of the same glyph hash identically.

    Spark has no NFC builtin, so this is the deliberate vectorized
    Pandas-UDF path (Arrow batches; per-batch ``str`` map over C
    strings — no per-row Python round trips through the JVM). Map-only,
    zero shuffle."""
    import pandas as pd  # noqa: F401 (signature type only)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if isinstance(x, str)
            else x
        )

    t = F.col(text_col)
    out = _norm(t)
    return df.select(
        F.col(id_col).alias("id"),
        out.alias("text_nfc"),
        F.coalesce(out != t, F.lit(False)).alias("changed"),
    )


def nfc_normalize_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`nfc_normalize` (DuckDB's nfc_normalize is
    the same Unicode NFC the Python unicodedata tables implement)."""
    return (
        f"SELECT {id_col} AS id, nfc_normalize({text_col}) AS text_nfc, "
        f"COALESCE(nfc_normalize({text_col}) <> {text_col}, FALSE) AS changed "
        f"FROM {table} ORDER BY id"
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (public algorithm: Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — semantics only, not a port): hash
    every k-token gram, slide a w-gram window, keep each window's
    minimum hash. Guarantees any shared token run of length >= k+w-1
    shares at least one fingerprint — the plagiarism/near-dup detector
    with a density bound (~2/(w+1)) that random sampling lacks.

    Pure JVM column algebra (split + sequence + transform + slice +
    array_min), map-only, zero Python, zero shuffle; output is one row
    per (doc, distinct fingerprint). The md5-prefix hash is the same
    portable arithmetic as hash_split, so the twin is bit-identical."""
    toks_expr = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    base = df.select(
        F.col(id_col).alias("id"), toks_expr.alias("toks")
    ).where(F.size(toks_expr) >= k)
    n = F.size(F.col("toks"))
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(F.col("toks"), i + 1, k), " ")),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
    )
    g = base.select("id", grams.alias("grams"))
    n_g = F.size(F.col("grams"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_g - w, F.lit(0))),
            lambda i: F.array_min(F.slice(F.col("grams"), i + 1, w)),
        )
    )
    return g.select("id", F.explode(fps).alias("fp"))


def winnow_fingerprints_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (same md5-prefix
    arithmetic; list_distinct orders differently than array_distinct
    but the compare is a row multiset)."""
    return (
        rf"WITH t AS (SELECT {id_col} AS id, "
        rf"string_split_regex(lower(trim(COALESCE({text_col},''))), '\s+') AS toks "
        rf"FROM {table}), "
        rf"g AS (SELECT id, toks, len(toks) AS n FROM t WHERE len(toks) >= {k}), "
        rf"h AS (SELECT id, list_transform(range(0, n - {k} + 1), i -> "
        rf"('0x' || substr(md5(array_to_string(toks[i+1 : i+{k}], ' ')), 1, 8))::BIGINT) "
        r"AS grams FROM g), "
        rf"m AS (SELECT id, list_distinct(list_transform("
        rf"range(0, GREATEST(len(grams) - {w}, 0) + 1), i -> "
        rf"list_min(grams[i+1 : i+{w}]))) AS fps FROM h) "
        r"SELECT id, unnest(fps) AS fp FROM m ORDER BY id, fp"
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 document ranking for a bag-of-terms query (public Robertson
    BM25 with the Lucene +1 idf form, so idf stays positive for
    df > N/2).

    Scale shape: one map-side pass computes per-doc tf for each query
    term; the corpus stats (N, avgdl, per-term df) reduce to ONE row
    broadcast back via cross-join — no per-term shuffle, no global
    sort; top-k lands in TakeOrderedAndProject (per-partition heap +
    k-row driver merge)."""
    terms = [t.lower() for t in query_terms]
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    def _tf(term):
        # NB: a 2-arg lambda in F.filter means (element, index) to
        # Spark — capture the term via closure, never a default arg
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)]
    dl = F.when(F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0,
                F.lit(0)).otherwise(F.size(toks))
    per_doc = df.select(
        F.col(id_col).alias("id"), dl.alias("dl"), *tf_cols
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        tf = F.col(f"tf_{i}")
        part = idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    ranked = joined.select(
        "id", F.round(score, 6).alias("bm25")
    ).where(F.col("bm25") > 0)
    return ranked.orderBy(F.col("bm25").desc(), F.col("id")).limit(k)


def bm25_rank_sql(
    table: str,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_rank` (same tf/df/idf arithmetic in
    the same operation order; ln and IEEE doubles agree bit-for-bit
    on identical inputs)."""
    terms = [t.lower() for t in query_terms]
    tf_exprs = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score_parts = " + ".join(
        f"(ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0) "
        f"* (tf_{i} * ({k1} + 1)) / "
        f"(tf_{i} + {k1} * (1 - {b} + {b} * dl / avgdl)))"
        for i in range(len(terms))
    )
    return (
        rf"WITH d AS (SELECT {id_col} AS id, "
        rf"string_split_regex(lower(trim(COALESCE({text_col},''))), '\s+') AS toks, "
        rf"CASE WHEN LENGTH(trim(COALESCE({text_col},''))) = 0 THEN 0 "
        rf"ELSE len(string_split_regex(lower(trim(COALESCE({text_col},''))), '\s+')) END AS dl "
        rf"FROM {table}), "
        rf"p AS (SELECT id, dl, {tf_exprs} FROM d), "
        rf"s AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_exprs} FROM p), "
        rf"r AS (SELECT id, ROUND({score_parts}, 6) AS bm25 FROM p CROSS JOIN s) "
        rf"SELECT id, bm25 FROM r WHERE bm25 > 0 "
        rf"ORDER BY bm25 DESC, id LIMIT {k}"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (public Cormack/Clarke/Buettcher,
    SIGIR'09): merge N ranked candidate lists into one by summing
    1/(k + rank) per document — the standard hybrid-retrieval combiner
    (BM25 x dense ANN x quality priors). Rank-based, so incomparable
    score scales fuse without normalization; k=60 is the paper's
    constant. Each input is a 2-column frame (id, score); rank is
    ROW_NUMBER by (score desc, id) — a deterministic total order.

    Scale shape: the inputs are already top-k' lists (bounded by
    construction — TakeOrderedAndProject in the rankers), so the
    single-partition rank windows and the full-outer id join here run
    over k'-row frames; the 100 TB work lives in the rankers, never in
    the fusion."""
    from pyspark.sql import Window

    ranked = []
    for i, df in enumerate(rankings):
        score_col = [c for c in df.columns if c != id_col][0]
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        ranked.append(
            df.select(
                F.col(id_col), F.row_number().over(w).alias(f"_r{i}")
            )
        )
    out = ranked[0]
    for r in ranked[1:]:
        out = out.join(r, id_col, "full_outer")
    contrib = None
    for i in range(len(ranked)):
        c = F.when(F.col(f"_r{i}").isNull(), F.lit(0.0)).otherwise(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"_r{i}"))
        )
        contrib = c if contrib is None else contrib + c
    return (
        out.select(F.col(id_col), F.round(contrib, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(top)
    )


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The repetition section of the public Gopher rules: the fraction
    of a document's n-gram occurrences whose n-gram repeats WITHIN the
    document (boilerplate loops, keyword stuffing, degenerate
    generations score high).

    One (id, gram)-keyed map-side-combining shuffle — per-doc work is
    bounded by document length, the aggregate carries one row per
    distinct in-doc gram, so no key can exceed a single document's
    gram count; safe under any corpus skew at 100 TB."""
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    base = df.select(F.col(id_col).alias("id"), grams.alias("grams")).where(
        F.size(toks) >= n
    )
    exploded = base.select("id", F.explode("grams").alias("g"))
    per_gram = exploded.groupBy("id", "g").agg(F.count("*").alias("c"))
    return (
        per_gram.groupBy("id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dup_grams"
            ),
        )
        .select(
            "id",
            "n_grams",
            "dup_grams",
            F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias(
                "dup_fraction"
            ),
        )
    )


def gopher_repetition_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> str:
    """DuckDB twin of :func:`gopher_repetition` (same tokenizer and
    gram windows, same count arithmetic)."""
    return (
        rf"WITH t AS (SELECT {id_col} AS id, "
        rf"string_split_regex(lower(trim(COALESCE({text_col},''))), '\s+') AS toks "
        rf"FROM {table}), "
        rf"g AS (SELECT id, list_transform(range(0, len(toks) - {n} + 1), "
        rf"i -> array_to_string(toks[i+1 : i+{n}], ' ')) AS grams "
        rf"FROM t WHERE len(toks) >= {n}), "
        r"e AS (SELECT id, unnest(grams) AS gr FROM g), "
        r"c AS (SELECT id, gr, COUNT(*) AS c FROM e GROUP BY id, gr), "
        r"a AS (SELECT id, CAST(SUM(c) AS BIGINT) AS n_grams, "
        r"CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_grams "
        r"FROM c GROUP BY id) "
        r"SELECT id, n_grams, dup_grams, "
        r"ROUND(dup_grams * 1.0 / n_grams, 6) AS dup_fraction "
        r"FROM a ORDER BY id"
    )


def json_extract_props(
    df: DataFrame,
    json_col: str = "props",
    paths: dict[str, str] | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Typed field extraction from a JSON-string column (crawl records
    carry JSON sidecar metadata — fetch headers, scores, labels).

    ``paths`` maps output name -> JSONPath. get_json_object is a JVM
    expression (Jackson under codegen) — map-only, zero Python, zero
    shuffle; malformed JSON and missing paths yield null, never an
    error (the 100 TB posture: bad records degrade, not abort)."""
    paths = paths or {"k": "$.k"}
    cols = [F.col(id_col).alias("id")]
    for name, path in paths.items():
        cols.append(
            F.get_json_object(F.col(json_col), path).alias(name)
        )
    return df.select(*cols)


def json_extract_props_sql(
    table: str,
    json_col: str = "props",
    paths: dict[str, str] | None = None,
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`json_extract_props` (json_extract_string
    matches get_json_object's string-typed nulls-on-missing)."""
    paths = paths or {"k": "$.k"}
    sel = ", ".join(
        f"json_extract_string({json_col}, '{path}') AS {name}"
        for name, path in paths.items()
    )
    return f"SELECT {id_col} AS id, {sel} FROM {table} ORDER BY id"


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    degenerate-text detector: keyboard mashing, single-char floods,
    and base64 blobs sit far from natural language's ~4 bits.

    One (id, char)-keyed map-side-combining shuffle; per-key rows are
    bounded by the alphabet, per-doc rows by distinct chars. Entropy
    via ln(n) - Σ c·ln(c)/n, one pass over the counts."""
    chars = F.regexp_extract_all(
        F.col(text_col), F.lit("(?s)."), F.lit(0)
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(chars).alias("ch")
    )
    counts = exploded.groupBy("id", "ch").agg(F.count("*").alias("c"))
    n = F.sum("c")
    ent_nats = F.log(n) - F.sum(F.col("c") * F.log("c")) / n
    return counts.groupBy("id").agg(
        n.alias("n_chars"),
        F.round(ent_nats / float(__import__("math").log(2)), 6).alias(
            "entropy_bits"
        ),
    )


def char_entropy_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`char_entropy` (same (?s). extraction,
    same ln-based formula and operation order)."""
    return (
        rf"WITH e AS (SELECT {id_col} AS id, "
        rf"unnest(regexp_extract_all({text_col}, '(?s).')) AS ch FROM {table}), "
        r"c AS (SELECT id, ch, COUNT(*) AS c FROM e GROUP BY id, ch) "
        r"SELECT id, CAST(SUM(c) AS BIGINT) AS n_chars, "
        r"ROUND((ln(SUM(c)) - SUM(c * ln(c)) / SUM(c)) / ln(2.0), 6) "
        r"AS entropy_bits FROM c GROUP BY id ORDER BY id"
    )


def perplexity_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    floor: float = 1e-6,
) -> DataFrame:
    """Pseudo-perplexity quality filter (the CCNet-style signal): score
    each document by the corpus bigram LM — exp of the average
    negative log-probability of its adjacent token pairs; repetitive
    boilerplate scores low, rare-junk scores high.

    Scale plan: the LM is the vocab²-bounded :func:`bigram_lm` table,
    broadcast to the doc-bigram join (the 100 TB side never shuffles
    on the pair key for the join); unseen pairs take the ``floor``
    probability. One pair-count shuffle (the LM build) + one doc-keyed
    aggregation."""
    model = bigram_lm(df, text_col, min_count).select("w1", "w2", "prob")
    from orc_spark.textops.dedup import shingles

    bg = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, 2)).alias("bg"),
    ).where(F.col("bg").rlike(r"^\S+ \S+$"))
    pairs = bg.select(
        "id",
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    joined = pairs.join(F.broadcast(model), ["w1", "w2"], "left")
    p = F.coalesce(F.col("prob"), F.lit(floor))
    avg_nll = -F.avg(F.log(p))
    return joined.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(avg_nll, 6).alias("avg_neg_logp"),
        F.round(F.exp(avg_nll), 6).alias("pseudo_ppl"),
    )


def perplexity_score_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    floor: float = 1e-6,
) -> str:
    """DuckDB twin of :func:`perplexity_score` (same tokenizer, same
    LM CTEs as bigram_lm_sql, same floor and op order)."""
    return rf"""
WITH toks AS (
  SELECT string_split_regex(lower({text_col}), '\s+') AS t FROM {table}
),
cpairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
counts AS (SELECT w1, w2, count(*) AS c FROM cpairs GROUP BY w1, w2),
model AS (
  SELECT w1, w2, c * 1.0 / sum(c) OVER (PARTITION BY w1) AS prob
  FROM counts QUALIFY c >= {min_count}
),
dbg AS (
  SELECT {id_col} AS id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT {id_col}, string_split_regex(lower({text_col}), '\s+') AS t
        FROM {table}) x,
       unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
j AS (
  SELECT id, COALESCE(m.prob, {floor}) AS p
  FROM dbg LEFT JOIN model m USING (w1, w2)
)
SELECT id, COUNT(*) AS n_bigrams,
  ROUND(-AVG(ln(p)), 6) AS avg_neg_logp,
  ROUND(exp(-AVG(ln(p))), 6) AS pseudo_ppl
FROM j GROUP BY id ORDER BY id
"""


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled domain sampling (the public XLM/mT5
    multilingual-balancing rule): sampling probability q_i ∝ p_i^alpha
    where p_i is the domain's token share. alpha=1 keeps the natural
    mix, alpha→0 flattens to uniform; the per-document resample weight
    is q_i/p_i.

    Same plan shape as domain_mix: ONE map-side-combined groupBy over
    the corpus; the power/normalize pass runs over #domains rows."""
    from pyspark.sql import Window

    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(F.col(text_col)).cast("long")).alias("tokens"),
    )
    wall = Window.partitionBy()
    p = F.col("tokens") / F.sum("tokens").over(wall)
    q = F.pow(p, F.lit(alpha)) / F.sum(F.pow(p, F.lit(alpha))).over(wall)
    return agg.select(
        "source",
        "tokens",
        F.round(p, 6).alias("p_natural"),
        F.round(q, 6).alias("q_sampled"),
        F.round(q / p, 6).alias("resample_weight"),
    ).orderBy("source")


def temperature_weights_sql(
    table: str,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
) -> str:
    """DuckDB twin of :func:`temperature_weights` (same token count,
    same pow/normalize op order)."""
    return (
        rf"WITH a AS (SELECT {source_col} AS source, "
        rf"CAST(SUM(CASE WHEN TRIM(COALESCE({text_col},'')) = '' THEN 0 ELSE "
        rf"len(string_split_regex(TRIM({text_col}), '\s+')) END) AS BIGINT) AS tokens "
        rf"FROM {table} GROUP BY 1), "
        r"p AS (SELECT source, tokens, "
        r"tokens * 1.0 / SUM(tokens) OVER () AS p FROM a), "
        rf"w AS (SELECT source, tokens, p, "
        rf"pow(p, {alpha}) / SUM(pow(p, {alpha})) OVER () AS q FROM p) "
        r"SELECT source, tokens, ROUND(p, 6) AS p_natural, "
        r"ROUND(q, 6) AS q_sampled, ROUND(q / p, 6) AS resample_weight "
        r"FROM w ORDER BY source"
    )


def curation_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
) -> DataFrame:
    """The end-to-end admission decision a curation pipeline makes per
    document, composed from this module's gates in fixed precedence:

    1. ``dup``      — not the exact-content keeper (lowest id per sha
                      keeps; later copies reject);
    2. ``mojibake`` — encoding anomalies (U+FFFD / raw C0 controls);
    3. ``gopher``   — the Gopher rule conjunction;
    4. ``ok``       — admitted.

    One content-hash shuffle (the dedup window); every other gate is
    map-side, so the composition costs the same single shuffle as
    exact dedup alone — gates FUSE, they don't multiply passes."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)).orderBy(
        F.col(id_col)
    )
    g = gopher_rules(df, text_col, id_col, min_words=min_words).select(
        F.col("id"), F.col("keep").alias("_gopher_ok")
    )
    m = mojibake_score(df, text_col, id_col).select(
        F.col("doc_id").alias("id"), (~F.col("is_suspect")).alias("_moji_ok")
    )
    base = df.select(
        F.col(id_col).alias("id"),
        (F.row_number().over(w) == 1).alias("_dedup_ok"),
    )
    out = base.join(m, "id").join(g, "id")
    reason = (
        F.when(~F.col("_dedup_ok"), F.lit("dup"))
        .when(~F.col("_moji_ok"), F.lit("mojibake"))
        .when(~F.col("_gopher_ok"), F.lit("gopher"))
        .otherwise(F.lit("ok"))
    )
    return out.select(
        "id",
        (reason == "ok").alias("keep"),
        reason.alias("reject_reason"),
    )


def curation_pipeline_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
) -> str:
    """DuckDB twin of :func:`curation_pipeline`, composing the same
    gates' twins with the same precedence."""
    gopher = gopher_rules_sql(table, text_col, id_col, min_words=min_words)
    moji = mojibake_score_sql(table)
    return (
        rf"WITH d AS (SELECT {id_col} AS id, "
        rf"row_number() OVER (PARTITION BY sha256(COALESCE({text_col},'')) "
        rf"ORDER BY {id_col}) = 1 AS dedup_ok FROM {table}), "
        rf"g AS ({gopher}), m AS ({moji}), "
        r"j AS (SELECT d.id, d.dedup_ok, NOT m.is_suspect AS moji_ok, "
        r"g.keep AS gopher_ok FROM d "
        r"JOIN m ON m.doc_id = d.id JOIN g ON g.id = d.id) "
        r"SELECT id, "
        r"CASE WHEN NOT dedup_ok THEN 'dup' WHEN NOT moji_ok THEN 'mojibake' "
        r"WHEN NOT gopher_ok THEN 'gopher' ELSE 'ok' END = 'ok' AS keep, "
        r"CASE WHEN NOT dedup_ok THEN 'dup' WHEN NOT moji_ok THEN 'mojibake' "
        r"WHEN NOT gopher_ok THEN 'gopher' ELSE 'ok' END AS reject_reason "
        r"FROM j ORDER BY id"
    )


def dsir_weights(
    df: DataFrame,
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, public method;
    implementation ours): score every document by the log-likelihood
    ratio of its hashed n-gram features under the TARGET distribution
    (rows where ``target_col`` is true) vs the RAW distribution (the
    whole corpus). Documents that look like the target get positive
    scores — the selection signal for importance resampling of
    pretraining data toward a quality/domain target.

    Features are unigrams + bigrams hashed into ``n_buckets`` via the
    engine-portable md5 bucket (same arithmetic as corpus_split), so
    the DuckDB twin reproduces every bucket id exactly. Laplace
    ``smoothing`` keeps unseen buckets finite. Plan shape: one explode
    + two map-side-combined bucket aggregations (≤ n_buckets rows
    each); the log-ratio table broadcasts to the per-doc sum — the
    only corpus-size shuffle is the (id, bucket)-keyed doc fold.

    Returns (id, n_grams, dsir_logratio rounded to 6) per document.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.concat(
        toks,
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
            ),
        ).otherwise(F.array()),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )
    ex = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(target_col).cast("boolean").alias("_t"),
            F.explode(grams).alias("gram"),
        )
        .filter(F.col("gram") != "")
        .select("id", "_t", bucket.alias("b"))
    )
    raw = ex.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = ex.filter(F.col("_t")).groupBy("b").agg(
        F.count(F.lit(1)).alias("c_tgt")
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    s = float(smoothing)
    lr = (
        raw.join(tgt, "b", "left")
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(s))
                    / (F.sum(F.coalesce("c_tgt", F.lit(0))).over(wall)
                       + F.lit(s * n_buckets))
                )
                - F.log(
                    (F.col("c_raw") + F.lit(s))
                    / (F.sum("c_raw").over(wall) + F.lit(s * n_buckets))
                )
            ).alias("lr"),
        )
    )
    return (
        ex.join(F.broadcast(lr), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("lr"), 6).alias("dsir_logratio"),
        )
        .select(F.col("id").alias(id_col), "n_grams", "dsir_logratio")
        .orderBy(id_col)
    )


def dsir_weights_sql(
    table: str,
    target_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
) -> str:
    """DuckDB twin of :func:`dsir_weights` (identical tokenizer,
    bucket hash, smoothing, and op order)."""
    s = float(smoothing)
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id, ({target_expr}) AS t,
         string_split_regex(TRIM(lower({text_col})), '\s+') AS w
  FROM {table}
),
grams AS (
  SELECT id, t, unnest(
    list_concat(
      w,
      CASE WHEN len(w) >= 2 THEN
        list_transform(generate_series(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i + 1])
      ELSE [] END
    )
  ) AS gram
  FROM toks
),
ex AS (
  SELECT id, t,
         (('0x' || substr(md5(gram), 1, 8))::BIGINT % {n_buckets}) AS b
  FROM grams WHERE gram <> ''
),
raw AS (SELECT b, COUNT(*) AS c_raw FROM ex GROUP BY 1),
tgt AS (SELECT b, COUNT(*) AS c_tgt FROM ex WHERE t GROUP BY 1),
lr AS (
  SELECT raw.b,
         ln((COALESCE(c_tgt, 0) + {s}) /
            (SUM(COALESCE(c_tgt, 0)) OVER () + {s} * {n_buckets}))
         - ln((c_raw + {s}) / (SUM(c_raw) OVER () + {s} * {n_buckets}))
         AS lr
  FROM raw LEFT JOIN tgt USING (b)
)
SELECT ex.id AS {id_col}, COUNT(*) AS n_grams,
       ROUND(SUM(lr.lr), 6) AS dsir_logratio
FROM ex JOIN lr ON ex.b = lr.b
GROUP BY 1 ORDER BY 1
"""


_SCRIPTS = [
    # (name, Java/ICU class for Spark, RE2 class for DuckDB)
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
]


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    clean_ratio: float = 0.05,
) -> DataFrame:
    """Unicode-script composition per document — the script-level
    sibling of :func:`language_id` that CC pipelines run BEFORE any
    language model: per-script character counts (Latin, Cyrillic, Han,
    Arabic), the dominant script (max count; ties break alphabetically;
    'none' when no scripted character appears), and a clean-single-
    script flag (every non-dominant scripted character under
    ``clean_ratio`` of scripted chars) that catches mixed-script spam
    and mojibake that byte-level heuristics miss.

    Scale plan: pure JVM regexp_count expressions (one pass per script
    class inside whole-stage codegen), zero shuffles, zero Python —
    map-only like token_stats. Reference parity: the reference has no
    data plane; semantics follow CCNet/fastText-style script filters.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(java_cls)).alias(f"n_{name}")
        for name, java_cls, _ in _SCRIPTS
    ]
    out = df.select(F.col(id_col).alias("doc_id"), *counts)
    names = [n for n, _, _ in _SCRIPTS]
    greatest = F.greatest(*[F.col(f"n_{n}") for n in names])
    dom = F.lit("none")
    for n in sorted(names, reverse=True):
        dom = F.when(
            (greatest > 0) & (F.col(f"n_{n}") == greatest), F.lit(n)
        ).otherwise(dom)
    total = sum(F.col(f"n_{n}") for n in names)
    clean = (greatest > 0) & (
        (total - greatest) <= F.lit(clean_ratio) * total
    )
    return (
        out.withColumn("dominant", dom)
        .withColumn("clean_script", clean)
        .orderBy("doc_id")
    )


def script_profile_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id",
    clean_ratio: float = 0.05,
) -> str:
    """DuckDB twin of :func:`script_profile` (RE2 script classes; same
    counts, dominance rule, tie-break, and clean flag)."""
    cnt = {
        name: f"len(regexp_extract_all({text_col}, '{re2}'))"
        for name, _, re2 in _SCRIPTS
    }
    names = sorted(cnt)  # alphabetical tie-break: first match wins
    sel = ",\n       ".join(f"{cnt[n]} AS n_{n}" for n, _, _ in _SCRIPTS)
    greatest = "GREATEST(" + ", ".join(f"n_{n}" for n in cnt) + ")"
    dom_cases = "\n         ".join(
        f"WHEN n_{n} = g AND g > 0 THEN '{n}'" for n in names
    )
    total = " + ".join(f"n_{n}" for n in cnt)
    return f"""
WITH c AS (
  SELECT {id_col} AS doc_id,
       {sel}
  FROM {table}
),
g AS (SELECT *, {greatest} AS g, {total} AS total FROM c)
SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic,
       CASE {dom_cases} ELSE 'none' END AS dominant,
       (g > 0 AND (total - g) <= {clean_ratio} * total) AS clean_script
FROM g ORDER BY doc_id
"""


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document — the readability gate some
    curation pipelines layer over gopher_rules (very low scores flag
    keyword-stuffed or machine-generated pages). Words are whitespace
    tokens, sentences are [.!?]+ runs (floored at 1 so punctuation-free
    fragments still score), syllables are approximated by [aeiouy]+
    vowel groups — the standard cheap estimator; both engines run the
    identical regexps so scores are bit-comparable.

    score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Scale plan: three JVM regexp_count expressions in one codegen
    stage, zero shuffles, zero Python — map-only like token_stats.
    """
    t = F.col(text_col)
    words = F.greatest(
        F.lit(1), F.size(F.split(F.trim(t), r"\s+"))
    ).cast("double")
    sentences = F.greatest(
        F.lit(1), F.regexp_count(t, F.lit(r"[.!?]+"))
    ).cast("double")
    syllables = F.greatest(
        F.lit(1), F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    ).cast("double")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.round(score, 4).alias("flesch"),
    ).orderBy("doc_id")


def readability_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`readability` (identical regexps, floors,
    operation order)."""
    return f"""
WITH c AS (
  SELECT {id_col} AS doc_id,
         GREATEST(1, len(regexp_extract_all(trim({text_col}), '\\S+')))::DOUBLE AS w,
         GREATEST(1, len(regexp_extract_all({text_col}, '[.!?]+')))::DOUBLE AS s,
         GREATEST(1, len(regexp_extract_all(lower({text_col}), '[aeiouy]+')))::DOUBLE AS y
  FROM {table}
)
SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(s AS BIGINT) AS n_sentences,
       CAST(y AS BIGINT) AS n_syllables,
       ROUND(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4) AS flesch
FROM c ORDER BY doc_id
"""


MIX_SAMPLE_BUCKETS = 1_000_000


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    weights: dict[str, float],
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic mixture sampling to a token budget — the
    pretraining data-mix primitive (the Pile/DoReMi-style weighted
    domain mixture, resolved to an actual keep-set): given target
    domain weights and a total token budget, each domain d gets
    target_d = budget · w_d / Σw tokens, sampled at
    rate_d = min(1, target_d / tokens_d) by the same salted md5
    bucket as :func:`hash_split` — so the keep-set is STABLE under
    re-runs and incremental crawls, PORTABLE across engines
    (bit-identical cut arithmetic), and never oversamples a domain
    past its corpus (rate caps at 1; the budget shortfall is
    reported by the caller comparing kept vs target, not silently
    redistributed). Domains absent from ``weights`` are dropped —
    an explicit mixture IS an allowlist.

    Scale plan: one map-side-combined groupBy over the (bounded)
    domain set for token totals, broadcast back; the keep decision is
    a JVM expression — no per-doc shuffle beyond the tiny totals agg.

    Returns kept rows (id, domain, n_tokens); order by id.
    """
    toks = token_count(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        toks.alias("n_tokens"),
    )
    totals = base.groupBy("domain").agg(
        F.sum("n_tokens").cast("double").alias("_dom_toks")
    )
    wsum = float(sum(weights.values()))
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items())
          for x in (F.lit(k), F.lit(float(v)))]
    )
    w = wmap[F.col("domain")]
    rate = F.least(
        F.lit(1.0),
        (F.lit(float(budget_tokens)) * w / F.lit(wsum))
        / F.col("_dom_toks"),
    )
    # least() skips NULLs in both engines, so an absent weight would
    # silently sample at rate 1.0 — gate on the weight itself instead
    cut = F.when(
        w.isNotNull(),
        F.floor(rate * F.lit(MIX_SAMPLE_BUCKETS)).cast("long"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col("id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long") % MIX_SAMPLE_BUCKETS
    return (
        base.join(F.broadcast(totals), "domain")
        .withColumn("_cut", cut)
        .filter(F.col("_cut").isNotNull() & (bucket < F.col("_cut")))
        .select("id", "domain", "n_tokens")
        .orderBy("id")
    )


def token_budget_sample_sql(
    table: str,
    budget_tokens: int,
    weights: dict[str, float],
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> str:
    """DuckDB twin of :func:`token_budget_sample` — identical token
    count, totals, IEEE cut arithmetic, and md5 bucket."""
    wsum = float(sum(weights.values()))
    wcase = "CASE domain " + " ".join(
        f"WHEN '{k}' THEN {float(v)!r}" for k, v in sorted(weights.items())
    ) + " ELSE NULL END"
    bucket = (
        f"(('0x' || substr(md5('{salt}:' || CAST(id AS VARCHAR)), 1, 8))"
        f"::BIGINT % {MIX_SAMPLE_BUCKETS})"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {domain_col} AS domain,
         len(regexp_extract_all(trim({text_col}), '\\S+')) AS n_tokens
  FROM {table}
),
totals AS (
  SELECT domain, CAST(SUM(n_tokens) AS DOUBLE) AS dom_toks
  FROM base GROUP BY domain
),
rated AS (
  SELECT b.*, CASE WHEN ({wcase}) IS NOT NULL THEN
         FLOOR(LEAST(1.0,
           ({float(budget_tokens)!r} * ({wcase}) / {wsum!r}) / t.dom_toks
         ) * {MIX_SAMPLE_BUCKETS})::BIGINT END AS cut
  FROM base b JOIN totals t USING (domain)
)
SELECT id, domain, n_tokens FROM rated
WHERE cut IS NOT NULL AND {bucket} < cut
ORDER BY id
"""


def fuzzy_value_pairs(
    df: DataFrame,
    col: str,
    max_len: int = 64,
) -> DataFrame:
    """Edit-distance-1 pairs over a column's DISTINCT values — the
    key-canonicalization primitive (near-identical hosts, codes, ids
    that should merge before a groupBy). NOT an all-pairs scan: two
    strings within one edit share a member of their deletion
    neighborhood ({s} ∪ {s minus char i} — Bocek et al.'s fast
    similarity blocking, the symmetric-delete idea behind SymSpell),
    so candidates come from an equi-join on md5(variant) and only
    candidates pay a verify. Values longer than ``max_len`` are
    excluded (neighborhood size is len+1; the cap bounds the explode).

    Scale plan: distinct -> explode(len+1 variants, md5-hashed) ->
    one variant-keyed equi-join -> dropDuplicates -> levenshtein
    verify on candidates only. The variant join is the only shuffle
    that grows with the domain; a uniform key domain has tiny variant
    buckets, and a pathological shared variant is bounded by the cap.

    Returns (val_a, val_b, dist) with val_a < val_b; order by both.
    """
    vals = (
        df.select(F.col(col).cast("string").alias("v"))
        .where(F.col("v").isNotNull() & (F.length("v") <= max_len))
        .distinct()
    )
    variants = vals.select(
        "v",
        F.explode(
            F.array_union(
                F.array(F.md5("v")),
                F.transform(
                    F.sequence(F.lit(1), F.length("v")),
                    # v with char i deleted: v[1..i-1] || v[i+1..]
                    lambda i: F.md5(
                        F.concat(
                            F.col("v").substr(F.lit(1), i - 1),
                            F.col("v").substr(i + 1, F.length("v") - i),
                        )
                    ),
                ),
            )
        ).alias("h"),
    )
    a = variants.select(F.col("v").alias("val_a"), "h")
    b = variants.select(F.col("v").alias("val_b"), "h")
    cand = (
        a.join(b, "h")
        .where(F.col("val_a") < F.col("val_b"))
        .select("val_a", "val_b")
        .dropDuplicates(["val_a", "val_b"])
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("val_a", "val_b")
        )
        .where(F.col("dist") <= 1)
        .orderBy("val_a", "val_b")
    )


def fuzzy_value_pairs_sql(table: str, col: str, max_len: int = 64) -> str:
    """DuckDB twin of :func:`fuzzy_value_pairs` — the blocking is an
    implementation detail, so the oracle is the exact definition: all
    distinct-value pairs at levenshtein distance <= 1. (Sound AND
    complete blocking is exactly what this cross-check proves.)"""
    return f"""
WITH vals AS (
  SELECT DISTINCT CAST({col} AS VARCHAR) AS v FROM {table}
  WHERE {col} IS NOT NULL AND len(CAST({col} AS VARCHAR)) <= {max_len}
)
SELECT a.v AS val_a, b.v AS val_b,
       CAST(levenshtein(a.v, b.v) AS INT) AS dist
FROM vals a JOIN vals b ON a.v < b.v
WHERE levenshtein(a.v, b.v) <= 1
ORDER BY val_a, val_b
"""


def clean_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical text cleanup — the normalization pass CC pipelines
    run before hashing/dedup so cosmetic variants collapse: control
    characters stripped (C0/C1 except \\t \\n), curly quotes and
    en/em dashes mapped to ASCII, NBSP to space, whitespace runs
    collapsed to single spaces, ends trimmed. Order matters (quote
    mapping before collapse) and both engines run the identical
    regexp chain, so cleaned text is bit-identical cross-engine —
    which is the whole point: hashes computed downstream agree.

    Scale plan: a chain of JVM regexp_replace/translate expressions in
    one codegen stage; zero shuffles, zero Python.
    """
    t = F.col(text_col)
    # translate maps 1:1 by position; the 7th source char is NBSP
    t = F.translate(
        t, "‘’“”–— ", "''\"\"-- "
    )
    t = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    t = F.trim(t)
    return df.select(
        F.col(id_col).alias("doc_id"), t.alias("text")
    ).orderBy("doc_id")


def clean_text_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`clean_text` — identical mapping table and
    regexp chain, identical order."""
    return f"""
SELECT {id_col} AS doc_id,
  trim(regexp_replace(
    regexp_replace(
      translate({text_col},
        '‘’“”–— ',
        '''''""-- '),
      '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
    '\\s+', ' ', 'g')) AS text
FROM {table} ORDER BY doc_id
"""


def pii_inventory(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII AUDIT (the read-only companion of :func:`pii_scrub`): per
    document, how many matches of each class — emails, IPv4s, phone
    numbers — plus a corpus-release flag (pii_free). Pipelines audit
    BEFORE scrubbing: the inventory decides whether a source is worth
    scrubbing at all, and the per-class counts are the compliance
    artifact. Counting is sequential over the same chain order as the
    scrub (an email whose host looks like an IP counts once, as
    email), so inventory totals always equal scrub redaction totals.

    Pure JVM regexp chain, zero shuffles, zero Python. Returns
    (id, n_email, n_ipv4, n_phone, pii_free).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}"))
        # sequential: later classes count on the already-redacted text
        t = F.regexp_replace(t, pat, repl)
    out = df.select(F.col(id_col).alias("id"), *counts)
    total = sum(F.col(f"n_{n}") for n, _, _ in PII_PATTERNS)
    return out.withColumn("pii_free", total == 0).orderBy("id")


def pii_inventory_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`pii_inventory` — same sequential
    count-then-redact chain."""
    t = f"COALESCE({text_col}, '')"
    cols = []
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        cols.append(f"len(regexp_extract_all({t}, '{p}')) AS n_{name}")
        t = f"regexp_replace({t}, '{p}', '{repl}', 'g')"
    total = " + ".join(f"n_{n}" for n, _, _ in PII_PATTERNS)
    return (
        "SELECT id, n_email, n_ipv4, n_phone, "
        f"({total}) = 0 AS pii_free FROM ("
        f"SELECT {id_col} AS id, {', '.join(cols)} FROM {table}"
        ") c ORDER BY id"
    )


def quality_deciles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rank-ensemble quality scoring WITHOUT a global window (the
    scale trap of percent_rank): three cheap signals — token count,
    type-token ratio, mean chars per token — each map to a decile via
    EXACT corpus percentile cuts (one small aggregate, broadcast
    back), and the ensemble is their mean. Rank-space blending is how
    heterogeneous quality signals combine without unit juggling
    (FineWeb-style ensembling), and decile cuts make it one
    broadcast-joined map pass at any corpus size.

    Decile convention: 1 + count(cuts strictly below the value), cuts
    at p10..p90 — ties at a cut land in the LOWER decile in both
    engines. Returns (doc_id, d_tokens, d_ttr, d_wlen, ensemble_r).
    """
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n_tok = token_count(F.col(text_col))
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("double").alias("s_tokens"),
        (F.size(F.array_distinct(toks)) / F.greatest(F.lit(1), n_tok))
        .alias("s_ttr"),
        (
            F.length(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                                      r"\s+", ""))
            / F.greatest(F.lit(1), n_tok)
        ).alias("s_wlen"),
    )
    pcts = [i / 10.0 for i in range(1, 10)]
    cuts = sig.agg(
        *[
            F.expr(
                f"percentile(s_{name}, array({', '.join(map(str, pcts))}))"
            ).alias(f"c_{name}")
            for name in ("tokens", "ttr", "wlen")
        ]
    )
    out = sig.crossJoin(F.broadcast(cuts))
    dcols = []
    for name in ("tokens", "ttr", "wlen"):
        dec = F.lit(1) + F.size(
            F.filter(
                F.col(f"c_{name}"),
                lambda c: c < F.col(f"s_{name}"),
            )
        )
        dcols.append(dec.alias(f"d_{name}"))
    out = out.select("doc_id", *dcols)
    ens = (
        F.col("d_tokens") + F.col("d_ttr") + F.col("d_wlen")
    ) / F.lit(3.0)
    return out.withColumn("ensemble_r", F.round(ens, 6)).orderBy("doc_id")


def quality_deciles_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`quality_deciles` — identical signals,
    identical continuous-percentile cuts, identical strict-below
    decile rule."""
    pcts = ", ".join(str(i / 10.0) for i in range(1, 10))
    return f"""
WITH sig AS (
  SELECT {id_col} AS doc_id,
    CAST(len(regexp_extract_all(trim(COALESCE({text_col}, '')), '\\S+'))
         AS DOUBLE) AS s_tokens,
    len(list_distinct(regexp_extract_all(trim(COALESCE({text_col}, '')),
                                         '\\S+')))
      / GREATEST(1, len(regexp_extract_all(trim(COALESCE({text_col}, '')),
                                           '\\S+'))) AS s_ttr,
    len(regexp_replace(COALESCE({text_col}, ''), '\\s+', '', 'g'))
      / GREATEST(1, len(regexp_extract_all(trim(COALESCE({text_col}, '')),
                                           '\\S+'))) AS s_wlen
  FROM {table}
),
cuts AS (
  SELECT quantile_cont(s_tokens, [{pcts}]) AS c_tokens,
         quantile_cont(s_ttr, [{pcts}]) AS c_ttr,
         quantile_cont(s_wlen, [{pcts}]) AS c_wlen
  FROM sig
),
d AS (
  SELECT doc_id,
         1 + len(list_filter(c_tokens, c -> c < s_tokens)) AS d_tokens,
         1 + len(list_filter(c_ttr, c -> c < s_ttr)) AS d_ttr,
         1 + len(list_filter(c_wlen, c -> c < s_wlen)) AS d_wlen
  FROM sig, cuts
)
SELECT doc_id, d_tokens, d_ttr, d_wlen,
       ROUND((d_tokens + d_ttr + d_wlen) / 3.0, 6) AS ensemble_r
FROM d ORDER BY doc_id
"""
