"""Deduplication operators for web-scale corpora.

- exact_dedup: content-hash grouping (one shuffle on the hash).
- minhash_signatures / minhash_lsh_pairs: MinHash + banded LSH —
  shingle -> k min-hashes -> b bands -> bucket join -> candidate
  pairs -> exact Jaccard verify. Everything JVM-side (higher-order
  functions on arrays), no Python in the hot path.
- simhash64: 64-bit SimHash via Arrow-vectorized pandas UDF (bit
  votes need per-token hashing; numpy beats 64 JVM aggregates).

Scale notes: exact dedup shuffles once on sha2(text); minhash bands
shuffle candidate buckets only (band hash is highly selective); the
verify join is between candidate pairs only, never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper id (min), copy count."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("content_sha")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Only the groups with >1 copy (the actual duplicates)."""
    return exact_dedup(df, text_col, id_col).filter(F.col("n_copies") > 1)


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def shingles(text_col: str = "text", k: int = 3):
    """k-token shingles as an array column (JVM-side, no UDF)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — sig[j] = min over shingles of
    xxhash64(shingle, seed=j)."""
    def _seeded(j: int):
        # NOTE: a two-parameter lambda would be bound as (element, index)
        # by Spark's HOF machinery — capture the seed via closure instead.
        return lambda s: F.xxhash64(s, F.lit(j))

    sh = shingles(text_col, shingle_k).alias("_sh")
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_sh"), _seeded(j)))
            for j in range(num_hashes)
        ]
    ).alias("sig")
    return df.select(F.col(id_col).alias("id"), sh).select("id", sig)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    est_jaccard is the signature agreement fraction — an unbiased
    Jaccard estimator. Candidate generation: equal band-slices bucket
    together; only bucket collisions are joined.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.col("sig")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(num_hashes)
    ).alias("est_jaccard")
    return (
        cand.select("id_a", "id_b", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_docs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing >=1 shingle.

    The inverted-index join (explode shingles -> self-join on shingle)
    is the scalable exact counterpart to minhash: candidates only,
    never a cross join.
    """
    base = df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_k).alias("sh"))
    if max_docs:
        base = base.limit(max_docs)
    base = base.select("id", F.array_distinct("sh").alias("sh"))
    sizes = base.select("id", F.size("sh").alias("n_sh"))
    inv = base.select("id", F.explode("sh").alias("s"))
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col("x.id") < F.col("y.id")))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


NGRAM_JACCARD_SQL = r"""
WITH toks AS (
  SELECT {id} AS id, string_split_regex(lower({text}), '\s+') AS t FROM {table}
),
sh AS (
  SELECT id,
    CASE WHEN len(t) >= {k} THEN
      list_distinct(list_transform(generate_series(1, len(t) - {k} + 1),
                    i -> array_to_string(t[i:i + {k} - 1], ' ')))
    ELSE [array_to_string(t, ' ')] END AS sh
  FROM toks
),
sizes AS (SELECT id, len(sh) AS n_sh FROM sh),
inv AS (SELECT id, unnest(sh) AS s FROM sh),
pairs AS (
  SELECT x.id AS id_a, y.id AS id_b, count(*) AS inter
  FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
FROM pairs
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= {threshold}
ORDER BY id_a, id_b
"""


def near_dup_purge(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Docs to DROP from a training corpus: for every near-dup pair,
    the lower-quality member (ties break toward keeping the first id,
    matching exact_dedup's min-id keeper).

    The canonical cleaning composition — near-dup detection x quality
    scoring — as one operator. Uses exact n-gram Jaccard pairs here
    (oracle-checkable); at corpus scale swap the pair source for
    minhash_lsh_pairs, the semantics are unchanged.
    """
    from . import analysis

    pairs = ngram_jaccard_pairs(df, text_col, id_col, shingle_k, threshold)
    q = analysis.quality_score(df, text_col, id_col).select("id", "quality")
    j = pairs.join(
        q.select(F.col("id").alias("id_a"), F.col("quality").alias("qa")), "id_a"
    ).join(
        q.select(F.col("id").alias("id_b"), F.col("quality").alias("qb")), "id_b"
    )
    win = F.col("qa") >= F.col("qb")
    return (
        j.select(
            F.when(win, F.col("id_b")).otherwise(F.col("id_a")).alias("drop_id"),
            F.when(win, F.col("qb")).otherwise(F.col("qa")).alias("quality"),
        )
        .groupBy("drop_id")
        .agg(F.min("quality").alias("quality"))
        .orderBy("drop_id")
    )


def near_dup_purge_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of :func:`near_dup_purge` (composes the Jaccard and
    quality twins; identical rounded qualities make the winner CASE
    branch identically)."""
    from . import analysis

    pairs = ngram_jaccard_sql(table, text_col, id_col, shingle_k, threshold)
    quality = analysis.quality_score_sql(table)
    return (
        f"WITH p AS ({pairs}), q AS (SELECT id, quality FROM ({quality})) "
        "SELECT drop_id, MIN(quality) AS quality FROM ("
        "  SELECT CASE WHEN qa.quality >= qb.quality THEN p.id_b ELSE p.id_a END AS drop_id, "
        "         CASE WHEN qa.quality >= qb.quality THEN qb.quality ELSE qa.quality END AS quality "
        "  FROM p JOIN q qa ON qa.id = p.id_a JOIN q qb ON qb.id = p.id_b"
        ") GROUP BY drop_id ORDER BY drop_id"
    )


def ngram_jaccard_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of :func:`ngram_jaccard_pairs` (same shingling,
    same inverted-index candidate join, same exact-Jaccard filter)."""
    return NGRAM_JACCARD_SQL.format(
        table=table, text=text_col, id=id_col, k=shingle_k, threshold=threshold
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (Arrow-vectorized pandas UDF)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = t.lower().split()
            if not toks:
                continue
            hs = np.array(
                [hash_bytes64(tok.encode()) for tok in toks], dtype=np.uint64
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = bits.sum(axis=0) * 2 - len(hs)
            sig = np.uint64(0)
            for b in np.flatnonzero(votes > 0):
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))


def hash_bytes64(b: bytes) -> int:
    """Deterministic 64-bit FNV-1a (stable across processes, unlike
    Python's salted hash())."""
    h = 0xCBF29CE484222325
    for byte in b:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks (a pair within distance<=3 shares at least one of 4 chunks)."""
    sig = simhash64(df, text_col, id_col)
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return (
        cand.select("id_a", "id_b", ham)
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
