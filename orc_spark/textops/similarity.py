"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k, pure JVM expressions
  (zip_with dot product + window rank) — the correctness baseline,
  with a DuckDB list_cosine_similarity oracle twin.
- lsh_topk: random-hyperplane LSH bucketing — the scale path: only
  vectors sharing >=1 band bucket with the query are scored. At 10^12
  rows the bucket join prunes the candidate set by orders of
  magnitude; brute force stays as the verifier.
- embedding_near_dup_pairs: all-pairs near-duplicate detection by
  cosine threshold — exact (self-join, the verifier/oracle twin) and
  LSH-pruned (band-bucket self-join, the scale path).
- kmeans_centroids / ivf_topk: IVF index — sample-trained k-means
  coarse quantizer; queries probe only the nprobe nearest inverted
  lists. Assignment is a vectorized pandas UDF (one matmul per Arrow
  batch, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


def signature_col_vectorized(vec_col: str, planes: np.ndarray, band_bits: int = 4):
    """LSH band values via ONE ``x @ planes.T`` matmul per Arrow batch
    (vectorized pandas UDF) — the scale path when n_planes is large:
    the JVM :func:`signature_col` evaluates one `F.aggregate` pass per
    plane (O(planes x dim) expression work per row), while this runs
    the whole batch through BLAS. Bit-for-bit identical output to
    signature_col except at exact dot==0 boundaries (float summation
    order), which have measure zero on real embeddings."""
    p = planes.copy()
    n_bands = len(p) // band_bits
    weights = (2 ** np.arange(band_bits - 1, -1, -1)).astype(np.int64)

    @pandas_udf("array<int>")
    def _sig(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        bits = (x @ p.T >= 0).astype(np.int64)  # (rows, planes)
        bands = bits.reshape(len(x), n_bands, band_bits) @ weights
        return pd.Series(list(bands.astype(np.int32)))

    return _sig(F.col(vec_col))


VECTORIZED_SIG_MIN_PLANES = 16


def _resolve_sig_impl(sig_impl: str, n_planes: int):
    """'auto' -> the vectorized matmul path once the plane count makes
    per-plane JVM aggregates the bottleneck (one F.aggregate pass per
    plane = O(planes x dim) expression work per row vs one BLAS matmul
    per Arrow batch). Parity between the two is pinned by
    tests/test_round2_ops.py."""
    if sig_impl == "auto":
        return (
            signature_col_vectorized
            if n_planes >= VECTORIZED_SIG_MIN_PLANES
            else signature_col
        )
    if sig_impl == "pandas":
        return signature_col_vectorized
    if sig_impl == "jvm":
        return signature_col
    raise ValueError(f"unknown sig_impl {sig_impl!r}")


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 64,
    band_bits: int = 4,
    seed: int = 42,
    sig_impl: str = "auto",
) -> DataFrame:
    """Approximate cosine top-k: score only vectors sharing >=1 LSH band
    with the query, then exact-rank the candidates. ``sig_impl='pandas'``
    computes signatures with one BLAS matmul per Arrow batch (the scale
    path for large n_planes); 'jvm' stays expression-only; 'auto'
    (default) picks pandas once n_planes >= 16."""
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

    sig = _resolve_sig_impl(sig_impl, n_planes)(vec_col, planes, band_bits)
    match_any = None
    for b, qb in enumerate(q_bands):
        cond = F.col("_sig")[b] == F.lit(qb)  # positional band equality
        match_any = cond if match_any is None else (match_any | cond)
    cand = df.withColumn("_sig", sig).filter(match_any)
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)

def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 64,
    band_bits: int = 4,
    seed: int = 42,
    sig_impl: str = "auto",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine(a, b) >= threshold.

    method='exact': full self-join — O(n^2) comparisons; the
    correctness baseline with a DuckDB cross-join oracle twin.
    method='lsh': candidate pairs share at least one hyperplane-sign
    band bucket; only candidates get an exact cosine check. Recall for
    cosine c with b-bit bands and n_planes/b bands is
    1-(1-p^b)^(n/b), p = 1 - acos(c)/pi — at near-dup thresholds
    (>=0.9) this is ~1.0 while pruning the quadratic join to bucket-
    local work, which is what survives 10^12 rows. Both paths end in
    the same exact cosine filter, so LSH can only lose pairs, never
    invent them.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    if method == "exact":
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        dim = len(df.select(vec_col).first()[0])
        planes = _hyperplanes(dim, n_planes, seed)
        sig = _resolve_sig_impl(sig_impl, n_planes)(vec_col, planes, band_bits)
        # (band_idx, band_val) bucket join: same-bucket rows collide.
        bands = df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(sig).alias("band_idx", "band_val"),
        )
        cand = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band_idx") == F.col("y.band_idx"))
                & (F.col("x.band_val") == F.col("y.band_val"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(
                F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b")
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        pairs.withColumn("cosine", cosine_expr(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_rows: int = 20_000,
    n_iter: int = 10,
) -> np.ndarray:
    """Train the IVF coarse quantizer: Lloyd's k-means on a driver-side
    sample. Sample size is fixed, so training cost is O(1) in table
    size — at 10^12 rows the sample is still `sample_rows` vectors
    (statistically sufficient for a coarse quantizer; IVF quality
    depends on list balance, not exact centroids)."""
    frac_df = df.select(vec_col)
    n = frac_df.count()
    if n > sample_rows:
        frac_df = frac_df.sample(fraction=min(1.0, 1.2 * sample_rows / n), seed=seed)
    x = np.array(
        [r[0] for r in frac_df.limit(sample_rows).collect()], dtype=np.float64
    )
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iter):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def ivf_assign_col(centroids: np.ndarray, vec_col: str = "embedding"):
    """Nearest-centroid list id as a column (vectorized pandas UDF:
    one ||v-c||^2 matmul per Arrow batch)."""
    cent = centroids.copy()

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 constant per row
        d = -2.0 * (x @ cent.T) + (cent**2).sum(axis=1)[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return _assign(F.col(vec_col))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: score only the nprobe inverted lists nearest to the
    query. At scale the table is written partitioned by list id, so a
    probe is a partition-pruned scan (no shuffle); here the list
    filter expresses the same pruning."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:nprobe]]
    cand = df.withColumn("_ivf_list", ivf_assign_col(centroids, vec_col)).filter(
        F.col("_ivf_list").isin(probe)
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_rows: int = 20_000,
    n_iter: int = 10,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, public
    method): the vector splits into ``m`` subvectors, each quantized
    by its own ``k``-centroid Lloyd's k-means. Training runs on the
    same BOUNDED driver-side sample as :func:`kmeans_centroids`, so
    cost is O(1) in table size. Returns (m, k, d/m) float64."""
    frac_df = df.select(vec_col)
    n = frac_df.count()
    if n > sample_rows:
        frac_df = frac_df.sample(
            fraction=min(1.0, 1.2 * sample_rows / n), seed=seed
        )
    x = np.array(
        [r[0] for r in frac_df.limit(sample_rows).collect()], dtype=np.float64
    )
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(len(xs), size=min(k, len(xs)), replace=False)]
        for _ in range(n_iter):
            dist = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(len(cent)):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
        books[j, : len(cent)] = cent
    return books


def pq_encode_col(codebooks: np.ndarray, vec_col: str = "embedding"):
    """PQ codes as an array<int> column — one vectorized pandas UDF
    doing m small matmuls per Arrow batch (the same shape as
    ivf_assign_col); a d-dim float vector becomes m small ints
    (d/m × 8 ÷ log2(k) compression of the index payload)."""
    books = codebooks.copy()
    m, _, sub = books.shape

    @pandas_udf("array<int>")
    def _enc(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            cent = books[j]
            d = -2.0 * (xs @ cent.T) + (cent**2).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return _enc(F.col(vec_col))


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with asymmetric distance (ADC) + exact rerank: the query
    builds an (m × k) lookup table once; each row's approximate
    squared-L2 distance is m table gathers over its codes (no float
    vector read); the ``k × refine`` best candidates rerank by exact
    cosine. At scale the codes column is the only thing the first
    pass scans — d/m·8/log2(k)× less IO than the vectors — and the
    rerank touches ``k × refine`` rows."""
    q = np.asarray(query_vec, dtype=np.float64)
    books = codebooks.copy()
    m, kk, sub = books.shape
    lut = np.stack(
        [
            ((books[j] - q[j * sub : (j + 1) * sub][None, :]) ** 2).sum(axis=1)
            for j in range(m)
        ]
    )  # (m, k)

    @pandas_udf("double")
    def _adc(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m)
        dist = lut[np.arange(m)[None, :], c].sum(axis=1)
        return pd.Series(dist)

    cand = (
        df.withColumn("_pq_codes", pq_encode_col(codebooks, vec_col))
        .withColumn("_adc", _adc(F.col("_pq_codes")))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(int(k) * int(refine))
        .drop("_pq_codes", "_adc")
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column —
    the storage codec for vector corpora (4x smaller than float32; the
    standard scalar-quantization layout used by FAISS/Lucene SQ8):
    ``q[i] = round(x[i] / scale)`` with ``scale = max|x| / 127`` stored
    per vector, so dequantization is one multiply.

    Engine-portable determinism: all arithmetic in float64 with
    ``floor(t + 0.5)`` as the rounding rule — identical IEEE op order
    in Spark and the SQL twin, so the int8 codes are bit-identical
    across engines (plain ``round`` half-even vs half-away drifts).
    Plan at scale: map-only, zero shuffle, pure JVM array expressions
    (transform/array_max) — no Python in the hot path.
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(xd, lambda x: F.abs(x)))
    qvec = F.when(
        mx > 0,
        F.transform(
            xd, lambda x: F.floor(x / mx * 127.0 + 0.5).cast("int")
        ),
    ).otherwise(F.transform(xd, lambda x: F.lit(0)))
    scale = F.when(mx > 0, mx / 127.0).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col), qvec.alias("qvec"), scale.alias("scale")
    )


def quantize_int8_sql(
    table: str, vec_col: str = "embedding", id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`quantize_int8` — same float64 op order,
    same floor(t + 0.5) rounding, so codes match bit-for-bit."""
    return (
        f"WITH s AS (SELECT {id_col}, {vec_col}, "
        f"list_aggregate(list_transform({vec_col}, "
        "x -> abs(CAST(x AS DOUBLE))), 'max') AS mx "
        f"FROM {table}) "
        f"SELECT {id_col}, "
        f"CASE WHEN mx > 0 THEN list_transform({vec_col}, "
        "x -> CAST(floor(CAST(x AS DOUBLE) / mx * 127.0 + 0.5) AS INTEGER)) "
        f"ELSE list_transform({vec_col}, x -> 0) END AS qvec, "
        "CASE WHEN mx > 0 THEN mx / 127.0 ELSE 0.0 END AS scale "
        "FROM s"
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean embedding (class centroids — the prototype table
    a nearest-centroid classifier / cluster-quality report reads).

    Plan: posexplode to (label, pos, val) → ONE map-side-combining
    groupBy(label, pos) average → re-assemble each centroid with a
    sort_array(collect_list(struct(pos, avg))) whose size is exactly
    the embedding dimension — per-label state is dim floats, so the
    second (label-keyed) shuffle carries #labels × dim rows total.
    Float64 accumulation for cross-engine stability."""
    e = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    per_dim = e.groupBy("label", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m"),
        F.count("*").alias("n"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: F.round(s["m"], 6),
            ).alias("centroid"),
            F.max("n").alias("n_vectors"),
        )
        .orderBy("label")
    )


def label_centroids_sql(
    table: str, vec_col: str = "embedding", label_col: str = "label"
) -> str:
    """DuckDB twin of :func:`label_centroids` (same per-dimension
    average, list re-assembled in position order)."""
    return (
        rf"WITH e AS (SELECT {label_col} AS label, "
        rf"generate_subscripts({vec_col}, 1) AS pos, "
        rf"CAST(unnest({vec_col}) AS DOUBLE) AS val FROM {table}), "
        r"d AS (SELECT label, pos, AVG(val) AS m, COUNT(*) AS n "
        r"FROM e GROUP BY label, pos) "
        r"SELECT label, list(ROUND(m, 6) ORDER BY pos) AS centroid, "
        r"CAST(MAX(n) AS BIGINT) AS n_vectors "
        r"FROM d GROUP BY label ORDER BY label"
    )


def semantic_purge(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    band_bits: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    public method; implementation ours): drop every embedding that is
    the GREATER id of some cosine-near pair, keeping each near-dup
    group's lowest id as its representative. The pair set is exact
    (``embedding_near_dup_pairs`` ends in an exact cosine filter —
    LSH only bounds the candidate join; the default 2-bit bands give
    candidate recall 1-(1-p^2)^32 ≈ 1 down to cosine 0.4, so the
    purge rule is SQL-twin-checkable). One anti-join on id_b; at
    corpus scale the LSH bucketing keeps the pair join bucket-local
    and the anti-join shuffles only ids.

    Returns the kept rows of ``df`` (all original columns).
    """
    pairs = embedding_near_dup_pairs(
        df, threshold=threshold, id_col=id_col, vec_col=vec_col,
        method=method, band_bits=band_bits,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")


def semantic_purge_sql(
    table: str, threshold: float = 0.4, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`semantic_purge` (exact pair set)."""
    return (
        f"SELECT {id_col}, label FROM {table} WHERE {id_col} NOT IN ("
        f"SELECT b.{id_col} FROM {table} a JOIN {table} b "
        f"ON a.{id_col} < b.{id_col} "
        f"WHERE list_cosine_similarity(CAST(a.{vec_col} AS DOUBLE[]), "
        f"CAST(b.{vec_col} AS DOUBLE[])) >= {threshold}) "
        f"ORDER BY {id_col}"
    )


def ivf_build_index(
    spark,
    df: DataFrame,
    index_dir: str,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Build and PERSIST an IVF index: train the coarse quantizer
    (:func:`kmeans_centroids`, bounded driver-side sample), assign
    every vector its nearest list, and write the table PARTITIONED BY
    list id (``index_dir/vectors/_ivf_list=<i>/``) with the centroids
    alongside (``index_dir/centroids``). The index is a table layout,
    not a sidecar file format — any engine reads it, and Spark prunes
    probe queries to the matching directories at PLANNING time.

    This is the production split the in-query :func:`ivf_topk` elides:
    pay quantization + one partitioned write ONCE, then every query is
    a directory-pruned scan of nprobe/n_lists of the data with no
    assignment work at all.

    Scale plan: build = one pandas-UDF assignment pass + one
    partition-keyed shuffle for the write (the same small-files
    defense as every partitioned publish); n_lists bounds directories.

    Returns the trained centroids (n_lists, dim).
    """
    cent = kmeans_centroids(
        df, n_centroids=n_lists, vec_col=vec_col, seed=seed
    )
    assigned = df.withColumn("_ivf_list", ivf_assign_col(cent, vec_col))
    (
        assigned.repartition("_ivf_list")
        .write.mode("overwrite")
        .partitionBy("_ivf_list")
        .parquet(index_dir + "/vectors")
    )
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in cent[i]]) for i in range(len(cent))],
        "list_id int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(index_dir + "/centroids")
    return cent


def ivf_query_index(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: load the (tiny) centroid table to
    the driver, rank lists by distance to the query, and scan ONLY the
    nprobe nearest list directories (the `_ivf_list IN (...)` filter
    is a partition filter — file skip at planning time), exact-scoring
    the survivors. Zero Python on the scan side; the only Python was
    paid at build."""
    rows = spark.read.parquet(index_dir + "/centroids").collect()
    cent = np.array(
        [r.centroid for r in sorted(rows, key=lambda r: r.list_id)],
        dtype=np.float64,
    )
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((cent - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:nprobe]]
    cand = spark.read.parquet(index_dir + "/vectors").filter(
        F.col("_ivf_list").isin(probe)
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


HASH_EMBED_DIM = 64


def hash_embed(
    df: DataFrame,
    dim: int = HASH_EMBED_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing vectorizer (Weinberger et al. 2009, the
    "hashing trick"): every whitespace token lands in bucket
    md5(token) % dim with a second md5 nibble choosing ±1 (the signed
    variant that keeps collisions unbiased), weights are summed per
    bucket and L2-normalized — a deterministic, model-free text
    embedding that makes the engine's ANN / near-dup / clustering
    stack usable on corpora that ship no embedding column. Portable by
    construction: the bucket and sign arithmetic is the same md5
    integer math both engines run bit-identically.

    Scale plan: explode + two JVM md5 expressions + one (id, bucket)
    map-side-combined groupBy + one per-doc window for the norm —
    shuffles carry (id, bucket, weight), never token strings. No
    Python anywhere.

    Returns (id, embedding array<double> of ``dim``, unit L2 norm;
    docs with no tokens are dropped).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.md5(F.col("tok"))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim
    ).cast("int")
    sgn = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    counts = (
        toks.select("id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("id", "bucket")
        .agg(F.sum("sgn").alias("w"))
        .where(F.col("w") != 0.0)
    )
    norm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("id")))
    unit = counts.select(
        "id", "bucket", (F.col("w") / norm).alias("w")
    )
    dense = (
        unit.groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "w"))
            ).alias("m")
        )
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)
                ),
            ).alias("embedding"),
        )
    )
    return dense


def hash_embed_sparse_sql(
    table: str,
    dim: int = HASH_EMBED_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`hash_embed`'s SPARSE form (id, bucket,
    unit-normalized weight) — identical md5 bucket/sign arithmetic;
    the dense array assembly is Spark-side packaging of these exact
    numbers (tests assert the two forms agree)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         unnest(regexp_extract_all(trim(COALESCE({text_col}, '')), '\\S+')) AS tok
  FROM {table}
),
b AS (
  SELECT id,
         CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % {dim} AS INT) AS bucket,
         CASE WHEN ('0x' || substr(md5(tok), 9, 1))::BIGINT % 2 = 0
              THEN 1.0 ELSE -1.0 END AS sgn
  FROM toks WHERE tok != ''
),
c AS (
  SELECT id, bucket, SUM(sgn) AS w FROM b GROUP BY 1, 2
  HAVING SUM(sgn) != 0
),
n AS (
  SELECT id, bucket, w / sqrt(SUM(w * w) OVER (PARTITION BY id)) AS w
  FROM c
)
SELECT id, bucket, ROUND(w, 6) AS w_r FROM n ORDER BY id, bucket
"""


def embedding_dim_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-DIMENSION corpus statistics of an embedding column — the
    normalization constants (mean/std per dim) every whitening /
    standardization step needs before indexing or training.

    Scale shape: posexplode to (dim, value) pairs feeds ONE
    map-side-combined groupBy(dim) computing count/sum/sum-of-squares
    — the shuffle carries #dims × #partitions partial rows, never the
    vectors; variance folds with the parallel (Chan) algebra that the
    partial aggregation already implements. Output is #dims rows.
    Values widen to float64 BEFORE any sum (float32 accumulation
    drifts and would diverge from any oracle).
    """
    pairs = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    return (
        pairs.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_pop("v"), 6).alias("std_pop"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
        .orderBy("dim")
    )


def embedding_dim_stats_sql(table: str, vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`embedding_dim_stats` — an unnested index
    range + subscripting reproduces posexplode's 0-based dim index
    (this DuckDB build lacks WITH ORDINALITY)."""
    return (
        "WITH p AS (SELECT u.i - 1 AS dim, "
        f"CAST({vec_col}[u.i] AS DOUBLE) AS v "
        f"FROM {table}, "
        f"UNNEST(range(1, len({vec_col}) + 1)) AS u(i)) "
        "SELECT dim, COUNT(*) AS n, ROUND(AVG(v), 6) AS mean, "
        "ROUND(STDDEV_POP(v), 6) AS std_pop, "
        "ROUND(MIN(v), 6) AS lo, ROUND(MAX(v), 6) AS hi "
        "FROM p GROUP BY dim ORDER BY dim"
    )
