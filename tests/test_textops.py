"""Training-data operators: dedup, text analysis, similarity — each
verified against an independent pandas/duckdb computation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from orc_spark.textops import analysis, dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Documents with planted exact + near duplicates."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact
        (3, "the quick brown fox jumps over the lazy dog again and once"),  # near
        (4, "a completely different document about database compression"),
        (5, "another unrelated text concerning spark query planning"),
        (6, "a completely different document about database compression"),  # exact
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    groups = {r.keeper_id: r.n_copies for r in dedup.exact_dedup(dup_docs).collect()}
    assert groups == {1: 2, 3: 1, 4: 2, 5: 1}
    dups = dedup.duplicate_groups(dup_docs).collect()
    assert {r.keeper_id for r in dups} == {1, 4}


def test_minhash_estimates_jaccard(spark, dup_docs):
    pairs = dedup.minhash_lsh_pairs(
        dup_docs, num_hashes=64, bands=16, jaccard_threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}
    assert got[(1, 2)] == 1.0  # identical
    assert got[(4, 6)] == 1.0
    assert (1, 3) in got or (2, 3) in got  # near-dup caught
    assert (1, 4) not in got and (1, 5) not in got


def test_ngram_jaccard_exact(spark, dup_docs):
    pairs = dedup.ngram_jaccard_pairs(dup_docs, threshold=0.4).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert got[(1, 2)] == 1.0
    # hand-computed: docs 1 and 3 share 8 of 12 distinct 3-shingles
    j13 = got[(1, 3)]
    assert 0.5 < j13 < 1.0
    assert (1, 4) not in got


def test_simhash_near_pairs(spark, dup_docs):
    pairs = dedup.simhash_near_pairs(dup_docs, max_hamming=10).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got[(1, 2)] == 0
    assert got[(4, 6)] == 0
    if (1, 3) in got:
        assert got[(1, 3)] > 0


def test_token_stats_matches_pandas(spark, docs):
    got = dedup and analysis.token_stats(docs).orderBy("id").toPandas()
    pdf = docs.select("doc_id", "text").orderBy("doc_id").toPandas()
    exp_tokens = pdf["text"].fillna("").apply(lambda t: len(t.split()) if t.strip() else 0)
    assert (got["n_tokens"].to_numpy() == exp_tokens.to_numpy()).all()
    assert (got["n_chars"].to_numpy() == pdf["text"].str.len().to_numpy()).all()


def test_subword_token_count_edges(spark):
    """BPE-ish pre-tokenizer: contractions split off, digit/letter/punct
    runs are separate tokens, empty/null count 0 — and the Spark (Java
    regex) and DuckDB (RE2) sides agree on every edge case."""
    import duckdb

    cases = [
        (1, "don't stop"),       # don + 't + _stop
        (2, "abc123!?"),         # abc + 123 + !?
        (3, "  spaced   out "),  # ws + spaced + ws + out + ws
        (4, ""),
        (5, None),
        (6, "we'll we've we're"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r.id: r.n_subword_tokens
        for r in analysis.token_stats(df).collect()
    }
    assert got[1] == 3 and got[4] == 0 and got[5] == 0
    assert got[2] == 3
    assert got[6] == 6  # we + 'll + _we + 've + _we + 're (spaces fold into words)

    con = duckdb.connect()
    def lit(s):
        return "NULL" if s is None else "'" + s.replace("'", "''") + "'"

    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, {lit(s)})" for i, s in cases) +
                ") v(doc_id, text)")
    sql = analysis.TOKEN_STATS_SQL.format(table="t")
    duck = {r[0]: r[2] for r in con.execute(
        "SELECT id, n_tokens, n_subword_tokens FROM (" + sql + ")"
    ).fetchall()}
    assert duck == got


def test_quality_score_ranges(spark, docs):
    q = analysis.quality_score(docs).toPandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()
    assert ((q["alpha_ratio"] >= 0) & (q["alpha_ratio"] <= 1)).all()
    # garbage text scores below clean text
    test = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog and keeps going for a while longer."),
         (2, "@@@@ #### 1234 5678 !!!! %%%% ^^^^ 9999 ****")],
        "doc_id long, text string",
    )
    scores = {r.id: r.quality for r in analysis.quality_score(test).collect()}
    assert scores[1] > scores[2]


def test_language_id(spark):
    test = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy that the sun was out"),
            (2, "der hund und die katze sind nicht in das haus mit ein ball"),
            (3, "le chat est dans la maison et les oiseaux sont sur le toit"),
            (4, "el perro y el gato en la casa es un amigo que corre"),
            (5, "zzzz qqqq xxxx"),
        ],
        "doc_id long, text string",
    )
    got = {r.id: r.lang_guess for r in analysis.language_id(test).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "es"
    assert got[5] == "und"


def test_fingerprint_order_insensitive_tokenset(spark):
    test = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r.id: (r.content_sha, r.tokenset_sha) for r in analysis.fingerprint(test).collect()}
    assert fp[1][0] != fp[2][0]  # different content
    assert fp[1][1] == fp[2][1]  # same token set
    assert fp[1][1] != fp[3][1]


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df.cache().count()
    return df


def test_brute_force_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy())
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))
    expected = pdf["vec_id"].to_numpy()[order][:5].tolist()
    got = [r.id for r in similarity.brute_force_topk(emb, q.tolist(), k=5).collect()]
    assert got == expected


def test_lsh_topk_recall(spark, emb):
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy())
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    exact_top10 = set(pdf["vec_id"].to_numpy()[np.argsort(-cos)][:10].tolist())
    got = {r.id for r in similarity.lsh_topk(emb, q.tolist(), k=10).collect()}
    # the query itself must always be found; recall >= 50% on top-10
    assert 0 in got
    assert len(got & exact_top10) >= 5


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    """Vectors with planted near-duplicate pairs (tight clusters) plus
    random background vectors."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((4, 16))
    rows = []
    vid = 0
    for c in range(4):  # 3 noisy copies per cluster => near-dup pairs
        for _ in range(3):
            v = base[c] + 0.01 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(30):  # background
        rows.append((vid, [float(x) for x in rng.standard_normal(16)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dup_exact(spark, clustered_vecs):
    out = similarity.embedding_near_dup_pairs(
        clustered_vecs, threshold=0.95, method="exact"
    ).collect()
    # every within-cluster pair, nothing else: 4 clusters x C(3,2)
    expect = {
        (a, b) for c in range(4) for a in range(3 * c, 3 * c + 3)
        for b in range(a + 1, 3 * c + 3)
    }
    assert {(r.id_a, r.id_b) for r in out} == expect
    assert all(r.cosine >= 0.95 for r in out)


def test_embedding_near_dup_lsh_subset_and_recall(spark, clustered_vecs):
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            clustered_vecs, threshold=0.95, method="exact"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            clustered_vecs, threshold=0.95, method="lsh"
        ).collect()
    }
    assert lsh <= exact  # LSH can only lose pairs, never invent them
    assert len(lsh) / len(exact) >= 0.9  # high recall at near-dup cosine


def test_ivf_full_probe_matches_brute_force(spark, emb):
    q = emb.filter(F.col("vec_id") == 3).first().embedding
    q = [float(x) for x in q]
    cent = similarity.kmeans_centroids(emb, n_centroids=4)
    full = similarity.ivf_topk(emb, q, cent, k=5, nprobe=len(cent)).collect()
    brute = similarity.brute_force_topk(emb, q, k=5).collect()
    assert [(r.id, round(r.cosine, 9)) for r in full] == [
        (r.id, round(r.cosine, 9)) for r in brute
    ]


def test_ivf_partial_probe_finds_self(spark, emb):
    q = emb.filter(F.col("vec_id") == 3).first().embedding
    q = [float(x) for x in q]
    cent = similarity.kmeans_centroids(emb, n_centroids=8)
    out = similarity.ivf_topk(emb, q, cent, k=3, nprobe=2).collect()
    # the query vector itself lives in the probed (nearest) list
    assert out and out[0].id == 3 and out[0].cosine > 0.999999


def test_pq_full_refine_matches_brute_force(spark, emb):
    """With refine covering the whole table, the exact rerank makes PQ
    return exactly the brute-force top-k regardless of ADC order."""
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first().embedding]
    books = similarity.pq_train(emb, m=4, k=8)
    n = emb.count()
    full = similarity.pq_topk(emb, q, books, k=5, refine=n).collect()
    brute = similarity.brute_force_topk(emb, q, k=5).collect()
    assert [(r.id, round(r.cosine, 9)) for r in full] == [
        (r.id, round(r.cosine, 9)) for r in brute
    ]


def test_pq_codes_and_self_recall(spark, emb):
    """Codes have the declared shape/range and a narrow ADC scan still
    finds the query vector itself (its own codes are ADC-minimal)."""
    books = similarity.pq_train(emb, m=4, k=8)
    assert books.shape[0] == 4 and books.shape[1] == 8
    codes = emb.select(
        similarity.pq_encode_col(books).alias("c")
    ).collect()
    assert all(len(r.c) == 4 and all(0 <= v < 8 for v in r.c) for r in codes)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first().embedding]
    out = similarity.pq_topk(emb, q, books, k=3, refine=2).collect()
    assert out and out[0].id == 3 and out[0].cosine > 0.999999


def test_pq_dim_guard(spark, emb):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(emb, m=7, k=8)


def test_repetition_ratio_flags_boilerplate(spark):
    from orc_spark.textops import analysis

    df = spark.createDataFrame(
        [
            (1, "spam ham " * 50),                 # pure 2-word loop
            (2, " ".join(f"w{i}" for i in range(100))),  # all distinct
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in analysis.repetition_ratio(df, n=3).collect()}
    assert rows[1].repetition > 0.9
    assert rows[2].repetition == 0.0
    assert rows[3].repetition == 0.0 and rows[3].n_ngrams == 0


def test_near_dup_clusters_transitive(spark, dup_docs):
    """Components, not edges: A~B and B~C put A,B,C in ONE cluster
    labeled by the min id even when A~C misses the threshold; nodes
    with no near-dup edge don't appear."""
    out = {
        r.id: (r.cluster_id, r.n_members)
        for r in dedup.near_dup_clusters(dup_docs, threshold=0.4).collect()
    }
    # docs 1,2 exact; 3 near both; 4,6 exact; 5 isolated
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[4] == (4, 2) and out[6] == (4, 2)
    assert 5 not in out

    # forced chain: X~Y, Y~Z, X!~Z (transitivity is the point)
    chain = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "alpha beta gamma delta epsilon zeta iota kappa"),
            (12, "delta epsilon zeta iota kappa lambda mu nu"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(chain, threshold=0.3).collect()
    }
    assert (10, 11) in pairs and (11, 12) in pairs and (10, 12) not in pairs
    got = {
        r.id: (r.cluster_id, r.n_members)
        for r in dedup.near_dup_clusters(chain, threshold=0.3).collect()
    }
    assert got == {10: (10, 3), 11: (10, 3), 12: (10, 3)}


def test_near_dup_clusters_minhash_source_matches_exact(spark, dup_docs):
    """The clustering loop is pair-source-agnostic (VERDICT r4 #4):
    MinHash-LSH candidates verified with TRUE Jaccard produce the SAME
    components as the exact n-gram source at the same threshold (LSH
    only generates candidates; exact_verify makes the edge set equal
    wherever recall holds — which it does at these similarities), and
    a custom pairs_fn drives the identical loop."""
    exact = {
        (r.id, r.cluster_id, r.n_members)
        for r in dedup.near_dup_clusters(dup_docs, threshold=0.4).collect()
    }
    mh = {
        (r.id, r.cluster_id, r.n_members)
        for r in dedup.near_dup_clusters(
            dup_docs, threshold=0.4, method="minhash"
        ).collect()
    }
    assert mh == exact and len(exact) == 5

    # custom edge mining: same loop, caller-provided pair source
    custom = dedup.near_dup_clusters(
        dup_docs,
        pairs_fn=lambda d: dedup.ngram_jaccard_pairs(d, threshold=0.4),
    )
    assert {
        (r.id, r.cluster_id, r.n_members) for r in custom.collect()
    } == exact

    import pytest as _pt

    with _pt.raises(ValueError, match="pair method"):
        dedup.near_dup_clusters(dup_docs, method="cosine")


def test_hash_split_stable_and_proportional(spark, docs):
    """Split assignment is a pure function of (salt, id): stable across
    re-runs, proportions near the weights, a salt bump re-deals, and
    invalid weights raise."""
    import pytest as _pt

    from orc_spark.textops import analysis

    a = {r.id: r.split for r in analysis.hash_split(docs).collect()}
    b = {r.id: r.split for r in analysis.hash_split(docs).collect()}
    assert a == b  # deterministic
    n = len(a)
    from collections import Counter

    frac = {k: v / n for k, v in Counter(a.values()).items()}
    assert 0.8 < frac["train"] < 0.97
    assert 0.02 < frac.get("valid", 0) < 0.1
    assert 0.02 < frac.get("test", 0) < 0.1
    c = {r.id: r.split for r in analysis.hash_split(docs, salt="v2").collect()}
    assert c != a  # re-deal
    with _pt.raises(ValueError):
        analysis.hash_split(docs, weights=(0.5, 0.4), names=("a", "b", "c"))
    with _pt.raises(ValueError):
        analysis.hash_split_sql("t", weights=(0.5, 0.4, 0.2))


def test_stratified_sample_rates_and_stability(spark, docs):
    """Per-stratum keep rates land near the targets, keep decisions are
    a pure function of (salt, id) — re-runs and rate changes for OTHER
    strata never resample a kept doc — and bad rates raise."""
    from collections import Counter

    rates = {"en": 0.25, "zh": 0.6}
    kept = {r.id: r.stratum for r in
            analysis.stratified_sample(docs, rates=rates, default_rate=1.0).collect()}
    total = Counter(r.lang for r in docs.select(F.col("lang")).collect())
    got = Counter(kept.values())
    for lang, rate in rates.items():
        frac = got[lang] / total[lang]
        assert abs(frac - rate) < 0.12, (lang, frac)
    # non-listed strata keep default_rate=1.0 → all present
    for lang, n in total.items():
        if lang not in rates:
            assert got[lang] == n
    # stability: same salt → same keeps; changing ANOTHER stratum's rate
    # never flips en keep decisions (bucket is per-id, cut is per-stratum)
    again = {r.id for r in
             analysis.stratified_sample(docs, rates={"en": 0.25}, default_rate=0.0)
             .collect()}
    assert again == {i for i, s in kept.items() if s == "en"}
    with pytest.raises(ValueError):
        analysis.stratified_sample(docs, rates={"en": 1.5})
    with pytest.raises(ValueError):
        analysis.stratified_sample(docs, default_rate=-0.1)


def test_top_terms_document_frequency(spark):
    """Ranking is by DOCUMENT frequency: a term repeated many times in
    one doc counts once; ties break on term asc (total order)."""
    rows = [
        (1, "spam spam spam spam spam alpha"),
        (2, "alpha beta"),
        (3, "alpha beta gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = analysis.top_terms(df, k=3).collect()
    assert [(r.term, r.df) for r in out] == [("alpha", 3), ("beta", 2), ("gamma", 1)]


def test_decontaminate_flags_shingle_overlap(spark):
    """Train docs sharing a 5-token shingle with the eval set are
    flagged with the count of DISTINCT shared shingles; disjoint docs
    are absent; short docs fall back to whole-doc shingles."""
    eval_rows = [(100, "the quick brown fox jumps over the lazy dog")]
    train_rows = [
        # shares shingles: "the quick brown fox jumps", "quick brown fox jumps over", ...
        (1, "prefix the quick brown fox jumps over suffix"),
        (2, "totally unrelated words about columnar compression engines"),
        # short doc == whole-doc shingle, no overlap
        (3, "tiny doc"),
        # exact copy of the eval doc: shares all 5 of its shingles
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {r.id: r.n_shared for r in dedup.decontaminate(train, ev).collect()}
    assert set(got) == {1, 4}
    assert got[4] == 5  # 9 tokens → 5 shingles, all shared
    assert got[1] == 2  # "the quick brown fox jumps", "quick brown fox jumps over"


def test_semantic_purge_lsh_equals_exact(spark):
    """The purge rule runs on the exact pair set regardless of how
    candidates were found — LSH and exact methods must keep the same
    representatives at near-dup thresholds."""
    from orc_spark.textops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kept_lsh = sorted(
        r.vec_id
        for r in similarity.semantic_purge(
            emb, threshold=0.4, method="lsh"
        ).select("vec_id").collect()
    )
    kept_exact = sorted(
        r.vec_id
        for r in similarity.semantic_purge(
            emb, threshold=0.4, method="exact"
        ).select("vec_id").collect()
    )
    assert kept_lsh == kept_exact
    assert 0 < len(kept_exact) <= emb.count()


def test_dedup_against_drops_seeded_copies_only(spark):
    """Exact copies of base docs in the increment are dropped; genuinely
    new docs survive; the base itself is never touched."""
    from pyspark.sql import functions as F

    from orc_spark.textops import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 200)
    # increment: 100 fresh docs + 5 exact copies of base docs
    copies = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    fresh = docs.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 300)
    )
    new = fresh.unionByName(copies)
    kept = dedup.dedup_against(new, base, threshold=0.9, df_cap=None)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert not any(i >= 10000 for i in kept_ids)  # copies dropped
    # fresh docs survive unless they genuinely near-dup a base doc —
    # count survivors against the exact rule
    assert len(kept_ids) >= 90


def test_script_profile_dominance_and_clean_flag(spark):
    from orc_spark.textops import analysis

    df = spark.createDataFrame(
        [
            (1, "hello world"),                    # pure latin, clean
            (2, "привет мир"),                     # pure cyrillic
            (3, "hello привет мир дорогой"),       # cyrillic-dominant mix
            (4, "1234 !!!"),                       # no scripted chars
            (5, "a" * 100 + " б"),                 # 1% foreign: still clean
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in analysis.script_profile(df).collect()}
    assert rows[1].dominant == "latin" and rows[1].clean_script
    assert rows[2].dominant == "cyrillic" and rows[2].clean_script
    assert rows[3].dominant == "cyrillic" and not rows[3].clean_script
    assert rows[4].dominant == "none" and not rows[4].clean_script
    assert rows[5].dominant == "latin" and rows[5].clean_script
    assert rows[3].n_latin == 5 and rows[3].n_cyrillic == 16


def test_script_profile_tie_breaks_alphabetically(spark):
    from orc_spark.textops import analysis

    df = spark.createDataFrame(
        [(1, "ab пр")], "doc_id long, text string"
    )  # 2 latin, 2 cyrillic -> cyrillic < latin alphabetically
    row = analysis.script_profile(df).collect()[0]
    assert row.dominant == "cyrillic"


def test_readability_known_score(spark):
    from orc_spark.textops import analysis

    # "the cat sat. the dog ran!" -> 6 words, 2 sentences,
    # 6 vowel groups: 206.835 - 1.015*3 - 84.6*1 = 119.19
    df = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!")], "doc_id long, text string"
    )
    row = analysis.readability(df).collect()[0]
    assert (row.n_words, row.n_sentences, row.n_syllables) == (6, 2, 6)
    assert abs(row.flesch - 119.19) < 1e-9

    # punctuation-free fragment floors sentences at 1
    row2 = analysis.readability(
        spark.createDataFrame([(1, "word")], "doc_id long, text string")
    ).collect()[0]
    assert row2.n_sentences == 1


def test_token_budget_sample_mixture_semantics(spark):
    from orc_spark.textops import analysis

    rows = [
        (i, ["a", "b", "c"][i % 3], "w " * 10) for i in range(300)
    ]  # 100 docs x 10 tokens per domain
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = analysis.token_budget_sample(
        df, 1000, {"a": 3.0, "b": 1.0}
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    # c has no weight: dropped entirely
    assert set(by_dom) <= {"a", "b"}
    # a's target = 750 of its 1000 tokens -> rate .75; b: 250 -> .25
    n_a, n_b = len(by_dom.get("a", [])), len(by_dom.get("b", []))
    assert 55 <= n_a <= 95, n_a
    assert 10 <= n_b <= 45, n_b
    # deterministic: same salt, same keep-set
    again = analysis.token_budget_sample(df, 1000, {"a": 3.0, "b": 1.0})
    assert [r.id for r in again.collect()] == [r.id for r in out]
    # rate caps at 1: a huge budget keeps every weighted doc
    full = analysis.token_budget_sample(df, 10**9, {"a": 1.0})
    assert full.count() == 100


def test_ivf_index_persists_and_prunes_partitions(spark, tmp_path):
    """The persisted IVF index equals the in-query IVF result, and a
    probe's scan carries the list filter as a PARTITION filter
    (directory skip), not a data filter."""
    import numpy as np

    from orc_spark.textops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding").first().embedding
    ]
    idx = str(tmp_path / "ivf")
    cent = similarity.ivf_build_index(spark, emb, idx, n_lists=4)
    got = similarity.ivf_query_index(spark, idx, q, k=5, nprobe=2)
    want = similarity.ivf_topk(emb, q, cent, k=5, nprobe=2)
    assert [r.id for r in got.collect()] == [r.id for r in want.collect()]

    qn = np.asarray(q)
    d = ((cent - qn[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:2]]
    cand = spark.read.parquet(idx + "/vectors").filter(
        F.col("_ivf_list").isin(probe)
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "_ivf_list" in pf[0], plan[:1500]


def test_hash_embed_unit_norm_and_ann_composability(spark):
    import math

    from orc_spark.textops import similarity

    df = spark.createDataFrame(
        [
            (1, "spark rows columns spark"),
            (2, "spark rows columns spark"),   # identical text
            (3, "completely different words here"),
            (4, ""),                            # no tokens: dropped
        ],
        "doc_id long, text string",
    )
    out = {r.id: r.embedding for r in similarity.hash_embed(df, dim=16).collect()}
    assert set(out) == {1, 2, 3}
    for v in out.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-12
        assert len(v) == 16
    assert out[1] == out[2]          # deterministic
    assert out[1] != out[3]
    # composes with the ANN stack: identical doc is the top cosine hit
    emb = spark.createDataFrame(
        [(k, v) for k, v in out.items()], "vec_id long, embedding array<double>"
    )
    top = similarity.brute_force_topk(emb, out[1], k=2).collect()
    assert {top[0].id, top[1].id} == {1, 2}
    assert abs(top[0].cosine - 1.0) < 1e-9


def test_dedup_index_build_probe_and_append(spark, tmp_path):
    """The persisted index reproduces dedup_against; append mode
    admits kept docs so the NEXT increment is gated against them."""
    from orc_spark.textops import dedup

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five six")],
        "doc_id long, text string",
    )
    inc1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon"),   # dup of 1 -> dropped
         (11, "totally novel content right here")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    info = dedup.dedup_index_build(spark, base, idx, df_cap=None)
    assert info["docs"] == 2 and info["postings"] > 0
    kept1 = dedup.dedup_index_probe(spark, idx, inc1)
    assert [r.doc_id for r in kept1.orderBy("doc_id").collect()] == [11]
    # matches the recompute-everything path
    want = dedup.dedup_against(inc1, base, df_cap=None)
    assert sorted(r.doc_id for r in want.collect()) == [11]

    # admit the survivors, then a copy of doc 11 must be caught
    dedup.dedup_index_build(spark, kept1, idx, df_cap=None, mode="append")
    inc2 = spark.createDataFrame(
        [(20, "totally novel content right here"),
         (21, "yet another fresh document body")],
        "doc_id long, text string",
    )
    kept2 = dedup.dedup_index_probe(spark, idx, inc2)
    assert [r.doc_id for r in kept2.orderBy("doc_id").collect()] == [21]


def test_fuzzy_value_pairs_blocking_complete_at_distance_one(spark):
    from orc_spark.textops import analysis

    df = spark.createDataFrame(
        [("kitten",), ("sitten",), ("sittn",), ("mitten",), ("banana",),
         ("bananas",), ("banan",), ("x" * 65,), ("x" * 65 + "y",), (None,)],
        "source string",
    )
    got = {
        (r.val_a, r.val_b)
        for r in analysis.fuzzy_value_pairs(df, "source").collect()
    }
    # substitutions, deletions, insertions at distance exactly <= 1;
    # the 65-char values are over max_len and excluded; null ignored
    assert got == {
        ("kitten", "mitten"), ("kitten", "sitten"),
        ("sitten", "sittn"), ("mitten", "sitten"),
        ("banana", "bananas"), ("banan", "banana"),
    }, got


def test_clean_text_normalizes_and_is_idempotent(spark):
    from orc_spark.textops import analysis

    df = spark.createDataFrame(
        [
            (1, "  a b\t\tc  "),
            (2, "‘x’ and “y” – z — w"),
            (3, "bell\x07 and\x00nul"),
            (4, "already clean"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in analysis.clean_text(df).collect()}
    assert got == {
        1: "a b c",
        2: "'x' and \"y\" - z - w",
        3: "bell andnul",
        4: "already clean",
    }, got
    # idempotent: cleaning cleaned text is the identity
    again = {
        r.doc_id: r.text
        for r in analysis.clean_text(
            spark.createDataFrame(
                [(k, v) for k, v in got.items()], "doc_id long, text string"
            )
        ).collect()
    }
    assert again == got


def test_pii_inventory_counts_and_agrees_with_scrub(spark):
    from orc_spark.textops import analysis

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c@d.org ip 10.0.0.1 call +1-555-123-4567"),
            (2, "totally clean prose"),
            (3, "server at 192.168.0.1 and 10.0.0.2"),
        ],
        "doc_id long, text string",
    )
    inv = {r.id: r for r in analysis.pii_inventory(df).collect()}
    assert (inv[1].n_email, inv[1].n_ipv4, inv[1].n_phone) == (2, 1, 1)
    assert inv[2].pii_free and not inv[1].pii_free
    assert (inv[3].n_email, inv[3].n_ipv4) == (0, 2)
    # inventory totals == scrub redaction totals, per doc
    scrub = {r.id: r.n_redactions for r in analysis.pii_scrub(df).collect()}
    for i, r in inv.items():
        assert r.n_email + r.n_ipv4 + r.n_phone == scrub[i], i


def test_quality_deciles_bucketing(spark):
    from orc_spark.textops import analysis

    # 20 docs with strictly increasing token counts -> d_tokens spans
    # deciles monotonically; constant ttr/wlen collapse to one decile
    rows = [(i, "tok " * (i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in analysis.quality_deciles(df).collect()}
    assert out[0].d_tokens == 1 and out[19].d_tokens == 10
    ds = [out[i].d_tokens for i in range(20)]
    assert ds == sorted(ds)
    # ttr = 1/(i+1): strictly decreasing -> deciles reverse-monotone
    dt = [out[i].d_ttr for i in range(20)]
    assert dt == sorted(dt, reverse=True)
    # mean word length is constant ("tok"): every tie lands decile 1
    assert {out[i].d_wlen for i in range(20)} == {1}
    assert abs(out[19].ensemble_r - (10 + 1 + 1) / 3.0) < 1e-6


def test_exact_dedup_by_keeper_policy(spark):
    """Policy keeper: prefer the higher score (via negation), then the
    lower id on ties — and the result genuinely differs from min-id."""
    from pyspark.sql import functions as F

    from orc_spark.textops import dedup

    df = spark.createDataFrame(
        [
            (1, "aaa", 0.2),
            (2, "aaa", 0.9),   # higher score wins over lower id
            (3, "aaa", 0.9),   # tie -> lower id among the tied
            (10, "bbb", 0.5),  # singleton keeps itself
        ],
        "doc_id bigint, text string, score double",
    )
    got = {
        r.keeper_id: r.n_copies
        for r in dedup.exact_dedup_by(
            df, prefer=[-F.col("score")]
        ).collect()
    }
    assert got == {2: 3, 10: 1}
    plain = {
        r.keeper_id for r in dedup.exact_dedup(df).collect()
    }
    assert plain == {1, 10}  # min-id picks a different keeper
    # no prefer columns -> degenerates to exact_dedup's min-id rule
    degen = {
        r.keeper_id for r in dedup.exact_dedup_by(df).collect()
    }
    assert degen == {1, 10}


def test_rrf_fuse_known_values(spark):
    """Hand-checked RRF: ranks from (score desc, id), 1/(60+r) sums,
    docs missing from one list still fuse via the other."""
    from orc_spark.textops import analysis

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "id bigint, s double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "id bigint, q double"
    )
    got = {r.id: r.rrf for r in analysis.rrf_fuse([a, b], top=10).collect()}
    assert got == {
        1: round(1 / 61, 6),
        2: round(1 / 62 + 1 / 61, 6),
        3: round(1 / 63, 6),
        4: round(1 / 62, 6),
    }
    # doc 2 (present in both) outranks everything
    order = [
        r.id for r in analysis.rrf_fuse([a, b], top=2).collect()
    ]
    assert order[0] == 2
