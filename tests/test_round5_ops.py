"""Round-5 operators: int8 embedding quantization, inverted index,
host-level link graph. Oracle parity runs in test_oracle_parity; these
check the operator-level invariants the SQL twin can't express."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_spark.textops import analysis, extraction, similarity
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestQuantizeInt8:
    def test_codes_in_range_and_dequant_error_bounded(self, spark, embeddings):
        q = similarity.quantize_int8(embeddings)
        joined = q.join(embeddings, "vec_id").select(
            "vec_id", "qvec", "scale", "embedding"
        )
        rows = joined.collect()
        assert rows
        for r in rows:
            qv = np.array(r.qvec, dtype=np.int64)
            assert qv.min() >= -127 and qv.max() <= 127
            x = np.array(r.embedding, dtype=np.float64)
            err = np.abs(qv * r.scale - x)
            # symmetric SQ8: |dequant - x| <= scale/2 per element
            assert err.max() <= r.scale / 2 + 1e-12

    def test_zero_vector_quantizes_to_zero(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
        r = similarity.quantize_int8(df).collect()[0]
        assert list(r.qvec) == [0, 0, 0] and r.scale == 0.0

    def test_max_abs_element_maps_to_127(self, spark):
        df = spark.createDataFrame(
            [(1, [0.5, -2.0, 1.0])], "vec_id long, embedding array<float>"
        )
        r = similarity.quantize_int8(df).collect()[0]
        assert r.qvec[1] == -127  # the max-|x| element hits the rail


class TestInvertedIndex:
    def test_cap_filters_terms_never_truncates_postings(self, spark):
        # controlled dfs: term "t<k>" appears in docs 0..k-1
        rows = [
            (d, " ".join(f"term{k}" for k in range(1, 13) if d < k))
            for d in range(12)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        idx = analysis.inverted_index(df, min_df=2, df_cap=8).collect()
        assert idx
        got = {r.term: r for r in idx}
        assert set(got) == {f"term{k}" for k in range(2, 9)}  # 2<=df<=8
        for r in idx:
            assert 2 <= r.df <= 8
            # complete lists: length equals df, sorted ascending
            assert len(r.postings) == r.df
            assert list(r.postings) == sorted(r.postings)

    def test_real_corpus_nonempty(self, documents):
        idx = analysis.inverted_index(documents, df_cap=400).collect()
        assert idx
        assert all(len(r.postings) == r.df for r in idx)

    def test_df_counts_documents_not_occurrences(self, spark):
        df = spark.createDataFrame(
            [(1, "apple apple apple"), (2, "apple pie")],
            "doc_id long, text string",
        )
        idx = {r.term: r for r in analysis.inverted_index(
            df, min_df=1, df_cap=100
        ).collect()}
        assert idx["apple"].df == 2  # per-doc distinct caps the vote
        assert list(idx["apple"].postings) == [1, 2]


class TestLinkGraph:
    def test_extracts_hosts_and_counts_edges(self, spark):
        df = spark.createDataFrame(
            [
                (
                    "https://src.one/page",
                    '<a href="https://DST.two/a">x</a>'
                    '<a href="https://dst.two/b">y</a>'
                    '<a href="relative/no-scheme">z</a>',
                ),
                ("no-scheme-url", '<a href="https://dst.two/c">w</a>'),
            ],
            "url string, html string",
        )
        edges = {
            (r.src_host, r.dst_host): r.n_links
            for r in extraction.link_graph(df).collect()
        }
        # host lowercased, both same-page links folded into one edge;
        # schemeless hrefs and schemeless source urls drop out
        assert edges == {("src.one", "dst.two"): 2}

    def test_binary_html_decodes(self, spark):
        df = spark.createDataFrame(
            [("https://s.a/", '<a href="https://d.b/">x</a>'.encode())],
            "url string, html binary",
        )
        rows = extraction.link_graph(df).collect()
        assert [(r.src_host, r.dst_host, r.n_links) for r in rows] == [
            ("s.a", "d.b", 1)
        ]
