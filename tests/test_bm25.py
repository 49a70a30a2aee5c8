"""BM25 retrieval (operators/bm25.py): hand-computed scores on a tiny
fixture, DuckDB oracle parity on the real documents table (float-exact
to 1e-9 and rank-exact), tie-break determinism, tokenizer consistency,
and plan hygiene (no corpus-wide unfiltered shuffles)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from apache_pinot_spark.operators import bm25 as B

SF = "/root/testdata/sf0.001"


def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_hand_computed_scores(spark):
    texts = ["cat cat dog", "cat mouse", "bird bird bird", "dog"]
    df = _corpus(spark, texts)
    got = {r.doc_id: r.score
           for r in B.bm25_scores(df, "cat dog", top_k=10).collect()}
    # reference: N=4, avgdl = (3+2+3+1)/4 = 2.25
    n, avgdl, k1, b = 4, 2.25, 1.2, 0.75

    def idf(dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    def part(tf, dl, dfreq):
        return idf(dfreq) * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / avgdl))

    expect = {
        0: part(2, 3, 2) + part(1, 3, 2),  # cat ×2, dog ×1 (df=2 each)
        1: part(1, 2, 2),
        3: part(1, 1, 2),
    }
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-12, k


def test_query_terms_tokenizer_consistency():
    assert B.query_terms("The CAT, the cat's dog!") == \
        ["the", "cat", "s", "dog"]
    assert B.query_terms("!!!") == []


def test_empty_query_rejects(spark):
    with pytest.raises(ValueError, match="no tokens"):
        B.bm25_scores(_corpus(spark, ["x"]), "—…!!")


def test_duckdb_oracle_parity(spark, duck):
    """Spark scores == the SQL replay on the real documents table:
    same ranking, same floats (stringified to 9 dp)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    query = "data processing pipeline quality"
    got = B.bm25_scores(docs, query, top_k=15).collect()
    oracle = duck.sql(B.bm25_oracle_sql(query, top_k=15)).fetchall()
    assert len(got) == len(oracle) > 0
    for s_row, o_row in zip(got, oracle):
        assert s_row.doc_id == o_row[0]
        assert abs(s_row.score - o_row[1]) < 1e-9
        assert s_row.n_matched_terms == o_row[2]


def test_tie_break_deterministic(spark):
    texts = ["alpha", "alpha", "alpha"]  # identical docs → equal scores
    df = _corpus(spark, texts)
    a = [r.doc_id for r in B.bm25_scores(df, "alpha", top_k=3).collect()]
    c = [r.doc_id for r in B.bm25_scores(df.repartition(5), "alpha",
                                         top_k=3).collect()]
    assert a == c == [0, 1, 2]


def test_top_k_limits_and_rank_order(spark, duck):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    top3 = B.bm25_scores(docs, "the and of", top_k=3).collect()
    assert len(top3) == 3
    assert top3[0].score >= top3[1].score >= top3[2].score
