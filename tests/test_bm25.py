"""BM25 retrieval (operators/bm25.py): hand-computed scores on a tiny
fixture, DuckDB oracle parity on the real documents table (float-exact
to 1e-9 and rank-exact), tie-break determinism, tokenizer consistency,
and plan hygiene (no corpus-wide unfiltered shuffles)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_pinot_spark.operators import bm25 as B

SF = "/root/testdata/sf0.001"

#: deterministic word-soup corpus for the multi-query tests
_VOCAB = ["table", "scan", "join", "key", "sort", "fast", "row",
          "hash", "merge", "window", "agg", "filter"]


def _corpus(spark, texts=None):
    if texts is None:
        texts = [" ".join(_VOCAB[(i * j) % 12] for j in range(3, 18))
                 for i in range(60)]
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


def test_multi_query_matches_single_query_path(spark):
    """The batched form's per-query results equal the single-query
    path's (same idf/tf arithmetic; float sums agree to 1e-12; ranks
    and matched-term counts exact)."""
    from apache_pinot_spark.operators.bm25 import (bm25_scores,
                                                   bm25_scores_multi)

    d = _corpus(spark)
    queries = {"q_scan": "table scan fast",
               "q_join": "hash join merge",
               "q_win": "window sort key"}
    multi = bm25_scores_multi(d, queries, top_k=5).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, q in queries.items():
        single = bm25_scores(d, q, top_k=5).collect()
        got = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.doc_id for r in got] == [r.doc_id for r in single], qid
        assert [r.n_matched_terms for r in got] == \
            [r.n_matched_terms for r in single], qid
        for g, s in zip(got, single):
            assert abs(g.score - s.score) < 1e-12, (qid, g, s)


def test_multi_query_thousand_queries_one_pass(spark):
    """1000 queries complete in one batched job (the SCALE shape); the
    per-query top-k is bounded and ranks are dense from 1."""
    from apache_pinot_spark.operators.bm25 import bm25_scores_multi

    d = _corpus(spark)
    vocab = ["table", "scan", "join", "key", "sort", "fast", "row",
             "hash", "merge", "window"]
    queries = {f"q{i}": f"{vocab[i % 10]} {vocab[(i // 10) % 10]}"
               for i in range(1000)}
    out = bm25_scores_multi(d, queries, top_k=3)
    rows = out.groupBy("query_id").count().collect()
    assert len(rows) == 1000
    assert all(r["count"] <= 3 for r in rows)
    one = sorted((r.rank for r in out.where(F.col("query_id") == "q7")
                  .collect()))
    assert one == list(range(1, len(one) + 1))


def test_multi_query_validation(spark):
    from apache_pinot_spark.operators.bm25 import bm25_scores_multi

    d = _corpus(spark)
    with pytest.raises(ValueError, match="no tokens"):
        bm25_scores_multi(d, {"bad": "!!!"})
    with pytest.raises(ValueError, match="no queries"):
        bm25_scores_multi(d, {})
