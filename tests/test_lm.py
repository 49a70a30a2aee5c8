"""Bigram-LM perplexity scoring (operators/lm.py): hand-computed exact
decimals on a tiny corpus, a full DuckDB differential replaying the
train+score pipeline on the documents table, deterministic pruning, and
the bucketing paths (exact ntile vs quantile cutoffs)."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import lm
from tests.conftest import SF_SMOKE


def _r6(x: float) -> Decimal:
    return Decimal(str(round(x, 6)))


def _docs(spark):
    from apache_pinot_spark.catalog import load_tables

    return load_tables(spark, SF_SMOKE, ["documents"])["documents"]


def test_tiny_corpus_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "z z"), (4, "")],
        "doc_id int, text string",
    )
    model = lm.train_bigram_lm(docs.filter("doc_id <= 2"), vocab_size=10)
    # reference tokens: a b a | a c -> a:3 b:1 c:1, T=5, V=3, denom=9
    assert model.total_tokens == 5 and model.vocab_size == 3
    uni = {r.w: r.logp_uni for r in model.unigrams.collect()}
    assert uni["a"] == _r6(math.log(4 / 9))
    assert uni["b"] == uni["c"] == _r6(math.log(2 / 9))
    big = {(r.prev, r.w): r.logp for r in model.bigrams.collect()}
    # (a,b):1/3  (b,a):1/1  (a,c):1/3 — denominators are TRUE prev counts
    assert big[("a", "b")] == big[("a", "c")] == _r6(math.log(1 / 3))
    assert big[("b", "a")] == Decimal("0")
    assert model.logp_oov == _r6(math.log(1 / 9))
    assert model.backoff_logp == _r6(math.log(0.4))

    out = {r.doc_id: r for r in lm.lm_doc_scores(docs, model).collect()}
    # d1 "a b a": uni(a) + big(a,b) + big(b,a)
    assert out[1].n_tokens == 3
    assert out[1].sum_logp == _r6(math.log(4 / 9)) + _r6(math.log(1 / 3))
    # d2 "a c": uni(a) + big(a,c)
    assert out[2].sum_logp == _r6(math.log(4 / 9)) + _r6(math.log(1 / 3))
    # d3 "z z": OOV first token, then backoff + OOV
    assert out[3].n_tokens == 2
    assert out[3].sum_logp == 2 * _r6(math.log(1 / 9)) + _r6(math.log(0.4))
    # d4 empty: n=0, zero sum, NULL avg — document survives scoring
    assert out[4].n_tokens == 0 and out[4].sum_logp == 0
    assert out[4].avg_logp is None
    # avg is the one double division
    assert out[1].avg_logp == pytest.approx(float(out[1].sum_logp) / 3)
    # the backoff-heavy OOV doc is least reference-like
    assert out[3].avg_logp < out[1].avg_logp


def test_pruning_is_deterministic_under_ties(spark):
    # four tokens, all count 1 -> vocab_size=2 must keep the two
    # lexicographically smallest
    docs = spark.createDataFrame([(1, "d c b a")], "doc_id int, text string")
    model = lm.train_bigram_lm(docs, vocab_size=2, bigram_size=2)
    assert sorted(r.w for r in model.unigrams.collect()) == ["a", "b"]
    # bigrams (d,c) (c,b) (b,a) all count 1 -> keep (b,a) and (c,b)
    assert sorted((r.prev, r.w) for r in model.bigrams.collect()) == [
        ("b", "a"), ("c", "b")
    ]


def test_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        lm.train_bigram_lm(docs, vocab_size=0)
    with pytest.raises(ValueError, match="backoff"):
        lm.train_bigram_lm(docs, backoff=0.0)
    with pytest.raises(ValueError, match="buckets"):
        lm.perplexity_buckets(docs.withColumn("avg_logp", F.lit(0.0)), buckets=0)


def test_duckdb_differential_on_documents(spark):
    """Full train+score replay in DuckDB on the sf-smoke documents table
    (reference = lang='en' subset, scored corpus = every document):
    n_tokens and the DECIMAL sum_logp must match string-exactly."""
    import duckdb

    docs = _docs(spark)
    model = lm.train_bigram_lm(
        docs.filter(F.col("lang") == "en"), vocab_size=500, bigram_size=1000
    )
    got = {
        r.doc_id: (r.n_tokens, str(r.sum_logp))
        for r in lm.lm_doc_scores(docs, model).collect()
    }

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    t, v = model.total_tokens, model.vocab_size
    sql = f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    uc AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(t) AS w FROM toks WHERE lang = 'en'
      ) GROUP BY w
    ),
    uni AS (
      SELECT w, CAST(round(ln((c + 1.0) / ({t} + {v} + 1.0)), 6)
                     AS DECIMAL(26,12)) AS logp_uni
      FROM (SELECT w, c FROM uc ORDER BY c DESC, w ASC LIMIT 500)
    ),
    pairs AS (
      SELECT doc_id, lang, t[i] AS prev, t[i+1] AS w
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i) s
    ),
    big AS (
      SELECT prev, w, CAST(round(ln(bc * 1.0 / pc), 6) AS DECIMAL(26,12)) AS logp
      FROM (
        SELECT b.prev, b.w, b.bc, u.c AS pc
        FROM (SELECT prev, w, count(*) AS bc FROM pairs
              WHERE lang = 'en' GROUP BY prev, w) b
        JOIN uc u ON u.w = b.prev
        ORDER BY b.bc DESC, b.prev ASC, b.w ASC LIMIT 1000
      )
    ),
    pos AS (
      SELECT doc_id, CAST(NULL AS VARCHAR) AS prev, t[1] AS w
      FROM toks WHERE len(t) >= 1
      UNION ALL
      SELECT doc_id, prev, w FROM pairs
    ),
    sc AS (
      SELECT p.doc_id,
             CASE WHEN big.logp IS NOT NULL THEN big.logp
                  WHEN p.prev IS NULL THEN
                    coalesce(uni.logp_uni, CAST({model.logp_oov} AS DECIMAL(26,12)))
                  ELSE CAST({model.backoff_logp} AS DECIMAL(26,12))
                     + coalesce(uni.logp_uni, CAST({model.logp_oov} AS DECIMAL(26,12)))
             END AS lp
      FROM pos p
      LEFT JOIN big ON big.prev = p.prev AND big.w = p.w
      LEFT JOIN uni ON uni.w = p.w
    ),
    agg AS (
      SELECT doc_id, count(*) AS n, CAST(sum(lp) AS DECIMAL(38,12)) AS s
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(agg.n, 0) AS n,
           CAST(coalesce(agg.s, 0) AS DECIMAL(38,12)) AS s
    FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """
    want = {r[0]: (r[1], str(r[2])) for r in con.sql(sql).fetchall()}
    assert set(got) == set(want)
    bad = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not bad, dict(list(bad.items())[:3])
    # sanity: both backoff and true-bigram paths fired somewhere
    assert model.bigrams.count() > 0
    assert any(n > 0 for n, _ in got.values())


def test_perplexity_buckets_exact_and_quantile(spark):
    docs = _docs(spark)
    model = lm.train_bigram_lm(
        docs.filter(F.col("lang") == "en"), vocab_size=500, bigram_size=1000
    )
    scores = lm.lm_doc_scores(docs, model)
    exact = lm.perplexity_buckets(scores, buckets=3).collect()
    n = len(exact)
    sizes = {b: sum(1 for r in exact if r.bucket == b) for b in (1, 2, 3)}
    assert sum(sizes.values()) == n and max(sizes.values()) - min(sizes.values()) <= 1
    # bucket 1 = most reference-like: its mean avg_logp dominates bucket 3
    m1 = sum(r.avg_logp for r in exact if r.bucket == 1) / sizes[1]
    m3 = sum(r.avg_logp or -99 for r in exact if r.bucket == 3) / sizes[3]
    assert m1 > m3
    # the fence: exact path refuses oversized corpora
    with pytest.raises(ValueError, match="max_exact_n"):
        lm.perplexity_buckets(scores, buckets=3, max_exact_n=5)
    # quantile path: same shape, no global sort, sizes approximately even
    approx = lm.perplexity_buckets(scores, buckets=3, exact=False).collect()
    asizes = {b: sum(1 for r in approx if r.bucket == b) for b in (1, 2, 3)}
    assert sum(asizes.values()) == n
    assert all(v > 0 for v in asizes.values())
