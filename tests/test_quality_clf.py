"""Quality classifier (operators/quality_clf.py): separable-corpus
convergence, a ONE-STEP gradient equivalence check against an
independent numpy implementation of the same math, DuckDB SQL replay of
scoring on the md5 bucket convention, and plan shape."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from apache_pinot_spark.operators import quality_clf as Q

_GOOD_WORDS = ("history", "science", "article", "research", "theory",
               "evidence", "chapter", "analysis")
_JUNK_WORDS = ("click", "buy", "cheap", "casino", "winner", "prize",
               "viagra", "lottery")


def _corpus(spark, n=40):
    rows = []
    for i in range(n):
        words = _GOOD_WORDS if i % 2 == 0 else _JUNK_WORDS
        text = " ".join(words[(i + j) % len(words)] for j in range(30))
        rows.append((i, text, "wiki" if i % 2 == 0 else "crawl"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def _labels(spark, n=40):
    return spark.createDataFrame([(i, 1 - i % 2) for i in range(n)],
                                 "doc_id bigint, label int")


def test_separable_corpus_converges(spark):
    docs, labels = _corpus(spark), _labels(spark)
    model = Q.train_quality_classifier(docs, labels, iters=30, lr=25.0)
    assert model.train_loss[-1] < model.train_loss[0]
    assert model.train_loss[-1] < 0.2
    scored = Q.score_quality(docs, model).collect()
    acc = sum(1 for r in scored
              if (r.quality_prob > 0.5) == (r.doc_id % 2 == 0)) / len(scored)
    assert acc >= 0.95


def _py_features(text, n=2, hash_chars=3):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    grams = list(toks)
    for k in range(2, n + 1):
        grams += [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    feats = {}
    for g in grams:
        b = hashlib.md5(g.encode()).hexdigest()[:hash_chars]
        feats[b] = feats.get(b, 0) + 1
    total = sum(feats.values())
    return {b: c / total for b, c in feats.items()}


def test_one_step_gradient_matches_numpy(spark):
    docs, labels = _corpus(spark, n=10), _labels(spark, n=10)
    lr, l2 = 1.5, 1e-4
    model = Q.train_quality_classifier(docs, labels, iters=1, lr=lr, l2=l2)
    # independent replication: with w=0, b=0 every margin is 0, prob .5
    rows = docs.collect()
    ys = {r.doc_id: 1 - r.doc_id % 2 for r in rows}
    grad, gb, n_docs = {}, 0.0, len(rows)
    for r in rows:
        res = 0.5 - ys[r.doc_id]
        gb += res
        for b, tf in _py_features(r.text).items():
            grad[b] = grad.get(b, 0.0) + tf * res
    exp_bias = -lr * (gb / n_docs)
    assert math.isclose(model.bias, exp_bias, rel_tol=1e-9)
    exp_w = {b: -lr * (g / n_docs) for b, g in grad.items()}
    assert set(model.weights) == {b for b, v in exp_w.items() if v != 0.0}
    for b, v in model.weights.items():
        assert math.isclose(v, exp_w[b], rel_tol=1e-9, abs_tol=1e-12)
    # and the first recorded loss is log 2 exactly (all probs were .5)
    assert math.isclose(model.train_loss[0], math.log(2.0), rel_tol=1e-12)


def test_scoring_replays_in_duckdb(spark):
    import duckdb

    docs, labels = _corpus(spark), _labels(spark)
    model = Q.train_quality_classifier(docs, labels, iters=5, lr=4.0)
    ours = {r.doc_id: r.quality_prob
            for r in Q.score_quality(docs, model).collect()}
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    con.register("w", __import__("pandas").DataFrame(
        {"bucket": list(model.weights), "w": list(model.weights.values())}))
    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM docs
    ), grams AS (
      SELECT doc_id, unnest(list_concat(
        t,
        CASE WHEN len(t) >= 2 THEN
          list_transform(generate_series(1, len(t) - 1),
                         i -> t[i] || ' ' || t[i + 1])
        ELSE [] END)) AS g
      FROM toks
    ), bucketed AS (
      SELECT doc_id, substring(md5(g), 1, 3) AS bucket FROM grams
    )
    SELECT doc_id,
           1.0 / (1.0 + exp(-(COALESCE(SUM(w.w), 0) / COUNT(*)
                              + {model.bias!r}))) AS prob
    FROM bucketed LEFT JOIN w USING (bucket)
    GROUP BY doc_id
    """
    for doc_id, prob in con.sql(sql).fetchall():
        assert abs(ours[doc_id] - prob) < 1e-9


def test_zero_feature_doc_scores_sigmoid_bias(spark):
    docs = spark.createDataFrame(
        [(1, "science research theory evidence"), (2, "!!! ??? ...")],
        "doc_id bigint, text string")
    model = Q.QualityModel(weights={"abc": 1.0}, bias=-0.4)
    got = {r.doc_id: r.quality_prob
           for r in Q.score_quality(docs, model).collect()}
    assert math.isclose(got[2], 1 / (1 + math.exp(0.4)), rel_tol=1e-12)


def test_weak_labels_from_sources(spark):
    docs = _corpus(spark, n=8)
    lab = Q.weak_labels_from_sources(docs, positive_sources=["wiki"],
                                     negative_sources=["crawl"])
    got = {r.doc_id: r.label for r in lab.collect()}
    assert all(got[i] == (1 if i % 2 == 0 else 0) for i in range(8))
    # None = everything else is negative
    lab2 = Q.weak_labels_from_sources(docs, positive_sources=["wiki"])
    assert lab2.count() == 8


def test_scoring_plan_shape(spark):
    docs = _corpus(spark)
    model = Q.QualityModel(weights={"abc": 1.0, "def": -1.0}, bias=0.1)
    plan = Q.score_quality(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
