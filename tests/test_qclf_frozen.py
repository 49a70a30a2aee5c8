"""Frozen model-quality artifact (operators/qclf_frozen.py): class
separation with wide margins on the synthesized fixture corpus, SQL
replay parity of the scoring margins, marker-tail SQL/engine equality,
and the gate decision's threshold placement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators.qclf_frozen import (
    FROZEN_BIAS,
    FROZEN_MARGIN_THRESHOLD,
    FROZEN_MIN_PROB,
    FROZEN_WEIGHTS,
    frozen_quality_model,
    marker_tail_expr,
    marker_tail_sql,
    weights_values_sql,
)

SF = "/root/testdata/sf0.001"


def _tailed_docs(spark):
    from apache_pinot_spark.catalog import load_tables

    d = load_tables(spark, SF, ["documents"])["documents"] \
        .select("doc_id", "text")
    return d.withColumn(
        "text", F.concat("text", F.lit(" "),
                         marker_tail_expr(F.col("doc_id"))))


def test_class_margins_separate_wide(spark):
    """Every spam-tailed doc scores below the threshold, every
    reference-tailed doc above, with >= 0.02 margin headroom on both
    sides (the drift-proofing the gate depends on)."""
    from apache_pinot_spark.operators.quality_clf import score_quality

    d = _tailed_docs(spark)
    sc = score_quality(d, frozen_quality_model()).withColumn(
        "neg", F.col("doc_id") % 3 == 0)
    rows = sc.select("neg", "margin").collect()
    neg = [r.margin for r in rows if r.neg]
    pos = [r.margin for r in rows if not r.neg]
    assert max(neg) < FROZEN_MARGIN_THRESHOLD - 0.02
    assert min(pos) > FROZEN_MARGIN_THRESHOLD + 0.02


def test_threshold_probability_consistent():
    import math

    assert FROZEN_MIN_PROB == pytest.approx(
        1.0 / (1.0 + math.exp(-FROZEN_MARGIN_THRESHOLD)), abs=1e-4)
    assert len(FROZEN_WEIGHTS) > 500  # a real trained table, not a stub
    assert all(len(k) == 3 for k in FROZEN_WEIGHTS)  # md5 hash_chars=3


def test_scoring_margin_sql_replay(spark, duck):
    """The DuckDB replay (hashed 1..2-gram tf against the weight
    VALUES literal) reproduces engine margins to float-sum tolerance
    and makes the IDENTICAL gate decision for every doc."""
    from apache_pinot_spark.operators.quality_clf import score_quality

    d = _tailed_docs(spark)
    eng = {r.doc_id: (float(r.margin),
                      float(r.quality_prob) >= FROZEN_MIN_PROB)
           for r in score_quality(d, frozen_quality_model()).collect()}
    rows = d.select("doc_id", "text").collect()
    duck.sql("CREATE OR REPLACE TABLE qf_docs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO qf_docs VALUES (?, ?)",
                     [(r.doc_id, r.text) for r in rows])
    got = duck.sql(f"""
      WITH t AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                     '[^a-z0-9]+'), x -> x <> '') AS t FROM qf_docs),
      g AS (
        SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM (
          SELECT doc_id, unnest(t) AS g FROM t
          UNION ALL
          SELECT doc_id, t[i] || ' ' || t[i+1]
          FROM t, LATERAL (SELECT unnest(generate_series(1,
                           greatest(len(t)-1, 0))) AS i) s)
      ),
      f AS (SELECT doc_id, bucket, count(*) AS c FROM g GROUP BY 1, 2),
      l AS (SELECT doc_id, sum(c) AS L FROM f GROUP BY 1),
      w(bucket, w) AS (VALUES {weights_values_sql()})
      SELECT f.doc_id,
             {FROZEN_BIAS} + coalesce(
               sum((CAST(f.c AS DOUBLE) / l.L) * w.w), 0) AS margin
      FROM f JOIN l USING (doc_id) LEFT JOIN w ON w.bucket = f.bucket
      GROUP BY f.doc_id
    """).fetchall()
    assert len(got) == len(eng)
    for doc_id, margin in got:
        em, edec = eng[doc_id]
        assert margin == pytest.approx(em, abs=1e-9), doc_id
        prob = 1.0 / (1.0 + __import__("math").exp(-margin))
        assert (prob >= FROZEN_MIN_PROB) == edec, doc_id


def test_marker_tail_sql_matches_engine(spark, duck):
    ids = list(range(0, 24))
    eng = {r.doc_id: r.tail for r in spark.createDataFrame(
        [(i,) for i in ids], "doc_id long").select(
        "doc_id", marker_tail_expr(F.col("doc_id")).alias("tail"))
        .collect()}
    for i, t in duck.sql(
            "SELECT i, " + marker_tail_sql("i")
            + " FROM (SELECT unnest(range(0, 24)) AS i)").fetchall():
        assert eng[i] == t, i
