"""Gopher-rules composite (textanalysis.gopher_quality_expr): each rule
kills its designed violator while clean prose passes; plan stays
JVM-side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators.textanalysis import gopher_quality_expr

_CLEAN = ("the history of science gives many examples of careful and "
          "patient work by people who wanted to understand the world "
          "around them and who wrote their results in plain language "
          "for other people to read and check with their own evidence "
          "so that knowledge could grow over time in the open ") * 2


def _keep(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return df.filter(gopher_quality_expr("text", **kw)).count() == 1


def test_each_rule_kills_its_violator(spark):
    assert _keep(spark, _CLEAN)
    assert not _keep(spark, "too short to pass the word floor")
    # mean word length too small (single letters)
    assert not _keep(spark, " ".join(["a"] * 120))
    # mean word length too large
    assert not _keep(spark, " ".join(["pneumonoultramicroscopic"] * 120))
    # symbol ratio: hashes everywhere
    assert not _keep(spark, " ".join(f"#tag{i}" for i in range(120)))
    # alphabetic-word floor: mostly numbers
    assert not _keep(spark, " ".join(str(i) for i in range(150)))
    # stopword floor: word soup without stopwords
    assert not _keep(spark, " ".join(f"zzz{i}" for i in range(120)))
    # repetition: the same line over and over
    assert not _keep(spark, ("boilerplate navigation line\n" * 60)
                     + _CLEAN)
    # top-2gram coverage: one bigram dominating
    assert not _keep(spark, "click here " * 100)


def test_thresholds_are_knobs(spark):
    short = "these few words form one short but honest sentence here"
    assert not _keep(spark, short)
    # a short doc also needs the n-gram coverage caps relaxed — any
    # single bigram covers >20% of ten words (the paper's 50-word floor
    # is what shields the caps from short docs)
    assert _keep(spark, short, min_words=5,
                 max_top_2gram_char_frac=1.0, max_top_3gram_char_frac=1.0)


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, _CLEAN)], "doc_id bigint, text string")
    plan = df.filter(gopher_quality_expr("text")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
