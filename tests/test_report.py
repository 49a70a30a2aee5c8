"""Corpus audit report (operators/report.py): hand-checked scalars on a
small corpus, DuckDB replay of every exact aggregate, dup-rate math,
and composition ordering."""

from __future__ import annotations

import pytest

from apache_pinot_spark.operators.report import corpus_report


def _corpus(spark):
    rows = [
        (1, "alpha beta gamma", "en", "web"),
        (2, "alpha beta gamma", "en", "web"),          # dup text
        (3, "one two three four five six", "en", "books"),
        (3, "a different doc under a reused id", "de", "web"),  # dup id
        (5, None, None, None),                          # NULL text row
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string")


def test_report_scalars_and_dup_rates(spark):
    r = corpus_report(_corpus(spark), exact_quantiles=True)
    assert r["n_docs"] == 5 and r["n_docs_with_text"] == 4
    assert r["n_distinct_ids"] == 4
    assert r["n_distinct_texts"] == 3
    assert r["duplicate_id_rate"] == pytest.approx(1 - 4 / 5)
    assert r["duplicate_text_rate"] == pytest.approx(1 - 3 / 4)
    assert r["total_chars"] == sum(len(t) for t in (
        "alpha beta gamma", "alpha beta gamma",
        "one two three four five six",
        "a different doc under a reused id"))
    assert r["total_tokens"] == 3 + 3 + 6 + 7
    assert r["langs"][0] == ("en", 3)
    assert ("(null)", 1) in r["langs"]
    assert r["sources"][0] == ("web", 3)


def test_report_duckdb_parity(spark):
    import duckdb

    docs = _corpus(spark)
    r = corpus_report(docs, exact_quantiles=True)
    con = duckdb.connect()
    con.register("d", docs.toPandas())
    (nd, nt, ids, texts, chars, p50, p90, p99, mn, mx) = con.sql("""
      SELECT count(*), count(text), count(DISTINCT doc_id),
             count(DISTINCT text), sum(length(text)),
             quantile_cont(length(text), 0.5),
             quantile_cont(length(text), 0.9),
             quantile_cont(length(text), 0.99),
             min(length(text)), max(length(text))
      FROM d
    """).fetchone()
    assert (r["n_docs"], r["n_docs_with_text"]) == (nd, nt)
    assert (r["n_distinct_ids"], r["n_distinct_texts"]) == (ids, texts)
    assert r["total_chars"] == chars
    assert (r["min_chars"], r["max_chars"]) == (mn, mx)
    # Spark's exact percentile == DuckDB quantile_cont (linear interp)
    assert r["chars_p50"] == pytest.approx(p50)
    assert r["chars_p90"] == pytest.approx(p90)
    assert r["chars_p99"] == pytest.approx(p99)


def test_report_without_optional_columns(spark):
    docs = spark.createDataFrame([(1, "just text")],
                                 "doc_id bigint, text string")
    r = corpus_report(docs)
    assert "langs" not in r and "sources" not in r
    assert r["n_docs"] == 1


def test_corpus_diff(spark):
    import duckdb

    from apache_pinot_spark.operators.report import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed"),
         (4, None)],
        "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(1, "same text"), (2, "was changed"), (5, "brand new"),
         (4, None)],
        "doc_id bigint, text string")
    d = corpus_diff(old, new)
    assert (d["added"], d["removed"], d["unchanged"], d["changed"]) \
        == (1, 1, 1, 2)  # doc 4: NULL-text rows count as changed
    assert [r.id for r in d["added_ids"].collect()] == [5]
    assert [r.id for r in d["removed_ids"].collect()] == [3]
    assert sorted(r.id for r in d["changed_ids"].collect()) == [2, 4]
    # DuckDB replay of the count classification
    con = duckdb.connect()
    con.register("o", old.toPandas())
    con.register("n", new.toPandas())
    got = con.sql("""
      SELECT
        count(*) FILTER (o.doc_id IS NULL) AS a,
        count(*) FILTER (n.doc_id IS NULL) AS r,
        count(*) FILTER (o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                         AND o.text IS NOT DISTINCT FROM n.text
                         AND o.text IS NOT NULL) AS u,
        count(*) FILTER (o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                         AND (o.text IS DISTINCT FROM n.text
                              OR o.text IS NULL)) AS c
      FROM o FULL OUTER JOIN n USING (doc_id)
    """).fetchone()
    assert (d["added"], d["removed"], d["unchanged"], d["changed"]) == got
