"""normalize_corpus (operators/textanalysis.py): NFC/NFKC forms with
DuckDB nfc_normalize parity, newline canonicalization, control/zero-
width stripping, and the dedup-miss motivation case."""

from __future__ import annotations

import unicodedata

import pytest

from apache_pinot_spark.operators.textanalysis import normalize_corpus


def test_nfc_matches_duckdb(spark):
    import duckdb

    rows = [(1, "café résumé"),  # NFD + NFC mixed
            (2, "ṩ ṩ"),          # multi-mark
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.text
           for r in normalize_corpus(df, strip_control=False).collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    for doc_id, want in con.sql(
            "SELECT doc_id, nfc_normalize(text) FROM t").fetchall():
        assert got[doc_id] == want


def test_controls_newlines_zero_width(spark):
    text = "a​b\r\nc\rd\te\x07f"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    (row,) = normalize_corpus(df).collect()
    assert row.text == "ab\nc\nd\tef"


def test_nfkc_folds_compatibility(spark):
    df = spark.createDataFrame([(1, "ﬁne ２０２４")],
                               "doc_id bigint, text string")
    (row,) = normalize_corpus(df, form="NFKC",
                              strip_control=False).collect()
    assert row.text == "fine 2024"


def test_dedup_miss_motivation(spark):
    # the same word in NFC and NFD: different bytes, ONE doc after
    # normalize + exact dedup
    from apache_pinot_spark.operators.dedup import dedupe_exact

    rows = [(1, unicodedata.normalize("NFC", "résumé résumé résumé")),
            (2, unicodedata.normalize("NFD", "résumé résumé résumé"))]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert dedupe_exact(df, text_col="text", key_col="doc_id").count() == 2
    assert dedupe_exact(normalize_corpus(df), text_col="text",
                        key_col="doc_id").count() == 1
