"""The r12 curation-gates driver slot (suites/curation_gates_suite):
SQL-oracle parity for the canonicalizer and Gopher replays, and the
full staged accounting matched against its DuckDB oracle at sf0.001."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import textanalysis as tx
from apache_pinot_spark.operators import urls as U

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)

_URLS = [
    "HTTP://WWW.Example.COM:80/path?utm_source=x&b=2&a=1#frag",
    "https://example.com:443/",
    "https://example.com:8443/x",
    "http://example.com",
    "http://sub.example.com./p",
    "http://example.com/p?ref=abc&reference=keep",
    "http://example.com/p?ref_src=twsrc&a=1",
    "http://example.com/p?utm_campaign=z",
    "not a url",
    "ftp://files.example.com/a/b",
    "http://example.com/p?a=1&a=0",
    "HTTPS://www.corpus.Example.COM:443/doc/42?utm_source=feed&b=2&a=1#frag",
    "::garbage::",
    "http://user:pw@host.example.com/x",
    "http://example.com/p?fbclid=x&gclid=y&mc_cid=z&igshid=w&msclkid=v",
]


def test_canonical_url_oracle_matches_engine(spark):
    df = spark.createDataFrame([(u,) for u in _URLS], "url string")
    ours = [r.c for r in
            df.select(U.canonical_url_expr("url").alias("c")).collect()]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    expr = U.canonical_url_oracle_sql("url")
    theirs = [r[0] for r in con.sql(f"SELECT {expr} FROM t").fetchall()]
    assert ours == theirs


def test_gopher_oracle_matches_engine(spark):
    fixtures = [
        (1, "word " * 49),                        # too few words
        (2, "supercalifragilistic " * 60),        # mean word len high
        (3, "ab " * 60),                          # mean word len low
        (4, "fine text with the of and that " * 8 + "# " * 12),  # symbols
        (5, "123 456 " * 40 + "the of and with that " * 4),      # alpha
        (6, " ".join(f"w{i}" for i in range(60))),               # no stops
        (7, "dup line\n" * 12 + "the of and unique prose here with that " * 3),
        (8, "the cat " * 40 + "of and with that extra words here " * 2),
        # passes every rule: 43 distinct alpha words, mean length in
        # range, stopwords present, zero repetition
        (9, "the of and with that "
            + " ".join(f"uniq{chr(97 + i % 26)}{i}" for i in range(38))),
    ]
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
            .unionByName(spark.createDataFrame(
                [(9000 + i, t) for i, t in fixtures],
                "doc_id bigint, text string")))
    ours = {r.doc_id: r.ok for r in docs.select(
        "doc_id",
        tx.gopher_quality_expr("text", min_words=30).alias("ok")).collect()}
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    sql = tx.gopher_quality_oracle_sql("text", min_words=30)
    theirs = {d: o for d, o in
              con.sql(f"SELECT doc_id, {sql} AS ok FROM t").fetchall()}
    assert ours == theirs
    # the fixtures exercise both outcomes
    assert ours[9009] is True
    assert not any(ours[9000 + i] for i in range(1, 9))


def test_gates_accounting_matches_oracle(spark):
    import apache_pinot_spark.suites.curation_gates_suite as m

    sf = "/root/testdata/sf0.001"
    sdf = m._gates_accounting(spark, sf).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    odf = con.sql(m._ORACLE).df()
    key = ["stage_idx", "stage"]
    s = sdf.sort_values(key).reset_index(drop=True).astype(str)
    o = odf.sort_values(key).reset_index(drop=True).astype(str)
    assert list(s.columns) == list(o.columns)
    assert s.equals(o)
    # every gate did real work: strictly decreasing rows at each filter
    # stage and strictly decreasing chars at normalize/substring
    by = {r.stage: (r.rows, r.chars) for r in sdf.itertuples()}
    assert by["url_dedup"][0] < by["input"][0]
    assert by["domain_blocklist"][0] < by["url_dedup"][0]
    assert by["normalize"][0] == by["domain_blocklist"][0]
    assert by["normalize"][1] < by["domain_blocklist"][1]
    assert by["word_blocklist"][0] < by["normalize"][0]
    assert by["gopher_quality"][0] < by["word_blocklist"][0]
    # r13: the frozen model-quality gate drops the spam-tailed class
    # (roughly a third of survivors) and keeps the rest
    assert 0 < by["model_quality"][0] < by["gopher_quality"][0]
    assert by["substring_dedup"][0] == by["model_quality"][0]
    assert by["substring_dedup"][1] < by["model_quality"][1]
