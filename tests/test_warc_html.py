"""WARC ingest (operators/warc.py) + HTML text extraction
(operators/htmltext.py): hand-built WARC fixtures per ISO 28500 record
grammar, gzip member splitting, bounded bodies, and the end-to-end
crawl → records → boilerplate-gated text chain."""

from __future__ import annotations

import gzip

import pytest

from apache_pinot_spark.operators import htmltext as H
from apache_pinot_spark.operators import warc as W

_HTML = b"""<!DOCTYPE html><html><head><title>T</title>
<script>var x = "SCRIPT NOISE should never appear";</script>
<style>.c { color: red }</style></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/x">X</a></nav>
<h1>The Article Title Words Here</h1>
<p>This is the first real paragraph and it has enough words to pass the
gate because it is a normal sentence with common stopwords in it.</p>
<p>Short one.</p>
<div>The second real paragraph also reads like prose, with the usual
mix of the and of and a that real writing always has in it.</div>
<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
</body></html>"""


def _record(rtype: bytes, uri: bytes, body: bytes, extra: bytes = b"") -> bytes:
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: " + rtype + b"\r\n"
           b"WARC-Record-ID: <urn:uuid:0000-" + rtype + b">\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: " + uri + b"\r\n" + extra +
           b"Content-Length: " + str(len(body)).encode() + b"\r\n"
           b"\r\n")
    return hdr + body + b"\r\n\r\n"


def _http_response(payload: bytes, ctype: bytes = b"text/html") -> bytes:
    return (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: " + ctype + b"\r\n"
            b"Server: x\r\n\r\n" + payload)


def _warc_gz() -> bytes:
    recs = [
        _record(b"warcinfo", b"-", b"software: test\r\n",
                extra=b"Content-Type: application/warc-fields\r\n"),
        _record(b"request", b"http://example.com/a",
                b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"),
        _record(b"response", b"http://example.com/a",
                _http_response(_HTML),
                extra=b"Content-Type: application/http; msgtype=response\r\n"),
    ]
    return b"".join(gzip.compress(r) for r in recs)


def test_gzip_member_splitting_and_record_grammar():
    blob = _warc_gz()
    recs = list(W.parse_warc_records(blob))
    assert [r.warc_type for r in recs] == ["warcinfo", "request", "response"]
    resp = recs[2]
    assert resp.target_uri == "http://example.com/a"
    assert resp.http_status == 200
    assert resp.http_content_type == "text/html"
    assert resp.body == _HTML  # HTTP headers stripped
    # plain (non-gz) WARC parses identically
    plain = b"".join(gzip.decompress(m) for m in
                     [gzip.compress(_record(b"response", b"http://e/x",
                                            _http_response(b"hi")))])
    (r,) = W.parse_warc_records(plain)
    assert r.body == b"hi" and r.http_status == 200


def test_bounded_bodies_and_reject_paths():
    big = _record(b"response", b"http://e/big",
                  _http_response(b"A" * 1000))
    tail = _record(b"response", b"http://e/after", _http_response(b"ok"))
    recs = list(W.parse_warc_records(big + tail, max_body_bytes=100))
    assert recs[0].truncated and recs[0].body is None
    # alignment survives the skip: the next record still parses
    assert recs[1].target_uri == "http://e/after" and recs[1].body == b"ok"
    with pytest.raises(ValueError, match="too short"):
        list(W.parse_warc_records(b"WARC"))
    with pytest.raises(ValueError, match="version line"):
        list(W.parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n" + b"x" * 40))
    # lying Content-Length that overruns the member
    bad = _record(b"response", b"http://e/x", _http_response(b"hi"))
    bad = bad.replace(b"Content-Length: " +
                      str(len(_http_response(b"hi"))).encode(),
                      b"Content-Length: 99999")
    with pytest.raises(ValueError, match="overruns"):
        list(W.parse_warc_records(bad))
    # corrupt gzip member
    gz = bytearray(gzip.compress(_record(b"response", b"http://e/x",
                                         _http_response(b"hi"))))
    gz[12] ^= 0xFF
    with pytest.raises(ValueError, match="gzip"):
        list(W.parse_warc_records(bytes(gz)))


def test_html_extraction_gates_boilerplate():
    paras = H.extract_paragraphs(_HTML.decode())
    texts = [p.text for p in paras]
    assert not any("SCRIPT NOISE" in t for t in texts)
    assert not any("color: red" in t for t in texts)
    nav = next(p for p in paras if "Home" in p.text)
    assert nav.link_density == 1.0 and not H.keep_paragraph(nav)
    kept = H.html_to_text(_HTML.decode())
    assert "first real paragraph" in kept
    assert "second real paragraph" in kept
    assert "Short one." not in kept  # under min_words
    assert "Home" not in kept and "Privacy" not in kept  # link-dense
    # tag soup never raises
    assert isinstance(H.html_to_text("<p>a <b>b</i> &amp; <<< c"), str)
    assert "&" in H.html_to_text(
        "<p>" + "words that are real and the of a in this sentence &amp; fine"
    )


def test_spark_crawl_to_text_chain(spark):
    rows = [("f1.warc.gz", bytearray(_warc_gz())),
            ("bad.warc.gz", bytearray(b"garbage, not a warc at all")),
            ("null.warc.gz", None)]
    df = spark.createDataFrame(rows, "path STRING, content BINARY")
    recs = W.warc_records(df)
    got = recs.orderBy("path", "record_index").collect()
    by_path = {}
    for r in got:
        by_path.setdefault(r.path, []).append(r)
    assert [r.warc_type for r in by_path["f1.warc.gz"]] == [
        "warcinfo", "request", "response"]
    resp = by_path["f1.warc.gz"][2]
    assert resp.http_status == 200 and "first real paragraph" in resp.body
    assert by_path["bad.warc.gz"][0].warc_type is None  # reject row
    assert by_path["null.warc.gz"][0].warc_type is None

    # chain: responses → boilerplate-gated text
    pages = recs.filter("warc_type = 'response' AND http_status = 200") \
        .selectExpr("target_uri AS doc_id", "body")
    text = H.extract_html_text(pages).collect()[0]
    assert text.n_paragraphs >= 5 and text.n_kept == 3
    assert "second real paragraph" in text.text
    assert "Home" not in text.text
    plan = H.extract_html_text(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_warc_mutation_property():
    import random

    blob = _warc_gz()
    rng = random.Random(909)
    for _ in range(150):
        mut = bytearray(blob)
        mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            recs = list(W.parse_warc_records(bytes(mut)))
            assert len(recs) <= 3
        except ValueError:
            pass


def test_crawl_to_documents_source(spark, tmp_path):
    p = tmp_path / "part-0.warc.gz"
    p.write_bytes(_warc_gz())
    docs = W.crawl_to_documents(spark, str(tmp_path / "*.warc.gz"),
                                min_text_chars=50)
    rows = docs.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.url == "http://example.com/a"
    assert r.fetch_date == "2024-01-01T00:00:00Z"
    assert "first real paragraph" in r.text and "Home" not in r.text
    assert r.n_chars == len(r.text)
    assert isinstance(r.doc_id, int)  # xxhash64(url, date), re-ingest stable
    again = W.crawl_to_documents(spark, str(tmp_path / "*.warc.gz"),
                                 min_text_chars=50).collect()[0]
    assert again.doc_id == r.doc_id


def test_crawl_feeds_curation_pipeline(spark, tmp_path):
    """End-to-end: .warc.gz files → crawl_to_documents → curate_corpus —
    the full web-corpus story (exact dedup catches the duplicated page;
    the source column from parse_url feeds the source-share cap)."""
    from apache_pinot_spark.operators.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    prose = ("<p>This is a perfectly ordinary paragraph of web prose with "
             "the usual stopwords in it and some distinct content %d.</p>")

    def page(i):
        return ("<html><body>" + "".join(prose % (i * 9 + j)
                for j in range(6)) + "</body></html>").encode()

    recs = []
    for host, i in [("a.com", 0), ("a.com", 1), ("b.com", 2), ("b.com", 0)]:
        # b.com/0 duplicates a.com/0's TEXT (different URL -> exact dup)
        body = _http_response(page(i))
        recs.append(_record(
            b"response", f"http://{host}/p{i}".encode(), body,
            extra=b"Content-Type: application/http; msgtype=response\r\n"))
    (tmp_path / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs))

    docs = W.crawl_to_documents(spark, str(tmp_path / "*.warc.gz"),
                                min_text_chars=50)
    rows = docs.collect()
    assert len(rows) == 4
    assert {r.source for r in rows} == {"a.com", "b.com"}

    stages = curate_corpus(
        docs.select("doc_id", "text", "source"),
        CurationConfig(boilerplate=False, redact_pii=False,
                       near_dedup=False, decontaminate=False,
                       keep_langs=("en",), min_quality=30.0),
    )
    assert stages["input"].count() == 4
    assert stages["exact_dedup"].count() == 3  # the cross-host dup drops
    assert stages["splits"].count() == 3


def test_wet_tier_conversion_records(spark, tmp_path):
    """wet=True ingests the crawl's pre-extracted text tier: conversion
    records' bodies ARE the document text — no HTML pass."""
    wet_text = ("This is the pre-extracted text of the page with enough "
                "characters to clear the length gate easily. " * 2).strip()
    recs = [
        _record(b"warcinfo", b"-", b"software: wet-test\r\n"),
        _record(b"conversion", b"http://A.com/page1",
                wet_text.encode(),
                extra=b"Content-Type: text/plain\r\n"),
        _record(b"conversion", b"http://b.com/page2", b"too short",
                extra=b"Content-Type: text/plain\r\n"),
    ]
    (tmp_path / "c.warc.wet.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs))
    docs = W.crawl_to_documents(spark, str(tmp_path / "*.wet.gz"),
                                min_text_chars=50, wet=True).collect()
    assert len(docs) == 1
    r = docs[0]
    assert r.text == wet_text and r.url == "http://A.com/page1"
    assert r.source == "a.com"  # host lowercased


def test_member_error_isolation_and_reject_count():
    """r11 hardening: one corrupt gzip member loses only itself — the
    other members' records survive and the reject is counted (the old
    all-or-nothing reject lost ~1 GB of pages to one bad record)."""
    good1 = gzip.compress(_record(b"response", b"http://e/1",
                                  _http_response(b"one")))
    bad = bytearray(gzip.compress(_record(b"response", b"http://e/2",
                                          _http_response(b"two"))))
    bad[14] ^= 0xFF  # corrupt the deflate stream mid-member
    good2 = gzip.compress(_record(b"response", b"http://e/3",
                                  _http_response(b"three")))
    blob = good1 + bytes(bad) + good2
    events = list(W.iter_warc_records_tolerant(blob))
    kinds = [k for k, _ in events]
    recs = [r for k, r in events if k == "rec"]
    assert kinds.count("reject") >= 1
    assert [r.target_uri for r in recs] == ["http://e/1", "http://e/3"]
    # the strict form still rejects the whole blob (fixture/tooling API)
    with pytest.raises(ValueError, match="gzip"):
        list(W.parse_warc_records(blob))

    # record-grammar corruption INSIDE a good member: loses at most that
    # member's remainder, not the sibling members
    bad_grammar = gzip.compress(
        _record(b"response", b"http://e/a", _http_response(b"aa"))
        + b"NOT-A-WARC-LINE\r\n" + b"x" * 64)
    blob2 = bad_grammar + good2
    events2 = list(W.iter_warc_records_tolerant(blob2))
    recs2 = [r for k, r in events2 if k == "rec"]
    assert [r.target_uri for r in recs2] == ["http://e/a", "http://e/3"]
    assert [k for k, _ in events2].count("reject") == 1


def test_gzip_bomb_member_rejects_bounded():
    """r11 hardening: inflation is capped chunkwise DURING
    decompression — a ~3000:1 bomb member rejects without ever
    materializing, and sibling members still parse."""
    bomb = gzip.compress(b"\x00" * (32 << 20))  # 32 MiB from ~32 KiB
    assert len(bomb) < (32 << 20) // 1000
    good = gzip.compress(_record(b"response", b"http://e/ok",
                                 _http_response(b"fine")))
    events = list(W.iter_warc_records_tolerant(
        bomb + good, max_member_bytes=1 << 20))
    rejects = [r for k, r in events if k == "reject"]
    recs = [r for k, r in events if k == "rec"]
    assert any("inflates past" in r for r in rejects)
    assert [r.target_uri for r in recs] == ["http://e/ok"]
    # strict splitter enforces the same cap
    with pytest.raises(ValueError, match="inflates past"):
        list(W.split_gzip_members(bomb, max_member_bytes=1 << 20))
    # and a legit member under the cap still inflates exactly
    (m,) = W.split_gzip_members(gzip.compress(b"abc" * 1000))
    assert m == b"abc" * 1000


def test_charset_selection_no_mojibake(spark):
    """r11 hardening: the Content-Type charset= parameter drives body
    decoding — GBK and Shift-JIS pages extract real text instead of
    mojibake; unknown labels fall back to utf-8/replace; a BOM wins."""
    gbk_text = "中文网页的正文内容，包含足够的文字。"
    sjis_text = "日本語のページ本文です。"
    html_gbk = f"<html><body><p>{gbk_text}</p></body></html>".encode("gbk")
    html_sjis = f"<html><body><p>{sjis_text}</p></body></html>".encode(
        "shift_jis")
    recs = [
        _record(b"response", b"http://cn.example/1",
                _http_response(html_gbk, b"text/html; charset=GBK")),
        _record(b"response", b"http://jp.example/2",
                _http_response(html_sjis, b"text/html; charset=Shift_JIS")),
        _record(b"response", b"http://x.example/3",
                _http_response(b"plain ascii page body here",
                               b"text/html; charset=not-a-codec")),
        _record(b"response", b"http://bom.example/4",
                _http_response(b"\xef\xbb\xbf" + "bom text ü".encode("utf-8"),
                               b"text/html; charset=latin-1")),
    ]
    blob = b"".join(gzip.compress(r) for r in recs)
    df = spark.createDataFrame([("f.warc.gz", bytearray(blob))],
                               "path STRING, content BINARY")
    rows = {r.target_uri: r for r in W.warc_records(df).collect()}
    assert gbk_text in rows["http://cn.example/1"].body
    assert rows["http://cn.example/1"].charset == "gbk"
    assert sjis_text in rows["http://jp.example/2"].body
    assert rows["http://jp.example/2"].charset == "shift_jis"
    assert "�" not in rows["http://cn.example/1"].body
    assert rows["http://x.example/3"].charset == "utf-8"  # unknown label
    assert rows["http://bom.example/4"].body == "bom text ü"  # BOM wins
    assert rows["http://bom.example/4"].charset == "utf-8"
    assert all(r.n_rejected == 0 for r in rows.values())
    # unit form
    assert W.select_charset("text/html; charset=\"windows-1251\"") == "cp1251"
    assert W.select_charset("text/html") == "utf-8"
    assert W.select_charset(None) == "utf-8"


def test_spark_reject_count_column(spark):
    """n_rejected rides every record row of its blob; a blob with zero
    parseable records emits the all-NULL row with the count."""
    good = gzip.compress(_record(b"response", b"http://e/1",
                                 _http_response(b"one")))
    bad = bytearray(gzip.compress(_record(b"response", b"http://e/2",
                                          _http_response(b"two"))))
    bad[14] ^= 0xFF
    df = spark.createDataFrame(
        [("mixed.warc.gz", bytearray(good + bytes(bad))),
         ("allbad.warc.gz", bytearray(bytes(bad)))],
        "path STRING, content BINARY")
    rows = W.warc_records(df).collect()
    mixed = [r for r in rows if r.path == "mixed.warc.gz"]
    allbad = [r for r in rows if r.path == "allbad.warc.gz"]
    assert len(mixed) == 1 and mixed[0].target_uri == "http://e/1"
    assert mixed[0].n_rejected == 1
    assert len(allbad) == 1 and allbad[0].warc_type is None
    assert allbad[0].n_rejected == 1


def test_crawl_to_documents_plan_has_no_exchange(spark, tmp_path):
    """r11: url/fetch_date pass THROUGH extract_html_text's Arrow schema
    — the documents frame needs zero joins, so the ingest plan has no
    Exchange between the binaryFile scan and the documents projection
    (the old doc_id self-join shuffled the whole corpus twice)."""
    (tmp_path / "p.warc.gz").write_bytes(_warc_gz())
    docs = W.crawl_to_documents(spark, str(tmp_path / "*.warc.gz"),
                                min_text_chars=50)
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    r = docs.collect()[0]
    assert r.url == "http://example.com/a"
    assert r.fetch_date == "2024-01-01T00:00:00Z"
    assert "first real paragraph" in r.text and r.source == "example.com"


def test_extract_html_text_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "u1", "<p>real prose with the usual stopwords in it here</p>"),
         (2, "u2", None)],
        "doc_id LONG, url STRING, body STRING")
    out = H.extract_html_text(df, passthrough=("url",)).orderBy("doc_id")
    rows = out.collect()
    assert [r.url for r in rows] == ["u1", "u2"]
    assert rows[0].text and rows[1].text is None
    with pytest.raises(ValueError, match="collide"):
        H.extract_html_text(df, passthrough=("text",))


def test_page_signals_noindex_and_canonical(spark, tmp_path):
    import gzip as _gz

    noindex_page = (b"<html><head><meta name='robots' "
                    b"content='NOINDEX, nofollow'>"
                    b"<link rel='canonical' href='http://e.com/canon'>"
                    b"</head><body><p>" + b"plain prose with the usual "
                    b"stopwords in it repeated enough words " * 4
                    + b"</p></body></html>")
    plain_page = (b"<html><body><p>" + b"plain prose with the usual "
                  b"stopwords in it repeated enough words " * 4
                  + b"</p></body></html>")
    from apache_pinot_spark.operators.htmltext import extract_page
    paras, noindex, canon = extract_page(noindex_page.decode())
    assert noindex is True and canon == "http://e.com/canon"
    assert len(paras) == 1  # head signals never leak into text
    _, noindex2, canon2 = extract_page(plain_page.decode())
    assert noindex2 is False and canon2 is None

    # end-to-end: drop_noindex removes only the opted-out page
    recs = [
        _record(b"response", b"http://a.example.com/x",
                _http_response(noindex_page)),
        _record(b"response", b"http://b.example.com/y",
                _http_response(plain_page)),
    ]
    p = tmp_path / "signals.warc.gz"
    p.write_bytes(b"".join(_gz.compress(r) for r in recs))
    both = W.crawl_to_documents(spark, str(p), min_text_chars=50)
    assert both.count() == 2
    kept = W.crawl_to_documents(spark, str(p), min_text_chars=50,
                                drop_noindex=True)
    assert [r.source for r in kept.collect()] == ["b.example.com"]
