"""CDXJ crawl-index tier (operators/cdx.py): field extraction (JSON
blocks containing spaces included), malformed-line isolation, the
status/mime gate, latest-capture-per-URL, fetch-manifest task bounds,
and DuckDB parity for the line parse."""

from __future__ import annotations

import json

import pytest

from apache_pinot_spark.operators import cdx as X


def _line(key, ts, **kw):
    block = {"url": kw.get("url", "http://example.com/"),
             "mime": kw.get("mime", "text/html"),
             "status": str(kw.get("status", 200)),
             "digest": kw.get("digest", "sha1:AAAA"),
             "length": str(kw.get("length", 1000)),
             "offset": str(kw.get("offset", 0)),
             "filename": kw.get("filename", "seg/warc/f-00000.warc.gz")}
    if "languages" in kw:
        block["languages"] = kw["languages"]
    return f"{key} {ts} {json.dumps(block)}"


def _write(tmp_path, lines):
    p = tmp_path / "indexes.cdxj"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_cdxj_fields_and_isolation(spark, tmp_path):
    lines = [
        _line("com,example)/a", "20240101120000",
              url="http://example.com/a", offset=100, length=2526,
              languages="eng,deu"),
        "garbage line with no json at all",
        "com,example)/b not-a-timestamp {}",
        _line("com,example)/b", "20240202000000",
              url="http://example.com/b", status=404),
    ]
    rows = X.read_cdxj(spark, _write(tmp_path, lines)).collect()
    assert len(rows) == 2  # bad lines lose only themselves
    a = next(r for r in rows if r.surt_key == "com,example)/a")
    assert (a.ts, a.url, a.status, a.mime) == (
        "20240101120000", "http://example.com/a", 200, "text/html")
    assert (a.warc_offset, a.warc_length) == (100, 2526)
    assert a.warc_filename == "seg/warc/f-00000.warc.gz"
    assert a.languages == "eng,deu"


def test_select_and_latest_capture(spark, tmp_path):
    lines = [
        _line("com,example)/p", "20240101000000", offset=1,
              url="http://example.com/p"),
        _line("com,example)/p", "20240301000000", offset=2,
              url="http://example.com/p"),   # newer capture wins
        _line("com,example)/p", "20240201000000", offset=3,
              url="http://example.com/p", status=301),  # gated out
        _line("com,other)/q", "20240101000000", offset=4,
              url="http://other.com/q", mime="application/pdf"),  # mime gate
    ]
    caps = X.read_cdxj(spark, _write(tmp_path, lines))
    picked = X.latest_capture_per_url(X.select_captures(caps)).collect()
    assert len(picked) == 1
    assert picked[0].ts == "20240301000000" and picked[0].warc_offset == 2


def test_fetch_manifest_bounds_tasks(spark, tmp_path):
    lines = [_line(f"com,example)/p{i}", "20240101000000",
                   url=f"http://example.com/p{i}",
                   offset=i * 1000, filename="f-A.warc.gz")
             for i in range(7)]
    lines += [_line("com,other)/z", "20240101000000",
                    url="http://other.com/z", offset=5, filename="f-B.warc.gz")]
    caps = X.read_cdxj(spark, _write(tmp_path, lines))
    man = X.fetch_manifest(caps, max_records_per_task=3).collect()
    by_file = {}
    for r in man:
        by_file.setdefault(r.warc_filename, []).append(r)
    assert len(by_file["f-A.warc.gz"]) == 3  # 7 records at 3/task
    assert sum(len(r.records) for r in by_file["f-A.warc.gz"]) == 7
    assert all(len(r.records) <= 3 for r in man)
    # records sorted by offset within a task
    for r in man:
        offs = [rec.offset for rec in r.records]
        assert offs == sorted(offs)
    assert len(by_file["f-B.warc.gz"]) == 1


def test_cdxj_duckdb_parity(spark, tmp_path):
    import duckdb

    lines = [
        _line("com,example)/a", "20240101120000",
              url="http://example.com/a", offset=42, length=77),
        _line("org,site)/b", "20240715010203",
              url="https://site.org/b", status=503,
              mime="text/plain"),
    ]
    p = _write(tmp_path, lines)
    ours = sorted(
        (r.surt_key, r.ts, r.url, r.status, r.warc_offset)
        for r in X.read_cdxj(spark, p).collect())
    got = duckdb.sql(f"""
      WITH raw AS (SELECT column0 AS line FROM read_csv('{p}', delim=NULL,
                                                        header=false)),
      split AS (
        SELECT split_part(line, ' ', 1) AS surt_key,
               split_part(line, ' ', 2) AS ts,
               substring(line, length(split_part(line, ' ', 1))
                               + length(split_part(line, ' ', 2)) + 3) AS blob
        FROM raw)
      SELECT surt_key, ts,
             json_extract_string(blob, '$.url') AS url,
             CAST(json_extract_string(blob, '$.status') AS BIGINT) AS status,
             CAST(json_extract_string(blob, '$.offset') AS BIGINT) AS off
      FROM split ORDER BY surt_key
    """).fetchall()
    assert ours == [tuple(r) for r in got]


def _warc_member(uri: bytes, page: bytes) -> bytes:
    import gzip

    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: " + uri + b"\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
           + http + b"\r\n\r\n")
    return gzip.compress(rec)


def test_cdx_to_range_read_end_to_end(spark, tmp_path):
    """The full story: index → gate → latest capture → fetch manifest →
    byte-range member reads (never the whole file)."""
    from apache_pinot_spark.operators.warc import read_warc_ranges

    pages = {}
    blob, lines = b"", []
    for i in range(5):
        uri = f"http://site{i}.example.com/p".encode()
        page = (b"<html><body><p>page %d prose body with plain words "
                b"in it</p></body></html>" % i)
        member = _warc_member(uri, page)
        lines.append(_line(f"com,site{i})/p", "20240101000000",
                           url=uri.decode(), offset=len(blob),
                           length=len(member), filename="ranged.warc.gz",
                           status=200 if i != 3 else 500))
        pages[uri.decode()] = page
        blob += member
    (tmp_path / "ranged.warc.gz").write_bytes(blob)
    caps = X.read_cdxj(spark, _write(tmp_path, lines))
    manifest = X.fetch_manifest(
        X.latest_capture_per_url(X.select_captures(caps)),
        max_records_per_task=2)
    rows = read_warc_ranges(spark, manifest,
                            base_dir=str(tmp_path)).collect()
    assert len(rows) == 4  # the 500 capture was gated out at the INDEX
    assert all(r.http_status == 200 and r.n_rejected == 0 for r in rows)
    assert {r.url for r in rows} == {f"http://site{i}.example.com/p"
                                     for i in (0, 1, 2, 4)}
    for r in rows:
        assert r.target_uri == r.url
        assert f"page {r.url[len('http://site')]}" in r.body
    # a lying offset rejects ITS range only, with the reject row
    bad = _line("com,badx)/q", "20240101000000", url="http://badx/q",
                offset=len(blob) - 7, length=64, filename="ranged.warc.gz")
    caps2 = X.read_cdxj(spark, _write(tmp_path, lines + [bad]))
    rows2 = read_warc_ranges(
        spark, X.fetch_manifest(X.latest_capture_per_url(
            X.select_captures(caps2))), base_dir=str(tmp_path)).collect()
    ok = [r for r in rows2 if r.n_rejected == 0]
    rej = [r for r in rows2 if r.body is None]
    assert len(ok) == 4 and len(rej) == 1
    assert rej[0].url == "http://badx/q" and rej[0].n_rejected >= 1


def test_range_read_null_offset_rejects_row_not_task(spark, tmp_path):
    # a manifest row with non-null length but NULL offset must land as a
    # reject row (per-record isolation), never int(None) → task failure
    uri = b"http://ok.example.com/p"
    member = _warc_member(uri, b"<html><body><p>fine page body with "
                               b"plain words here</p></body></html>")
    (tmp_path / "m.warc.gz").write_bytes(member)
    from apache_pinot_spark.operators.warc import read_warc_ranges
    manifest = spark.createDataFrame(
        [("m.warc.gz",
          [{"url": "http://ok.example.com/p", "offset": 0,
            "length": len(member)},
           {"url": "http://null-off.example/q", "offset": None,
            "length": 64}])],
        "warc_filename string, records array<struct<url:string,"
        "offset:bigint,length:bigint>>")
    rows = read_warc_ranges(spark, manifest,
                            base_dir=str(tmp_path)).collect()
    ok = [r for r in rows if r.n_rejected == 0]
    rej = [r for r in rows if r.body is None]
    assert len(ok) == 1 and ok[0].url == "http://ok.example.com/p"
    assert len(rej) == 1 and rej[0].url == "http://null-off.example/q"
    assert rej[0].n_rejected >= 1
