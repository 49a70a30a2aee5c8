"""MediaWiki dump ingestion (operators/mediawiki.py): multistream bz2
walking with per-stream isolation + resync, page extraction with
entity decode and per-page caps, wikitext cleaning goldens, the index
byte-range read path, and the hand-off into curate_corpus."""

from __future__ import annotations

import bz2

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import mediawiki as MW


def _page(title, pid, text, ns=0, redirect=False):
    red = '<redirect title="X" />' if redirect else ""
    return (f"<page><title>{title}</title><ns>{ns}</ns><id>{pid}</id>{red}"
            f"<revision><id>{pid * 10}</id>"
            f'<text bytes="{len(text)}">{text}</text></revision></page>')


_WIKI = ("'''Alpha''' is a [[letter]] of the [[Greek alphabet|Greek]] "
         "script.{{Infobox|name=Alpha|symbol=A}} It is used in "
         "[[physics]] and math.<ref>Citation here</ref>\n\n"
         "== History ==\n"
         "The letter comes from [[File:Alpha.svg|thumb|An [[image|img]] "
         "caption]] the Phoenician aleph.<!-- hidden -->\n"
         "{| class=\"wikitable\"\n|-\n| cell || cell2\n|}\n"
         "* first point\n* second point\n"
         "See [https://example.org/alpha the external page] and "
         "[[Category:Greek letters]] [[fr:Alpha]].")


def _dump_xml(pages):
    return "<mediawiki>" + "".join(pages) + "</mediawiki>"


def _multistream(streams):
    return b"".join(bz2.compress(s.encode()) for s in streams)


def test_wikitext_cleaning_goldens():
    t = MW.wikitext_to_text(_WIKI)
    assert "Alpha is a letter of the Greek script." in t
    assert "physics" in t and "History" in t
    assert "Phoenician aleph" in t
    assert "the external page" in t
    for gone in ("Infobox", "{{", "}}", "wikitable", "cell2", "<ref",
                 "Citation here", "hidden", "Category", "fr:Alpha",
                 "[[", "]]", "'''", "thumb", "img caption",
                 "https://example.org"):
        assert gone not in t, gone
    assert "first point" in t  # list marker stripped, text kept


def test_entities_and_headings():
    t = MW.wikitext_to_text("== A &amp; B ==\nx &lt;tag&gt; y &#65;&#x42;")
    # entities decode at the PAGE layer; the cleaner strips markup only
    assert "A &amp; B" in t
    assert MW._unescape("&amp;&lt;&#65;&#x42;&nbsp;") == "&<AB "


def test_multistream_page_walk(spark, tmp_path):
    s1 = _dump_xml([_page("Alpha", 1, _WIKI),
                    _page("Redirect me", 2, "#REDIRECT [[Alpha]]",
                          redirect=True)])
    s2 = _dump_xml([_page("Talk page", 3, "talk", ns=1),
                    _page("Beta", 4, "'''Beta''' follows [[Alpha]]. " * 8)])
    p = tmp_path / "dump.xml.bz2"
    p.write_bytes(_multistream([s1, s2]))
    pages = MW.mediawiki_pages(spark, str(p)).collect()
    got = {r.title: r for r in pages if r.title is not None}
    assert set(got) == {"Alpha", "Redirect me", "Talk page", "Beta"}
    assert got["Redirect me"].redirect and not got["Alpha"].redirect
    assert got["Talk page"].ns == 1
    assert all(r.n_rejected == 0 for r in pages if r.title is not None)


def test_corrupt_stream_loses_itself(spark, tmp_path):
    s1 = _dump_xml([_page("Good1", 1, "text one " * 20)])
    s3 = _dump_xml([_page("Good2", 2, "text two " * 20)])
    middle = bytearray(bz2.compress(_dump_xml([_page("Bad", 9, "x" * 400)]).encode()))
    middle[15] ^= 0xFF  # corrupt the middle stream's data
    blob = bz2.compress(s1.encode()) + bytes(middle) + bz2.compress(s3.encode())
    p = tmp_path / "corrupt.xml.bz2"
    p.write_bytes(blob)
    rows = MW.mediawiki_pages(spark, str(p)).collect()
    titles = {r.title for r in rows if r.title}
    assert titles == {"Good1", "Good2"}
    assert sum(r.n_rejected for r in rows) >= 1  # ledger row present


def test_bomb_cap_rejects_stream(spark, tmp_path):
    big = _dump_xml([_page("Huge", 1, "a" * 3_000_000)])
    p = tmp_path / "bomb.xml.bz2"
    p.write_bytes(bz2.compress(big.encode()))
    rows = MW.mediawiki_pages(spark, str(p),
                              max_stream_bytes=1_000_000).collect()
    assert all(r.title is None for r in rows)
    assert sum(r.n_rejected for r in rows) == 1


def test_index_range_reads(spark, tmp_path):
    streams = [_dump_xml([_page(f"P{i}", i, f"page body {i} " * 10)])
               for i in range(5)]
    blobs = [bz2.compress(s.encode()) for s in streams]
    dump = b"".join(blobs)
    (tmp_path / "big.xml.bz2").write_bytes(dump)
    # the published index: offset:page_id:title
    offsets, pos = [], 0
    for i, b in enumerate(blobs):
        offsets.append((pos, i, f"P{i}"))
        pos += len(b)
    index = "\n".join(f"{o}:{pid}:{t}" for o, pid, t in offsets)
    parsed = MW.read_multistream_index(bz2.compress(index.encode()))
    assert parsed == offsets
    # select two pages -> two streams only
    want = [o for o, pid, t in parsed if t in ("P1", "P3")]
    manifest = spark.createDataFrame(
        [("big.xml.bz2", want)], "filename string, offsets array<bigint>")
    rows = MW.read_multistream_ranges(
        spark, manifest, base_dir=str(tmp_path)).collect()
    assert {r.title for r in rows if r.title} == {"P1", "P3"}


def test_wikitext_to_documents_feeds_curation(spark, tmp_path):
    pages = [_page(f"Article {i}",
                   i,
                   f"'''Article {i}''' is about [[topic {i}|topics]]. "
                   + "The quick brown fox jumps over the lazy dog and "
                     "then it rests in the shade of a tree. " * 4
                   + "{{stub}}")
             for i in range(6)]
    pages.append(_page("Redirect", 99, "#REDIRECT [[Article 0]]",
                       redirect=True))
    pages.append(_page("Talk:Meta", 98, "talk talk", ns=1))
    p = tmp_path / "wiki.xml.bz2"
    p.write_bytes(_multistream([_dump_xml(pages[:4]), _dump_xml(pages[4:])]))
    docs = MW.wikitext_to_documents(spark, str(p), min_text_chars=50)
    rows = docs.collect()
    assert len(rows) == 6  # redirect + talk excluded
    assert all(r.source == "wikipedia" and "{{" not in r.text for r in rows)
    assert all(r.url.startswith("https://en.wikipedia.org/wiki/Article_")
               for r in rows)
    # end-to-end: the documents frame drops into curate_corpus
    from apache_pinot_spark.operators.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    cfg = CurationConfig(exact_dedup=True, boilerplate=False,
                         quality_filter=True, min_quality=0.0,
                         keep_langs=(), redact_pii=False,
                         near_dedup=True, near_threshold=0.9,
                         decontaminate=False)
    stages = curate_corpus(docs.select("doc_id", "text", "source"), cfg)
    assert stages["splits"].count() > 0
