"""The whole-story integration: a mixed crawl+books+papers corpus runs
index → range-read → HTML extraction → documents, merges with EPUB and
PDF ingests, then through curate_corpus with EVERY r11 gate enabled
(normalize, URL dedup, domain blocklist, word blocklist, heuristic +
trained quality, substring dedup) into splits and the audit report —
one test proving the tiers compose."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)

_PROSE = ("this is a perfectly ordinary paragraph of prose with the "
          "usual common stopwords that real writing always has in it "
          "and it is long enough to pass the quality gates easily ")


def _page(marker, extra=""):
    return ("<html><body><p>" + _PROSE + marker + " " + extra
            + "</p></body></html>").encode()


def _warc(records):
    out = b""
    for uri, page in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + page)
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"WARC-Target-URI: " + uri + b"\r\n"
               b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
               + http + b"\r\n\r\n")
        out += gzip.compress(rec)
    return out


def test_crawl_books_papers_to_curated_splits(spark, tmp_path):
    from apache_pinot_spark.operators.pipeline import (
        CurationConfig,
        curate_corpus,
    )
    from apache_pinot_spark.operators.quality_clf import QualityModel
    from apache_pinot_spark.operators.report import corpus_report
    from apache_pinot_spark.operators.warc import crawl_to_documents

    # --- crawl tier: 4 pages, one duplicate-URL variant, one blocked
    # domain, one banned word
    crawl = tmp_path / "crawl.warc.gz"
    crawl.write_bytes(_warc([
        (b"http://good.example.com/a?utm_source=x", _page("alpha")),
        (b"http://good.example.com/a", _page("alpha")),      # URL dup
        (b"http://spam.blocked.example/z", _page("gamma")),  # blocked
        (b"http://good.example.com/b", _page("casinoword")),  # banned
        (b"http://good.example.com/c", _page("delta")),
    ]))
    web = crawl_to_documents(spark, str(crawl), min_text_chars=50) \
        .select("doc_id", "text",
                F.lit("en").alias("lang"), "source", "n_chars", "url")

    # --- books tier (EPUB) + papers tier (tex via the LaTeX cleaner)
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("META-INF/container.xml",
                    '<rootfile full-path="c.opf"/>')
        zf.writestr("ch.xhtml",
                    "<html><body><p>" + _PROSE + "epsilon book</p></body></html>")
        zf.writestr("c.opf", '<dc:title>B</dc:title>'
                    '<item id="c" href="ch.xhtml"/><itemref idref="c"/>')
    (tmp_path / "b.epub").write_bytes(buf.getvalue())
    from apache_pinot_spark.operators.ebook import epub_to_documents

    books = epub_to_documents(spark, str(tmp_path / "b.epub"),
                              min_text_chars=50) \
        .select("doc_id", "text", "lang", F.lit("books.example").alias("source"),
                "n_chars", F.lit(None).cast("string").alias("url")) \
        .withColumn("lang", F.lit("en"))

    from apache_pinot_spark.operators.latex import latex_texts

    tex = spark.createDataFrame(
        [(991, "\\begin{document}" + _PROSE + "zeta paper\\end{document}")],
        "doc_id bigint, text string")
    papers = latex_texts(tex).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("arxiv.example").alias("source"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.lit(None).cast("string").alias("url"))

    corpus = web.unionByName(books).unionByName(papers)

    # --- every r11 gate on
    import hashlib

    junk_bucket = hashlib.md5(b"junkmarker").hexdigest()[:3]
    cfg = CurationConfig(
        normalize_unicode=True,
        url_dedup=True, block_domains=True, block_words=True,
        min_model_prob=0.4,
        exact_dedup=True, boilerplate=False, quality_filter=True,
        redact_pii=False, substring_dedup=True,
        substring_window_tokens=12, near_dedup=False, decontaminate=False,
    )
    stages = curate_corpus(
        corpus, cfg,
        blocked_domains=spark.createDataFrame([("blocked.example",)],
                                              "domain string"),
        word_blocklist=spark.createDataFrame([("casinoword",)],
                                             "word string"),
        quality_model=QualityModel(weights={junk_bucket: -400.0}, bias=2.0),
    )
    names = list(stages)
    assert names[:3] == ["input", "url_dedup", "domain_blocklist"]
    assert names.index("normalize") < names.index("exact_dedup")
    final = stages["splits"]
    rows = final.collect()
    # survivors: one of the URL-dup pair, delta, book, paper — the
    # blocked domain and banned word are gone
    markers = {("alpha" in r.text, "delta" in r.text,
                "epsilon" in r.text, "zeta" in r.text) for r in rows}
    texts = " || ".join(r.text for r in rows)
    assert "gamma" not in texts and "casinoword" not in texts
    assert "alpha" in texts and "delta" in texts
    assert "epsilon book" in texts and "zeta paper" in texts
    assert len(rows) == 4
    assert all(r.split in ("train", "val", "test") for r in rows)
    # substring dedup excised the shared _PROSE run from non-canonical
    # docs: it survives in at most one document
    assert sum(1 for r in rows if "ordinary paragraph" in r.text) <= 1

    # --- the data card closes the loop
    rep = corpus_report(final, top_k=5)
    assert rep["n_docs"] == 4 and rep["duplicate_text_rate"] == 0.0
    assert dict(rep["sources"]).keys() >= {"good.example.com"}


def test_wiki_and_code_mixture_through_recipes(spark, tmp_path):
    """r12 tiers composing: a MediaWiki dump and a code corpus each run
    their published recipe, then union into one mixture with splits and
    a data card — the multi-source pretraining-mix story."""
    import bz2

    from apache_pinot_spark.operators.mediawiki import wikitext_to_documents
    from apache_pinot_spark.operators.pipeline import curate_corpus
    from apache_pinot_spark.operators.recipes import (
        gopher_config,
        the_stack_code_config,
    )
    from apache_pinot_spark.operators.report import corpus_report

    # --- wiki tier: 6 articles + a redirect
    def page(title, pid, text):
        return (f"<page><title>{title}</title><ns>0</ns><id>{pid}</id>"
                f"<revision><id>{pid}0</id><text>{text}</text></revision>"
                f"</page>")

    body = ("'''Subject''' is a topic in [[science]] and the study of it "
            "has a long history with many results that are described "
            "in detail here for the reader to enjoy at length. " * 3
            + "{{refs}}")
    xml = "<mediawiki>" + "".join(
        page(f"Art {i}", i + 1, body + f" Variant number {i}.")
        for i in range(6)) + "</mediawiki>"
    wp = tmp_path / "wiki.xml.bz2"
    wp.write_bytes(bz2.compress(xml.encode()))
    wiki = wikitext_to_documents(spark, str(wp), min_text_chars=50) \
        .select("doc_id", "text", "source")
    wiki_stages = curate_corpus(
        wiki, gopher_config(gopher_overrides={"min_words": 20},
                            decontaminate=False,
                            near_threshold=0.95))
    wiki_out = wiki_stages["splits"].select("doc_id", "text", "source",
                                            "split")
    assert wiki_out.count() >= 1

    # --- code tier: 4 files, one autogen, one minified
    code_rows = [
        (1001, "# module one\n"
               "def useful_function(input_value):\n"
               "    # explain the step\n"
               "    return input_value + 1\n", "repo"),
        (1002, "// Auto-Generated. DO NOT EDIT\nint x = 1;\n", "repo"),
        (1003, "var a=1;" * 400 + "\n", "repo"),  # one huge line
        (1004, "-- query helper\nSELECT column_name FROM table_name "
               "WHERE other_column IS NOT NULL\n", "repo"),
    ]
    code = spark.createDataFrame(code_rows, "doc_id bigint, text string, "
                                            "source string")
    code_stages = curate_corpus(code, the_stack_code_config(near_dedup=False))
    code_out = code_stages["splits"].select("doc_id", "text", "source",
                                            "split")
    kept_code = sorted(r.doc_id for r in code_out.collect())
    assert kept_code == [1001, 1004]  # autogen + long-line dropped

    # --- the mixture
    mix = wiki_out.unionByName(code_out)
    rep = corpus_report(mix.drop("split"), top_k=5)
    assert rep["n_docs"] == mix.count()
    assert dict(rep["sources"]).keys() >= {"wikipedia", "repo"}
