"""EPUB ingestion (operators/ebook.py): hand-built EPUB fixtures,
spine-order text, Dublin-Core metadata, per-chapter error isolation,
zip-bomb member capping, reject paths, and the Spark operator."""

from __future__ import annotations

import io
import zipfile

import pytest

from apache_pinot_spark.operators import ebook as E

_CH = ("<html><body><p>Chapter %d prose goes here with the usual common "
       "stopwords that real writing always has in it and plenty of words "
       "to pass the paragraph gate.</p></body></html>")


def _epub(chapters=3, title=b"A Book", scramble_spine=False,
          missing_member=None, extra_opf=b"", compression=zipfile.ZIP_DEFLATED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml",
                    '<container><rootfiles><rootfile full-path="OEBPS/content.opf"'
                    ' media-type="application/oebps-package+xml"/></rootfiles>'
                    "</container>")
        items, refs = [], []
        order = list(range(chapters))
        if scramble_spine:
            order = order[::-1]
        for i in range(chapters):
            name = f"ch{i}.xhtml"
            if missing_member != i:
                zf.writestr(f"OEBPS/{name}", _CH % i)
            items.append(f'<item id="c{i}" href="{name}" '
                         'media-type="application/xhtml+xml"/>')
        for i in order:
            refs.append(f'<itemref idref="c{i}"/>')
        opf = ("<package><metadata>"
               "<dc:title>" + title.decode() + "</dc:title>"
               "<dc:creator opf:role='aut'>An Author</dc:creator>"
               "<dc:language>en</dc:language></metadata>"
               "<manifest>" + "".join(items) + "</manifest>"
               "<spine>" + "".join(refs) + "</spine></package>")
        zf.writestr("OEBPS/content.opf", opf + extra_opf.decode())
    return buf.getvalue()


def test_parse_epub_spine_order_and_metadata():
    title, creator, lang, text, n_ch, n_rej = E.parse_epub(_epub())
    assert (title, creator, lang) == ("A Book", "An Author", "en")
    assert (n_ch, n_rej) == (3, 0)
    idx = [text.index(f"Chapter {i} prose") for i in range(3)]
    assert idx == sorted(idx)
    # reversed spine reverses the reading order
    _, _, _, text_r, _, _ = E.parse_epub(_epub(scramble_spine=True))
    idx_r = [text_r.index(f"Chapter {i} prose") for i in range(3)]
    assert idx_r == sorted(idx_r, reverse=True)


def test_missing_chapter_loses_only_itself():
    _, _, _, text, n_ch, n_rej = E.parse_epub(_epub(missing_member=1))
    assert "Chapter 0 prose" in text and "Chapter 2 prose" in text
    assert "Chapter 1 prose" not in text
    assert n_ch == 2 and n_rej == 1


def test_bomb_chapter_caps_not_oom():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("META-INF/container.xml",
                    '<rootfile full-path="content.opf"/>')
        zf.writestr("content.opf",
                    '<item id="c0" href="big.xhtml"/><itemref idref="c0"/>')
        # ~64 MB of compressible padding inside one chapter
        zf.writestr("big.xhtml",
                    "<p>" + ("word " * 8) + "</p>" + " " * (64 << 20))
    _, _, _, text, n_ch, n_rej = E.parse_epub(buf.getvalue(),
                                              max_member_bytes=1 << 20)
    assert n_ch == 1  # truncated at the cap, chapter still read
    assert "word" in text


def test_reject_paths():
    with pytest.raises(ValueError, match="zip"):
        E.parse_epub(b"not a zip at all")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("something.txt", "hello")
    with pytest.raises(ValueError, match="container.xml"):
        E.parse_epub(buf.getvalue())


def test_spark_epub_texts(spark):
    rows = [(1, _epub()), (2, _epub(title=b"Other", chapters=1)),
            (3, b"garbage"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r for r in E.epub_texts(df).collect()}
    assert got[1].title == "A Book" and got[1].n_chapters == 3
    assert got[1].n_chars == len(got[1].text)
    assert got[2].title == "Other"
    assert got[3].text is None and got[4].text is None


def test_feeds_documents_pipeline(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, _epub(title=b"B%d" % i)) for i in range(4)],
        "doc_id bigint, content binary")
    docs = E.epub_texts(df).filter(F.col("text").isNotNull()).select(
        "doc_id", "text", F.col("language").alias("lang"),
        F.lit("books").alias("source"),
        F.col("n_chars").cast("bigint").alias("n_chars"))
    from apache_pinot_spark.operators.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    stages = curate_corpus(docs, CurationConfig(decontaminate=False,
                                                near_dedup=False))
    # the four books are textually identical modulo title: exact dedup
    # keeps one
    assert stages["exact_dedup"].count() == 1


def test_epub_to_documents_one_call(spark, tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    (d / "one.epub").write_bytes(_epub(title=b"One", chapters=4))
    (d / "junk.epub").write_bytes(b"not a zip")
    docs = E.epub_to_documents(spark, str(d / "*.epub"), min_text_chars=50)
    rows = docs.collect()
    assert len(rows) == 1
    assert (rows[0].title, rows[0].source, rows[0].lang) == ("One", "books", "en")
