"""EPUB → training text — the book-corpus ingestion tier: EPUB is a
ZIP (stdlib zipfile) of XHTML chapters listed by an OPF package file,
and the repo already ships the HTML-to-paragraph extractor
(operators/htmltext), so books cost only the container walk. Public
format (EPUB 2/3, IDPF/W3C).

Walk: META-INF/container.xml → rootfile full-path → OPF → spine
itemrefs (reading order) joined to manifest item hrefs → each chapter
through the boilerplate-gated paragraph extractor → one document per
book. Dublin-Core title/creator/language come from the OPF. The OPF
and container are parsed with REGEX over the raw XML rather than an
XML tree: the fields needed are three attribute grabs, and stdlib
ElementTree on attacker-controlled input is a larger surface than the
extraction warrants.

Untrusted-input bounds (the repo's hardening standard):
  * per-member decompressed reads are CAP-BOUNDED via chunked
    ZipExtFile reads (``max_member_bytes``) — a zip-bomb chapter
    truncates at the cap instead of materializing
  * chapter count is capped (``max_chapters``); missing/corrupt
    members lose only themselves (per-chapter isolation, counted in
    ``n_rejected``)
  * a corrupt container/OPF rejects the blob to the NULL row

Scale shape: per-row map-side work over the binary column
(Arrow-batched, zero shuffle) — the WARC-tier contract with books as
blobs; pair with ``spark.read.format("binaryFile")`` over .epub paths.
"""

from __future__ import annotations

import io
import re
import zipfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROOTFILE_RE = re.compile(rb'full-path\s*=\s*["\']([^"\']+)["\']')
_ITEM_RE = re.compile(
    rb'<item\b[^>]*\bid\s*=\s*["\']([^"\']+)["\'][^>]*\bhref\s*=\s*'
    rb'["\']([^"\']+)["\'][^>]*?/?>', re.S)
_ITEM_HREF_FIRST_RE = re.compile(
    rb'<item\b[^>]*\bhref\s*=\s*["\']([^"\']+)["\'][^>]*\bid\s*=\s*'
    rb'["\']([^"\']+)["\'][^>]*?/?>', re.S)
_ITEMREF_RE = re.compile(rb'<itemref\b[^>]*\bidref\s*=\s*["\']([^"\']+)["\']')
_DC_RE = {
    "title": re.compile(rb"<dc:title[^>]*>(.*?)</dc:title>", re.S),
    "creator": re.compile(rb"<dc:creator[^>]*>(.*?)</dc:creator>", re.S),
    "language": re.compile(rb"<dc:language[^>]*>(.*?)</dc:language>", re.S),
}
_READ_CHUNK = 1 << 20


def _read_bounded(zf: zipfile.ZipFile, name: str, cap: int) -> bytes:
    """Chunked member read: decompression stops at the cap (a lying
    size field or a bomb member cannot materialize past it)."""
    out = bytearray()
    with zf.open(name) as fh:
        while len(out) <= cap:
            chunk = fh.read(min(_READ_CHUNK, cap + 1 - len(out)))
            if not chunk:
                break
            out += chunk
    return bytes(out[:cap])


def _xml_text(raw: bytes) -> str:
    from html import unescape

    return unescape(raw.decode("utf-8", "replace")).strip()


def parse_epub(
    blob: bytes,
    max_member_bytes: int = 16 << 20,
    max_chapters: int = 2000,
    **gate_kwargs,
):
    """(title, creator, language, text, n_chapters, n_rejected) for one
    EPUB blob — chapters in spine order through the boilerplate-gated
    paragraph extractor, joined by blank lines. Raises ValueError for
    non-EPUB/corrupt containers (the Spark operator turns that into the
    NULL row)."""
    from apache_pinot_spark.operators.htmltext import html_to_text

    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        names = set(zf.namelist())
    except Exception as exc:
        raise ValueError(f"not a readable zip container: {exc}") from exc
    if "META-INF/container.xml" not in names:
        raise ValueError("no META-INF/container.xml — not an EPUB")
    container = _read_bounded(zf, "META-INF/container.xml", 1 << 20)
    m = _ROOTFILE_RE.search(container)
    if not m:
        raise ValueError("container.xml names no rootfile")
    opf_path = m.group(1).decode("utf-8", "replace")
    if opf_path not in names:
        raise ValueError(f"rootfile {opf_path!r} missing from the zip")
    opf = _read_bounded(zf, opf_path, 4 << 20)
    meta = {k: (_xml_text(p.search(opf).group(1))
                if p.search(opf) else None)
            for k, p in _DC_RE.items()}
    items = {i.decode("utf-8", "replace"): h.decode("utf-8", "replace")
             for i, h in _ITEM_RE.findall(opf)}
    for h, i in _ITEM_HREF_FIRST_RE.findall(opf):  # attr order varies
        items.setdefault(i.decode("utf-8", "replace"),
                         h.decode("utf-8", "replace"))
    spine = [i.decode("utf-8", "replace") for i in _ITEMREF_RE.findall(opf)]
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    parts, n_ch, n_rej = [], 0, 0
    for idref in spine:
        if n_ch >= max_chapters:
            n_rej += 1
            continue
        href = items.get(idref)
        if not href:
            n_rej += 1
            continue
        path = base + href
        # normalize ../ the way zip paths are stored
        while "/../" in path:
            path = re.sub(r"[^/]+/\.\./", "", path, count=1)
        if path not in names:
            n_rej += 1
            continue
        try:
            raw = _read_bounded(zf, path, max_member_bytes)
            text = html_to_text(raw.decode("utf-8", "replace"),
                                **gate_kwargs)
        except Exception:
            n_rej += 1
            continue
        if text:
            parts.append(text)
        n_ch += 1
    if n_ch == 0:
        raise ValueError("no readable spine chapters")
    return (meta["title"], meta["creator"], meta["language"],
            "\n\n".join(parts), n_ch, n_rej)


def epub_texts(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_member_bytes: int = 16 << 20,
    max_chapters: int = 2000,
) -> DataFrame:
    """(id, title, creator, language, text, n_chars, n_chapters,
    n_rejected) per EPUB blob — one document per book, ready for the
    documents-table operators. Non-EPUB/corrupt blobs emit ONE all-NULL
    row (the multimodal reject convention). One Arrow map pass, zero
    shuffle."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.ebook import parse_epub

        cols = ("id", "title", "creator", "language", "text", "n_chars",
                "n_chapters", "n_rejected")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, blob in zip(pdf["id"], pdf["c"]):
                out["id"].append(mid)
                try:
                    title, creator, lang, text, n_ch, n_rej = parse_epub(
                        bytes(blob) if blob is not None else b"",
                        max_member_bytes=max_member_bytes,
                        max_chapters=max_chapters)
                except Exception:
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                out["title"].append(title)
                out["creator"].append(creator)
                out["language"].append(lang)
                out["text"].append(text)
                out["n_chars"].append(len(text))
                out["n_chapters"].append(n_ch)
                out["n_rejected"].append(n_rej)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, title STRING, creator STRING, "
               "language STRING, text STRING, n_chars INT, "
               "n_chapters INT, n_rejected INT",
    )
    return out.withColumnRenamed("id", id_col)


def epub_to_documents(
    spark,
    path_glob: str,
    min_text_chars: int = 200,
    max_member_bytes: int = 16 << 20,
    max_chapters: int = 2000,
) -> DataFrame:
    """One-call book-corpus ingest: *.epub files → (doc_id, title,
    creator, text, lang, n_chars, source='books') in the
    documents-table shape (the crawl_to_documents twin for books)."""
    files = spark.read.format("binaryFile").load(path_glob)
    texts = epub_texts(files, content_col="content", id_col="path",
                       max_member_bytes=max_member_bytes,
                       max_chapters=max_chapters)
    return (
        texts.filter(F.col("text").isNotNull()
                     & (F.col("n_chars") >= min_text_chars))
        .select(
            F.xxhash64(F.col("path")).alias("doc_id"),
            "title", "creator", "text",
            F.col("language").alias("lang"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.lit("books").alias("source"),
        )
    )


_WP_RE = re.compile(rb"<w:p[ >].*?</w:p>", re.S)
_WT_RE = re.compile(rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.S)
_TAG_RE = re.compile(rb"<[^>]+>")


def parse_docx(blob: bytes, max_member_bytes: int = 64 << 20) -> str:
    """Visible text of a DOCX (OOXML WordprocessingML, ECMA-376 —
    public): word/document.xml's <w:t> runs grouped by <w:p> paragraphs,
    entities decoded. Tables/headers/footnotes live in other parts and
    are out of the baseline (documented bound). Raises ValueError for
    non-DOCX containers; the same cap-bounded member reads as EPUB."""
    from html import unescape

    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        names = set(zf.namelist())
    except Exception as exc:
        raise ValueError(f"not a readable zip container: {exc}") from exc
    if "word/document.xml" not in names:
        raise ValueError("no word/document.xml — not a DOCX")
    xml = _read_bounded(zf, "word/document.xml", max_member_bytes)
    paras = []
    for p in _WP_RE.findall(xml):
        runs = [unescape(t.decode("utf-8", "replace"))
                for t in _WT_RE.findall(p)]
        text = "".join(_TAG_RE.sub(b"", r.encode()).decode("utf-8", "replace")
                       if "<" in r else r for r in runs).strip()
        if text:
            paras.append(text)
    if not paras:
        raise ValueError("no paragraph text in document.xml")
    return "\n".join(paras)


def docx_texts(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_member_bytes: int = 64 << 20,
) -> DataFrame:
    """(id, text, n_chars) per DOCX blob; non-DOCX/corrupt blobs emit
    ONE all-NULL row. One Arrow map pass, zero shuffle."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.ebook import parse_docx

        for pdf in batches:
            ids, texts, chars = [], [], []
            for mid, blob in zip(pdf["id"], pdf["c"]):
                ids.append(mid)
                try:
                    text = parse_docx(
                        bytes(blob) if blob is not None else b"",
                        max_member_bytes=max_member_bytes)
                except Exception:
                    texts.append(None)
                    chars.append(None)
                    continue
                texts.append(text)
                chars.append(len(text))
            yield _pd.DataFrame({"id": ids, "text": texts, "n_chars": chars})

    out = src.mapInPandas(
        run, schema=f"id {id_type}, text STRING, n_chars INT")
    return out.withColumnRenamed("id", id_col)
