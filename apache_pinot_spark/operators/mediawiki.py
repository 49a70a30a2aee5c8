"""MediaWiki XML dump ingestion + wikitext de-markup — the Wikipedia
slice every public LLM recipe includes (GPT-3, Gopher, RedPajama,
Dolma all carry one; see PAPERS.md). Two halves, same division of
labor as the repo's other ingest tiers:

  * **Multistream bz2 walking** (the `pages-articles-multistream`
    format Wikimedia actually publishes): the dump is a CONCATENATION
    of independent bz2 streams (a siteinfo stream, then ~100-page
    streams). Entropy decode goes through stdlib ``bz2`` (the codec is
    present; re-implementing Burrows-Wheeler would be waste) — but
    stream BOUNDARIES, per-stream error isolation, resync after a
    corrupt stream, and chunkwise inflation caps are this module's
    from-scratch work, the same contract as operators/zstdio (a bz2
    stream records no length; ``BZ2Decompressor.unused_data`` marks
    the boundary, and after corruption we scan for the next
    'BZh' + level + block-magic signature).
  * **Wikitext cleaning** (``wikitext_to_text``): the published
    WikiExtractor recipe shape — templates, tables, refs, file/image
    links, interwiki/category links, html-ish tags, emphasis and
    heading markers — as bounded iterative passes (the latex.py
    convention: a CLEANER, not a parser; training pipelines need the
    prose).

Scale shape: per-FILE parallelism via binaryFile reads for the normal
layout (dump shards); for one giant multistream file the published
``-index.txt.bz2`` (offset:pageid:title lines) turns into a byte-range
manifest — ``read_multistream_ranges`` seeks and decodes ONLY the
selected streams, the CDX/read_warc_ranges shape (1% selection ≈ 1%
I/O). All passes are Arrow maps; zero shuffle until curation.

Reference parity note: this is a beyond-reference LLM-pipeline tier
(the reference docs mirror has no ingestion for wiki dumps); format
knowledge is the public dumps.wikimedia.org layout + sqlite-free
multistream convention.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 'BZh' + compression level '1'..'9' + the \pi block magic — the only
#: reliable stream signature to resync on
_BZ2_STREAM_RE = re.compile(rb"BZh[1-9]\x31\x41\x59\x26\x53\x59")
_INFLATE_CHUNK = 1 << 20
DEFAULT_MAX_STREAM_BYTES = 64 << 20
DEFAULT_MAX_PAGE_BYTES = 4 << 20


def iter_bz2_streams(blob: bytes, max_stream_bytes: int = DEFAULT_MAX_STREAM_BYTES):
    """Yield ('stream', text_bytes) per decoded bz2 stream of a
    multistream blob, or ('reject', reason) for a stream that is
    corrupt or blows the inflation cap — the stream loses itself, never
    the file. Resync: scan for the next stream signature past the
    failure point."""
    import bz2

    pos = 0
    n = len(blob)
    while pos < n:
        m = _BZ2_STREAM_RE.search(blob, pos)
        if m is None:
            if pos == 0 and n:
                yield ("reject", "no bz2 stream signature")
            return
        if m.start() > pos and pos > 0:
            yield ("reject", f"garbage between streams at {pos}")
        start = m.start()
        dec = bz2.BZ2Decompressor()
        out = []
        total = 0
        p = start
        try:
            while p < n and not dec.eof:
                chunk = dec.decompress(blob[p:p + _INFLATE_CHUNK],
                                       max_length=_INFLATE_CHUNK)
                p += _INFLATE_CHUNK  # input consumed tracked via needs_input
                total += len(chunk)
                out.append(chunk)
                if total > max_stream_bytes:
                    raise ValueError(
                        f"stream at {start} exceeds cap {max_stream_bytes}")
                # drain pending output before feeding more input
                while not dec.eof and not dec.needs_input:
                    chunk = dec.decompress(b"", max_length=_INFLATE_CHUNK)
                    if not chunk:
                        break
                    total += len(chunk)
                    out.append(chunk)
                    if total > max_stream_bytes:
                        raise ValueError(
                            f"stream at {start} exceeds cap {max_stream_bytes}")
            if not dec.eof:
                raise ValueError(f"truncated stream at {start}")
            consumed = p - len(dec.unused_data) if p <= n else n - len(dec.unused_data)
            yield ("stream", b"".join(out))
            pos = max(consumed, start + 1)
        except Exception as exc:  # corrupt stream: reject + resync
            yield ("reject", f"stream at {start}: {exc}")
            nxt = _BZ2_STREAM_RE.search(blob, start + 1)
            pos = nxt.start() if nxt else n


# --------------------------------------------------------------------------
# <page> extraction
# --------------------------------------------------------------------------

_PAGE_RE = re.compile(r"<page>(.*?)</page>", re.S)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_NS_RE = re.compile(r"<ns>(-?\d+)</ns>")
_ID_RE = re.compile(r"<id>(\d+)</id>")
_REDIRECT_RE = re.compile(r"<redirect\b")
_TEXT_RE = re.compile(r"<text\b[^>]*?(/>|>(.*?)</text>)", re.S)
_ENTITY_MAP = {"lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'",
               "nbsp": " "}


def _unescape(s: str) -> str:
    def sub(m):
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _ENTITY_MAP.get(body, m.group(0))

    return re.sub(r"&(#?[0-9A-Za-z]+);", sub, s)


def parse_pages(xml_text: str, max_page_bytes: int = DEFAULT_MAX_PAGE_BYTES):
    """Yield one dict per <page> element of (possibly partial) dump
    XML: title, ns, page_id, redirect, wikitext. Oversized or
    malformed pages yield {'reject': reason} — per-page isolation."""
    for m in _PAGE_RE.finditer(xml_text):
        body = m.group(1)
        if len(body) > max_page_bytes:
            yield {"reject": f"page exceeds {max_page_bytes} bytes"}
            continue
        tm = _TITLE_RE.search(body)
        im = _ID_RE.search(body)
        if tm is None or im is None:
            yield {"reject": "page missing title/id"}
            continue
        nm = _NS_RE.search(body)
        xm = _TEXT_RE.search(body)
        text = xm.group(2) if xm is not None and xm.group(2) is not None else ""
        yield {
            "title": _unescape(tm.group(1).strip()),
            "ns": int(nm.group(1)) if nm else 0,
            "page_id": int(im.group(1)),
            "redirect": _REDIRECT_RE.search(body) is not None,
            "wikitext": _unescape(text),
        }


# --------------------------------------------------------------------------
# Wikitext cleaning (WikiExtractor recipe shape)
# --------------------------------------------------------------------------

#: tags whose CONTENT drops with them
_DROP_TAGS = ("ref", "references", "gallery", "timeline", "math",
              "chem", "score", "syntaxhighlight", "source", "pre",
              "nowiki", "imagemap", "hiero", "graph", "mapframe")
_DROP_TAG_RE = re.compile(
    r"<(" + "|".join(_DROP_TAGS) + r")\b[^>]*?/>"
    r"|<(" + "|".join(_DROP_TAGS) + r")\b[^>]*?>.*?</\2\s*>",
    re.S | re.I)
_COMMENT_TAG_RE = re.compile(r"<!--.*?-->", re.S)
_HTML_TAG_RE = re.compile(r"</?[A-Za-z][^>]*?>")
_MAGIC_RE = re.compile(r"__[A-Z]+__")
#: namespace prefixes whose [[links]] drop entirely (File/Image keep
#: nested-bracket handling; Category/interwiki are plain)
_DROP_LINK_NS = ("category", "file", "image", "media")


def _strip_nested(text: str, open_tok: str, close_tok: str,
                  max_iters: int = 24) -> str:
    """Remove innermost ``open_tok…close_tok`` spans repeatedly —
    bounded iterations (the latex.py discipline): templates and tables
    nest, and a pathological page must not loop forever."""
    o, c = re.escape(open_tok), re.escape(close_tok)
    # tempered dot: an innermost span contains neither a nested opener
    # nor a closer (a bare '|' inside a {|table|} body must not block
    # the match, so single-char exclusion classes are not enough)
    pat = re.compile(o + r"(?:(?!" + o + r"|" + c + r").)*?" + c, re.S)
    for _ in range(max_iters):
        new = pat.sub(" ", text)
        if new == text:
            break
        text = new
    return text


def _clean_links(text: str, max_iters: int = 12) -> str:
    # innermost-out so [[File:x|thumb|[[link|label]] caption]] resolves
    link = re.compile(r"\[\[([^\[\]]*?)\]\]", re.S)

    def sub(m):
        body = m.group(1)
        target, _, label = body.partition("|")
        ns = target.split(":", 1)[0].strip().lower() if ":" in target else ""
        if ns in _DROP_LINK_NS or (ns and len(ns) in (2, 3) and ns.isalpha()
                                   and target.strip().startswith(ns + ":")):
            # file/category/interwiki: keep a caption only for File when
            # it is plain prose? recipe standard: drop entirely
            return " "
        return (label or target).rpartition("|")[2]

    for _ in range(max_iters):
        new = link.sub(sub, text)
        if new == text:
            break
        text = new
    return text


def wikitext_to_text(src: str) -> str:
    """Clean prose of one wikitext page (see module docstring)."""
    text = _COMMENT_TAG_RE.sub(" ", src)
    text = _DROP_TAG_RE.sub(" ", text)
    text = _strip_nested(text, "{{", "}}")
    text = _strip_nested(text, "{|", "|}")
    text = _clean_links(text)
    # external links: [url label] -> label, bare [url] -> drop
    text = re.sub(r"\[(?:https?|ftp)://[^\s\]]+\s+([^\]]*)\]", r"\1", text)
    text = re.sub(r"\[(?:https?|ftp)://[^\]]*\]", " ", text)
    text = _HTML_TAG_RE.sub(" ", text)
    text = _MAGIC_RE.sub(" ", text)
    text = text.replace("'''", "").replace("''", "")
    # headings == H == -> the heading text as its own line
    text = re.sub(r"^=+\s*(.*?)\s*=+\s*$", r"\1", text, flags=re.M)
    # list/indent/definition markers
    text = re.sub(r"^[*#:;]+\s*", "", text, flags=re.M)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


# --------------------------------------------------------------------------
# Spark readers
# --------------------------------------------------------------------------

_PAGE_SCHEMA = ("path STRING, title STRING, ns INT, page_id BIGINT, "
                "redirect BOOLEAN, wikitext STRING, n_rejected INT")


def _emit_pages(path, xml_text, out, max_page_bytes):
    n_rej = 0
    emitted = 0
    for page in parse_pages(xml_text, max_page_bytes):
        if "reject" in page:
            n_rej += 1
            continue
        out["path"].append(path)
        out["title"].append(page["title"])
        out["ns"].append(page["ns"])
        out["page_id"].append(page["page_id"])
        out["redirect"].append(page["redirect"])
        out["wikitext"].append(page["wikitext"])
        out["n_rejected"].append(0)
        emitted += 1
    return emitted, n_rej


def mediawiki_pages(
    spark: SparkSession,
    paths,
    max_stream_bytes: int = DEFAULT_MAX_STREAM_BYTES,
    max_page_bytes: int = DEFAULT_MAX_PAGE_BYTES,
) -> DataFrame:
    """(path, title, ns, page_id, redirect, wikitext, n_rejected) per
    page of .xml / .xml.bz2 (multistream) dump files. Per-stream AND
    per-page error isolation: a corrupt bz2 stream or oversized page
    adds an all-NULL ledger row carrying the reject count, never fails
    the file. Parallelism = files (shard layout); use
    ``read_multistream_ranges`` + the dump's index for intra-file
    parallelism on one giant multistream file."""
    blobs = spark.read.format("binaryFile").load(
        paths if isinstance(paths, str) else list(paths)
    ).select("path", "content")

    def run(batches):
        import pandas as _pd

        from apache_pinot_spark.operators.mediawiki import (
            _emit_pages,
            iter_bz2_streams,
        )

        cols = ("path", "title", "ns", "page_id", "redirect", "wikitext",
                "n_rejected")
        for pdf in batches:
            out = {k: [] for k in cols}
            for path, blob in zip(pdf["path"], pdf["content"]):
                blob = bytes(blob)
                n_rej = 0
                if path.endswith(".bz2") or blob[:3] == b"BZh":
                    for kind, payload in iter_bz2_streams(blob,
                                                          max_stream_bytes):
                        if kind == "reject":
                            n_rej += 1
                            continue
                        _, rej = _emit_pages(
                            path, payload.decode("utf-8", "replace"),
                            out, max_page_bytes)
                        n_rej += rej
                else:
                    _, rej = _emit_pages(
                        path, blob.decode("utf-8", "replace"),
                        out, max_page_bytes)
                    n_rej += rej
                if n_rej:
                    out["path"].append(path)
                    for k in cols[1:-1]:
                        out[k].append(None)
                    out["n_rejected"].append(n_rej)
            yield _pd.DataFrame(out)

    return blobs.mapInPandas(run, schema=_PAGE_SCHEMA)


def read_multistream_index(blob: bytes) -> list:
    """Parse a ``-index.txt(.bz2)`` companion file: 'offset:page_id:
    title' lines → [(offset, page_id, title)]. Malformed lines are
    skipped (per-line isolation)."""
    import bz2

    if blob[:3] == b"BZh":
        blob = bz2.decompress(blob)
    out = []
    for line in blob.decode("utf-8", "replace").splitlines():
        head, _, title = line.partition(":")
        pid_s, _, title = title.partition(":")
        try:
            out.append((int(head), int(pid_s), title))
        except ValueError:
            continue
    return out


def read_multistream_ranges(
    spark: SparkSession,
    manifest: DataFrame,
    base_dir: str | None = None,
    max_stream_bytes: int = DEFAULT_MAX_STREAM_BYTES,
    max_page_bytes: int = DEFAULT_MAX_PAGE_BYTES,
) -> DataFrame:
    """Byte-range page reads of ONE giant multistream dump: ``manifest``
    rows are (filename STRING, offsets ARRAY<BIGINT>) — stream start
    offsets from the dump's index (read_multistream_index), grouped by
    the caller to bound per-task work (the fetch_manifest shape).
    Each task seeks to its offsets and decodes exactly those streams —
    selected-pages I/O instead of whole-dump I/O."""
    base = base_dir

    def run(batches):
        import os

        import pandas as _pd

        from apache_pinot_spark.operators.mediawiki import (
            _emit_pages,
            iter_bz2_streams,
        )

        cols = ("path", "title", "ns", "page_id", "redirect", "wikitext",
                "n_rejected")
        for pdf in batches:
            for fname, offsets in zip(pdf["filename"], pdf["offsets"]):
                out = {k: [] for k in cols}
                path = os.path.join(base, fname) if base else fname
                n_rej = 0
                try:
                    fh = open(path, "rb")
                except OSError:
                    fh = None
                if fh is not None:
                    offs = sorted(int(o) for o in offsets)
                    for i, off in enumerate(offs):
                        fh.seek(off)
                        # one stream: read until the decompressor says
                        # eof; cap the read window at the next offset
                        # when known, else at the stream-size bound (a
                        # bare read(-1) would pull the WHOLE dump tail
                        # into memory for the file's last selected
                        # stream — a real 20 GB-dump bomb)
                        end = offs[i + 1] if i + 1 < len(offs) else None
                        cap = (end - off) if end \
                            else max_stream_bytes + (1 << 16)
                        span = fh.read(cap)
                        got = False
                        for kind, payload in iter_bz2_streams(
                                span, max_stream_bytes):
                            if kind == "reject" or got:
                                n_rej += 0 if got else 1
                                break
                            _, rej = _emit_pages(
                                fname, payload.decode("utf-8", "replace"),
                                out, max_page_bytes)
                            n_rej += rej
                            got = True
                    fh.close()
                else:
                    n_rej += len(offsets)
                if n_rej or not out["path"]:
                    out["path"].append(fname)
                    for k in cols[1:-1]:
                        out[k].append(None)
                    out["n_rejected"].append(n_rej)
                yield _pd.DataFrame(out)

    return manifest.mapInPandas(run, schema=_PAGE_SCHEMA)


def wikitext_to_documents(
    spark: SparkSession,
    paths,
    min_text_chars: int = 1,
    keep_ns: tuple = (0,),
    max_stream_bytes: int = DEFAULT_MAX_STREAM_BYTES,
    max_page_bytes: int = DEFAULT_MAX_PAGE_BYTES,
) -> DataFrame:
    """Dump files → curation-ready documents frame (doc_id, text, lang,
    source, n_chars, url, title): main-namespace non-redirect pages,
    wikitext cleaned to prose — drop-in input for
    pipeline.curate_corpus. doc_id = xxhash64 of title+page_id (stable
    across dump re-reads); one extra Arrow pass for the cleaner."""
    pages = mediawiki_pages(spark, paths, max_stream_bytes, max_page_bytes)
    kept = pages.filter(
        F.col("title").isNotNull()
        & ~F.col("redirect")
        & F.col("ns").isin(*[int(x) for x in keep_ns])
    ).select("title", "page_id", "wikitext")

    def clean(batches):
        import pandas as _pd

        from apache_pinot_spark.operators.mediawiki import wikitext_to_text

        for pdf in batches:
            texts = []
            for w in pdf["wikitext"]:
                try:
                    texts.append(wikitext_to_text(w) if w is not None else None)
                except Exception:
                    texts.append(None)
            res = pdf[["title", "page_id"]].copy()
            res["text"] = texts
            yield res

    cleaned = kept.mapInPandas(
        clean, schema="title STRING, page_id BIGINT, text STRING")
    return cleaned.select(
        F.xxhash64(F.concat_ws("\x00", "title",
                               F.col("page_id").cast("string"))).alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        F.lit("wikipedia").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.concat(F.lit("https://en.wikipedia.org/wiki/"),
                 F.regexp_replace("title", " ", "_")).alias("url"),
        "title",
    ).filter(F.col("text").isNotNull()
             & (F.col("n_chars") >= min_text_chars))
