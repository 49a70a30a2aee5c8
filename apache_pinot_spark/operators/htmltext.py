"""HTML → training text extraction — the step between a crawl ingest
(operators/warc) and the documents-table operators (quality scoring,
dedup, curation): pure-stdlib (html.parser) extraction of visible text
with paragraph structure, plus the jusText-style paragraph gate built
from signals this repo already ships (stopword density, link density,
length) — no parsing library, no network.

What it does:
  * strips <script>/<style>/<noscript>/<template>/<svg> subtrees,
    comments, doctypes and processing instructions
  * decodes entities (stdlib HTMLParser does &amp;/&#x2014;/named forms)
  * emits PARAGRAPHS: text runs split at block-level boundaries
    (p, div, br, li, h1-6, tr, section, article, blockquote, pre),
    whitespace-normalized
  * per-paragraph signals: char length, word count, link density
    (fraction of words inside <a>), stopword density (the repo's
    DEFAULT_STOP_WORDS)
  * the boilerplate gate (``keep``): jusText-shaped heuristic —
    paragraphs that are short, link-heavy, or stopword-poor are
    navigation/boilerplate and drop; the kept paragraphs join to the
    document text a pipeline feeds to quality scoring and dedup

Malformed HTML never raises: html.parser is a tolerant tokenizer (tag
soup degrades to best-effort text), which is the correct contract for
web corpora — the reject stream is only for rows whose input is NULL.

Scale shape: per-row map-side work (Arrow-batched, zero shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SKIP_SUBTREES = {"script", "style", "noscript", "template", "svg",
                  "head", "iframe"}
_BLOCK_TAGS = {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
               "h5", "h6", "tr", "td", "th", "table", "section", "article",
               "blockquote", "pre", "header", "footer", "nav", "aside",
               "main", "figure", "figcaption", "hr", "form"}


@dataclass
class Paragraph:
    text: str
    n_chars: int
    n_words: int
    link_density: float
    stopword_density: float


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.link_depth = 0
        self.parts: list = []  # (text, in_link) runs of the current para
        self.paragraphs: list = []
        # page-level signals (meta/link live in <head>, whose DATA is
        # skipped but whose start tags still fire)
        self.robots_noindex = False
        self.canonical_url: str | None = None

    def _flush(self):
        if not self.parts:
            return
        words, link_words = [], 0
        for text, in_link in self.parts:
            ws = text.split()
            words.extend(ws)
            if in_link:
                link_words += len(ws)
        self.parts = []
        if not words:
            return
        self.paragraphs.append((" ".join(words), link_words))

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self.skip_depth += 1
        elif tag == "a":
            self.link_depth += 1
        elif tag == "meta":
            a = dict(attrs)
            if (a.get("name") or "").strip().lower() == "robots" \
                    and "noindex" in (a.get("content") or "").lower():
                self.robots_noindex = True
        elif tag == "link":
            a = dict(attrs)
            rels = (a.get("rel") or "").lower().split()
            href = (a.get("href") or "").strip()
            if "canonical" in rels and href and self.canonical_url is None:
                self.canonical_url = href
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and self.skip_depth > 0:
            self.skip_depth -= 1
        elif tag == "a" and self.link_depth > 0:
            self.link_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self.skip_depth == 0 and data.strip():
            self.parts.append((data, self.link_depth > 0))

    def close(self):
        super().close()
        self._flush()


def extract_page(html: str, stop_words: frozenset | None = None):
    """([Paragraph], robots_noindex, canonical_url) — the paragraph
    extraction plus the page-level indexing signals a crawl pipeline
    gates/canonicalizes on (<meta name=robots content=noindex> and
    <link rel=canonical>). One parse."""
    paras, p = _paragraphs_and_parser(html, stop_words)
    return paras, p.robots_noindex, p.canonical_url


def extract_paragraphs(html: str, stop_words: frozenset | None = None) -> list:
    """[Paragraph] for the visible text of ``html`` (tolerant of tag
    soup — malformed markup degrades, never raises)."""
    return _paragraphs_and_parser(html, stop_words)[0]


def _paragraphs_and_parser(html: str, stop_words: frozenset | None = None):
    from apache_pinot_spark.functions.text import DEFAULT_STOP_WORDS

    sw = stop_words if stop_words is not None else DEFAULT_STOP_WORDS
    p = _Extractor()
    p.feed(html)
    p.close()
    out = []
    for text, link_words in p.paragraphs:
        words = text.split()
        n = len(words)
        stops = sum(1 for w in words if w.lower().strip(".,;:!?\"'()") in sw)
        out.append(Paragraph(
            text=text,
            n_chars=len(text),
            n_words=n,
            link_density=link_words / n if n else 0.0,
            stopword_density=stops / n if n else 0.0,
        ))
    return out, p


def keep_paragraph(p: Paragraph,
                   min_words: int = 5,
                   max_link_density: float = 0.4,
                   min_stopword_density: float = 0.05) -> bool:
    """jusText-shaped boilerplate gate: drop short, link-heavy, or
    stopword-poor paragraphs (navigation, footers, tag clouds). The
    stopword floor only applies to paragraphs long enough for the
    signal to mean anything (>= 10 words)."""
    if p.n_words < min_words:
        return False
    if p.link_density > max_link_density:
        return False
    if p.n_words >= 10 and p.stopword_density < min_stopword_density:
        return False
    return True


def html_to_text(html: str, **gate_kwargs) -> str:
    """The kept paragraphs joined with newlines — the document text a
    curation pipeline feeds to quality scoring / dedup."""
    return "\n".join(
        p.text for p in extract_paragraphs(html) if keep_paragraph(p, **gate_kwargs)
    )


def extract_html_text(
    df: DataFrame,
    html_col: str = "body",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_link_density: float = 0.4,
    min_stopword_density: float = 0.05,
    passthrough: tuple = (),
) -> DataFrame:
    """(id, *passthrough, text, n_paragraphs, n_kept, n_chars,
    link_density, robots_noindex, canonical_url) per row —
    boilerplate-gated visible text plus the audit counts and the page's
    indexing signals (noindex gate / rel=canonical for URL dedup).
    NULL input rows emit NULL text (the reject convention); malformed
    markup degrades to best-effort extraction, by design.
    ``passthrough`` columns ride THROUGH the Arrow map's schema
    unchanged, so callers never need a metadata re-join (a doc_id
    self-join here would shuffle the whole corpus twice at crawl
    scale). One Arrow map pass, zero shuffle."""
    dtypes = dict(df.dtypes)
    id_type = dtypes[id_col]
    reserved = {"id", "h", "text", "n_paragraphs", "n_kept", "n_chars",
                "link_density", "robots_noindex", "canonical_url"}
    bad = [c for c in passthrough
           if c in reserved or c in (id_col, html_col)]
    if bad:
        raise ValueError(f"passthrough columns collide with outputs: {bad}")
    src = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in passthrough],
        F.col(html_col).alias("h"),
    )
    pt = tuple(passthrough)

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.htmltext import (
            extract_page,
            keep_paragraph,
        )

        cols = ("id", "text", "n_paragraphs", "n_kept", "n_chars",
                "link_density", "robots_noindex", "canonical_url")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, html in zip(pdf["id"], pdf["h"]):
                out["id"].append(mid)
                if html is None:
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                paras, noindex, canonical = extract_page(str(html))
                kept = [p for p in paras if keep_paragraph(
                    p, min_words=min_words,
                    max_link_density=max_link_density,
                    min_stopword_density=min_stopword_density)]
                text = "\n".join(p.text for p in kept)
                total_words = sum(p.n_words for p in paras)
                link_words = sum(p.link_density * p.n_words for p in paras)
                out["text"].append(text)
                out["n_paragraphs"].append(len(paras))
                out["n_kept"].append(len(kept))
                out["n_chars"].append(len(text))
                out["link_density"].append(
                    link_words / total_words if total_words else 0.0)
                out["robots_noindex"].append(noindex)
                out["canonical_url"].append(canonical)
            frame = _pd.DataFrame(out)
            for c in pt:  # row order is preserved: copy columns verbatim
                frame[c] = list(pdf[c])
            yield frame[["id", *pt, *cols[1:]]]

    pt_schema = "".join(f", {c} {dtypes[c]}" for c in passthrough)
    out = src.mapInPandas(
        run,
        schema=f"id {id_type}{pt_schema}, text STRING, n_paragraphs INT, "
               "n_kept INT, n_chars INT, link_density DOUBLE, "
               "robots_noindex BOOLEAN, canonical_url STRING",
    )
    return out.withColumnRenamed("id", id_col)
