"""LaTeX de-markup — the arXiv-corpus cleaning step (the RedPajama /
peS2o recipes run exactly this shape over arXiv source dumps): strip
comments and the preamble, drop float/figure environments, unwrap the
text-carrying macros, keep math inline — turning .tex source into the
prose a curation pipeline scores and dedups.

This is deliberately a CLEANER, not a TeX engine: no macro expansion,
no catcode games — the published recipes are the same pragmatic regex
pass, because training pipelines need the prose, not the typesetting.

Rules (all public-recipe standard):
  * ``%`` comments to end of line (``\\%`` escapes survive)
  * everything before ``\\begin{document}`` drops when present
  * DROP-environments (figure/table/tikzpicture/algorithm/verbatim
    equation*… — configurable) lose their whole body; all other
    environments keep their body, markers removed (``\\item`` → line
    break)
  * sectioning/text macros unwrap to their argument (section*, textbf,
    emph, footnote kept inline, …); reference/citation macros
    (cite/ref/eqref/label/includegraphics/url…) drop; remaining unknown
    ``\\macro[opt]{arg}`` keeps the arg when it looks like text, else
    drops the macro name alone
  * inline/display math is KEPT verbatim by default (``$…$``,
    ``\\(...\\)``, ``\\[...\\]``) — the published corpora keep it;
    ``math='drop'`` removes it
  * ``\\\\`` → newline; ``~`` → space; ``\\&/\\_/\\#/\\$/\\{/\\}`` unescape;
    leftover braces drop; blank lines collapse to paragraph breaks

Scale shape: per-row map-side (Arrow), zero shuffle — pair with
binaryFile/text reads of .tex dumps like every other ingest tier.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DROP_ENVS = ("figure", "figure*", "table", "table*", "tabular",
             "tikzpicture", "algorithm", "algorithmic", "verbatim",
             "lstlisting", "thebibliography", "filecontents")
#: macros whose braced argument IS text — unwrap
_UNWRAP = ("section", "section*", "subsection", "subsection*",
           "subsubsection", "subsubsection*", "paragraph", "chapter",
           "title", "author", "textbf", "textit", "texttt", "textsc",
           "textrm", "textsf", "emph", "underline", "mbox", "hbox",
           "caption", "footnote", "text")
#: macros that drop WITH their argument
_DROP_ARG = ("cite", "citep", "citet", "ref", "eqref", "pageref",
             "label", "includegraphics", "url", "href", "input",
             "include", "bibliography", "bibliographystyle",
             "usepackage", "documentclass", "vspace", "hspace")

_COMMENT_RE = re.compile(r"(?<!\\)%.*")
_ENV_TOKEN_RE = re.compile(r"\\(begin|end)\{([A-Za-z*]+)\}")


def _strip_envs(text: str, drop_envs) -> str:
    """One linear pass over begin/end tokens: drop-env bodies removed
    (nesting-aware), other env markers deleted."""
    drop = set(drop_envs)
    out = []
    pos = 0
    depth = 0
    for m in _ENV_TOKEN_RE.finditer(text):
        kind, env = m.group(1), m.group(2)
        if depth == 0:
            out.append(text[pos : m.start()])
        if env in drop:
            if kind == "begin":
                depth += 1
            elif depth > 0:
                depth -= 1
        pos = m.end()
    if depth == 0:
        out.append(text[pos:])
    return "".join(out)


def _unwrap_macros(text: str, max_iters: int = 12) -> str:
    unwrap = "|".join(re.escape(m) for m in _UNWRAP)
    droparg = "|".join(re.escape(m) for m in _DROP_ARG)
    un_re = re.compile(
        r"\\(?:" + unwrap + r")\s*(?:\[[^\]]*\])?\{([^{}]*)\}")
    dr_re = re.compile(
        r"\\(?:" + droparg + r")\s*(?:\[[^\]]*\])?(?:\{[^{}]*\})+")
    for _ in range(max_iters):  # innermost-out, bounded
        new = un_re.sub(r"\1", text)
        new = dr_re.sub("", new)
        if new == text:
            return new
        text = new
    return text


def latex_to_text(
    src: str,
    drop_envs=DROP_ENVS,
    math: str = "keep",
) -> str:
    """Clean prose of one .tex source (see module docstring)."""
    if math not in ("keep", "drop"):
        raise ValueError("math must be 'keep' or 'drop'")
    text = _COMMENT_RE.sub("", src)
    m = re.search(r"\\begin\{document\}", text)
    if m:
        text = text[m.end():]
    text = re.sub(r"\\end\{document\}.*", "", text, flags=re.S)
    text = _strip_envs(text, drop_envs)
    if math == "drop":
        text = re.sub(r"\$\$.*?\$\$", " ", text, flags=re.S)
        text = re.sub(r"(?<!\\)\$[^$]*\$", " ", text)
        text = re.sub(r"\\\[.*?\\\]", " ", text, flags=re.S)
        text = re.sub(r"\\\(.*?\\\)", " ", text)
    text = re.sub(r"\\item\b", "\n", text)
    text = _unwrap_macros(text)
    text = text.replace("\\\\", "\n")
    # remaining bare macros (maketitle, centering, Large, ...) drop
    text = re.sub(r"\\[A-Za-z@]+\s*(\[[^\]]*\])?", " ", text)
    for esc, ch in ((r"\%", "%"), (r"\&", "&"), (r"\_", "_"),
                    (r"\$", "$"), (r"\#", "#"), (r"\{", "{"),
                    (r"\}", "}")):
        text = text.replace(esc, ch)
    text = text.replace("~", " ").replace("{", "").replace("}", "")
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def latex_texts(
    df: DataFrame,
    src_col: str = "text",
    id_col: str = "doc_id",
    drop_envs=DROP_ENVS,
    math: str = "keep",
) -> DataFrame:
    """(id, text, n_chars) cleaned prose per .tex source row; NULL
    sources stay NULL. One Arrow map pass, zero shuffle."""
    id_type = dict(df.dtypes)[id_col]
    de = tuple(drop_envs)
    src = df.select(F.col(id_col).alias("id"), F.col(src_col).alias("s"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.latex import latex_to_text

        for pdf in batches:
            ids, texts, chars = [], [], []
            for mid, s in zip(pdf["id"], pdf["s"]):
                ids.append(mid)
                if s is None:
                    texts.append(None)
                    chars.append(None)
                    continue
                try:
                    t = latex_to_text(str(s), drop_envs=de, math=math)
                except Exception:
                    t = None
                texts.append(t)
                chars.append(len(t) if t is not None else None)
            yield _pd.DataFrame({"id": ids, "text": texts, "n_chars": chars})

    out = src.mapInPandas(
        run, schema=f"id {id_type}, text STRING, n_chars INT")
    return out.withColumnRenamed("id", id_col)
