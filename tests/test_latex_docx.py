"""LaTeX de-markup (operators/latex.py) + DOCX extraction
(operators/ebook.parse_docx): arXiv-recipe cleaning goldens, env/math
handling, and OOXML paragraph extraction with reject paths."""

from __future__ import annotations

import io
import zipfile

import pytest

from apache_pinot_spark.operators import latex as L
from apache_pinot_spark.operators.ebook import docx_texts, parse_docx

_TEX = r"""
\documentclass{article}
\usepackage{amsmath}  % a package comment
\title{A \textbf{Great} Paper}
\begin{document}
\maketitle
\section{Introduction}
This is the introduction\footnote{with a footnote}. It cites
\cite{someone2020} and refers to Section~\ref{sec:x}. 50\% of the
time it works every time.
% full-line comment gone
\begin{figure}
  \includegraphics{plot.png}
  \caption{dropped with the figure}
\end{figure}
\begin{itemize}
\item first point
\item second point
\end{itemize}
The energy is $E = mc^2$ inline.
\begin{equation}
a^2 + b^2 = c^2
\end{equation}
\emph{Closing} thoughts.
\end{document}
"""


def test_latex_cleaning_golden():
    text = L.latex_to_text(_TEX)
    assert "Introduction" in text
    assert "This is the introduction" in text and "with a footnote" in text
    assert "someone2020" not in text          # \cite dropped
    assert "50% of the" in text               # \% unescaped
    assert "a package comment" not in text    # comments gone
    assert "dropped with the figure" not in text  # figure env dropped
    assert "first point" in text and "second point" in text
    assert "$E = mc^2$" in text               # math kept by default
    assert "a^2 + b^2 = c^2" in text          # equation BODY kept
    assert "Closing" in text and "\\emph" not in text
    assert "documentclass" not in text        # preamble gone
    assert "maketitle" not in text


def test_latex_math_drop_and_nested():
    src = (r"\begin{document}x \textbf{bold \emph{deep}} y "
           r"$a+b$ z \[ display \] w\end{document}")
    kept = L.latex_to_text(src)
    assert "bold deep" in kept and "$a+b$" in kept
    dropped = L.latex_to_text(src, math="drop")
    assert "$a+b$" not in dropped and "display" not in dropped
    assert "x bold deep y" in dropped.replace("  ", " ")


def test_latex_spark_operator(spark):
    df = spark.createDataFrame(
        [(1, _TEX), (2, None)], "doc_id bigint, text string")
    got = {r.doc_id: r for r in L.latex_texts(df).collect()}
    assert "introduction" in got[1].text.lower()
    assert got[1].n_chars == len(got[1].text)
    assert got[2].text is None


def _docx(paras):
    body = "".join(
        "<w:p><w:r><w:t>" + p + "</w:t></w:r></w:p>" for p in paras)
    xml = ('<?xml version="1.0"?><w:document xmlns:w="http://x"><w:body>'
           + body + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", xml)
    return buf.getvalue()


def test_parse_docx_paragraphs_and_entities():
    text = parse_docx(_docx(["First paragraph.", "Fish &amp; chips."]))
    assert text == "First paragraph.\nFish & chips."
    with pytest.raises(ValueError, match="word/document.xml"):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("other.xml", "x")
        parse_docx(buf.getvalue())
    with pytest.raises(ValueError, match="zip"):
        parse_docx(b"not a zip")


def test_docx_spark_operator(spark):
    rows = [(1, _docx(["alpha beta", "gamma"])), (2, b"junk"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r for r in docx_texts(df).collect()}
    assert got[1].text == "alpha beta\ngamma"
    assert got[2].text is None and got[3].text is None
