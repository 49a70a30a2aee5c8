"""Tar member explosion (operators/tarwalk.py): member walk with glob
filtering, per-member gunzip (the arXiv dump shape), size caps,
per-member error isolation, and the tar → LaTeX chain."""

from __future__ import annotations

import gzip
import io
import tarfile

import pytest

from apache_pinot_spark.operators import tarwalk as T


def _tar(members, mode="w"):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_member_walk_glob_and_gunzip():
    tex = b"\\begin{document}paper body\\end{document}"
    blob = _tar([
        ("2401.00001/main.tex.gz", gzip.compress(tex)),
        ("2401.00001/figure.pdf", b"%PDF-fake"),
        ("2401.00002/main.tex.gz", gzip.compress(tex + b" two")),
    ])
    got = [p for k, p in T.iter_tar_members(blob, name_glob="*.tex.gz")
           if k == "member"]
    assert [n for n, _ in got] == ["2401.00001/main.tex",
                                   "2401.00002/main.tex"]
    assert got[0][1] == tex
    # no glob: everything, pdf passes through un-gunzipped
    all_names = [p[0] for k, p in T.iter_tar_members(blob) if k == "member"]
    assert "2401.00001/figure.pdf" in all_names


def test_caps_and_isolation():
    bomb = gzip.compress(b" " * (8 << 20))
    blob = _tar([
        ("ok.txt", b"fine"),
        ("bomb.txt.gz", bomb),
        ("also_ok.txt", b"fine too"),
    ])
    events = list(T.iter_tar_members(blob, max_member_bytes=1 << 20))
    members = [p for k, p in events if k == "member"]
    rejects = [p for k, p in events if k == "reject"]
    assert [n for n, _ in members] == ["ok.txt", "also_ok.txt"]
    assert len(rejects) == 1 and "bomb" in rejects[0]
    (ev,) = list(T.iter_tar_members(b"not a tar"))
    assert ev[0] == "reject"


def test_spark_tar_to_latex_chain(spark):
    from apache_pinot_spark.operators.latex import latex_texts

    tex = (b"\\begin{document}\\section{Intro} real paper prose here "
           b"with words\\end{document}")
    blob = _tar([("p/main.tex.gz", gzip.compress(tex)),
                 ("p/refs.bib", b"@article{x}")])
    df = spark.createDataFrame([(1, blob), (2, b"junk")],
                               "tar_id bigint, content binary")
    members = T.tar_members(df, id_col="tar_id", name_glob="*.tex.gz",
                            as_text=True)
    rows = members.collect()
    good = [r for r in rows if r.member_name is not None]
    assert len(good) == 1 and good[0].member_name == "p/main.tex"
    reject_row = [r for r in rows if r.tar_id == 2]
    assert reject_row[0].member_name is None
    assert reject_row[0].n_rejected >= 1
    docs = latex_texts(
        members.filter("payload IS NOT NULL").select(
            "tar_id", members.payload.alias("text")),
        id_col="tar_id")
    (doc,) = docs.collect()
    assert "Intro" in doc.text and "real paper prose" in doc.text
