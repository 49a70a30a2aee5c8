"""JSONL corpus ingestion (operators/corpusio.py): gz/zst/plain files
through Spark's native codec ring, dotted-path field mapping, per-line
error isolation, the ingest audit, DuckDB read_json parity, and the
hand-off into the curation pipeline."""

from __future__ import annotations

import gzip
import json

import pyarrow as pa
import pytest

from apache_pinot_spark.operators import corpusio as C

_DOCS = [
    {"text": "the quick brown fox jumps over the lazy dog " * 5,
     "meta": {"pile_set_name": "Wikipedia"}},
    {"text": "pack my box with five dozen liquor jugs " * 5,
     "meta": {"pile_set_name": "Books3"}},
    {"text": "short"},
]


def _write(tmp_path, name, lines, codec=None):
    raw = b"".join(json.dumps(d).encode() + b"\n" for d in lines)
    if codec == "gz":
        raw = gzip.compress(raw)
    elif codec == "zst":
        raw = bytes(pa.Codec("zstd").compress(raw))
    p = tmp_path / name
    p.write_bytes(raw)
    return str(p)


@pytest.mark.parametrize("codec,ext", [(None, "jsonl"), ("gz", "jsonl.gz"),
                                       ("zst", "jsonl.zst")])
def test_read_jsonl_all_codecs(spark, tmp_path, codec, ext):
    p = _write(tmp_path, f"part.{ext}", _DOCS, codec)
    docs = C.read_jsonl_corpus(spark, p, preset="pile", min_text_chars=50)
    rows = docs.collect()
    assert len(rows) == 2
    assert {r.source for r in rows} == {"Wikipedia", "Books3"}
    assert all(r.n_chars == len(r.text) for r in rows)
    assert all(r.doc_id is not None for r in rows)


def test_dolma_shape_and_id_field(spark, tmp_path):
    dolma = [
        {"id": "doc-1", "text": "alpha " * 30, "source": "cc", "lang": "en"},
        {"id": "doc-2", "text": "beta " * 30, "source": "wiki", "lang": "de"},
    ]
    p = _write(tmp_path, "d.jsonl", dolma)
    rows = C.read_jsonl_corpus(spark, p, preset="dolma").collect()
    assert {(r.source, r.lang) for r in rows} == {("cc", "en"), ("wiki", "de")}
    # doc_id derives from the id field: same text under a new id is a
    # DIFFERENT document
    p2 = _write(tmp_path, "d2.jsonl",
                [{"id": "doc-3", "text": "alpha " * 30, "source": "cc"}])
    both = C.read_jsonl_corpus(spark, [p, p2], preset="dolma")
    assert both.select("doc_id").distinct().count() == 3


def test_missing_id_field_falls_back_to_text_hash(spark, tmp_path):
    # xxhash64(NULL) is the constant seed hash — without the text-hash
    # fallback, every id-less line would share ONE doc_id and exact
    # dedup would collapse distinct documents
    rows = [
        {"id": "doc-1", "text": "alpha " * 30},
        {"text": "beta " * 30},    # no id: falls back to hash(text)
        {"text": "gamma " * 30},   # no id: DIFFERENT doc_id from beta
    ]
    p = _write(tmp_path, "noid.jsonl", rows)
    out = C.read_jsonl_corpus(spark, p, preset="dolma").collect()
    assert len(out) == 3
    assert len({r.doc_id for r in out}) == 3


def test_oscar_bracket_path(spark, tmp_path):
    oscar = [{"content": "gamma " * 40,
              "warc_headers": {"warc-target-uri": "http://x.example/a"}}]
    p = _write(tmp_path, "o.jsonl", oscar)
    (row,) = C.read_jsonl_corpus(spark, p, preset="oscar").collect()
    assert row.text.startswith("gamma")
    assert row.url == "http://x.example/a"


def test_line_error_isolation_and_audit(spark, tmp_path):
    raw = (json.dumps(_DOCS[0]).encode() + b"\n"
           + b"{not json at all\n"
           + json.dumps(_DOCS[1]).encode() + b"\n"
           + b'{"no_text_field": 1}\n')
    p = tmp_path / "mixed.jsonl"
    p.write_bytes(raw)
    docs = C.read_jsonl_corpus(spark, str(p), preset="pile",
                               min_text_chars=50)
    assert docs.count() == 2  # bad lines lose only themselves
    (audit,) = C.jsonl_ingest_audit(spark, str(p),
                                    min_text_chars=50).collect()
    assert (audit.n_lines, audit.n_docs, audit.n_rejected) == (4, 2, 2)


def test_default_source_stamp(spark, tmp_path):
    p = _write(tmp_path, "n.jsonl", [{"text": "delta " * 40}])
    (row,) = C.read_jsonl_corpus(spark, p,
                                 default_source="redpajama-cc").collect()
    assert row.source == "redpajama-cc"


def test_duckdb_read_json_parity(spark, tmp_path):
    import duckdb

    p = _write(tmp_path, "par.jsonl.gz", _DOCS, "gz")
    ours = C.read_jsonl_corpus(spark, p, preset="pile", min_text_chars=1)
    got = sorted((r.text, r.source) for r in ours.collect())
    ora = duckdb.sql(
        f"SELECT text, meta.pile_set_name AS source FROM read_json('{p}', "
        "columns={text: 'VARCHAR', meta: 'STRUCT(pile_set_name VARCHAR)'}) "
        "WHERE text IS NOT NULL ORDER BY text, source"
    ).fetchall()
    assert got == [tuple(r) for r in ora]


def test_reader_plan_is_shuffle_free(spark, tmp_path):
    p = _write(tmp_path, "plan.jsonl", _DOCS)
    plan = C.read_jsonl_corpus(spark, p)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_feeds_curation_pipeline(spark, tmp_path):
    from apache_pinot_spark.operators.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = [{"text": f"document number {i} with enough prose words that "
                     f"the quality gates keep it in the corpus " * 3,
             "meta": {"pile_set_name": "Web" if i % 2 else "Books"}}
            for i in range(20)]
    p = _write(tmp_path, "c.jsonl.zst", docs, "zst")
    corpus = C.read_jsonl_corpus(spark, p, preset="pile")
    cfg = CurationConfig(decontaminate=False)
    stages = curate_corpus(corpus, cfg)
    final = list(stages.values())[-1]
    assert final.count() > 0


def test_stream_jsonl_corpus(spark, tmp_path):
    # the streaming twin: same projection over readStream.text — drive
    # one availableNow micro-batch into a memory sink
    src = tmp_path / "incoming"
    src.mkdir()
    _write(src, "a.jsonl", _DOCS[:2])
    _write(src, "b.jsonl.gz", [_DOCS[1]], "gz")
    stream = C.stream_jsonl_corpus(spark, str(src), preset="pile",
                                   min_text_chars=50,
                                   max_files_per_trigger=1)
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("jsonl_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM jsonl_stream").collect()
    assert len(rows) == 3
    assert {r.source for r in rows} == {"Wikipedia", "Books3"}
    # batch and stream produce IDENTICAL docs for identical input
    batch = C.read_jsonl_corpus(
        spark, [str(src / "a.jsonl"), str(src / "b.jsonl.gz")],
        preset="pile", min_text_chars=50)
    assert sorted((r.doc_id, r.text) for r in rows) \
        == sorted((r.doc_id, r.text) for r in batch.collect())
