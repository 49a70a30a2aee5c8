"""JSONL corpus ingestion — the shape LLM training corpora actually
ship in: directories of ``.jsonl`` / ``.jsonl.gz`` / ``.jsonl.zst``
files, one JSON document per line (The Pile, Dolma, RedPajama, OSCAR,
FineWeb all follow the convention, differing only in field names).

Design:
  * the LINE tier is Spark's native text source — the Hadoop codec ring
    handles gzip/bzip2/zstd transparently by extension (zstd verified
    in this environment via the bundled java codec), so decompression
    stays JVM-side and per-file parallel. Compressed JSONL is not
    splittable; corpora ship as many ~100 MB–1 GB files precisely so
    file-level parallelism is enough — the same contract as the WARC
    tier (operators/warc.py).
  * the FIELD tier is ``get_json_object`` per requested field — JVM
    expressions in the scan stage, no Python, no schema inference pass
    (an extra corpus read at 100 TB), and tolerant of the per-line
    schema drift real corpora have. Dotted paths ("meta.pile_set_name")
    address nested objects.
  * error isolation is per LINE: a malformed JSON line (or one missing
    the text field) yields NULL and is dropped by the text gate —
    never fails the file; ``jsonl_ingest_audit`` reports per-file
    kept/rejected counts for the ingest ledger.

Output is the repo's documents-table shape (doc_id BIGINT, text, lang,
source, n_chars) — directly feedable to operators/pipeline.curate_corpus.

Scale shape: scan → project → filter, ZERO shuffles; doc_id is
xxhash64 (deterministic across re-ingests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: field-name conventions of the big public corpora — a starting point,
#: not a registry of truth: pass explicit fields when a dump deviates.
CORPUS_PRESETS = {
    # The Pile: {"text": ..., "meta": {"pile_set_name": ...}}
    "pile": {"text_field": "text", "source_field": "meta.pile_set_name"},
    # Dolma: {"id": ..., "text": ..., "source": ..., "lang": ...}
    "dolma": {"text_field": "text", "id_field": "id",
              "source_field": "source", "lang_field": "lang"},
    # OSCAR 2x: {"content": ..., "warc_headers": {...}, "metadata": {...}}
    "oscar": {"text_field": "content",
              "url_field": "warc_headers.warc-target-uri"},
}


def _jpath(field: str) -> str:
    """get_json_object path for a dotted field name; segments with
    characters outside [A-Za-z0-9_] (OSCAR's 'warc-target-uri') are
    bracket-quoted."""
    parts = []
    for seg in field.split("."):
        if seg.replace("_", "").isalnum() and not seg[:1].isdigit():
            parts.append("." + seg)
        else:
            parts.append(f"['{seg}']")
    return "$" + "".join(parts)


def read_jsonl_corpus(
    spark: SparkSession,
    paths,
    preset: str | None = None,
    text_field: str = "text",
    id_field: str | None = None,
    source_field: str | None = None,
    lang_field: str | None = None,
    url_field: str | None = None,
    default_source: str | None = None,
    min_text_chars: int = 1,
) -> DataFrame:
    """(doc_id, text, lang, source, n_chars[, url]) from JSONL corpus
    files — the documents-table shape. ``doc_id`` is xxhash64 of the
    corpus id field when one exists, else of the text (content-defined,
    so re-ingests and cross-file duplicates collide on purpose — exact
    dedup upstream of the pipeline is a doc_id groupBy).

    ``default_source``: corpora without a per-document source field
    (RedPajama subset dumps, single-source scrapes) stamp a constant;
    otherwise the per-file fallback is NULL, which the pipeline's
    source-share cap treats as its own stratum."""
    opts = _resolve_fields(preset, text_field, id_field, source_field,
                           lang_field, url_field)
    lines = spark.read.text(paths if isinstance(paths, str) else list(paths))
    return _project_jsonl(lines, opts, default_source, min_text_chars)


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    preset: str | None = None,
    text_field: str = "text",
    id_field: str | None = None,
    source_field: str | None = None,
    lang_field: str | None = None,
    url_field: str | None = None,
    default_source: str | None = None,
    min_text_chars: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming twin of ``read_jsonl_corpus``: watch a
    corpus directory as dumps land (the continuous-ingest deployment),
    same field mapping, same per-line error isolation — the projection
    is the identical expression tree, so batch and stream cannot drift.
    Pair with an idempotent sink (streaming/realtime's commit contract).
    ``max_files_per_trigger`` bounds a micro-batch for backfill."""
    opts = _resolve_fields(preset, text_field, id_field, source_field,
                           lang_field, url_field)
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(path)
    return _project_jsonl(lines, opts, default_source, min_text_chars)


def _resolve_fields(preset, text_field, id_field, source_field,
                    lang_field, url_field) -> dict:
    opts = dict(CORPUS_PRESETS[preset]) if preset else {}
    explicit = dict(text_field=text_field, id_field=id_field,
                    source_field=source_field, lang_field=lang_field,
                    url_field=url_field)
    # explicit non-default args override the preset
    for k, v in explicit.items():
        if v is not None and not (k == "text_field" and v == "text"
                                  and "text_field" in opts):
            opts[k] = v
    return opts


def _project_jsonl(lines: DataFrame, opts: dict,
                   default_source: str | None,
                   min_text_chars: int) -> DataFrame:
    txt = F.get_json_object(F.col("value"), _jpath(opts.get("text_field", "text")))

    def maybe(fname):
        f = opts.get(fname)
        return F.get_json_object(F.col("value"), _jpath(f)) if f else F.lit(None).cast("string")

    # When a configured id_field is missing on a line, fall back to the
    # text hash: xxhash64(NULL) is the constant seed hash, so without the
    # coalesce every id-less document would share ONE doc_id and exact
    # dedup would silently collapse them to a single survivor.
    doc_id = (
        F.xxhash64(F.coalesce(maybe("id_field"), txt))
        if opts.get("id_field") else F.xxhash64(txt)
    )
    source = maybe("source_field")
    if default_source is not None:
        source = F.coalesce(source, F.lit(default_source))
    cols = [
        doc_id.alias("doc_id"),
        txt.alias("text"),
        maybe("lang_field").alias("lang"),
        source.alias("source"),
        F.length(txt).cast("bigint").alias("n_chars"),
    ]
    if opts.get("url_field"):
        cols.append(maybe("url_field").alias("url"))
    return (
        lines.select(*cols)
        .filter(F.col("text").isNotNull()
                & (F.col("n_chars") >= min_text_chars))
    )


def jsonl_ingest_audit(
    spark: SparkSession,
    paths,
    text_field: str = "text",
    min_text_chars: int = 1,
) -> DataFrame:
    """Per-file ingest ledger: (path, n_lines, n_docs, n_rejected) —
    rejected = malformed JSON or missing/short text. One scan, one
    groupBy on the file path (tiny key space: one key per file)."""
    lines = spark.read.text(paths if isinstance(paths, str) else list(paths))
    txt = F.get_json_object(F.col("value"), _jpath(text_field))
    ok = txt.isNotNull() & (F.length(txt) >= min_text_chars)
    return (
        lines.select(F.input_file_name().alias("path"), ok.alias("ok"))
        .groupBy("path")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("ok").cast("bigint")).alias("n_docs"),
            F.sum((~F.col("ok")).cast("bigint")).alias("n_rejected"),
        )
    )
