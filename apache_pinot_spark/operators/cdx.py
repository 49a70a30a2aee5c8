"""CDXJ crawl-index reading — Common Crawl's per-crawl URL index
(the `cc-index` CDXJ tier): one line per capture,

    <SURT key> <14-digit timestamp> <JSON block>

where the JSON carries url/status/mime/digest and the WARC location
triplet (filename, offset, length). A corpus builder queries THIS tier
to select captures (status 200, mime text/html, one capture per URL)
before touching a single WARC byte — at 100 TB of WARC, the index scan
is the difference between reading ~1% of the archive and all of it.
(The columnar `cc-index table` parquet tier needs nothing from us:
``spark.read.parquet`` + predicate pushdown already is the operator.)

Everything is JVM expressions in the scan stage: split the line at the
first two single spaces (SURT keys never contain spaces; the JSON block
may), then get_json_object per field — no schema-inference pass, no
Python. Malformed lines yield NULL fields and are dropped by the
status/url gate; per-file accounting rides ``cdx_ingest_audit`` -style
counts off the same expressions.

Scale shape: scan → project → filter, zero shuffles;
``latest_capture_per_url`` is the one window shuffle its semantics
need (SURT key + timestamp ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: the JSON fields of the standard Common-Crawl CDXJ block
_FIELDS = {
    "url": "url",
    "status": "status",
    "mime": "mime",
    "digest": "digest",
    "warc_filename": "filename",
    "warc_offset": "offset",
    "warc_length": "length",
    "languages": "languages",
}


def read_cdxj(spark: SparkSession, paths) -> DataFrame:
    """(surt_key, ts, url, status, mime, digest, warc_filename,
    warc_offset, warc_length, languages) per capture line. Lines that
    do not carry a parseable JSON block (or lack a url) drop; numeric
    fields cast NULL-safe (CDXJ stores them as JSON strings)."""
    lines = spark.read.text(paths if isinstance(paths, str) else list(paths))
    # split at the first two spaces only: substring_index arithmetic
    # keeps the JSON block intact even when it contains spaces
    key = F.substring_index(F.col("value"), " ", 1)
    rest = F.expr("substring(value, length(substring_index(value, ' ', 1)) + 2)")
    ts = F.substring_index(rest, " ", 1)
    blob = F.expr(
        "substring(value, length(substring_index(value, ' ', 2)) + 2)")
    cols = [key.alias("surt_key"), ts.alias("ts")]
    for out_name, json_name in _FIELDS.items():
        c = F.get_json_object(blob, f"$.{json_name}")
        if out_name in ("status", "warc_offset", "warc_length"):
            c = c.cast("bigint")
        cols.append(c.alias(out_name))
    return (
        lines.select(*cols)
        .filter(F.col("url").isNotNull()
                & F.col("ts").rlike(r"^\d{14}$"))
    )


def select_captures(
    captures: DataFrame,
    statuses=(200,),
    mime_prefixes=("text/html",),
) -> DataFrame:
    """The standard corpus-builder gate over a capture frame: keep the
    statuses and mime prefixes a text pipeline ingests. Pure filter —
    composes with latest_capture_per_url below."""
    keep = F.col("status").isin(list(statuses))
    mime_ok = F.lit(False)
    for p in mime_prefixes:
        mime_ok = mime_ok | F.col("mime").startswith(p)
    return captures.filter(keep & mime_ok)


def latest_capture_per_url(captures: DataFrame) -> DataFrame:
    """ONE capture per SURT key — the newest timestamp, ties broken by
    (warc_filename, warc_offset) for determinism. One keyed window
    shuffle; the output is the fetch list a WARC-range reader would
    consume (filename + offset + length per kept capture)."""
    w = Window.partitionBy("surt_key").orderBy(
        F.col("ts").desc(),
        F.col("warc_filename").desc_nulls_last(),
        F.col("warc_offset").desc_nulls_last(),
    )
    return (
        captures.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def fetch_manifest(
    captures: DataFrame,
    max_records_per_task: int = 2000,
) -> DataFrame:
    """Group selected captures by WARC file into bounded fetch tasks:
    (warc_filename, task_idx, records ARRAY<STRUCT<offset,length,url>>)
    — the manifest a range-reading ingest job parallelizes over (each
    task slices its members out of one WARC object; member offsets are
    exactly the random-access property .warc.gz/.warc.zst provide).
    ``max_records_per_task`` bounds task skew on giant files."""
    w = Window.partitionBy("warc_filename").orderBy("warc_offset")
    tasked = captures.withColumn(
        "_task", ((F.row_number().over(w) - 1)
                  / F.lit(int(max_records_per_task))).cast("int"))
    return (
        tasked.groupBy("warc_filename", F.col("_task").alias("task_idx"))
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("warc_offset").alias("offset"),
            F.col("warc_length").alias("length"),
            F.col("url").alias("url"),
        ))).alias("records"))
    )
