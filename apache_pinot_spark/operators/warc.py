"""WARC (Web ARChive, ISO 28500) reading — the ingestion format of web
crawls (Common Crawl ships .warc.gz): pure-stdlib parsing of the PUBLIC
WARC/1.0-1.1 record grammar plus the HTTP/1.x response framing inside
``response`` records, exposed as Spark operators over binary columns.

Scope:
  * gzip member splitting: a .warc.gz is a CONCATENATION of per-record
    gzip members — split and inflate each member independently (the
    random-access property crawler tooling relies on), falling back to
    treating the blob as one plain-text WARC when not gzipped
  * record grammar: ``WARC/1.x`` version line, header block
    (name: value, no continuation-line support — Common Crawl does not
    emit them), Content-Length-framed body, CRLF CRLF record separator
  * response records: the embedded HTTP/1.x status line + headers are
    parsed; the body is the payload a text pipeline feeds to the HTML
    extractor (operators/htmltext)
  * bodies are size-bounded per record (``max_body_bytes``) — an
    attacker/corruption-controlled Content-Length cannot allocate
    unbounded memory; oversized records emit their headers with a NULL
    body and a truncated flag

Scale shape: per-row map-side work over the binary column
(Arrow-batched); one input blob explodes to one row per WARC record —
the only row multiplication a crawl ingest needs. Corrupt blobs emit
ONE all-NULL row (the multimodal reject convention). For whole-file
ingest, pair with ``spark.read.format("binaryFile")`` over the .warc.gz
paths and pass the ``content`` column here.
"""

from __future__ import annotations

import io
import zlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GZIP_MAGIC = b"\x1f\x8b"


@dataclass
class WarcRecord:
    warc_type: str = ""
    target_uri: str | None = None
    record_id: str | None = None
    date: str | None = None
    content_type: str | None = None  # WARC-level Content-Type
    content_length: int = 0
    http_status: int | None = None  # response records only
    http_content_type: str | None = None
    body: bytes | None = None  # payload (HTTP body for response records)
    truncated: bool = False  # body dropped/cut by max_body_bytes
    headers: dict = field(default_factory=dict)


def split_gzip_members(blob: bytes):
    """Yield the inflated bytes of each gzip member in a multi-member
    stream (the .warc.gz layout). Non-gzip input yields the blob itself
    once. Raises ValueError on a corrupt member."""
    if blob[:2] != _GZIP_MAGIC:
        yield blob
        return
    pos = 0
    while pos < len(blob):
        if blob[pos : pos + 2] != _GZIP_MAGIC:
            raise ValueError(f"gzip member boundary expected at {pos}")
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        try:
            out = d.decompress(blob[pos:])
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member at {pos}: {exc}") from exc
        if not d.eof:
            raise ValueError(f"truncated gzip member at {pos}")
        yield out
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no bytes")
        pos += consumed


def _parse_headers(text: bytes) -> dict:
    headers: dict = {}
    for line in text.split(b"\r\n"):
        if not line:
            continue
        if b":" not in line:
            raise ValueError(f"malformed header line {line[:40]!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin1").lower()] = v.strip().decode(
            "latin1", "replace")
    return headers


def parse_warc_records(blob: bytes, max_body_bytes: int = 8 << 20):
    """Yield WarcRecord for every record in the (possibly multi-member
    gzip) blob. Raises ValueError for non-WARC input."""
    if blob is None or len(blob) < 8:
        raise ValueError("blob too short for a WARC record")
    for member in split_gzip_members(bytes(blob)):
        stream = io.BytesIO(member)
        while True:
            # skip inter-record blank lines
            line = stream.readline()
            if not line:
                break
            if line in (b"\r\n", b"\n"):
                continue
            if not line.startswith(b"WARC/"):
                raise ValueError(
                    f"expected WARC/1.x version line, got {line[:20]!r}")
            # header block ends at the first blank line
            hdr_lines = bytearray()
            while True:
                hl = stream.readline()
                if hl in (b"\r\n", b"\n", b""):
                    break
                hdr_lines += hl.rstrip(b"\n").rstrip(b"\r") + b"\r\n"
            headers = _parse_headers(bytes(hdr_lines))
            try:
                length = int(headers.get("content-length", "0"))
            except ValueError as exc:
                raise ValueError("non-integer Content-Length") from exc
            if length < 0:
                raise ValueError("negative Content-Length")
            rec = WarcRecord(
                warc_type=headers.get("warc-type", ""),
                target_uri=headers.get("warc-target-uri"),
                record_id=headers.get("warc-record-id"),
                date=headers.get("warc-date"),
                content_type=headers.get("content-type"),
                content_length=length,
                headers=headers,
            )
            # bounded read: a lying Content-Length cannot allocate more
            # than max_body_bytes; the stream still advances by `length`
            # so subsequent records stay aligned
            take = min(length, max_body_bytes)
            body = stream.read(take)
            if len(body) < take:
                raise ValueError("record body overruns member")
            if length > max_body_bytes:
                rec.truncated = True
                body = None
                # skip the unread tail so the next record stays aligned;
                # a tail extending past the member is corruption
                end = stream.seek(length - take, io.SEEK_CUR)
                if end > len(member):
                    raise ValueError("record body overruns member")
            if rec.warc_type == "response" and body is not None:
                rec.http_status, rec.http_content_type, payload = \
                    _parse_http_response(body)
                rec.body = payload
            else:
                rec.body = body
            yield rec


def _parse_http_response(body: bytes):
    """(status, content_type, payload) from an HTTP/1.x response block;
    non-HTTP bodies come back as (None, None, body) — some crawls store
    raw payloads in response records."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, body
    head = body[:sep].split(b"\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, None, body
    ctype = None
    for line in head[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            if k.strip().lower() == b"content-type":
                ctype = v.strip().decode("latin1", "replace")
    return status, ctype, body[sep + 4 :]


def warc_records(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    max_body_bytes: int = 8 << 20,
    body_charset: str = "utf-8",
) -> DataFrame:
    """Explode WARC blobs into one row per record: (id, record_index,
    warc_type, target_uri, warc_date, http_status, content_type,
    content_length, truncated, body) — ``body`` decoded as
    ``body_charset`` with replacement (web corpora are charset soup; the
    HTML extractor downstream re-handles entities). One Arrow map pass;
    the record explosion is the only row multiplication. Corrupt blobs
    emit ONE all-NULL row (the multimodal reject convention)."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.warc import parse_warc_records

        cols = ("id", "record_index", "warc_type", "target_uri",
                "warc_date", "http_status", "content_type",
                "content_length", "truncated", "body")
        for pdf in batches:
            out = {k: [] for k in cols}

            def emit(mid, idx=None, rec=None):
                out["id"].append(mid)
                out["record_index"].append(idx)
                if rec is None:
                    for k in cols[2:]:
                        out[k].append(None)
                    return
                out["warc_type"].append(rec.warc_type or None)
                out["target_uri"].append(rec.target_uri)
                out["warc_date"].append(rec.date)
                out["http_status"].append(rec.http_status)
                out["content_type"].append(
                    rec.http_content_type or rec.content_type)
                out["content_length"].append(rec.content_length)
                out["truncated"].append(rec.truncated)
                out["body"].append(
                    rec.body.decode(body_charset, "replace")
                    if rec.body is not None else None)

            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    recs = list(parse_warc_records(
                        bytes(blob) if blob is not None else None,
                        max_body_bytes=max_body_bytes))
                    if not recs:
                        raise ValueError("no WARC records")
                except Exception:
                    emit(mid)
                    continue
                for i, rec in enumerate(recs):
                    emit(mid, i, rec)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, record_index INT, warc_type STRING, "
               "target_uri STRING, warc_date STRING, http_status INT, "
               "content_type STRING, content_length BIGINT, "
               "truncated BOOLEAN, body STRING",
    )
    return out.withColumnRenamed("id", id_col)


def crawl_to_documents(
    spark,
    path_glob: str,
    min_text_chars: int = 200,
    max_body_bytes: int = 8 << 20,
    wet: bool = False,
) -> DataFrame:
    """One-call crawl ingest: .warc.gz files → (doc_id, url, fetch_date,
    text, n_chars, source) in the repo's documents-table shape, ready
    for the curation pipeline (operators/pipeline.curate_corpus). Reads
    whole files via Spark's binaryFile source (each file = one task —
    WARC files are written ~1 GB each precisely so this parallelizes)
    and explodes to records. Two crawl tiers:

      wet=False (raw .warc.gz): keep 200-status text/html responses,
        extract boilerplate-gated text (operators/htmltext), drop
        sub-``min_text_chars`` documents.
      wet=True (.warc.wet.gz — the crawl's pre-extracted text tier):
        keep ``conversion`` records; the record body IS the document
        text (no HTML pass), same length gate.

    doc_id is xxhash64(url, date) — deterministic across re-ingests;
    source = lowercased host (Spark's built-in parse_url, JVM-side) —
    exactly what the pipeline's source-share cap stratifies on."""
    from apache_pinot_spark.operators.htmltext import extract_html_text

    files = spark.read.format("binaryFile").load(path_glob)
    recs = warc_records(files, content_col="content", id_col="path",
                        max_body_bytes=max_body_bytes)
    if wet:
        kept = recs.filter(
            (F.col("warc_type") == "conversion") & F.col("body").isNotNull()
        )
        docs = kept.select(
            F.xxhash64(F.col("target_uri"), F.col("warc_date")).alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetch_date"),
            F.col("body").alias("text"),
            F.length("body").alias("n_chars"),
        )
    else:
        pages = (
            recs.filter(
                (F.col("warc_type") == "response")
                & (F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html")
            )
            .select(
                F.xxhash64(F.col("target_uri"), F.col("warc_date")).alias("doc_id"),
                F.col("target_uri").alias("url"),
                F.col("warc_date").alias("fetch_date"),
                "body",
            )
        )
        text = extract_html_text(pages, html_col="body", id_col="doc_id")
        meta = pages.select("doc_id", "url", "fetch_date")
        docs = text.join(meta, on="doc_id").select(
            "doc_id", "url", "fetch_date", "text", "n_chars")
    return (
        docs.filter(F.col("n_chars") >= min_text_chars)
        .select(
            "doc_id", "url", "fetch_date", "text", "n_chars",
            F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("source"),
        )
    )
