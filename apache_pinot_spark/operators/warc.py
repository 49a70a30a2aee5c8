"""WARC (Web ARChive, ISO 28500) reading — the ingestion format of web
crawls (Common Crawl ships .warc.gz): pure-stdlib parsing of the PUBLIC
WARC/1.0-1.1 record grammar plus the HTTP/1.x response framing inside
``response`` records, exposed as Spark operators over binary columns.

Scope:
  * gzip member splitting: a .warc.gz is a CONCATENATION of per-record
    gzip members — split and inflate each member independently (the
    random-access property crawler tooling relies on), falling back to
    treating the blob as one plain-text WARC when not gzipped
  * zstd member splitting: the IIPC .warc.zst convention (one record
    run per RFC 8878 frame, optional leading skippable dictionary
    frame) rides the same member contract via operators/zstdio —
    per-frame error isolation, bounded inflation, dictionary frames
    reject honestly (the bundled codec has no dictionary API)
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
  * gzip inflation is size-bounded per member (``max_member_bytes``,
    enforced chunkwise DURING decompression) — a gzip bomb cannot
    allocate unbounded memory either; oversized members reject
  * error isolation is per gzip member: a corrupt member (or corrupt
    record grammar inside one) loses at most that member's remaining
    records — the walker resyncs at the next gzip magic and keeps
    going, and the Spark operator reports a per-blob ``n_rejected``
    count (real crawls contain corrupt records; losing a whole ~1 GB
    file to one bad record is silent data loss at scale)
  * charset: record text decodes per the ``charset=`` parameter of the
    HTTP (or WARC) Content-Type when it names a known codec — the
    non-UTF-8 web (GBK, Shift-JIS, windows-125x, ISO-8859-*) must not
    mojibake before langid/dedup see it; a UTF-8/16 BOM wins over the
    header, and the fallback is ``body_charset`` with replacement

Scale shape: per-row map-side work over the binary column
(Arrow-batched); one input blob explodes to one row per WARC record —
the only row multiplication a crawl ingest needs (the Arrow pass emits
one output frame per BLOB, so peak memory is one file's records, not
one batch's). Blobs yielding no records emit ONE all-NULL row (the
multimodal reject convention) carrying the reject count. For whole-file
ingest, pair with ``spark.read.format("binaryFile")`` over the .warc.gz
paths and pass the ``content`` column here.
"""

from __future__ import annotations

import codecs
import io
import re
import zlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GZIP_MAGIC = b"\x1f\x8b"
#: 3-byte resync signature: magic + deflate method byte — cuts false
#: positives when scanning forward past a corrupt member
_GZIP_RESYNC = b"\x1f\x8b\x08"
_INFLATE_CHUNK = 1 << 20
#: default per-member inflation ceiling: far above any sane per-record
#: member (records are body-bounded at 8 MiB by default) yet small
#: enough that a bomb member cannot OOM an executor task
DEFAULT_MAX_MEMBER_BYTES = 256 << 20

_CHARSET_RE = re.compile(r'charset\s*=\s*"?\'?([A-Za-z0-9_:.+-]+)', re.I)


def _looks_zstd(blob: bytes) -> bool:
    from apache_pinot_spark.operators.zstdio import (
        ZSTD_MAGIC,
        _is_skippable_magic,
    )

    return len(blob) >= 4 and (
        blob[:4] == ZSTD_MAGIC or _is_skippable_magic(blob, 0))


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
    http_content_encoding: str | None = None  # gzip/deflate/br/zstd when sent
    body: bytes | None = None  # payload (HTTP body for response records)
    truncated: bool = False  # body dropped/cut by max_body_bytes
    headers: dict = field(default_factory=dict)


def _inflate_member(blob: bytes, pos: int, cap: int) -> tuple[bytes, int]:
    """Inflate ONE gzip member starting at ``pos``, enforcing the ``cap``
    chunkwise DURING decompression (a bomb raises before it
    materializes). Returns (data, consumed_compressed_bytes). Raises
    ValueError on corruption, truncation, or cap breach."""
    d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
    out = bytearray()
    feed_end = pos
    tail = b""
    try:
        while True:
            if tail:
                chunk, tail = tail, b""
            else:
                chunk = bytes(blob[feed_end : feed_end + _INFLATE_CHUNK])
                feed_end += len(chunk)
                if not chunk:
                    raise ValueError(f"truncated gzip member at {pos}")
            out += d.decompress(chunk, cap + 1 - len(out))
            if len(out) > cap:
                raise ValueError(
                    f"gzip member at {pos} inflates past {cap} bytes")
            tail = d.unconsumed_tail
            if d.eof:
                break
    except zlib.error as exc:
        raise ValueError(f"corrupt gzip member at {pos}: {exc}") from exc
    consumed = feed_end - pos - len(tail) - len(d.unused_data)
    if consumed <= 0:
        raise ValueError(f"gzip member at {pos} consumed no bytes")
    return bytes(out), consumed


def split_gzip_members(
    blob: bytes, max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES
):
    """Yield the inflated bytes of each gzip member in a multi-member
    stream (the .warc.gz layout), each inflation bounded by
    ``max_member_bytes``. A .warc.zst blob (zstd or skippable magic)
    delegates to the zstd frame splitter; other non-gzip input yields
    the blob itself once. Raises ValueError on a corrupt or oversized
    member (STRICT form — the Spark operator uses the
    per-member-tolerant walker instead)."""
    if _looks_zstd(blob):
        from apache_pinot_spark.operators.zstdio import split_zstd_members

        yield from split_zstd_members(blob, max_member_bytes)
        return
    if blob[:2] != _GZIP_MAGIC:
        yield blob
        return
    pos = 0
    while pos < len(blob):
        if blob[pos : pos + 2] != _GZIP_MAGIC:
            raise ValueError(f"gzip member boundary expected at {pos}")
        data, consumed = _inflate_member(blob, pos, max_member_bytes)
        yield data
        pos += consumed


def _iter_members_tolerant(blob: bytes, max_member_bytes: int):
    """Yield ('member', inflated_bytes) | ('reject', reason) per gzip
    member, isolating errors: a corrupt/oversized member emits one
    reject event and the walker RESYNCS at the next gzip magic — the
    random-access property .warc.gz is written for. A .warc.zst blob
    rides the zstd frame walker's identical contract; other non-gzip
    input is one plain member."""
    if _looks_zstd(blob):
        from apache_pinot_spark.operators.zstdio import (
            iter_zstd_members_tolerant,
        )

        yield from iter_zstd_members_tolerant(blob, max_member_bytes)
        return
    if blob[:2] != _GZIP_MAGIC:
        yield ("member", blob)
        return
    pos = 0
    n = len(blob)
    while pos < n:
        try:
            data, consumed = _inflate_member(blob, pos, max_member_bytes)
        except ValueError as exc:
            yield ("reject", str(exc))
            nxt = blob.find(_GZIP_RESYNC, pos + 2)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield ("member", data)
        pos += consumed
        if pos < n and blob[pos : pos + 2] != _GZIP_MAGIC:
            yield ("reject", f"gzip member boundary expected at {pos}")
            nxt = blob.find(_GZIP_RESYNC, pos)
            if nxt < 0:
                return
            pos = nxt


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


def _parse_member_records(member: bytes, max_body_bytes: int):
    """Yield WarcRecord for every record in ONE inflated member. Raises
    ValueError mid-iteration on corrupt grammar (records already yielded
    stand — the tolerant walker turns the raise into a member-scoped
    reject)."""
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
            rec.http_status, rec.http_content_type, cenc, payload = \
                _parse_http_response(body)
            rec.http_content_encoding = cenc
            if cenc and payload is not None:
                # raw crawls store compressed HTTP bodies verbatim;
                # inflate gzip/deflate here (bounded — a bomb body marks
                # the RECORD truncated, it cannot OOM the task; the
                # Content-Length framing keeps the stream aligned
                # regardless)
                try:
                    payload = _inflate_http_body(payload, cenc,
                                                 max_body_bytes)
                except ValueError:
                    payload = None
                    rec.truncated = True
            rec.body = payload
        else:
            rec.body = body
        yield rec


def _pyarrow_inflate_bounded(body: bytes, codec: str, cap: int) -> bytes:
    """Bounded streaming decode through a pyarrow-bundled codec (brotli,
    zstd) — the Content-Encodings zlib does not speak. Same chunkwise
    cap discipline as the zlib paths: a bomb raises before it
    materializes."""
    import pyarrow as pa

    stream = pa.CompressedInputStream(pa.BufferReader(body), codec)
    out = bytearray()
    try:
        while True:
            chunk = stream.read(min(_INFLATE_CHUNK, cap + 1 - len(out)))
            if not chunk:
                break
            out += chunk
            if len(out) > cap:
                raise ValueError(f"{codec} body inflates past {cap} bytes")
    except (pa.lib.ArrowInvalid, OSError) as exc:
        raise ValueError(f"corrupt {codec} body: {exc}") from exc
    if not out and body:
        raise ValueError(f"empty {codec} inflate")
    return bytes(out)


def _inflate_http_body(body: bytes, encoding: str, cap: int) -> bytes:
    """Bounded decode of an HTTP Content-Encoding'd payload: gzip and
    both deflate flavors (zlib-wrapped and raw — servers ship either)
    via zlib; brotli ('br') and zstd via the pyarrow-bundled codecs.
    'identity' passes through; unknown codings raise (the record's body
    routes to the truncated/NULL path, never silently-wrong text)."""
    enc = encoding.strip().lower()
    if enc in ("", "identity", "none"):
        return body
    if enc == "br":
        return _pyarrow_inflate_bounded(body, "brotli", cap)
    if enc == "zstd":
        return _pyarrow_inflate_bounded(body, "zstd", cap)
    if enc in ("gzip", "x-gzip"):
        wbits_options = (31,)
    elif enc == "deflate":
        wbits_options = (15, -15)
    else:
        raise ValueError(f"unsupported Content-Encoding {encoding!r}")
    last_exc = None
    for wbits in wbits_options:
        d = zlib.decompressobj(wbits=wbits)
        out = bytearray()
        pos = 0
        tail = b""
        try:
            while True:
                chunk = tail or body[pos : pos + _INFLATE_CHUNK]
                if not tail:
                    pos += len(chunk)
                tail = b""
                if not chunk:
                    if d.eof or not out:
                        break
                    raise ValueError("truncated compressed body")
                out += d.decompress(chunk, cap + 1 - len(out))
                if len(out) > cap:
                    raise ValueError("compressed body inflates past cap")
                tail = d.unconsumed_tail
                if d.eof:
                    break
            if not out and body:
                raise ValueError("empty inflate")
            return bytes(out)
        except (zlib.error, ValueError) as exc:
            last_exc = exc
    raise ValueError(f"cannot inflate {enc} body: {last_exc}")


def parse_warc_records(
    blob: bytes,
    max_body_bytes: int = 8 << 20,
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
):
    """Yield WarcRecord for every record in the (possibly multi-member
    gzip) blob. Raises ValueError for non-WARC input (STRICT form —
    fixture/tooling use; the Spark operator rides the tolerant
    iterator)."""
    if blob is None or len(blob) < 8:
        raise ValueError("blob too short for a WARC record")
    for member in split_gzip_members(bytes(blob), max_member_bytes):
        yield from _parse_member_records(member, max_body_bytes)


def iter_warc_records_tolerant(
    blob: bytes,
    max_body_bytes: int = 8 << 20,
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
):
    """Yield ('rec', WarcRecord) | ('reject', reason) — per-member error
    isolation: one corrupt record loses at most its own gzip member's
    remaining records, one bomb/corrupt member loses only itself."""
    if blob is None or len(blob) < 8:
        yield ("reject", "blob too short for a WARC record")
        return
    for kind, payload in _iter_members_tolerant(bytes(blob), max_member_bytes):
        if kind == "reject":
            yield ("reject", payload)
            continue
        gen = _parse_member_records(payload, max_body_bytes)
        while True:
            try:
                rec = next(gen)
            except StopIteration:
                break
            except ValueError as exc:
                yield ("reject", f"record grammar: {exc}")
                break
            yield ("rec", rec)


def _parse_http_response(body: bytes):
    """(status, content_type, content_encoding, payload) from an
    HTTP/1.x response block; non-HTTP bodies come back as
    (None, None, None, body) — some crawls store raw payloads in
    response records."""
    if not body.startswith(b"HTTP/"):
        return None, None, None, body
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, None, body
    head = body[:sep].split(b"\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, None, None, body
    ctype = cenc = None
    for line in head[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            key = k.strip().lower()
            if key == b"content-type":
                ctype = v.strip().decode("latin1", "replace")
            elif key == b"content-encoding":
                cenc = v.strip().decode("latin1", "replace").lower()
    return status, ctype, cenc, body[sep + 4 :]


def select_charset(content_type: str | None, fallback: str = "utf-8") -> str:
    """The codec name a record body should decode with: the Content-Type
    ``charset=`` parameter when it names a codec Python knows, else the
    fallback. (The web lies about charsets, so decoding always pairs
    this with errors='replace'.)"""
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            label = m.group(1).strip()
            try:
                return codecs.lookup(label).name
            except LookupError:
                pass
    return fallback


def _decode_body(body: bytes, content_type: str | None, fallback: str):
    """(text, charset_used) — a UTF-8/16 BOM wins over the header (the
    strongest in-band signal), then the Content-Type charset, then the
    fallback; always errors='replace'."""
    if body.startswith(b"\xef\xbb\xbf"):
        return body[3:].decode("utf-8", "replace"), "utf-8"
    if body.startswith(b"\xff\xfe"):
        return body[2:].decode("utf-16-le", "replace"), "utf-16-le"
    if body.startswith(b"\xfe\xff"):
        return body[2:].decode("utf-16-be", "replace"), "utf-16-be"
    enc = select_charset(content_type, fallback)
    try:
        return body.decode(enc, "replace"), enc
    except (LookupError, ValueError):
        return body.decode(fallback, "replace"), fallback


def warc_records(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    max_body_bytes: int = 8 << 20,
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
    body_charset: str = "utf-8",
) -> DataFrame:
    """Explode WARC blobs into one row per record: (id, record_index,
    warc_type, target_uri, warc_date, http_status, content_type,
    content_length, truncated, body, charset, n_rejected) — ``body``
    decoded per the record's Content-Type charset (BOM > header >
    ``body_charset`` fallback, always with replacement), ``charset``
    names the codec used, and ``n_rejected`` counts the blob's rejected
    members/records (repeated on every row of the blob — max() it per id
    for the ingest audit). One Arrow map pass emitting one frame per
    blob; the record explosion is the only row multiplication. Blobs
    with no parseable records emit ONE all-NULL row (the multimodal
    reject convention) carrying the reject count."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.warc import (
            _decode_body,
            iter_warc_records_tolerant,
        )

        cols = ("id", "record_index", "warc_type", "target_uri",
                "warc_date", "http_status", "content_type",
                "content_length", "truncated", "body", "charset",
                "n_rejected")

        def emit(out, mid, idx=None, rec=None):
            out["id"].append(mid)
            out["record_index"].append(idx)
            if rec is None:
                for k in cols[2:-1]:
                    out[k].append(None)
                return
            out["warc_type"].append(rec.warc_type or None)
            out["target_uri"].append(rec.target_uri)
            out["warc_date"].append(rec.date)
            out["http_status"].append(rec.http_status)
            ctype = rec.http_content_type or rec.content_type
            out["content_type"].append(ctype)
            out["content_length"].append(rec.content_length)
            out["truncated"].append(rec.truncated)
            if rec.body is not None:
                text, used = _decode_body(rec.body, ctype, body_charset)
                out["body"].append(text)
                out["charset"].append(used)
            else:
                out["body"].append(None)
                out["charset"].append(None)

        for pdf in batches:
            for mid, blob in zip(pdf["id"], pdf["c"]):
                # one output frame PER BLOB: peak memory is one file's
                # records, and the per-blob reject count is known before
                # the frame is built
                out = {k: [] for k in cols}
                n_rej, idx = 0, 0
                for kind, payload in iter_warc_records_tolerant(
                    bytes(blob) if blob is not None else None,
                    max_body_bytes=max_body_bytes,
                    max_member_bytes=max_member_bytes,
                ):
                    if kind == "reject":
                        n_rej += 1
                        continue
                    emit(out, mid, idx, payload)
                    idx += 1
                if idx == 0:
                    emit(out, mid)  # all-NULL reject row
                out["n_rejected"] = [n_rej] * len(out["id"])
                yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, record_index INT, warc_type STRING, "
               "target_uri STRING, warc_date STRING, http_status INT, "
               "content_type STRING, content_length BIGINT, "
               "truncated BOOLEAN, body STRING, charset STRING, "
               "n_rejected INT",
    )
    return out.withColumnRenamed("id", id_col)


def crawl_to_documents(
    spark,
    path_glob: str,
    min_text_chars: int = 200,
    max_body_bytes: int = 8 << 20,
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
    wet: bool = False,
    drop_noindex: bool = False,
) -> DataFrame:
    """One-call crawl ingest: .warc.gz / .warc.zst files → (doc_id, url, fetch_date,
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
    exactly what the pipeline's source-share cap stratifies on.

    Plan shape: binaryFile scan → record explode (Arrow map) → [HTML
    extract (Arrow map, metadata passed THROUGH its schema)] → filter →
    projection — ZERO shuffles/joins end to end; corrupt members reject
    per member inside the explode (see warc_records' n_rejected)."""
    from apache_pinot_spark.operators.htmltext import extract_html_text

    files = spark.read.format("binaryFile").load(path_glob)
    recs = warc_records(files, content_col="content", id_col="path",
                        max_body_bytes=max_body_bytes,
                        max_member_bytes=max_member_bytes)
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
        # url/fetch_date ride THROUGH the Arrow map's schema — a re-join
        # on doc_id here would shuffle the whole corpus twice for
        # metadata the extractor can just carry
        extracted = extract_html_text(
            pages, html_col="body", id_col="doc_id",
            passthrough=("url", "fetch_date"),
        )
        if drop_noindex:
            # pages that opt out of indexing via <meta name=robots
            # content=noindex> — a polite-corpus policy knob, off by
            # default (the public crawl recipes do not apply it)
            extracted = extracted.filter(
                ~F.coalesce(F.col("robots_noindex"), F.lit(False)))
        docs = extracted.select("doc_id", "url", "fetch_date", "text",
                                "n_chars")
    return (
        docs.filter(F.col("n_chars") >= min_text_chars)
        .select(
            "doc_id", "url", "fetch_date", "text", "n_chars",
            F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))).alias("source"),
        )
    )


def read_warc_ranges(
    spark,
    manifest: DataFrame,
    base_dir: str = "",
    max_body_bytes: int = 8 << 20,
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
    body_charset: str = "utf-8",
) -> DataFrame:
    """Range-read SELECTED records out of WARC files — the consumer of
    operators/cdx.fetch_manifest: each manifest row carries ONE file's
    bounded record list (warc_filename, task_idx, records
    ARRAY<STRUCT<offset, length, url>>), and each task seeks to its
    offsets and parses just those members (per-record gzip members /
    zstd frames are the random-access property the index's offsets
    address). At crawl scale this reads ~the selected bytes, not the
    archive: a 1% selection touches 1% of the WARC bytes plus one open
    per (file, task).

    Output schema matches ``warc_records`` (plus ``url`` from the
    manifest); per-record errors reject to an all-NULL row carrying the
    blob's reject count, never the task. ``base_dir`` prefixes the
    manifest's relative filenames — any filesystem the executors mount
    (the usual deployment: an object-store fuse mount or local shards).

    One Arrow map pass over the manifest; parallelism = manifest rows
    (fetch_manifest's ``max_records_per_task`` is the skew bound)."""
    base = base_dir

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import os

        import pandas as _pd

        from apache_pinot_spark.operators.warc import (
            _decode_body,
            iter_warc_records_tolerant,
        )

        cols = ("warc_filename", "url", "record_index", "warc_type",
                "target_uri", "warc_date", "http_status", "content_type",
                "content_length", "truncated", "body", "charset",
                "n_rejected")
        for pdf in batches:
            for fname, recs in zip(pdf["warc_filename"], pdf["records"]):
                out = {k: [] for k in cols}
                path = os.path.join(base, fname) if base else fname
                try:
                    fh = open(path, "rb")
                except OSError:
                    fh = None
                for rec in recs:
                    url = rec["url"]
                    emitted = 0
                    n_rej = 0
                    # NULL offset is as bad as NULL length (read_cdxj
                    # casts null-safe and never filters): count as a
                    # reject row, never int(None) → task failure
                    if (fh is not None and rec["length"]
                            and rec["length"] > 0
                            and rec["offset"] is not None):
                        fh.seek(int(rec["offset"]))
                        blob = fh.read(int(rec["length"]))
                        for kind, payload in iter_warc_records_tolerant(
                            blob, max_body_bytes=max_body_bytes,
                            max_member_bytes=max_member_bytes,
                        ):
                            if kind == "reject":
                                n_rej += 1
                                continue
                            ctype = (payload.http_content_type
                                     or payload.content_type)
                            if payload.body is not None:
                                text, used = _decode_body(
                                    payload.body, ctype, body_charset)
                            else:
                                text, used = None, None
                            out["warc_filename"].append(fname)
                            out["url"].append(url)
                            out["record_index"].append(emitted)
                            out["warc_type"].append(payload.warc_type or None)
                            out["target_uri"].append(payload.target_uri)
                            out["warc_date"].append(payload.date)
                            out["http_status"].append(payload.http_status)
                            out["content_type"].append(ctype)
                            out["content_length"].append(payload.content_length)
                            out["truncated"].append(payload.truncated)
                            out["body"].append(text)
                            out["charset"].append(used)
                            out["n_rejected"].append(n_rej)
                            emitted += 1
                    else:
                        n_rej += 1
                    if emitted == 0:  # all-NULL reject row for this range
                        out["warc_filename"].append(fname)
                        out["url"].append(url)
                        for k in cols[2:-1]:
                            out[k].append(None)
                        out["n_rejected"].append(max(n_rej, 1))
                if fh is not None:
                    fh.close()
                yield _pd.DataFrame(out)

    return manifest.mapInPandas(
        run,
        schema="warc_filename STRING, url STRING, record_index INT, "
               "warc_type STRING, target_uri STRING, warc_date STRING, "
               "http_status INT, content_type STRING, "
               "content_length BIGINT, truncated BOOLEAN, body STRING, "
               "charset STRING, n_rejected INT",
    )
