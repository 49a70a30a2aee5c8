"""Tar archive walking — the container of the big research-corpus
dumps (arXiv source distributes ~500 MB .tar files whose members are
per-paper .gz bundles; many institutional dumps follow the same shape):
explode tar blobs into member rows with bounded reads, optionally
inflating per-member gzip, so the .tex/.json/.txt inside flows straight
into the text tiers (operators/latex, corpusio, …).

Stdlib tarfile over an in-memory blob; the member walk streams —
nothing materializes but the members a filter keeps.

Untrusted-input bounds (the repo's hardening standard):
  * per-member extraction is cap-bounded via chunked ExFileObject
    reads (``max_member_bytes``) — a lying size field or a gzip-bomb
    member truncates/rejects, never OOMs
  * member count capped (``max_members``); a corrupt member loses only
    itself (per-member isolation, ``n_rejected`` per blob); a corrupt
    tar header ends the walk with what was already yielded
  * path names pass through VERBATIM as data (no filesystem writes —
    path-traversal names are inert here)

Scale shape: per-row map-side work over the binary column
(Arrow-batched); one blob explodes to one row per kept member — the
WARC-record contract with tar members instead. Pair with binaryFile.
"""

from __future__ import annotations

import fnmatch
import io
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_READ_CHUNK = 1 << 20


def iter_tar_members(
    blob: bytes,
    name_glob: str | None = None,
    max_member_bytes: int = 64 << 20,
    max_members: int = 100_000,
    gunzip_members: bool = True,
):
    """Yield ('member', (name, data)) | ('reject', reason) per regular
    file in the tar. ``gunzip_members`` inflates members whose name ends
    .gz (cap-bounded — the arXiv per-paper bundles), renaming them
    without the suffix."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(blob), mode="r:*")
    except Exception as exc:
        yield ("reject", f"not a readable tar: {exc}")
        return
    count = 0
    with tf:
        while True:
            try:
                info = tf.next()
            except Exception as exc:
                yield ("reject", f"corrupt tar header: {exc}")
                return
            if info is None:
                return
            if not info.isfile():
                continue
            count += 1
            if count > max_members:
                yield ("reject", f"more than {max_members} members")
                return
            if name_glob and not fnmatch.fnmatch(info.name, name_glob):
                continue
            try:
                fh = tf.extractfile(info)
                if fh is None:
                    continue
                out = bytearray()
                while len(out) <= max_member_bytes:
                    chunk = fh.read(
                        min(_READ_CHUNK, max_member_bytes + 1 - len(out)))
                    if not chunk:
                        break
                    out += chunk
                if len(out) > max_member_bytes:
                    yield ("reject",
                           f"member {info.name!r} past the size cap")
                    continue
                data, name = bytes(out), info.name
                if gunzip_members and name.endswith(".gz"):
                    import zlib

                    dec = zlib.decompressobj(wbits=31)
                    inflated = bytearray()
                    pos = 0
                    while pos < len(data) or dec.unconsumed_tail:
                        chunk = (dec.unconsumed_tail
                                 or data[pos : pos + _READ_CHUNK])
                        if not dec.unconsumed_tail:
                            pos += len(chunk)
                        inflated += dec.decompress(
                            chunk, max_member_bytes + 1 - len(inflated))
                        if len(inflated) > max_member_bytes:
                            raise ValueError("gzip member past the cap")
                        if dec.eof:
                            break
                    data, name = bytes(inflated), name[:-3]
            except Exception as exc:
                yield ("reject", f"member {info.name!r}: {exc}")
                continue
            yield ("member", (name, data))


def tar_members(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    name_glob: str | None = None,
    max_member_bytes: int = 64 << 20,
    max_members: int = 100_000,
    gunzip_members: bool = True,
    as_text: bool = False,
) -> DataFrame:
    """Explode tar blobs into (id, member_name, member_index, data|text,
    n_bytes, n_rejected) rows — ``as_text`` decodes UTF-8 with
    replacement for text-tier members (.tex/.txt/.json). Blobs with no
    kept members emit ONE all-NULL row carrying the reject count. One
    Arrow map pass emitting one frame per blob."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))
    want_text = bool(as_text)

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.tarwalk import iter_tar_members

        cols = ("id", "member_name", "member_index", "payload",
                "n_bytes", "n_rejected")
        for pdf in batches:
            for mid, blob in zip(pdf["id"], pdf["c"]):
                out = {k: [] for k in cols}
                idx, n_rej = 0, 0
                for kind, payload in iter_tar_members(
                    bytes(blob) if blob is not None else b"",
                    name_glob=name_glob,
                    max_member_bytes=max_member_bytes,
                    max_members=max_members,
                    gunzip_members=gunzip_members,
                ):
                    if kind == "reject":
                        n_rej += 1
                        continue
                    name, data = payload
                    out["id"].append(mid)
                    out["member_name"].append(name)
                    out["member_index"].append(idx)
                    out["payload"].append(
                        data.decode("utf-8", "replace") if want_text
                        else data)
                    out["n_bytes"].append(len(data))
                    idx += 1
                if idx == 0:
                    out["id"].append(mid)
                    for k in cols[1:-1]:
                        out[k].append(None)
                out["n_rejected"] = [n_rej] * len(out["id"])
                yield _pd.DataFrame(out)

    ptype = "STRING" if want_text else "BINARY"
    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, member_name STRING, member_index INT, "
               f"payload {ptype}, n_bytes INT, n_rejected INT",
    )
    return out.withColumnRenamed("id", id_col)
