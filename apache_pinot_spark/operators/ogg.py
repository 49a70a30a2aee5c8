"""Ogg container walk (RFC 3533) with Opus (RFC 7845) and Vorbis I
identification-header parsing — the audit-stats tier for the `.opus` /
`.ogg` audio corpora (podcast dumps, Common Voice derivatives,
YouTube-derived speech sets) that the WAV/FLAC/MP3 tiers don't cover:
like ``mp3_stream_stats``, this reads what a pipeline SCHEDULES on
(codec, channels, sample rate, duration, page/CRC health) straight off
the container, no payload decode (Opus/Vorbis audio synthesis is the
documented capability plug point, exactly as inter-frame H.264 is for
video).

Page grammar (RFC 3533 §6): "OggS" capture pattern, version 0, header
flags (continued/BOS/EOS), 8-byte LE granule position, serial, page
sequence, CRC-32 (polynomial 0x04C11DB7, UNreflected, zero init/final —
NOT zlib's), segment count + lacing table, body. Duration comes from
the last page's granule position: Opus granules are ALWAYS 48 kHz
pre-skip-adjusted samples (RFC 7845 §4); Vorbis granules are samples at
the stream rate.

Untrusted-input bounds (the repo's hardening standard):
  * the walker advances by computed page length (bounded by the 255×255
    lacing maximum + 282-byte header), so iterations ≤ len(blob)/27
  * every page's CRC is VERIFIED — a corrupt page rejects the blob
    (pages are the integrity unit the format defines; a pipeline must
    not account duration off a corrupt granule field)
  * the CRC table is cross-checked against an independent bit-by-bit
    implementation of the polynomial in the tests (two derivations of
    the spec, not one copied table)
  * multiplexed/chained physical streams: stats follow the FIRST
    audio (Opus/Vorbis) logical stream; ``n_streams`` counts BOS
    packets so a pipeline can route multiplexed files for special
    handling; a granule of -1 (no packet boundary) is skipped, never
    accounted

Scale shape: per-row map-side work over the binary column
(Arrow-batched, zero shuffle); corrupt blobs emit ONE all-NULL row
(the multimodal reject convention).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OGG_MAGIC = b"OggS"


def _build_crc_table():
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table


_CRC_TABLE = _build_crc_table()


def ogg_crc(data: bytes) -> int:
    """RFC 3533 §6 page CRC: 0x04C11DB7, no reflection, init 0, xorout 0."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


@dataclass
class OggPage:
    offset: int
    flags: int
    granule: int          # signed 64-bit; -1 = no packet ends here
    serial: int
    sequence: int
    body: bytes
    n_segments: int

    @property
    def is_bos(self) -> bool:
        return bool(self.flags & 0x02)

    @property
    def is_eos(self) -> bool:
        return bool(self.flags & 0x04)


def parse_ogg_pages(blob: bytes, max_pages: int = 1 << 20):
    """Yield every page, CRC-verified. Raises ValueError on any
    corruption — the STRICT whole-file contract (pipeline blobs are
    whole files; a resync would silently accept corrupt tails)."""
    if blob is None or len(blob) < 27:
        raise ValueError("blob too short for an Ogg page")
    pos, n = 0, len(blob)
    count = 0
    while pos < n:
        if blob[pos : pos + 4] != _OGG_MAGIC:
            raise ValueError(f"no OggS capture pattern at {pos}")
        if pos + 27 > n:
            raise ValueError(f"truncated page header at {pos}")
        if blob[pos + 4] != 0:
            raise ValueError(f"unknown Ogg version {blob[pos + 4]} at {pos}")
        nseg = blob[pos + 26]
        head_end = pos + 27 + nseg
        if head_end > n:
            raise ValueError(f"truncated segment table at {pos}")
        body_len = sum(blob[pos + 27 : head_end])
        end = head_end + body_len
        if end > n:
            raise ValueError(f"page body overruns blob at {pos}")
        stored_crc = int.from_bytes(blob[pos + 22 : pos + 26], "little")
        page_bytes = bytearray(blob[pos:end])
        page_bytes[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page_bytes)) != stored_crc:
            raise ValueError(f"page CRC mismatch at {pos}")
        granule = int.from_bytes(blob[pos + 6 : pos + 14], "little",
                                 signed=True)
        yield OggPage(
            offset=pos,
            flags=blob[pos + 5],
            granule=granule,
            serial=int.from_bytes(blob[pos + 14 : pos + 18], "little"),
            sequence=int.from_bytes(blob[pos + 18 : pos + 22], "little"),
            body=bytes(blob[head_end:end]),
            n_segments=nseg,
        )
        count += 1
        if count > max_pages:
            raise ValueError(f"more than {max_pages} pages")
        pos = end


@dataclass
class OggInfo:
    codec: str                    # 'opus' | 'vorbis'
    serial: int
    channels: int
    sample_rate: int              # input/original rate from the header
    pre_skip: int = 0             # opus only (48 kHz samples)
    n_pages: int = 0
    n_streams: int = 0            # BOS packets in the physical stream
    last_granule: int | None = None
    has_eos: bool = False

    @property
    def duration_s(self) -> float | None:
        if self.last_granule is None:
            return None
        if self.codec == "opus":
            # RFC 7845 §4: granules are 48 kHz counts including pre-skip
            return max(self.last_granule - self.pre_skip, 0) / 48000.0
        return self.last_granule / self.sample_rate if self.sample_rate else None


def _parse_opus_head(body: bytes) -> tuple[int, int, int]:
    """(channels, input_sample_rate, pre_skip) from OpusHead (RFC 7845
    §5.1)."""
    if len(body) < 19:
        raise ValueError("OpusHead too short")
    version = body[8]
    if version >> 4 != 0:  # §5.1: major version must be 0
        raise ValueError(f"unsupported OpusHead version {version}")
    channels = body[9]
    if channels == 0:
        raise ValueError("OpusHead declares zero channels")
    pre_skip = int.from_bytes(body[10:12], "little")
    rate = int.from_bytes(body[12:16], "little")
    return channels, rate, pre_skip


def _parse_vorbis_id(body: bytes) -> tuple[int, int]:
    """(channels, sample_rate) from the Vorbis I identification header."""
    if len(body) < 30:
        raise ValueError("vorbis identification header too short")
    version = int.from_bytes(body[7:11], "little")
    if version != 0:
        raise ValueError(f"unsupported vorbis version {version}")
    channels = body[11]
    rate = int.from_bytes(body[12:16], "little")
    if channels == 0 or rate == 0:
        raise ValueError("vorbis header declares zero channels/rate")
    # framing: blocksizes byte + framing bit exist at 28/29 — bounds
    # already checked by the length guard
    return channels, rate


def parse_ogg(blob: bytes, max_pages: int = 1 << 20) -> OggInfo:
    """Walk the whole container; stats follow the first Opus/Vorbis
    logical stream. Raises ValueError for non-Ogg/corrupt input or when
    no audio stream is present."""
    info: OggInfo | None = None
    n_streams = 0
    n_pages = 0
    for page in parse_ogg_pages(blob, max_pages):
        n_pages += 1
        if page.is_bos:
            n_streams += 1
            if info is None:
                if page.body.startswith(b"OpusHead"):
                    ch, rate, skip = _parse_opus_head(page.body)
                    info = OggInfo("opus", page.serial, ch, rate,
                                   pre_skip=skip)
                elif page.body.startswith(b"\x01vorbis"):
                    ch, rate = _parse_vorbis_id(page.body)
                    info = OggInfo("vorbis", page.serial, ch, rate)
        if info is not None and page.serial == info.serial:
            if page.granule >= 0:
                info.last_granule = page.granule
            if page.is_eos:
                info.has_eos = True
    if info is None:
        raise ValueError("no Opus/Vorbis logical stream found")
    info.n_pages = n_pages
    info.n_streams = n_streams
    return info


def ogg_stream_stats(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, codec, channels, sample_rate, pre_skip, duration_s,
    n_pages, n_streams, has_eos) per blob — the audit columns a corpus
    pipeline filters/buckets on before committing to a (plug-point)
    decode. One Arrow map pass, zero shuffle; non-Ogg / corrupt /
    CRC-failing blobs emit ONE all-NULL row."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.ogg import parse_ogg

        cols = ("id", "codec", "channels", "sample_rate", "pre_skip",
                "duration_s", "n_pages", "n_streams", "has_eos")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    info = parse_ogg(bytes(blob) if blob is not None else None)
                except Exception:
                    out["id"].append(mid)
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                out["id"].append(mid)
                out["codec"].append(info.codec)
                out["channels"].append(info.channels)
                out["sample_rate"].append(info.sample_rate)
                out["pre_skip"].append(info.pre_skip)
                out["duration_s"].append(info.duration_s)
                out["n_pages"].append(info.n_pages)
                out["n_streams"].append(info.n_streams)
                out["has_eos"].append(info.has_eos)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, codec STRING, channels INT, "
               "sample_rate INT, pre_skip INT, duration_s DOUBLE, "
               "n_pages INT, n_streams INT, has_eos BOOLEAN",
    )
    return out.withColumnRenamed("id", id_col)
