"""Zstandard (RFC 8878) frame handling for compressed-corpus ingestion —
the compression LLM training corpora actually ship with (`.jsonl.zst`
dumps, the IIPC `.warc.zst` convention), as a sibling of the gzip-member
tier in operators/warc.py.

Division of labor — spec walker vs library codec:
  * FRAME BOUNDARIES are parsed from scratch off the PUBLIC RFC 8878
    grammar (magic, frame-header descriptor, block-loop arithmetic,
    skippable frames). The zstd frame header does NOT record its own
    compressed length, so per-member error isolation — the property
    .warc.zst is written for — requires walking block headers; no
    entropy decode is involved, it is pure bounded arithmetic over
    untrusted bytes.
  * ENTROPY DECODE goes through pyarrow's bundled zstd codec
    (``pyarrow.CompressedInputStream``), an already-present dependency —
    re-implementing FSE/Huffman when the container ships a real codec
    would be waste, not coverage. The walker feeds it exactly one
    frame's span at a time and drains it in bounded chunks.

Untrusted-input bounds (the repo's hardening standard):
  * the walker only indexes — a corrupt length field can at most step
    past the blob end, which rejects; iterations are bounded by
    len(blob)/3 (every block consumes >= a 3-byte header)
  * inflation is capped chunkwise DURING decompression
    (``max_member_bytes``) — a zstd bomb (raw ~1000:1, RLE far higher)
    rejects before it materializes
  * reserved block type 3, reserved descriptor bit, and window sizes
    past 2^31 reject
  * dictionary-compressed frames (nonzero Dictionary_ID, the optional
    .warc.zst dictionary convention) reject per frame with the dict id
    in the reason — the bundled codec has no dictionary API, and
    silently-wrong output is worse than an honest reject

Scale shape: per-row map-side work (the WARC operator calls this inside
its Arrow map pass); zero shuffle, zero driver involvement.
"""

from __future__ import annotations

from dataclasses import dataclass

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"  # 0xFD2FB528 little-endian
#: skippable frames: 0x184D2A50 .. 0x184D2A5F (low nibble free)
_SKIP_MAGIC_PREFIX = b"\x2a\x4d\x18"  # bytes 1-3 of the LE magic
#: the IIPC .warc.zst convention stores the shared dictionary in a
#: skippable frame with this exact magic (0x184D2A5D)
WARC_DICT_MAGIC = b"\x5d\x2a\x4d\x18"
_INFLATE_CHUNK = 1 << 20
#: decoder window ceiling: RFC 8878 asks decoders to support up to
#: 8 MB and permits refusing past format limits; 2^31 matches the
#: reference implementation's hard bound
_MAX_WINDOW_LOG = 31


@dataclass
class ZstdFrame:
    kind: str            # 'frame' | 'skippable'
    start: int           # offset of the magic
    end: int             # one past the frame's last byte
    content_size: int | None = None   # from the header when recorded
    dict_id: int = 0
    has_checksum: bool = False
    skip_magic_low: int | None = None  # skippable frames: magic & 0xF


def _is_skippable_magic(blob: bytes, pos: int) -> bool:
    return (
        blob[pos + 1 : pos + 4] == _SKIP_MAGIC_PREFIX
        and 0x50 <= blob[pos] <= 0x5F
    )


def parse_frame_header(blob: bytes, pos: int) -> tuple[ZstdFrame, int]:
    """Parse ONE standard frame's header starting at the magic; returns
    (frame-with-placeholder-end, offset_of_first_block). Raises
    ValueError on corruption. Pure RFC 8878 §3.1.1 arithmetic."""
    if blob[pos : pos + 4] != ZSTD_MAGIC:
        raise ValueError(f"no zstd magic at {pos}")
    p = pos + 4
    if p >= len(blob):
        raise ValueError(f"truncated frame header at {pos}")
    fhd = blob[p]
    p += 1
    if fhd & 0x08:
        raise ValueError(f"reserved frame-descriptor bit set at {pos}")
    single_segment = bool(fhd & 0x20)
    fcs_flag = fhd >> 6
    did_size = (0, 1, 2, 4)[fhd & 0x03]
    if not single_segment:
        if p >= len(blob):
            raise ValueError(f"truncated window descriptor at {pos}")
        wd = blob[p]
        p += 1
        window_log = 10 + (wd >> 3)
        if window_log > _MAX_WINDOW_LOG:
            raise ValueError(
                f"window size 2^{window_log} past the decoder bound")
    dict_id = 0
    if did_size:
        if p + did_size > len(blob):
            raise ValueError(f"truncated dictionary id at {pos}")
        dict_id = int.from_bytes(blob[p : p + did_size], "little")
        p += did_size
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    content_size = None
    if fcs_size:
        if p + fcs_size > len(blob):
            raise ValueError(f"truncated content size at {pos}")
        content_size = int.from_bytes(blob[p : p + fcs_size], "little")
        if fcs_size == 2:
            content_size += 256
        p += fcs_size
    frame = ZstdFrame(
        kind="frame", start=pos, end=-1, content_size=content_size,
        dict_id=dict_id, has_checksum=bool(fhd & 0x04),
    )
    return frame, p


def _walk_blocks(blob: bytes, p: int, frame_start: int) -> int:
    """Step over the frame's block sequence; returns the offset just past
    the last block (before any content checksum). §3.1.1.2 arithmetic:
    3-byte LE header = last_block(1) | block_type(2) | block_size(21)."""
    n = len(blob)
    while True:
        if p + 3 > n:
            raise ValueError(f"truncated block header in frame at {frame_start}")
        h = int.from_bytes(blob[p : p + 3], "little")
        p += 3
        last = h & 0x1
        btype = (h >> 1) & 0x3
        bsize = h >> 3
        if btype == 3:
            raise ValueError(f"reserved block type in frame at {frame_start}")
        span = 1 if btype == 1 else bsize  # RLE blocks store one byte
        if p + span > n:
            raise ValueError(f"block overruns blob in frame at {frame_start}")
        p += span
        if last:
            return p


def walk_zstd_frames(blob: bytes):
    """Yield ZstdFrame for every frame in a concatenated zstd stream —
    standard and skippable — with exact byte extents. STRICT: raises
    ValueError at the first corrupt frame (tooling/fixture form; the
    tolerant member iterator below wraps it)."""
    pos = 0
    n = len(blob)
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"trailing bytes at {pos} are no frame")
        if _is_skippable_magic(blob, pos):
            if pos + 8 > n:
                raise ValueError(f"truncated skippable frame at {pos}")
            size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
            end = pos + 8 + size
            if end > n:
                raise ValueError(f"skippable frame at {pos} overruns blob")
            yield ZstdFrame(kind="skippable", start=pos, end=end,
                            skip_magic_low=blob[pos] & 0xF)
            pos = end
            continue
        frame, p = parse_frame_header(blob, pos)
        p = _walk_blocks(blob, p, pos)
        if frame.has_checksum:
            if p + 4 > n:
                raise ValueError(f"truncated content checksum at {pos}")
            p += 4
        frame.end = p
        yield frame
        pos = p


def decompress_frame_bounded(span: bytes, cap: int,
                             content_size: int | None = None) -> bytes:
    """Inflate ONE standard frame's bytes through the bundled codec,
    enforcing ``cap`` chunkwise DURING decompression (a bomb raises
    before it materializes). The header's content size, when recorded,
    is cross-checked — a lying header rejects."""
    import pyarrow as pa

    if content_size is not None and content_size > cap:
        raise ValueError(
            f"frame declares {content_size} bytes, past the {cap} cap")
    stream = pa.CompressedInputStream(pa.BufferReader(span), "zstd")
    out = bytearray()
    try:
        while True:
            chunk = stream.read(min(_INFLATE_CHUNK, cap + 1 - len(out)))
            if not chunk:
                break
            out += chunk
            if len(out) > cap:
                raise ValueError(f"frame inflates past {cap} bytes")
    except pa.lib.ArrowInvalid as exc:  # corrupt entropy payload
        raise ValueError(f"corrupt zstd frame: {exc}") from exc
    except OSError as exc:
        raise ValueError(f"corrupt zstd frame: {exc}") from exc
    if content_size is not None and len(out) != content_size:
        raise ValueError(
            f"frame inflated to {len(out)} bytes, header said {content_size}")
    return bytes(out)


def split_zstd_members(blob: bytes, max_member_bytes: int):
    """Yield the inflated bytes of each standard frame in a concatenated
    .zst stream (the .warc.zst layout: one record — or record run — per
    frame), skippable frames skipped. STRICT form; raises ValueError on
    the first corrupt/oversized/dictionary frame."""
    for frame in walk_zstd_frames(blob):
        if frame.kind == "skippable":
            continue
        if frame.dict_id:
            raise ValueError(
                f"dictionary-compressed frame (dict_id={frame.dict_id}) "
                "unsupported: the bundled codec has no dictionary API")
        yield decompress_frame_bounded(
            blob[frame.start : frame.end], max_member_bytes,
            frame.content_size)


def iter_zstd_members_tolerant(blob: bytes, max_member_bytes: int):
    """Yield ('member', inflated_bytes) | ('reject', reason) per standard
    frame, isolating errors: a corrupt/oversized/dictionary frame emits
    one reject event and the walker RESYNCS at the next frame magic —
    the same contract as the gzip-member walker in operators/warc.py."""
    pos = 0
    n = len(blob)
    while pos < n:
        try:
            if _is_skippable_magic(blob, pos) and pos + 8 <= n:
                size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
                end = pos + 8 + size
                if end > n:
                    raise ValueError(f"skippable frame at {pos} overruns blob")
                pos = end
                continue
            frame, p = parse_frame_header(blob, pos)
            p = _walk_blocks(blob, p, pos)
            if frame.has_checksum:
                if p + 4 > n:
                    raise ValueError(f"truncated content checksum at {pos}")
                p += 4
            if frame.dict_id:
                raise ValueError(
                    f"dictionary-compressed frame at {pos} "
                    f"(dict_id={frame.dict_id}) unsupported")
            data = decompress_frame_bounded(
                blob[frame.start : p], max_member_bytes, frame.content_size)
        except ValueError as exc:
            yield ("reject", str(exc))
            nxt = blob.find(ZSTD_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield ("member", data)
        pos = p
