"""Minimal AVI (RIFF) container parsing + MJPEG frame decode — the
second real-video slice next to operators/mp4.py: where mp4.py reads the
SAMPLE TABLE of an ISO BMFF stream, this module walks the RIFF chunk
tree of an AVI (the Microsoft 'AVI ' RIFF form, a public specification),
locates the video stream's frame chunks inside the 'movi' list, and —
for MJPEG streams — decodes sampled frames with the repo's own pure-
Python baseline-JPEG decoder (operators/jpeg_codec).

Scope:
  * RIFF walk: 'RIFF…AVI ', LIST hdrl (avih + per-stream strl/strh),
    LIST movi ('NNdc'/'NNdb' frame chunks, word-aligned), optional idx1
    (ignored — the movi walk is the source of truth).
  * avih: dwMicroSecPerFrame / dwTotalFrames / width / height.
  * strh: fccType ('vids'), fccHandler (e.g. 'MJPG'), dwScale/dwRate
    (fps = rate/scale), dwLength.
  * Frame extraction for the FIRST video stream; other streams (audio
    '01wb', …) are skipped by chunk id.
  * MJPEG frames are plain baseline JPEG streams per frame — decode
    reuses jpeg_codec.decode_jpeg; non-MJPG handlers parse (metadata +
    frame offsets) but reject the decode stage.

Scale shape: parsing + decode are per-row map-side work over the binary
column (Arrow-batched, zero shuffle); only the sampled frames are
decoded, never the whole stream. Corrupt blobs reject to the NULL
stream (the multimodal convention).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class AVIStream:
    fcc_type: str = ""
    handler: str = ""
    scale: int = 0
    rate: int = 0
    length: int = 0  # stream length in frames (video)

    @property
    def fps(self) -> float:
        return self.rate / self.scale if self.scale else 0.0


@dataclass
class AVIInfo:
    micro_sec_per_frame: int = 0
    total_frames: int = 0
    width: int = 0
    height: int = 0
    streams: list = field(default_factory=list)
    # (offset, size) of each video frame chunk's PAYLOAD, stream order
    frames: list = field(default_factory=list)

    @property
    def video(self) -> "AVIStream | None":
        for s in self.streams:
            if s.fcc_type == "vids":
                return s
        return None


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


def _chunks(blob: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for RIFF chunks in
    [start, end); chunk bodies are word-aligned (odd sizes pad 1)."""
    off = start
    while off + 8 <= end:
        fcc = blob[off : off + 4]
        size = _u32(blob, off + 4)
        body = off + 8
        if body + size > end:
            raise ValueError(f"chunk {fcc!r} size {size} overruns scope")
        yield fcc, body, body + size
        off = body + size + (size & 1)  # pad byte after odd-sized chunks
    if off not in (end, end + 1):
        raise ValueError("trailing bytes do not form a complete chunk header")


def parse_avi(blob: bytes) -> AVIInfo:
    """Parse container metadata + video frame directory. Raises
    ValueError for anything that is not a well-formed 'AVI ' RIFF
    (short-field struct/index errors normalize to the same contract)."""
    try:
        return _parse_avi(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed AVI field layout: {exc}") from exc


def _parse_avi(blob: bytes) -> AVIInfo:
    if blob is None or len(blob) < 12:
        raise ValueError("blob too short for a RIFF header")
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_size = _u32(blob, 4)
    end = min(8 + riff_size, len(blob))
    info = AVIInfo()
    video_ids: set = set()
    for fcc, s, e in _chunks(blob, 12, end):
        if fcc != b"LIST":
            continue
        list_type = blob[s : s + 4]
        if list_type == b"hdrl":
            _parse_hdrl(blob, s + 4, e, info)
            # chunk ids are 'NNdc'/'NNdb' with NN = 2-digit stream index
            video_ids = {
                f"{i:02d}".encode()
                for i, st in enumerate(info.streams)
                if st.fcc_type == "vids"
            }
        elif list_type == b"movi":
            for cfcc, cs, ce in _chunks(blob, s + 4, e):
                if cfcc[:2] in video_ids and cfcc[2:4] in (b"dc", b"db"):
                    info.frames.append((cs, ce - cs))
    if not info.streams:
        raise ValueError("no hdrl stream headers (not an AVI movie)")
    return info


def _parse_hdrl(blob: bytes, s: int, e: int, info: AVIInfo) -> None:
    for fcc, cs, ce in _chunks(blob, s, e):
        if fcc == b"avih":
            info.micro_sec_per_frame = _u32(blob, cs)
            info.total_frames = _u32(blob, cs + 16)
            info.width = _u32(blob, cs + 32)
            info.height = _u32(blob, cs + 36)
        elif fcc == b"LIST" and blob[cs : cs + 4] == b"strl":
            st = AVIStream()
            for sfcc, ss, se in _chunks(blob, cs + 4, ce):
                if sfcc == b"strh":
                    st.fcc_type = blob[ss : ss + 4].decode("latin1")
                    st.handler = blob[ss + 4 : ss + 8].decode("latin1")
                    st.scale = _u32(blob, ss + 20)
                    st.rate = _u32(blob, ss + 24)
                    st.length = _u32(blob, ss + 32)
            info.streams.append(st)


def mjpeg_frame_bytes(blob: bytes, info: AVIInfo, index: int) -> bytes:
    """Raw JPEG bytes of video frame ``index`` (0-based movi order)."""
    off, size = info.frames[index]
    return blob[off : off + size]


def choose_frames(info: AVIInfo, every_n_seconds: float) -> list:
    """[(frame_index, timestamp_s)] — frame at each k*every_n_seconds
    instant (floor to the frame grid; fps from strh rate/scale, falling
    back to avih micro_sec_per_frame), deduped, bounded by the frames
    actually present in movi."""
    if every_n_seconds <= 0:
        raise ValueError("every_n_seconds must be > 0")
    vid = info.video
    fps = vid.fps if vid and vid.fps > 0 else (
        1e6 / info.micro_sec_per_frame if info.micro_sec_per_frame else 0.0
    )
    n = len(info.frames)
    if fps <= 0 or n == 0:
        return []
    duration = n / fps
    # untrusted-field hardening: fps comes from strh rate/scale (or avih
    # micro_sec_per_frame) — corruption like rate=1/scale=2^32 makes
    # duration/every_n ~1e10 instants, so the loop iterates per DISTINCT
    # FRAME pick (bounded by the frames actually present in movi), jumping
    # k arithmetically to the first instant that can reach a new frame.
    picks, k, last = [], 0, -1
    while True:
        t = k * every_n_seconds
        if t > duration:
            break
        idx = min(int(t * fps), n - 1)
        if idx != last:
            picks.append((idx, idx / fps))
            last = idx
        if idx >= n - 1:
            break  # every later instant resolves to the last frame
        # first instant whose floor(t*fps) can reach idx+1
        nxt = math.ceil((idx + 1) / (fps * every_n_seconds))
        k = max(k + 1, nxt)
    return picks


def sample_avi_frames(
    df: DataFrame,
    every_n_seconds: float,
    content_col: str = "content",
    id_col: str = "media_id",
    decode: bool = True,
) -> DataFrame:
    """(media_id, frame_index, timestamp_s, height, width, mean_luma) —
    sampled frames of each AVI blob's first video stream, decoded with
    the stdlib-tier baseline-JPEG decoder when the stream is MJPG and
    ``decode`` is set (mean_luma = mean of the decoded frame's channel
    average, in [0, 255] — a deterministic content fingerprint). One
    Arrow map pass, zero shuffle. Non-AVI / non-MJPG / corrupt blobs emit
    ONE all-NULL row (the multimodal reject convention); an MJPG frame
    that fails JPEG decode keeps its index/timestamp with NULL pixel
    stats."""
    if every_n_seconds <= 0:
        raise ValueError("every_n_seconds must be > 0")
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment; the parser is too large to inline by value
        import pandas as _pd

        from apache_pinot_spark.operators.avi import (
            choose_frames,
            mjpeg_frame_bytes,
            parse_avi,
        )
        from apache_pinot_spark.operators.jpeg_codec import decode_jpeg

        for pdf in batches:
            out = {k: [] for k in
                   ("id", "frame_index", "timestamp_s", "height", "width",
                    "mean_luma")}

            def emit(mid, idx=None, ts=None, h=None, w=None, luma=None):
                out["id"].append(mid)
                out["frame_index"].append(idx)
                out["timestamp_s"].append(ts)
                out["height"].append(h)
                out["width"].append(w)
                out["mean_luma"].append(luma)

            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    data = bytes(blob) if blob is not None else None
                    info = parse_avi(data)
                    vid = info.video
                    if vid is None:
                        raise ValueError("no video stream")
                    picks = choose_frames(info, every_n_seconds)
                    if decode and vid.handler not in ("MJPG", "mjpg"):
                        raise ValueError("decode requested for non-MJPG stream")
                except Exception:
                    emit(mid)
                    continue
                for idx, ts in picks:
                    h = w = luma = None
                    if decode:
                        img = decode_jpeg(mjpeg_frame_bytes(data, info, idx))
                        if img is not None:
                            h, w = int(img.shape[0]), int(img.shape[1])
                            luma = float(img.astype("float64").mean())
                    emit(mid, idx, ts, h, w, luma)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, frame_index INT, timestamp_s DOUBLE, "
               "height INT, width INT, mean_luma DOUBLE",
    )
    return out.withColumnRenamed("id", id_col)


def avi_video_stats(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, handler, width, height, fps, n_frames, duration_s,
    total_frame_bytes, bitrate_bps) per AVI blob — the same
    container-level audit columns mp4.mp4_video_stats provides for ISO
    BMFF, read from avih/strh and the movi frame directory (no payload
    decode). One Arrow map pass, zero shuffle; corrupt / non-AVI blobs
    emit ONE all-NULL row (the multimodal reject convention)."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.avi import parse_avi

        cols = ("id", "handler", "width", "height", "fps", "n_frames",
                "duration_s", "total_frame_bytes", "bitrate_bps")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    info = parse_avi(bytes(blob) if blob is not None else None)
                    vid = info.video
                    if vid is None or not info.frames:
                        raise ValueError("no video stream / frames")
                    fps = vid.fps if vid.fps > 0 else (
                        1e6 / info.micro_sec_per_frame
                        if info.micro_sec_per_frame else 0.0)
                    if fps <= 0:
                        raise ValueError("no frame rate derivable")
                    n = len(info.frames)
                    dur = n / fps
                    total = sum(sz for _, sz in info.frames)
                except Exception:
                    out["id"].append(mid)
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                out["id"].append(mid)
                out["handler"].append(vid.handler or None)
                out["width"].append(info.width or None)
                out["height"].append(info.height or None)
                out["fps"].append(fps)
                out["n_frames"].append(n)
                out["duration_s"].append(dur)
                out["total_frame_bytes"].append(total)
                out["bitrate_bps"].append(total * 8.0 / dur if dur > 0 else None)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, handler STRING, width INT, height INT, "
               "fps DOUBLE, n_frames INT, duration_s DOUBLE, "
               "total_frame_bytes BIGINT, bitrate_bps DOUBLE",
    )
    return out.withColumnRenamed("id", id_col)
