"""Minimal MP4 / ISO base media file format (ISO/IEC 14496-12) container
parsing — the REAL metadata tier under video frame sampling: instead of
trusting caller-supplied duration/fps columns
(operators/multimodal.sample_video_frames, the SQL-replayable plan), this
reads the movie box out of the blob itself and samples against the
track's ACTUAL sample table.

Scope:
  * box walk: size/type headers, 64-bit largesize, size-0 = to-EOF,
    recursion through the container boxes (moov/trak/mdia/minf/stbl)
  * mvhd / mdhd: movie + media timescale & duration (versions 0 and 1)
  * hdlr: handler type (video tracks are 'vide')
  * stts: decode-time deltas → exact per-sample timestamps
  * stss: sync-sample (keyframe) numbers — absent box = all sync
  * payload tier (r10): stsd sample format, stsz sizes (constant or
    per-sample table), stsc sample-to-chunk runs, stco/co64 chunk
    offsets — sample index → (absolute offset, size) → frame bytes,
    and sample_mp4_frames decodes JPEG-coded tracks ('jpeg'/'mjpa'/...)
    with the repo's pure-Python baseline-JPEG decoder, the exact shape
    operators/avi provides for MJPEG-in-AVI.

H.264 tracks ('avc1'/'avc3', r11): the avcC decoder configuration is
pulled from the sample entry and picked IDR keyframes decode with the
repo's pure-Python baseline intra decoder (operators/h264) — the
keyframe-sampling slice a curation pipeline needs. Frame decode beyond
JPEG/H.264-intra (AV1, H.264 inter prediction, HEVC, ...) stays the
capability-gated stage (operators/multimodal — no video codec libs in
this container); everything a pipeline schedules on — sample indices,
timestamps, keyframes, payload byte ranges — is real here, with the
per-blob reject path for corrupt containers.

Scale shape: parsing + decode are per-row map-side work over the binary
column (Arrow-batched, zero shuffle); the moov box for typical files is
tens of KB, the parser touches only header bytes plus the stbl tables,
and only the PICKED samples' byte ranges are sliced out of mdat.
"""

from __future__ import annotations

import math
import struct
from bisect import bisect_right
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


@dataclass
class MP4Track:
    handler: str = ""
    timescale: int = 0
    duration: int = 0  # in media timescale units
    stts: list = field(default_factory=list)  # [(sample_count, delta)]
    stss: list | None = None  # 1-based sync sample numbers; None = all sync
    sample_count: int = 0
    # payload tier (r10): the chunk map that turns a sample index into the
    # frame's actual bytes — stsd sample format, stsz sizes, stsc
    # sample-to-chunk runs, stco/co64 chunk offsets
    format: str = ""  # fourcc of stsd entry 1 (e.g. 'jpeg' for MJPEG)
    width: int = 0  # coded size from the visual sample entry (0 = absent)
    height: int = 0
    stsz_const: int = 0  # constant sample size; 0 = per-sample table
    stsz: list | None = None  # per-sample sizes when stsz_const == 0
    stsc: list = field(default_factory=list)  # [(first_chunk, samples_per_chunk)]
    chunk_offsets: list = field(default_factory=list)  # absolute file offsets
    avcc: bytes | None = None  # AVCDecoderConfigurationRecord (avc1 tracks)


@dataclass
class MP4Info:
    timescale: int = 0  # movie timescale (mvhd)
    duration: int = 0  # movie duration in movie timescale units
    tracks: list = field(default_factory=list)

    @property
    def video_tracks(self) -> list:
        return [t for t in self.tracks if t.handler == "vide"]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def _u64(b: bytes, o: int) -> int:
    return struct.unpack_from(">Q", b, o)[0]


def _boxes(blob: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    off = start
    while off + 8 <= end:
        size = _u32(blob, off)
        btype = blob[off + 4 : off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize follows the type
            if off + 16 > end:
                raise ValueError("truncated largesize box header")
            size = _u64(blob, off + 8)
            body = off + 16
        elif size == 0:  # box extends to the end of the enclosing scope
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(
                f"box {btype!r} size {size} overruns enclosing scope"
            )
        yield btype, body, off + size
        off += size
    if off != end:
        raise ValueError("trailing bytes do not form a complete box header")


def _parse_mvhd(blob: bytes, s: int, e: int, info: MP4Info) -> None:
    version = blob[s]
    if version == 1:
        info.timescale = _u32(blob, s + 20)
        info.duration = _u64(blob, s + 24)
    else:
        info.timescale = _u32(blob, s + 12)
        info.duration = _u32(blob, s + 16)


def _parse_mdhd(blob: bytes, s: int, e: int, trk: MP4Track) -> None:
    version = blob[s]
    if version == 1:
        trk.timescale = _u32(blob, s + 20)
        trk.duration = _u64(blob, s + 24)
    else:
        trk.timescale = _u32(blob, s + 12)
        trk.duration = _u32(blob, s + 16)


def _parse_stts(blob: bytes, s: int, e: int, trk: MP4Track) -> None:
    n = _u32(blob, s + 4)
    if s + 8 + 8 * n > e:
        raise ValueError("stts entry table overruns box")
    entries = []
    total = 0
    for i in range(n):
        cnt = _u32(blob, s + 8 + 8 * i)
        delta = _u32(blob, s + 12 + 8 * i)
        entries.append((cnt, delta))
        total += cnt
        # untrusted-field bound: every real sample occupies >= 1 byte of
        # mdat, so a count exceeding the blob size is a lie (a ~150-byte
        # blob claiming 2^32 samples would otherwise drive unbounded
        # per-sample work downstream) — reject, don't trust
        if total > len(blob):
            raise ValueError(
                f"stts claims {total} samples in a {len(blob)}-byte blob"
            )
    trk.stts = entries
    trk.sample_count = total


def _parse_stss(blob: bytes, s: int, e: int, trk: MP4Track) -> None:
    n = _u32(blob, s + 4)
    if s + 8 + 4 * n > e:
        raise ValueError("stss entry table overruns box")
    trk.stss = [_u32(blob, s + 8 + 4 * i) for i in range(n)]


def _parse_stsd(blob: bytes, s: int, e: int, trk: MP4Track) -> None:
    # first sample entry: format fourcc (names the codec — MJPEG-in-MP4
    # uses 'jpeg'/'mjpa') and, for visual entries, the coded width/height
    # (VisualSampleEntry: 8-byte box header + 8 bytes SampleEntry fields
    # + 16 bytes pre_defined/reserved, then u16 width, u16 height)
    n = _u32(blob, s + 4)
    if n >= 1:
        if s + 16 > e:
            raise ValueError("stsd sample entry overruns box")
        trk.format = blob[s + 12 : s + 16].decode("latin1")
        entry = s + 8  # start of the first sample entry box
        if entry + 36 <= e:
            trk.width = _u32(blob, entry + 32) >> 16
            trk.height = _u32(blob, entry + 32) & 0xFFFF
        if trk.format in ("avc1", "avc3"):
            # child boxes follow the 86-byte VisualSampleEntry; pull the
            # decoder configuration (avcC) for the r11 H.264 intra tier
            entry_size = _u32(blob, entry)
            c = entry + 86
            while c + 8 <= min(entry + entry_size, e):
                csize = _u32(blob, c)
                if csize < 8 or c + csize > e:
                    break
                if blob[c + 4 : c + 8] == b"avcC":
                    trk.avcc = bytes(blob[c + 8 : c + csize])
                    break
                c += csize


def _parse_stsz(blob: bytes, s: int, e: int, trk: MP4Track) -> None:
    const = _u32(blob, s + 4)
    n = _u32(blob, s + 8)
    trk.stsz_const = const
    if const == 0:
        if s + 12 + 4 * n > e:
            raise ValueError("stsz entry table overruns box")
        trk.stsz = [_u32(blob, s + 12 + 4 * i) for i in range(n)]


def _parse_stsc(blob: bytes, s: int, e: int, trk: MP4Track) -> None:
    n = _u32(blob, s + 4)
    if s + 8 + 12 * n > e:
        raise ValueError("stsc entry table overruns box")
    trk.stsc = [
        (_u32(blob, s + 8 + 12 * i), _u32(blob, s + 12 + 12 * i))
        for i in range(n)
    ]


def _parse_stco(blob: bytes, s: int, e: int, trk: MP4Track,
                wide: bool = False) -> None:
    n = _u32(blob, s + 4)
    w = 8 if wide else 4
    if s + 8 + w * n > e:
        raise ValueError("chunk offset table overruns box")
    rd = _u64 if wide else _u32
    trk.chunk_offsets = [rd(blob, s + 8 + w * i) for i in range(n)]


def _walk(blob: bytes, s: int, e: int, info: MP4Info, trk: MP4Track | None):
    for btype, bs, be in _boxes(blob, s, e):
        if btype == b"trak":
            t = MP4Track()
            info.tracks.append(t)
            _walk(blob, bs, be, info, t)
        elif btype in _CONTAINERS:
            _walk(blob, bs, be, info, trk)
        elif btype == b"mvhd":
            _parse_mvhd(blob, bs, be, info)
        elif btype == b"mdhd" and trk is not None:
            _parse_mdhd(blob, bs, be, trk)
        elif btype == b"hdlr" and trk is not None:
            trk.handler = blob[bs + 8 : bs + 12].decode("latin1")
        elif btype == b"stts" and trk is not None:
            _parse_stts(blob, bs, be, trk)
        elif btype == b"stss" and trk is not None:
            _parse_stss(blob, bs, be, trk)
        elif btype == b"stsd" and trk is not None:
            _parse_stsd(blob, bs, be, trk)
        elif btype == b"stsz" and trk is not None:
            _parse_stsz(blob, bs, be, trk)
        elif btype == b"stsc" and trk is not None:
            _parse_stsc(blob, bs, be, trk)
        elif btype == b"stco" and trk is not None:
            _parse_stco(blob, bs, be, trk)
        elif btype == b"co64" and trk is not None:
            _parse_stco(blob, bs, be, trk, wide=True)
        # every other box (tkhd, dinf, mdat, free, ...) is skipped by
        # size — the walk never needs its contents


def parse_mp4(blob: bytes) -> MP4Info:
    """Parse the container metadata. Raises ValueError for anything that
    is not a well-formed ISO BMFF stream with a moov box (a box whose
    declared size fits the blob but undershoots its own field layout
    surfaces as struct/index errors deep in the field reads — normalized
    to the same ValueError reject contract)."""
    try:
        return _parse_mp4(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed MP4 field layout: {exc}") from exc


def _parse_mp4(blob: bytes) -> MP4Info:
    if blob is None or len(blob) < 16:
        raise ValueError("blob too short for an MP4 container")
    top = list(_boxes(blob, 0, len(blob)))
    types = [t for t, _, _ in top]
    if b"moov" not in types:
        raise ValueError("no moov box (not an MP4 movie, or metadata-stripped)")
    if types[0] == b"ftyp":
        pass  # classic layout; moov-first (faststart) is also legal
    info = MP4Info()
    for btype, bs, be in top:
        if btype == b"moov":
            _walk(blob, bs, be, info, None)
    if info.timescale <= 0:
        raise ValueError("moov carries no mvhd timescale")
    return info


def sample_times(trk: MP4Track) -> list:
    """Exact decode timestamps (seconds) per sample from the stts runs."""
    if trk.timescale <= 0:
        raise ValueError("track has no mdhd timescale")
    out, t = [], 0
    for cnt, delta in trk.stts:
        for _ in range(cnt):
            out.append(t / trk.timescale)
            t += delta
    return out


def choose_samples(trk: MP4Track, every_n_seconds: float,
                   keyframes_only: bool = False) -> list:
    """[(sample_index 0-based, timestamp_s, is_sync)] — for each target
    instant k*every_n_seconds within the track, the LAST sample whose
    decode time is <= the instant (seek semantics). With
    ``keyframes_only`` the pick snaps back to the nearest preceding sync
    sample (what a real frame extractor can decode without a GOP walk).
    Consecutive instants that resolve to the same sample dedupe.

    Untrusted-field hardening: the loop never iterates per INSTANT (an
    mdhd u64 duration is corruption/attacker-controlled — duration/e
    iterations could be ~1e18); it iterates per DISTINCT RAW SAMPLE pick
    (bounded by sample_count, which _parse_stts bounds by blob size),
    jumping k arithmetically to the first instant that can resolve to a
    new sample. Per-instant lookups are O(log runs) via bisect over the
    cumulative stts run tables, not a linear scan over all samples."""
    if every_n_seconds <= 0:
        raise ValueError("every_n_seconds must be > 0")
    if trk.timescale <= 0:
        raise ValueError("track has no mdhd timescale")
    if not trk.stts or trk.sample_count <= 0:
        return []
    # cumulative run tables: run j holds samples [cum_n[j], cum_n[j+1])
    # starting at tick cum_t[j] with per-sample delta deltas[j]
    deltas, cum_n, cum_t = [], [0], [0]
    for cnt, delta in trk.stts:
        deltas.append(delta)
        cum_n.append(cum_n[-1] + cnt)
        cum_t.append(cum_t[-1] + cnt * delta)
    total_n = cum_n[-1]
    ts = trk.timescale

    def time_of(i: int) -> float:  # decode time (s) of 0-based sample i
        j = bisect_right(cum_n, i) - 1
        return (cum_t[j] + (i - cum_n[j]) * deltas[j]) / ts

    def idx_at(target: float) -> int:  # last sample with time <= target
        tt = target * ts
        j = bisect_right(cum_t, tt) - 1
        if j >= len(deltas):
            i = total_n - 1
        elif deltas[j] == 0:
            i = cum_n[j + 1] - 1
        else:
            i = min(cum_n[j] + int((tt - cum_t[j]) // deltas[j]),
                    cum_n[j + 1] - 1)
        i = min(max(i, 0), total_n - 1)
        # exact float refinement: the arithmetic above compares ticks to
        # target*ts; the contract compares (ticks/ts) to target — refine
        # +/-1 so boundary rounding matches the per-sample comparison
        while i + 1 < total_n and time_of(i + 1) <= target:
            i += 1
        while i > 0 and time_of(i) > target:
            i -= 1
        return i

    sync_sorted = sorted(trk.stss) if trk.stss is not None else None
    sync_set = set(trk.stss) if trk.stss is not None else None

    def is_sync(i: int) -> bool:
        return sync_set is None or (i + 1) in sync_set

    duration_s = trk.duration / ts
    picks, k, last = [], 0, -1
    while True:
        target = k * every_n_seconds
        if target > duration_s:
            break
        raw = idx_at(target)
        idx = raw
        if keyframes_only and sync_sorted is not None:
            p = bisect_right(sync_sorted, idx + 1) - 1
            # nearest preceding sync sample; none before -> sample 0
            # (same endpoint as the scan-back contract)
            idx = sync_sorted[p] - 1 if p >= 0 else 0
            idx = min(max(idx, 0), total_n - 1)
        if idx != last:
            picks.append((idx, time_of(idx), is_sync(idx)))
            last = idx
        if raw >= total_n - 1:
            break  # every later instant resolves to the same raw sample
        # first instant that can resolve past `raw`
        nxt = math.ceil(time_of(raw + 1) / every_n_seconds)
        k = max(k + 1, nxt)
    return picks


# JPEG-in-MP4 sample-entry fourccs the repo's own baseline decoder can
# handle (ISO 14496-12 stsd formats for motion-JPEG tracks)
JPEG_FORMATS = frozenset({"jpeg", "mjpa", "mjpb", "MJPG", "mjpg"})


def sample_locations(trk: MP4Track) -> list:
    """[(absolute_offset, size)] per sample, 0-based, from the stsc
    sample-to-chunk runs + stco/co64 chunk offsets + stsz sizes — the map
    that turns choose_samples' picks into actual frame bytes.

    Untrusted-field bounds: the loop appends at most sample_count
    entries (already bounded by blob size in _parse_stts), so a lying
    stsc samples_per_chunk of 2^32 cannot drive unbounded work; chunk
    indices are validated against the stco table; offset/size sanity
    against the blob happens at extraction (sample_bytes), where the
    specific sample is known."""
    n = trk.sample_count
    if n <= 0:
        return []
    if not trk.chunk_offsets or not trk.stsc:
        raise ValueError("track carries no stsc/stco chunk map")
    if trk.stsz_const:
        def size_of(i: int) -> int:
            return trk.stsz_const
    else:
        if trk.stsz is None or len(trk.stsz) < n:
            raise ValueError("stsz table shorter than stts sample count")
        size_of = trk.stsz.__getitem__
    nc = len(trk.chunk_offsets)
    stsc = trk.stsc
    locs: list = []
    for ei, (first, spc) in enumerate(stsc):
        if first < 1 or first > nc:
            raise ValueError("stsc first_chunk outside the stco table")
        if ei + 1 < len(stsc) and stsc[ei + 1][0] <= first:
            raise ValueError("stsc first_chunk not strictly ascending")
        last = (stsc[ei + 1][0] - 1) if ei + 1 < len(stsc) else nc
        last = min(last, nc)
        for c in range(first, last + 1):
            off = trk.chunk_offsets[c - 1]
            k = 0
            while k < spc and len(locs) < n:
                sz = size_of(len(locs))
                locs.append((off, sz))
                off += sz
                k += 1
            if len(locs) >= n:
                return locs
    raise ValueError("chunk map covers fewer samples than stts declares")


def sample_bytes(blob: bytes, locs: list, index: int) -> bytes:
    """Raw payload bytes of sample ``index`` (0-based); rejects offsets/
    sizes that point outside the blob (corrupt stco/stsz)."""
    off, size = locs[index]
    if off < 0 or size < 0 or off + size > len(blob):
        raise ValueError(
            f"sample {index} [{off}, {off + size}) extends past blob end"
        )
    return blob[off : off + size]


def sample_video_frames_from_blobs(
    df: DataFrame,
    every_n_seconds: float,
    content_col: str = "content",
    id_col: str = "media_id",
    keyframes_only: bool = False,
) -> DataFrame:
    """(media_id, sample_index, timestamp_s, is_sync) rows sampled against
    each blob's REAL sample table (stts/stss), one Arrow map pass, zero
    shuffle. Blobs that do not parse as MP4 (or carry no video track)
    emit ONE row with NULL sample fields — the same reject-to-NULL-stream
    convention as the multimodal decoders, so corrupt inputs are
    observable rather than silently dropped."""
    if every_n_seconds <= 0:
        raise ValueError("every_n_seconds must be > 0")
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment; the parser is too large to inline by value
        import pandas as _pd

        from apache_pinot_spark.operators.mp4 import choose_samples, parse_mp4

        for pdf in batches:
            ids, idxs, ts, sync = [], [], [], []
            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    info = parse_mp4(bytes(blob) if blob is not None else None)
                    vts = info.video_tracks
                    if not vts:
                        raise ValueError("no video track")
                    picks = choose_samples(vts[0], every_n_seconds, keyframes_only)
                except Exception:
                    ids.append(mid); idxs.append(None); ts.append(None)
                    sync.append(None)
                    continue
                for i, t, s in picks:
                    ids.append(mid); idxs.append(i); ts.append(t); sync.append(s)
            yield _pd.DataFrame(
                {"id": ids, "sample_index": idxs, "timestamp_s": ts,
                 "is_sync": sync}
            )

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, sample_index INT, timestamp_s DOUBLE, "
               "is_sync BOOLEAN",
    )
    return out.withColumnRenamed("id", id_col)


def sample_mp4_frames(
    df: DataFrame,
    every_n_seconds: float,
    content_col: str = "content",
    id_col: str = "media_id",
    keyframes_only: bool = False,
    decode: bool = True,
) -> DataFrame:
    """(media_id, sample_index, timestamp_s, is_sync, height, width,
    mean_luma) — the r10 payload tier: picks samples against the blob's
    REAL stts/stss tables (as sample_video_frames_from_blobs does), then
    resolves each pick to its actual bytes via the stsc/stco/co64/stsz
    chunk map and decodes the frame: JPEG-coded tracks (stsd
    'jpeg'/'mjpa'/...) with the repo's pure-Python baseline-JPEG
    decoder, H.264 tracks ('avc1'/'avc3' with an avcC record, r11) with
    the repo's baseline intra decoder (operators/h264 — IDR keyframes,
    exactly the samples keyframes_only picks; non-IDR picks keep their
    index/timestamp with NULL pixel stats). mean_luma = mean of the
    decoded frame's luma/channel average, a deterministic content
    fingerprint — the exact shape operators/avi.sample_avi_frames
    provides for MJPEG-in-AVI.

    One Arrow map pass, zero shuffle; only the PICKED samples' byte
    ranges are sliced — never the whole mdat. Non-MP4 / chunk-map-less /
    other-codec-track (when decode=True) / corrupt blobs emit ONE
    all-NULL row (the multimodal reject convention); a picked frame
    whose bytes fail decode keeps its index/timestamp with NULL pixel
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

        from apache_pinot_spark.operators.h264 import decode_h264_avcc_sample
        from apache_pinot_spark.operators.jpeg_codec import decode_jpeg
        from apache_pinot_spark.operators.mp4 import (
            JPEG_FORMATS,
            choose_samples,
            parse_mp4,
            sample_bytes,
            sample_locations,
        )

        for pdf in batches:
            out = {k: [] for k in
                   ("id", "sample_index", "timestamp_s", "is_sync",
                    "height", "width", "mean_luma")}

            def emit(mid, idx=None, ts=None, sync=None, h=None, w=None,
                     luma=None):
                out["id"].append(mid)
                out["sample_index"].append(idx)
                out["timestamp_s"].append(ts)
                out["is_sync"].append(sync)
                out["height"].append(h)
                out["width"].append(w)
                out["mean_luma"].append(luma)

            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    data = bytes(blob) if blob is not None else None
                    info = parse_mp4(data)
                    vts = info.video_tracks
                    if not vts:
                        raise ValueError("no video track")
                    trk = vts[0]
                    picks = choose_samples(trk, every_n_seconds,
                                           keyframes_only)
                    locs = sample_locations(trk)
                    is_avc = trk.format in ("avc1", "avc3") and trk.avcc
                    if decode and trk.format not in JPEG_FORMATS \
                            and not is_avc:
                        raise ValueError(
                            f"decode requested for undecodable track "
                            f"({trk.format!r})"
                        )
                except Exception:
                    emit(mid)
                    continue
                for idx, ts, sync in picks:
                    h = w = luma = None
                    if decode:
                        try:
                            raw = sample_bytes(data, locs, idx)
                            if is_avc:
                                yp, _, _ = decode_h264_avcc_sample(
                                    trk.avcc, raw)
                                img = yp
                            else:
                                img = decode_jpeg(raw)
                        except Exception:
                            img = None
                        if img is not None:
                            h, w = int(img.shape[0]), int(img.shape[1])
                            luma = float(img.astype("float64").mean())
                    emit(mid, idx, ts, sync, h, w, luma)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, sample_index INT, timestamp_s DOUBLE, "
               "is_sync BOOLEAN, height INT, width INT, mean_luma DOUBLE",
    )
    return out.withColumnRenamed("id", id_col)


def mp4_video_stats(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, format, width, height, duration_s, n_samples,
    keyframe_ratio, total_sample_bytes, bitrate_bps) per blob — the
    resolution/bitrate/keyframe audit columns a video-curation pipeline
    filters on BEFORE committing to any frame decode (e.g. drop
    sub-360p, cap bitrate outliers, require seekable keyframe density).
    All values come from the container tables (tkhd-free: stsd coded
    size, stts duration, stss density, stsz byte sums) — no payload
    read. One Arrow map pass, zero shuffle; corrupt blobs emit ONE
    all-NULL row (the multimodal reject convention)."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.mp4 import parse_mp4

        cols = ("id", "format", "width", "height", "duration_s",
                "n_samples", "keyframe_ratio", "total_sample_bytes",
                "bitrate_bps")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    info = parse_mp4(bytes(blob) if blob is not None else None)
                    vts = info.video_tracks
                    if not vts:
                        raise ValueError("no video track")
                    trk = vts[0]
                    if trk.timescale <= 0 or trk.sample_count <= 0:
                        raise ValueError("video track carries no samples")
                    dur = trk.duration / trk.timescale
                    n = trk.sample_count
                    kf = (len(trk.stss) if trk.stss is not None else n) / n
                    if trk.stsz_const:
                        total_bytes = trk.stsz_const * n
                    elif trk.stsz is not None:
                        total_bytes = sum(trk.stsz[:n])
                    else:
                        total_bytes = None
                    bitrate = (total_bytes * 8.0 / dur
                               if total_bytes is not None and dur > 0 else None)
                except Exception:
                    out["id"].append(mid)
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                out["id"].append(mid)
                out["format"].append(trk.format or None)
                out["width"].append(trk.width or None)
                out["height"].append(trk.height or None)
                out["duration_s"].append(dur)
                out["n_samples"].append(n)
                out["keyframe_ratio"].append(kf)
                out["total_sample_bytes"].append(total_bytes)
                out["bitrate_bps"].append(bitrate)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, format STRING, width INT, height INT, "
               "duration_s DOUBLE, n_samples INT, keyframe_ratio DOUBLE, "
               "total_sample_bytes BIGINT, bitrate_bps DOUBLE",
    )
    return out.withColumnRenamed("id", id_col)
