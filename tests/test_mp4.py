"""MP4 container parsing (operators/mp4.py): hand-assembled golden
fixtures per ISO/IEC 14496-12 box layouts — sampled timestamps must come
from the blob's REAL stts sample table; corrupt blobs reject to the NULL
stream."""

from __future__ import annotations

import struct

import pytest

from apache_pinot_spark.operators import mp4 as M


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(version: int = 0, flags: int = 0) -> bytes:
    return struct.pack(">B3s", version, flags.to_bytes(3, "big"))


def _mvhd(timescale: int, duration: int) -> bytes:
    return _box(
        b"mvhd",
        _full() + struct.pack(">IIII", 0, 0, timescale, duration) + b"\x00" * 80,
    )


def _mdhd(timescale: int, duration: int) -> bytes:
    return _box(
        b"mdhd",
        _full() + struct.pack(">IIII", 0, 0, timescale, duration) + b"\x00" * 4,
    )


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", _full() + b"\x00" * 4 + handler + b"\x00" * 12)


def _stts(entries) -> bytes:
    body = _full() + struct.pack(">I", len(entries))
    for cnt, delta in entries:
        body += struct.pack(">II", cnt, delta)
    return _box(b"stts", body)


def _stss(samples) -> bytes:
    body = _full() + struct.pack(">I", len(samples))
    for s in samples:
        body += struct.pack(">I", s)
    return _box(b"stss", body)


def _golden(stts_entries, stss=None, mts=1000, mdur=1100) -> bytes:
    stbl = _stts(stts_entries) + (_stss(stss) if stss is not None else b"")
    trak = _box(
        b"trak",
        _box(
            b"mdia",
            _mdhd(mts, mdur) + _hdlr(b"vide") + _box(b"minf", _box(b"stbl", stbl)),
        ),
    )
    moov = _box(b"moov", _mvhd(600, 660) + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


GOLDEN_STTS = [(5, 100), (3, 200)]  # times 0,.1,.2,.3,.4,.5,.7,.9 @ ts=1000


def test_parse_golden_sample_table():
    info = M.parse_mp4(_golden(GOLDEN_STTS, stss=[1, 6]))
    assert info.timescale == 600 and info.duration == 660
    (trk,) = info.video_tracks
    assert trk.timescale == 1000 and trk.duration == 1100
    assert trk.sample_count == 8
    assert M.sample_times(trk) == [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.7, 0.9]
    assert trk.stss == [1, 6]


def test_choose_samples_seek_semantics():
    (trk,) = M.parse_mp4(_golden(GOLDEN_STTS, stss=[1, 6])).video_tracks
    picks = M.choose_samples(trk, 0.25)
    # targets 0,.25,.5,.75,1.0 → last sample with dts <= target
    assert picks == [
        (0, 0.0, True), (2, 0.2, False), (5, 0.5, True),
        (6, 0.7, False), (7, 0.9, False),
    ]
    # keyframe snapping: only sync samples 1 and 6 (idx 0 and 5) survive
    assert M.choose_samples(trk, 0.25, keyframes_only=True) == [
        (0, 0.0, True), (5, 0.5, True),
    ]


def test_no_stss_means_all_sync():
    (trk,) = M.parse_mp4(_golden(GOLDEN_STTS)).video_tracks
    assert trk.stss is None
    assert all(s for _, _, s in M.choose_samples(trk, 0.25))


def test_corrupt_blobs_raise():
    with pytest.raises(ValueError, match="too short"):
        M.parse_mp4(b"\x00\x01")
    with pytest.raises(ValueError, match="no moov"):
        M.parse_mp4(_box(b"ftyp", b"isom") + _box(b"free", b"\x00" * 8))
    # box size overrunning its scope
    bad = bytearray(_golden(GOLDEN_STTS))
    bad[0:4] = struct.pack(">I", len(bad) + 64)
    with pytest.raises(ValueError, match="overruns"):
        M.parse_mp4(bytes(bad))


def test_spark_operator_real_table_and_null_stream(spark):
    good = _golden(GOLDEN_STTS, stss=[1, 6])
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"not an mp4 at all, definitely")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    out = M.sample_video_frames_from_blobs(df, 0.25).orderBy(
        "media_id", "sample_index"
    )
    got = [(r.media_id, r.sample_index, r.timestamp_s, r.is_sync)
           for r in out.collect()]
    assert got[:5] == [
        (1, 0, 0.0, True), (1, 2, 0.2, False), (1, 5, 0.5, True),
        (1, 6, 0.7, False), (1, 7, 0.9, False),
    ]
    # corrupt + NULL blobs reject to one NULL row each
    assert got[5:] == [(2, None, None, None), (3, None, None, None)]
    # plan: Arrow-batched map pass, no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_largesize_and_version1_boxes():
    # version-1 mvhd/mdhd (64-bit durations) + a largesize moov wrapper
    mvhd = _box(
        b"mvhd",
        _full(1) + struct.pack(">QQIQ", 0, 0, 600, 660) + b"\x00" * 80,
    )
    mdhd = _box(
        b"mdhd",
        _full(1) + struct.pack(">QQIQ", 0, 0, 1000, 1100) + b"\x00" * 4,
    )
    stbl = _stts(GOLDEN_STTS)
    trak = _box(
        b"trak",
        _box(b"mdia", mdhd + _hdlr(b"vide") + _box(b"minf", _box(b"stbl", stbl))),
    )
    inner = mvhd + trak
    moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(inner)) + inner
    blob = _box(b"ftyp", b"isom" + struct.pack(">I", 512)) + moov
    info = M.parse_mp4(blob)
    assert info.timescale == 600 and info.duration == 660
    (trk,) = info.video_tracks
    assert trk.timescale == 1000 and trk.duration == 1100


# --- untrusted-field hardening (ADVICE r9): corrupt container fields must
# not drive unbounded executor work (OOM / stage hang) ---------------------


def test_stts_sample_count_lie_rejects():
    # a tiny blob claiming ~4.3e9 samples: one stts run with u32-max count.
    # Materializing per-sample state would OOM the worker; the parser must
    # reject at the field read instead.
    blob = _golden([(0xFFFFFFFF, 100)])
    with pytest.raises(ValueError, match="stts claims"):
        M.parse_mp4(blob)
    # sum-of-runs lie (each run small, total huge) rejects too
    blob2 = _golden([(1000, 1)] * 4)
    with pytest.raises(ValueError, match="stts claims"):
        M.parse_mp4(blob2)


def test_huge_mdhd_duration_bounded_work():
    # version-1 mdhd u64 duration ~3.5e13 ticks with every_n=0.001 s would
    # be ~3.5e13 target instants under per-instant iteration; the pick loop
    # must jump per-sample and finish instantly with the same semantics.
    import time as _time

    mdhd = _box(
        b"mdhd",
        _full(1) + struct.pack(">QQIQ", 0, 0, 1000, 2**45) + b"\x00" * 4,
    )
    stbl = _stts(GOLDEN_STTS) + _stss([1, 6])
    trak = _box(
        b"trak",
        _box(b"mdia", mdhd + _hdlr(b"vide") + _box(b"minf", _box(b"stbl", stbl))),
    )
    blob = (
        _box(b"ftyp", b"isom" + struct.pack(">I", 512))
        + _box(b"moov", _mvhd(600, 660) + trak)
    )
    (trk,) = M.parse_mp4(blob).video_tracks
    assert trk.duration == 2**45
    t0 = _time.monotonic()
    picks = M.choose_samples(trk, 0.001)
    kf = M.choose_samples(trk, 0.001, keyframes_only=True)
    elapsed = _time.monotonic() - t0
    assert elapsed < 2.0, f"pick loop not bounded: {elapsed:.1f}s"
    # semantics preserved: every sample is reachable at 1 ms grid
    assert [i for i, _, _ in picks] == list(range(8))
    assert [i for i, _, _ in kf] == [0, 5]  # only sync samples 1 and 6


def test_choose_samples_matches_naive_reference():
    # jump-based loop must be pick-for-pick identical to the per-instant
    # reference on an honest track (regression pin for the r10 rewrite)
    (trk,) = M.parse_mp4(_golden(GOLDEN_STTS, stss=[1, 6])).video_tracks
    times = M.sample_times(trk)
    for e in (0.05, 0.13, 0.25, 0.4, 1.0):
        for kf in (False, True):
            sync = set(trk.stss) if trk.stss else set(range(1, 9))
            ref, k, last = [], 0, -1
            while True:
                target = k * e
                if target > trk.duration / trk.timescale:
                    break
                idx = max(i for i, t in enumerate(times) if t <= target)
                if kf:
                    while idx > 0 and (idx + 1) not in sync:
                        idx -= 1
                if idx != last:
                    ref.append((idx, times[idx], (idx + 1) in sync))
                    last = idx
                k += 1
            assert M.choose_samples(trk, e, keyframes_only=kf) == ref, (e, kf)


# --- r10 payload tier: stsc/stco/co64/stsz/stsd -> real frame bytes -------


def _stsd(fmt: bytes) -> bytes:
    entry = struct.pack(">I", 16) + fmt + b"\x00" * 6 + struct.pack(">H", 1)
    return _box(b"stsd", _full() + struct.pack(">I", 1) + entry)


def _stsz(sizes, const: int = 0) -> bytes:
    body = _full() + struct.pack(">II", const, len(sizes))
    if const == 0:
        for s in sizes:
            body += struct.pack(">I", s)
    return _box(b"stsz", body)


def _stsc(entries) -> bytes:
    body = _full() + struct.pack(">I", len(entries))
    for first, spc in entries:
        body += struct.pack(">III", first, spc, 1)
    return _box(b"stsc", body)


def _stco(offsets, wide: bool = False) -> bytes:
    fmt, btype = (">Q", b"co64") if wide else (">I", b"stco")
    body = _full() + struct.pack(">I", len(offsets))
    for o in offsets:
        body += struct.pack(fmt, o)
    return _box(btype, body)


def _jpeg_frames(n=4, h=8, w=8):
    import numpy as np

    from apache_pinot_spark.operators import jpeg_codec as J

    return [J.encode_jpeg(np.full((h, w), 24 * i + 10, dtype=np.uint8))
            for i in range(n)]


def _stsd_avc1(avcc: bytes, w: int = 16, h: int = 16) -> bytes:
    """Proper 86-byte VisualSampleEntry ('avc1') + avcC child box."""
    vse = (b"avc1" + b"\x00" * 6 + struct.pack(">H", 1)
           + b"\x00" * 16
           + struct.pack(">HH", w, h)
           + struct.pack(">II", 0x00480000, 0x00480000)
           + b"\x00" * 4 + struct.pack(">H", 1)
           + b"\x00" * 32
           + struct.pack(">H", 24) + struct.pack(">h", -1))
    entry = _box(b"avc1", vse[4:] + _box(b"avcC", avcc))
    return _box(b"stsd", _full() + struct.pack(">I", 1) + entry)


def _mp4_with_payload(frames, stts_entries, fmt=b"jpeg", stss=None,
                      chunking=None, wide_offsets=False, mts=1000,
                      stsd_box=None):
    """Assemble ftyp+moov+mdat with REAL payload bytes and a correct
    chunk map. chunking = list of samples-per-chunk (default: one chunk
    holding all frames). Returns the blob."""
    chunking = chunking or [len(frames)]
    assert sum(chunking) == len(frames)
    sizes = [len(f) for f in frames]
    # stsc runs: collapse consecutive equal samples-per-chunk
    stsc_entries, chunk_first = [], 1
    for i, spc in enumerate(chunking):
        if not stsc_entries or stsc_entries[-1][1] != spc:
            stsc_entries.append((chunk_first, spc))
        chunk_first += 1
    mdur = sum(c * d for c, d in stts_entries)

    def build(offsets):
        stbl = (
            (stsd_box if stsd_box is not None else _stsd(fmt))
            + _stts(stts_entries)
            + (_stss(stss) if stss is not None else b"")
            + _stsc(stsc_entries) + _stsz(sizes)
            + _stco(offsets, wide=wide_offsets)
        )
        trak = _box(
            b"trak",
            _box(b"mdia", _mdhd(mts, mdur) + _hdlr(b"vide")
                 + _box(b"minf", _box(b"stbl", stbl))),
        )
        moov = _box(b"moov", _mvhd(600, 660) + trak)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        mdat = _box(b"mdat", b"".join(frames))
        return ftyp + moov + mdat

    # two-pass: placeholder offsets fix the moov size, then fill real ones
    placeholder = build([0] * len(chunking))
    mdat_body = placeholder.index(b"mdat", len(placeholder) - 8
                                  - sum(sizes) - 8) + 4
    offsets, si, off = [], 0, mdat_body
    for spc in chunking:
        offsets.append(off)
        off += sum(sizes[si : si + spc])
        si += spc
    blob = build(offsets)
    assert len(blob) == len(placeholder)
    return blob


def test_payload_roundtrip_single_chunk():
    frames = _jpeg_frames(4)
    blob = _mp4_with_payload(frames, [(4, 250)])
    (trk,) = M.parse_mp4(blob).video_tracks
    assert trk.format == "jpeg" and trk.stsz == [len(f) for f in frames]
    locs = M.sample_locations(trk)
    assert len(locs) == 4
    for i, f in enumerate(frames):
        assert M.sample_bytes(blob, locs, i) == f


def test_payload_roundtrip_multi_chunk_and_co64():
    frames = _jpeg_frames(6)
    for wide in (False, True):
        blob = _mp4_with_payload(
            frames, [(6, 100)], chunking=[2, 2, 1, 1], wide_offsets=wide)
        (trk,) = M.parse_mp4(blob).video_tracks
        assert len(trk.chunk_offsets) == 4
        locs = M.sample_locations(trk)
        for i, f in enumerate(frames):
            assert M.sample_bytes(blob, locs, i) == f


def test_payload_constant_size_shortcut():
    # stsz with a constant sample size and NO per-sample table
    frames = [b"A" * 32, b"B" * 32, b"C" * 32]
    blob = _mp4_with_payload(frames, [(3, 100)])
    # rewrite stsz to const form: locate the box, set const=32, keep count
    pos = blob.index(b"stsz") + 4 + 4  # past fourcc + fullbox header
    patched = bytearray(blob)
    patched[pos : pos + 4] = struct.pack(">I", 32)
    (trk,) = M.parse_mp4(bytes(patched)).video_tracks
    assert trk.stsz_const == 32
    locs = M.sample_locations(trk)
    for i, f in enumerate(frames):
        assert M.sample_bytes(bytes(patched), locs, i) == f


def test_corrupt_chunk_map_rejects():
    frames = _jpeg_frames(3)
    blob = _mp4_with_payload(frames, [(3, 100)])
    (trk,) = M.parse_mp4(blob).video_tracks
    # stco offset pointing past EOF -> extraction rejects that sample
    trk2 = M.parse_mp4(blob).video_tracks[0]
    trk2.chunk_offsets = [len(blob) + 1000]
    locs = M.sample_locations(trk2)
    with pytest.raises(ValueError, match="past blob end"):
        M.sample_bytes(blob, locs, 0)
    # stsc first_chunk outside the stco table -> ValueError
    trk3 = M.parse_mp4(blob).video_tracks[0]
    trk3.stsc = [(5, 3)]
    with pytest.raises(ValueError, match="outside the stco"):
        M.sample_locations(trk3)
    # lying stsc samples_per_chunk (2^32) cannot drive unbounded work:
    # the walk is capped at sample_count
    trk4 = M.parse_mp4(blob).video_tracks[0]
    trk4.stsc = [(1, 0xFFFFFFFF)]
    assert len(M.sample_locations(trk4)) == 3
    # chunk map that covers fewer samples than stts declares
    trk5 = M.parse_mp4(blob).video_tracks[0]
    trk5.stsc = [(1, 1)]  # 1 chunk x 1 sample < 3 samples
    with pytest.raises(ValueError, match="fewer samples"):
        M.sample_locations(trk5)


def test_spark_decode_operator_matches_avi_shape(spark):
    import numpy as np

    from apache_pinot_spark.operators import jpeg_codec as J

    lumas = [10, 90, 170, 250]
    frames = [J.encode_jpeg(np.full((8, 8), v, dtype=np.uint8))
              for v in lumas]
    good = _mp4_with_payload(frames, [(4, 250)], stss=[1, 3])  # 1 fps
    nonjpeg = _mp4_with_payload(frames, [(4, 250)], fmt=b"avc1")
    corrupt_off = bytearray(good)
    pos = good.index(b"stco") + 4 + 4 + 4  # fourcc, fullbox, count
    corrupt_off[pos : pos + 4] = struct.pack(">I", len(good) + 99)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(nonjpeg)),       # parses; decode requested -> reject
        (3, corrupt_off),              # picks resolve; bytes reject -> NULL stats
        (4, bytearray(b"not an mp4")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    out = M.sample_mp4_frames(df, 0.25).orderBy("media_id", "sample_index")
    got = [(r.media_id, r.sample_index, r.is_sync, r.height, r.width,
            r.mean_luma) for r in out.collect()]
    good_rows = [g for g in got if g[0] == 1]
    assert [g[1] for g in good_rows] == [0, 1, 2, 3]
    assert [g[2] for g in good_rows] == [True, False, True, False]
    assert all(g[3] == 8 and g[4] == 8 for g in good_rows)
    # decoded luma tracks the encoder input (JPEG is lossy; stay loose)
    for g, v in zip(good_rows, lumas):
        assert abs(g[5] - v) < 6.0, (g, v)
    assert [g for g in got if g[0] == 2] == [(2, None, None, None, None, None)]
    # corrupt stco: sampling still works (stts intact), pixel stats NULL
    c3 = [g for g in got if g[0] == 3]
    assert [g[1] for g in c3] == [0, 1, 2, 3]
    assert all(g[3] is None and g[5] is None for g in c3)
    assert [g for g in got if g[0] in (4, 5)] == [
        (4, None, None, None, None, None), (5, None, None, None, None, None)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_payload_mutation_property():
    # single-byte mutations anywhere in the container: parse/locate/
    # extract either succeed or raise ValueError — never hang, never
    # return bytes outside the blob
    import random

    frames = _jpeg_frames(3)
    blob = _mp4_with_payload(frames, [(3, 100)], chunking=[2, 1])
    rng = random.Random(1310)
    for _ in range(300):
        mut = bytearray(blob)
        pos = rng.randrange(len(mut))
        mut[pos] = rng.randrange(256)
        try:
            info = M.parse_mp4(bytes(mut))
            for trk in info.video_tracks:
                locs = M.sample_locations(trk)
                for i in range(min(len(locs), trk.sample_count)):
                    got = M.sample_bytes(bytes(mut), locs, i)
                    off, size = locs[i]
                    assert 0 <= off and off + size <= len(mut)
                    assert len(got) == size
        except ValueError:
            pass


# --- r10: container-level video stats (resolution / bitrate / keyframes) --


def _stsd_visual(fmt: bytes, w: int, h: int) -> bytes:
    # VisualSampleEntry: box hdr(8) + SampleEntry(6 reserved + 2 dri)
    # + pre_defined(2)+reserved(2)+pre_defined(12) + width(2)+height(2)
    body = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
            + struct.pack(">HH", w, h) + b"\x00" * 40)
    entry = struct.pack(">I", 8 + len(body)) + fmt + body
    return _box(b"stsd", _full() + struct.pack(">I", 1) + entry)


def test_video_stats_operator(spark):
    frames = _jpeg_frames(4)
    good = _mp4_with_payload(frames, [(4, 250)], stss=[1, 3])
    # splice in a visual sample entry carrying 640x360
    pos = good.index(b"stsd") - 4
    old_len = struct.unpack_from(">I", good, pos)[0]
    new_stsd = _stsd_visual(b"jpeg", 640, 360)
    patched = bytearray(good[:pos]) + bytearray(new_stsd) + bytearray(
        good[pos + old_len:])
    # fix enclosing box sizes (stbl, minf, mdia, trak, moov grew)
    delta = len(new_stsd) - old_len
    for marker in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        mpos = patched.index(marker) - 4
        sz = struct.unpack_from(">I", bytes(patched), mpos)[0]
        patched[mpos : mpos + 4] = struct.pack(">I", sz + delta)
    (trk,) = M.parse_mp4(bytes(patched)).video_tracks
    assert (trk.width, trk.height) == (640, 360)

    rows = [(1, patched), (2, bytearray(b"garbage not mp4")), (3, None)]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    got = {r.media_id: r for r in M.mp4_video_stats(df).collect()}
    r1 = got[1]
    assert (r1.format, r1.width, r1.height) == ("jpeg", 640, 360)
    assert r1.n_samples == 4 and r1.keyframe_ratio == pytest.approx(0.5)
    assert r1.duration_s == pytest.approx(1.0)  # 4 x 250 ticks @ ts=1000
    assert r1.total_sample_bytes == sum(len(f) for f in frames)
    assert r1.bitrate_bps == pytest.approx(r1.total_sample_bytes * 8 / 1.0)
    assert got[2].format is None and got[3].format is None


def test_avc1_track_decodes_idr_keyframes(spark):
    """r11: an 'avc1' track with an avcC record decodes its picked IDR
    samples through operators/h264 — mean_luma equals the encoder
    reconstruction's luma mean EXACTLY (both sides run the same dequant
    path), the shape the JPEG tier established."""
    import numpy as np

    from apache_pinot_spark.operators import h264 as H

    lumas = [20, 120, 220]
    samples, recons, avcc = [], [], None
    for v in lumas:
        y = np.full((16, 16), v, np.uint8)
        cbp = np.full((8, 8), 100, np.uint8)
        crp = np.full((8, 8), 140, np.uint8)
        ann, recon = H.encode_h264_annexb(y, cbp, crp, qp=20)
        nals = list(H.parse_annexb(ann))
        sps = next(r for _, t, r in nals if t == 7)
        pps = next(r for _, t, r in nals if t == 8)
        idr = next(r for _, t, r in nals if t == 5)
        avcc = H.build_avcc(sps, pps)
        nal = bytes([0x65]) + H._escape_rbsp(idr)
        samples.append(len(nal).to_bytes(4, "big") + nal)
        recons.append(recon)
    blob = _mp4_with_payload(samples, [(3, 500)],
                             stsd_box=_stsd_avc1(avcc, 16, 16))
    (trk,) = M.parse_mp4(blob).video_tracks
    assert trk.format == "avc1" and trk.avcc == avcc
    assert trk.width == 16 and trk.height == 16
    # direct slice + decode
    locs = M.sample_locations(trk)
    dy, _, _ = H.decode_h264_avcc_sample(avcc, M.sample_bytes(blob, locs, 1))
    assert np.array_equal(dy, recons[1][0])
    # Spark operator end to end
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id LONG, content BINARY")
    rows = M.sample_mp4_frames(df, 0.5).orderBy("sample_index").collect()
    assert [r.sample_index for r in rows] == [0, 1, 2]
    for r, recon in zip(rows, recons):
        assert (r.height, r.width) == (16, 16)
        assert r.mean_luma == pytest.approx(
            float(recon[0].astype(np.float64).mean()))
    # a corrupt sample keeps its index/timestamp with NULL pixel stats
    mut = bytearray(blob)
    locs = M.sample_locations(trk)
    off, size = locs[2]
    mut[off + 10] ^= 0xFF
    df2 = spark.createDataFrame([(1, bytearray(bytes(mut)))],
                                "media_id LONG, content BINARY")
    rows2 = M.sample_mp4_frames(df2, 0.5).orderBy("sample_index").collect()
    assert rows2[0].mean_luma is not None
