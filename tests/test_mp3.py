"""MPEG audio frame-header walk (operators/mp3.py): hand-assembled
frames per the public ISO/IEC 11172-3 header layout — CBR duration,
Xing VBR accounting, ID3 tag skipping, reject paths, and the Spark
stats operator."""

from __future__ import annotations

import pytest

from apache_pinot_spark.operators import mp3 as M


def _header(version=3, layer=1, br_idx=9, sr_idx=0, padding=0, mode=0):
    # version code: 3=MPEG1, 2=MPEG2, 0=MPEG2.5; layer code: 1=III, 3=I
    h = (0x7FF << 21) | (version << 19) | (layer << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (padding << 9) | (mode << 6)
    return h.to_bytes(4, "big")


def _frame(version=3, layer=1, br_idx=9, sr_idx=0, padding=0, mode=0,
           fill=b"\x00"):
    hdr = _header(version, layer, br_idx, sr_idx, padding, mode)
    f = M._parse_header(hdr + b"\x00" * 8, 0)
    return hdr + fill * (f.size - 4)


def test_cbr_stream_stats():
    # MPEG1 Layer III, 128 kbps (index 9), 44100 Hz, stereo:
    # frame size = 144*128000/44100 = 417 bytes, 1152 samples/frame
    blob = b"".join(_frame() for _ in range(10))
    info = M.parse_mp3(blob)
    f0 = info.frames[0]
    assert (f0.version, f0.layer, f0.bitrate_kbps, f0.sample_rate,
            f0.mode, f0.size, f0.samples) == (
        "1", 3, 128, 44100, "stereo", 417, 1152)
    assert info.n_frames == 10 and not info.is_vbr
    assert info.duration_s == pytest.approx(10 * 1152 / 44100)
    assert info.avg_bitrate_kbps == pytest.approx(128.0)


def test_layer_and_version_grid():
    # Layer I MPEG1 (code 3): size = (12*bitrate/sr + pad)*4, 384 samples
    info = M.parse_mp3(_frame(layer=3, br_idx=9, sr_idx=1))  # 288kbps@48k
    f = info.frames[0]
    assert f.layer == 1 and f.samples == 384 and f.size == (12 * 288000 // 48000) * 4
    # MPEG2 Layer III (half-rate granule): 576 samples, 72*br/sr
    info = M.parse_mp3(_frame(version=2, br_idx=5, sr_idx=0))  # 40kbps@22050
    f = info.frames[0]
    assert f.version == "2" and f.samples == 576 and f.size == 72 * 40000 // 22050
    # MPEG2.5 sample-rate table
    info = M.parse_mp3(_frame(version=0, br_idx=5, sr_idx=2))
    assert info.frames[0].sample_rate == 8000
    # padding adds one byte
    a = M.parse_mp3(_frame(padding=0)).frames[0].size
    b = M.parse_mp3(_frame(padding=1)).frames[0].size
    assert b == a + 1


def test_xing_vbr_header():
    # Xing at MPEG1-stereo offset 4+32; flags=frames|bytes
    first = bytearray(_frame())
    xo = 4 + 32
    first[xo : xo + 4] = b"Xing"
    first[xo + 4 : xo + 8] = (0x3).to_bytes(4, "big")
    first[xo + 8 : xo + 12] = (250).to_bytes(4, "big")   # frames
    first[xo + 12 : xo + 16] = (130625).to_bytes(4, "big")  # bytes
    blob = bytes(first) + _frame(br_idx=5) + _frame(br_idx=12)
    info = M.parse_mp3(blob)
    assert info.xing_frames == 250 and info.is_vbr
    assert info.n_frames == 250
    assert info.duration_s == pytest.approx(250 * 1152 / 44100)
    assert info.avg_bitrate_kbps == pytest.approx(
        130625 * 8 / (info.duration_s * 1000), rel=1e-9)


def test_id3_tags_skipped():
    frames = b"".join(_frame() for _ in range(3))
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    id3v1 = b"TAG" + b"\x00" * 125
    info = M.parse_mp3(id3v2 + frames + id3v1)
    assert info.has_id3v2 and info.has_id3v1 and len(info.frames) == 3


def test_reject_paths():
    with pytest.raises(ValueError, match="too short"):
        M.parse_mp3(b"\xff\xfb")
    with pytest.raises(ValueError, match="no frame sync"):
        M.parse_mp3(b"JUNKJUNKJUNKJUNK" * 10)
    with pytest.raises(ValueError, match="free-format"):
        M.parse_mp3(_header(br_idx=0) + b"\x00" * 400)
    with pytest.raises(ValueError, match="overruns"):
        M.parse_mp3(_frame()[:-5])
    # garbage between frames rejects (no silent resync)
    with pytest.raises(ValueError, match="no frame sync"):
        M.parse_mp3(_frame() + b"\x00gap" + _frame())
    # mid-stream rate change rejects
    with pytest.raises(ValueError, match="mid-stream"):
        M.parse_mp3(_frame(sr_idx=0) + _frame(sr_idx=1))
    # lying ID3v2 size consuming the whole blob
    with pytest.raises(ValueError, match="no audio frames"):
        M.parse_mp3(b"ID3\x04\x00\x00" + bytes([0x7F] * 4) + b"\x00" * 50)


def test_spark_operator(spark):
    cbr = b"".join(_frame() for _ in range(5))
    rows = [(1, bytearray(cbr)), (2, bytearray(b"not mpeg")), (3, None)]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    out = M.mp3_stream_stats(df).orderBy("media_id")
    got = {r.media_id: r for r in out.collect()}
    assert got[1].version == "1" and got[1].layer == 3
    assert got[1].n_frames == 5 and got[1].sample_rate == 44100
    assert got[1].duration_s == pytest.approx(5 * 1152 / 44100)
    assert not got[1].is_vbr
    assert got[2].version is None and got[3].version is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_mutation_property_bounded():
    import random

    blob = b"".join(_frame() for _ in range(6))
    rng = random.Random(424)
    for _ in range(250):
        mut = bytearray(blob)
        mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            info = M.parse_mp3(bytes(mut))
            assert 1 <= len(info.frames) <= 6
        except ValueError:
            pass


def test_xing_header_with_crc_protection():
    """r11 ADVICE fix: protection bit 0 puts a 2-byte CRC between the
    header and the side info — the Xing/Info tag shifts by 2 and must
    still be found."""
    hdr = bytearray(_header())
    hdr[1] &= 0xFE  # protection bit 0 => CRC-16 present
    f = M._parse_header(bytes(hdr) + b"\x00" * 8, 0)
    first = bytearray(bytes(hdr) + b"\x00" * (f.size - 4))
    xo = 4 + 2 + 32  # header + CRC + MPEG1-stereo side info
    first[xo : xo + 4] = b"Xing"
    first[xo + 4 : xo + 8] = (0x3).to_bytes(4, "big")
    first[xo + 8 : xo + 12] = (99).to_bytes(4, "big")
    first[xo + 12 : xo + 16] = (51348).to_bytes(4, "big")
    blob = bytes(first) + _frame(br_idx=5)
    info = M.parse_mp3(blob)
    assert info.xing_frames == 99 and info.is_vbr
    # an UNprotected stream must not shift: the original placement test
    # (test_xing_vbr_header) still reads at 4+32 — re-assert here that a
    # protected-stream offset miss does not false-positive
    assert info.n_frames == 99
