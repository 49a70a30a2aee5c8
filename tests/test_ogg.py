"""Ogg/Opus/Vorbis container tier (operators/ogg.py): hand-built pages
per RFC 3533 grammar, the page CRC cross-checked against an independent
bit-by-bit derivation of the polynomial, Opus/Vorbis duration math,
reject paths, a 100%-reject mutation property (the page CRC covers every
byte), and the Spark operator."""

from __future__ import annotations

import random

import pytest

from apache_pinot_spark.operators import ogg as O


def _page(serial, seq, granule, body, flags=0):
    seglist, l = [], len(body)
    while l >= 255:
        seglist.append(255)
        l -= 255
    seglist.append(l)
    hdr = (b"OggS" + bytes([0, flags])
           + granule.to_bytes(8, "little", signed=True)
           + serial.to_bytes(4, "little") + seq.to_bytes(4, "little")
           + b"\x00" * 4 + bytes([len(seglist)]) + bytes(seglist))
    full = bytearray(hdr + body)
    full[22:26] = O.ogg_crc(bytes(full)).to_bytes(4, "little")
    return bytes(full)


def _opus_head(channels=2, pre_skip=312, rate=48000):
    return (b"OpusHead" + bytes([1, channels])
            + pre_skip.to_bytes(2, "little") + rate.to_bytes(4, "little")
            + b"\x00\x00" + bytes([0]))


def _vorbis_id(channels=1, rate=44100):
    return (b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([channels])
            + rate.to_bytes(4, "little") + b"\x00" * 12
            + bytes([0xB8]) + bytes([0x01]))


def _opus_file(n_audio_pages=3, final_granule=48000 + 312, serial=7):
    pages = [_page(serial, 0, 0, _opus_head(), flags=0x02),
             _page(serial, 1, 0, b"OpusTags\x00\x00\x00\x00\x00\x00\x00\x00")]
    for i in range(n_audio_pages):
        last = i == n_audio_pages - 1
        g = final_granule if last else (i + 1) * 960
        pages.append(_page(serial, 2 + i, g, b"\xfc" * 40,
                           flags=0x04 if last else 0))
    return b"".join(pages)


def test_crc_matches_independent_bitwise_implementation():
    def crc_bitwise(data):
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 \
                    else (crc << 1)
                crc &= 0xFFFFFFFF
        return crc

    rng = random.Random(11)
    for ln in (0, 1, 7, 64, 300):
        data = bytes(rng.randrange(256) for _ in range(ln))
        assert O.ogg_crc(data) == crc_bitwise(data)


def test_opus_duration_and_fields():
    info = O.parse_ogg(_opus_file())
    assert (info.codec, info.channels, info.sample_rate) == ("opus", 2, 48000)
    assert info.pre_skip == 312
    assert info.duration_s == pytest.approx(1.0)
    assert info.n_pages == 5 and info.n_streams == 1 and info.has_eos


def test_vorbis_duration():
    serial = 9
    blob = (_page(serial, 0, 0, _vorbis_id(), flags=0x02)
            + _page(serial, 1, 22050, b"\x00" * 20)
            + _page(serial, 2, 44100, b"\x00" * 20, flags=0x04))
    info = O.parse_ogg(blob)
    assert (info.codec, info.channels, info.sample_rate) == ("vorbis", 1, 44100)
    assert info.duration_s == pytest.approx(1.0)


def test_negative_granule_skipped_and_long_lacing():
    serial = 3
    big = bytes(600)  # lacing chain 255,255,90
    blob = (_page(serial, 0, 0, _opus_head(), flags=0x02)
            + _page(serial, 1, -1, big)
            + _page(serial, 2, 96000, b"x", flags=0x04))
    info = O.parse_ogg(blob)
    assert info.last_granule == 96000
    assert info.duration_s == pytest.approx((96000 - 312) / 48000.0)


def test_multiplexed_streams_counted():
    blob = (_page(1, 0, 0, _opus_head(), flags=0x02)
            + _page(2, 0, 0, _vorbis_id(), flags=0x02)
            + _page(1, 1, 48312, b"a", flags=0x04)
            + _page(2, 1, 44100, b"b", flags=0x04))
    info = O.parse_ogg(blob)
    assert info.codec == "opus" and info.n_streams == 2
    assert info.last_granule == 48312  # follows the FIRST audio stream


def test_reject_paths():
    with pytest.raises(ValueError, match="too short"):
        O.parse_ogg(b"OggS")
    with pytest.raises(ValueError, match="capture pattern"):
        O.parse_ogg(b"x" * 64)
    blob = bytearray(_opus_file())
    blob[5 + 27] ^= 0xFF  # flip a body byte of page 0
    with pytest.raises(ValueError, match="CRC"):
        O.parse_ogg(bytes(blob))
    with pytest.raises(ValueError, match="zero channels"):
        O.parse_ogg(_page(1, 0, 0, _opus_head(channels=0), flags=0x02))
    with pytest.raises(ValueError, match="no Opus/Vorbis"):
        O.parse_ogg(_page(1, 0, 0, b"\x80theora" + b"\x00" * 30, flags=0x02))
    trunc = _opus_file()[:-3]
    with pytest.raises(ValueError, match="overruns|truncated"):
        O.parse_ogg(trunc)


def test_every_single_byte_flip_rejects():
    # the page CRC covers EVERY byte of every page, so any one-byte
    # corruption must reject (flips inside the CRC field mismatch too)
    blob = _opus_file(n_audio_pages=1)
    rng = random.Random(5)
    for _ in range(120):
        i = rng.randrange(len(blob))
        mutated = bytearray(blob)
        mutated[i] ^= 1 << rng.randrange(8)
        with pytest.raises(ValueError):
            O.parse_ogg(bytes(mutated))


def test_spark_ogg_stream_stats(spark):
    rows = [(1, _opus_file()), (2, bytearray(_vorbis_id())), (3, None),
            (4, _page(9, 0, 0, _vorbis_id(), flags=0x02)
                + _page(9, 1, 88200, b"q", flags=0x04))]
    df = spark.createDataFrame(
        [(i, bytes(b) if b is not None else None) for i, b in rows],
        "media_id bigint, content binary")
    got = {r.media_id: r for r in O.ogg_stream_stats(df).collect()}
    assert got[1].codec == "opus" and got[1].duration_s == pytest.approx(1.0)
    assert got[2].codec is None  # raw header bytes are not an Ogg page
    assert got[3].codec is None
    assert got[4].codec == "vorbis"
    assert got[4].duration_s == pytest.approx(2.0)
