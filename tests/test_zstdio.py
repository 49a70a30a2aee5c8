"""Zstd frame tier (operators/zstdio.py) + .warc.zst ingest: the RFC
8878 frame walker is verified BOTH directions against the container's
real codec — pyarrow-compressed frames must walk to exact byte
boundaries, and hand-built raw/RLE frames (constructed from the spec
grammar alone) must decompress through pyarrow bit-exact."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from apache_pinot_spark.operators import warc as W
from apache_pinot_spark.operators import zstdio as Z

CAP = 64 << 20


def _zc(data: bytes) -> bytes:
    return bytes(pa.Codec("zstd").compress(data))


def _raw_frame(payload: bytes, dict_id: int = 0) -> bytes:
    """Hand-built single-segment frame of raw blocks — pure RFC 8878
    grammar, no codec involved. Validates the walker's header model
    against libzstd in test_handbuilt_frames_decode_via_real_codec."""
    assert len(payload) < 256
    fhd = 0x20  # single segment, fcs_flag=0 -> 1-byte FCS
    did = b""
    if dict_id:
        fhd |= 0x01
        did = bytes([dict_id & 0xFF])
    head = Z.ZSTD_MAGIC + bytes([fhd]) + did + bytes([len(payload)])
    bh = (len(payload) << 3) | 1  # raw block, last
    return head + bh.to_bytes(3, "little") + payload


def _rle_frame(byte: int, count: int) -> bytes:
    """Hand-built frame of one RLE block (single segment, 1-byte FCS)."""
    assert count < 256
    head = Z.ZSTD_MAGIC + bytes([0x20]) + bytes([count])
    bh = (count << 3) | (1 << 1) | 1  # RLE, last
    return head + bh.to_bytes(3, "little") + bytes([byte])


def _skippable(payload: bytes, low: int = 0x0) -> bytes:
    return (bytes([0x50 | low]) + b"\x2a\x4d\x18"
            + len(payload).to_bytes(4, "little") + payload)


def test_walker_finds_pyarrow_frame_boundaries_exactly():
    rng = os.urandom
    payloads = [b"", b"x", b'{"text": "doc"}\n' * 500, rng(100_000)]
    for p in payloads:
        comp = _zc(p)
        frames = list(Z.walk_zstd_frames(comp))
        assert len(frames) == 1
        assert frames[0].kind == "frame"
        assert (frames[0].start, frames[0].end) == (0, len(comp))
        assert frames[0].dict_id == 0
        out = Z.decompress_frame_bounded(comp, CAP, frames[0].content_size)
        assert out == p

    blob = b"".join(_zc(p) for p in payloads)
    frames = list(Z.walk_zstd_frames(blob))
    assert len(frames) == len(payloads)
    assert frames[0].start == 0 and frames[-1].end == len(blob)
    for f, nxt in zip(frames, frames[1:]):
        assert f.end == nxt.start
    assert [
        Z.decompress_frame_bounded(blob[f.start : f.end], CAP, f.content_size)
        for f in frames
    ] == payloads


def test_handbuilt_frames_decode_via_real_codec():
    # the strong cross-check: frames assembled from the spec grammar
    # alone must be accepted by libzstd — and walked by us
    for payload in (b"", b"hello zstd", bytes(range(200))):
        fr = _raw_frame(payload)
        assert Z.decompress_frame_bounded(fr, CAP) == payload
        (meta,) = Z.walk_zstd_frames(fr)
        assert (meta.start, meta.end) == (0, len(fr))
        assert meta.content_size == len(payload)
    rle = _rle_frame(0x41, 200)
    assert Z.decompress_frame_bounded(rle, CAP) == b"A" * 200
    (meta,) = Z.walk_zstd_frames(rle)
    assert meta.end == len(rle)


def test_skippable_frames_are_skipped():
    blob = (_skippable(b"metadata") + _zc(b"one")
            + _skippable(b"pad", low=0xF) + _zc(b"two"))
    kinds = [(f.kind, f.skip_magic_low) for f in Z.walk_zstd_frames(blob)]
    assert kinds == [("skippable", 0x0), ("frame", None),
                     ("skippable", 0xF), ("frame", None)]
    assert list(Z.split_zstd_members(blob, CAP)) == [b"one", b"two"]


def test_dictionary_frames_reject_honestly():
    blob = _raw_frame(b"plain") + _raw_frame(b"dicted", dict_id=7)
    with pytest.raises(ValueError, match="dict_id=7"):
        list(Z.split_zstd_members(blob, CAP))
    events = list(Z.iter_zstd_members_tolerant(blob, CAP))
    assert events[0] == ("member", b"plain")
    assert events[1][0] == "reject" and "dict_id=7" in events[1][1]


def test_bomb_rejects_before_materializing():
    # ~192 MB of zeros compresses to ~a few KB; a 1 MB cap must reject
    bomb = _zc(bytes(192 << 20))
    assert len(bomb) < 1 << 20
    with pytest.raises(ValueError, match="cap|inflates past"):
        next(Z.split_zstd_members(bomb, 1 << 20))
    # header-declared size past the cap rejects before ANY inflation
    (meta,) = Z.walk_zstd_frames(bomb)
    if meta.content_size is not None:
        assert meta.content_size == 192 << 20


def test_corrupt_frame_isolation_and_resync():
    good1, good2 = _zc(b"alpha" * 100), _zc(b"beta" * 100)
    corrupt = bytearray(good1)
    corrupt[20] ^= 0xFF  # damage the entropy payload, keep the header
    blob = bytes(corrupt) + good2
    events = list(Z.iter_zstd_members_tolerant(blob, CAP))
    rejects = [e for e in events if e[0] == "reject"]
    members = [e[1] for e in events if e[0] == "member"]
    assert members[-1] == b"beta" * 100
    assert len(rejects) >= 1


def test_reserved_fields_reject():
    bad_fhd = Z.ZSTD_MAGIC + bytes([0x28]) + bytes([0])  # reserved bit 3
    with pytest.raises(ValueError, match="reserved frame-descriptor"):
        list(Z.walk_zstd_frames(bad_fhd))
    fr = bytearray(_raw_frame(b"xx"))
    fr[6] |= 0x06  # block type 3
    with pytest.raises(ValueError, match="reserved block type"):
        list(Z.walk_zstd_frames(bytes(fr)))
    huge_window = Z.ZSTD_MAGIC + bytes([0x00, 0xFF]) + b"\x01\x00\x00"
    with pytest.raises(ValueError, match="window"):
        list(Z.walk_zstd_frames(huge_window))


def test_lying_content_size_rejects():
    fr = bytearray(_raw_frame(b"12345678"))
    fr[5] = 99  # FCS byte says 99, the raw block carries 8
    # libzstd catches the mismatch itself; our cross-check is the
    # backstop — either way the frame REJECTS, never silently-short
    with pytest.raises(ValueError, match="header said 99|corrupt zstd"):
        Z.decompress_frame_bounded(bytes(fr), CAP, 99)


# --- .warc.zst + HTTP Content-Encoding integration -----------------------

def _record(rtype: bytes, uri: bytes, body: bytes, extra: bytes = b"") -> bytes:
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: " + rtype + b"\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: " + uri + b"\r\n" + extra +
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n")
    return hdr + body + b"\r\n\r\n"


_PAGE = (b"<html><body><p>The quick brown fox paragraph has enough real "
         b"words in it to pass the boilerplate gate because it is plain "
         b"prose with the usual stopwords in it.</p></body></html>")


def _http(payload: bytes, extra: bytes = b"") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + extra
            + b"\r\n" + payload)


def _warc_zst(n_pages: int = 3, corrupt_idx: int | None = None) -> bytes:
    frames = [_skippable(b"not-a-dict, just metadata")]
    for i in range(n_pages):
        rec = _record(b"response",
                      b"http://site%d.example.com/p" % i, _http(_PAGE))
        fr = bytearray(_zc(rec))
        if corrupt_idx == i:
            fr[len(fr) // 2] ^= 0xFF
        frames.append(bytes(fr))
    return b"".join(frames)


def test_warc_zst_member_contract():
    recs = [r for k, r in W.iter_warc_records_tolerant(_warc_zst())
            if k == "rec"]
    assert len(recs) == 3
    assert all(r.http_status == 200 for r in recs)
    # one corrupt frame loses only itself
    events = list(W.iter_warc_records_tolerant(_warc_zst(corrupt_idx=1)))
    recs = [r for k, r in events if k == "rec"]
    rejects = [r for k, r in events if k == "reject"]
    assert {r.target_uri for r in recs} == {
        "http://site0.example.com/p", "http://site2.example.com/p"}
    assert len(rejects) >= 1


def test_http_content_encoding_br_and_zstd():
    for enc, codec in ((b"br", "brotli"), (b"zstd", "zstd")):
        comp = bytes(pa.Codec(codec).compress(_PAGE))
        rec_body = _http(comp, b"Content-Encoding: " + enc + b"\r\n")
        blob = _zc(_record(b"response", b"http://e.com/", rec_body))
        (ev,) = [e for e in W.iter_warc_records_tolerant(blob)]
        assert ev[0] == "rec"
        assert ev[1].body == _PAGE
        assert ev[1].http_content_encoding == enc.decode()
    # a brotli bomb body marks the record truncated, never OOMs
    bomb = bytes(pa.Codec("brotli").compress(bytes(64 << 20)))
    rec_body = _http(bomb, b"Content-Encoding: br\r\n")
    blob = _zc(_record(b"response", b"http://e.com/", rec_body))
    (ev,) = list(W.iter_warc_records_tolerant(blob, max_body_bytes=1 << 20))
    assert ev[0] == "rec" and ev[1].body is None and ev[1].truncated


def test_spark_warc_zst_crawl_to_documents(spark, tmp_path):
    p = tmp_path / "crawl-00000.warc.zst"
    p.write_bytes(_warc_zst(n_pages=4, corrupt_idx=2))
    docs = W.crawl_to_documents(spark, str(p), min_text_chars=50)
    rows = docs.collect()
    assert len(rows) == 3  # the corrupt frame's page is the only loss
    assert {r.source for r in rows} == {
        "site0.example.com", "site1.example.com", "site3.example.com"}
    assert all(r.text and "quick brown fox" in r.text for r in rows)
