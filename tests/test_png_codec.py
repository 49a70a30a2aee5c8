"""Pure-stdlib PNG codec (operators/png_codec.py): wire-level decode
goldens built by hand (independent of the encoder), all five scanline
filters with hand-computed expectations, round-trips, and the
multimodal stdlib image tier running end-to-end in this container."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from apache_pinot_spark.operators import multimodal
from apache_pinot_spark.operators import png_codec as P


def _raw_png(w, h, color, rows, plte=None):
    """Independent PNG writer for tests: raw chunk assembly, arbitrary
    pre-filtered scanline bytes (each row = filter byte + data)."""
    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    out = P.PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    if plte is not None:
        out += chunk(b"PLTE", bytes(plte))
    out += chunk(b"IDAT", zlib.compress(b"".join(rows)))
    return out + chunk(b"IEND", b"")


def test_decode_filter0_golden():
    # 2x2 gray, filter None: pixel values are the raw bytes
    png = _raw_png(2, 2, 0, [b"\x00\x0a\x14", b"\x00\x1e\x28"])
    px = P.decode_png(png)
    assert px.shape == (2, 2, 1)
    assert px[:, :, 0].tolist() == [[10, 20], [30, 40]]


def test_decode_all_filters_hand_computed():
    # 2x2 gray, one row per filter over known predecessors:
    # row0 Sub:    raw 5, 7   -> 5, (7+5)=12
    # row1 Up:     raw 3, 4   -> 5+3=8, 12+4=16
    # row2 Avg:    raw 10, 2  -> 10+((0+8)//2)=14, 2+((14+16)//2)=17
    # row3 Paeth:  raw 1, 1   -> pred(a=0,b=14,c=0)=14 -> 15,
    #              x=1: a=15,b=17,c=14, p=18 -> pa=3,pb=1,pc=4 -> b=17 -> 18
    png = _raw_png(
        2, 4, 0,
        [b"\x01\x05\x07", b"\x02\x03\x04", b"\x03\x0a\x02", b"\x04\x01\x01"],
    )
    px = P.decode_png(png)[:, :, 0]
    assert px.tolist() == [[5, 12], [8, 16], [14, 17], [15, 18]]


def test_decode_rgb_and_palette_and_alpha():
    rgb = _raw_png(1, 1, 2, [b"\x00\x10\x20\x30"])
    assert P.decode_png(rgb)[0, 0].tolist() == [16, 32, 48]
    pal = _raw_png(2, 1, 3, [b"\x00\x01\x00"], plte=[9, 9, 9, 200, 100, 50])
    assert P.decode_png(pal)[0].tolist() == [[200, 100, 50], [9, 9, 9]]
    rgba = _raw_png(1, 1, 6, [b"\x00\x10\x20\x30\x80"])
    assert P.decode_png(rgba)[0, 0].tolist() == [16, 32, 48, 128]


def test_decode_rejects_out_of_scope():
    assert P.decode_png(b"") is None
    assert P.decode_png(b"not a png at all") is None
    # 16-bit depth: rejected, not mangled
    bad_depth = P.PNG_MAGIC + struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">IIBBBBB", 1, 1, 16, 0, 0, 0, 0
    ) + b"\x00" * 4
    assert P.decode_png(bad_depth) is None
    # truncated mid-IDAT (IEND is the trailing 12 bytes; cut past it)
    good = _raw_png(2, 2, 0, [b"\x00\x0a\x14", b"\x00\x1e\x28"])
    assert P.decode_png(good[:-20]) is None


def test_encode_decode_round_trip():
    rng = np.random.RandomState(5)
    gray = rng.randint(0, 256, (7, 5), dtype=np.uint8)
    assert np.array_equal(P.decode_png(P.encode_png(gray))[:, :, 0], gray)
    rgb = rng.randint(0, 256, (4, 9, 3), dtype=np.uint8)
    assert np.array_equal(P.decode_png(P.encode_png(rgb)), rgb)
    with pytest.raises(ValueError, match="gray or HxWx3"):
        P.encode_png(np.zeros((2, 2, 4), dtype=np.uint8))


def test_luma_and_box_resize():
    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    assert P.luma(white).max() == pytest.approx(1.0, abs=1e-9)
    # box resize averages: left half 0, right half 200 -> two cells
    px = np.zeros((2, 4, 1), dtype=np.uint8)
    px[:, 2:, 0] = 200
    small = P.box_resize(px, 2, 1)
    assert small[0, :, 0].tolist() == [0, 200]


def test_stdlib_tier_features_end_to_end(spark):
    """The real image path now runs IN THIS CONTAINER: white PNG -> 1.0
    features, black -> 0.0, non-PNG -> reject stream — via
    decode_stub=False, which previously raised without PIL."""
    white = P.encode_png(np.full((16, 16), 255, dtype=np.uint8))
    black = P.encode_png(np.zeros((16, 16), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, white, ("png", 16, 16)), (2, black, ("png", 16, 16)),
         (3, b"\x00garbage", ("png", 1, 1))],
        multimodal.IMAGE_SCHEMA,
    )
    out = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_image_features(df, decode_stub=False).collect()
    }
    assert out[1] == pytest.approx([1.0] * 8, abs=1e-6)
    assert out[2] == pytest.approx([0.0] * 8, abs=1e-6)
    assert out[3] is None


def test_stdlib_tier_resize_end_to_end(spark):
    """resize_images decodes, box-resizes, and re-encodes real PNG bytes
    with no imaging library; undecodable content passes through."""
    rgb = np.zeros((32, 32, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200  # red-ish
    df = spark.createDataFrame(
        [(1, P.encode_png(rgb), ("PNG", 32, 32)), (2, b"junk", ("PNG", 9, 9))],
        multimodal.IMAGE_SCHEMA,
    )
    rows = {r["media_id"]: r for r in
            multimodal.resize_images(df, 8, 8, decode_stub=False).collect()}
    resized = P.decode_png(bytes(rows[1]["content"]))
    assert resized.shape == (8, 8, 3) and resized[0, 0].tolist() == [200, 0, 0]
    assert rows[1]["meta"]["width"] == 8 and rows[1]["meta"]["height"] == 8
    assert bytes(rows[2]["content"]) == b"junk"  # reject stream: untouched
    assert rows[2]["meta"]["width"] == 9
