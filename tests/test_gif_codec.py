"""GIF decoder (operators/gif_codec.py): hand-assembled wire-level
goldens (an independent all-root-codes LZW packer), interlacing,
transparency, multi-frame compositing with disposal, reject contract,
JVM ImageIO interop, and the multimodal stdlib tier."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from apache_pinot_spark.operators import gif_codec as G


# --------------------------------------------------------------------------
# Independent test-side assembler: every pixel emitted as its LZW root
# code (spec-legal; width growth mirrors the decoder's table growth)
# --------------------------------------------------------------------------


def _lzw_roots(min_code, indices):
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1
    table_size = eoi + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i, sym in enumerate(indices):
        emit(sym)
        if i > 0:  # the decoder adds one table entry per code after the 1st
            table_size += 1
            if table_size >= (1 << width) and width < 12:
                width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(payload):
    out = bytearray()
    for i in range(0, len(payload), 255):
        part = payload[i : i + 255]
        out += bytes([len(part)]) + part
    return out + b"\x00"


def _gif(w, h, palette, indices, interlace=False, transparent=None,
         min_code=2, frames=None, bg=0):
    """Assemble a GIF89a stream; ``frames`` overrides with a list of
    (ix, iy, iw, ih, indices, disposal) for multi-frame tests."""
    n = max(2, (len(palette) - 1).bit_length())
    gct = bytearray()
    for rgb in palette:
        gct += bytes(rgb)
    gct += b"\x00" * (3 * ((1 << n) - len(palette)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n - 1), bg, 0)
    out += gct
    specs = frames or [(0, 0, w, h, indices, 0)]
    for ix, iy, iw, ih, idx, disposal in specs:
        if transparent is not None or disposal:
            t = 0 if transparent is None else 1
            out += bytes([0x21, 0xF9, 4, (disposal << 2) | t, 0, 0,
                          transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", ix, iy, iw, ih, 0x40 if interlace else 0
        )
        out += bytes([min_code]) + _subblocks(_lzw_roots(min_code, idx))
    return bytes(out + b"\x3b")


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]


def test_basic_decode():
    idx = [0, 1, 2, 3, 3, 2, 1, 0]  # 4x2
    px = G.decode_gif(_gif(4, 2, PAL, idx))
    assert px is not None and px.shape == (2, 4, 3)
    assert px[0, 0].tolist() == [255, 0, 0] and px[0, 3].tolist() == [9, 9, 9]
    assert px[1, 0].tolist() == [9, 9, 9] and px[1, 3].tolist() == [255, 0, 0]


def test_lzw_real_compression_via_kwkwk():
    """A stream that exercises real table entries including the KwKwK
    case: hand-packed codes, not root-only."""
    # min_code=2: clear=4, eoi=5, roots 0..3. Emit: CLEAR 0 6 6 EOI where
    # 6 = (0,0) learned from the second code -> KwKwK on its first use.
    # widths: after clear width=3; decode: 0 -> [0]; 6 == len(table) ->
    # KwKwK: prev+prev[0] = 00; table grows; next 6 -> 00.
    acc = nbits = 0
    out = bytearray()

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # after code 7 the table reaches 8 entries -> width grows to 4, so
    # the decoder reads EOI at the NEW width
    emit(4, 3); emit(0, 3); emit(6, 3); emit(7, 3); emit(5, 4)
    if nbits:
        out.append(acc & 0xFF)
    # pixels: 0, 00, 000 -> six zeros total: declare 6x1
    blob = bytearray(b"GIF89a") + struct.pack("<HHBBB", 6, 1, 0x81, 0, 0)
    for rgb in PAL:
        blob += bytes(rgb)
    blob += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 6, 1, 0)
    blob += bytes([2]) + _subblocks(bytes(out))
    px = G.decode_gif(bytes(blob + b"\x3b"))
    assert px is not None and px.shape == (1, 6, 3)
    assert (px == np.array([255, 0, 0], dtype=np.uint8)).all()


def test_interlaced_matches_sequential():
    rng = np.random.RandomState(3)
    h, w = 11, 5
    img = rng.randint(0, 4, (h, w))
    seq = G.decode_gif(_gif(w, h, PAL, list(img.reshape(-1))))
    # interlaced stream: rows permuted into the four passes
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(start, h, step)]
    inter_idx = [v for r in order for v in img[r]]
    il = G.decode_gif(_gif(w, h, PAL, inter_idx, interlace=True))
    assert il is not None and np.array_equal(seq, il)


def test_transparency_yields_alpha():
    idx = [0, 1, 1, 0]
    px = G.decode_gif(_gif(2, 2, PAL, idx, transparent=1))
    assert px.shape == (2, 2, 4)
    assert px[0, 0].tolist()[:3] == [255, 0, 0] and px[0, 0, 3] == 255
    assert px[0, 1, 3] == 0  # transparent index -> alpha 0


def test_multiframe_compositing_and_disposal():
    # frame 1 fills 2x2 with color 0; frame 2 overwrites the top-left
    # pixel with color 2 (disposal 2: restored after)
    frames = [
        (0, 0, 2, 2, [0, 0, 0, 0], 0),
        (0, 0, 1, 1, [2], 2),
        (1, 1, 1, 1, [1], 0),
    ]
    out = G.decode_gif_frames(_gif(2, 2, PAL, None, frames=frames), max_frames=9)
    assert len(out) == 3
    assert out[0][0, 0].tolist()[:3] == [255, 0, 0]
    assert out[1][0, 0].tolist()[:3] == [0, 0, 255]      # overlay applied
    assert out[2][1, 1].tolist()[:3] == [0, 255, 0]      # third frame pixel
    # max_frames truncates
    assert len(G.decode_gif_frames(_gif(2, 2, PAL, None, frames=frames),
                                   max_frames=2)) == 2


def test_disposal_3_restores_previous_canvas():
    """Restore-to-previous (GIF89a §23): after a disposal-3 frame, the
    canvas reverts to its PRE-FRAME state — NOT to the background color
    (bg here is palette 3, so the old approximate-as-disposal-2 behavior
    would leave (9,9,9) where red must return)."""
    frames = [
        (0, 0, 2, 2, [0, 0, 0, 0], 0),   # fill red
        (0, 0, 1, 1, [2], 3),            # blue overlay, restore-previous
        (1, 1, 1, 1, [1], 0),            # unrelated corner pixel
    ]
    out = G.decode_gif_frames(
        _gif(2, 2, PAL, None, frames=frames, bg=3), max_frames=9
    )
    assert len(out) == 3
    assert out[1][0, 0].tolist()[:3] == [0, 0, 255]   # overlay visible
    assert out[2][0, 0].tolist()[:3] == [255, 0, 0]   # previous restored
    assert out[2][1, 1].tolist()[:3] == [0, 255, 0]
    # background restore (disposal 2) still behaves differently
    frames2 = [
        (0, 0, 2, 2, [0, 0, 0, 0], 0),
        (0, 0, 1, 1, [2], 2),
        (1, 1, 1, 1, [1], 0),
    ]
    out2 = G.decode_gif_frames(
        _gif(2, 2, PAL, None, frames=frames2, bg=3), max_frames=9
    )
    # disposal 2 wipes to transparent/background, not to the red underlay
    assert out2[2][0, 0].tolist()[:3] != [255, 0, 0]


def test_rejects_out_of_scope_and_corrupt():
    assert G.decode_gif(b"") is None
    assert G.decode_gif(b"NOTAGIF") is None
    assert G.decode_gif(b"GIF89a" + b"\x00" * 4) is None
    good = _gif(4, 2, PAL, [0, 1, 2, 3, 3, 2, 1, 0])
    assert G.decode_gif(good[: len(good) // 2]) is None
    mangled = bytearray(good)
    mangled[8] = 0  # width 0
    assert G.decode_gif(bytes(mangled)) is None


def test_jvm_imageio_interop(spark):
    """A GIF written by the JVM's real encoder (its own palette choice
    and LZW stream) must decode here to the same samples the JVM's own
    reader produces."""
    jvm = spark._jvm
    try:
        jvm.javax.imageio.ImageIO.getWriterFormatNames
    except Exception:
        pytest.skip("JVM ImageIO unavailable")
    # an indexed-friendly image: 4 flat color bands
    img = np.zeros((16, 20, 3), np.uint8)
    img[:4] = (255, 0, 0); img[4:8] = (0, 255, 0)
    img[8:12] = (0, 0, 255); img[12:] = (240, 240, 240)
    bi = jvm.java.awt.image.BufferedImage(20, 16, 1)
    for y in range(16):
        for x in range(20):
            bi.setRGB(x, y, (int(img[y, x, 0]) << 16)
                      | (int(img[y, x, 1]) << 8) | int(img[y, x, 2]))
    ios = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", ios)
    blob = bytes(ios.toByteArray())
    assert blob[:4] == b"GIF8"
    mine = G.decode_gif(blob)
    assert mine is not None and mine.shape[2] in (3, 4)
    bais = jvm.java.io.ByteArrayInputStream(bytearray(blob))
    im = jvm.javax.imageio.ImageIO.read(bais)
    theirs = np.zeros((16, 20, 3), np.int32)
    for y in range(16):
        for x in range(20):
            rgb = im.getRGB(x, y)
            theirs[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
    assert np.array_equal(mine[:, :, :3].astype(np.int32), theirs)


def test_multimodal_stdlib_tier_decodes_gif(spark):
    from apache_pinot_spark.operators import multimodal as M

    if M.image_decoder() == "pil":
        pytest.skip("PIL present: this test pins the stdlib tier")
    left_white = [1] * 8 + [0] * 8  # 16x1 half bright / half dark
    pal = [(0, 0, 0), (255, 255, 255)]
    blob = _gif(16, 16, pal, (left_white * 16)[: 16 * 16])
    rows = [(1, blob, ("gif", 16, 16)), (2, b"GIF89a junk", ("gif", 4, 4))]
    df = spark.createDataFrame(rows, M.IMAGE_SCHEMA)
    out = {r["media_id"]: r["features"]
           for r in M.extract_image_features(df, decode_stub=False,
                                             feature_dim=4).collect()}
    assert out[1] == pytest.approx([1.0, 1.0, 0.0, 0.0], abs=0.02)
    assert out[2] is None  # reject stream


# --------------------------------------------------------------------------
# BMP (decode_bmp lives in gif_codec as the trivial sibling)
# --------------------------------------------------------------------------


def _bmp24(img, top_down=False):
    h, w = img.shape[:2]
    row = (w * 3 + 3) & ~3
    body = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        line = bytearray()
        for x in range(w):
            r, g, b = img[y, x]
            line += bytes([b, g, r])
        line += b"\x00" * (row - len(line))
        body += line
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    hdr += struct.pack("<IiihHIIiiII", 40, w, (-h if top_down else h), 1, 24,
                       0, len(body), 2835, 2835, 0, 0)
    return bytes(hdr + body)


def test_bmp_24bit_both_orientations():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(G.decode_bmp(_bmp24(img)), img)
    assert np.array_equal(G.decode_bmp(_bmp24(img, top_down=True)), img)


def test_bmp_rejects_out_of_scope():
    assert G.decode_bmp(b"") is None
    assert G.decode_bmp(b"BMnot a real bitmap") is None
    img = np.zeros((2, 2, 3), np.uint8)
    blob = bytearray(_bmp24(img))
    blob[30] = 1  # compression = BI_RLE8
    assert G.decode_bmp(bytes(blob)) is None


def test_bmp_jvm_imageio_interop(spark):
    jvm = spark._jvm
    try:
        jvm.javax.imageio.ImageIO.getWriterFormatNames
    except Exception:
        pytest.skip("JVM ImageIO unavailable")
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    bi = jvm.java.awt.image.BufferedImage(11, 9, 1)
    for y in range(9):
        for x in range(11):
            bi.setRGB(x, y, (int(img[y, x, 0]) << 16)
                      | (int(img[y, x, 1]) << 8) | int(img[y, x, 2]))
    ios = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "bmp", ios)
    blob = bytes(ios.toByteArray())
    assert blob[:2] == b"BM"
    mine = G.decode_bmp(blob)
    assert mine is not None and np.array_equal(mine[:, :, :3], img)
    # and through the multimodal magic dispatch
    from apache_pinot_spark.operators.multimodal import decode_image_stdlib

    assert np.array_equal(decode_image_stdlib(blob)[:, :, :3], img)


def test_resize_gif_reencodes_png_stdlib(spark):
    from apache_pinot_spark.operators import multimodal as M
    from apache_pinot_spark.operators.png_codec import PNG_MAGIC

    if M.image_decoder() == "pil":
        pytest.skip("PIL present: this test pins the stdlib tier")
    pal = [(0, 0, 0), (200, 10, 10)]
    blob = _gif(16, 16, pal, [1] * 256)
    df = spark.createDataFrame([(1, blob, ("gif", 16, 16))], M.IMAGE_SCHEMA)
    out = M.resize_images(df, 8, 8, decode_stub=False).collect()[0]
    content = bytes(out["content"])
    # lossless re-encode: formats without an encoder come back as PNG
    assert content.startswith(PNG_MAGIC)
    px = M.decode_image_stdlib(content)
    assert px.shape == (8, 8, 3) and px[0, 0].tolist() == [200, 10, 10]
    assert out["meta"]["width"] == 8 and out["meta"]["height"] == 8
