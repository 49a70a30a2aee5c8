"""Perceptual image hashing (operators/imagehash.py): the explicit
cosine-matrix DCT cross-checked against an independent FFT-based DCT
derivation, cross-FORMAT hash invariance through the repo's own codecs,
JPEG near-invariance, the pigeonhole exactness of the banded near-dup
join, and the Spark operators."""

from __future__ import annotations

import numpy as np
import pytest

from apache_pinot_spark.operators import imagehash as IH
from apache_pinot_spark.operators.png_codec import encode_png
from apache_pinot_spark.operators.tiff_codec import encode_tiff


def _gradient(h=48, w=64):
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 128, w)[None, :]
    g = np.clip(y + x - (x * y) / 160.0, 0, 255).astype(np.uint8)
    return np.stack([g, g // 2 + 30, 255 - g], axis=2)


def _blocks(h=40, w=40):
    img = np.zeros((h, w, 3), np.uint8)
    img[: h // 2, : w // 2] = 220
    img[h // 2 :, w // 2 :] = 140
    img[: h // 2, w // 2 :] = 60
    return img


def test_dct_matches_fft_derivation():
    # independent DCT-II: even-symmetric FFT construction
    rng = np.random.default_rng(3)
    for n in (8, 32):
        d = IH._dct_matrix(n)
        v = rng.normal(size=n)
        ours = d @ v
        ext = np.zeros(4 * n)
        ext[1 : 2 * n : 2] = v
        ext[2 * n + 1 :: 2] = v[::-1]
        ref = np.real(np.fft.fft(ext))[:n] * np.sqrt(2.0 / n) / 2.0
        ref[0] /= np.sqrt(2)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


def test_hash_determinism_and_format_invariance():
    img = _gradient()
    p1 = IH.phash64(img)
    assert p1 == IH.phash64(img)
    # PNG and TIFF round-trips decode to identical pixels -> identical hash
    from apache_pinot_spark.operators.multimodal import decode_image_stdlib

    png_img = decode_image_stdlib(encode_png(img))
    tif_img = decode_image_stdlib(encode_tiff(img))
    assert IH.phash64(png_img) == p1 == IH.phash64(tif_img)
    assert IH.dhash64(png_img) == IH.dhash64(img)


def _textured(h=64, w=64):
    # pHash robustness statements hold for images with real spectral
    # content; a featureless gradient has near-median low-freq
    # coefficients whose bits flip on any noise — by design
    y, x = np.mgrid[0:h, 0:w].astype(float)
    g = (128 + 60 * np.sin(x / 5.0) + 50 * np.cos(y / 7.0)
         + 30 * np.sin((x + y) / 11.0) + 0.8 * x - 0.5 * y)
    g = np.clip(g, 0, 255).astype(np.uint8)
    return np.stack([g, np.roll(g, 3, 0), 255 - g], axis=2)


def test_jpeg_reencode_is_near_not_equal():
    from apache_pinot_spark.operators.jpeg_codec import encode_jpeg
    from apache_pinot_spark.operators.multimodal import decode_image_stdlib

    img = _textured()
    jp = decode_image_stdlib(encode_jpeg(img))
    d = bin((IH.phash64(img) ^ IH.phash64(jp)) & ((1 << 64) - 1)).count("1")
    assert d <= 4  # lossy re-encode stays within the near-dup radius
    # a genuinely different image is far away
    d2 = bin((IH.phash64(img) ^ IH.phash64(_blocks()))
             & ((1 << 64) - 1)).count("1")
    assert d2 > 10


def test_resize_robustness():
    img = _textured()
    small = img[::2, ::2]  # crude 2x downsample
    d = bin((IH.phash64(img) ^ IH.phash64(small)) & ((1 << 64) - 1)).count("1")
    assert d <= 8


def test_spark_image_hashes_and_reject(spark):
    img = _gradient()
    rows = [(1, encode_png(img)), (2, encode_tiff(img)),
            (3, b"not an image"), (4, None)]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    got = {r.media_id: r for r in IH.image_hashes(df).collect()}
    assert got[1].phash == got[2].phash  # format invariance end-to-end
    assert (got[1].width, got[1].height) == (64, 48)
    assert got[3].phash is None and got[4].phash is None


def test_near_dup_pairs_pigeonhole_exact(spark):
    rng = np.random.default_rng(7)
    base = []
    rows = []
    for i in range(30):
        v = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        base.append(v)
        rows.append((i * 10, v - (1 << 64) if v >= (1 << 63) else v))
    expected = set()
    nid = 1000
    for i, v in enumerate(base[:12]):
        flips = rng.choice(64, size=(i % 4), replace=False)
        m = v
        for f in flips:
            m ^= 1 << int(f)
        rows.append((nid, m - (1 << 64) if m >= (1 << 63) else m))
        if (i % 4) <= 3:
            expected.add((i * 10, nid, i % 4))
        nid += 1
    df = spark.createDataFrame(rows, "media_id bigint, phash bigint")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in IH.near_dup_image_pairs(df, max_hamming=3).collect()}
    # every planted ≤3-bit mutation is found with its exact distance
    assert expected <= got
    # nothing beyond the radius leaks through
    assert all(h <= 3 for _, _, h in got)


def test_near_dup_bucket_cap(spark):
    rows = [(i, 0) for i in range(50)]  # 50 identical hashes
    df = spark.createDataFrame(rows, "media_id bigint, phash bigint")
    pairs = IH.near_dup_image_pairs(df, max_hamming=3, max_bucket=10)
    assert pairs.count() == 0  # flood capped: exact dups belong upstream
    assert IH.near_dup_image_pairs(df, max_hamming=3,
                                   max_bucket=100).count() == 50 * 49 // 2


def _textured_frame(phase: float, h=48, w=48):
    y, x = np.mgrid[0:h, 0:w].astype(float)
    g = (128 + 60 * np.sin(x / 4.0 + phase) + 45 * np.cos(y / 6.0 - phase)
         + 25 * np.sin((x + 2 * y) / 9.0 + 2 * phase))
    return np.clip(g, 0, 255).astype(np.uint8)


def test_video_phash_signatures_and_near_dup(spark):
    import test_mp4 as M

    from apache_pinot_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from apache_pinot_spark.operators.multimodal import decode_image_stdlib  # noqa: F401

    frames_a = [encode_jpeg(_textured_frame(i * 0.9)) for i in range(6)]
    # B = the SAME footage re-encoded (decode -> encode), shifted 2 s
    junk = [encode_jpeg(_textured_frame(9.7 + i)) for i in range(2)]
    frames_b = junk + [encode_jpeg(np.squeeze(decode_jpeg(f)))
                       for f in frames_a]
    frames_c = [encode_jpeg(_textured_frame(5.1 + 1.3 * i))
                for i in range(6)]

    def mp4(frames):
        return M._mp4_with_payload(frames, [(len(frames), 1000)], mts=1000)

    df = spark.createDataFrame(
        [(1, mp4(frames_a)), (2, mp4(frames_b)), (3, mp4(frames_c)),
         (4, b"junk blob")],
        "media_id bigint, content binary")
    sigs = IH.video_phash_signatures(df, every_n_seconds=1.0,
                                     keyframes_only=False)
    rows = sigs.collect()
    assert sum(1 for r in rows if r.media_id == 1 and r.phash is not None) == 6
    assert [r.phash for r in rows if r.media_id == 4] == [None]
    pairs = IH.near_dup_video_pairs(sigs, min_matching_frames=3).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].t_offset_s == pytest.approx(2.0)
    assert pairs[0].matching_frames >= 4
