"""Perceptual image hashing + image near-dup — the multimodal twin of
the text MinHash tier: web-scale image corpora (LAION-style) dedupe on
a 64-bit perceptual hash, not on byte equality (the same picture
recirculates re-encoded, resized, and re-compressed). Decoding rides
the repo's own pure-Python codecs (operators/multimodal.decode_image_
stdlib: PNG/JPEG/GIF/BMP/TIFF), so the hash is available wherever the
decode tier is.

Hashes (both classic, both public-domain constructions):
  * pHash-64: grayscale (Rec.601 luma) → 32×32 area-pooled → 2-D
    DCT-II → the 8×8 low-frequency block except DC → bit = coeff >
    median(63 coeffs). Robust to re-encoding, mild resizing, and
    brightness-preserving noise; the DCT is an explicit cosine-matrix
    product (no scipy), cross-checked in tests against an independent
    FFT-based DCT derivation.
  * dHash-64: 9×8 area-pool, bit = left pixel > right neighbor — the
    cheap gradient hash, kept for corpora that want two independent
    signals.

Near-dup search (``near_dup_image_pairs``) is exact within the declared
radius: the 64-bit hash splits into ``max_hamming+1`` bands, and the
pigeonhole principle guarantees any pair within Hamming distance
``max_hamming`` agrees on at least one full band — one equi-join per
band (union'd, JVM-side), then an exact xor/bit_count filter. No
all-pairs product anywhere; band buckets are capped like the text-LSH
tier to keep adversarial floods linear.

Scale shape: hashing is per-row map-side (Arrow); pair search is
band-keyed equi-joins + one distinct — the text-LSH shuffle budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _to_gray(img) -> "object":
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    # Rec.601 luma over the first three channels (alpha ignored)
    return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2])


def _area_pool(g, out_h: int, out_w: int):
    """Area-average resize via bin reduction — deterministic, no
    interpolation library. Tiny inputs upsample by repetition first so
    every output bin is non-empty."""
    import numpy as np

    H, W = g.shape
    if H < out_h:
        g = np.repeat(g, -(-out_h // H), axis=0)
        H = g.shape[0]
    if W < out_w:
        g = np.repeat(g, -(-out_w // W), axis=1)
        W = g.shape[1]
    ys = (np.arange(out_h + 1) * H) // out_h
    xs = (np.arange(out_w + 1) * W) // out_w
    rows = np.add.reduceat(g, ys[:-1], axis=0) \
        / (ys[1:] - ys[:-1])[:, None]
    return np.add.reduceat(rows, xs[:-1], axis=1) / (xs[1:] - xs[:-1])


def _dct_matrix(n: int):
    import numpy as np

    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    d[0] *= 1 / np.sqrt(2)
    return d * np.sqrt(2 / n)


def phash64(img) -> int:
    """Signed 64-bit pHash of an H×W[×C] uint8 array. Bit i (0..62,
    from the flattened 8×8 low-frequency block skipping DC) is set when
    the coefficient exceeds the median of the 63; bit 63 is always 0."""
    import numpy as np

    g = _area_pool(_to_gray(img), 32, 32)
    d = _dct_matrix(32)
    coeffs = (d @ g @ d.T)[:8, :8].ravel()[1:]
    med = np.median(coeffs)
    bits = 0
    for i, c in enumerate(coeffs):
        if c > med:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def dhash64(img) -> int:
    """Signed 64-bit dHash: 9×8 area-pool, bit = pixel > right
    neighbor, row-major."""
    g = _area_pool(_to_gray(img), 8, 9)
    bits = 0
    i = 0
    for r in range(8):
        for c in range(8):
            if g[r, c] > g[r, c + 1]:
                bits |= 1 << i
            i += 1
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_hashes(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, phash, dhash, width, height) per image blob — decoded
    through the repo's stdlib codec tier; undecodable blobs emit ONE
    all-NULL row (the multimodal reject convention). One Arrow map
    pass, zero shuffle."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.imagehash import dhash64, phash64
        from apache_pinot_spark.operators.multimodal import (
            decode_image_stdlib,
        )

        cols = ("id", "phash", "dhash", "width", "height")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, blob in zip(pdf["id"], pdf["c"]):
                img = None
                try:
                    img = decode_image_stdlib(
                        bytes(blob) if blob is not None else b"")
                except Exception:
                    img = None
                out["id"].append(mid)
                if img is None:
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                out["phash"].append(phash64(img))
                out["dhash"].append(dhash64(img))
                out["height"].append(int(img.shape[0]))
                out["width"].append(int(img.shape[1]))
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, phash BIGINT, dhash BIGINT, "
               "width INT, height INT",
    )
    return out.withColumnRenamed("id", id_col)


def near_dup_image_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair within ``max_hamming`` —
    EXACT within the radius by pigeonhole: the hash splits into
    ``max_hamming + 1`` bands, a qualifying pair agrees on ≥1 whole
    band, so band-equality joins find every candidate; the xor +
    bit_count filter then keeps only true pairs. Buckets larger than
    ``max_bucket`` are dropped with the text-LSH cap rationale (a flood
    of identical images would otherwise quadratically explode the
    join; identical images are EXACT dups — catch them upstream with
    the byte/exact tier)."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    h = hashes.select(F.col(id_col).alias("hid"),
                      F.col(hash_col).alias("hv")) \
        .filter(F.col("hv").isNotNull())
    bands = []
    for b in range(n_bands):
        shift = b * width
        w = width if b < n_bands - 1 else 64 - shift
        # shiftrightunsigned = logical shift (no sign extension), so the
        # top band of a negative hash comes out as plain bits; a full
        # 64-bit band (max_hamming=0) needs no mask — and (1<<64)-1
        # would overflow the long literal anyway
        bval = F.shiftrightunsigned(F.col("hv"), shift)
        if w < 64:
            bval = bval.bitwiseAND(F.lit((1 << w) - 1))
        bands.append(h.select("hid", "hv", F.lit(b).alias("band"),
                              bval.alias("bval")))
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    # cap adversarial buckets (identical-hash floods) like the text tier
    sized = banded.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("band", "bval")))
    banded = sized.filter(F.col("bsz") <= max_bucket).drop("bsz")
    left = banded.select(F.col("band"), F.col("bval"),
                         F.col("hid").alias("id_a"), F.col("hv").alias("ha"))
    right = banded.select(F.col("band"), F.col("bval"),
                          F.col("hid").alias("id_b"), F.col("hv").alias("hb"))
    pairs = (
        left.join(right, on=["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def video_phash_signatures(
    df: DataFrame,
    every_n_seconds: float = 1.0,
    content_col: str = "content",
    id_col: str = "media_id",
    keyframes_only: bool = True,
) -> DataFrame:
    """(media_id, sample_index, timestamp_s, phash) — the video twin:
    keyframes picked against the MP4 container's real stts/stss tables
    (operators/mp4.choose_samples), byte-sliced via the chunk map, and
    decoded through the repo's JPEG / H.264-intra tier, each frame
    pHashed in the same Arrow pass (pixels never cross the Arrow
    boundary). Undecodable blobs emit ONE all-NULL row; a picked frame
    whose bytes fail decode keeps its index/timestamp with NULL phash.
    Zero shuffle."""
    if every_n_seconds <= 0:
        raise ValueError("every_n_seconds must be > 0")
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.h264 import decode_h264_avcc_sample
        from apache_pinot_spark.operators.imagehash import phash64
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
                   ("id", "sample_index", "timestamp_s", "phash")}

            def emit(mid, idx=None, ts=None, ph=None):
                out["id"].append(mid)
                out["sample_index"].append(idx)
                out["timestamp_s"].append(ts)
                out["phash"].append(ph)

            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    data = bytes(blob) if blob is not None else None
                    info = parse_mp4(data)
                    if not info.video_tracks:
                        raise ValueError("no video track")
                    trk = info.video_tracks[0]
                    picks = choose_samples(trk, every_n_seconds,
                                           keyframes_only)
                    locs = sample_locations(trk)
                    is_avc = trk.format in ("avc1", "avc3") and trk.avcc
                    if trk.format not in JPEG_FORMATS and not is_avc:
                        raise ValueError(
                            f"undecodable track {trk.format!r}")
                except Exception:
                    emit(mid)
                    continue
                for idx, ts, _sync in picks:
                    ph = None
                    try:
                        raw = sample_bytes(data, locs, idx)
                        if is_avc:
                            img, _, _ = decode_h264_avcc_sample(trk.avcc, raw)
                        else:
                            img = decode_jpeg(raw)
                        if img is not None:
                            ph = phash64(img)
                    except Exception:
                        ph = None
                    emit(mid, idx, ts, ph)
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, sample_index INT, timestamp_s DOUBLE, "
               "phash BIGINT",
    )
    return out.withColumnRenamed("id", id_col)


def near_dup_video_pairs(
    signatures: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    min_matching_frames: int = 2,
    offset_grain_s: float = 1.0,
    max_bucket: int = 10_000,
) -> DataFrame:
    """(id_a, id_b, matching_frames, t_offset_s) for videos sharing ≥
    ``min_matching_frames`` keyframes at a CONSISTENT time offset —
    the image tier's pigeonhole band join per frame plus the audio
    tier's alignment vote (a re-encoded or trimmed copy of the same
    footage concentrates its frame matches on one offset; coincidental
    single-frame collisions don't). Shuffle budget: band equi-joins +
    two map-side groupBys."""
    frames = signatures.filter(F.col("phash").isNotNull()).select(
        F.col(id_col).alias("vid"), F.col("timestamp_s").alias("ts"),
        F.col("phash").alias("hv"))
    n_bands = max_hamming + 1
    width = 64 // n_bands
    bands = []
    for b in range(n_bands):
        shift = b * width
        w = width if b < n_bands - 1 else 64 - shift
        bval = F.shiftrightunsigned(F.col("hv"), shift)
        if w < 64:
            bval = bval.bitwiseAND(F.lit((1 << w) - 1))
        bands.append(frames.select("vid", "ts", "hv",
                                   F.lit(b).alias("band"),
                                   bval.alias("bval")))
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    sized = banded.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("band", "bval")))
    banded = sized.filter(F.col("bsz") <= max_bucket).drop("bsz")
    left = banded.select("band", "bval", F.col("vid").alias("id_a"),
                         F.col("ts").alias("ta"), F.col("hv").alias("ha"))
    right = banded.select("band", "bval", F.col("vid").alias("id_b"),
                          F.col("ts").alias("tb"), F.col("hv").alias("hb"))
    grain = float(offset_grain_s)
    matches = (
        left.join(right, on=["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                <= max_hamming)
        .select("id_a", "id_b", "ta", "tb",
                F.round((F.col("tb") - F.col("ta")) / grain)
                .cast("long").alias("obin"))
        .distinct()  # one frame pair may agree on several bands
        .groupBy("id_a", "id_b", "obin")
        .agg(F.count("*").alias("matching_frames"))
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("matching_frames").desc(), F.col("obin"))
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1)
                & (F.col("matching_frames") >= min_matching_frames))
        .select("id_a", "id_b", "matching_frames",
                (F.col("obin") * grain).alias("t_offset_s"))
    )
