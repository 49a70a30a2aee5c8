"""Audio fingerprinting + audio near-dup — the constellation-hash
algorithm of Wang 2003 ("An Industrial-Strength Audio Search
Algorithm", the Shazam paper): spectrogram peaks are paired into
(f_anchor, Δf, Δt) landmark hashes whose TIME-ALIGNED co-occurrence
counts identify the same recording across amplitude scaling, offset
clipping, re-encoding, and additive noise. For a training-data
pipeline this is the audio twin of the image pHash tier: podcast/speech
corpora recirculate the same audio under different trims and loudness.

Decode rides the repo's own audio tier (stdlib WAV, operators/flac) —
the fingerprint is available wherever the PCM tier is; other formats
reject to the NULL stream as usual.

Pipeline shape:
  1. ``audio_fingerprints`` — one Arrow map pass per blob: mono mix →
     Hann STFT (numpy FFT) → log-magnitude → per-neighborhood peak
     picking (vectorized shift-compare, no scipy) → anchor/target
     pairing in a bounded (Δt, Δf) fan-out zone → rows
     (id, fp_hash, t_anchor). Bounded: peaks per frame and fan-out per
     anchor are capped, so rows ≤ frames × caps.
  2. ``audio_near_dup_pairs`` — self-join on fp_hash (the selective
     key), then the Wang vote: a true match concentrates on ONE time
     offset, so pairs are scored by their max-offset-bin count, not
     raw hash collisions. groupBy((id_a, id_b, Δt)) → max vote per
     pair → threshold. Hash buckets are capped like the LSH tiers.

Scale shape: fingerprinting is per-row map-side (Arrow, zero shuffle);
matching is one equi-join on a high-entropy key + two map-side-combined
groupBys — the text-LSH shuffle budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME = 1024
HOP = 512
#: landmark pairing zone (frames ahead, |freq-bin delta|) and caps
FANOUT_DT = (3, 48)
FANOUT_MAX = 8
PEAKS_PER_FRAME = 3


def _decode_pcm(blob: bytes):
    """(mono float64 array, sample_rate) via the stdlib WAV reader or
    the repo's FLAC decoder; raises for anything else."""
    import io
    import wave

    import numpy as np

    if blob[:4] == b"RIFF":
        with wave.open(io.BytesIO(blob), "rb") as w:
            nch, sw, rate, nframes = w.getparams()[:4]
            raw = w.readframes(nframes)
        if sw == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif sw == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif sw == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM width {sw}")
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return x, rate
    if blob[:4] == b"fLaC":
        from apache_pinot_spark.operators.flac import decode_flac, parse_flac

        info = parse_flac(blob)
        pcm, rate = decode_flac(blob)
        x = pcm.astype("float64").mean(axis=1) / float(
            1 << (info.bits_per_sample - 1))
        return x, rate
    raise ValueError("not a WAV/FLAC blob")


def fingerprint_pcm(x, peaks_per_frame: int = PEAKS_PER_FRAME,
                    fanout_dt=FANOUT_DT, fanout_max: int = FANOUT_MAX):
    """[(fp_hash, t_anchor_frame)] for a mono float array — the
    constellation landmarks. Deterministic; amplitude-scale invariant
    (peaks are argmax positions, untouched by gain)."""
    import numpy as np

    n = (len(x) - FRAME) // HOP + 1
    if n < 2:
        return []
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n)[:, None]
    frames = np.asarray(x)[idx] * np.hanning(FRAME)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    spec = np.log(mag + 1e-10)
    # top-k bins per frame that are also local maxima along frequency
    left = np.roll(spec, 1, axis=1)
    right = np.roll(spec, -1, axis=1)
    is_peak = (spec > left) & (spec >= right)
    is_peak[:, 0] = is_peak[:, -1] = False
    cand = np.where(is_peak, spec, -np.inf)
    order = np.argsort(-cand, axis=1)[:, :peaks_per_frame]
    peaks = []  # (t, f)
    for t in range(n):
        for f in order[t]:
            if np.isfinite(cand[t, f]):
                peaks.append((t, int(f)))
    out = []
    lo, hi = fanout_dt
    by_frame: dict = {}
    for t, f in peaks:
        by_frame.setdefault(t, []).append(f)
    for t, f in peaks:
        made = 0
        for dt in range(lo, hi + 1):
            for f2 in by_frame.get(t + dt, ()):
                df = f2 - f
                if abs(df) > 255:
                    continue
                h = (f << 18) | ((df & 0x1FF) << 9) | dt
                out.append((h, t))
                made += 1
                if made >= fanout_max:
                    break
            if made >= fanout_max:
                break
    return out


def audio_fingerprints(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, fp_hash, t) landmark rows per decodable blob;
    undecodable blobs emit ONE all-NULL row (the reject convention).
    One Arrow map pass, zero shuffle."""
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.audiofp import (
            _decode_pcm,
            fingerprint_pcm,
        )

        for pdf in batches:
            ids, hs, ts = [], [], []
            for mid, blob in zip(pdf["id"], pdf["c"]):
                try:
                    x, _rate = _decode_pcm(
                        bytes(blob) if blob is not None else b"")
                    marks = fingerprint_pcm(x)
                except Exception:
                    marks = None
                if not marks:
                    ids.append(mid)
                    hs.append(None)
                    ts.append(None)
                    continue
                for h, t in marks:
                    ids.append(mid)
                    hs.append(h)
                    ts.append(t)
            yield _pd.DataFrame({"id": ids, "fp_hash": hs, "t": ts})

    out = src.mapInPandas(
        run, schema=f"id {id_type}, fp_hash BIGINT, t INT")
    return out.withColumnRenamed("id", id_col)


def audio_near_dup_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    min_votes: int = 20,
    max_bucket: int = 5_000,
) -> DataFrame:
    """(id_a, id_b, votes, t_offset) for recordings sharing ≥
    ``min_votes`` landmarks AT THE SAME TIME OFFSET — the Wang
    alignment vote that separates true copies from coincidental hash
    collisions. One hash equi-join (buckets capped) + two map-side
    groupBys."""
    h = fps.filter(F.col("fp_hash").isNotNull()) \
        .select(F.col(id_col).alias("hid"), "fp_hash", "t")
    from pyspark.sql import Window

    sized = h.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("fp_hash")))
    h = sized.filter(F.col("bsz") <= max_bucket).drop("bsz")
    left = h.select(F.col("hid").alias("id_a"), "fp_hash",
                    F.col("t").alias("ta"))
    right = h.select(F.col("hid").alias("id_b"), "fp_hash",
                     F.col("t").alias("tb"))
    votes = (
        left.join(right, on="fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("tb") - F.col("ta")).alias("t_offset"))
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("votes").desc(), F.col("t_offset"))
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("votes") >= min_votes))
        .drop("_rn")
    )
