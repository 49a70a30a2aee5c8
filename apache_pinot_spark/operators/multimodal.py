"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_stub=True` (default) produces a deterministic fake derived from the
content bytes so the full pipeline — schema, partitioning, batch shapes,
UDF signatures — is real and testable; `decode_stub=False` raises
NotImplementedError at the exact point a real decoder (PIL/libav) plugs in.

Scale design: mapInPandas streams Arrow record batches — content bytes
never materialize on the driver; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds executor memory per batch (set it small for large blobs, e.g. 64).
Frame sampling for video is pure metadata arithmetic (no decode) and
stays in JVM expressions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_features(content: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real feature extractor: n floats in
    [0,1) derived from the content digest."""
    d = hashlib.sha256(content or b"").digest()
    return [int.from_bytes(d[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(n)]


def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decode_stub: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + featurize images via mapInPandas (Arrow batches).

    Real pipeline shape: batches of (id, content) → decoded pixels →
    feature vector. The decode is the only stubbed step.
    """

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("digest", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    # The worker function must be SELF-CONTAINED: every import happens
    # inside and no module-level symbol is referenced, so cloudpickle
    # ships it by value and executors never need this package importable.
    def run(batches):
        import hashlib as _hl

        import pandas as _pd

        def _feats(content, n):
            d = _hl.sha256(content or b"").digest()
            return [int.from_bytes(d[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(n)]

        for pdf in batches:
            if not decode_stub:
                # Plug point for a real decoder:
                #   from PIL import Image; Image.open(io.BytesIO(b)) ...
                raise NotImplementedError(
                    "image decode requires an imaging library not present in this container"
                )
            contents = pdf[content_col]
            yield _pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": contents.map(lambda b: len(b or b"")).astype("int32"),
                    "digest": contents.map(
                        lambda b: _hl.sha256(b or b"").hexdigest()
                    ),
                    "features": contents.map(lambda b: _feats(b, feature_dim)),
                }
            )

    src = df.select(id_col, content_col)
    # single-file inputs scan as ONE partition — fan out so Arrow batches
    # stream to every core (at cluster scale this is a cheap rebalance)
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    meta_col: str = "meta",
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing: output schema mirrors input with updated metadata;
    content passes through untouched in stub mode (a real impl re-encodes)."""
    if not decode_stub:
        raise NotImplementedError("image resize requires an imaging library")
    return df.withColumn(
        meta_col,
        F.struct(
            F.col(f"{meta_col}.format").alias("format"),
            F.lit(target_w).alias("width"),
            F.lit(target_h).alias("height"),
        ),
    )


def sample_video_frames(
    df: DataFrame,
    every_n_seconds: float,
    duration_col: str = "duration_s",
    fps_col: str = "fps",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan: (media_id, frame_index, timestamp_s) rows from
    duration/fps metadata — pure JVM arithmetic, the decode of the chosen
    frames is downstream (stubbed). One row per sampled frame via explode."""
    n_samples = F.floor(F.col(duration_col) / F.lit(every_n_seconds)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_samples, F.lit(0)))
    return (
        df.select(F.col(id_col), F.col(fps_col), F.explode(idx).alias("sample_i"))
        .select(
            id_col,
            (F.col("sample_i") * F.lit(every_n_seconds)).alias("timestamp_s"),
            F.floor(F.col("sample_i") * F.lit(every_n_seconds) * F.col(fps_col)).alias(
                "frame_index"
            ),
        )
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_samples", T.LongType()),
                ]
            ),
        ),
    ]
)


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decode_stub: bool = True,
    n_bands: int = 8,
) -> DataFrame:
    """Decode + featurize audio via mapInPandas (Arrow batches): the real
    pipeline shape is bytes → PCM decode → per-band energies. Decode is
    the stubbed step (no audio libs in the container); the stub derives a
    deterministic per-band energy profile from byte-range sums so schema,
    batch flow, and downstream joins are fully testable."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("band_energy", T.ArrayType(T.DoubleType())),
        ]
    )

    # Self-contained worker (imports inside; no module symbols) — executors
    # must not need this package importable.
    def run(batches):
        import pandas as _pd

        def _bands(b, n):
            b = b or b"\x00"
            step = max(len(b) // n, 1)
            out = []
            for i in range(n):
                chunk = b[i * step : (i + 1) * step] or b"\x00"
                out.append(sum(chunk) / (255.0 * len(chunk)))
            return out

        for pdf in batches:
            if not decode_stub:
                # Plug point for a real decoder (e.g. soundfile/libav):
                raise NotImplementedError(
                    "audio decode requires an audio library not present in this container"
                )
            contents = pdf[content_col]
            yield _pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": contents.map(lambda b: len(b or b"")).astype("int32"),
                    "band_energy": contents.map(lambda b: _bands(b, n_bands)),
                }
            )

    src = df.select(id_col, content_col)
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(run, schema=out_schema)


def chunk_audio(
    df: DataFrame,
    chunk_seconds: float,
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Chunking plan for audio: (media_id, chunk_index, start_s, end_s,
    start_sample, end_sample) rows from sample-rate/sample-count metadata —
    pure JVM arithmetic like video frame sampling; the per-chunk decode is
    downstream (stubbed). One row per chunk via explode."""
    duration = F.col(f"{meta_col}.n_samples") / F.col(f"{meta_col}.sample_rate")
    n_chunks = F.ceil(duration / F.lit(chunk_seconds)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    start = F.col("chunk_index") * F.lit(chunk_seconds)
    end = F.least(start + F.lit(chunk_seconds), duration)
    return (
        df.select(
            F.col(id_col),
            F.col(f"{meta_col}.sample_rate").alias("__sr"),
            F.col(f"{meta_col}.n_samples").alias("__ns"),
            F.explode(idx).alias("chunk_index"),
        )
        .select(
            id_col,
            "chunk_index",
            start.alias("start_s"),
            F.least(
                start + F.lit(chunk_seconds), F.col("__ns") / F.col("__sr")
            ).alias("end_s"),
            (start * F.col("__sr")).cast("long").alias("start_sample"),
            F.least(
                ((start + F.lit(chunk_seconds)) * F.col("__sr")).cast("long"),
                F.col("__ns"),
            ).alias("end_sample"),
        )
    )
