"""Driver-gate queries for the multimodal column plumbing
(operators/multimodal.py): binary content columns + typed metadata, Arrow-
batched mapInPandas feature extraction (decode stubbed — no imaging libs
in the container), and metadata-only video frame sampling.

The binary "media" fixture derives deterministically from the documents
table (text bytes as content), so every engine sees identical blobs and
the sha/byte-length oracle reproduces in DuckDB."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.operators import multimodal
from apache_pinot_spark.querysuite import df_query


def _media(spark: SparkSession, sf_dir: str):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
    )


def _features(spark, sf_dir):
    # decode_stub=True pinned: the driver hash-compares against a sha/size
    # oracle, which must not change if an imaging library appears in the
    # environment (the real-decode path is covered by pytest instead)
    feats = multimodal.extract_image_features(_media(spark, sf_dir), decode_stub=True)
    return feats.select("media_id", "n_bytes", "digest").orderBy("media_id")


df_query(
    "mm_feature_extract",
    _features,
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS digest
    FROM documents ORDER BY media_id
    """,
    tables=["documents"],
    doc="Binary-column featurize via Arrow mapInPandas (decode stubbed); "
        "digest+size oracle-checked, feature floats covered in tests",
)


def _frame_sampling(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vids = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 60 + 1).cast("double").alias("duration_s"),
        F.lit(24.0).alias("fps"),
    ).filter(F.col("media_id") < 50)
    frames = multimodal.sample_video_frames(vids, every_n_seconds=2.5)
    return frames.select(
        "media_id",
        F.round("timestamp_s", 4).alias("timestamp_s"),
        F.col("frame_index").cast("long").alias("frame_index"),
    ).orderBy("media_id", "frame_index")


df_query(
    "mm_frame_sampling",
    _frame_sampling,
    """
    WITH vids AS (
      SELECT doc_id AS media_id,
             CAST(n_chars % 60 + 1 AS DOUBLE) AS duration_s, 24.0 AS fps
      FROM documents WHERE doc_id < 50
    ),
    idx AS (
      SELECT media_id, duration_s, fps, u.i AS sample_i
      FROM vids, LATERAL (
        SELECT unnest(range(0, CAST(floor(duration_s / 2.5) AS BIGINT) + 1)) AS i
      ) u
    )
    SELECT media_id,
           round(sample_i * 2.5, 4) AS timestamp_s,
           CAST(floor(sample_i * 2.5 * fps) AS BIGINT) AS frame_index
    FROM idx ORDER BY media_id, frame_index
    """,
    tables=["documents"],
    doc="Video frame-sampling plan from duration/fps metadata (pure JVM "
        "arithmetic, explode per sampled frame)",
)
