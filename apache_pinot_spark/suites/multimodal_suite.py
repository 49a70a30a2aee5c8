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


def _features_and_frames(spark, sf_dir):
    # decode_stub=True pinned: the driver hash-compares against a sha/size
    # oracle, which must not change if an imaging library appears in the
    # environment (the real-decode path is covered by pytest instead)
    feats = multimodal.extract_image_features(_media(spark, sf_dir), decode_stub=True)
    feat_rows = feats.select(
        F.lit("feat").alias("part"),
        "media_id",
        F.col("n_bytes").cast("long").alias("metric_i"),
        F.lit(None).cast("double").alias("metric_d"),
        F.col("digest").alias("metric_s"),
    )
    # round-9 fold of mm_frame_sampling: metadata-arithmetic frame
    # sampling rides the same slot as the binary featurize (the two
    # multimodal plumbing checks share the documents scan)
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vids = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 60 + 1).cast("double").alias("duration_s"),
        F.lit(24.0).alias("fps"),
    ).filter(F.col("media_id") < 50)
    frames = multimodal.sample_video_frames(vids, every_n_seconds=2.5)
    frame_rows = frames.select(
        F.lit("frame").alias("part"),
        "media_id",
        F.col("frame_index").cast("long").alias("metric_i"),
        F.round("timestamp_s", 4).alias("metric_d"),
        F.lit(None).cast("string").alias("metric_s"),
    )
    return feat_rows.unionByName(frame_rows).orderBy(
        "part", "media_id", "metric_i"
    )


df_query(
    "mm_feature_extract",
    _features_and_frames,
    """
    WITH feat AS (
      SELECT 'feat' AS part, doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS metric_i,
             CAST(NULL AS DOUBLE) AS metric_d,
             sha256(text) AS metric_s
      FROM documents
    ),
    vids AS (
      SELECT doc_id AS media_id,
             CAST(n_chars % 60 + 1 AS DOUBLE) AS duration_s, 24.0 AS fps
      FROM documents WHERE doc_id < 50
    ),
    idx AS (
      SELECT media_id, duration_s, fps, u.i AS sample_i
      FROM vids, LATERAL (
        SELECT unnest(range(0, CAST(floor(duration_s / 2.5) AS BIGINT) + 1)) AS i
      ) u
    ),
    frames AS (
      SELECT 'frame' AS part, media_id,
             CAST(floor(sample_i * 2.5 * fps) AS BIGINT) AS metric_i,
             round(sample_i * 2.5, 4) AS metric_d,
             CAST(NULL AS VARCHAR) AS metric_s
      FROM idx
    )
    SELECT * FROM feat
    UNION ALL
    SELECT * FROM frames
    ORDER BY part, media_id, metric_i
    """,
    tables=["documents"],
    doc="Multimodal plumbing in one slot: binary-column featurize via "
        "Arrow mapInPandas (decode stubbed; digest+size oracle-checked, "
        "feature floats covered in tests) + video frame-sampling from "
        "duration/fps metadata (pure JVM arithmetic, explode per frame; "
        "r9 fold of mm_frame_sampling)",
)
