"""Windowed top-k — "top k keys per time bucket by metric", the
leaderboard shape OLAP dashboards run constantly (top pages per hour,
top talkers per minute).

Scale design: the expensive part must be the AGGREGATE, never the
rank. Stage 1 reduces the raw stream to one row per (bucket, key) via
groupBy with map-side partial aggregation — at 100 TB this is the only
full-data shuffle, on (bucket, key), which AQE skew-splits. Stage 2
ranks WITHIN each bucket over the already-aggregated frame (cardinality
= buckets × distinct keys, orders of magnitude smaller); row_number's
per-bucket sort spills if a bucket's key space is huge, which is the
correct degradation. Do not be tempted to collect_list-and-slice per
bucket instead: collect_list's partial buffers hold every key of the
bucket in memory at once, while the window sort spills.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def windowed_topk(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    key_cols: list[str],
    metric: Column,
    k: int,
    slide_duration: str | None = None,
) -> DataFrame:
    """Top ``k`` ``key_cols`` groups per tumbling (or sliding) time
    bucket, ranked by ``metric`` (an aggregate Column, e.g.
    F.sum("value")). Ties break deterministically by key. Output:
    (window_start, window_end, *key_cols, metric, rank).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        F.window(F.col(time_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(time_col), window_duration)
    )
    agg = df.groupBy(w.alias("__w"), *key_cols).agg(metric.alias("metric"))
    rank_w = Window.partitionBy("__w").orderBy(
        F.col("metric").desc(), *[F.col(c) for c in key_cols]
    )
    return (
        agg.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *key_cols,
            "metric",
            "rank",
        )
    )
