"""Time-series gapfill — densify missing time buckets per series and
fill their values, aggregation-native.

The reference docs mirror does not cover it, but the public system
ships a Gapfill transformation (GAPFILL(ts, format, start, end,
bucket, FILL(col, mode), TIMESERIESON(keys))): after bucketing a time
series, every bucket in [start, end) must exist for every series, with
missing buckets' values filled by FILL_PREVIOUS_VALUE (carry last
observation forward) or FILL_DEFAULT_VALUE (constant). Those are the
two public fill modes; both are implemented here, same names.

Spark mapping (scale-first):

  * The dense (series × bucket) grid is generated with
    sequence()+explode over the DISTINCT series frame — never over raw
    rows, so grid cost is #series × #buckets regardless of input size.
    The aggregate that produces per-bucket observations is the only
    full-data shuffle.
  * The grid joins observations on (series, bucket). Both sides are
    post-aggregation; the join shuffles only aggregated rows, and AQE
    broadcasts the smaller side when it fits.
  * FILL_PREVIOUS_VALUE is `last(value, ignorenulls=True)` over a
    per-series window ordered by bucket — one extra shuffle on the
    series key over the already-dense (still aggregated) frame. At
    100 TB the dense frame is #series × #buckets rows, which is the
    OUTPUT size; any engine must materialize it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FILL_MODES = ("FILL_PREVIOUS_VALUE", "FILL_DEFAULT_VALUE")


def gapfill(
    df: DataFrame,
    time_col: str,
    bucket_ms: int,
    start_ms: int,
    end_ms: int,
    key_cols: list[str],
    aggs: dict[str, Column],
    fill: dict[str, tuple[str, object]] | None = None,
) -> DataFrame:
    """Bucket ``df`` into ``bucket_ms`` buckets over [start_ms, end_ms),
    one row per (series, bucket) with NO gaps.

    ``aggs`` maps output column → aggregate over that bucket's rows
    (e.g. {"v": F.sum("value")}). ``fill`` maps output column →
    (mode, default): mode FILL_PREVIOUS_VALUE carries the last observed
    value forward (default used before the first observation — pass
    None to leave leading buckets null); FILL_DEFAULT_VALUE uses the
    constant for every empty bucket. Unlisted columns stay null in
    filled rows. ``time_col`` must be epoch-ms (the engine's normalized
    time, plans/schema.normalized_time).

    Output: (*key_cols, bucket_ms_start, *aggs) ordered by nothing —
    order downstream if needed. NULL series keys are not supported (the
    grid join is an equi-join, where NULL never matches) — coalesce or
    filter them upstream.
    """
    if bucket_ms <= 0 or end_ms <= start_ms:
        raise ValueError("gapfill needs bucket_ms > 0 and end_ms > start_ms")
    for col, (mode, _default) in (fill or {}).items():
        if mode not in FILL_MODES:
            raise ValueError(f"unknown fill mode {mode!r} for {col!r}; expected {FILL_MODES}")
        if col not in aggs:
            raise ValueError(f"fill column {col!r} is not an output aggregate")

    ts = F.col(time_col).cast("long")
    bucket = (F.floor((ts - start_ms) / bucket_ms) * bucket_ms + start_ms).cast("long")
    in_range = df.where((ts >= start_ms) & (ts < end_ms))
    observed = (
        in_range.groupBy(*key_cols, bucket.alias("bucket_ms_start"))
        .agg(*[a.alias(c) for c, a in aggs.items()])
    )

    # Dense grid from the DISTINCT series, not from raw rows.
    series = in_range.select(*key_cols).distinct()
    grid = series.select(
        "*",
        F.explode(
            F.sequence(F.lit(start_ms), F.lit(end_ms - 1), F.lit(bucket_ms))
        ).alias("bucket_ms_start"),
    )
    dense = grid.join(observed, [*key_cols, "bucket_ms_start"], "left")

    out_cols = list(aggs)
    for col, (mode, default) in (fill or {}).items():
        if mode == "FILL_DEFAULT_VALUE":
            dense = dense.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
        else:  # FILL_PREVIOUS_VALUE
            w = (
                Window.partitionBy(*key_cols)
                .orderBy("bucket_ms_start")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            carried = F.last(F.col(col), ignorenulls=True).over(w)
            if default is not None:
                carried = F.coalesce(carried, F.lit(default))
            dense = dense.withColumn(col, carried)
    return dense.select(*key_cols, "bucket_ms_start", *out_cols)
