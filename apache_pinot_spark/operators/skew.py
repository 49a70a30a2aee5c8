"""Skew mitigation utilities — salting for hot keys where AQE's runtime
skew-join split cannot help (aggregations; joins disabled from AQE).

The engine's first line of defense is AQE (`spark.sql.adaptive.
skewJoin.enabled`, on in the session factory): at runtime Spark splits
oversized shuffle partitions of sort-merge joins. Two cases need manual
salting at 100 TB:

  * Hot-key GROUP BY: one key holding 1% of 100 TB lands 1 TB on a
    single reducer. `salted_aggregate` does a two-level aggregate —
    partial per (key, salt), final per key — so the hot key fans out
    over `salt_buckets` reducers. Exact for algebraic aggregates.
  * Broadcast-ineligible joins against a skewed build side where AQE's
    split heuristics miss. `salt_join` replicates the small side
    `salt_buckets` times and salts the big side — classic replicate-salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Uniform random-ish salt derived from a whole-row hash (no RNG
    state; deterministic for a deterministic input)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-level skew-safe aggregation for algebraic aggregates
    (count/sum/min/max): partial per (group, salt), final merge per
    group. ``aggs`` maps output alias → partial aggregate Column; the
    final merge re-aggregates with SUM for counts/sums and MIN/MAX for
    extremes, inferred from the partial's name — pass explicit merges via
    (partial, merge_fn) tuples for anything else."""
    partial_exprs = []
    merge_exprs = []
    for alias, spec in aggs.items():
        partial, merge_fn = spec if isinstance(spec, tuple) else (spec, None)
        partial_exprs.append(partial.alias(f"__p_{alias}"))
        if merge_fn is None:
            name = str(partial._jc).lower()
            if name.startswith("min"):
                merge_fn = F.min
            elif name.startswith("max"):
                merge_fn = F.max
            else:  # count/sum partials merge by SUM
                merge_fn = F.sum
        merge_exprs.append(merge_fn(f"__p_{alias}").alias(alias))
    salted = with_salt(df, salt_buckets)
    partials = salted.groupBy(*group_cols, SALT_COL).agg(*partial_exprs)
    return partials.groupBy(*group_cols).agg(*merge_exprs)


def salt_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate-salt join: salt the BIG side, replicate the SMALL side
    once per salt bucket, join on (key, salt). Breaks a hot join key
    across ``salt_buckets`` reducers at the cost of replicating the small
    side's shuffle volume ×salt_buckets — use when the small side is too
    big to broadcast but far smaller than the skewed side."""
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    small_r = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("bigint"))
    return big_s.join(small_r, on=[on, SALT_COL], how=how).drop(SALT_COL)
