"""Star-tree-style pre-aggregation (SURVEY §2.3 A12, §4).

Reference: "smart indexes and pre-aggregation" (Introduction.md:9), the
star-tree index (basics/indexing/README.md:16, Architecture.md:17) —
pre-aggregated documents so group-by queries over covered dimension
subsets skip the raw scan.

Spark design: the rollup is a materialized parquet table of PARTIAL
aggregates (count + sum/min/max per metric) grouped by the declared
dimension set. Any query grouping by a SUBSET of those dimensions merges
partials (SUM of sums, MIN of mins...) — the classic two-level aggregation
identity, same as Pinot's star-tree node merges. At 100 TB the rollup is
several orders of magnitude smaller than the fact table, and the rewrite
turns a full scan + shuffle into a scan of the rollup only.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COUNT_COL = "__rollup_count"


@dataclass
class RollupSpec:
    """Declared rollup: dims + metrics, like a star-tree index config."""

    table: str
    dimensions: list[str]
    metrics: list[str]  # columns with count/sum/min/max partials
    path: str = ""
    # which merged aggregates each metric supports
    functions: tuple[str, ...] = ("SUM", "MIN", "MAX", "COUNT", "AVG")
    # metric column → Spark simpleString type of the INPUT column, recorded
    # at build time so merged SUMs come back in Spark's native SUM result
    # type for that input (SUM(int) must stay LONG, not become DOUBLE)
    metric_types: dict[str, str] = field(default_factory=dict)

    def partial_columns(self, m: str) -> dict[str, str]:
        return {
            "SUM": f"__sum_{m}",
            "MIN": f"__min_{m}",
            "MAX": f"__max_{m}",
            "COUNT": f"__cnt_{m}",
        }


def build_rollup(
    spark: SparkSession,
    df: DataFrame,
    spec: RollupSpec,
    warehouse: str = "/tmp/pinot_spark_warehouse",
) -> str:
    """Materialize the rollup table. One shuffle on the dimension set —
    partial aggregation is map-side (Spark HashAggregate), so the shuffle
    carries pre-combined rows, not raw data.

    Per metric the rollup stores sum/min/max AND the non-null count
    (__cnt_m): COUNT(col) must skip NULLs and AVG(col) divides by the
    non-null count, so the total row count alone cannot answer either when
    the source has NULL metric values."""
    aggs = [F.count("*").alias(COUNT_COL)]
    for m in spec.metrics:
        # decimal-exact sums for cross-engine-stable merges of money-like
        # doubles; min/max are exact in any type
        aggs += [
            F.sum(F.col(m).cast("decimal(28,6)")).alias(f"__sum_{m}"),
            F.min(m).alias(f"__min_{m}"),
            F.max(m).alias(f"__max_{m}"),
            F.count(m).alias(f"__cnt_{m}"),
        ]
        spec.metric_types[m] = dict(df.dtypes)[m]
    rolled = df.groupBy(*spec.dimensions).agg(*aggs)
    path = os.path.join(warehouse, f"__rollup__{spec.table}__" + "_".join(spec.dimensions))
    rolled.write.mode("overwrite").parquet(path)
    spec.path = path
    return path


def rollup_df(spark: SparkSession, spec: RollupSpec) -> DataFrame:
    return spark.read.parquet(spec.path)


def append_rollup_delta(spark: SparkSession, delta_df: DataFrame, spec: RollupSpec) -> None:
    """Incremental rollup maintenance: aggregate ONLY the new rows into
    partial rows and APPEND them to the rollup table. Because
    answer_from_rollup merges partials across rollup rows anyway
    (SUM of sums, MIN of mins, SUM of counts...), appended per-batch
    partials keep every covered query EXACT with O(batch) work and zero
    recompute of history — the materialized-view-maintenance shape for
    realtime ingest (use inside a streaming foreachBatch alongside the
    segment commit; run compact_rollup periodically to re-merge the
    accumulated per-batch rows)."""
    aggs = [F.count("*").alias(COUNT_COL)]
    for m in spec.metrics:
        aggs += [
            F.sum(F.col(m).cast("decimal(28,6)")).alias(f"__sum_{m}"),
            F.min(m).alias(f"__min_{m}"),
            F.max(m).alias(f"__max_{m}"),
            F.count(m).alias(f"__cnt_{m}"),
        ]
    delta_df.groupBy(*spec.dimensions).agg(*aggs).write.mode("append").parquet(spec.path)


def compact_rollup(spark: SparkSession, spec: RollupSpec) -> None:
    """Re-merge accumulated per-batch partial rows back to one row per
    dimension combination (query results are identical before and after —
    this only bounds rollup-scan cost after many streamed batches)."""
    df = rollup_df(spark, spec)
    # merged partials keep the ORIGINAL partial-column types so future
    # append_rollup_delta rows stay schema-compatible with the files
    merged = df.groupBy(*spec.dimensions).agg(
        F.sum(COUNT_COL).cast("long").alias(COUNT_COL),
        *[
            agg
            for m in spec.metrics
            for agg in (
                F.sum(f"__sum_{m}").cast("decimal(28,6)").alias(f"__sum_{m}"),
                F.min(f"__min_{m}").alias(f"__min_{m}"),
                F.max(f"__max_{m}").alias(f"__max_{m}"),
                F.sum(f"__cnt_{m}").cast("long").alias(f"__cnt_{m}"),
            )
        ],
    )
    tmp = spec.path + ".compacting"
    merged.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(spec.path)
    os.rename(tmp, spec.path)
    spark.catalog.refreshByPath(spec.path)


@dataclass
class AggRequest:
    """One output aggregate of a user query."""

    func: str  # COUNT | SUM | MIN | MAX | AVG
    column: str | None  # None for COUNT(*)
    alias: str


def covers(spec: RollupSpec, group_dims: list[str], aggs: list[AggRequest]) -> bool:
    """True iff the rollup can answer: group dims ⊆ rollup dims and every
    aggregate merges from stored partials.

    COUNT(col) is answerable for metrics (stored non-null count __cnt_m)
    and for rollup DIMENSIONS (within a rollup row the dimension value is
    constant, so its non-null count is 0 or the row count).
    DISTINCTCOUNT(dim) is answerable for dimensions — the rollup
    enumerates every distinct dimension combination, so COUNT(DISTINCT)
    over rollup rows is exact."""
    if not set(group_dims) <= set(spec.dimensions):
        return False
    for a in aggs:
        f = a.func.upper()
        if f == "COUNT":
            if a.column is not None and a.column not in spec.dimensions and (
                a.column not in spec.metrics
            ):
                return False
            continue
        if f == "DISTINCTCOUNT":
            if a.column not in spec.dimensions:
                return False  # distinct metric values are not enumerated
            continue
        if f not in ("SUM", "MIN", "MAX", "AVG"):
            return False
        if a.column not in spec.metrics:
            return False
    return True


def _sum_result_type(input_type: str | None) -> str:
    """Spark's SUM result type for a given input column type: integral →
    LONG, float/double → DOUBLE, decimal(p,s) → widened decimal. Falls
    back to DOUBLE when the build-time type was not recorded."""
    t = (input_type or "double").lower()
    if t in ("tinyint", "smallint", "int", "bigint", "byte", "short", "long", "integer"):
        return "long"
    if t.startswith("decimal"):
        return "decimal(38,6)"
    return "double"


def answer_from_rollup(
    spark: SparkSession,
    spec: RollupSpec,
    group_dims: list[str],
    aggs: list[AggRequest],
    where_sql: str | None = None,
) -> DataFrame:
    """Merge partials: SUM←SUM(__sum), MIN←MIN(__min), MAX←MAX(__max),
    COUNT(*)←SUM(__count), COUNT(col)←SUM(__cnt_col) (NULLs skipped),
    AVG←SUM(__sum)/SUM(__cnt) (the non-null count, matching SQL AVG),
    DISTINCTCOUNT(dim)←COUNT(DISTINCT dim) over rollup rows (exact —
    every distinct dimension combination is enumerated).

    ``where_sql`` filters rollup rows BEFORE the merge — exact for
    predicates over dimension columns only (the star-tree property); the
    caller is responsible for restricting it to dimensions."""
    df = rollup_df(spark, spec)
    if where_sql:
        df = df.filter(where_sql)
    merged = []
    for a in aggs:
        f = a.func.upper()
        if f == "DISTINCTCOUNT":
            merged.append(F.countDistinct(a.column).alias(a.alias))
        elif f == "COUNT":
            if a.column is None:
                merged.append(F.sum(COUNT_COL).cast("long").alias(a.alias))
            elif a.column in spec.metrics:
                merged.append(F.sum(f"__cnt_{a.column}").cast("long").alias(a.alias))
            else:  # dimension: constant within a rollup row
                merged.append(
                    F.sum(
                        F.when(F.col(a.column).isNull(), F.lit(0)).otherwise(F.col(COUNT_COL))
                    ).cast("long").alias(a.alias)
                )
        elif f == "SUM":
            merged.append(
                F.sum(f"__sum_{a.column}")
                .cast(_sum_result_type(spec.metric_types.get(a.column)))
                .alias(a.alias)
            )
        elif f == "MIN":
            merged.append(F.min(f"__min_{a.column}").alias(a.alias))
        elif f == "MAX":
            merged.append(F.max(f"__max_{a.column}").alias(a.alias))
        elif f == "AVG":
            merged.append(
                (F.sum(f"__sum_{a.column}").cast("double") / F.sum(f"__cnt_{a.column}"))
                .alias(a.alias)
            )
    if group_dims:
        return df.groupBy(*group_dims).agg(*merged)
    return df.agg(*merged)
