"""Driver-gate queries for the table lifecycle surface: batch ingestion
round-trip (S1), star-tree rollup rewrite (A12), hybrid time-boundary
federation (ST3), JSON_MATCH array-context ([*]) semantics (P8), and
SIMPLE_DATE_FORMAT normalization (F5) — each verified against a DuckDB
oracle computed directly on the raw tables."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.functions.json import json_match
from apache_pinot_spark.plans.rollup import AggRequest, RollupSpec, answer_from_rollup, build_rollup
from apache_pinot_spark.plans.schema import PinotSchema
from apache_pinot_spark.querysuite import df_query
from apache_pinot_spark.sources import batch as B

_WH = os.path.join(tempfile.gettempdir(), "pinot_spark_suite_wh")

_EVENTS_SCHEMA = PinotSchema.from_json(
    {
        "schemaName": "events",
        "dimensionFieldSpecs": [
            {"name": "event_id", "dataType": "LONG"},
            {"name": "user_id", "dataType": "LONG"},
            {"name": "event_type", "dataType": "STRING"},
            {"name": "props", "dataType": "JSON"},
        ],
        "metricFieldSpecs": [{"name": "value", "dataType": "DOUBLE"}],
        "dateTimeFieldSpecs": [
            {
                "name": "ts_ms",
                "dataType": "LONG",
                "format": "1:MILLISECONDS:EPOCH",
                "granularity": "1:DAYS",
            }
        ],
    }
)


def _events_ms(spark: SparkSession, sf_dir: str):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.withColumn("ts_ms", F.unix_millis(F.col("ts").cast("timestamp")))


# --------------------------------------------------------------------------
# S1 — ingest round-trip: raw events → typed/sentinel/partitioned segment
# store → read back and aggregate. The oracle aggregates the raw table
# directly; equality proves the ingest pipeline is lossless.
# --------------------------------------------------------------------------


def _ingest_roundtrip(spark, sf_dir):
    cfg = B.TableConfig(
        table_name="events_rt_" + os.path.basename(sf_dir.rstrip("/")).replace(".", "_"),
        time_column="ts_ms",
        partition_granularity="1:DAYS",
        sorted_column="user_id",
        bloom_filter_columns=["event_type"],
        timestamp_index_granularities={"ts_ms": ["DAY"]},
    )
    path = B.ingest_batch(
        spark, _EVENTS_SCHEMA, cfg, _events_ms(spark, sf_dir), warehouse=_WH, mode="overwrite"
    )
    df = spark.read.parquet(path)
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("user_id").alias("users"),
            F.min("ts_ms").alias("min_ts"),
            F.max("ts_ms").alias("max_ts"),
        )
        .orderBy("event_type")
    )


df_query(
    "s1_ingest_roundtrip",
    _ingest_roundtrip,
    """
    SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS users,
           MIN(CAST(epoch_ms(ts) AS BIGINT)) AS min_ts,
           MAX(CAST(epoch_ms(ts) AS BIGINT)) AS max_ts
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tables=["events"],
    doc="S1 batch ingestion round-trip through the time-bucketed segment store",
)

# --------------------------------------------------------------------------
# A12 — star-tree rollup: build the pre-aggregate, answer from it, compare
# against the raw-table oracle. Proves partial-merge correctness.
# --------------------------------------------------------------------------


def _rollup_answer(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    # per-SF table tag: correctness (sf0.01) and bench (sf0.1) must not
    # overwrite each other's materialized rollup in the shared warehouse
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    spec = RollupSpec(
        table=f"lineitem_{tag}",
        dimensions=["l_returnflag", "l_linestatus"],
        metrics=["l_quantity"],
    )
    build_rollup(spark, li, spec, warehouse=_WH)
    out = answer_from_rollup(
        spark,
        spec,
        ["l_returnflag"],
        [
            AggRequest("COUNT", None, "cnt"),
            AggRequest("SUM", "l_quantity", "sum_qty"),
            AggRequest("MIN", "l_quantity", "min_qty"),
            AggRequest("MAX", "l_quantity", "max_qty"),
            AggRequest("AVG", "l_quantity", "avg_qty"),
        ],
    )
    return out.withColumn("avg_qty", F.round("avg_qty", 6)).orderBy("l_returnflag")


df_query(
    "a12_rollup_preagg",
    _rollup_answer,
    """
    SELECT l_returnflag, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tables=["lineitem"],
    doc="A12 star-tree pre-aggregation: group-by answered from merged partials",
)

# --------------------------------------------------------------------------
# ST3 — hybrid time boundary: offline half < boundary, realtime half >=
# boundary, one logical table (Architecture.md:206-212). Batch-expressible
# so the oracle can federate the same way.
# --------------------------------------------------------------------------

_BOUNDARY = "2024-01-15 00:00:00"


def _hybrid(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    offline = ev.filter(F.col("ts") < F.lit(_BOUNDARY))
    realtime = ev.filter(F.col("ts") >= F.lit(_BOUNDARY))
    hybrid = offline.unionByName(realtime)
    return (
        hybrid.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type")
    )


df_query(
    "st3_hybrid_boundary",
    _hybrid,
    f"""
    WITH offline AS (SELECT * FROM events WHERE ts < TIMESTAMP '{_BOUNDARY}'),
         realtime AS (SELECT * FROM events WHERE ts >= TIMESTAMP '{_BOUNDARY}')
    SELECT event_type, COUNT(*) AS cnt FROM (
      SELECT * FROM offline UNION ALL SELECT * FROM realtime
    ) GROUP BY event_type ORDER BY event_type
    """,
    tables=["events"],
    doc="ST3 hybrid offline/realtime federation at the time boundary",
)

# --------------------------------------------------------------------------
# P8 — JSON_MATCH array context over constructed JSON documents: one doc
# per order carrying its lineitems as a JSON array. The [*] same-element
# rule (json-index.md:404-434) must find orders with a lineitem that has
# BOTH qty >= 49 AND returnflag 'R'; the oracle states the same predicate
# relationally with EXISTS.
# --------------------------------------------------------------------------


def _json_array_context(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    docs = (
        li.groupBy("l_orderkey")
        .agg(
            F.to_json(
                F.struct(
                    F.collect_list(
                        F.struct(
                            F.col("l_quantity").alias("qty"),
                            F.col("l_returnflag").alias("flag"),
                        )
                    ).alias("items")
                )
            ).alias("doc")
        )
    )
    schema = "struct<items:array<struct<qty:double,flag:string>>>"
    matched = docs.filter(
        json_match("doc", '"$.items[*].qty">=49 AND "$.items[*].flag"=\'R\'', schema)
    )
    return matched.agg(
        F.count("*").alias("matched_orders"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


df_query(
    "p8_json_array_context",
    _json_array_context,
    """
    WITH hit AS (
      SELECT DISTINCT l_orderkey FROM lineitem
      WHERE l_quantity >= 49 AND l_returnflag = 'R'
    )
    SELECT COUNT(*) AS matched_orders, MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key
    FROM hit
    """,
    tables=["lineitem"],
    doc="P8 JSON_MATCH maintained array context (json-index.md:404-434): "
        "both [*] predicates bind the same element",
)

# --------------------------------------------------------------------------
# F5 — SIMPLE_DATE_FORMAT normalization: yyyyMMdd string → timestamp →
# epoch-day buckets, the ingest-time datetime machinery (schema.md:70-71).
# --------------------------------------------------------------------------


def _sdf_normalize(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    raw = ev.select(F.date_format("ts", "yyyyMMdd").alias("d8"), "event_id")
    from apache_pinot_spark.plans.schema import DateTimeFormat

    fmt = DateTimeFormat.parse("1:DAYS:SIMPLE_DATE_FORMAT:yyyyMMdd")
    return (
        raw.select(fmt.epoch_millis(F.col("d8")).alias("day_ms"))
        .groupBy("day_ms")
        .agg(F.count("*").alias("cnt"))
        .orderBy("day_ms")
    )


df_query(
    "f5_simple_date_format",
    _sdf_normalize,
    """
    SELECT CAST(epoch_ms(strptime(strftime(ts, '%Y%m%d'), '%Y%m%d')) AS BIGINT) AS day_ms,
           COUNT(*) AS cnt
    FROM events GROUP BY 1 ORDER BY day_ms
    """,
    tables=["events"],
    doc="F5 SIMPLE_DATE_FORMAT parse path (schema.md:70): yyyyMMdd → epoch millis",
)

# --------------------------------------------------------------------------
# A13 — pivot (OLAP slice/dice surface, Introduction.md:65): group-by one
# dim, pivot a low-cardinality dim into columns. Decimal-exact sums.
# --------------------------------------------------------------------------


def _pivot(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    from pyspark.sql import functions as PF

    return (
        li.withColumn("q", PF.col("l_quantity").cast("decimal(28,6)"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(PF.sum("q"))
        .select(
            "l_returnflag",
            PF.coalesce(PF.col("F"), PF.lit(0)).cast("double").alias("sum_F"),
            PF.coalesce(PF.col("O"), PF.lit(0)).cast("double").alias("sum_O"),
        )
        .orderBy("l_returnflag")
    )


df_query(
    "a13_pivot",
    _pivot,
    """
    SELECT l_returnflag,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(28,6)) END), 0) AS DOUBLE) AS sum_F,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(28,6)) END), 0) AS DOUBLE) AS sum_O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tables=["lineitem"],
    doc="A13 pivot: groupBy().pivot() quantity matrix by return flag × line status",
)
