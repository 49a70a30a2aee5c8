"""Driver-gate queries for JSON_MATCH (SURVEY §2.2 P8) and JSON null
semantics (P13) over the events table's props JSON column, with DuckDB
json_extract oracles.

Consolidated layout (driver checks at most 50 declared queries): every
JSON_MATCH predicate form is one count column of a shared scan; per-form
compile tests live in tests/test_json_match.py."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.functions.json import json_match, json_extract_scalar
from apache_pinot_spark.querysuite import df_query


def _events(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["events"])["events"]


def _cnt(cond):
    return F.count(F.when(cond, F.lit(1)))


def _p8_forms(spark: SparkSession, sf_dir: str):
    ev = _events(spark, sf_dir)
    return ev.agg(
        _cnt(json_match("props", '"$.k"=42')).alias("cnt_eq"),
        _cnt(json_match("props", '"$.k">=50 AND "$.k"<60')).alias("cnt_range_and"),
        _cnt(json_match("props", '"$.k" IS NOT NULL AND "$.missing" IS NULL')).alias(
            "cnt_existence"
        ),
        # P13 — IS NULL / IS NOT NULL on JSON paths (json-index.md:380-402)
        _cnt(F.get_json_object("props", "$.k").isNotNull()).alias("with_k"),
        _cnt(F.get_json_object("props", "$.missing").isNull()).alias("without_missing"),
    )


df_query(
    "p8_json_match_forms",
    _p8_forms,
    """
    SELECT
      CAST(count_if(CAST(json_extract_string(props, '$.k') AS DOUBLE) = 42) AS BIGINT) AS cnt_eq,
      CAST(count_if(CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
               AND CAST(json_extract_string(props, '$.k') AS DOUBLE) < 60) AS BIGINT) AS cnt_range_and,
      CAST(count_if(json_extract_string(props, '$.k') IS NOT NULL
               AND json_extract_string(props, '$.missing') IS NULL) AS BIGINT) AS cnt_existence,
      CAST(count_if(json_extract_string(props, '$.k') IS NOT NULL) AS BIGINT) AS with_k,
      CAST(count_if(json_extract_string(props, '$.missing') IS NULL) AS BIGINT) AS without_missing
    FROM events
    """,
    tables=["events"],
    doc="P8 scalar eq (json-index.md:306-312), range AND (:353-361), "
        "existence (:377-397) + P13 JSON IS NULL (:380-402) in one scan",
)


def _f4_extract_groupby(spark: SparkSession, sf_dir: str):
    ev = _events(spark, sf_dir)
    k = json_extract_scalar("props", "$.k", "LONG")
    return (
        ev.groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(k).cast("bigint").alias("sum_k"),
        )
        .orderBy("k_mod")
    )


df_query(
    "f4_json_extract_scalar_groupby",
    _f4_extract_groupby,
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY 1 ORDER BY k_mod
    """,
    tables=["events"],
    doc="P9/F4 JSON_EXTRACT_SCALAR in projection and group-by (json-index.md:42-45)",
)
