"""Driver-gate queries for JSON_MATCH (SURVEY §2.2 P8) over the events
table's props JSON column, with DuckDB json_extract oracles."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.functions.json import json_match, json_extract_scalar
from apache_pinot_spark.querysuite import df_query


def _events(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["events"])["events"]


def _p8_eq(spark: SparkSession, sf_dir: str):
    return (
        _events(spark, sf_dir)
        .filter(json_match("props", '"$.k"=42'))
        .agg(F.count("*").alias("cnt"))
    )


df_query(
    "p8_json_match_eq",
    _p8_eq,
    """
    SELECT COUNT(*) AS cnt FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) = 42
    """,
    tables=["events"],
    doc="P8 scalar equality (json-index.md:306-312)",
)


def _p8_range(spark: SparkSession, sf_dir: str):
    return (
        _events(spark, sf_dir)
        .filter(json_match("props", '"$.k">=50 AND "$.k"<60'))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type")
    )


df_query(
    "p8_json_match_range_and",
    _p8_range,
    """
    SELECT event_type, COUNT(*) AS cnt FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
      AND CAST(json_extract_string(props, '$.k') AS DOUBLE) < 60
    GROUP BY event_type ORDER BY event_type
    """,
    tables=["events"],
    doc="P8 nested AND filter (json-index.md:353-361)",
)


def _p8_existence(spark: SparkSession, sf_dir: str):
    return (
        _events(spark, sf_dir)
        .filter(json_match("props", '"$.k" IS NOT NULL AND "$.missing" IS NULL'))
        .agg(F.count("*").alias("cnt"))
    )


df_query(
    "p8_json_match_existence",
    _p8_existence,
    """
    SELECT COUNT(*) AS cnt FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
      AND json_extract_string(props, '$.missing') IS NULL
    """,
    tables=["events"],
    doc="P8 field existence (json-index.md:377-397)",
)


def _f4_extract_groupby(spark: SparkSession, sf_dir: str):
    ev = _events(spark, sf_dir)
    k = json_extract_scalar("props", "$.k", "LONG")
    return (
        ev.groupBy((k % 10).alias("k_mod"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("k_mod")
    )


df_query(
    "f4_json_extract_scalar_groupby",
    _f4_extract_groupby,
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS cnt
    FROM events GROUP BY 1 ORDER BY k_mod
    """,
    tables=["events"],
    doc="F4 JSON_EXTRACT_SCALAR in group-by (json-index.md:42-45)",
)
