"""Driver-gate queries for the TEXT_MATCH / TEXT_CONTAINS engine (SURVEY §2.2
P10-P11) over the documents table, each with a DuckDB oracle that encodes the
same analyzer semantics (lowercase, split non-alphanumerics, drop English
stop words — text-search-support.md:251-257)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.functions.text import text_match, text_contains, DEFAULT_STOP_WORDS
from apache_pinot_spark.querysuite import df_query

_STOP_SQL = ",".join(f"''{w}''" for w in sorted(DEFAULT_STOP_WORDS)).replace("''", "'")

_TOKS_CTE = f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '' AND x NOT IN ({_STOP_SQL})) AS t
  FROM documents
)
"""


def _docs(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def _count_match(expr: str):
    def fn(spark: SparkSession, sf_dir: str):
        return _docs(spark, sf_dir).filter(text_match("text", expr)).agg(
            F.count("*").alias("cnt")
        )

    return fn


df_query(
    "p10_text_match_term",
    _count_match("spark"),
    _TOKS_CTE + "SELECT COUNT(*) AS cnt FROM toks WHERE list_contains(t, 'spark')",
    tables=["documents"],
    doc="P10 term query (text-search-support.md:398-409)",
)

df_query(
    "p10_text_match_phrase",
    _count_match('"table scan"'),
    _TOKS_CTE
    + "SELECT COUNT(*) AS cnt FROM toks WHERE contains(' '||array_to_string(t,' ')||' ', ' table scan ')",
    tables=["documents"],
    doc="P10 phrase query — in-order adjacency (text-search-support.md:346-383)",
)

df_query(
    "p10_text_match_boolean",
    _count_match('"table scan" AND (spark flink)'),
    _TOKS_CTE
    + """
    SELECT COUNT(*) AS cnt FROM toks
    WHERE contains(' '||array_to_string(t,' ')||' ', ' table scan ')
      AND (list_contains(t, 'spark') OR list_contains(t, 'flink'))
    """,
    tables=["documents"],
    doc="P10 boolean AND + grouped implicit OR (text-search-support.md:411-480)",
)

df_query(
    "p10_text_match_prefix",
    _count_match("val*"),
    _TOKS_CTE
    + "SELECT COUNT(*) AS cnt FROM toks WHERE len(list_filter(t, x -> x LIKE 'val%')) > 0",
    tables=["documents"],
    doc="P10 prefix query (text-search-support.md:484-499)",
)


def _contains_fn(spark: SparkSession, sf_dir: str):
    return (
        _docs(spark, sf_dir)
        .filter(text_contains("text", "quer.*"))
        .agg(F.count("*").alias("cnt"))
    )


df_query(
    "p11_text_contains_regex",
    _contains_fn,
    # TEXT_CONTAINS has no stop-word filtering; same result here since the
    # pattern hits non-stop-words only.
    """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS t
      FROM documents
    )
    SELECT COUNT(*) AS cnt FROM toks
    WHERE len(list_filter(t, x -> regexp_matches(x, '^(?:quer.*)$'))) > 0
    """,
    tables=["documents"],
    doc="P11 TEXT_CONTAINS wildcard (native-text-index.md:33-55)",
)


def _match_by_lang(spark: SparkSession, sf_dir: str):
    return (
        _docs(spark, sf_dir)
        .filter(text_match("text", '"merge join" OR "hash join"'))
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy("lang")
    )


df_query(
    "p10_text_match_groupby",
    _match_by_lang,
    _TOKS_CTE
    + """
    SELECT lang, COUNT(*) AS cnt FROM toks
    WHERE contains(' '||array_to_string(t,' ')||' ', ' merge join ')
       OR contains(' '||array_to_string(t,' ')||' ', ' hash join ')
    GROUP BY lang ORDER BY lang
    """,
    tables=["documents"],
    doc="P10 in aggregation/group-by queries (text-search-support.md:76-86)",
)
