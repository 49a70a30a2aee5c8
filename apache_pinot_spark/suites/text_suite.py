"""Driver-gate queries for the TEXT_MATCH / TEXT_CONTAINS engine (SURVEY §2.2
P10-P12) over the documents table, each with a DuckDB oracle that encodes the
same analyzer semantics (lowercase, split non-alphanumerics, drop English
stop words — text-search-support.md:251-257).

Consolidated layout (driver checks at most 50 declared queries, so each
TEXT_MATCH form is one output column of a shared scan instead of its own
query; the per-form engine functions keep dedicated tests in
tests/test_text_match.py):
  p10_text_match_forms — term / phrase / prefix / boolean counts, GROUPED
                         by lang (covers TEXT_MATCH inside aggregation —
                         text-search-support.md:76-86 — in the same scan)
  p11_p12_regex        — TEXT_CONTAINS token regex + raw REGEXP_LIKE
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.functions.text import text_match, DEFAULT_STOP_WORDS
from apache_pinot_spark.querysuite import df_query

_STOP_SQL = ",".join(f"''{w}''" for w in sorted(DEFAULT_STOP_WORDS)).replace("''", "'")

_TOKS_CTE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '' AND x NOT IN ({_STOP_SQL})) AS t
  FROM documents
)
"""


def _docs(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def _cnt(cond):
    return F.count(F.when(cond, F.lit(1)))


def _match_forms(spark: SparkSession, sf_dir: str):
    # GROUP BY lang so the one declared query covers both the four match
    # forms AND the TEXT_MATCH-inside-aggregation surface (the reference's
    # group-by example, text-search-support.md:76-86) in a single scan.
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang")
        .agg(
            _cnt(text_match("text", "spark")).alias("cnt_term"),
            _cnt(text_match("text", '"table scan"')).alias("cnt_phrase"),
            _cnt(text_match("text", "val*")).alias("cnt_prefix"),
            _cnt(text_match("text", '"table scan" AND (spark flink)')).alias("cnt_boolean"),
        )
        .orderBy("lang")
    )


df_query(
    "p10_text_match_forms",
    _match_forms,
    _TOKS_CTE
    + """
    SELECT lang,
      CAST(count_if(list_contains(t, 'spark')) AS BIGINT) AS cnt_term,
      CAST(count_if(contains(' '||array_to_string(t,' ')||' ', ' table scan ')) AS BIGINT) AS cnt_phrase,
      CAST(count_if(len(list_filter(t, x -> x LIKE 'val%')) > 0) AS BIGINT) AS cnt_prefix,
      CAST(count_if(contains(' '||array_to_string(t,' ')||' ', ' table scan ')
               AND (list_contains(t, 'spark') OR list_contains(t, 'flink'))) AS BIGINT) AS cnt_boolean
    FROM toks GROUP BY lang ORDER BY lang
    """,
    tables=["documents"],
    doc="P10 term (text-search-support.md:398-409), phrase (:346-383), "
        "prefix (:484-499), and boolean (:411-480) forms, grouped by lang "
        "(TEXT_MATCH in aggregation, :76-86), one scan",
)


# p11_p12_regex (P11 TEXT_CONTAINS + P12 REGEXP_LIKE) folded into
# eng_text_json_sql in round 8 — now exercised THROUGH the SQL front-end
# (suites/enginesql_suite.py), freeing a driver-window slot for
# curation_boilerplate_removal (suites/ops_suite.py). The Column-API
# forms keep dedicated coverage in tests/test_text_match.py.
