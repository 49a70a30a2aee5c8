"""Driver-gate queries exercising the Pinot SQL dialect FRONT-END
(sqlfront.PinotEngine): the SQL text the user writes is Pinot dialect —
TOP, dateTrunc/fromDateTime, DISTINCTCOUNT, PERCENTILE, TEXT_MATCH,
JSON_MATCH — and the oracle verifies the rewritten Spark execution against
DuckDB running the equivalent ANSI SQL."""

from __future__ import annotations

from pyspark.sql import SparkSession

from apache_pinot_spark.functions.text import DEFAULT_STOP_WORDS
from apache_pinot_spark.querysuite import df_query
from apache_pinot_spark.sqlfront import PinotEngine

_STOP_SQL = ",".join(f"'{w}'" for w in sorted(DEFAULT_STOP_WORDS))


def _engine_q(pinot_sql: str, tables: list[str]):
    def fn(spark: SparkSession, sf_dir: str, _sql: str = pinot_sql, _t=tables):
        eng = PinotEngine(spark, sf_dir, _t)
        return eng.sql(_sql)

    return fn


# O3 — PQL TOP n through the front-end. MAX is exact and the per-supplier
# maxima are continuous-valued (ties implausible), so the implicit
# ORDER BY MAX(...) DESC the rewrite adds is deterministic.
df_query(
    "eng_top_rewrite",
    _engine_q(
        "SELECT l_suppkey, MAX(l_extendedprice) AS max_price "
        "FROM lineitem GROUP BY l_suppkey TOP 5",
        ["lineitem"],
    ),
    """
    SELECT l_suppkey, MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_suppkey
    ORDER BY MAX(l_extendedprice) DESC LIMIT 5
    """,
    tables=["lineitem"],
    doc="PQL TOP n group cap (Introduction.md:110-111) via dialect rewrite",
)

# F2+F3 — dateTrunc epoch-millis parity + fromDateTime + alias-in-WHERE,
# the golden shape of timestamp-index.md:33-49.
df_query(
    "eng_datetrunc_where_alias",
    _engine_q(
        "SELECT dateTrunc('DAY', ts) AS d, COUNT(*) AS cnt FROM events "
        "WHERE d >= fromDateTime('2024-01-10', 'yyyy-MM-dd') "
        "GROUP BY d ORDER BY d",
        ["events"],
    ),
    """
    SELECT CAST(epoch(date_trunc('day', ts)) * 1000 AS BIGINT) AS d, COUNT(*) AS cnt
    FROM events
    WHERE CAST(epoch(date_trunc('day', ts)) * 1000 AS BIGINT)
          >= CAST(epoch(strptime('2024-01-10', '%Y-%m-%d')) * 1000 AS BIGINT)
    GROUP BY 1 ORDER BY d
    """,
    tables=["events"],
    doc="dateTrunc/fromDateTime epoch-millis parity (timestamp-index.md:33-49)",
)

# A5/A7 — DISTINCTCOUNT + PERCENTILE through the front-end. round(_, 6)
# absorbs interpolation last-ulp differences between engines.
df_query(
    "eng_distinctcount_percentile",
    _engine_q(
        "SELECT DISTINCTCOUNT(l_suppkey) AS dc, "
        "round(PERCENTILE(l_quantity, 50), 6) AS p50, "
        "round(PERCENTILE(l_quantity, 95), 6) AS p95 FROM lineitem",
        ["lineitem"],
    ),
    """
    SELECT COUNT(DISTINCT l_suppkey) AS dc,
           round(quantile_cont(l_quantity, 0.50), 6) AS p50,
           round(quantile_cont(l_quantity, 0.95), 6) AS p95
    FROM lineitem
    """,
    tables=["lineitem"],
    doc="DISTINCTCOUNT (forward-index.md:214) + PERCENTILE family",
)

# P10 — TEXT_MATCH through the SQL front-end (prefix + term boolean).
df_query(
    "eng_text_match_sql",
    _engine_q(
        "SELECT COUNT(*) AS cnt FROM documents "
        "WHERE TEXT_MATCH(text, 'spark AND stream*')",
        ["documents"],
    ),
    f"""
    WITH toks AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '' AND x NOT IN ({_STOP_SQL})) AS t
      FROM documents
    )
    SELECT COUNT(*) AS cnt FROM toks
    WHERE list_contains(t, 'spark')
      AND len(list_filter(t, x -> x LIKE 'stream%')) > 0
    """,
    tables=["documents"],
    doc="TEXT_MATCH boolean+prefix through dialect rewrite",
)

# P8 — JSON_MATCH numeric range through the SQL front-end.
df_query(
    "eng_json_match_sql",
    _engine_q(
        """SELECT event_type, COUNT(*) AS cnt FROM events """
        """WHERE JSON_MATCH(props, '"$.k">=50 AND "$.k"<80') """
        """GROUP BY event_type ORDER BY event_type""",
        ["events"],
    ),
    """
    SELECT event_type, COUNT(*) AS cnt FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
      AND TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) < 80
    GROUP BY event_type ORDER BY event_type
    """,
    tables=["events"],
    doc="JSON_MATCH range predicate (json-index.md:304-434) via rewrite",
)

# A6 — DISTINCTCOUNTHLL through the front-end. The engine's portable
# register-HLL (functions/hll.py) is derived only from md5 + hex digit +
# dyadic-double arithmetic, so the APPROXIMATE estimate is exactly
# reproducible in DuckDB — a full hash-checked oracle, not a rows-only
# pass. Exact DISTINCTCOUNT rides along as the accuracy reference.
#
# Shape note: the query dedupes FIRST. HLL register maxima are invariant
# under duplicate values, and mixing the 64-partial HLL aggregate with
# COUNT(DISTINCT x) in ONE aggregate makes Spark key the first-level
# aggregate by x and carry all 64 MAX buffers per distinct key (~38M
# buffer updates at sf0.1, measured 2.5 s). Over the pre-deduped keys both
# aggregates are trivial, and the estimate is bit-identical.
from apache_pinot_spark.functions.hll import hll_estimate_sql

df_query(
    "eng_distinctcounthll",
    _engine_q(
        "SELECT DISTINCTCOUNTHLL(l_partkey) AS hll, "
        "DISTINCTCOUNT(l_partkey) AS exact_dc "
        "FROM (SELECT DISTINCT l_partkey FROM lineitem) u",
        ["lineitem"],
    ),
    f"""
    SELECT {hll_estimate_sql('l_partkey', 'duckdb')} AS hll,
           COUNT(DISTINCT l_partkey) AS exact_dc
    FROM (SELECT DISTINCT l_partkey FROM lineitem) u
    """,
    tables=["lineitem"],
    doc="A6 DISTINCTCOUNTHLL (forward-index.md:214) via the portable "
        "register HLL — deterministic, oracle-reproducible estimate",
)

# O4 — OPTION(...) suffix parsing (timestamp-index.md:50): stripped from
# the SQL, recorded in RewriteResult.options; result is unchanged.
df_query(
    "eng_option_suffix",
    _engine_q(
        "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus "
        "OPTION(timeoutMs=20000)",
        ["orders"],
    ),
    """
    SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tables=["orders"],
    doc="O4 per-query OPTION suffix (timestamp-index.md:50)",
)

# P7 — scalar predicate on a multi-valued column THROUGH the front-end:
# `embedding > 0.95` on an ARRAY column is auto-rewritten to any-element
# semantics (configuration-reference/schema.md:25).
df_query(
    "eng_mv_scalar_predicate",
    _engine_q(
        "SELECT COUNT(*) AS cnt FROM embeddings WHERE embedding > 0.95",
        ["embeddings"],
    ),
    """
    SELECT COUNT(*) AS cnt FROM embeddings
    WHERE len(list_filter(embedding, x -> x > 0.95)) > 0
    """,
    tables=["embeddings"],
    doc="P7 MV-column scalar predicate auto-rewrite (schema.md:25)",
)
