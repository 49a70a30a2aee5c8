"""Driver-gate queries exercising the Pinot SQL dialect FRONT-END
(sqlfront.PinotEngine): the SQL text the user writes is Pinot dialect —
TOP, OPTION(...), MV-column scalar predicates, dateTrunc/fromDateTime,
DISTINCTCOUNT, PERCENTILE, DISTINCTCOUNTHLL, TEXT_MATCH, JSON_MATCH — and
the oracle verifies the rewritten Spark execution against DuckDB running
the equivalent ANSI SQL.

Round-7 consolidation: the eight single-feature queries of rounds 2-6
are folded into four (each dialect feature keeps its own engine.sql()
round-trip inside a combined query; outputs are canonicalized to shared
columns and unioned) — freeing driver-window slots for the previously
pytest-only operator families (suites/ops_suite.py). Per-feature detail
coverage stays in tests/test_sqlfront.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.functions.text import DEFAULT_STOP_WORDS
from apache_pinot_spark.querysuite import df_query
from apache_pinot_spark.sqlfront import PinotEngine

_STOP_SQL = ",".join(f"'{w}'" for w in sorted(DEFAULT_STOP_WORDS))


def _engine_q(pinot_sql: str, tables: list[str]):
    def fn(spark: SparkSession, sf_dir: str, _sql: str = pinot_sql, _t=tables):
        eng = PinotEngine(spark, sf_dir, _t)
        return eng.sql(_sql)

    return fn


# --------------------------------------------------------------------------
# O3 TOP + O4 OPTION + P7 MV-scalar — three PQL-dialect statement forms,
# one declared query. Each fragment is its own engine.sql() round-trip
# (rewrite + execute); outputs canonicalize to (form, k, v) rows.
#   top:      PQL `TOP n` group cap (Introduction.md:110-111). MAX is exact
#             and per-supplier maxima are continuous-valued (ties
#             implausible), so the implicit ORDER BY MAX(...) DESC the
#             rewrite adds is deterministic.
#   option:   OPTION(...) suffix parsing (timestamp-index.md:50): stripped
#             from the SQL, recorded in RewriteResult.options; result
#             unchanged.
#   mv_scalar: `embedding > 0.95` on an ARRAY column auto-rewrites to
#             any-element semantics (configuration-reference/schema.md:25).
# --------------------------------------------------------------------------


def _dialect_forms(spark: SparkSession, sf_dir: str):
    eng = PinotEngine(spark, sf_dir, ["lineitem", "orders", "embeddings"])
    top = eng.sql(
        "SELECT l_suppkey, MAX(l_extendedprice) AS max_price "
        "FROM lineitem GROUP BY l_suppkey TOP 5"
    ).select(
        F.lit("top").alias("form"),
        F.col("l_suppkey").cast("string").alias("k"),
        F.col("max_price").cast("double").alias("v"),
    )
    opt = eng.sql(
        "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus "
        "OPTION(timeoutMs=20000)"
    ).select(
        F.lit("option").alias("form"),
        F.col("o_orderstatus").alias("k"),
        F.col("cnt").cast("double").alias("v"),
    )
    mv = eng.sql(
        "SELECT COUNT(*) AS cnt FROM embeddings WHERE embedding > 0.95"
    ).select(
        F.lit("mv_scalar").alias("form"),
        F.lit("embeddings").alias("k"),
        F.col("cnt").cast("double").alias("v"),
    )
    return top.unionByName(opt).unionByName(mv).orderBy("form", "k")


df_query(
    "eng_dialect_forms",
    _dialect_forms,
    """
    SELECT * FROM (
      SELECT 'top' AS form, CAST(l_suppkey AS VARCHAR) AS k,
             MAX(l_extendedprice) AS v
      FROM lineitem GROUP BY l_suppkey
      ORDER BY MAX(l_extendedprice) DESC LIMIT 5
    )
    UNION ALL
    SELECT 'option' AS form, o_orderstatus AS k, CAST(COUNT(*) AS DOUBLE) AS v
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'mv_scalar' AS form, 'embeddings' AS k,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM embeddings WHERE len(list_filter(embedding, x -> x > 0.95)) > 0
    ORDER BY form, k
    """,
    tables=["lineitem", "orders", "embeddings"],
    doc="O3 TOP rewrite + O4 OPTION suffix + P7 MV scalar-predicate "
        "auto-rewrite, three engine.sql() round-trips in one declared query",
)

# --------------------------------------------------------------------------
# F2+F3 — dateTrunc epoch-millis parity + fromDateTime + alias-in-WHERE,
# the golden shape of timestamp-index.md:33-49.
# --------------------------------------------------------------------------
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

# --------------------------------------------------------------------------
# P10 TEXT_MATCH + P8 JSON_MATCH through the SQL front-end, one declared
# query (two engine.sql() round-trips, canonicalized to (form, k, v)).
# --------------------------------------------------------------------------


def _text_json_sql(spark: SparkSession, sf_dir: str):
    eng = PinotEngine(spark, sf_dir, ["documents", "events"])
    text = eng.sql(
        "SELECT COUNT(*) AS cnt FROM documents "
        "WHERE TEXT_MATCH(text, 'spark AND stream*')"
    ).select(
        F.lit("text_match").alias("form"),
        F.lit("*").alias("k"),
        F.col("cnt").cast("long").alias("v"),
    )
    js = eng.sql(
        """SELECT event_type, COUNT(*) AS cnt FROM events """
        """WHERE JSON_MATCH(props, '"$.k">=50 AND "$.k"<80') """
        """GROUP BY event_type ORDER BY event_type"""
    ).select(
        F.lit("json_match").alias("form"),
        F.col("event_type").alias("k"),
        F.col("cnt").cast("long").alias("v"),
    )
    # r8 fold of p11_p12_regex: P11 TEXT_CONTAINS token-regex
    # (native-text-index.md:33-55) and P12 REGEXP_LIKE raw scan
    # (text-search-support.md:22), each its own engine.sql() round-trip.
    tc = eng.sql(
        "SELECT COUNT(*) AS cnt FROM documents "
        "WHERE TEXT_CONTAINS(text, 'quer.*')"
    ).select(
        F.lit("text_contains").alias("form"),
        F.lit("*").alias("k"),
        F.col("cnt").cast("long").alias("v"),
    )
    rl = eng.sql(
        # Spark SQL string literals are backslash-escaped (legacy parser
        # default), so the regex metachars need doubling in the SQL text
        r"SELECT COUNT(*) AS cnt FROM documents "
        r"WHERE REGEXP_LIKE(text, 'spark\\s+\\w+\\s+join')"
    ).select(
        F.lit("regexp_like").alias("form"),
        F.lit("*").alias("k"),
        F.col("cnt").cast("long").alias("v"),
    )
    return text.unionByName(js).unionByName(tc).unionByName(rl).orderBy("form", "k")


df_query(
    "eng_text_json_sql",
    _text_json_sql,
    f"""
    WITH toks AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '' AND x NOT IN ({_STOP_SQL})) AS t
      FROM documents
    )
    SELECT 'text_match' AS form, '*' AS k, COUNT(*) AS v FROM toks
    WHERE list_contains(t, 'spark')
      AND len(list_filter(t, x -> x LIKE 'stream%')) > 0
    UNION ALL
    SELECT 'json_match' AS form, event_type AS k, COUNT(*) AS v FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
      AND TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) < 80
    GROUP BY event_type
    UNION ALL
    SELECT 'text_contains' AS form, '*' AS k, COUNT(*) AS v FROM (
      -- TEXT_CONTAINS has no stop-word filtering: unfiltered tokens
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tt
      FROM documents
    ) WHERE len(list_filter(tt, x -> regexp_matches(x, '^(?:quer.*)$'))) > 0
    UNION ALL
    SELECT 'regexp_like' AS form, '*' AS k, COUNT(*) AS v FROM documents
    WHERE regexp_matches(text, 'spark\\s+\\w+\\s+join')
    ORDER BY form, k
    """,
    tables=["documents", "events"],
    doc="P10 TEXT_MATCH boolean+prefix (text-search-support.md:398-480) + "
        "P8 JSON_MATCH range (json-index.md:304-434) + P11 TEXT_CONTAINS "
        "wildcard (native-text-index.md:33-55) + P12 REGEXP_LIKE "
        "(text-search-support.md:22), four engine.sql() round-trips "
        "(r8 fold of p11_p12_regex)",
)

# --------------------------------------------------------------------------
# A5+A6+A7 — DISTINCTCOUNT + PERCENTILE + DISTINCTCOUNTHLL through the
# front-end, one declared query (two engine.sql() round-trips cross-joined
# into a single row; all five outputs keep their own column).
#
# HLL shape note: the HLL fragment dedupes FIRST. HLL register maxima are
# invariant under duplicate values, and mixing the 64-partial HLL
# aggregate with COUNT(DISTINCT x) in ONE aggregate makes Spark key the
# first-level aggregate by x and carry all 64 MAX buffers per distinct
# key (~38M buffer updates at sf0.1, measured 2.5 s). Over the pre-deduped
# keys both aggregates are trivial, and the estimate is bit-identical.
# The engine's portable register-HLL (functions/hll.py) derives only from
# md5 + hex digits + dyadic-double arithmetic, so the APPROXIMATE estimate
# is exactly reproducible in DuckDB — a full hash-checked oracle.
# round(_, 6) on percentiles absorbs interpolation last-ulp differences.
# --------------------------------------------------------------------------


def _approx_aggs(spark: SparkSession, sf_dir: str):
    eng = PinotEngine(spark, sf_dir, ["lineitem"])
    pct = eng.sql(
        "SELECT DISTINCTCOUNT(l_suppkey) AS dc, "
        "round(PERCENTILE(l_quantity, 50), 6) AS p50, "
        "round(PERCENTILE(l_quantity, 95), 6) AS p95 FROM lineitem"
    )
    hll = eng.sql(
        "SELECT DISTINCTCOUNTHLL(l_partkey) AS hll, "
        "DISTINCTCOUNT(l_partkey) AS exact_dc "
        "FROM (SELECT DISTINCT l_partkey FROM lineitem) u"
    )
    return pct.crossJoin(hll)


def _approx_aggs_oracle() -> str:
    from apache_pinot_spark.functions.hll import hll_estimate_sql

    return f"""
    SELECT p.dc, p.p50, p.p95, h.hll, h.exact_dc FROM
      (SELECT COUNT(DISTINCT l_suppkey) AS dc,
              round(quantile_cont(l_quantity, 0.50), 6) AS p50,
              round(quantile_cont(l_quantity, 0.95), 6) AS p95
       FROM lineitem) p
    CROSS JOIN
      (SELECT {hll_estimate_sql('l_partkey', 'duckdb')} AS hll,
              COUNT(DISTINCT l_partkey) AS exact_dc
       FROM (SELECT DISTINCT l_partkey FROM lineitem) u) h
    """


df_query(
    "eng_approx_aggs",
    _approx_aggs,
    _approx_aggs_oracle(),
    tables=["lineitem"],
    doc="A5 DISTINCTCOUNT + A7 PERCENTILE + A6 DISTINCTCOUNTHLL "
        "(forward-index.md:214) via the dialect — the portable register "
        "HLL estimate is deterministic and oracle-reproducible",
)
