"""Declared query suite — one entry per operator of SURVEY.md §2.

Each entry pairs a Spark callable ``fn(spark, sf_dir) -> DataFrame`` with an
ANSI-SQL oracle string that DuckDB runs on the same parquet tables. The
driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json), sorting
columns by name — so every computed column is aliased identically on both
sides.

Cross-engine determinism rules (hard-won, do not relax):
  * Never hash-compare a cross-row SUM/AVG of doubles — Spark's partial
    aggregation sums in partition order, DuckDB sequentially; last-ulp
    drift breaks the hash. Aggregate in DECIMAL (data is 2-decimal money)
    or BIGINT, then CAST to DOUBLE once at the end.
  * AVG = decimal-exact SUM cast to double, divided by COUNT — a single
    IEEE-754 division is deterministic on both engines.
  * MIN/MAX/COUNT over any type are exact — safe as-is.
  * Bounded-error float folds (e.g. 64-dim cosine) are rounded to 4-6
    decimals before compare AND before any rank that feeds the output.
  * No LIMIT without a total ORDER BY (ties broken by a unique key).
  * Time values are emitted as formatted strings or epoch integers, never
    raw timestamps (engine/driver canonicalization differences).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from apache_pinot_spark.catalog import load_tables


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tables: list[str] = field(default_factory=list)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(q: Query) -> Query:
    REGISTRY[q.name] = q
    return q


def sql_query(
    name: str,
    spark_sql: str,
    oracle: str | None = None,
    tables: list[str] | None = None,
    doc: str = "",
) -> Query:
    """Register a SQL-defined query. ``oracle`` defaults to the same text
    (the common ANSI subset runs unchanged on DuckDB)."""

    def fn(spark: SparkSession, sf_dir: str, _sql: str = spark_sql, _t=tables) -> DataFrame:
        load_tables(spark, sf_dir, _t)
        return spark.sql(_sql)

    return register(Query(name, fn, oracle if oracle is not None else spark_sql, tables or [], doc))


def df_query(
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    oracle: str | None,
    tables: list[str] | None = None,
    doc: str = "",
) -> Query:
    return register(Query(name, fn, oracle, tables or [], doc))


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary. Exercises P3 (range predicate on
# time), A2/A3 (SUM/AVG), A9 (multi-key GROUP BY), O1 (ORDER BY).
# Reference parity: aggregation + group-by + order-by surface of
# Introduction.md:51; partial/final agg split of basics/Architecture.md:117.
# --------------------------------------------------------------------------

_Q1 = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
sql_query("q1_pricing_summary", _Q1, tables=["lineitem"],
          doc="Flagship TPC-H Q1: SURVEY §2.3 A2/A3/A9 + §2.4 O1")

# --------------------------------------------------------------------------
# P1 — projection (SELECT col1, col2): forward-index read path
# (reference basics/indexing/forward-index.md:170-183)
# --------------------------------------------------------------------------
sql_query(
    "p1_projection",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_orderkey < 100
    """,
    tables=["lineitem"],
    doc="P1 projection + deterministic key filter",
)

# P2 — equality predicate (bloom-filter prune case,
# basics/indexing/bloom-filter.md:3-11)
sql_query(
    "p2_eq_predicate",
    """
    SELECT l_linestatus, COUNT(*) AS cnt
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tables=["lineitem"],
)

# P3 — range predicate (basics/indexing/range-index.md:5-9)
sql_query(
    "p3_range_predicate",
    """
    SELECT COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
    FROM lineitem WHERE l_quantity > 45
    """,
    tables=["lineitem"],
)

# P4 — BETWEEN on the time column (basics/indexing/text-search-support.md:142)
sql_query(
    "p4_between",
    """
    SELECT COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
    """,
    tables=["lineitem"],
)

# P5 — IN set membership (Introduction.md:109)
sql_query(
    "p5_in_predicate",
    """
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tables=["orders"],
)

# P6 — AND/OR conjunction (Introduction.md:108-109)
sql_query(
    "p6_and_or",
    """
    SELECT COUNT(*) AS cnt
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 100000.0)
       OR (o_orderstatus = 'O' AND o_totalprice < 2000.0)
    """,
    tables=["orders"],
)

# --------------------------------------------------------------------------
# P7 — multi-valued-column predicate. Pinot MV semantics: predicate matches
# if ANY element matches (configuration-reference/schema.md:25). The MV
# column here is the tokenized documents.text.
# --------------------------------------------------------------------------
sql_query(
    "p7_mv_predicate",
    """
    SELECT COUNT(*) AS cnt
    FROM documents WHERE array_contains(split(text, ' '), 'spark')
    """,
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM documents WHERE list_contains(string_split(text, ' '), 'spark')
    """,
    tables=["documents"],
)

# P9 / F4 — JSON_EXTRACT_SCALAR (basics/indexing/json-index.md:42-45)
sql_query(
    "p9_json_extract_scalar",
    """
    SELECT event_type,
           CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tables=["events"],
)

# P12 — REGEXP_LIKE scan path (basics/indexing/text-search-support.md:22)
sql_query(
    "p12_regexp_like",
    """
    SELECT COUNT(*) AS cnt FROM documents WHERE text RLIKE 'spark\\\\s+\\\\w+\\\\s+join'
    """,
    oracle="""
    SELECT COUNT(*) AS cnt FROM documents WHERE regexp_matches(text, 'spark\\s+\\w+\\s+join')
    """,
    tables=["documents"],
)

# P13 — IS NULL / IS NOT NULL on JSON paths
# (basics/indexing/json-index.md:380-402)
sql_query(
    "p13_json_null_check",
    """
    SELECT
      CAST(SUM(CASE WHEN get_json_object(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
      CAST(SUM(CASE WHEN get_json_object(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS without_missing
    FROM events
    """,
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
      CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS without_missing
    FROM events
    """,
    tables=["events"],
)

# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.3)
# --------------------------------------------------------------------------

# A1 — COUNT(*) / COUNT(col) (basics/Architecture.md:122)
sql_query(
    "a1_count",
    "SELECT COUNT(*) AS cnt_star, COUNT(l_quantity) AS cnt_col FROM lineitem",
    tables=["lineitem"],
)

# A4 + A8 — MIN/MAX incl. aggregate-over-expression MAX(ADD(a,b))
# (basics/indexing/forward-index.md:205-224). Min/max of doubles is exact.
sql_query(
    "a4_min_max_expr",
    """
    SELECT MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           MAX(l_extendedprice + l_tax) AS max_add_expr,
           MAX(l_extendedprice * (1 - l_discount)) AS max_disc_expr
    FROM lineitem
    """,
    tables=["lineitem"],
)

# A5 — DISTINCTCOUNT exact (basics/indexing/forward-index.md:214)
sql_query(
    "a5_distinctcount",
    """
    SELECT COUNT(DISTINCT l_partkey) AS dc_part,
           COUNT(DISTINCT l_suppkey) AS dc_supp,
           COUNT(DISTINCT l_returnflag) AS dc_flag
    FROM lineitem
    """,
    tables=["lineitem"],
)

# A9 — multi-key GROUP BY over dateTrunc buckets, the timestamp-index target
# shape (basics/indexing/timestamp-index.md:43-49)
sql_query(
    "a9_groupby_datetrunc",
    """
    SELECT date_format(date_trunc('DAY', ts), 'yyyy-MM-dd') AS day,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_format(date_trunc('DAY', ts), 'yyyy-MM-dd'), event_type
    ORDER BY day, event_type
    """,
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
    tables=["events"],
)

# A10 — HAVING (basics/indexing/forward-index.md:204-210)
sql_query(
    "a10_having",
    """
    SELECT l_partkey, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) > 40
    ORDER BY l_partkey
    """,
    tables=["lineitem"],
)

# A13 — roll-up (OLAP surface, Introduction.md:65). Grouping-set NULLs are
# coalesced to 'ALL' for canonical cross-engine output.
sql_query(
    "a13_rollup",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    tables=["orders"],
)

# A14 — SELECT DISTINCT (Introduction.md:51,
# basics/indexing/forward-index.md:228-237)
sql_query(
    "a14_select_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
    tables=["lineitem"],
)

# --------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.4)
# --------------------------------------------------------------------------

# O1+O2 — ORDER BY ... LIMIT with unique-key tiebreak (deterministic)
sql_query(
    "o1_orderby_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tables=["orders"],
)

# O3 — PQL `TOP n` group cap → ORDER BY agg DESC LIMIT n rewrite
# (Introduction.md:110-111); ties broken by group key.
sql_query(
    "o3_top_groups",
    """
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY sum_qty DESC, l_suppkey LIMIT 5
    """,
    tables=["lineitem"],
)

# --------------------------------------------------------------------------
# Scalar functions (SURVEY §2.6)
# --------------------------------------------------------------------------

# F2 — dateTrunc buckets at WEEK granularity
# (basics/indexing/timestamp-index.md:27-39): emitted as epoch-millis to
# match Pinot's LONG representation.
sql_query(
    "f2_datetrunc_week_epoch",
    """
    SELECT CAST(unix_timestamp(date_trunc('WEEK', l_shipdate)) * 1000 AS BIGINT) AS week_start_ms,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY date_trunc('WEEK', l_shipdate)
    ORDER BY week_start_ms
    """,
    oracle="""
    SELECT CAST(epoch(date_trunc('week', l_shipdate)) * 1000 AS BIGINT) AS week_start_ms,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY date_trunc('week', l_shipdate)
    ORDER BY week_start_ms
    """,
    tables=["lineitem"],
)

# F3 — fromDateTime(literal, pattern) parse-and-filter
# (basics/indexing/timestamp-index.md:36)
sql_query(
    "f3_fromdatetime_filter",
    """
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    WHERE ts >= to_timestamp('2024-01-15', 'yyyy-MM-dd')
    GROUP BY event_type ORDER BY event_type
    """,
    oracle="""
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    WHERE ts >= strptime('2024-01-15', '%Y-%m-%d')
    GROUP BY event_type ORDER BY event_type
    """,
    tables=["events"],
)

# --------------------------------------------------------------------------
# Joins — pass-through Spark surface (SURVEY §2.5: out of Pinot parity
# scope but first-class in this engine). Star-schema joins broadcast the
# dimension side; verified in tests/test_plans.py.
# --------------------------------------------------------------------------

sql_query(
    "join_customer_revenue",
    """
    SELECT c.c_mktsegment,
           COUNT(DISTINCT o.o_orderkey) AS num_orders,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
    tables=["customer", "orders", "lineitem"],
    doc="3-way star join; dims broadcast; TPC-H Q3 family",
)

sql_query(
    "join_nation_supplier",
    """
    SELECT r.r_name, n.n_name, COUNT(*) AS num_suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_acctbal
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r_name, n_name
    """,
    tables=["region", "nation", "supplier"],
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
