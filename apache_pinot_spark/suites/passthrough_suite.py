"""Pass-through relational surface (SURVEY §2.5): joins, window
functions, and set operations are not part of the reference's documented
single-table model, but the engine is Spark SQL underneath so they are
first-class — declared here with ANSI oracles to prove the surface works
identically on both engines (a user migrating real workloads gets them)."""

from __future__ import annotations

from apache_pinot_spark.querysuite import sql_query

# Window functions: per-status price rank AND a running-total frame in one
# query. Deterministic: rank ties broken by unique key; money math in
# DECIMAL so the running sum is exact on both engines.
sql_query(
    "w1_w2_window_functions",
    """
    SELECT o_orderstatus, o_orderkey, o_totalprice, rnk, running_total FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_orderstatus
                        ORDER BY o_totalprice DESC, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
      FROM orders
    ) WHERE rnk <= 3
    ORDER BY o_orderstatus, rnk
    """,
    tables=["orders"],
    doc="Window ROW_NUMBER (deterministic tiebreak) + decimal-exact "
        "running-total frame (ROWS UNBOUNDED PRECEDING) in one pass",
)

# Set operations over key sets (exact, orderable).
sql_query(
    "set1_intersect_except",
    """
    SELECT 'both' AS tag, COUNT(*) AS cnt FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'f_only' AS tag, COUNT(*) AS cnt FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    ORDER BY tag
    """,
    tables=["orders"],
    doc="INTERSECT / EXCEPT / UNION ALL over customer key sets",
)

# Semi/anti join shapes (Pinot users emulate these with IN/NOT IN).
sql_query(
    "j3_semi_anti",
    """
    SELECT
      (SELECT COUNT(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
      (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders
    """,
    tables=["customer", "orders"],
    doc="Semi/anti join via EXISTS (broadcast-able key sets)",
)
