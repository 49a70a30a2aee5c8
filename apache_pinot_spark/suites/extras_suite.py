"""Declared queries BEYOND the driver's 50-query correctness window.

The driver's ledger checks the FIRST 50 registered queries; everything
here is additive coverage that registers after them (still oracle-checked
in-repo by tests/test_correctness.py, which runs the whole registry).
Queries land here when their surface is already represented inside the
window by another green query."""

from __future__ import annotations

from apache_pinot_spark.querysuite import df_query
from apache_pinot_spark.suites.text_suite import _TOKS_CTE, _match_by_lang

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
