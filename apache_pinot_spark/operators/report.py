"""Corpus audit report — the one-call statistics sheet every curation
run publishes next to its output (doc/char/token totals, length
quantiles, language and source composition, duplication rates): the
numbers a data card or a between-stage sanity check needs, computed as
TWO Spark jobs over the documents frame, every aggregate
DuckDB-replayable (tests assert parity).

Shape: job 1 is one map-side-combined global aggregate (counts, sums,
approx-or-exact quantiles, distinct counts); job 2 is the two
composition groupBys (lang, source) capped to top-k rows each. No
collect is corpus-sized; the report is a plain dict of scalars plus two
small lists — printable, loggable, diffable between pipeline stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_pinot_spark.operators.textanalysis import token_count_expr


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    source_col: str | None = "source",
    top_k: int = 20,
    exact_quantiles: bool = False,
) -> dict:
    """The audit dict (see module docstring). ``exact_quantiles`` uses
    percentile (exact, heavier) instead of approx_percentile — the
    oracle-replayable mode the parity test runs."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_expr(t)
    qfun = "percentile" if exact_quantiles else "approx_percentile"
    aggs = [
        F.count("*").alias("n_docs"),
        F.count(text_col).alias("n_docs_with_text"),
        F.count_distinct(F.col(id_col)).alias("n_distinct_ids"),
        # xxhash64(NULL) is the (non-null) seed hash — guard, or NULL
        # texts count as one distinct text
        F.count_distinct(
            F.when(t.isNotNull(), F.xxhash64(t))).alias("n_distinct_texts"),
        F.sum(n_chars).alias("total_chars"),
        F.sum(n_tokens).alias("total_tokens"),
        F.expr(f"{qfun}(length({text_col}), array(0.5, 0.9, 0.99))"
               ).alias("char_quantiles"),
        F.min(n_chars).alias("min_chars"),
        F.max(n_chars).alias("max_chars"),
    ]
    row = docs.agg(*aggs).collect()[0].asDict()
    report = {
        "n_docs": row["n_docs"],
        "n_docs_with_text": row["n_docs_with_text"],
        "n_distinct_ids": row["n_distinct_ids"],
        "n_distinct_texts": row["n_distinct_texts"],
        "duplicate_id_rate": (
            1.0 - row["n_distinct_ids"] / row["n_docs"]
            if row["n_docs"] else 0.0),
        "duplicate_text_rate": (
            1.0 - row["n_distinct_texts"] / row["n_docs_with_text"]
            if row["n_docs_with_text"] else 0.0),
        "total_chars": row["total_chars"],
        "total_tokens": row["total_tokens"],
        "mean_chars": (row["total_chars"] / row["n_docs_with_text"]
                       if row["n_docs_with_text"] else None),
        "chars_p50": row["char_quantiles"][0] if row["char_quantiles"] else None,
        "chars_p90": row["char_quantiles"][1] if row["char_quantiles"] else None,
        "chars_p99": row["char_quantiles"][2] if row["char_quantiles"] else None,
        "min_chars": row["min_chars"],
        "max_chars": row["max_chars"],
    }

    def comp(col):
        return [
            (r.k, r.n)
            for r in docs.groupBy(
                F.coalesce(F.col(col), F.lit("(null)")).alias("k"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("k"))
            .limit(top_k)
            .collect()
        ]

    if lang_col and lang_col in docs.columns:
        report["langs"] = comp(lang_col)
    if source_col and source_col in docs.columns:
        report["sources"] = comp(source_col)
    return report


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Snapshot diff for iterative corpus builds — the between-release
    ledger a data card cites: how many documents were added, removed,
    kept verbatim, and kept-but-rewritten (same id, different text —
    what redaction/normalization/substring-excision do). One full outer
    join on id with xxhash64 text comparison; returns scalars plus the
    four frames (lazy) for drill-down."""
    oh = old.select(F.col(id_col).alias("id"),
                    F.xxhash64(F.col(text_col)).alias("oh"),
                    F.col(text_col).isNotNull().alias("onn"))
    nh = new.select(F.col(id_col).alias("id"),
                    F.xxhash64(F.col(text_col)).alias("nh"),
                    F.col(text_col).isNotNull().alias("nnn"))
    j = oh.join(nh, on="id", how="full_outer")
    added = j.filter(F.col("oh").isNull() & F.col("nh").isNotNull())
    removed = j.filter(F.col("nh").isNull() & F.col("oh").isNotNull())
    both = j.filter(F.col("oh").isNotNull() & F.col("nh").isNotNull())
    unchanged = both.filter((F.col("oh") == F.col("nh"))
                            & F.col("onn") & F.col("nnn"))
    changed = both.exceptAll(unchanged)
    counts = j.agg(
        F.count_if(F.col("oh").isNull() & F.col("nh").isNotNull()).alias("a"),
        F.count_if(F.col("nh").isNull() & F.col("oh").isNotNull()).alias("r"),
        F.count_if(F.col("oh").isNotNull() & F.col("nh").isNotNull()
                   & (F.col("oh") == F.col("nh"))
                   & F.col("onn") & F.col("nnn")).alias("u"),
        F.count_if(F.col("oh").isNotNull() & F.col("nh").isNotNull()
                   & ((F.col("oh") != F.col("nh"))
                      | ~F.col("onn") | ~F.col("nnn"))).alias("c"),
    ).collect()[0]
    return {
        "added": counts.a, "removed": counts.r,
        "unchanged": counts.u, "changed": counts.c,
        "added_ids": added.select("id"),
        "removed_ids": removed.select("id"),
        "changed_ids": changed.select("id"),
    }
