"""Corpus curation operators a large-scale training-data pipeline runs
before anything else: C4-style repeated-line (boilerplate) removal and
benchmark decontamination by n-gram overlap.

Both are beyond the reference's documented surface (like the dedup/ANN
families) and follow the same scale discipline: slim rows through every
shuffle, the small derived side broadcast-eligible, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_pinot_spark.functions.text import tokens_expr
from apache_pinot_spark.operators.dedup import _spread, shingles_expr


def _norm_line(line: Column) -> Column:
    """Line identity for boilerplate detection: trimmed, lowercased —
    'Sign in' and 'sign in  ' are the same navigation chrome."""
    return F.lower(F.trim(line))


def remove_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_count: int = 3,
    min_line_chars: int = 1,
) -> DataFrame:
    """C4-style boilerplate removal: a line occurring in >= ``min_count``
    documents across the corpus (navigation chrome, cookie banners,
    boilerplate headers) is dropped from every document; document text
    is reassembled in original line order. Lines shorter than
    ``min_line_chars`` after trimming are kept as-is (blank-line
    structure is not boilerplate evidence).

    Scale shape: lines ride the counting shuffle as (hash) slim rows
    with map-side partial counts; the FREQUENT-line set (count >=
    min_count) is usually tiny relative to the corpus, so the removal
    join is a broadcast-eligible left_anti against that set — the
    corpus itself shuffles once (the explode is map-side, the reassembly
    groupBy is the one full shuffle, keyed on the document id).
    Frequency counts documents, not occurrences: a line repeated inside
    ONE document is not corpus boilerplate.
    """
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    lines = _spread(df).select(
        F.col(key_col).alias("__key"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    sig = F.xxhash64(_norm_line(F.col("__line")))
    eligible = F.length(F.trim(F.col("__line"))) >= min_line_chars
    frequent = (
        lines.where(eligible)
        .select(sig.alias("__sig"), F.col("__key"))
        .distinct()  # document frequency, not occurrence frequency
        .groupBy("__sig")
        .agg(F.count("*").alias("__docs"))
        .where(F.col("__docs") >= min_count)
        .select("__sig")
    )
    kept = lines.withColumn("__sig", F.when(eligible, sig)).join(
        frequent, "__sig", "left_anti"
    )
    rebuilt = (
        kept.groupBy("__key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(text_col)
        )
        .withColumnRenamed("__key", key_col)
    )
    # Left join from the ORIGINAL frame: a document whose every line was
    # boilerplate survives with empty text (it still exists), and any
    # non-text columns ride along unchanged.
    out = (
        df.drop(text_col)
        .join(rebuilt, key_col, "left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    )
    return out.select(*df.columns)


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    benchmark_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the fraction of
    its word ``n``-grams that also appear anywhere in ``benchmark`` —
    the standard eval-set leakage check before training. Output:
    (key_col, total_ngrams, hit_ngrams, contamination); documents with
    fewer than one n-gram (short docs) report 0 contamination.

    Scale shape: the benchmark side reduces to its DISTINCT n-gram
    hashes (tiny vs the corpus — eval sets are thousands of documents,
    not billions), so the overlap join is broadcast-eligible; the corpus
    side ships one (key, ngram-hash) slim row per n-gram through a
    single semi-join + count. Hashing (xxhash64) makes the join key 8
    bytes regardless of n.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    btext = benchmark_text_col or text_col

    def grams(col: str) -> Column:
        return shingles_expr(tokens_expr(col, frozenset()), n)

    bench_grams = (
        _spread(benchmark)
        .select(F.explode(grams(btext)).alias("__g"))
        .select(F.xxhash64("__g").alias("__sig"))
        .distinct()
    )
    # explode_outer keeps gram-less docs as one NULL row; xxhash64(NULL)
    # is NOT null (it hashes to the seed), so guard the signature or the
    # placeholder row would count as a real n-gram
    doc_grams = _spread(corpus).select(
        F.col(key_col).alias("__key"),
        F.explode_outer(grams(text_col)).alias("__g"),
    ).select(
        "__key",
        F.when(F.col("__g").isNotNull(), F.xxhash64("__g")).alias("__sig"),
    )
    hits = (
        doc_grams.join(bench_grams, "__sig", "left_semi")
        .groupBy("__key")
        .agg(F.count("*").alias("hit_ngrams"))
    )
    totals = doc_grams.where(F.col("__sig").isNotNull()).groupBy("__key").agg(
        F.count("*").alias("total_ngrams")
    )
    keys = corpus.select(F.col(key_col).alias("__key")).distinct()
    out = (
        keys.join(totals, "__key", "left")
        .join(hits, "__key", "left")
        .select(
            F.col("__key").alias(key_col),
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("hit_ngrams", F.lit(0)).alias("hit_ngrams"),
            F.when(
                F.coalesce("total_ngrams", F.lit(0)) > 0,
                F.coalesce("hit_ngrams", F.lit(0)).cast("double")
                / F.col("total_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )
    return out
