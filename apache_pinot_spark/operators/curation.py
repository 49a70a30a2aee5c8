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


def _strip_ws(line: Column) -> Column:
    """Strip ALL leading/trailing whitespace — including the '\\r' a
    '\\n'-split leaves on every line of a CRLF document and tabs, which
    ``F.trim`` (spaces only) would keep."""
    return F.regexp_replace(line, r"^\s+|\s+$", "")


def _norm_line(line: Column) -> Column:
    """Line identity for boilerplate detection: whitespace-stripped,
    lowercased — 'Sign in\\r' (CRLF doc) and 'sign in  ' (LF doc) are
    the same navigation chrome."""
    return F.lower(_strip_ws(line))


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
    eligible = F.length(_strip_ws(F.col("__line"))) >= min_line_chars
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
    # non-text columns ride along unchanged. NULL text stays NULL —
    # downstream NULL-aware handling (dedup's NULL_FINGERPRINT sentinel,
    # is-missing stats) must not see fabricated empty documents.
    out = (
        df.withColumn("__had_text", F.col(text_col).isNotNull())
        .drop(text_col)
        .join(rebuilt, key_col, "left")
        .withColumn(
            text_col,
            F.when(F.col("__had_text"), F.coalesce(F.col(text_col), F.lit(""))),
        )
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
        .withColumn("__hit", F.lit(1))
    )
    # ONE corpus scan: at 100 TB the tokenizer IS the scan cost, so the
    # corpus lineage (scan + tokenize + n-gram explode) must execute
    # exactly once. explode_outer keeps gram-less docs as one NULL row —
    # xxhash64(NULL) is NOT null (it hashes to the seed), so guard the
    # signature; count("__sig") then skips the placeholder row, giving
    # total_ngrams = 0 for short docs while still emitting their key.
    doc_grams = _spread(corpus).select(
        F.col(key_col).alias("__key"),
        F.explode_outer(grams(text_col)).alias("__g"),
    ).select(
        "__key",
        F.when(F.col("__g").isNotNull(), F.xxhash64("__g")).alias("__sig"),
    )
    # Left join against the (tiny, broadcast-eligible) benchmark set,
    # then one groupBy: count(__sig) = total grams, count(__hit) = hits.
    out = (
        doc_grams.join(bench_grams, "__sig", "left")
        .groupBy("__key")
        .agg(
            F.count("__sig").alias("total_ngrams"),
            F.count("__hit").alias("hit_ngrams"),
        )
        .select(
            F.col("__key").alias(key_col),
            "total_ngrams",
            "hit_ngrams",
            F.when(
                F.col("total_ngrams") > 0,
                F.col("hit_ngrams").cast("double") / F.col("total_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )
    return out


def badword_stats(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    word_col: str = "word",
) -> DataFrame:
    """(key_col, total_tokens, bad_tokens, bad_frac) per document against
    a word blocklist — the C4 "bad words" gate's accounting (C4 drops a
    page on ANY hit, i.e. bad_tokens > 0; Gopher-style recipes gate on
    the fraction instead — both read off this frame).

    Matching is on the curation family's RAW tokenizer (lower, split
    non-alphanumeric, stop words KEPT — operators/dsir._tokens; the
    text-search tokenizer would drop stopword blocklist entries and
    shrink the denominator), so multi-token blocklist phrases should be
    added as their individual words by the caller. Plan: one corpus
    tokenize + explode, LEFT join against the BROADCAST (≤ tens of
    thousands of rows) lowered blocklist, one map-side-combined
    groupBy(key) — the same shape as ngram_contamination above."""
    from apache_pinot_spark.operators.dsir import _tokens

    bl = F.broadcast(
        blocklist.select(
            F.lower(F.col(word_col)).alias("__bad"),
            F.lit(1).alias("__hit"),
        ).distinct()
    )
    toks = _spread(df).select(
        F.col(key_col).alias("__key"),
        F.explode_outer(_tokens(F.col(text_col))).alias("__tok"),
    )
    return (
        toks.join(bl, toks["__tok"] == F.col("__bad"), "left")
        .groupBy("__key")
        .agg(
            F.count("__tok").alias("total_tokens"),
            F.count("__hit").alias("bad_tokens"),
        )
        .select(
            F.col("__key").alias(key_col),
            "total_tokens",
            "bad_tokens",
            F.when(
                F.col("total_tokens") > 0,
                F.col("bad_tokens").cast("double") / F.col("total_tokens"),
            ).otherwise(F.lit(0.0)).alias("bad_frac"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    word_col: str = "word",
    max_bad_frac: float = 0.0,
) -> DataFrame:
    """Drop documents whose blocklisted-token fraction exceeds
    ``max_bad_frac`` (0.0 = the C4 any-hit rule). Output schema = input
    schema; one keyed anti join past the badword_stats shuffle."""
    hits = badword_stats(df, blocklist, text_col, key_col, word_col) \
        .filter(F.col("bad_frac") > max_bad_frac) \
        .select(key_col)
    return df.join(hits, on=key_col, how="left_anti")
