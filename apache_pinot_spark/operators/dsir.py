"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
distribution looks like a small TARGET corpus, by scoring each document
with an importance log-weight sum over hashed n-gram features and then
resampling with Gumbel top-k.

Spark-first design, exactness, and 100 TB posture:

  * Features are hashed unigram+bigram buckets. The bucket id is the
    first ``hash_chars`` hex chars of md5(gram) — a STRING key both
    Spark and any SQL oracle compute identically (no hex→int builtin
    needed), giving B = 16**hash_chars buckets. Tokenization is the
    corpus-curation convention (lower, split on non-alphanumeric), same
    as operators/curation.py, so one tokenizer governs the pipeline.
    Production fast path (round 8): pass ``bucket_hash='xxhash64'`` for
    pmod(xxhash64(gram), B) LONG buckets — one JVM hash instruction per
    gram instead of md5+hex+substring (measured delta in SCALE.md §18);
    the md5 convention stays the default because it is the one a SQL
    oracle can replay bit-for-bit (the driver-gated query uses it).
  * Bucket count tables are ≤ B rows (default 4096) regardless of
    corpus size: one explode + map-side-combined count per corpus. The
    weight table is therefore broadcast-joinable at any scale.
  * The hash-heavy explodes ride behind dedup._spread: small-file
    inputs (one scan partition) fan out across cores before the md5
    projection; at cluster scale the input is already many partitions
    and the rebalance is a near-no-op.
  * Per-document scores are SUM(count · weight) with weights quantized
    to DECIMAL — decimal aggregation is order-independent and exact, so
    scores are bit-stable across runs, partitionings, and engines (the
    repo's cross-engine hash rule; doubles would make the reduce order
    observable).
  * Log-weights themselves are computed JVM-side from the two count
    tables (a B-row frame): smoothed log(p̂/q̂) rounded to
    ``quantize`` decimals. Only the ln() call is float; everything
    after is decimal-exact.
  * Resampling is deterministic Gumbel top-k: the uniform comes from
    md5(id ‖ salt) (52 bits → exact double), so the draw is
    reproducible and re-dealable by salt, with no RNG state shipped.
    Exact top-n uses Spark's TakeOrdered path and is bounded-or-raise;
    the threshold variant serves huge n with two scans and no global
    sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_pinot_spark.operators.dedup import _spread

# one tokenizer for the curation family (operators/curation.py uses the
# same split on the lowered text)
_TOKEN_SPLIT = "[^a-z0-9]+"

_WEIGHT_DECIMAL = "DECIMAL(26,12)"
_SCORE_DECIMAL = "DECIMAL(38,12)"


def _tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(c), _TOKEN_SPLIT), lambda x: x != F.lit(""))


def _grams(c: Column, n: int) -> Column:
    """All 1..n-grams (space-joined) of the token array, one JVM pass."""
    toks = _tokens(c)
    parts = [toks]
    for k in range(2, n + 1):
        # k-gram i: tokens[i] .. tokens[i+k-1]; zip_with over shifted
        # slices, then trim to size-k+1 — zip_with pads the shorter side
        # with null and concat_ws SKIPS nulls, so without the trim the
        # tail would emit spurious (<k)-grams
        arr = toks
        for shift in range(1, k):
            arr = F.zip_with(
                arr,
                F.slice(toks, shift + 1, F.greatest(F.size(toks) - shift, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        parts.append(F.slice(arr, 1, F.greatest(F.size(toks) - (k - 1), F.lit(0))))
    return F.flatten(F.array(*parts))


def _buckets(c: Column, n: int, hash_chars: int, bucket_hash: str = "md5") -> Column:
    """Hashed bucket ids for every 1..n-gram.

    bucket_hash='md5' (default): first ``hash_chars`` hex chars of
    md5(gram) — a STRING key any SQL oracle reproduces verbatim (the
    cross-engine-exact convention the driver-gated query needs).
    bucket_hash='xxhash64' (round-8 engine fast path): pmod(xxhash64, B)
    — a LONG key computed by one JVM hash instruction instead of a full
    md5 + hex render + substring per gram; same bucket count, same
    downstream shapes, ~same statistical quality (both are uniform
    hashes), measured ~1.8x faster end-to-end on the score pipeline
    (SCALE.md §18). Not SQL-oracle-reproducible (xxhash64 seeds/spec are
    Spark-internal), so the md5 path stays the verification convention."""
    grams = _grams(c, n)
    if bucket_hash == "xxhash64":
        B = 16 ** hash_chars
        return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(B)))
    if bucket_hash != "md5":
        raise ValueError(f"bucket_hash must be 'md5' or 'xxhash64', got {bucket_hash!r}")
    return F.transform(grams, lambda g: F.substring(F.md5(g), 1, hash_chars))


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    hash_chars: int = 3,
    bucket_hash: str = "md5",
) -> DataFrame:
    """(bucket, cnt) hashed n-gram counts over a corpus — one explode +
    one map-side-combined count; output is ≤ 16**hash_chars rows."""
    return (
        _spread(df)
        .select(F.explode(_buckets(F.col(text_col), n, hash_chars, bucket_hash)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_weights_split(
    raw: DataFrame,
    target_predicate: Column,
    text_col: str = "text",
    n: int = 2,
    hash_chars: int = 3,
    smoothing: float = 1.0,
    quantize: int = 12,
    bucket_hash: str = "md5",
) -> DataFrame:
    """dsir_log_weights for the common case where the target corpus is a
    SUBSET of the raw corpus (``target_predicate`` selects it): both
    count tables come from ONE tokenize+explode pass (count / conditional
    count in the same map-side-combined aggregate) instead of two corpus
    scans. Identical output to
    ``dsir_log_weights(raw, raw.filter(target_predicate), ...)``."""
    if hash_chars < 1 or hash_chars > 8:
        raise ValueError("hash_chars must be in 1..8")
    B = 16 ** hash_chars
    lam = float(smoothing)
    if lam <= 0:
        raise ValueError("smoothing must be > 0 (unsmoothed ratios divide by zero)")
    feats = _spread(raw).select(
        target_predicate.alias("in_target"),
        F.explode(_buckets(F.col(text_col), n, hash_chars, bucket_hash)).alias("bucket"),
    )
    # counts feeds BOTH the totals broadcast and the weights projection;
    # without the persist the whole tokenize+explode+groupBy subtree
    # executes twice (exchange reuse never fires across the broadcast
    # boundary — r13 plan audit). ≤ B rows; lifetime tied to the
    # returned frame, populated by its first downstream action.
    from apache_pinot_spark.operators.lifecycle import release_on_death

    counts = feats.groupBy("bucket").agg(
        F.count("*").alias("rc"),
        F.count_if(F.col("in_target")).alias("tc"),
    ).persist()
    totals = counts.agg(
        F.sum("rc").alias("r_total"), F.sum("tc").alias("t_total")
    )
    joined = counts.crossJoin(F.broadcast(totals))
    p = (F.col("tc") + F.lit(lam)) / (F.coalesce(F.col("t_total"), F.lit(0)) + F.lit(lam * B))
    q = (F.col("rc") + F.lit(lam)) / (F.coalesce(F.col("r_total"), F.lit(0)) + F.lit(lam * B))
    out = joined.select(
        "bucket",
        F.round(F.log(p / q), quantize).cast(_WEIGHT_DECIMAL).alias("weight"),
    )
    return release_on_death(out, counts)


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n: int = 2,
    hash_chars: int = 3,
    smoothing: float = 1.0,
    quantize: int = 12,
    bucket_hash: str = "md5",
) -> DataFrame:
    """(bucket, weight) smoothed importance log-weights, weight a DECIMAL:

        weight(b) = round( ln( p̂(b) / q̂(b) ), quantize )
        p̂(b) = (target_cnt(b) + λ) / (target_total + λ·B)   (q̂ from raw)

    Buckets are the union of both corpora's observed buckets (full outer
    join of two ≤B-row count tables; scalar totals fold in as literals
    via a cross join of one-row aggregates — no driver round-trip)."""
    if hash_chars < 1 or hash_chars > 8:
        raise ValueError("hash_chars must be in 1..8")
    B = 16 ** hash_chars
    lam = float(smoothing)
    if lam <= 0:
        raise ValueError("smoothing must be > 0 (unsmoothed ratios divide by zero)")
    # each count table feeds BOTH its totals broadcast and the full-outer
    # join — persisted so the corpus tokenize+explode runs once per
    # corpus, not twice (r13; see dsir_log_weights_split)
    from apache_pinot_spark.operators.lifecycle import release_on_death

    tc = hashed_ngram_counts(target, text_col, n, hash_chars, bucket_hash).withColumnRenamed("cnt", "tc").persist()
    rc = hashed_ngram_counts(raw, text_col, n, hash_chars, bucket_hash).withColumnRenamed("cnt", "rc").persist()
    tt = tc.agg(F.sum("tc").alias("t_total"))
    rt = rc.agg(F.sum("rc").alias("r_total"))
    joined = (
        tc.join(rc, on="bucket", how="full_outer")
        .na.fill({"tc": 0, "rc": 0})
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
    )
    p = (F.col("tc") + F.lit(lam)) / (F.coalesce(F.col("t_total"), F.lit(0)) + F.lit(lam * B))
    q = (F.col("rc") + F.lit(lam)) / (F.coalesce(F.col("r_total"), F.lit(0)) + F.lit(lam * B))
    out = joined.select(
        "bucket",
        F.round(F.log(p / q), quantize).cast(_WEIGHT_DECIMAL).alias("weight"),
    )
    return release_on_death(out, tc, rc)


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    hash_chars: int = 3,
    bucket_hash: str = "md5",
) -> DataFrame:
    """(id_col, score) per-document importance score: SUM over the doc's
    hashed n-grams of weight(bucket), as an exact DECIMAL (zero-feature
    docs score 0). One explode + one broadcast join (the weight table is
    ≤ B rows) + one groupBy(id) decimal sum — a single shuffle keyed by
    document id."""
    feats = _spread(raw).select(
        F.col(id_col),
        F.explode(_buckets(F.col(text_col), n, hash_chars, bucket_hash)).alias("bucket"),
    )
    scored = (
        feats.join(F.broadcast(weights), on="bucket")
        .groupBy(id_col)
        .agg(F.sum("weight").cast(_SCORE_DECIMAL).alias("score"))
    )
    return (
        raw.select(id_col)
        .join(scored, on=id_col, how="left")
        .na.fill({"score": 0})
        .select(id_col, F.col("score").cast(_SCORE_DECIMAL).alias("score"))
    )


def _gumbel_key(id_c: Column, salt: str, score: Column, temperature: float) -> Column:
    """score/T + Gumbel(0,1) noise, the Gumbel's uniform drawn from
    md5(id ‖ salt): 13 hex chars = 52 bits → conv() yields an integer
    exact in double; u ∈ (0,1) strictly, so both logs are finite."""
    u = (
        F.conv(F.substring(F.md5(F.concat(id_c.cast("string"), F.lit(f"|{salt}"))), 1, 13), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16 ** 13) + 2.0)
    g = -F.log(-F.log(u))
    return score.cast("double") / F.lit(float(temperature)) + g


def dsir_resample(
    raw: DataFrame,
    weights: DataFrame,
    n_select: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    hash_chars: int = 3,
    temperature: float = 1.0,
    salt: str = "",
    max_exact_n: int = 10_000_000,
    exact: bool = True,
    bucket_hash: str = "md5",
) -> DataFrame:
    """Select ~``n_select`` documents by Gumbel top-k on score/T + G_i —
    equivalent to sampling without replacement ∝ exp(score/T), but fully
    deterministic (hash-derived Gumbels, re-dealable via ``salt``).

    exact=True: the true top-n via orderBy+limit — Spark's TakeOrdered
    keeps n rows per partition then merges, so n is driver-bounded:
    n_select > max_exact_n raises instead of silently materializing.
    exact=False: two-scan threshold variant for huge n — approxQuantile
    picks the key cutoff (relative error 1/√n bounded at 1e-4), then one
    filter; returns ≈ n_select rows with no global sort and no driver
    materialization beyond one quantile. Returns (id_col, score, key).
    """
    scores = dsir_scores(raw, weights, text_col, id_col, n, hash_chars, bucket_hash)
    keyed = scores.withColumn(
        "key", _gumbel_key(F.col(id_col), salt, F.col("score"), temperature)
    )
    if exact:
        if n_select > max_exact_n:
            raise ValueError(
                f"n_select={n_select} exceeds max_exact_n={max_exact_n}; "
                "use exact=False (threshold variant) for corpus-scale selections"
            )
        return keyed.orderBy(F.desc("key"), F.asc(id_col)).limit(n_select)
    total = keyed.count()
    if n_select >= total:
        return keyed
    q = 1.0 - (n_select / total)
    rel_err = max(min(1.0 / max(n_select, 1) ** 0.5, 0.01), 1e-4)
    cutoff = keyed.stat.approxQuantile("key", [q], rel_err)[0]
    return keyed.filter(F.col("key") >= cutoff)
