"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020, arXiv:1911.00359) large-scale pipelines use
to bucket web documents by reference-corpus likeness (RedPajama/CCNet
"head/middle/tail"): train a count-based bigram LM with stupid backoff
(Brants et al. 2007) on a reference corpus, score every document by its
mean token log-probability, and cut the corpus into perplexity buckets.

Beyond the reference's documented surface (like dedup/DSIR/curation) and
under the same discipline — Spark-first, decimal-exact, 100 TB-shaped:

  * The trained model is BOUNDED regardless of reference size: the top
    ``vocab_size`` unigrams and top ``bigram_size`` bigrams by
    (count DESC, token ASC) — a deterministic distributed sort-limit
    (TakeOrdered), the same pruning a shipped KenLM filter applies. Both
    tables broadcast at score time; corpus documents never shuffle to
    meet the model.
  * Log-probabilities are computed ONCE per model row JVM-side —
    ln() rounded to ``quantize`` decimals and cast to DECIMAL (the DSIR
    convention: the one float op is crushed by rounding, everything
    after is decimal-exact). Per-document sums are therefore
    order-independent and bit-stable across runs, partitionings, and
    engines; a SQL oracle replays them verbatim.
  * Training explodes the reference ONCE (unigram counts are per-w sums
    of the (prev, w) pair counts — every token is the `w` of exactly
    one position), and the model tables materialize eagerly with
    truncated lineage, so no later action re-scans the reference.
  * Scoring is one _spread explode of (prev, w) token positions, two
    broadcast left joins, one groupBy(doc) — a single corpus shuffle.
  * Bucketing is an exact ntile window over (avg_logp, doc_id) — one
    sort shuffle, deterministic under ties.

Stupid-backoff scoring of position i (tokens lowered, split on
non-alphanumeric — the curation-family tokenizer):

    i = 1:             logp = uni(w)                  # no context
    (prev,w) in LM:    logp = ln(c(prev,w) / c(prev)) # true conditional
    else:              logp = ln(alpha) + uni(w)      # backoff penalty

with uni(w) = ln((c(w)+1) / (T+V+1)) for kept-vocab w, ln(1/(T+V+1))
for OOV (add-one over the pruned vocab plus one OOV mass unit); T =
reference token count, V = kept vocab size, alpha = 0.4 by default.
c(prev) is the TRUE unpruned reference count (folded into the bigram
row at train time, so no denominator table ships).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_pinot_spark.operators.dedup import _spread
from apache_pinot_spark.operators.dsir import _tokens

_LOGP_DECIMAL = "DECIMAL(26,12)"
_SUM_DECIMAL = "DECIMAL(38,12)"


@dataclass(frozen=True)
class BigramLM:
    """A pruned, broadcast-sized bigram model: ``unigrams`` (w, logp_uni
    DECIMAL), ``bigrams`` (prev, w, logp DECIMAL), and the two scalar
    decimals every scorer needs. All fields are exact decimals or
    bounded DataFrames — nothing corpus-sized leaves the executors."""

    unigrams: DataFrame
    bigrams: DataFrame
    logp_oov: Decimal
    backoff_logp: Decimal
    total_tokens: int
    vocab_size: int


def _pair_frame(df: DataFrame, text_col: str, id_col: str | None = None,
                outer: bool = False) -> DataFrame:
    """Exploded (prev, w[, id]) scoring positions — (NULL, tok_1) then
    (tok_i, tok_{i+1}) — via posexplode + guarded element_at (r13:
    whole-stage codegen; the previous array<struct> construction went
    through interpreted zip_with/slice HOF lambdas on every corpus row,
    the same hotspot class as knlm's _ctx_positions). outer=True keeps
    empty/NULL-text rows as one all-NULL position (the scoring path's
    empty-doc marker); the guarded element_at never evaluates for the
    i=0 row (CASE short-circuits per row)."""
    toks = _tokens(F.col(text_col))
    gen = F.posexplode_outer if outer else F.posexplode
    base = [F.col(id_col)] if id_col else []
    ex = df.select(*base, toks.alias("__toks"), gen(toks).alias("__i", "w"))
    prev = F.when(F.col("__i") >= 1,
                  F.element_at(F.col("__toks"), F.col("__i")))
    return ex.select(*base, prev.alias("prev"), F.col("w"))


def _round6(x: float, quantize: int) -> Decimal:
    return Decimal(str(round(x, quantize)))


def train_bigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    backoff: float = 0.4,
    quantize: int = 6,
) -> BigramLM:
    """Count-prune-precompute on the reference corpus. Two counting
    shuffles (unigram, bigram) + one vocab-scale join folding the true
    context count into each bigram row; the prune is a deterministic
    distributed sort-limit by (count DESC, gram ASC). Training is an
    EAGER once-per-reference action: the reference is exploded ONCE
    (the (prev, w) count table feeds both unigram and bigram counts),
    and the bounded model tables are localCheckpoint-materialized so
    score time never re-scans the reference corpus."""
    if vocab_size < 1 or bigram_size < 0:
        raise ValueError("vocab_size must be >= 1 and bigram_size >= 0")
    if not 0 < backoff <= 1:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    # ONE corpus explode covers both tables: every token is the `w` of
    # exactly one scoring position ((NULL, t1) or (t_{i-1}, t_i)), so
    # unigram counts are the per-w sums of the (prev, w) count table —
    # a vocab-scale re-aggregation, not a second corpus pass.
    pos = _pair_frame(_spread(reference), text_col)
    pw = pos.groupBy("prev", "w").agg(F.count("*").alias("cnt")).persist()
    return _assemble_bigram_lm(pw, vocab_size, bigram_size, backoff,
                               quantize, release=(pw,))


def _assemble_bigram_lm(
    pw: DataFrame,
    vocab_size: int,
    bigram_size: int,
    backoff: float,
    quantize: int,
    release: tuple = (),
) -> BigramLM:
    """Assemble a BigramLM from an already-persisted (prev, w, cnt)
    position-count table — the shared-count entry point (r14): the fused
    KN+bigram trainer (operators/knlm.train_kn_bigram_lm) feeds both
    estimators from ONE tagged count shuffle, of which ``pw`` is the
    k=2 view (NULL prev = first-token positions). Frames in ``release``
    are unpersisted once the bounded model tables materialize; a caller
    sharing ``pw`` across trainers passes release=() and owns the
    lifetime."""
    from apache_pinot_spark.operators.lifecycle import materialize_release

    if vocab_size < 1 or bigram_size < 0:
        raise ValueError("vocab_size must be >= 1 and bigram_size >= 0")
    if not 0 < backoff <= 1:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    ucnt = pw.groupBy("w").agg(F.sum("cnt").alias("cnt"))
    # ONE scalar job yields both training constants (populates the pw
    # cache): total token count + distinct-word count; kept vocab is the
    # min with the cap, exactly what counting the post-limit frame gave.
    stats = ucnt.agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total = stats["t"] or 0
    v = min(vocab_size, stats["n"] or 0)
    vocab = ucnt.orderBy(F.desc("cnt"), F.asc("w")).limit(vocab_size)
    denom = total + v + 1
    # BOTH bounded model tables materialize in ONE localCheckpoint job: a
    # tag-column union, split back lazily below (filters over checkpoint
    # blocks — no recompute). Was two sequential checkpoint jobs.
    uni_part = vocab.select(
        F.lit("u").alias("tag"),
        F.lit(None).cast("string").alias("prev"),
        "w",
        F.round(F.log((F.col("cnt") + F.lit(1.0)) / F.lit(float(denom))),
                quantize)
        .cast(_LOGP_DECIMAL)
        .alias("logp"),
    )
    bcnt = pw.where(F.col("prev").isNotNull()).withColumnRenamed("cnt", "bcnt")
    big_part = (
        bcnt.join(
            ucnt.withColumnRenamed("w", "prev").withColumnRenamed("cnt", "pcnt"),
            on="prev",
        )
        .orderBy(F.desc("bcnt"), F.asc("prev"), F.asc("w"))
        .limit(bigram_size)
        .select(
            F.lit("b").alias("tag"),
            "prev",
            "w",
            F.round(F.log(F.col("bcnt") / F.col("pcnt")), quantize)
            .cast(_LOGP_DECIMAL)
            .alias("logp"),
        )
    )
    model_tbl = materialize_release(
        uni_part.unionByName(big_part),
        # model tables are lineage-truncated: release the count cache
        # (empty when the caller shares the counts across trainers)
        *release,
    )
    unigrams = model_tbl.where(F.col("tag") == "u").select(
        "w", F.col("logp").alias("logp_uni")
    )
    bigrams = model_tbl.where(F.col("tag") == "b").select("prev", "w", "logp")
    # the split frames are lazy views over model_tbl's checkpoint blocks:
    # keep the materialized frame alive as long as either split is
    unigrams._lm_model_keepalive = model_tbl
    bigrams._lm_model_keepalive = model_tbl
    return BigramLM(
        unigrams=unigrams,
        bigrams=bigrams,
        logp_oov=_round6(math.log(1.0 / denom), quantize),
        backoff_logp=_round6(math.log(backoff), quantize),
        total_tokens=int(total),
        vocab_size=int(v),
    )


def lm_doc_scores(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_tokens, sum_logp DECIMAL, avg_logp DOUBLE): per-document
    stupid-backoff log-probability. One corpus shuffle (the groupBy);
    the model joins are broadcast. avg_logp is sum/n — ONE IEEE division
    on an exact decimal sum, deterministic on any engine; perplexity is
    exp(-avg_logp), left to the caller (exp is the one libm call whose
    last-ulp is engine-specific). Zero-token documents score n=0 with
    NULL avg."""
    oov = F.lit(lm.logp_oov).cast(_LOGP_DECIMAL)
    bo = F.lit(lm.backoff_logp).cast(_LOGP_DECIMAL)
    pos = _pair_frame(_spread(docs), text_col, id_col=id_col, outer=True)
    uni = F.coalesce(F.col("logp_uni"), oov)
    scored = (
        pos.join(F.broadcast(lm.bigrams), on=["prev", "w"], how="left")
        .join(F.broadcast(lm.unigrams), on="w", how="left")
        .select(
            id_col,
            F.when(F.col("w").isNull(), F.lit(None).cast(_LOGP_DECIMAL))  # empty doc
            .when(F.col("logp").isNotNull(), F.col("logp"))      # true bigram
            .when(F.col("prev").isNull(), uni)                   # first token
            .otherwise(bo + uni)                                  # backoff
            .alias("logp_tok"),
        )
    )
    out = (
        scored.groupBy(id_col)
        .agg(
            F.count("logp_tok").alias("n_tokens"),
            F.coalesce(F.sum("logp_tok"), F.lit(0))
            .cast(_SUM_DECIMAL)
            .alias("sum_logp"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_logp",
            F.when(
                F.col("n_tokens") > 0,
                F.col("sum_logp").cast("double") / F.col("n_tokens"),
            ).alias("avg_logp"),
        )
    )
    # the plan reads the model's localCheckpoint blocks: keep the model
    # alive for as long as the caller holds this frame (see the
    # dedup_keep_canonical note — a dead handle lets the next lifecycle
    # sweep free blocks this lazy plan still needs)
    out._lm_model_keepalive = lm
    return out


def perplexity_buckets(
    scores: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 3,
    exact: bool = True,
    max_exact_n: int = 10_000_000,
) -> DataFrame:
    """CCNet head/middle/tail: bucket 1 holds the most reference-like
    documents (highest mean log-probability = lowest perplexity).

    exact=True: ntile over (avg_logp DESC, id ASC) — deterministic under
    ties, equal-sized buckets, but a global window is ONE sort task, so
    it is fenced bounded-or-raise at ``max_exact_n`` rows (the
    dsir_resample fence). exact=False is the corpus-scale path: bucket
    CUTOFFS from approxQuantile (two scans, bounded driver state), then
    a map-side comparison — fully parallel, bucket sizes approximate
    within the quantile sketch's error. Unscored (n=0) docs land in the
    last bucket on both paths."""
    from pyspark.sql import Window

    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if exact:
        n = scores.count()
        if n > max_exact_n:
            raise ValueError(
                f"exact ntile bucketing sorts {n} rows in one task; over "
                f"max_exact_n={max_exact_n} — use exact=False (quantile "
                "cutoffs) at corpus scale"
            )
        w = Window.orderBy(F.desc_nulls_last("avg_logp"), F.asc(id_col))
        out = scores.withColumn("bucket", F.ntile(buckets).over(w))
        out._lm_scores_keepalive = scores  # transitively keeps the model
        return out
    qs = [i / buckets for i in range(1, buckets)]
    cuts = scores.filter(F.col("avg_logp").isNotNull()).approxQuantile(
        "avg_logp", [1 - q for q in qs], 0.001
    )  # descending avg_logp order: bucket k+1 below the (1 - k/B) quantile
    bucket = F.lit(1)
    for i, c in enumerate(cuts):
        bucket = F.when(F.col("avg_logp") < F.lit(c), F.lit(i + 2)).otherwise(bucket)
    out = scores.withColumn(
        "bucket",
        F.when(F.col("avg_logp").isNull(), F.lit(buckets)).otherwise(bucket),
    )
    out._lm_scores_keepalive = scores  # transitively keeps the model
    return out
