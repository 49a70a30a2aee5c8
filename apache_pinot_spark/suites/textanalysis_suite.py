"""Driver-gate queries for text analysis operators (token counting,
quality scoring, language ID, fingerprinting) with DuckDB oracles that
replicate the arithmetic exactly (integer counts + single divisions)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.functions.text import DEFAULT_STOP_WORDS
from apache_pinot_spark.operators import textanalysis as tx
from apache_pinot_spark.querysuite import df_query

_STOP_SQL = ",".join("'" + w + "'" for w in sorted(DEFAULT_STOP_WORDS))

_WS_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
_WS_TOKS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')"


def _docs(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


# Frozen BPE merge table (r9): trained ONCE via operators/bpe.train_bpe
# (num_merges=24) on the sf0.01 documents corpus and shipped as a fixed
# artifact — exactly how real pipelines budget tokens against a fixed
# tokenizer file (GPT-2's merges.txt shape). Freezing makes the EXACT
# greedy encode SQL-replayable: the oracle replays best-rank-leftmost
# merging per word type with a recursive CTE over these literals.
_BPE_MERGES = [
    ("e", "r</w>"), ("o", "w</w>"), ("t", "o"), ("a", "t"), ("l", "u"),
    ("a", "s"), ("i", "n"), ("e", "r"), ("o", "r"), ("a", "r"),
    ("p", "ar"), ("i", "n</w>"), ("j", "o"), ("jo", "in</w>"),
    ("as", "h</w>"), ("h", "ash</w>"), ("r", "ow</w>"), ("at", "c"),
    ("atc", "h</w>"), ("b", "atch</w>"), ("a", "n</w>"), ("c", "an</w>"),
    ("s", "can</w>"), ("c", "o"),
]


def _token_accounting(spark, sf_dir):
    from apache_pinot_spark.operators.bpe import bpe_token_counts

    d = _docs(spark, sf_dir)
    base = (
        d.select(
            "lang",
            tx.token_count_expr("text").alias("nt"),
            F.length("text").alias("nc"),
            tx.bpe_ish_token_count_expr("text").alias("bt"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("nt").alias("sum_tokens"),
            F.sum("nc").alias("sum_chars"),
            (F.sum("nt").cast("double") / F.count("*")).alias("avg_tokens"),
            F.sum("bt").alias("sum_bpe_tokens"),
        )
    )
    # exact subword budget (r9 fold of verdict item #9): true BPE piece
    # counts under the frozen merge table — zero-shuffle Arrow encode,
    # per-lang sums ride a broadcast join onto the scan aggregate
    pieces = bpe_token_counts(d, [list(m) for m in _BPE_MERGES])
    exact = (
        d.select("doc_id", "lang")
        .join(pieces, on="doc_id")
        .groupBy("lang")
        .agg(F.sum("n_pieces").alias("sum_bpe_exact"))
    )
    tokens = (base.join(F.broadcast(exact), on="lang")
              .select(F.lit("tokens").alias("facet"),
                      F.col("lang").alias("k1"),
                      F.col("docs").cast("bigint").alias("docs"),
                      F.col("sum_tokens").cast("bigint"),
                      F.col("sum_chars").cast("bigint"),
                      "avg_tokens",
                      F.col("sum_bpe_tokens").cast("bigint"),
                      F.col("sum_bpe_exact").cast("bigint")))
    # r13 fold: the winnowing fingerprint-overlap facet shares this
    # slot (frees a window position for the bloom-dedup gate); its
    # original oracle replays unchanged under facet='fingerprint'
    # (docs := shared_fps, sum_tokens := docs_involved, rest 0)
    fps = (tx.winnow_fingerprints(d, shingle_n=4, keep=4)
           .withColumnRenamed("key", "doc_id"))
    overlap = (
        fps.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .agg(F.count("*").cast("bigint").alias("shared_fps"),
             F.coalesce(F.sum("n_docs"), F.lit(0)).cast("bigint")
             .alias("docs_involved"))
        .select(F.lit("fingerprint").alias("facet"),
                F.lit("").alias("k1"),
                F.col("shared_fps").alias("docs"),
                F.col("docs_involved").alias("sum_tokens"),
                F.lit(0).cast("bigint").alias("sum_chars"),
                F.lit(0.0).alias("avg_tokens"),
                F.lit(0).cast("bigint").alias("sum_bpe_tokens"),
                F.lit(0).cast("bigint").alias("sum_bpe_exact")))
    return tokens.unionByName(overlap).orderBy("facet", "k1")


_BPE_KEYS_SQL = "[" + ",".join(f"'{a}|{b}'" for a, b in _BPE_MERGES) + "]"

# Exact greedy-BPE replay: per DISTINCT word type, a recursive CTE walks
# the engine's best-rank-leftmost merge loop (rank = 1-based position in
# the frozen key list; 999999 = no merge; list_position picks the
# LEFTMOST minimum — the engine's tie-break). The trace emits every
# intermediate state; MIN(len) per word is the terminal piece count.
_BPE_ORACLE_CTES = f"""
toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS w
  FROM documents
),
bpe_vocab AS (SELECT DISTINCT w FROM toks),
enc(w, syms) AS (
  SELECT w,
         list_append(list_transform(range(1, length(w)), i -> substr(w, i, 1)),
                     substr(w, length(w), 1) || '</w>') AS syms
  FROM bpe_vocab
  UNION ALL
  SELECT w,
         syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:] AS syms
  FROM (
    SELECT w, syms, list_position(rk, list_min(rk)) AS bi
    FROM (
      SELECT w, syms,
             list_transform(range(1, len(syms)),
               i -> coalesce(nullif(list_position({_BPE_KEYS_SQL},
                                                  syms[i] || '|' || syms[i+1]), 0),
                             999999)) AS rk
      FROM enc
    )
    WHERE len(rk) > 0 AND list_min(rk) < 999999
  )
),
bpe_pieces AS (SELECT w, MIN(len(syms)) AS n_pieces FROM enc GROUP BY w),
bpe_by_lang AS (
  SELECT d.lang, CAST(SUM(p.n_pieces) AS BIGINT) AS sum_bpe_exact
  FROM documents d
  JOIN toks t ON t.doc_id = d.doc_id
  JOIN bpe_pieces p ON p.w = t.w
  GROUP BY d.lang
)
"""

df_query(
    "tx_token_accounting",
    _token_accounting,
    rf"""
    WITH RECURSIVE
    {_BPE_ORACLE_CTES.strip().rstrip()},
    fp AS (
      SELECT doc_id,
             unnest(list_sort(list_transform(
               range(1, greatest(len({_WS_TOKS_LOWER}) - 3, 0) + 1),
               i -> md5(array_to_string(({_WS_TOKS_LOWER})[i:i+3], ' '))))[1:4]) AS fp
      FROM documents
    ),
    shared AS (
      SELECT fp, COUNT(DISTINCT doc_id) AS n_docs FROM fp GROUP BY fp
      HAVING COUNT(DISTINCT doc_id) > 1
    )
    SELECT * FROM (
      SELECT 'tokens' AS facet, d.lang AS k1, COUNT(*) AS docs,
             CAST(SUM(len({_WS_TOKS})) AS BIGINT) AS sum_tokens,
             CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
             CAST(SUM(len({_WS_TOKS})) AS DOUBLE) / COUNT(*) AS avg_tokens,
             CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))) AS BIGINT)
               AS sum_bpe_tokens,
             ANY_VALUE(b.sum_bpe_exact) AS sum_bpe_exact
      FROM documents d JOIN bpe_by_lang b ON b.lang = d.lang
      GROUP BY d.lang
      UNION ALL
      SELECT 'fingerprint', '', COUNT(*),
             CAST(COALESCE(SUM(n_docs), 0) AS BIGINT),
             0, 0.0, 0, 0
      FROM shared
    ) ORDER BY facet, k1
    """,
    tables=["documents"],
    doc="Whitespace token stats + BPE-ish subword estimate (alnum runs + "
        "punctuation chars) + EXACT greedy-BPE piece counts under a frozen "
        "24-merge tokenizer artifact (operators/bpe.bpe_token_counts; the "
        "oracle replays best-rank-leftmost merging with a recursive CTE — "
        "r9 fold of the BPE token-accounting gate item), per language; "
        "plus the winnowing fingerprint-overlap facet (r13 fold of "
        "tx_fingerprint_overlap — its oracle replays unchanged)",
)


# r12 fold: tx_quality_buckets + tx_lang_id_eval share one slot (freed
# the window position for curation_gates_accounting, the r12 verdict's
# top ask). Both facets keep their full original validation — the
# quality histogram rows carry facet='quality' (k1=bucket, k2=''), the
# language confusion rows facet='langid' (k1=lang, k2=guess); the
# oracle is the UNION ALL of the two original oracles shaped the same.
def _quality_lang_eval(spark, sf_dir):
    d = _docs(spark, sf_dir)
    qb = (
        d.select(F.floor(tx.quality_score_expr("text") / 10).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.lit("quality").alias("facet"),
            F.col("bucket").cast("string").alias("k1"),
            F.lit("").alias("k2"),
            "cnt",
        )
    )
    le = (
        d.select("lang", tx.lang_id_expr("text").alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.lit("langid").alias("facet"),
            F.col("lang").alias("k1"),
            F.col("guess").alias("k2"),
            "cnt",
        )
    )
    return qb.unionByName(le).orderBy("facet", "k1", "k2")


def _marker_sql(lang: str) -> str:
    markers = ",".join("'" + m + "'" for m in tx.LANG_MARKERS[lang])
    return f"len(list_filter({_WS_TOKS_LOWER}, x -> x IN ({markers})))"


df_query(
    "tx_quality_lang_eval",
    _quality_lang_eval,
    f"""
    WITH feat AS (
      SELECT
        length(text) AS n_chars_m,
        len({_WS_TOKS}) AS n_tokens,
        len(list_filter({_WS_TOKS_LOWER}, x -> x IN ({_STOP_SQL}))) AS n_stop,
        length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS n_punct,
        length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
      FROM documents
    ),
    score AS (
      SELECT greatest(least(
        50.0
        + least(CAST(n_stop AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 100, 25.0)
        + (CASE WHEN CAST(n_chars_m AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0)
                    BETWEEN 3 AND 12 THEN 25.0 ELSE 0.0 END)
        - least(CAST(n_digits AS DOUBLE) / greatest(CAST(n_chars_m AS DOUBLE), 1.0) * 100, 50.0)
      , 100.0), 0.0) AS q
      FROM feat
    ),
    buckets AS (
      SELECT CAST(floor(q / 10) AS BIGINT) AS bucket, COUNT(*) AS cnt
      FROM score GROUP BY 1
    ),
    m AS (
      SELECT lang,
             {_marker_sql('de')} AS de_c, {_marker_sql('en')} AS en_c,
             {_marker_sql('es')} AS es_c, {_marker_sql('fr')} AS fr_c,
             {_marker_sql('zh')} AS zh_c
      FROM documents
    ),
    g AS (
      SELECT lang, CASE
        WHEN de_c >= greatest(en_c, es_c, fr_c, zh_c, 1) THEN 'de'
        WHEN en_c >= greatest(es_c, fr_c, zh_c, 1) THEN 'en'
        WHEN es_c >= greatest(fr_c, zh_c, 1) THEN 'es'
        WHEN fr_c >= greatest(zh_c, 1) THEN 'fr'
        WHEN zh_c >= 1 THEN 'zh'
        ELSE 'und' END AS guess
      FROM m
    )
    SELECT facet, k1, k2, cnt FROM (
      SELECT 'quality' AS facet, CAST(bucket AS VARCHAR) AS k1, '' AS k2, cnt
      FROM buckets
      UNION ALL
      SELECT 'langid', lang, guess, COUNT(*) FROM g GROUP BY lang, guess
    )
    ORDER BY facet, k1, k2
    """,
    tables=["documents"],
    doc="Quality-score histogram (length/stopword/digit heuristics) + "
        "marker-word language-ID confusion vs the labeled lang column "
        "(r12 fold of tx_quality_buckets + tx_lang_id_eval; both "
        "original oracles replay unchanged under a facet tag)",
)





# (tx_fingerprint_overlap folded into tx_token_accounting above — r13;
# the slot it freed registers the bloom-dedup excision gate in
# suites/dedup_suite.py)


# --------------------------------------------------------------------------
# DSIR — hashed n-gram importance scores (operators/dsir.py). The bucket
# is a md5-substring STRING key, so the oracle rebuilds the identical
# feature stream; weights are ln(p̂/q̂) rounded to 6 decimals (ulp-level
# cross-engine ln drift is crushed by the rounding) and quantized to
# DECIMAL, making the per-document score sums order-independent and
# bit-exact on both engines. Target corpus = doc_id % 10 = 3.
# --------------------------------------------------------------------------


def _dsir_scores(spark, sf_dir):
    from apache_pinot_spark.operators import dsir

    docs = _docs(spark, sf_dir)
    # target ⊆ raw → one tokenize pass builds both count tables
    weights = dsir.dsir_log_weights_split(docs, F.col("doc_id") % 10 == 3, "text", quantize=6)
    return (
        dsir.dsir_scores(docs, weights, "text")
        .select("doc_id", F.col("score").cast("double").alias("score"))
        .orderBy("doc_id")
    )


df_query(
    "dsir_doc_scores",
    _dsir_scores,
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM (
        SELECT doc_id, unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-1, 0))) AS i) s
      )
    ),
    tc AS (SELECT bucket, count(*) AS c FROM grams WHERE doc_id % 10 = 3 GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS c FROM grams GROUP BY bucket),
    tt AS (SELECT sum(c) AS t FROM tc), rt AS (SELECT sum(c) AS t FROM rc),
    w AS (
      SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
             CAST(round(ln( ((coalesce(tc.c, 0) + 1.0) / (tt.t + 4096.0))
                          / ((coalesce(rc.c, 0) + 1.0) / (rt.t + 4096.0)) ), 6)
                  AS DECIMAL(26,12)) AS weight
      FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket, tt, rt
    ),
    s AS (
      SELECT g.doc_id, CAST(sum(w.weight) AS DECIMAL(38,12)) AS sc
      FROM grams g JOIN w ON w.bucket = g.bucket GROUP BY g.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(s.sc, 0) AS DOUBLE) AS score
    FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    tables=["documents"],
    doc="DSIR hashed-ngram importance scores vs a doc_id%10=3 target "
        "corpus — decimal-exact log-weight sums (operators/dsir.py)",
)


# --------------------------------------------------------------------------
# Bigram-LM perplexity scoring (operators/lm.py, CCNet arXiv:1911.00359).
# Reference corpus = the lang='en' documents; every document scored by
# stupid-backoff mean log-probability. The oracle retrains the model in
# SQL: unigram counts are per-w sums of the (prev, w) position counts
# (each token is the w of exactly one position — the engine's own
# single-explode identity), pruning is the same deterministic
# (count DESC, gram ASC) sort-limit, and every log-prob is round(ln, 6)
# cast to DECIMAL, so the per-document decimal sums match bit-for-bit;
# the one double emitted is a single DECIMAL->DOUBLE cast.
# --------------------------------------------------------------------------


_KN_PRUNE = {1: 500, 2: 1500, 3: 1500}
_KN_CTX_PRUNE = {2: 1000, 3: 1000}


def _lm_scores(spark, sf_dir):
    from apache_pinot_spark.operators import knlm as K

    docs = _docs(spark, sf_dir)
    ref = docs.filter(F.col("lang") == "en")
    # r13: the interpolated Kneser-Ney trigram (operators/knlm) scores
    # the same corpus side by side — the published CCNet/RedPajama
    # estimator next to the stupid-backoff baseline, both decimal-exact.
    # Fused scoring (guide §2.4): the KN positions frame carries the
    # bigram context (prev == h2), so ONE corpus explode + ONE groupBy
    # yields both score columns — bit-identical to the former two-pass
    # + join composition (order-independent decimal sums).
    # Fused TRAINING (r14, guide §2.4): both estimators assemble from
    # ONE tagged count shuffle over ONE reference explode — the bigram
    # (prev, w) counts are the tagged table's k=2 slice with NULL
    # contexts kept; models bit-identical to the two separate trainers
    # (test_fused_training_is_bit_identical).
    kn, model = K.train_kn_bigram_lm(
        ref, order=3, prune=dict(_KN_PRUNE),
        ctx_prune=dict(_KN_CTX_PRUNE), vocab_size=500, bigram_size=1000)
    return K.kn_bigram_doc_scores(docs, kn, model).select(
        "doc_id", "n_tokens",
        F.col("sum_logp").cast("double").alias("sum_logp"),
        F.col("sum_logp_kn").cast("double").alias("sum_logp_kn"),
    ).orderBy("doc_id")


df_query(
    "lm_perplexity_scores",
    _lm_scores,
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS prev, t[1] AS w
      FROM toks WHERE len(t) >= 1
      UNION ALL
      SELECT doc_id, lang, t[i] AS prev, t[i+1] AS w
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i) s
    ),
    uc AS (SELECT w, count(*) AS c FROM pos WHERE lang = 'en' GROUP BY w),
    tot AS (SELECT sum(c) AS t FROM uc),
    vocab AS (SELECT w, c FROM uc ORDER BY c DESC, w ASC LIMIT 500),
    vv AS (SELECT count(*) AS v FROM vocab),
    uni AS (
      SELECT w, CAST(round(ln((c + 1.0) / (tot.t + vv.v + 1.0)), 6)
                     AS DECIMAL(26,12)) AS logp_uni
      FROM vocab, tot, vv
    ),
    big AS (
      SELECT prev, w, CAST(round(ln(bc * 1.0 / pc), 6) AS DECIMAL(26,12)) AS logp
      FROM (
        SELECT b.prev, b.w, b.bc, u.c AS pc
        FROM (SELECT prev, w, count(*) AS bc FROM pos
              WHERE lang = 'en' AND prev IS NOT NULL GROUP BY prev, w) b
        JOIN uc u ON u.w = b.prev
        ORDER BY b.bc DESC, b.prev ASC, b.w ASC LIMIT 1000
      )
    ),
    consts AS (
      SELECT CAST(round(ln(1.0 / (tot.t + vv.v + 1.0)), 6) AS DECIMAL(26,12)) AS oov,
             CAST(round(ln(0.4), 6) AS DECIMAL(26,12)) AS bo
      FROM tot, vv
    ),
    sc AS (
      SELECT p.doc_id,
             CASE WHEN big.logp IS NOT NULL THEN big.logp
                  WHEN p.prev IS NULL THEN coalesce(uni.logp_uni, consts.oov)
                  ELSE consts.bo + coalesce(uni.logp_uni, consts.oov)
             END AS lp
      FROM pos p
      LEFT JOIN big ON big.prev = p.prev AND big.w = p.w
      LEFT JOIN uni ON uni.w = p.w, consts
    ),
    agg AS (
      SELECT doc_id, count(*) AS n, CAST(sum(lp) AS DECIMAL(38,12)) AS s
      FROM sc GROUP BY doc_id
    ),
    -- ============ interpolated Kneser-Ney trigram (operators/knlm) ==
    -- full training replay: raw 2/3-gram counts on the reference,
    -- continuation counts, leave-one-out discounts n1/(n1+2 n2),
    -- bottom-up interpolation in UNROUNDED doubles, top-K pruning by
    -- (count DESC, key ASC), ln+round(6) per shipped entry, then the
    -- ARPA longest-match walk with DECIMAL backoff sums
    kpos AS (
      SELECT doc_id, lang,
             CASE WHEN i >= 2 THEN t[i-1] END AS h2,
             CASE WHEN i >= 3 THEN t[i-2] || ' ' || t[i-1] END AS h3,
             t[i] AS w
      FROM toks, LATERAL (
        SELECT unnest(range(1, len(t) + 1)) AS i) s
    ),
    kr2 AS (SELECT h2 AS h, w, count(*) AS c FROM kpos
            WHERE lang = 'en' AND h2 IS NOT NULL GROUP BY h2, w),
    kr3 AS (SELECT h3 AS h, w, count(*) AS c FROM kpos
            WHERE lang = 'en' AND h3 IS NOT NULL GROUP BY h3, w),
    kc1 AS (SELECT w, count(*) AS c FROM kr2 GROUP BY w),
    kc2 AS (SELECT substr(h, instr(h, ' ') + 1) AS h, w, count(*) AS c
            FROM kr3 GROUP BY 1, 2),
    kd1 AS (SELECT CASE WHEN n1 + 2.0*n2 > 0 THEN n1/(n1 + 2.0*n2)
                   ELSE 0.5 END AS d
            FROM (SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE) AS n1,
                         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                              AS DOUBLE) AS n2 FROM kc1)),
    kd2 AS (SELECT CASE WHEN n1 + 2.0*n2 > 0 THEN n1/(n1 + 2.0*n2)
                   ELSE 0.5 END AS d
            FROM (SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE) AS n1,
                         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                              AS DOUBLE) AS n2 FROM kc2)),
    kd3 AS (SELECT CASE WHEN n1 + 2.0*n2 > 0 THEN n1/(n1 + 2.0*n2)
                   ELSE 0.5 END AS d
            FROM (SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE) AS n1,
                         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                              AS DOUBLE) AS n2 FROM kr3)),
    ku AS (SELECT CAST(SUM(c) AS DOUBLE) AS den, COUNT(*) AS v FROM kc1),
    kp1f AS (
      SELECT kc1.w, kc1.c,
             greatest(kc1.c - kd1.d, 0) / ku.den
             + (kd1.d * ku.v / ku.den) * (1.0 / (ku.v + 1)) AS p
      FROM kc1, kd1, ku
    ),
    ks2 AS (SELECT h, CAST(SUM(c) AS DOUBLE) AS den, COUNT(*) AS n1p
            FROM kc2 GROUP BY h),
    kp2f AS (
      SELECT kc2.h, kc2.w, kc2.c,
             greatest(kc2.c - kd2.d, 0) / s.den
             + (kd2.d * s.n1p / s.den) * p1.p AS p
      FROM kc2 JOIN ks2 s USING (h) JOIN kp1f p1 USING (w), kd2
    ),
    ks3 AS (SELECT h, CAST(SUM(c) AS DOUBLE) AS den, COUNT(*) AS n1p
            FROM kr3 GROUP BY h),
    kp3f AS (
      SELECT kr3.h, kr3.w, kr3.c,
             greatest(kr3.c - kd3.d, 0) / s.den
             + (kd3.d * s.n1p / s.den) * p2.p AS p
      FROM kr3 JOIN ks3 s USING (h)
      JOIN kp2f p2 ON p2.h = substr(kr3.h, instr(kr3.h, ' ') + 1)
                  AND p2.w = kr3.w, kd3
    ),
    kp1 AS (SELECT w, CAST(round(ln(p), 6) AS DECIMAL(26,12)) AS logp
            FROM kp1f ORDER BY c DESC, w ASC LIMIT 500),
    kp2 AS (SELECT h, w, CAST(round(ln(p), 6) AS DECIMAL(26,12)) AS logp
            FROM kp2f ORDER BY c DESC, h ASC, w ASC LIMIT 1500),
    kp3 AS (SELECT h, w, CAST(round(ln(p), 6) AS DECIMAL(26,12)) AS logp
            FROM kp3f ORDER BY c DESC, h ASC, w ASC LIMIT 1500),
    kb2 AS (SELECT h, CAST(round(ln(kd2.d * n1p / den), 6)
                           AS DECIMAL(26,12)) AS logb
            FROM ks2, kd2 ORDER BY den DESC, h ASC LIMIT 1000),
    kb3 AS (SELECT h, CAST(round(ln(kd3.d * n1p / den), 6)
                           AS DECIMAL(26,12)) AS logb
            FROM ks3, kd3 ORDER BY den DESC, h ASC LIMIT 1000),
    kunk AS (SELECT CAST(round(ln((kd1.d * ku.v / ku.den)
                                  * (1.0 / (ku.v + 1))), 6)
                         AS DECIMAL(26,12)) AS u FROM kd1, ku),
    ksc AS (
      SELECT k.doc_id,
             CASE WHEN p3.logp IS NOT NULL THEN p3.logp
                  WHEN p2.logp IS NOT NULL THEN
                    coalesce(b3.logb, CAST(0 AS DECIMAL(26,12))) + p2.logp
                  ELSE coalesce(b3.logb, CAST(0 AS DECIMAL(26,12)))
                       + coalesce(b2.logb, CAST(0 AS DECIMAL(26,12)))
                       + coalesce(p1.logp, kunk.u)
             END AS lp
      FROM kpos k
      LEFT JOIN kp3 p3 ON p3.h = k.h3 AND p3.w = k.w
      LEFT JOIN kb3 b3 ON b3.h = k.h3
      LEFT JOIN kp2 p2 ON p2.h = k.h2 AND p2.w = k.w
      LEFT JOIN kb2 b2 ON b2.h = k.h2
      LEFT JOIN kp1 p1 ON p1.w = k.w, kunk
    ),
    kagg AS (
      SELECT doc_id, CAST(sum(lp) AS DECIMAL(38,12)) AS s
      FROM ksc GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
           CAST(CAST(coalesce(agg.s, 0) AS DECIMAL(38,12)) AS DOUBLE) AS sum_logp,
           CAST(CAST(coalesce(kagg.s, 0) AS DECIMAL(38,12)) AS DOUBLE)
             AS sum_logp_kn
    FROM documents d
    LEFT JOIN agg ON agg.doc_id = d.doc_id
    LEFT JOIN kagg ON kagg.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    tables=["documents"],
    doc="CCNet-style LM log-prob scores vs the lang='en' reference "
        "corpus, decimal-exact sums: stupid-backoff bigram "
        "(operators/lm.py) and — r13 — the interpolated Kneser-Ney "
        "trigram (operators/knlm.py, the published CCNet/RedPajama "
        "estimator) with FULL training replay in the oracle "
        "(continuation counts, leave-one-out discounts, bottom-up "
        "interpolation, pruning, ARPA backoff walk)",
)
