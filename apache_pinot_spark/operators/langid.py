"""Trained language identification — the fastText-langid shape (Joulin
et al. 2016, arXiv:1607.01759; langid.py, Lui & Baldwin 2012): a
multinomial softmax linear classifier over HASHED CHARACTER n-gram
features, trained on the cluster with bounded driver state and scored
as one broadcast join. This is the trained tier above
textanalysis.lang_id_expr's 5-language function-word heuristic (the r11
verdict's "weakest green row"): character n-grams are the standard
language-ID feature — they capture diacritics, orthography, and
function-word fragments without any per-language word lists, so the
same trainer covers 20+ languages from labeled fixture corpora.

Feature convention matches the curation family (operators/dsir.py,
operators/quality_clf.py): md5-prefix STRING buckets (``hash_chars``
hex chars → 16**hash_chars buckets), so a SQL oracle replays scoring
verbatim; the per-document text sample is capped at ``max_chars``
(language ID needs a bounded prefix, not the whole document — the cap
is also what bounds feature-extraction cost on 500 kB crawl pages).

Training is full-batch softmax gradient descent in WIDE form — one
weight column per class, so each iteration is:
  * one BROADCAST join of the persisted (id, bucket, tf) feature frame
    with the ≤B-row wide weight table (no corpus re-shuffle; the frame
    is persisted hash-partitioned by id so the per-doc margin groupBy
    is shuffle-free)
  * per-document softmax over the C margin COLUMNS (plain column
    arithmetic — no window, no per-class row explosion)
  * one map-side-combined groupBy(bucket) with C gradient sums; the
    collected gradient is B×(C+1) values — corpus-size-INDEPENDENT
    (the bounded-fenced-collect discipline of quality_clf/IVF/PQ)

At 100 TB: train on a labeled sample (1e5-1e6 docs — ``sample`` the
input first); score the full corpus with the one-broadcast-join pass,
whose cost is the char-gram explode (bounded by ``max_chars``) plus
one groupBy(id).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_pinot_spark.operators.dedup import _spread

#: fastText-langid-style defaults: char 1..3-grams over a 4096-bucket
#: hash space, first 512 chars of the document
DEFAULT_N_LO = 1
DEFAULT_N_HI = 3
DEFAULT_HASH_CHARS = 3
DEFAULT_MAX_CHARS = 512


def char_gram_buckets(
    col: Column | str,
    n_lo: int = DEFAULT_N_LO,
    n_hi: int = DEFAULT_N_HI,
    hash_chars: int = DEFAULT_HASH_CHARS,
) -> Column:
    """md5-prefix bucket ids of every character n-gram (n_lo..n_hi) of
    ``col`` — one JVM expression, SQL-replayable verbatim. The caller
    lowers/caps the text FIRST (pass a plain attribute, not a computed
    expression: higher-order lambdas re-evaluate captured subtrees per
    element)."""
    c = F.col(col) if isinstance(col, str) else col
    length = F.length(c)

    def _slicer(k):
        # NOT `lambda i, k=k: ...` — F.transform treats a TWO-parameter
        # lambda as (element, index) and binds the defaulted k to the
        # array INDEX, silently corrupting every gram
        return lambda i: c.substr(i, F.lit(k))

    parts = []
    for k in range(n_lo, n_hi + 1):
        # guard length < k: sequence(1, 0) descends (repo gotcha)
        parts.append(
            F.when(
                length >= k,
                F.transform(F.sequence(F.lit(1), length - k + 1), _slicer(k)),
            ).otherwise(F.array().cast("array<string>"))
        )
    grams = F.concat(*parts) if len(parts) > 1 else parts[0]
    return F.transform(grams, lambda g: F.substring(F.md5(g), 1, hash_chars))


def char_gram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_lo: int = DEFAULT_N_LO,
    n_hi: int = DEFAULT_N_HI,
    hash_chars: int = DEFAULT_HASH_CHARS,
    max_chars: int = DEFAULT_MAX_CHARS,
) -> DataFrame:
    """(id, bucket, tf): hashed char-gram frequencies per document,
    summing to 1 — one explode + one map-side-combined groupBy."""
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        F.lower(F.substring(F.col(text_col), 1, max_chars)).alias("_t"),
    )
    grams = base.select(
        "id",
        F.explode(char_gram_buckets("_t", n_lo, n_hi, hash_chars)).alias("bucket"),
    )
    counts = grams.groupBy("id", "bucket").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    doc_len = F.sum("cnt").over(Window.partitionBy("id"))
    return counts.select("id", "bucket", (F.col("cnt") / doc_len).alias("tf"))


@dataclass
class LangIdModel:
    """Trained softmax language classifier. ``weights[bucket]`` is the
    per-class weight vector (same order as ``classes``); scoring must
    replay the exact feature config."""

    classes: list
    weights: dict               # bucket (str) -> list[float] (len C)
    biases: list                # len C
    n_lo: int = DEFAULT_N_LO
    n_hi: int = DEFAULT_N_HI
    hash_chars: int = DEFAULT_HASH_CHARS
    max_chars: int = DEFAULT_MAX_CHARS
    train_loss: list = field(default_factory=list)

    def weights_df(self, spark) -> DataFrame:
        cols = ", ".join(f"`w_{i}` double" for i in range(len(self.classes)))
        rows = [(k, *[float(x) for x in v]) for k, v in self.weights.items()]
        return spark.createDataFrame(rows, f"bucket string, {cols}")


def train_lang_id(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n_lo: int = DEFAULT_N_LO,
    n_hi: int = DEFAULT_N_HI,
    hash_chars: int = DEFAULT_HASH_CHARS,
    max_chars: int = DEFAULT_MAX_CHARS,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-6,
) -> LangIdModel:
    """Fit the softmax classifier on labeled ``docs`` (``label_col`` =
    ground-truth language code). Driver state is O(B×C); each iteration
    is one Spark job over the persisted feature frame.

    The update is full-batch ADAGRAD (Duchi et al. 2011): per-coordinate
    steps lr·g/√(Σg²+ε). Plain GD has no usable step size here — the
    always-present buckets (the space 1-gram is in EVERY document)
    carry orders more curvature than the rare diacritic grams that
    actually separate languages, so one global lr either crawls or
    diverges (measured: lr 25 moved loss 3.178→3.168 in 12 iters;
    lr 150 diverged to 11.3)."""
    import numpy as np

    spark = docs.sparkSession
    labeled = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_text"),
        F.col(label_col).alias("_y"),
    ).filter(F.col("_y").isNotNull())
    classes = sorted(r._y for r in labeled.select("_y").distinct().collect())
    if len(classes) < 2:
        raise ValueError("need at least 2 labeled languages")
    C = len(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}
    feats = char_gram_features(labeled, "_text", "id",
                               n_lo, n_hi, hash_chars, max_chars)
    y_ind = labeled.select(
        "id",
        *[(F.col("_y") == F.lit(c)).cast("double").alias(f"y_{i}")
          for i, c in enumerate(classes)],
    )
    rows = feats.join(y_ind, on="id").repartition("id").persist()
    try:
        model = LangIdModel(classes=classes, weights={}, biases=[0.0] * C,
                            n_lo=n_lo, n_hi=n_hi, hash_chars=hash_chars,
                            max_chars=max_chars)
        import numpy as _np  # adagrad accumulators (driver, O(B×C))
        _g2: dict = {}
        _gb2 = _np.zeros(C)
        for _ in range(iters):
            if model.weights:
                cur = rows.join(F.broadcast(model.weights_df(spark)),
                                on="bucket", how="left")
            else:
                cur = rows.select("*", *[F.lit(0.0).alias(f"w_{i}")
                                         for i in range(C)])
            # per-doc margins: C sums in ONE shuffle-free groupBy (rows
            # is hash-partitioned by id). The softmax is built in STAGED
            # selects — each level materializes attributes the next level
            # references, so no level re-embeds the C-term greatest()/
            # normalizer subtrees per output column (inlined, the r_i
            # expressions go O(C²)-sized and the codegen blows the heap;
            # CollapseProject keeps multi-referenced non-cheap aliases
            # staged).
            doc = cur.groupBy("id").agg(
                F.count(F.lit(1)).alias("_nrow"),
                *[F.sum(F.col("tf") * F.coalesce(F.col(f"w_{i}"), F.lit(0.0)))
                  .alias(f"m_{i}") for i in range(C)],
                *[F.first(f"y_{i}").alias(f"y_{i}") for i in range(C)],
            )
            doc = doc.select(
                "id", "_nrow", *[f"y_{i}" for i in range(C)],
                *[(F.col(f"m_{i}") + F.lit(model.biases[i])).alias(f"mm_{i}")
                  for i in range(C)],
            )
            mm = [F.col(f"mm_{i}") for i in range(C)]
            doc = doc.select(
                "*", (F.greatest(*mm) if C > 1 else mm[0]).alias("_mx"),
                sum((F.col(f"y_{i}") * mm[i] for i in range(C)),
                    F.lit(0.0)).alias("_my"),
            )
            doc = doc.select(
                "id", "_nrow", "_mx", "_my", *[f"y_{i}" for i in range(C)],
                *[F.exp(F.col(f"mm_{i}") - F.col("_mx")).alias(f"e_{i}")
                  for i in range(C)],
            )
            doc = doc.select(
                "*", sum((F.col(f"e_{i}") for i in range(1, C)),
                         F.col("e_0")).alias("_z"),
            )
            doc = doc.select(
                "id", "_nrow",
                *[(F.col(f"e_{i}") / F.col("_z") - F.col(f"y_{i}"))
                  .alias(f"r_{i}") for i in range(C)],
                # -log p_y = log z - (m_y - mx)
                (F.log(F.col("_z")) - (F.col("_my") - F.col("_mx")))
                .alias("_nll"),
            )
            # gradient: join residuals back on id (same partitioning);
            # the doc-level terms ride divided by the doc's feature-row
            # count so ONE map-side-combined groupBy(bucket) telescopes
            # them to per-doc sums — a single B-row collect per
            # iteration carries weight grads, bias grads, loss, and the
            # doc count (quality_clf's convention)
            g = (
                rows.select("id", "bucket", "tf").join(doc, on="id")
                .groupBy("bucket")
                .agg(
                    *[F.sum(F.col("tf") * F.col(f"r_{i}")).alias(f"g_{i}")
                      for i in range(C)],
                    *[F.sum(F.col(f"r_{i}") / F.col("_nrow")).alias(f"rb_{i}")
                      for i in range(C)],
                    F.sum(F.col("_nll") / F.col("_nrow")).alias("ls"),
                    F.sum(F.lit(1.0) / F.col("_nrow")).alias("nd"),
                )
                .toPandas()
            )
            n_docs = float(g["nd"].sum())
            if n_docs == 0:
                raise ValueError("no labeled documents to train on")
            model.train_loss.append(float(g["ls"].sum()) / n_docs)
            keys = g["bucket"].tolist()
            gw = g[[f"g_{i}" for i in range(C)]].to_numpy(dtype="float64") / n_docs
            cur_w = np.array([model.weights.get(k, [0.0] * C) for k in keys],
                             dtype="float64").reshape(len(keys), C)
            gw = gw + l2 * cur_w
            cur_g2 = np.array([_g2.get(k, [0.0] * C) for k in keys],
                              dtype="float64").reshape(len(keys), C)
            cur_g2 += gw * gw
            new_w = cur_w - lr * gw / np.sqrt(cur_g2 + 1e-10)
            model.weights = {
                k: [float(x) for x in row]
                for k, row in zip(keys, new_w)
                if any(x != 0.0 for x in row)
            }
            for k, row in zip(keys, cur_g2):
                _g2[k] = row
            gb = g[[f"rb_{i}" for i in range(C)]].to_numpy(dtype="float64") \
                .sum(axis=0) / n_docs
            _gb2 += gb * gb
            model.biases = [
                b - lr * float(gb[i]) / float(np.sqrt(_gb2[i] + 1e-10))
                for i, b in enumerate(model.biases)
            ]
    finally:
        rows.unpersist()
    return model


#: verdict-named alias: the "lang_id_model" operator
lang_id_model = train_lang_id


def score_lang(
    docs: DataFrame,
    model: LangIdModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, lang, margin, prob) — predicted language per document:
    one char-gram explode (bounded by ``max_chars``), one BROADCAST
    join with the B-row wide weight table, one groupBy(id), then an
    argmax over the C margin columns (ties break to the
    lexicographically smallest class — deterministic). Zero-feature
    documents get the bias-only argmax. Replayable in SQL on the md5
    bucket convention (tests/test_langid.py)."""
    spark = docs.sparkSession
    C = len(model.classes)
    feats = char_gram_features(docs, text_col, id_col,
                               model.n_lo, model.n_hi,
                               model.hash_chars, model.max_chars)
    margins = (
        feats.join(F.broadcast(model.weights_df(spark)), on="bucket")
        .groupBy("id")
        .agg(*[F.sum(F.col("tf") * F.coalesce(F.col(f"w_{i}"), F.lit(0.0)))
               .alias(f"m_{i}") for i in range(C)])
    )
    out = docs.select(F.col(id_col).alias("id")).join(margins, on="id",
                                                      how="left")
    m = [F.coalesce(F.col(f"m_{i}"), F.lit(0.0)) + F.lit(model.biases[i])
         for i in range(C)]
    mx = F.greatest(*m) if C > 1 else m[0]
    # argmax with lexicographic tie-break: classes are sorted, so the
    # FIRST class attaining the max wins
    pred = F.lit(model.classes[-1])
    for i in range(C - 2, -1, -1):
        pred = F.when(m[i] == mx, F.lit(model.classes[i])).otherwise(pred)
    exps = [F.exp(mi - mx) for mi in m]
    z = exps[0]
    for e_ in exps[1:]:
        z = z + e_
    return out.select(
        F.col("id").alias(id_col),
        pred.alias("lang"),
        mx.alias("margin"),
        (F.lit(1.0) / z).alias("prob"),
    )
