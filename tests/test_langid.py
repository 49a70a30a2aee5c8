"""Trained language ID (operators/langid.py): convergence + held-out
accuracy floor over a 24-language fixture corpus, DuckDB scoring
replay on the md5 bucket convention, deterministic argmax tie-break,
zero-feature behavior, and the curate_corpus quality_language
integration with a trained model."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import langid as L

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)

# Function-word fixture vocabularies (public knowledge — the highest-
# frequency closed-class words of each language, diacritics included:
# char n-grams are the feature, so orthography is signal).
_VOCAB = {
    "en": "the and of to in that it is was for with as his on at by he not are this".split(),
    "de": "der die und das ist nicht von mit für sich auf als auch wird über ß aber ein eine zu".split(),
    "fr": "le la les de et des est une dans pour que qui pas sur avec été être où même ça".split(),
    "es": "el la los las de que y en un una es no por con para su al lo como más".split(),
    "it": "il la di che e un una per non sono con del gli nel alla più anche come però".split(),
    "pt": "o a os as de que e do da em um uma para não com os por mais são ção".split(),
    "nl": "de het een en van ik je niet dat is op zijn met voor aan er maar ook als".split(),
    "sv": "och att det som en på är av för med den inte ett han om hade vad där jag".split(),
    "da": "og i det at en den til er som på de med han af for ikke der var hvad jeg".split(),
    "no": "og i det at en den til er som på av de med han om ikke der var hva jeg".split(),
    "fi": "ja on ei se että hän oli mutta ole joka kun niin kuin myös jos sitä tämä mitä siis vain".split(),
    "pl": "i w nie się na że z do to jest jak po co tak za od ale przez już był".split(),
    "cs": "a v se na je že s z do to jak po co tak za od ale už byl jsem".split(),
    "sk": "a v sa na je že s z do to ako po čo tak za od ale už bol som".split(),
    "hu": "a az és hogy nem is egy meg volt ha már csak mint ez el vagy még mert ő őt".split(),
    "ro": "și în de la a ce nu este cu pe o un pentru dar mai să din care fi fost".split(),
    "tr": "bir ve bu da ne için ile olarak çok daha gibi ama ben o var yok değil şey sonra kadar".split(),
    "id": "yang dan di itu dengan untuk tidak ini dari dalam akan pada juga saya ke ada karena atau bisa sudah".split(),
    "vi": "của và là có không được một người trong cho những với đã này các để khi về như tôi".split(),
    "sw": "ya na wa kwa ni za katika la kuwa hii cha ili kama hata yake wake kwamba sana bila mimi".split(),
    "ca": "el la els les de que i en un una és no per amb al més això com són també".split(),
    "hr": "i u je se na za da su s od ne bi kao što ali iz ili smo će bio".split(),
    "et": "ja on ei et ta oli aga kui ka mis see oma nii veel siis ning juba välja mida".split(),
    "lt": "ir yra kad į iš su tai buvo bet kaip jis už jau dar tik taip apie po nes".split(),
}


def _doc(lang: str, i: int, n_words: int = 30) -> str:
    # stride-1 rotation: every doc covers (nearly) the full vocabulary
    # from a different phase, so train/held-out gram distributions match
    v = _VOCAB[lang]
    return " ".join(v[(i * 5 + j) % len(v)] for j in range(n_words))


def _corpus(spark, ids):
    rows = []
    langs = sorted(_VOCAB)
    for i in ids:
        for li, lang in enumerate(langs):
            rows.append((i * 100 + li, _doc(lang, i), lang))
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


@pytest.fixture(scope="module")
def model(spark):
    return L.train_lang_id(_corpus(spark, range(12)), iters=12, lr=1.0)


def test_training_converges(model):
    assert model.train_loss[-1] < model.train_loss[0]
    assert model.train_loss[-1] < 0.5
    assert sorted(model.classes) == sorted(_VOCAB)


def test_heldout_accuracy_floor(spark, model):
    test = _corpus(spark, range(50, 62))  # disjoint generator offsets
    pred = L.score_lang(test, model)
    got = test.select("doc_id", "lang").join(
        pred.withColumnRenamed("lang", "guess"), on="doc_id")
    n = got.count()
    ok = got.filter(F.col("lang") == F.col("guess")).count()
    assert n == 12 * len(_VOCAB)
    assert ok / n >= 0.90, f"held-out accuracy {ok}/{n}"


def test_scoring_replays_in_duckdb(spark, model):
    import duckdb
    import pandas as pd

    test = _corpus(spark, range(80, 84))
    ours = {r.doc_id: (r.lang, r.margin)
            for r in L.score_lang(test, model).collect()}
    con = duckdb.connect()
    con.register("docs", test.toPandas())
    C = len(model.classes)
    wdf = pd.DataFrame(
        {"bucket": list(model.weights),
         **{f"w_{i}": [v[i] for v in model.weights.values()]
            for i in range(C)}})
    con.register("w", wdf)
    k_arms = " || ".join(
        f"(CASE WHEN length(t) >= {k} THEN "
        f"list_transform(range(1, length(t) - {k} + 1 + 1), i -> t[i:i+{k}-1]) "
        f"ELSE [] END)"
        for k in range(model.n_lo, model.n_hi + 1))
    m_cols = ", ".join(
        f"COALESCE(SUM(tf * w.w_{i}), 0) + {model.biases[i]!r} AS m_{i}"
        for i in range(C))
    sql = f"""
    WITH base AS (
      SELECT doc_id, lower(substr(text, 1, {model.max_chars})) AS t FROM docs
    ),
    grams AS (
      SELECT doc_id, unnest({k_arms}) AS g FROM base
    ),
    b AS (
      SELECT doc_id, substring(md5(g), 1, {model.hash_chars}) AS bucket
      FROM grams
    ),
    cnt AS (SELECT doc_id, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
    tf AS (
      SELECT doc_id, bucket,
             CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY doc_id) AS tf
      FROM cnt
    )
    SELECT doc_id, {m_cols}
    FROM tf LEFT JOIN w USING (bucket)
    GROUP BY doc_id
    """
    classes = model.classes
    for row in con.sql(sql).fetchall():
        doc_id, ms = row[0], row[1:]
        mx = max(ms)
        guess = classes[min(i for i, v in enumerate(ms) if v == mx)]
        assert ours[doc_id][0] == guess
        assert abs(ours[doc_id][1] - mx) < 1e-9


def test_zero_feature_doc_gets_bias_argmax(spark):
    m = L.LangIdModel(classes=["aa", "bb", "cc"],
                      weights={"abc": [1.0, 0.0, 0.0]},
                      biases=[0.1, 0.9, 0.4])
    docs = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    (row,) = L.score_lang(docs, m).collect()
    assert row.lang == "bb" and math.isclose(row.margin, 0.9)


def test_argmax_tie_breaks_lexicographic(spark):
    m = L.LangIdModel(classes=["aa", "bb"], weights={}, biases=[0.5, 0.5])
    docs = spark.createDataFrame([(1, "xyz")], "doc_id bigint, text string")
    (row,) = L.score_lang(docs, m).collect()
    assert row.lang == "aa"


def test_pipeline_quality_language_accepts_trained_model(spark, model):
    from apache_pinot_spark.operators.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = _corpus(spark, range(90, 94)).select("doc_id", "text",
                                                F.col("lang").alias("truth"))
    cfg = CurationConfig(exact_dedup=False, boilerplate=False,
                         quality_filter=True, min_quality=0.0,
                         keep_langs=("de", "fr"), redact_pii=False,
                         near_dedup=False, decontaminate=False)
    stages = curate_corpus(docs, cfg, lang_model=model)
    kept = stages["quality_language"].select("truth").collect()
    truths = {r.truth for r in kept}
    assert truths and truths <= {"de", "fr"}
    # heuristic path would leave 'fr' out only if markers missed; the
    # trained path must keep BOTH requested languages here
    assert truths == {"de", "fr"}
