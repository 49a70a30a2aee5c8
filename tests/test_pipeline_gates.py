"""The r11 optional pipeline gates wired into curate_corpus: URL dedup,
domain blocklist, C4 word blocklist, trained model-quality gate — stage
order, row accounting, schema preservation, and the
required-input errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators.pipeline import CurationConfig, curate_corpus
from apache_pinot_spark.operators.quality_clf import QualityModel

_PROSE = ("this is a perfectly ordinary paragraph of prose with the "
          "usual common stopwords that real writing always has in it "
          "and it is long enough to pass the quality gate easily ")


def _crawl_corpus(spark):
    rows = [
        # 0/1: same canonical URL (tracking param variant) — URL dedup
        (0, _PROSE + "alpha", "en", "good.example.com",
         "http://good.example.com/a?utm_source=x"),
        (1, _PROSE + "alpha beta", "en", "good.example.com",
         "http://good.example.com/a"),
        # 2: blocked domain (subdomain of the blocklist entry)
        (2, _PROSE + "gamma", "en", "spam.blocked.example",
         "http://spam.blocked.example/p"),
        # 3: banned word
        (3, _PROSE + "casinoword", "en", "good.example.com",
         "http://good.example.com/b"),
        # 4: clean survivor
        (4, _PROSE + "delta", "en", "good.example.com",
         "http://good.example.com/c"),
        # 5: junk the model gate kills (heuristic quality would keep it)
        (5, _PROSE + "junkmarker", "en", "good.example.com",
         "http://good.example.com/d"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, url string")
    return df.withColumn("n_chars", F.length("text"))


def _model():
    # hand-built model: strongly negative weight on junkmarker's bucket
    import hashlib

    bad_bucket = hashlib.md5(b"junkmarker").hexdigest()[:3]
    return QualityModel(weights={bad_bucket: -400.0}, bias=2.0)


def test_all_gates_in_order_and_accounting(spark):
    cfg = CurationConfig(
        url_dedup=True, block_domains=True, block_words=True,
        min_model_prob=0.5,
        exact_dedup=True, boilerplate=False, quality_filter=True,
        redact_pii=False, near_dedup=False, decontaminate=False,
    )
    stages = curate_corpus(
        _crawl_corpus(spark), cfg,
        blocked_domains=spark.createDataFrame([("blocked.example",)],
                                              "domain string"),
        word_blocklist=spark.createDataFrame([("casinoword",)],
                                             "word string"),
        quality_model=_model(),
    )
    names = list(stages)
    assert names == ["input", "url_dedup", "domain_blocklist",
                     "exact_dedup", "word_blocklist", "quality_language",
                     "model_quality", "splits"]
    counts = {n: df.count() for n, df in stages.items()}
    assert counts["input"] == 6
    assert counts["url_dedup"] == 5          # doc 1 lost to doc 0
    assert counts["domain_blocklist"] == 4   # doc 2 blocked
    assert counts["word_blocklist"] == 3     # doc 3 banned
    assert counts["model_quality"] == 2      # doc 5 scored out
    assert sorted(r.doc_id for r in stages["model_quality"].collect()) == [0, 4]
    # schema preserved through every gate (splits adds its column)
    for n in names[:-1]:
        assert stages[n].columns == stages["input"].columns
    assert "split" in stages["splits"].columns


def test_required_inputs_raise(spark):
    docs = _crawl_corpus(spark)
    with pytest.raises(ValueError, match="blocked_domains"):
        curate_corpus(docs, CurationConfig(
            block_domains=True, decontaminate=False))
    with pytest.raises(ValueError, match="word_blocklist"):
        curate_corpus(docs, CurationConfig(
            block_words=True, decontaminate=False))
    with pytest.raises(ValueError, match="quality_model"):
        curate_corpus(docs, CurationConfig(
            min_model_prob=0.5, decontaminate=False))
    with pytest.raises(ValueError, match="'url'"):
        curate_corpus(docs.drop("url"), CurationConfig(
            url_dedup=True, decontaminate=False))


def test_gates_off_by_default(spark):
    stages = curate_corpus(_crawl_corpus(spark),
                           CurationConfig(decontaminate=False))
    assert not {"url_dedup", "domain_blocklist", "word_blocklist",
                "model_quality"} & set(stages)


def test_substring_dedup_stage(spark):
    dup = ("this exact shared disclaimer paragraph is repeated verbatim "
           "across documents and is long enough for the window size here")
    docs = spark.createDataFrame(
        [(1, _PROSE + "one. " + dup, "en", "a.example", "http://a.example/1"),
         (2, _PROSE + "two. " + dup, "en", "b.example", "http://b.example/2")],
        "doc_id bigint, text string, lang string, source string, url string"
    ).withColumn("n_chars", F.length("text"))
    cfg = CurationConfig(
        substring_dedup=True, substring_window_tokens=10,
        exact_dedup=False, boilerplate=False, quality_filter=False,
        redact_pii=False, near_dedup=False, decontaminate=False,
    )
    stages = curate_corpus(docs, cfg)
    assert "substring_dedup" in stages
    out = {r.doc_id: r.text for r in stages["substring_dedup"].collect()}
    assert dup in out[1] and dup not in out[2]
    # schema preserved (accounting column dropped inside the stage)
    assert stages["substring_dedup"].columns == docs.columns


def test_normalize_stage(spark):
    import unicodedata as U

    prose = _PROSE + "résumé"
    docs = spark.createDataFrame(
        [(1, U.normalize("NFC", prose), "en", "a.example", "u1"),
         (2, U.normalize("NFD", prose), "en", "b.example", "u2")],
        "doc_id bigint, text string, lang string, source string, url string"
    ).withColumn("n_chars", F.length("text"))
    cfg = CurationConfig(
        normalize_unicode=True, exact_dedup=True, boilerplate=False,
        quality_filter=False, redact_pii=False, near_dedup=False,
        decontaminate=False)
    stages = curate_corpus(docs, cfg)
    assert list(stages)[1] == "normalize"
    assert stages["exact_dedup"].count() == 1  # NFC/NFD variants collide


def test_gopher_stage(spark):
    clean = ("the history of science gives many examples of careful and "
             "patient work by people who wanted to understand the world "
             "around them and who wrote their results in plain language "
             "for other people to read and check with their own words ") * 2
    docs = spark.createDataFrame(
        [(1, clean, "en", "a.example", "u1"),
         (2, " ".join(f"#tag{i}" for i in range(120)), "en",
          "a.example", "u2")],
        "doc_id bigint, text string, lang string, source string, url string"
    ).withColumn("n_chars", F.length("text"))
    cfg = CurationConfig(
        gopher_quality=True, exact_dedup=False, boilerplate=False,
        quality_filter=False, redact_pii=False, near_dedup=False,
        decontaminate=False)
    stages = curate_corpus(docs, cfg)
    assert "gopher_quality" in stages
    assert [r.doc_id for r in stages["gopher_quality"].collect()] == [1]
    # overrides reach the expression
    cfg2 = CurationConfig(
        gopher_quality=True, gopher_overrides={"min_words": 10_000},
        exact_dedup=False, boilerplate=False, quality_filter=False,
        redact_pii=False, near_dedup=False, decontaminate=False)
    assert curate_corpus(docs, cfg2)["gopher_quality"].count() == 0


def test_bloom_dedup_stage_document_and_paragraph(spark):
    """Cross-snapshot Bloom stage: documents already in the reference
    release drop (document mode) or their shared paragraphs excise
    (paragraph mode); missing bloom_ref errors actionably."""
    from pyspark.sql import Row

    from apache_pinot_spark.operators import bloomdedup as B
    from apache_pinot_spark.operators.pipeline import (CurationConfig,
                                                       curate_corpus)

    released = spark.createDataFrame([
        Row(doc_id=i, text=f"previously released document {i} body")
        for i in range(30)])
    meta = {"m_bits": 1 << 16, "k": 5, "hash_mode": "xxhash64"}
    bloom = B.build_bloom(released, "text", **meta)

    new = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"previously released document {i} body",
             lang="en", source="s", n_chars=40) for i in range(5)]
        + [Row(doc_id=200 + i, text=f"genuinely new content {i} here",
               lang="en", source="s", n_chars=30) for i in range(5)])

    cfg = CurationConfig(bloom_dedup=True, exact_dedup=True,
                         boilerplate=False, quality_filter=False,
                         redact_pii=False, near_dedup=False,
                         decontaminate=False)
    stages = curate_corpus(new, cfg, bloom_ref=(bloom, meta))
    kept = stages["bloom_dedup"].select("doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [200 + i for i in range(5)]
    assert "bloom_dedup" in stages and "splits" in stages

    with pytest.raises(ValueError, match="bloom_ref"):
        curate_corpus(new, cfg)

    # paragraph mode: shared paragraph excised, fresh one survives
    par_released = spark.createDataFrame(
        [Row(doc_id=1, text="shared paragraph body")])
    par_bloom = B.build_paragraph_bloom(par_released, m_bits=1 << 16, k=5)
    par_new = spark.createDataFrame([Row(
        doc_id=9, text="fresh opener\nshared paragraph body",
        lang="en", source="s", n_chars=36)])
    cfg2 = CurationConfig(bloom_dedup=True, bloom_mode="paragraph",
                          exact_dedup=False, boilerplate=False,
                          quality_filter=False, redact_pii=False,
                          near_dedup=False, decontaminate=False)
    got = curate_corpus(par_new, cfg2,
                        bloom_ref=(par_bloom, meta))["bloom_dedup"] \
        .collect()[0]
    assert got.text == "fresh opener" and got.n_chars == 12


def test_drop_spent_columns_knob(spark):
    """drop_spent_columns=True removes the url column from stage frames
    after url_dedup and the host/source column after its LAST consumer
    (domain blocklist, or source_cap when the share cap is on); row
    accounting is identical either way. Off by default: every stage
    frame keeps the input schema."""
    docs = _crawl_corpus(spark)
    bl = spark.createDataFrame([("blocked.example",)], "domain string")
    base = dict(url_dedup=True, block_domains=True, exact_dedup=True,
                boilerplate=False, quality_filter=True, redact_pii=False,
                near_dedup=False, decontaminate=False)
    stages_keep = curate_corpus(docs, CurationConfig(**base),
                                blocked_domains=bl)
    stages_drop = curate_corpus(
        docs, CurationConfig(drop_spent_columns=True, **base),
        blocked_domains=bl)
    # identical accounting
    assert {n: df.count() for n, df in stages_keep.items()} == \
        {n: df.count() for n, df in stages_drop.items()}
    # url gone from the url_dedup stage on; host/source gone from the
    # blocklist stage on (max_source_share unset)
    assert "url" in stages_keep["url_dedup"].columns
    assert "url" not in stages_drop["url_dedup"].columns
    assert "source" in stages_keep["domain_blocklist"].columns
    assert "source" not in stages_drop["domain_blocklist"].columns
    assert "source" not in stages_drop["splits"].columns

    # with the share cap on, source survives UNTIL source_cap
    capped = curate_corpus(
        docs, CurationConfig(drop_spent_columns=True,
                             max_source_share=0.9, **base),
        blocked_domains=bl)
    assert "source" in capped["domain_blocklist"].columns
    assert "source" not in capped["source_cap"].columns
