"""End-to-end curation pipeline (operators/pipeline.py): a fixture
corpus where every stage has a known victim, per-stage row accounting,
schema stability, laziness, and the lm/dsir selection variants on the
documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import pipeline as P
from tests.conftest import SF_SMOKE

GOOD = ("the quick brown fox jumps over the lazy dog and then walks "
        "home to rest for the evening before dinner is served warm")


def _fixture(spark):
    boiler = "Sign in\nAccept cookies\n"
    rows = [
        # 1+2: exact duplicates (2 dies)
        (1, boiler + GOOD, "en"),
        (2, boiler + GOOD, "en"),
        # 3: near-duplicate of 1 (one word changed; LSH+verify kills it)
        (3, boiler + GOOD.replace("dog", "cat"), "en"),
        # 4: distinct good doc
        (4, boiler + "completely different wholesome text about cooking "
            "fresh bread with olive oil and rosemary in a stone oven "
            "while the morning sun rises over the quiet valley fields", "en"),
        # 5: junk (low quality score)
        (5, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en"),
        # 6: PII carrier (row survives, text rewritten)
        (6, boiler + "please contact me at alice@example.com about the "
            "delivery of the package and the schedule for the next "
            "meeting of the council in the town hall next week", "en"),
        # 7: contaminated (contains the benchmark verbatim)
        (7, boiler + "the capital of france is paris and the capital of "
            "spain is madrid every student learns this in the first "
            "geography lesson of the school year without exception", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    bench = spark.createDataFrame(
        [(100, "the capital of france is paris and the capital of spain "
               "is madrid every student learns this")],
        "doc_id long, text string",
    )
    return docs, bench


def test_every_stage_has_a_victim(spark):
    docs, bench = _fixture(spark)
    cfg = P.CurationConfig(min_quality=80.0, keep_langs=("en",),
                           near_threshold=0.5, max_contamination=0.2)
    stages = P.curate_corpus(docs, cfg, benchmark=bench)
    report = dict(P.curation_report(stages))
    assert report["input"] == 7
    assert report["exact_dedup"] == 6           # doc 2 dies
    assert report["boilerplate"] == 6           # rows survive, text rewritten
    assert report["quality_language"] == 5      # doc 5 dies
    assert report["pii_redaction"] == 5
    assert report["near_dedup"] == 4            # doc 3 dies (near-dup of 1)
    assert report["decontamination"] == 3       # doc 7 dies
    assert report["splits"] == 3
    final = stages["splits"].collect()
    ids = sorted(r.doc_id for r in final)
    assert ids == [1, 4, 6]
    # boilerplate really removed, PII really redacted, splits assigned
    by_id = {r.doc_id: r for r in final}
    assert "Sign in" not in by_id[1].text and GOOD in by_id[1].text
    assert "alice@example.com" not in by_id[6].text
    assert all(r.split in ("train", "val", "test") for r in final)
    # schema = input schema + split
    assert stages["splits"].columns == ["doc_id", "text", "lang", "split"]
    # accounting is monotone after the text-rewriting stages too
    counts = [report[s] for s in report]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_stage_toggles_and_validation(spark):
    docs, bench = _fixture(spark)
    # everything off: only the split stage remains
    cfg = P.CurationConfig(exact_dedup=False, boilerplate=False,
                           quality_filter=False, redact_pii=False,
                           near_dedup=False, decontaminate=False)
    stages = P.curate_corpus(docs, cfg)
    assert list(stages) == ["input", "splits"]
    assert stages["splits"].count() == 7
    with pytest.raises(ValueError, match="benchmark"):
        P.curate_corpus(docs, P.CurationConfig())  # decontaminate needs one
    with pytest.raises(ValueError, match="unknown selection"):
        P.curate_corpus(docs, P.CurationConfig(decontaminate=False,
                                               selection="bogus"))
    with pytest.raises(ValueError, match="reference"):
        P.curate_corpus(docs, P.CurationConfig(decontaminate=False,
                                               selection="lm"))


def test_lm_and_dsir_selection_on_documents(spark):
    from apache_pinot_spark.catalog import load_tables

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    ref = docs.filter(F.col("lang") == "en")
    base = dict(exact_dedup=True, boilerplate=False, quality_filter=False,
                redact_pii=False, near_dedup=False, decontaminate=False)
    lm_stages = P.curate_corpus(
        docs, P.CurationConfig(selection="lm", lm_keep_buckets=2, **base),
        reference=ref,
    )
    n_before = lm_stages["exact_dedup"].count()
    n_lm = lm_stages["lm_selection"].count()
    assert 0 < n_lm < n_before  # tail bucket dropped
    assert abs(n_lm - 2 * n_before / 3) <= 2  # ntile thirds, keep 2
    dsir_stages = P.curate_corpus(
        docs, P.CurationConfig(selection="dsir", dsir_n_select=50, **base),
        reference=ref,
    )
    assert dsir_stages["dsir_selection"].count() == 50
    # deterministic end to end: same config -> same survivors
    again = P.curate_corpus(
        docs, P.CurationConfig(selection="dsir", dsir_n_select=50, **base),
        reference=ref,
    )
    a = sorted(r.doc_id for r in dsir_stages["splits"].collect())
    b = sorted(r.doc_id for r in again["splits"].collect())
    assert a == b


def test_map_side_stages_run_in_structured_streaming(spark, tmp_path):
    """The pipeline's scan-stage work (quality gate, language gate, PII
    redaction, split label) is stateless column arithmetic — it must run
    unchanged under readStream. Near-dup/dedup stages are batch-shaped
    (documented); a streaming deployment runs THIS subset per micro-batch
    and the shuffle stages in the compaction pass."""
    import json
    import os

    from apache_pinot_spark.operators import pipeline as P

    src = tmp_path / "stream_src"
    os.makedirs(src)
    docs, _ = _fixture(spark)
    rows = [r.asDict() for r in docs.collect()]
    with open(src / "batch0.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .json(str(src))
    )
    cfg = P.CurationConfig(exact_dedup=False, boilerplate=False,
                           near_dedup=False, decontaminate=False,
                           min_quality=80.0, keep_langs=("en",))
    staged = P.curate_corpus(stream, cfg)["splits"]
    assert staged.isStreaming
    q = (staged.writeStream.format("memory").queryName("curated_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r.doc_id: r for r in spark.sql(
        "SELECT * FROM curated_stream").collect()}
    assert 5 not in out                     # junk doc gated mid-stream
    assert "alice@example.com" not in out[6].text  # PII redacted mid-stream
    assert all(r.split in ("train", "val", "test") for r in out.values())
    # batch and streaming agree row for row
    batch = {r.doc_id: r for r in
             P.curate_corpus(docs, cfg)["splits"].collect()}
    assert set(out) == set(batch)
    assert all(out[i].text == batch[i].text and out[i].split == batch[i].split
               for i in out)


def test_checkpoint_blocks_survive_artifact_death(spark):
    """Round-8 regression: dedup_keep_canonical / lm_doc_scores return
    lazy plans backed by localCheckpoint blocks whose Python handles
    (CC labels, the LM model) die inside the composing function. The
    lifecycle sweep then freed those blocks before the action ran
    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). The keepalive attachments must
    keep every stage countable after an explicit GC + sweep."""
    import gc

    from apache_pinot_spark.operators import lifecycle

    docs, bench = _fixture(spark)
    cfg = P.CurationConfig(min_quality=80.0, keep_langs=("en",),
                           near_threshold=0.5, max_contamination=0.2,
                           selection="lm", lm_keep_buckets=3)
    stages = P.curate_corpus(docs, cfg, benchmark=bench, reference=docs)
    gc.collect()
    lifecycle._sweep_dead_results()  # what any later operator call does
    report = dict(P.curation_report(stages))  # every stage must still run
    assert report["near_dedup"] == 4
    assert report["lm_selection"] == 3  # keep all 3 buckets: no row lost
    # and AGAIN after dropping all but the final stage
    final = stages["splits"]
    del stages, report
    gc.collect()
    lifecycle._sweep_dead_results()
    assert final.count() == 3


def test_source_cap_stage_and_operator(spark):
    from apache_pinot_spark.operators.chunking import cap_source_share

    rows = [(i, f"text {i} " + GOOD, "en", "big" if i < 80 else "small")
            for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    # cap at 60%: N* solves min(80, .6N) + 20 = N -> N = 50, big gets 30
    capped = cap_source_share(docs, "source", 0.6, key_col="doc_id")
    got = {r.source: 0 for r in capped.select("source").distinct().collect()}
    for r in capped.collect():
        got[r.source] = got.get(r.source, 0) + 1
    assert got == {"big": 30, "small": 20}
    # deterministic + salt re-deal
    a = sorted(r.doc_id for r in cap_source_share(docs, "source", 0.6, "doc_id").collect())
    b = sorted(r.doc_id for r in cap_source_share(docs, "source", 0.6, "doc_id").collect())
    c = sorted(r.doc_id for r in cap_source_share(docs, "source", 0.6, "doc_id", salt="x").collect())
    assert a == b and a != c
    # nobody capped -> passthrough
    assert cap_source_share(docs, "source", 1.0, "doc_id").count() == 100
    # degenerate: cap below 1/num_sources of equal sizes -> empty
    eq = spark.createDataFrame([(i, "t", "en", f"s{i % 4}") for i in range(40)],
                               "doc_id long, text string, lang string, source string")
    assert cap_source_share(eq, "source", 0.2, "doc_id").count() == 0
    with pytest.raises(ValueError, match="max_share"):
        cap_source_share(docs, "source", 0.0, "doc_id")
    # and as a pipeline stage
    cfg = P.CurationConfig(exact_dedup=False, boilerplate=False,
                           quality_filter=False, redact_pii=False,
                           near_dedup=False, decontaminate=False,
                           max_source_share=0.6)
    stages = P.curate_corpus(docs, cfg)
    assert "source_cap" in stages and stages["source_cap"].count() == 50


def test_exact_dedup_count_identity(spark):
    """The pipeline accounting's closed-form exact-dedup row count (one
    aggregate: distinct non-sentinel fingerprints + sentinel rows) must
    equal count(dedupe_exact(df)) — including NULL-text rows (kept
    unconditionally) and duplicate texts (one survivor per group)."""
    from pyspark.sql import functions as F

    from apache_pinot_spark.operators.dedup import (
        NULL_FINGERPRINT,
        dedupe_exact,
        fingerprint_expr,
    )

    rows = [
        (0, "alpha beta"), (1, "alpha beta"), (2, "alpha beta"),  # dup x3
        (3, "gamma"), (4, None), (5, None),                       # nulls kept
        (6, ""), (7, ""),                                         # empty is a real group
        (8, "delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = fingerprint_expr("text", None)
    agg = df.agg(
        (F.count_distinct(F.when(fp != F.lit(NULL_FINGERPRINT), fp))
         + F.coalesce(F.sum(F.when(fp == F.lit(NULL_FINGERPRINT), 1)),
                      F.lit(0))).alias("rows")
    ).collect()[0]["rows"]
    assert agg == dedupe_exact(df).count() == 6  # alpha, gamma, "", delta + 2 NULLs
