"""Published-recipe presets (operators/recipes.py): each preset builds
the expected stage list and runs end-to-end on a small corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import recipes as R
from apache_pinot_spark.operators.pipeline import curate_corpus

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)


def _docs(spark):
    rows = []
    for i in range(30):
        body = ("the quick brown fox jumps over the lazy dog and then "
                "it naps in the warm shade of a tall oak tree near the "
                f"river bend number {i} with friends. ") * 3
        rows.append((i, body, f"h{i % 5}.example.org",
                     f"http://example.org/{i}?utm_source=x"))
    # one exact duplicate pair
    rows.append((100, rows[0][1], "h0.example.org",
                 "http://example.org/dup"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, url string")


def test_recipe_stage_lists(spark):
    docs = _docs(spark)
    bl = spark.createDataFrame([("badword",)], "word string")
    bench = docs.filter(F.col("doc_id") < 2)
    blocked = spark.createDataFrame([("blocked.example",)], "domain string")

    stages = curate_corpus(docs, R.c4_config(), word_blocklist=bl)
    assert list(stages) == ["input", "normalize", "exact_dedup",
                            "boilerplate", "word_blocklist",
                            "quality_language", "substring_dedup", "splits"]

    stages = curate_corpus(docs, R.gopher_config(), benchmark=bench)
    assert list(stages) == ["input", "normalize", "exact_dedup",
                            "gopher_quality", "near_dedup",
                            "decontamination", "splits"]

    stages = curate_corpus(docs, R.refinedweb_config(),
                           blocked_domains=blocked)
    assert list(stages) == ["input", "url_dedup", "domain_blocklist",
                            "normalize", "exact_dedup", "boilerplate",
                            "gopher_quality", "near_dedup",
                            "substring_dedup", "splits"]

    stages = curate_corpus(docs, R.the_stack_code_config())
    assert list(stages) == ["input", "exact_dedup", "code_quality",
                            "near_dedup", "splits"]

    stages = curate_corpus(docs, R.dolma_config(), benchmark=bench)
    assert "pii_redaction" in stages and "url_dedup" in stages


def test_c4_recipe_end_to_end(spark):
    docs = _docs(spark)
    bl = spark.createDataFrame([("badword",)], "word string")
    stages = curate_corpus(docs, R.c4_config(), word_blocklist=bl)
    n = stages["splits"].count()
    assert 0 < n <= 30
    # the exact duplicate pair collapsed
    assert stages["exact_dedup"].count() == 30


def test_overrides_and_registry(spark):
    cfg = R.gopher_config(near_threshold=0.5, decontaminate=False)
    assert cfg.near_threshold == 0.5 and not cfg.decontaminate
    assert set(R.RECIPES) == {"c4", "gopher", "refinedweb",
                              "the-stack-code", "dolma"}
