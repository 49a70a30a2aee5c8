"""Attribute curation_gates_accounting runtime to stages: time the
accounting flow with progressively more stages enabled; deltas ≈ stage
cost (same warmed session, two passes, min)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.session import get_spark
from apache_pinot_spark.suites import curation_gates_suite as G
from apache_pinot_spark.operators.pipeline import CurationConfig, curate_corpus
from apache_pinot_spark.operators.qclf_frozen import (
    FROZEN_MIN_PROB, frozen_quality_model)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r13-gates-stages")
spark.sparkContext.setLogLevel("ERROR")


def run(**over):
    docs = G._synth_inputs(
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .select("doc_id", "text", "source"))
    bl = spark.createDataFrame([("vector",)], "word string")
    blocked = spark.createDataFrame(
        [(d,) for d in G._BLOCKED_DOMAINS], "domain string")
    kw = dict(
        url_dedup=True, block_domains=True, source_col="host",
        normalize_unicode=True, exact_dedup=False, boilerplate=False,
        block_words=True, max_bad_frac=G._MAX_BAD_FRAC,
        quality_filter=False, gopher_quality=True,
        gopher_overrides={"min_words": G._MIN_WORDS},
        min_model_prob=FROZEN_MIN_PROB, redact_pii=False,
        near_dedup=False, substring_dedup=True,
        substring_window_tokens=G._WINDOW_TOKENS, decontaminate=False,
        splits=dict(G._SPLITS), split_salt=G._SALT, split_portable=True,
        cache_stages=("url_dedup", "normalize", "word_blocklist",
                      "gopher_quality", "model_quality", "substring_dedup"),
        cache_mode="checkpoint",
    )
    kw.update(over)
    kw["cache_stages"] = tuple(
        s for s in kw["cache_stages"]
        if {"url_dedup": kw["url_dedup"],
            "normalize": kw["normalize_unicode"],
            "word_blocklist": kw["block_words"],
            "gopher_quality": kw["gopher_quality"],
            "model_quality": kw["min_model_prob"] is not None,
            "substring_dedup": kw["substring_dedup"]}[s])
    cfg = CurationConfig(**kw)
    t0 = time.perf_counter()
    stages = curate_corpus(docs, cfg, word_blocklist=bl,
                           blocked_domains=blocked,
                           quality_model=frozen_quality_model())
    parts = []
    for i, (name, df) in enumerate(stages.items()):
        if name == "splits":
            continue
        parts.append(df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.coalesce(F.sum(F.length("text")), F.lit(0)).cast("bigint")
            .alias("chars")).select(
            F.lit(i).alias("stage_idx"), F.lit(name).alias("stage"),
            "rows", "chars"))
    from functools import reduce
    from pyspark.sql import DataFrame
    out = reduce(DataFrame.unionByName, parts).orderBy("stage_idx")
    out.collect()
    return time.perf_counter() - t0


VARIANTS = [
    ("v1 url only", dict(block_domains=False, normalize_unicode=False,
                         block_words=False, gopher_quality=False,
                         min_model_prob=None, substring_dedup=False)),
    ("v2 +domain+norm", dict(block_words=False, gopher_quality=False,
                             min_model_prob=None, substring_dedup=False)),
    ("v3 +word", dict(gopher_quality=False, min_model_prob=None,
                      substring_dedup=False)),
    ("v4 +gopher", dict(min_model_prob=None, substring_dedup=False)),
    ("v5 +model", dict(substring_dedup=False)),
    ("v6 full", dict()),
]

run()  # warm full
res = {}
for _ in range(2):
    for name, over in VARIANTS:
        dt = run(**over)
        res.setdefault(name, []).append(dt)
        print(name, round(dt, 2), flush=True)
print("=== mins ===")
prev = 0.0
for name, _ in VARIANTS:
    m = min(res[name])
    print(f"{name:16s} {m:6.2f}  delta {m - prev:+.2f}")
    prev = m
spark.stop()
