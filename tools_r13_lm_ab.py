"""Interleaved A/B of lm_perplexity_scores: fused (HEAD) vs two-pass
scoring — rebuilds the two-pass composition inline so both shapes run
in ONE session, interleaved, min/median of N.

Usage: python tools_r13_lm_ab.py [N]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from apache_pinot_spark.session import get_spark
from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.suites.textanalysis_suite import (
    _KN_PRUNE, _KN_CTX_PRUNE, _docs)

spark = get_spark("r13-lm-ab")
spark.sparkContext.setLogLevel("ERROR")


def fused():
    from apache_pinot_spark.operators import knlm as K
    from apache_pinot_spark.operators import lm as L

    docs = _docs(spark, sf_dir)
    ref = docs.filter(F.col("lang") == "en")
    model = L.train_bigram_lm(ref, vocab_size=500, bigram_size=1000)
    kn = K.train_kn_lm(ref, order=3, prune=dict(_KN_PRUNE),
                       ctx_prune=dict(_KN_CTX_PRUNE))
    return K.kn_bigram_doc_scores(docs, kn, model).select(
        "doc_id", "n_tokens",
        F.col("sum_logp").cast("double").alias("sum_logp"),
        F.col("sum_logp_kn").cast("double").alias("sum_logp_kn"),
    ).orderBy("doc_id")


def twopass():
    from apache_pinot_spark.operators import knlm as K
    from apache_pinot_spark.operators import lm as L

    docs = _docs(spark, sf_dir)
    ref = docs.filter(F.col("lang") == "en")
    model = L.train_bigram_lm(ref, vocab_size=500, bigram_size=1000)
    kn = K.train_kn_lm(ref, order=3, prune=dict(_KN_PRUNE),
                       ctx_prune=dict(_KN_CTX_PRUNE))
    bg = L.lm_doc_scores(docs, model).select(
        "doc_id", "n_tokens",
        F.col("sum_logp").cast("double").alias("sum_logp"))
    kns = K.kn_doc_scores(docs, kn).select(
        "doc_id", F.col("sum_logp").cast("double").alias("sum_logp_kn"))
    return bg.join(kns, on="doc_id").orderBy("doc_id")


load_tables(spark, sf_dir)["documents"].selectExpr(
    "max(xxhash64(struct(*)))").collect()
# warm both shapes once (codegen)
fused().collect(); twopass().collect()

res = {"fused": [], "twopass": []}
for i in range(N):
    for name, fn in (("fused", fused), ("twopass", twopass)):
        t0 = time.perf_counter()
        rows = fn().collect()
        dt = time.perf_counter() - t0
        res[name].append(dt)
        print(f"pass {i} {name}: {dt:.3f}s rows={len(rows)}", flush=True)
for name, ts in res.items():
    print(f"{name}: min={min(ts):.3f} median={statistics.median(ts):.3f}")
spark.stop()
