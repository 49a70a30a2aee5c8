"""r13 probe: decompose lm_perplexity_scores — bigram train / KN train /
score+join — warm, 3 passes each, min reported. Run:
    python tools_r13_kn_probe.py [sf_dir]
"""
import sys
import time

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from apache_pinot_spark.session import get_spark  # noqa: E402
from apache_pinot_spark.suites.textanalysis_suite import (  # noqa: E402
    _KN_CTX_PRUNE, _KN_PRUNE, _docs)
from apache_pinot_spark.operators import knlm as K  # noqa: E402
from apache_pinot_spark.operators import lm as L  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark("kn-probe")
spark.sparkContext.setLogLevel("ERROR")

docs = _docs(spark, sf)
ref = docs.filter(F.col("lang") == "en")
docs.selectExpr("max(xxhash64(struct(*)))").collect()  # warm pages

def probe(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: min={min(ts)} all={ts}", flush=True)

# warm one full pass first (codegen)
model = L.train_bigram_lm(ref, vocab_size=500, bigram_size=1000)
kn = K.train_kn_lm(ref, order=3, prune=dict(_KN_PRUNE),
                   ctx_prune=dict(_KN_CTX_PRUNE))

probe("bigram_train", lambda: L.train_bigram_lm(
    ref, vocab_size=500, bigram_size=1000))
probe("kn_train", lambda: K.train_kn_lm(
    ref, order=3, prune=dict(_KN_PRUNE), ctx_prune=dict(_KN_CTX_PRUNE)))

def score():
    bg = L.lm_doc_scores(docs, model).select(
        "doc_id", "n_tokens",
        F.col("sum_logp").cast("double").alias("sum_logp"))
    kns = K.kn_doc_scores(docs, kn).select(
        "doc_id", F.col("sum_logp").cast("double").alias("sum_logp_kn"))
    bg.join(kns, on="doc_id").orderBy("doc_id").collect()

probe("score_join", score)
spark.stop()
