"""r13 interleaved A/B: old (per-order shuffles) vs new (tagged fused)
train_kn_lm in ONE session. Old impl loaded from /tmp/knlm_old.py."""
import importlib.util
import sys
import time

spec = importlib.util.spec_from_file_location("knlm_old", "/tmp/knlm_old.py")
knlm_old = importlib.util.module_from_spec(spec)
sys.modules["knlm_old"] = knlm_old
spec.loader.exec_module(knlm_old)

from apache_pinot_spark.session import get_spark  # noqa: E402
from apache_pinot_spark.suites.textanalysis_suite import (  # noqa: E402
    _KN_CTX_PRUNE, _KN_PRUNE, _docs)
from apache_pinot_spark.operators import knlm as knlm_new  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark("kn-ab")
spark.sparkContext.setLogLevel("ERROR")
docs = _docs(spark, "/root/testdata/sf0.1")
ref = docs.filter(F.col("lang") == "en")
docs.selectExpr("max(xxhash64(struct(*)))").collect()

def run(mod):
    t0 = time.perf_counter()
    mod.train_kn_lm(ref, order=3, prune=dict(_KN_PRUNE),
                    ctx_prune=dict(_KN_CTX_PRUNE))
    return round(time.perf_counter() - t0, 3)

# warm both code paths once
run(knlm_old); run(knlm_new)
olds, news = [], []
for i in range(5):
    olds.append(run(knlm_old))
    news.append(run(knlm_new))
print("old:", olds, "min", min(olds), "median", sorted(olds)[2])
print("new:", news, "min", min(news), "median", sorted(news)[2])
spark.stop()
