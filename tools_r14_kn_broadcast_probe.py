"""KN scorer broadcast-budget probe (r14, verdict ask #7).

kn_bigram_doc_scores chains 2(N-1)+3 broadcast joins of pruned model
tables. This measures, at the DEFAULT prune caps for order 5 (the
worst declared shape), the actual bytes per table: rows, deserialized
cache size (getRDDStorageInfo after a count) and the executed plan's
BroadcastExchange dataSize metrics from one scoring run. Output feeds
the SCALE.md cap-math section.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools_r14_kn_broadcast_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from apache_pinot_spark.session import get_spark
from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.operators import knlm as K

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r14-kn-bcast-probe")
spark.sparkContext.setLogLevel("ERROR")

docs = load_tables(spark, sf_dir, ["documents"])["documents"]
ref = docs.filter(F.col("lang") == "en")

# order 5 at the DEFAULT caps — the largest model the public API ships
kn, bg = K.train_kn_bigram_lm(ref, order=5, vocab_size=50_000,
                              bigram_size=200_000)

print("== model table rows and deserialized bytes (cache memSize) ==")
total_rows = total_bytes = 0


def measure(name, df):
    global total_rows, total_bytes
    sc = spark.sparkContext._jsc.sc()
    before = {r.id() for r in sc.getRDDStorageInfo()}
    c = df.persist()
    n = c.count()
    info = [r for r in sc.getRDDStorageInfo() if r.id() not in before]
    b = sum(r.memSize() for r in info)
    c.unpersist()
    total_rows += n
    total_bytes += b
    print(f"{name:14s} rows={n:8d}  memMB={b/1e6:8.2f}")


measure("kn.probs[1]", kn.probs[1])
for k in range(2, 6):
    measure(f"kn.probs[{k}]", kn.probs[k])
    measure(f"kn.backoffs[{k}]", kn.backoffs[k])
measure("bg.unigrams", bg.unigrams)
measure("bg.bigrams", bg.bigrams)
print(f"{'TOTAL':14s} rows={total_rows:8d}  memMB={total_bytes/1e6:8.2f}")

# executed-plan broadcast sizes from one scoring run
out = K.kn_bigram_doc_scores(docs, kn, bg)
out.write.format("noop").mode("overwrite").save()
plan = out._jdf.queryExecution().executedPlan().toString()
import re
print("== BroadcastExchange nodes in executed plan ==")
print(plan.count("BroadcastExchange"), "broadcast exchanges")
mets = re.findall(r"data size[^,\n]*", plan)
if mets:
    print("\n".join(mets[:24]))
spark.stop()
