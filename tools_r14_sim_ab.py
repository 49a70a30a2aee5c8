"""Interleaved A/B for sim_ann_family (r14, verdict ask #5): the lazy
assignment frame (current) vs persisting it — re-testing the r12 call
with the steal-aware probe discipline — plus sim_cosine_near_dup_pairs
timed alongside as a control.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools_r14_sim_ab.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from apache_pinot_spark.session import get_spark
from apache_pinot_spark import querysuite
import apache_pinot_spark.suites  # noqa: F401
from apache_pinot_spark.operators import similarity

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
spark = get_spark("r14-sim-ab")
spark.sparkContext.setLogLevel("ERROR")

real_assign = similarity.ivf_assign
_persisted = []


def persisted_assign(*a, **kw):
    df, centroids = real_assign(*a, **kw)
    df = df.persist()
    df.count()  # populate eagerly so both tiers read the cache
    _persisted.append(df)
    return df, centroids


def run(tag):
    similarity.ivf_assign = persisted_assign if tag == "persist" \
        else real_assign
    try:
        t0 = time.perf_counter()
        rows = querysuite.REGISTRY["sim_ann_family"].fn(
            spark, sf_dir).collect()
        dt = time.perf_counter() - t0
    finally:
        similarity.ivf_assign = real_assign
    while _persisted:
        _persisted.pop().unpersist()
    import gc
    gc.collect()  # release lifecycle-held materializations between reps
    return dt, tuple(tuple(x) for x in rows)


def run_cosine():
    t0 = time.perf_counter()
    querysuite.REGISTRY["sim_cosine_near_dup_pairs"].fn(
        spark, sf_dir).collect()
    return time.perf_counter() - t0


w = run("lazy")
base_rows = w[1]
run_cosine()
res = {"lazy": [], "persist": [], "cosine": []}
for i in range(REPS):
    for tag in ("lazy", "persist"):
        dt, rows = run(tag)
        assert rows == base_rows, f"ROWS DIVERGED for {tag}"
        res[tag].append(dt)
        print(tag, round(dt, 2), flush=True)
    res["cosine"].append(run_cosine())
    print("cosine", round(res["cosine"][-1], 2), flush=True)
for tag, ts in res.items():
    print("MEDIAN", tag, round(statistics.median(ts), 2),
          "min", round(min(ts), 2), [round(t, 2) for t in ts])
spark.stop()
