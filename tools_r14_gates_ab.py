"""A/B curation_gates_accounting: spent-column drop (r14) vs the r13
shape (url/host/source riding every checkpointed stage frame and the
normalize Arrow pass).

Variant keep: drop_spent_columns=False and the pre-pipeline `source`
drop disabled — byte-for-byte the r13 stage frames.
Variant drop: the committed r14 path.

Interleaved (keep drop keep drop ...) on one session, medians + the
measured checkpointed bytes per variant (RDD storage info).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_pinot_spark.session import get_spark
from apache_pinot_spark.suites import curation_gates_suite as G

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark("r14-gates-ab")
spark.sparkContext.setLogLevel("ERROR")


def run(tag):
    import apache_pinot_spark.operators.pipeline as P

    real_init = P.CurationConfig.__init__
    real_drop = None
    if tag == "keep":
        def patched(self, *a, **kw):
            kw["drop_spent_columns"] = False
            real_init(self, *a, **kw)
        P.CurationConfig.__init__ = patched
        # also undo the suite's pre-pipeline source drop
        from pyspark.sql import DataFrame
        real_drop = DataFrame.drop

        def nodrop(self, *cols):
            if cols == ("source",):
                return self
            return real_drop(self, *cols)
        DataFrame.drop = nodrop
    try:
        t0 = time.perf_counter()
        rows = G._gates_accounting(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        # cached RDD footprint right after the collect (stage
        # checkpoints are still alive — the stages dict is)
        mem = sum(r.memSize() for r in
                  spark.sparkContext._jsc.sc().getRDDStorageInfo())
    finally:
        P.CurationConfig.__init__ = real_init
        if real_drop is not None:
            from pyspark.sql import DataFrame
            DataFrame.drop = real_drop
    import gc
    gc.collect()  # release the stage keepalives between reps
    return dt, mem, tuple(tuple(r) for r in rows)


w = run("drop")
baseline_rows = w[2]
res = {"keep": [], "drop": []}
mems = {"keep": [], "drop": []}
for i in range(REPS):
    for tag in ("keep", "drop"):
        dt, mem, rows = run(tag)
        assert rows == baseline_rows, f"ROWS DIVERGED for {tag}"
        res[tag].append(dt)
        mems[tag].append(mem)
        print(tag, round(dt, 2), f"{mem/1e6:.1f}MB", flush=True)
for tag in res:
    print("MEDIAN", tag, round(statistics.median(res[tag]), 2),
          [round(t, 2) for t in res[tag]],
          "cachedMB", round(statistics.median(mems[tag]) / 1e6, 1))
spark.stop()
