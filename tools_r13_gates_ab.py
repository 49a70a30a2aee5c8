"""A/B the curation_gates_accounting checkpoint set at sf0.1.

Variant a: current (6 checkpoints).
Variant b: checkpoint only normalize / model_quality / substring_dedup —
stages that are pure JVM filters over a checkpointed parent re-derive in
the final job as PARALLEL subtrees instead of paying a serial eager
materialization each.

Interleaved A/B (a b a b a b) on one session, reporting medians.
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
spark = get_spark("r13-gates-ab")
spark.sparkContext.setLogLevel("ERROR")

SETS = {
    "a6": ("url_dedup", "normalize", "word_blocklist",
           "gopher_quality", "model_quality", "substring_dedup"),
    "b3": ("normalize", "model_quality", "substring_dedup"),
    "c4": ("url_dedup", "normalize", "model_quality", "substring_dedup"),
}

ORIG = None


def run(tag):
    import apache_pinot_spark.operators.pipeline as P
    global ORIG
    if ORIG is None:
        ORIG = P.CurationConfig  # untouched

    # monkeypatch cache_stages by wrapping CurationConfig construction
    real_init = ORIG.__init__

    def patched(self, *a, **kw):
        kw["cache_stages"] = SETS[tag]
        real_init(self, *a, **kw)

    ORIG.__init__ = patched
    try:
        t0 = time.perf_counter()
        rows = G._gates_accounting(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
    finally:
        ORIG.__init__ = real_init
    return dt, tuple(tuple(r) for r in rows)


# warm once
w = run("a6")
baseline_rows = w[1]
res = {k: [] for k in SETS}
for _ in range(3):
    for tag in SETS:
        dt, rows = run(tag)
        assert rows == baseline_rows, f"ROWS DIVERGED for {tag}"
        res[tag].append(dt)
        print(tag, round(dt, 2), flush=True)
for tag, ts in res.items():
    print("MEDIAN", tag, round(statistics.median(ts), 2),
          [round(t, 2) for t in ts])
spark.stop()
