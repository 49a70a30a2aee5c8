"""Capture .explain('formatted') for every declared query into plans/r13/.

Usage: python tools_r13_explain.py <suffix> [query ...]
Writes plans/r13/<name>_<suffix>.txt. With no query args, captures all.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

from apache_pinot_spark.session import get_spark
from apache_pinot_spark import querysuite
import apache_pinot_spark.suites  # noqa: F401

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r13-explain")
spark.sparkContext.setLogLevel("ERROR")

outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
os.makedirs(outdir, exist_ok=True)

for name in sorted(querysuite.REGISTRY):
    if only and name not in only:
        continue
    q = querysuite.REGISTRY[name]
    try:
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as ex:  # capture failures loudly, don't die
        plan = f"EXPLAIN FAILED: {ex}"
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(plan)
    print(name, len(plan), flush=True)
spark.stop()
