"""A/B probe: separate bigram+KN training vs the r14 fused trainer.

Captures (1) statusTracker job/stage counts per training call, (2) the
number of reference parquet scans in each path's count-table plans, and
(3) interleaved warm wall times. Writes plans/r14/lm_training_stagecount.txt
and plans/r14/lm_training_scans_{before,after}.txt.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools_r14_lm_probe.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from apache_pinot_spark.session import get_spark
from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.operators import knlm as K
from apache_pinot_spark.operators import lm as L

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
PRUNE = {1: 500, 2: 1500, 3: 1500}
CTX = {2: 1000, 3: 1000}

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r14-lm-probe")
spark.sparkContext.setLogLevel("ERROR")
st = spark.sparkContext.statusTracker()

docs = load_tables(spark, sf_dir, ["documents"])["documents"]
ref = docs.filter(F.col("lang") == "en")

outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "plans", "r14")
os.makedirs(outdir, exist_ok=True)


def train_sep():
    bg = L.train_bigram_lm(ref, vocab_size=500, bigram_size=1000)
    kn = K.train_kn_lm(ref, order=3, prune=dict(PRUNE),
                       ctx_prune=dict(CTX))
    return kn, bg


def train_fused():
    return K.train_kn_bigram_lm(ref, order=3, prune=dict(PRUNE),
                                ctx_prune=dict(CTX),
                                vocab_size=500, bigram_size=1000)


def jobs_stages(fn):
    j0 = set(st.getJobIdsForGroup(None))
    s0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - s0
    jobs = [j for j in st.getJobIdsForGroup(None) if j not in j0]
    stages = set()
    for j in jobs:
        ji = st.getJobInfo(j)
        if ji:
            stages.update(ji.stageIds)
    # count only stages that actually ran (skipped stages are reused
    # shuffle output, not scheduled work)
    ran = sum(
        1 for sid in stages
        if (si := st.getStageInfo(sid)) is not None and si.numTasks > 0
        and si.numCompletedTasks > 0
    )
    return len(jobs), len(stages), ran, dt


# scan-count evidence: the count tables each path builds, pre-assembly
from apache_pinot_spark.operators.dedup import _spread
from apache_pinot_spark.operators.knlm import (
    _positions_frame, _tagged_kgram_counts)
from apache_pinot_spark.operators.lm import _pair_frame


def nscans(df):
    p = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for ln in p.splitlines()
               if "Scan parquet" in ln or "FileScan" in ln), p

pw = _pair_frame(_spread(ref), "text").groupBy("prev", "w") \
    .agg(F.count("*").alias("cnt"))
raw = _tagged_kgram_counts(_positions_frame(_spread(ref), "text", 3), 3)
fused_all = _tagged_kgram_counts(
    _positions_frame(_spread(ref), "text", 3), 3, keep_null_h2=True)

n_pw, p_pw = nscans(pw)
n_raw, p_raw = nscans(raw)
n_all, p_all = nscans(fused_all)
with open(os.path.join(outdir, "lm_training_scans_before.txt"), "w") as fh:
    fh.write(f"SEPARATE TRAINING count tables: {n_pw} + {n_raw} = "
             f"{n_pw + n_raw} reference parquet scans\n\n"
             f"--- bigram pw (prev,w,cnt) plan ---\n{p_pw}\n"
             f"--- KN tagged raw (k,h,w,cnt) plan ---\n{p_raw}\n")
with open(os.path.join(outdir, "lm_training_scans_after.txt"), "w") as fh:
    fh.write(f"FUSED TRAINING shared count table: {n_all} reference "
             f"parquet scan(s)\n(bigram pw = k=2 slice incl. NULL "
             f"contexts; KN raw = h IS NOT NULL slice)\n\n"
             f"--- shared tagged (k,h,w,cnt) plan ---\n{p_all}\n")
print(f"scan counts: separate={n_pw}+{n_raw}, fused={n_all}")

# warmup both paths once (codegen/page cache), then interleave
train_sep(); train_fused()

lines = []
seps, fuseds = [], []
for i in range(REPS):
    js, ss, rs, ts = jobs_stages(train_sep)
    jf, sf, rf, tf = jobs_stages(train_fused)
    seps.append((js, ss, rs, ts))
    fuseds.append((jf, sf, rf, tf))
    lines.append(f"rep{i}: separate jobs={js} stages={ss} ran={rs} "
                 f"wall={ts:.2f}s | fused jobs={jf} stages={sf} "
                 f"ran={rf} wall={tf:.2f}s")
    print(lines[-1], flush=True)

with open(os.path.join(outdir, "lm_training_stagecount.txt"), "w") as fh:
    fh.write("Interleaved A/B (warm), train bigram+KN separately vs "
             "fused train_kn_bigram_lm\n"
             f"sf_dir={sf_dir}, order=3, prune={PRUNE}, ctx={CTX}, "
             f"vocab=500, bigrams=1000\n"
             "jobs/stages from statusTracker per call; 'ran' counts "
             "stages with completed tasks (skipped stages excluded)\n\n")
    fh.write("\n".join(lines) + "\n")
    fh.write(f"\nmin wall: separate {min(t for *_, t in seps):.2f}s, "
             f"fused {min(t for *_, t in fuseds):.2f}s\n")
spark.stop()
