"""Prototype probe: FUSED flags-as-columns gates accounting vs the
committed checkpoint-per-stage shape (r13 verdict ask #3's deferred
end-state, costed at ~1-2 s of checkpoint/job overhead).

The fused shape computes the same 11 accounting rows from:
  job A  — ONE full-text checkpoint: url-window + domain flags applied,
           survivors normalized (the one Python pass), (doc_id, text);
  job B  — stage 0-2 aggregate over the pre-normalize window frame
           (re-runs scan+window once — no checkpoint of raw text);
  job C  — stage 3-9 aggregate over a SLIM per-doc attribute frame
           (len1, wordkeep, gopherkeep, modelkeep, removed, split):
           the word-gate ids, model-gate ids and substring removals are
           broadcast-side subtrees over the norm checkpoint, so the
           whole thing is one job + a split rollup.

Asserts row-for-row equality with the declared query, then interleaved
A/B. Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools_r14_gates_fused_probe.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_pinot_spark.session import get_spark
from apache_pinot_spark.suites import curation_gates_suite as G
from apache_pinot_spark.catalog import load_tables

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark("r14-gates-fused")
spark.sparkContext.setLogLevel("ERROR")


def fused(spark, sf_dir):
    from apache_pinot_spark.operators import textanalysis as tx
    from apache_pinot_spark.operators.chunking import assign_splits
    from apache_pinot_spark.operators.curation import badword_stats
    from apache_pinot_spark.operators.qclf_frozen import (
        FROZEN_MIN_PROB, frozen_quality_model)
    from apache_pinot_spark.operators.quality_clf import score_quality
    from apache_pinot_spark.operators.substring_dedup import (
        dedup_exact_substrings)
    from apache_pinot_spark.operators.urls import (
        canonical_url_expr, host_suffixes_expr)

    docs = G._synth_inputs(
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .select("doc_id", "text", "source")).drop("source")
    bl = spark.createDataFrame([("vector",)], "word string")
    blocked = spark.createDataFrame(
        [(d,) for d in G._BLOCKED_DOMAINS], "domain string")

    # ---- window frame: url dedup flag + domain flag, pre-normalize ----
    cu = canonical_url_expr("url")
    w = Window.partitionBy(
        F.coalesce(F.col("_cu"),
                   F.concat(F.lit("\x00null:"),
                            F.col("doc_id").cast("string")))
    ).orderBy(F.col("doc_id"))
    blset = F.broadcast(
        blocked.select(F.lower("domain").alias("_bl")).distinct())
    hitids = (docs.select(
        "doc_id", F.explode(host_suffixes_expr("host")).alias("_sfx"))
        .join(blset, F.col("_sfx") == F.col("_bl"), "left_semi")
        .select("doc_id").distinct())
    d1 = (docs.withColumn("_cu", cu)
          .withColumn("_rn", F.row_number().over(w))
          .withColumn("urlkeep", F.col("_rn") == 1)
          .join(F.broadcast(hitids.withColumn("_hit", F.lit(1))),
                on="doc_id", how="left")
          .withColumn("domkeep", F.col("_hit").isNull()))

    # stage 0-2 aggregate (pre-normalize lengths)
    len0 = F.length("text")
    agg012 = d1.agg(
        F.count(F.lit(1)).alias("r0"),
        F.coalesce(F.sum(len0), F.lit(0)).alias("c0"),
        F.sum(F.when(F.col("urlkeep"), 1).otherwise(0)).alias("r1"),
        F.coalesce(F.sum(F.when(F.col("urlkeep"), len0)), F.lit(0)).alias("c1"),
        F.sum(F.when(F.col("urlkeep") & F.col("domkeep"), 1)
              .otherwise(0)).alias("r2"),
        F.coalesce(F.sum(F.when(F.col("urlkeep") & F.col("domkeep"), len0)),
                   F.lit(0)).alias("c2"),
    )

    # ---- the ONE full-text checkpoint: normalized survivors ----
    surv = d1.filter(F.col("urlkeep") & F.col("domkeep")) \
        .select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    norm = tx.normalize_corpus(surv).repartition(par) \
        .localCheckpoint(eager=True)

    # ---- slim per-doc attributes over the checkpoint ----
    wordfail = badword_stats(norm, bl) \
        .filter(F.col("bad_frac") > G._MAX_BAD_FRAC).select("doc_id")
    att = (norm
           .join(F.broadcast(wordfail.withColumn("_wf", F.lit(1))),
                 on="doc_id", how="left")
           .withColumn("wordkeep", F.col("_wf").isNull())
           .withColumn("gopherkeep", tx.gopher_quality_expr(
               F.col("text"), min_words=G._MIN_WORDS)))
    wg = att.filter(F.col("wordkeep") & F.col("gopherkeep")) \
        .select("doc_id", "text")
    modelpass = score_quality(wg, frozen_quality_model()) \
        .filter(F.col("quality_prob") >= FROZEN_MIN_PROB).select("doc_id")
    mq = wg.join(F.broadcast(modelpass.withColumn("_mp", F.lit(1))),
                 on="doc_id", how="left").filter(F.col("_mp").isNotNull()) \
        .select("doc_id", "text")
    removed = dedup_exact_substrings(
        mq, window_tokens=G._WINDOW_TOKENS) \
        .select("doc_id", (F.length("text")).alias("len2"))
    slim = (att.select("doc_id", F.length("text").alias("len1"),
                       "wordkeep", "gopherkeep")
            .join(F.broadcast(modelpass.withColumn("_mp", F.lit(1))),
                  on="doc_id", how="left")
            .withColumn("modelkeep", F.col("_mp").isNotNull())
            .join(F.broadcast(removed), on="doc_id", how="left"))
    slim = assign_splits(slim, key_col="doc_id",
                         fractions=dict(G._SPLITS), salt=G._SALT,
                         portable=True)
    keep_all = (F.col("wordkeep") & F.col("gopherkeep")
                & F.col("modelkeep"))
    agg39 = slim.agg(
        F.count(F.lit(1)).alias("r3"),
        F.coalesce(F.sum("len1"), F.lit(0)).alias("c3"),
        F.sum(F.when(F.col("wordkeep"), 1).otherwise(0)).alias("r4"),
        F.coalesce(F.sum(F.when(F.col("wordkeep"), F.col("len1"))),
                   F.lit(0)).alias("c4"),
        F.sum(F.when(F.col("wordkeep") & F.col("gopherkeep"), 1)
              .otherwise(0)).alias("r5"),
        F.coalesce(F.sum(F.when(F.col("wordkeep") & F.col("gopherkeep"),
                                F.col("len1"))), F.lit(0)).alias("c5"),
        F.sum(F.when(keep_all, 1).otherwise(0)).alias("r6"),
        F.coalesce(F.sum(F.when(keep_all, F.col("len1"))),
                   F.lit(0)).alias("c6"),
        F.coalesce(F.sum(F.when(keep_all, F.col("len2"))),
                   F.lit(0)).alias("c7"),
    )
    splitagg = (slim.filter(keep_all).groupBy("split")
                .agg(F.count(F.lit(1)).alias("rows"),
                     F.coalesce(F.sum("len2"), F.lit(0)).alias("chars")))

    a = agg012.collect()[0]
    b = agg39.collect()[0]
    sp = splitagg.collect()
    rows = [
        (0, "input", a["r0"], a["c0"]),
        (1, "url_dedup", a["r1"], a["c1"]),
        (2, "domain_blocklist", a["r2"], a["c2"]),
        (3, "normalize", b["r3"], b["c3"]),
        (4, "word_blocklist", b["r4"], b["c4"]),
        (5, "gopher_quality", b["r5"], b["c5"]),
        (6, "model_quality", b["r6"], b["c6"]),
        (7, "substring_dedup", b["r6"], b["c7"]),
        (8, "splits", b["r6"], b["c7"]),
    ] + sorted((9, f"split_{r['split']}", r["rows"], r["chars"])
               for r in sp)
    return [(i, s, int(r), int(c)) for (i, s, r, c) in rows]


def run_current():
    t0 = time.perf_counter()
    rows = G._gates_accounting(spark, sf_dir).collect()
    return time.perf_counter() - t0, [tuple(r) for r in rows]


def run_fused():
    t0 = time.perf_counter()
    rows = fused(spark, sf_dir)
    return time.perf_counter() - t0, rows


tc, cur_rows = run_current()
tf, fus_rows = run_fused()
cur_cmp = [(int(a), str(b), int(c), int(d)) for a, b, c, d in cur_rows]
fus_cmp = [(int(a), str(b), int(c), int(d)) for a, b, c, d in fus_rows]
if cur_cmp != fus_cmp:
    print("MISMATCH!")
    for x, y in zip(cur_cmp, fus_cmp):
        flag = "" if x == y else "   <-- DIFFERS"
        print(x, y, flag)
    sys.exit(1)
print("rows identical; warm A/B:", flush=True)
res = {"current": [], "fused": []}
for i in range(REPS):
    t, r = run_current()
    assert [(int(a), str(b), int(c), int(d)) for a, b, c, d in r] == cur_cmp
    res["current"].append(t)
    t, r = run_fused()
    assert [(int(a), str(b), int(c), int(d)) for a, b, c, d in r] == cur_cmp
    res["fused"].append(t)
    print(f"rep{i}: current {res['current'][-1]:.2f} "
          f"fused {res['fused'][-1]:.2f}", flush=True)
for tag, ts in res.items():
    print("MEDIAN", tag, round(statistics.median(ts), 2),
          "min", round(min(ts), 2), [round(t, 2) for t in ts])
spark.stop()
