"""Sequence packing (operators/packing.py) and temperature-based
mixture sampling (operators/chunking.py): exact single-partition FFD
reference, multi-partition invariants, determinism, fill report,
budget math, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators.chunking import (
    temperature_mixture_budgets,
    temperature_sample,
)
from apache_pinot_spark.operators.packing import assign_packs, packing_summary


def _ffd_reference(rows, cap):
    """Pure-Python first-fit-decreasing with unbounded open bins:
    rows = (key, count) → {key: (bin_idx, offset)}."""
    bins = []  # [remaining, idx]
    next_idx = 0
    out = {}
    for key, cnt in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cnt > cap:
            out[key] = (next_idx, 0, True)
            next_idx += 1
            continue
        for b in bins:
            if b[0] >= cnt:
                out[key] = (b[1], cap - b[0], False)
                b[0] -= cnt
                break
        else:
            out[key] = (next_idx, 0, False)
            bins.append([cap - cnt, next_idx])
            next_idx += 1
    return out


def test_assign_packs_matches_ffd_reference_single_partition(spark):
    rows = [(f"d{i}", c) for i, c in enumerate(
        [9, 3, 3, 3, 5, 5, 2, 1, 1, 10, 4, 6, 7, 2, 8]
    )]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens int")
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["oversize"])
        for r in assign_packs(
            df, "n_tokens", 10, partitions=1
        ).collect()
    }
    want = _ffd_reference(rows, 10)
    assert len(got) == len(rows)
    for key, (bin_idx, offset, over) in want.items():
        pid, opos, oover = got[key]
        assert pid == f"0-{bin_idx}" and opos == offset and oover == over, key


def test_assign_packs_invariants_multi_partition(spark):
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.operators.textanalysis import token_count_expr
    from tests.conftest import SF_SMOKE

    docs = (
        load_tables(spark, SF_SMOKE)["documents"]
        .select("doc_id", token_count_expr("text").alias("n_tokens"))
    )
    cap = 256
    packed = assign_packs(docs, "n_tokens", cap, partitions=8)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc assigned exactly once
    fills: dict = {}
    for r in rows:
        fill, over = fills.get(r["pack_id"], (0, False))
        fills[r["pack_id"]] = (fill + r["n_tokens"], over or r["oversize"])
    for pack_id, (fill, over) in fills.items():
        assert over or fill <= cap, (pack_id, fill)
    # offsets within a pack are the running prefix sums (contiguous)
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(
            (r["pack_offset"], r["n_tokens"])
        )
    for pack_id, members in by_pack.items():
        pos = 0
        for off, n in sorted(members):
            assert off == pos, pack_id
            pos += n
    # determinism: a second run reproduces the exact assignment
    again = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in assign_packs(docs, "n_tokens", cap, partitions=8).collect()
    }
    assert again == {r["doc_id"]: (r["pack_id"], r["pack_offset"]) for r in rows}


def test_assign_packs_oversize_null_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 100), ("b", 3), ("c", None), ("d", 4)],
        "doc_id string, n int",
    )
    got = {r["doc_id"]: r for r in
           assign_packs(df, "n", 10, partitions=1).collect()}
    assert got["a"]["oversize"] and got["a"]["pack_offset"] == 0
    # the oversize pack is a singleton
    assert sum(1 for r in got.values() if r["pack_id"] == got["a"]["pack_id"]) == 1
    # NULL packs as 0 units, not oversize
    assert not got["c"]["oversize"]
    with pytest.raises(ValueError, match="max_units"):
        assign_packs(df, "n", 0)
    with pytest.raises(ValueError, match="open_bins"):
        assign_packs(df, "n", 10, open_bins=0)
    neg = spark.createDataFrame([("x", -1)], "doc_id string, n int")
    with pytest.raises(Exception, match="negative"):
        assign_packs(neg, "n", 10, partitions=1).collect()


def test_packing_summary(spark):
    df = spark.createDataFrame(
        [("a", 6), ("b", 4), ("c", 3), ("d", 20)],
        "doc_id string, n int",
    )
    packed = assign_packs(df, "n", 10, partitions=1)
    s = packing_summary(packed, "n", 10).collect()[0]
    # FFD: 6+4 → pack 1 (fill 1.0), 3 → pack 2 (0.3), 20 → oversize
    assert s["n_packs"] == 3 and s["n_docs"] == 4
    assert s["total_units"] == 33 and s["oversize_packs"] == 1
    assert s["mean_fill_frac"] == pytest.approx((1.0 + 0.3) / 2)
    assert s["min_fill_frac"] == pytest.approx(0.3)


def test_assign_packs_plan_single_exchange(spark):
    df = spark.createDataFrame([("a", 1)], "doc_id string, n int")
    plan = (
        assign_packs(df, "n", 10, partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # the one hash repartition


def test_temperature_budgets_math(spark):
    rows = (
        [("en", i) for i in range(80)]
        + [("de", i) for i in range(15)]
        + [("sw", i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "lang string, i int")
    # T=1: natural proportions
    b1 = temperature_mixture_budgets(df, "lang", 1.0, 20)
    assert b1 == {"en": 16, "de": 3, "sw": 1}
    # high T: near uniform, but capped at the domain count
    # sw caps at 5; its surplus unit refills the largest-weight open
    # domain (en — weights are near-uniform but ordered by share)
    b_inf = temperature_mixture_budgets(df, "lang", 1e9, 18)
    assert b_inf == {"en": 7, "de": 6, "sw": 5}
    assert sum(b_inf.values()) == 18
    # budget above corpus size: everything, no crash
    b_all = temperature_mixture_budgets(df, "lang", 2.0, 1000)
    assert b_all == {"en": 80, "de": 15, "sw": 5}
    with pytest.raises(ValueError, match="temperature"):
        temperature_mixture_budgets(df, "lang", 0.0, 10)
    with pytest.raises(ValueError, match="total_budget"):
        temperature_mixture_budgets(df, "lang", 1.0, 0)
    with pytest.raises(ValueError, match="distinct"):
        temperature_mixture_budgets(df, "lang", 1.0, 10, max_domains=2)


def test_temperature_sample_exact_and_deterministic(spark):
    rows = (
        [("en", f"e{i}") for i in range(60)]
        + [("de", f"d{i}") for i in range(30)]
        + [("sw", f"s{i}") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "lang string, doc_id string")
    out = temperature_sample(df, "lang", 2.0, 30, key_col="doc_id")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want = temperature_mixture_budgets(df, "lang", 2.0, 30)
    assert counts == want and sum(counts.values()) == 30
    # flatter than natural (T>1 lifts the tail)
    assert counts["sw"] > 10 * 30 / 100 - 1
    # deterministic; a new salt re-deals membership but not counts
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in
            temperature_sample(df, "lang", 2.0, 30, key_col="doc_id").collect()}
    assert ids1 == ids2
    ids3 = {r["doc_id"] for r in
            temperature_sample(df, "lang", 2.0, 30, key_col="doc_id",
                               salt="v2").collect()}
    assert ids3 != ids1 and len(ids3) == 30
