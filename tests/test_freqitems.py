"""Frequent-items sketches (functions/freqitems.py): Misra-Gries
guarantees, mergeability, serde, and the Spark two-phase build."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.functions import freqitems as FI


def test_exact_when_under_map_size():
    s = FI.FreqSketch.from_values(["a"] * 5 + ["b"] * 3 + ["c"], m=16)
    assert s.max_error == 0
    assert s.estimate("a") == 5 and s.lower_bound("a") == 5
    assert s.top_k(2) == [("a", 5, 5), ("b", 3, 3)]
    assert s.estimate("zzz") == 0


def test_misra_gries_error_guarantee():
    """offset ≤ N/(m+1), and every item's true count sits inside
    [lower_bound, estimate] — the classic MG guarantee, checked on a
    skewed random stream against exact counts."""
    rng = random.Random(7)
    stream = [f"hot{i}" for i in range(5) for _ in range(2000)] + [
        f"cold{rng.randrange(5000)}" for _ in range(20000)
    ]
    rng.shuffle(stream)
    m = 64
    s = FI.FreqSketch.from_values(stream, m=m)
    assert s.max_error <= len(stream) // (m + 1)
    from collections import Counter

    truth = Counter(stream)
    for item, true_n in truth.items():
        assert s.lower_bound(item) <= true_n <= s.estimate(item)
    # every genuinely hot item must be tracked and ranked at the top
    top = [it for it, _, _ in s.top_k(5)]
    assert set(top) == {f"hot{i}" for i in range(5)}


def test_merge_preserves_bounds():
    rng = random.Random(11)
    parts = [
        [f"v{rng.randrange(200)}" for _ in range(4000)]
        for _ in range(6)
    ]
    merged = FI.merge_all([FI.FreqSketch.from_values(p, m=32) for p in parts])
    from collections import Counter

    truth = Counter(v for p in parts for v in p)
    n_total = sum(truth.values())
    assert merged.max_error <= 6 * (4000 // 33) + n_total // 33  # bounds add
    for item, true_n in truth.most_common(20):
        assert merged.lower_bound(item) <= true_n <= merged.estimate(item)


def test_serde_round_trip_and_errors():
    for s in (FI.FreqSketch.empty(),
              FI.FreqSketch.from_values(["α", "b" * 100, "c"], m=8),
              FI.FreqSketch.from_values(range(1000), m=16)):
        blob = FI.serialize(s)
        back = FI.deserialize(blob)
        assert back.counts == s.counts and back.offset == s.offset and back.m == s.m
        assert FI.serialize(back) == blob  # canonical bytes
    with pytest.raises(ValueError, match="magic"):
        FI.deserialize(b"XXXX" + b"\x00" * 20)
    blob = FI.serialize(FI.FreqSketch.from_values(["abc"] * 3, m=4))
    with pytest.raises(ValueError, match="truncated"):
        FI.deserialize(blob[:-3])


def test_spark_two_phase_build(spark):
    """Per-group sketches over a skewed frame: the hot value is found
    with honest bounds, and per-group state stays ≤ m pairs."""
    df = spark.range(60_000).select(
        (F.col("id") % 3).alias("g"),
        F.when(F.col("id") % 10 < 6, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") / 7).cast("long"))).alias("v"),
    )
    sk = FI.freq_sketch(df, ["g"], "v", m=128, out_col="freq")
    rows = {r["g"]: FI.deserialize(r["freq"]) for r in sk.collect()}
    assert set(rows) == {0, 1, 2}
    for g, s in rows.items():
        assert len(s.counts) <= 128
        top_item, lb, ub = s.top_k(1)[0]
        assert top_item == "hot"
        true_hot = df.where((F.col("g") == g) & (F.col("v") == "hot")).count()
        assert lb <= true_hot <= ub


def test_spark_build_exact_small(spark):
    from apache_pinot_spark.catalog import load_tables
    from tests.conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE)["events"]
    sk = FI.freq_sketch(ev, ["event_type"], "user_id", m=256, out_col="freq")
    exact = {
        (r["event_type"], str(r["user_id"])): r["n"]
        for r in ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n")).collect()
    }
    for r in sk.collect():
        s = FI.deserialize(r["freq"])
        assert s.max_error == 0  # 15 users << m: exact everywhere
        for item, lb, ub in s.top_k(50):
            assert lb == ub == exact[(r["event_type"], item)]


def test_sql_surface_frequent_sketch(spark):
    """FREQUENTSTRINGSSKETCH through the dialect: hex blob per group,
    deserializable with honest bounds."""
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_SMOKE

    eng = PinotEngine(spark, SF_SMOKE, tables=["events"])
    rows = eng.sql(
        "SELECT event_type, FREQUENTSTRINGSSKETCH(user_id) AS fs "
        "FROM events GROUP BY event_type LIMIT 10"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        s = FI.deserialize(bytes.fromhex(r["fs"]))
        assert s.max_error == 0  # 15 users << default map size
        assert all(lb >= 1 for _, lb, _ in s.top_k(100))
