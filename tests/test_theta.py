"""Theta sketches (functions/theta.py): exact mode, estimation error,
set algebra vs ground truth, serde, and the Spark build + SQL surface."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.functions import theta as TH


def _sk(values, k=TH.DEFAULT_NOMINAL):
    return TH.ThetaSketch.from_values(pd.Series(list(values)), k)


def test_exact_mode_below_nominal():
    s = _sk([f"u{i}" for i in range(1000)] * 3)  # duplicates collapse
    assert s.is_exact and s.estimate() == 1000.0


def test_estimation_error_within_bounds():
    n, k = 200_000, 1024
    s = _sk(range(n), k)
    assert not s.is_exact and s.entries.size == k
    rse = 1.0 / np.sqrt(k - 1)
    assert abs(s.estimate() - n) / n < 4 * rse  # ~4 sigma


def test_union_exact_and_estimated():
    a, b = _sk(range(0, 800)), _sk(range(400, 1200))
    u = a.union(b)
    assert u.is_exact and u.estimate() == 1200.0  # both exact, small
    big_a, big_b = _sk(range(0, 60_000), 1024), _sk(range(30_000, 90_000), 1024)
    est = big_a.union(big_b).estimate()
    assert abs(est - 90_000) / 90_000 < 0.15


def test_intersection_and_difference_vs_truth():
    a, b = _sk(range(0, 60_000), 4096), _sk(range(40_000, 100_000), 4096)
    inter = a.intersect(b).estimate()
    assert abs(inter - 20_000) / 20_000 < 0.15
    diff = a.a_not_b(b).estimate()
    assert abs(diff - 40_000) / 40_000 < 0.15


def test_union_all_matches_single_build_small():
    parts = [[f"x{i}" for i in range(j, 500, 5)] for j in range(5)]
    merged = TH.union_all([_sk(p) for p in parts])
    rebuilt = _sk([v for p in parts for v in p])
    assert merged.estimate() == rebuilt.estimate() == 500.0


def test_serde_round_trip_and_errors():
    for s in (_sk([]), _sk(range(10)), _sk(range(50_000), 512)):
        blob = TH.serialize(s)
        back = TH.deserialize(blob)
        assert back.cut == s.cut and back.k == s.k
        assert np.array_equal(back.entries, s.entries)
        assert TH.serialize(back) == blob
    with pytest.raises(ValueError, match="magic"):
        TH.deserialize(b"NOPE" + b"\x00" * 32)
    blob = TH.serialize(_sk(range(100)))
    with pytest.raises(ValueError, match="truncated"):
        TH.deserialize(blob[:40])


def test_deserialize_rejects_hostile_headers():
    """Crafted headers must raise, not mis-read the tail or divide by
    zero later: negative n, k < 1, estimation-mode theta of 0."""
    import struct

    def craft(k, n, exact, cut, payload=b""):
        return TH._MAGIC + struct.pack(">iqBQ", k, n, exact, cut) + payload

    with pytest.raises(ValueError, match="negative entry count"):
        TH.deserialize(craft(4096, -1, 1, 0))
    with pytest.raises(ValueError, match="k=0"):
        TH.deserialize(craft(0, 0, 1, 0))
    with pytest.raises(ValueError, match="estimation-mode theta"):
        TH.deserialize(craft(4096, 0, 0, 0))


def test_spark_build_and_sql_set_expression(spark):
    """The DISTINCT_COUNT_THETA_SKETCH query shape end-to-end: build
    per-group sketches, union + estimate through the SQL UDFs, and
    answer an intersection question Python-side from the same blobs."""
    from apache_pinot_spark.catalog import load_tables
    from tests.conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE)["events"]
    sk = TH.theta_sketch(ev, ["event_type"], "user_id", k=4096, out_col="theta")
    rows = {r["event_type"]: r["theta"] for r in sk.collect()}
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    # 15 users total -> every sketch is exact
    for et, blob in rows.items():
        assert TH.deserialize(blob).estimate() == float(exact[et])

    TH.register_theta_udfs(spark)
    sk.createOrReplaceTempView("theta_by_type")
    est = spark.sql(
        f"SELECT {TH.ESTIMATE_UDF}({TH.UNION_UDF}(theta)) AS u FROM theta_by_type"
    ).collect()[0]["u"]
    total = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert est == float(total)

    # set expression: users who did BOTH 'view' and 'purchase'
    both = TH.deserialize(rows["view"]).intersect(TH.deserialize(rows["purchase"]))
    truth = (
        ev.where("event_type = 'view'").select("user_id").distinct()
        .intersect(ev.where("event_type = 'purchase'").select("user_id").distinct())
        .count()
    )
    assert both.estimate() == float(truth)


def test_spark_partials_stay_bounded(spark):
    """The map-side partials must already respect the nominal cap — no
    partial may carry more than k entries (the constant-state claim)."""
    df = spark.range(100_000).selectExpr("id % 7 AS g", "id AS v")
    sk = TH.theta_sketch(df, ["g"], "v", k=256, out_col="theta")
    for r in sk.collect():
        s = TH.deserialize(r["theta"])
        assert s.entries.size <= 256
        # ~14k distinct per group sketched at k=256: within 4 sigma
        assert abs(s.estimate() - 100_000 / 7) / (100_000 / 7) < 4 / np.sqrt(255)


# --------------------------------------------------------------------------
# SQL dialect surface + set expressions (DISTINCT_COUNT_THETA_SKETCH shape)
# --------------------------------------------------------------------------


def test_dialect_theta_over_raw_column_is_exact(spark):
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_SMOKE

    eng = PinotEngine(spark, SF_SMOKE, tables=["events"])
    got = eng.sql(
        "SELECT DISTINCTCOUNTTHETASKETCH(user_id) AS u FROM events"
    ).collect()[0]["u"]
    assert got == 15


def test_dialect_theta_over_bytes_column(spark):
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE)["events"]
    sk = TH.theta_sketch(ev, ["event_type"], "user_id", out_col="theta")
    eng = PinotEngine(spark)
    eng.register("theta_by_type", sk)
    eng.register_theta_column("theta")
    got = eng.sql(
        "SELECT DISTINCTCOUNTTHETASKETCH(theta) AS u FROM theta_by_type"
    ).collect()[0]["u"]
    assert got == 15  # 15 users, exact-mode sketches, LONG return
    raw = eng.sql(
        "SELECT DISTINCTCOUNTRAWTHETASKETCH(theta) AS blob FROM theta_by_type"
    ).collect()[0]["blob"]
    assert TH.deserialize(bytes.fromhex(raw)).estimate() == 15.0


def test_dialect_raw_theta_requires_registration(spark):
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_SMOKE

    eng = PinotEngine(spark, SF_SMOKE, tables=["events"])
    with pytest.raises(ValueError, match="not a.*registered theta"):
        eng.sql("SELECT DISTINCTCOUNTRAWTHETASKETCH(user_id) FROM events")


def test_set_expression_evaluator():
    a, b, c = _sk(range(0, 100)), _sk(range(50, 150)), _sk(range(140, 160))
    sks = {"$1": a, "$2": b, "$3": c}
    assert TH.evaluate_set_expression("$1", sks).estimate() == 100.0
    assert TH.evaluate_set_expression("SET_UNION($1, $2)", sks).estimate() == 150.0
    assert TH.evaluate_set_expression("SET_INTERSECT($1, $2)", sks).estimate() == 50.0
    assert TH.evaluate_set_expression("SET_DIFF($1, $2)", sks).estimate() == 50.0
    nested = TH.evaluate_set_expression(
        "SET_INTERSECT(SET_UNION($1, $3), $2)", sks
    ).estimate()
    assert nested == 60.0  # (0..100 u 140..160) n (50..150) = 50..100 + 140..150
    for bad in ("SET_DIFF($1)", "SET_JOIN($1, $2)", "$9", "SET_UNION($1", "$1 $2"):
        with pytest.raises(ValueError):
            TH.evaluate_set_expression(bad, sks)


def test_engine_theta_set_estimate_end_to_end(spark):
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_SMOKE

    eng = PinotEngine(spark, SF_SMOKE, tables=["events"])
    est = eng.theta_set_estimate(
        "events", "user_id",
        ["event_type = 'view'", "event_type = 'purchase'"],
        "SET_INTERSECT($1, $2)",
    )
    ev = eng._dfs["events"]
    truth = (
        ev.where("event_type = 'view'").select("user_id").distinct()
        .intersect(ev.where("event_type = 'purchase'").select("user_id").distinct())
        .count()
    )
    assert est == float(truth)
    with pytest.raises(ValueError, match="at least one predicate"):
        eng.theta_set_estimate("events", "user_id", [], "$1")
