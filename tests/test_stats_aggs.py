"""Statistical aggregate pack (public aggregation surface): every new
dialect aggregate differential-tested against DuckDB on the real
lineitem/events tables — moment formulas written out explicitly where
the two engines' built-in conventions differ (DuckDB ships SAMPLE
skewness/kurtosis; the engine pins the POPULATION central-moment
convention of the reference's fourth-moment family)."""

from __future__ import annotations

import math

import pytest

from apache_pinot_spark.sqlfront import PinotEngine
from tests.conftest import SF_CORRECTNESS


@pytest.fixture()
def eng(spark):
    # SF_CORRECTNESS (not SF_SMOKE): the duck oracle fixture follows
    # SPARK_GRAFT_TEST_SF, so the Spark side must read the SAME SF or
    # the 10x-data sweep compares different datasets
    return PinotEngine(spark, SF_CORRECTNESS, tables=["lineitem", "events", "orders"])


def test_variance_stddev_covariance_vs_duckdb(eng, duck):
    got = eng.sql(
        "SELECT VARPOP(l_quantity) AS vp, VARSAMP(l_quantity) AS vs, "
        "VARIANCE(l_quantity) AS v, STDDEVPOP(l_quantity) AS sp, "
        "STDDEVSAMP(l_quantity) AS ss, STDDEV(l_quantity) AS s, "
        "COVARPOP(l_quantity, l_extendedprice) AS cp, "
        "COVARSAMP(l_quantity, l_extendedprice) AS cs "
        "FROM lineitem LIMIT 1"
    ).collect()[0]
    want = duck.sql(
        "SELECT var_pop(l_quantity), var_samp(l_quantity), "
        "stddev_pop(l_quantity), stddev_samp(l_quantity), "
        "covar_pop(l_quantity, l_extendedprice), "
        "covar_samp(l_quantity, l_extendedprice) FROM lineitem"
    ).fetchone()
    assert got["vp"] == pytest.approx(want[0], rel=1e-9)
    assert got["vs"] == got["v"] == pytest.approx(want[1], rel=1e-9)
    assert got["sp"] == pytest.approx(want[2], rel=1e-9)
    assert got["ss"] == got["s"] == pytest.approx(want[3], rel=1e-9)
    assert got["cp"] == pytest.approx(want[4], rel=1e-9)
    assert got["cs"] == pytest.approx(want[5], rel=1e-9)


def test_skewness_kurtosis_fourthmoment_population_convention(eng, duck):
    """Explicit population central moments in DuckDB (not its sample
    built-ins) must reproduce the engine's SKEWNESS / KURTOSIS /
    FOURTHMOMENT."""
    got = eng.sql(
        "SELECT SKEWNESS(l_quantity) AS sk, KURTOSIS(l_quantity) AS ku, "
        "FOURTHMOMENT(l_quantity) AS m4 FROM lineitem LIMIT 1"
    ).collect()[0]
    n, m2, m3, m4 = duck.sql(
        "WITH s AS (SELECT avg(l_quantity) AS mu FROM lineitem) "
        "SELECT count(*), "
        "sum(pow(l_quantity - mu, 2)) / count(*), "
        "sum(pow(l_quantity - mu, 3)) / count(*), "
        "sum(pow(l_quantity - mu, 4)) / count(*) "
        "FROM lineitem, s"
    ).fetchone()
    assert got["sk"] == pytest.approx(m3 / m2**1.5, rel=1e-6)
    assert got["ku"] == pytest.approx(m4 / m2**2 - 3, rel=1e-6)
    assert got["m4"] == pytest.approx(m4, rel=1e-6)


def test_mode_reducers_and_tie_pinning(spark):
    eng = PinotEngine(spark)
    eng.register(
        "mv", spark.createDataFrame([(3,), (3,), (1,), (1,), (2,)], "v int")
    )
    row = eng.sql(
        "SELECT MODE(v) AS lo, MODE(v, 'MIN') AS lo2, MODE(v, 'MAX') AS hi "
        "FROM mv LIMIT 1"
    ).collect()[0]
    assert (row["lo"], row["lo2"], row["hi"]) == (1.0, 1.0, 3.0)
    with pytest.raises(ValueError, match="MODE reducer"):
        eng.rewrite("SELECT MODE(v, 'AVG') FROM mv")


def test_mode_vs_duckdb_on_events(eng, duck):
    got = eng.sql(
        "SELECT event_type, MODE(user_id) AS m FROM events "
        "GROUP BY event_type ORDER BY event_type LIMIT 100"
    ).collect()
    # per-group mode with MIN tie-break, computed as explicit truth
    want = {}
    for et, uid, cnt in duck.sql(
        "SELECT event_type, user_id, count(*) FROM events GROUP BY 1, 2"
    ).fetchall():
        cur = want.get(et)
        if cur is None or cnt > cur[1] or (cnt == cur[1] and uid < cur[0]):
            want[et] = (uid, cnt)
    assert {r["event_type"]: r["m"] for r in got} == {
        et: float(uid) for et, (uid, cnt) in want.items()
    }


def test_minmaxrange_distinct_sum_avg_sumprecision(eng, duck):
    got = eng.sql(
        "SELECT MINMAXRANGE(l_quantity) AS r, DISTINCTSUM(l_linenumber) AS ds, "
        "DISTINCTAVG(l_linenumber) AS da, "
        "SUMPRECISION(l_extendedprice, 28, 2) AS sp FROM lineitem LIMIT 1"
    ).collect()[0]
    want = duck.sql(
        "SELECT max(l_quantity) - min(l_quantity), "
        "sum(DISTINCT l_linenumber), avg(DISTINCT l_linenumber), "
        "sum(CAST(l_extendedprice AS DECIMAL(28,2))) FROM lineitem"
    ).fetchone()
    assert got["r"] == want[0]
    assert got["ds"] == want[1]
    assert got["da"] == pytest.approx(want[2], rel=1e-9)
    assert float(got["sp"]) == pytest.approx(float(want[3]), abs=0.01)
    with pytest.raises(ValueError, match="precision/scale"):
        eng.rewrite("SELECT SUMPRECISION(l_quantity, 99) FROM lineitem")
    with pytest.raises(ValueError, match="needs"):
        eng.rewrite("SELECT SUMPRECISION(l_quantity) FROM lineitem")


def test_minmaxrangemv_over_array_column(spark):
    eng = PinotEngine(spark)
    eng.register(
        "arrs",
        spark.createDataFrame(
            [([1.0, 5.0],), ([2.0, 9.0],), ([0.5, 3.0],)], "a array<double>"
        ),
    )
    got = eng.sql("SELECT MINMAXRANGEMV(a) AS r FROM arrs LIMIT 1").collect()[0]["r"]
    assert got == 8.5  # max 9.0 − min 0.5


def test_group_by_shapes_stay_partial_aggregated(eng):
    """Scale assert: the new aggregates ride the normal hash-aggregate
    path (map-side partials; no window, no Python)."""
    df = eng.sql(
        "SELECT l_returnflag, VARPOP(l_quantity) AS v, MODE(l_linenumber) AS m "
        "FROM lineitem GROUP BY l_returnflag LIMIT 100"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Python" not in plan and "Window" not in plan
    assert math.isfinite(df.collect()[0]["v"])


def test_mv_aggregate_variants(spark, duck):
    """DISTINCTSUMMV / DISTINCTAVGMV / PERCENTILEMV (+EST/TDIGEST/KLL
    aliases) / DISTINCTCOUNTHLLMV over array columns, differential
    against DuckDB on the exploded elements."""
    eng = PinotEngine(spark)
    rows = [
        (1, [1.0, 2.0, 2.0, None]),
        (2, [2.0, 5.0]),
        (3, [0.5]),
        (4, []),
    ]
    df = spark.createDataFrame(rows, "id int, a array<double>")
    eng.register("mvt", df)
    got = eng.sql(
        "SELECT DISTINCTSUMMV(a) AS ds, DISTINCTAVGMV(a) AS da, "
        "PERCENTILEMV(a, 50) AS p50, PERCENTILEESTMV(a, 90) AS p90, "
        "PERCENTILETDIGESTMV(a, 90) AS p90b, PERCENTILEKLLMV(a, 90) AS p90c "
        "FROM mvt LIMIT 1"
    ).collect()[0]
    duck.sql("CREATE OR REPLACE TABLE mv_el AS SELECT * FROM (VALUES "
             "(1.0),(2.0),(2.0),(2.0),(5.0),(0.5)) t(v)")
    want_ds, want_da, want_p50, want_p90 = duck.sql(
        "SELECT (SELECT sum(DISTINCT v) FROM mv_el), "
        "(SELECT avg(DISTINCT v) FROM mv_el), "
        "(SELECT quantile_cont(v, 0.5) FROM mv_el), "
        "(SELECT quantile_cont(v, 0.9) FROM mv_el)"
    ).fetchone()
    assert got["ds"] == pytest.approx(want_ds)
    assert got["da"] == pytest.approx(want_da)
    assert got["p50"] == pytest.approx(want_p50)  # interpolated convention
    assert got["p90"] == got["p90b"] == got["p90c"] == pytest.approx(want_p90)
    # HLLMV estimate == scalar DISTINCTCOUNTHLL over the exploded column
    eng.register(
        "mvx",
        df.selectExpr("explode(filter(a, x -> x IS NOT NULL)) AS v"),
    )
    hll_mv = eng.sql("SELECT DISTINCTCOUNTHLLMV(a) AS h FROM mvt LIMIT 1").collect()[0]["h"]
    hll_scalar = eng.sql("SELECT DISTINCTCOUNTHLL(v) AS h FROM mvx LIMIT 1").collect()[0]["h"]
    assert hll_mv == hll_scalar
    # grouped shape stays a hash aggregate with no Python
    plan = eng.sql(
        "SELECT id % 2 AS g, PERCENTILEMV(a, 50) AS p FROM mvt GROUP BY id % 2"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_datetimeconvert_and_timeconvert(eng, duck):
    """DATETIMECONVERT across format families (EPOCH units,
    SIMPLE_DATE_FORMAT, TIMESTAMP) with granularity bucketing, and
    TIMECONVERT unit changes — differential against explicit DuckDB
    arithmetic on the events table."""
    got = eng.sql(
        "SELECT DATETIMECONVERT(unix_millis(CAST(ts AS TIMESTAMP)), "
        "  '1:MILLISECONDS:EPOCH', '1:HOURS:EPOCH', '1:HOURS') AS h, "
        "COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY h LIMIT 2000"
    ).collect()
    want = duck.sql(
        "SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS h, count(*) "
        "FROM events GROUP BY 1 ORDER BY h"
    ).fetchall()
    assert [(r["h"], r["cnt"]) for r in got] == [(r[0], r[1]) for r in want]
    # SDF output + 15-minute bucketing
    row = eng.sql(
        "SELECT DATETIMECONVERT(unix_millis(CAST(ts AS TIMESTAMP)), "
        "  '1:MILLISECONDS:EPOCH', '1:DAYS:SIMPLE_DATE_FORMAT:yyyyMMdd', "
        "  '1:DAYS') AS d FROM events ORDER BY ts LIMIT 1"
    ).collect()[0]
    wd = duck.sql(
        "SELECT strftime(min(CAST(ts AS TIMESTAMP)), '%Y%m%d') FROM events"
    ).fetchone()[0]
    assert row["d"] == wd
    # SDF input -> epoch minutes, and TIMESTAMP output form
    eng2 = PinotEngine(eng.spark)
    eng2.register(
        "sdf", eng.spark.createDataFrame([("20240102",)], "d string")
    )
    r2 = eng2.sql(
        "SELECT DATETIMECONVERT(d, '1:DAYS:SIMPLE_DATE_FORMAT:yyyyMMdd', "
        "  '1:MINUTES:EPOCH', '1:DAYS') AS m, "
        "DATETIMECONVERT(d, '1:DAYS:SIMPLE_DATE_FORMAT:yyyyMMdd', "
        "  '1:MILLISECONDS:TIMESTAMP', '1:DAYS') AS t FROM sdf LIMIT 1"
    ).collect()[0]
    assert r2["m"] == 1_704_153_600_000 // 60000
    assert str(r2["t"]).startswith("2024-01-02 00:00:00")
    # TIMECONVERT + rounded/bucket epoch family
    r3 = eng2.sql(
        "SELECT TIMECONVERT(90061000, 'MILLISECONDS', 'SECONDS') AS s, "
        "TIMECONVERT(25, 'HOURS', 'DAYS') AS d, "
        "TOEPOCHMINUTESROUNDED(90061000, 10) AS mr, "
        "TOEPOCHMINUTESBUCKET(90061000, 10) AS mb, "
        "FROMEPOCHMINUTESBUCKET(150, 10) AS fb FROM sdf LIMIT 1"
    ).collect()[0]
    assert (r3["s"], r3["d"]) == (90061, 1)
    assert r3["mr"] == 1500 and r3["mb"] == 150  # 1501 min -> floor(/10)
    assert r3["fb"] == 150 * 10 * 60000
    # the whole rounded/bucket family across units (one query, exact):
    # 90061000 ms = 90061 s = 1501 min = 25 h = 1 day and 1:01:01
    r4 = eng2.sql(
        "SELECT TOEPOCHSECONDSROUNDED(90061000, 100) AS sr, "
        "TOEPOCHSECONDSBUCKET(90061000, 100) AS sb, "
        "TOEPOCHHOURSROUNDED(90061000, 12) AS hr, "
        "TOEPOCHHOURSBUCKET(90061000, 12) AS hb, "
        "TOEPOCHDAYSROUNDED(954061000000, 7) AS dr, "
        "TOEPOCHDAYSBUCKET(954061000000, 7) AS db, "
        "FROMEPOCHSECONDSBUCKET(900, 100) AS fs, "
        "FROMEPOCHHOURSBUCKET(2, 12) AS fh, "
        "FROMEPOCHDAYSBUCKET(3, 7) AS fd FROM sdf LIMIT 1"
    ).collect()[0]
    assert (r4["sr"], r4["sb"]) == (90000, 900)
    assert (r4["hr"], r4["hb"]) == (24, 2)
    days = 954061000000 // 86400000  # 11042
    assert (r4["dr"], r4["db"]) == (days // 7 * 7, days // 7)
    assert r4["fs"] == 900 * 100 * 1000
    assert r4["fh"] == 2 * 12 * 3600000
    assert r4["fd"] == 3 * 7 * 86400000
    with pytest.raises(ValueError, match="TIMECONVERT units"):
        eng2.rewrite("SELECT TIMECONVERT(1, 'FORTNIGHTS', 'DAYS') FROM sdf")
    with pytest.raises(ValueError, match="DATETIMECONVERT needs"):
        eng2.rewrite("SELECT DATETIMECONVERT(d, '1:DAYS:EPOCH') FROM sdf")


def test_arrayagg_and_distinctcountbitmapmv(spark, duck):
    eng = PinotEngine(spark)
    eng.register(
        "aa",
        spark.createDataFrame(
            [(1, "x", [1, 2]), (1, "y", [2, 3]), (2, "x", [5])],
            "g int, s string, a array<int>",
        ),
    )
    got = eng.sql(
        "SELECT g, ARRAYAGG(s, 'STRING') AS vals, "
        "ARRAYAGG(s, 'STRING', true) AS dvals, "
        "DISTINCTCOUNTBITMAPMV(a) AS dc "
        "FROM aa GROUP BY g ORDER BY g LIMIT 10"
    ).collect()
    by_g = {r["g"]: r for r in got}
    assert sorted(by_g[1]["vals"]) == ["x", "y"] and by_g[1]["dc"] == 3
    assert sorted(by_g[1]["dvals"]) == ["x", "y"]
    assert by_g[2]["vals"] == ["x"] and by_g[2]["dc"] == 1
    # distinct flag dedups repeated values
    eng.register("aa2", spark.createDataFrame([(1, "x"), (1, "x")], "g int, s string"))
    r = eng.sql(
        "SELECT ARRAYAGG(s, 'STRING', true) AS d FROM aa2 GROUP BY g LIMIT 1"
    ).collect()[0]
    assert r["d"] == ["x"]


def test_fourthmoment_constant_group_is_zero(spark):
    eng = PinotEngine(spark)
    eng.register("const", spark.createDataFrame([(1, 5.0)] * 4, "g int, v double"))
    row = eng.sql(
        "SELECT FOURTHMOMENT(v) AS m4, KURTOSIS(v) AS k FROM const LIMIT 1"
    ).collect()[0]
    assert row["m4"] == 0.0  # true m4 of a constant; was NaN pre-guard


def test_exact_moments_match_dialect_float_aggregates(spark):
    """functions/moments.exact_central_moments (the hash-gate exact path)
    agrees with the dialect's float moment aggregates (the numerically
    robust scale path) to 1e-9 relative — the two implementations pin
    each other."""
    from apache_pinot_spark.functions.moments import exact_central_moments
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.sqlfront import PinotEngine
    from pyspark.sql import functions as F
    from tests.conftest import SF_CORRECTNESS

    li = load_tables(spark, SF_CORRECTNESS)["lineitem"]
    got = exact_central_moments(li, F.col("l_quantity")).collect()[0]

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["lineitem"])
    want = eng.sql(
        "SELECT VARPOP(l_quantity) AS v, SKEWNESS(l_quantity) AS s, "
        "KURTOSIS(l_quantity) AS k, FOURTHMOMENT(l_quantity) AS m4, "
        "COUNT(*) AS n FROM lineitem"
    ).collect()[0]

    def close(a, b):
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))

    assert got["n"] == want["n"]
    assert close(got["var_pop"], want["v"])
    assert close(got["skew_pop"], want["s"])
    # dialect KURTOSIS follows the reference's EXCESS kurtosis convention
    # if it subtracts 3; accept either convention explicitly
    assert close(got["kurt_pop"], want["k"]) or close(got["kurt_pop"] - 3.0, want["k"])
    # FOURTHMOMENT conventions differ by the /n: accept m4 (central moment)
    # or n*m4 (central SUM moment)
    assert close(got["fourth_moment"], want["m4"]) or close(
        got["fourth_moment"] * got["n"], want["m4"]
    )


def test_exact_moments_constant_input_yields_null_skew_kurt(spark):
    """Zero variance: skew/kurt are NULL on BOTH the exact path and (per
    the oracle CASE guard) DuckDB — not a 0/0 whose rendering differs."""
    from apache_pinot_spark.functions.moments import exact_central_moments
    from pyspark.sql import functions as F

    df = spark.range(5).select(F.lit(7).alias("v"))
    r = exact_central_moments(df, F.col("v")).collect()[0]
    assert r["n"] == 5 and r["mean"] == 7.0 and r["var_pop"] == 0.0
    assert r["skew_pop"] is None and r["kurt_pop"] is None
    assert r["fourth_moment"] == 0.0
