"""Gapfill (operators/gapfill.py): dense grids, both public fill modes,
validation, DuckDB differential on the events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators.gapfill import gapfill


def _df(spark):
    rows = [  # (series, ts_ms, v) — bucket size 100, range [0, 500)
        ("a", 10, 1.0), ("a", 110, 2.0), ("a", 430, 5.0),
        ("b", 210, 7.0),
    ]
    return spark.createDataFrame(rows, "k string, ts long, v double")


def test_gapfill_dense_grid_and_previous_fill(spark):
    out = gapfill(
        _df(spark), "ts", bucket_ms=100, start_ms=0, end_ms=500,
        key_cols=["k"], aggs={"v": F.sum("v")},
        fill={"v": ("FILL_PREVIOUS_VALUE", None)},
    ).collect()
    got = {(r["k"], r["bucket_ms_start"]): r["v"] for r in out}
    assert len(got) == 10  # 2 series x 5 buckets, no gaps
    assert [got[("a", b)] for b in range(0, 500, 100)] == [1.0, 2.0, 2.0, 2.0, 5.0]
    # series b: leading buckets stay null (no default), then carry
    assert [got[("b", b)] for b in range(0, 500, 100)] == [None, None, 7.0, 7.0, 7.0]


def test_gapfill_default_fill_and_leading_default(spark):
    out = gapfill(
        _df(spark), "ts", bucket_ms=100, start_ms=0, end_ms=500,
        key_cols=["k"], aggs={"v": F.sum("v"), "n": F.count("*")},
        fill={"v": ("FILL_DEFAULT_VALUE", 0.0), "n": ("FILL_PREVIOUS_VALUE", 0)},
    ).collect()
    got = {(r["k"], r["bucket_ms_start"]): (r["v"], r["n"]) for r in out}
    assert got[("a", 200)] == (0.0, 1)   # v default-filled, n carried from b=100
    assert got[("b", 0)] == (0.0, 0)     # leading: default fills both
    assert got[("b", 200)] == (7.0, 1)   # observed bucket untouched


def test_gapfill_rows_outside_range_ignored(spark):
    df = spark.createDataFrame([("a", -50, 9.0), ("a", 120, 1.0), ("a", 900, 9.0)],
                               "k string, ts long, v double")
    out = gapfill(df, "ts", 100, 0, 300, ["k"], {"v": F.sum("v")}).collect()
    assert sorted((r["bucket_ms_start"], r["v"]) for r in out) == [
        (0, None), (100, 1.0), (200, None)
    ]


def test_gapfill_validation():
    with pytest.raises(ValueError, match="bucket_ms"):
        gapfill(None, "ts", 0, 0, 100, [], {})
    with pytest.raises(ValueError, match="fill mode"):
        gapfill(None, "ts", 1, 0, 100, [], {"v": F.sum("v")},
                fill={"v": ("FILL_SIDEWAYS", 0)})
    with pytest.raises(ValueError, match="not an output"):
        gapfill(None, "ts", 1, 0, 100, [], {"v": F.sum("v")},
                fill={"w": ("FILL_DEFAULT_VALUE", 0)})


def test_gapfill_matches_duckdb_on_events(spark, duck):
    """Differential: per-event-type daily event counts with previous-fill
    over a fixed 10-day range, vs generate_series + window carry in
    DuckDB."""
    from apache_pinot_spark.catalog import load_tables
    from tests.conftest import SF_CORRECTNESS

    ev = load_tables(spark, SF_CORRECTNESS)["events"]
    day = 86_400_000
    start = 1_704_067_200_000  # 2024-01-01
    end = start + 10 * day
    out = gapfill(
        ev.select("event_type", F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
                  "value"),
        "ms", day, start, end, ["event_type"],
        {"cnt": F.count("*")},
        fill={"cnt": ("FILL_PREVIOUS_VALUE", 0)},
    )
    got = {(r["event_type"], r["bucket_ms_start"]): r["cnt"] for r in out.collect()}
    want_rows = duck.sql(f"""
        WITH obs AS (
          SELECT event_type,
                 {start} + ((epoch_ms(CAST(ts AS TIMESTAMP)) - {start}) // {day}) * {day} AS b,
                 count(*) AS cnt
          FROM events
          WHERE epoch_ms(CAST(ts AS TIMESTAMP)) >= {start}
            AND epoch_ms(CAST(ts AS TIMESTAMP)) < {end}
          GROUP BY 1, 2),
        grid AS (
          SELECT s.event_type, g.b
          FROM (SELECT DISTINCT event_type FROM obs) s
          CROSS JOIN (SELECT unnest(generate_series({start}, {end - 1}, {day})) AS b) g)
        SELECT grid.event_type, grid.b,
               coalesce(last_value(obs.cnt IGNORE NULLS) OVER (
                 PARTITION BY grid.event_type ORDER BY grid.b
                 ROWS UNBOUNDED PRECEDING), 0) AS cnt
        FROM grid LEFT JOIN obs ON grid.event_type = obs.event_type AND grid.b = obs.b
    """).fetchall()
    want = {(r[0], r[1]): r[2] for r in want_rows}
    assert got == want and len(got) >= 10


def test_gapfill_plan_shape(spark):
    """Scale assert: the bucketing aggregate partial-combines map-side;
    the grid side is built from a DISTINCT (itself partial-aggregated),
    and nothing cartesian or Python-side appears."""
    df = spark.createDataFrame([("a", 10, 1.0)], "k string, ts long, v double")
    from pyspark.sql import functions as F
    plan = gapfill(
        df, "ts", 100, 0, 500, ["k"], {"v": F.sum("v")},
        fill={"v": ("FILL_PREVIOUS_VALUE", None)},
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan
    assert "Generate explode" in plan or "Explode" in plan.replace("explode", "Explode")


def test_gapfill_sql_table_function_form(spark, duck):
    """The public GAPFILL projection syntax end-to-end through the
    engine: inner aggregation buckets per (series, day), GAPFILL
    densifies [start, end) with previous-fill — results equal the
    DataFrame operator over the same observed frame."""
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_CORRECTNESS

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["events"])
    day = 86_400_000
    start = 1_704_067_200_000  # 2024-01-01
    end = start + 10 * day
    out = eng.sql(
        f"SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', '{start}', '{end}', '1:DAYS', "
        f"  FILL(cnt, 'FILL_PREVIOUS_VALUE', 0), TIMESERIESON(event_type)) AS b, "
        f"  event_type, cnt "
        f"FROM (SELECT dateTrunc('DAY', ts) AS b, event_type, COUNT(*) AS cnt "
        f"      FROM events GROUP BY dateTrunc('DAY', ts), event_type)"
    )
    got = {(r["event_type"], r["b"]): r["cnt"] for r in out.collect()}
    assert out.columns == ["b", "event_type", "cnt"]

    ev = load_tables(spark, SF_CORRECTNESS)["events"]
    want_df = gapfill(
        ev.select("event_type", F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")),
        "ms", day, start, end, ["event_type"], {"cnt": F.count("*")},
        fill={"cnt": ("FILL_PREVIOUS_VALUE", 0)},
    )
    want = {(r["event_type"], r["bucket_ms_start"]): r["cnt"] for r in want_df.collect()}
    assert got == want and len(got) >= 10


def test_gapfill_through_broker_envelope(spark):
    """PinotEngine.query() (the broker-envelope path) must route GAPFILL
    through the table-function parser like sql() does — not hand Spark an
    unknown function and return an error envelope."""
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_CORRECTNESS

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["events"])
    day = 86_400_000
    start = 1_704_067_200_000
    end = start + 3 * day
    q = (
        f"SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', '{start}', '{end}', '1:DAYS', "
        f"  FILL(cnt, 'FILL_PREVIOUS_VALUE', 0), TIMESERIESON(event_type)) AS b, "
        f"  event_type, cnt "
        f"FROM (SELECT dateTrunc('DAY', ts) AS b, event_type, COUNT(*) AS cnt "
        f"      FROM events GROUP BY dateTrunc('DAY', ts), event_type)"
    )
    env = eng.query(q)
    assert env["exceptions"] == []
    names = env["resultTable"]["dataSchema"]["columnNames"]
    assert names == ["b", "event_type", "cnt"]
    rows = env["resultTable"]["rows"]
    want = {tuple(r) for r in eng.sql(q).collect()}
    assert {tuple(r) for r in rows} == want and len(rows) >= 3


def test_gapfill_sql_validation():
    from apache_pinot_spark.sqlfront import _parse_gapfill

    assert _parse_gapfill("SELECT x FROM t") is None
    base = "SELECT GAPFILL(b, {fmt}, '0', '100', {bucket}{extra}) AS b, k FROM t"
    good = base.format(fmt="'1:MILLISECONDS:EPOCH'", bucket="'10:MILLISECONDS'",
                       extra=", TIMESERIESON(k)")
    inner, alias, fmt, s, e, w, keys, fills = _parse_gapfill(good)
    assert (alias, s, e, w, keys, fills) == ("b", "0", "100", 10, ["k"], {})
    assert (fmt.fmt, fmt.unit_millis) == ("EPOCH", 1)
    assert inner.startswith("SELECT b AS b, k FROM t")
    # non-millis EPOCH units and SDF patterns parse (round 7)
    *_, fmt_s, _, _, _, _, _ = _parse_gapfill(
        base.format(fmt="'1:SECONDS:EPOCH'", bucket="'10:SECONDS'",
                    extra=", TIMESERIESON(k)"))
    assert fmt_s.unit_millis == 1000
    import pytest as _pt0

    # a bucket finer than the declared unit cannot render distinct
    # buckets in the output time column — rejected, not truncated
    with _pt0.raises(ValueError, match="not a multiple"):
        _parse_gapfill(base.format(fmt="'1:SECONDS:EPOCH'",
                                   bucket="'10:MILLISECONDS'",
                                   extra=", TIMESERIESON(k)"))
    # unknown EPOCH units reject at parse, not as a KeyError downstream
    with _pt0.raises(ValueError, match="unsupported time format"):
        _parse_gapfill(base.format(fmt="'1:MILLIS:EPOCH'",
                                   bucket="'10:MILLISECONDS'",
                                   extra=", TIMESERIESON(k)"))
    *_, fmt_d, _, _, _, _, _ = _parse_gapfill(
        base.format(fmt="'1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd'",
                    bucket="'10:MILLISECONDS'", extra=", TIMESERIESON(k)"))
    assert (fmt_d.fmt, fmt_d.pattern) == ("SIMPLE_DATE_FORMAT", "yyyy-MM-dd")
    import pytest as _pt

    with _pt.raises(ValueError, match="needs a pattern"):
        _parse_gapfill(base.format(fmt="'1:DAYS:SIMPLE_DATE_FORMAT'",
                                   bucket="'10:MILLISECONDS'", extra=", TIMESERIESON(k)"))
    with _pt.raises(ValueError, match="unsupported time format"):
        _parse_gapfill(base.format(fmt="'1:MILLISECONDS:TIMESTAMP'",
                                   bucket="'10:MILLISECONDS'", extra=", TIMESERIESON(k)"))
    with _pt.raises(ValueError, match="TIMESERIESON"):
        _parse_gapfill(base.format(fmt="'1:MILLISECONDS:EPOCH'",
                                   bucket="'10:MILLISECONDS'", extra=""))
    with _pt.raises(ValueError, match="bucket spec"):
        _parse_gapfill(base.format(fmt="'1:MILLISECONDS:EPOCH'",
                                   bucket="'monthly'", extra=", TIMESERIESON(k)"))
    with _pt.raises(ValueError, match="explicit.*default"):
        _parse_gapfill(base.format(fmt="'1:MILLISECONDS:EPOCH'",
                                   bucket="'10:MILLISECONDS'",
                                   extra=", FILL(v, 'FILL_DEFAULT_VALUE'), TIMESERIESON(k)"))
    with _pt.raises(ValueError, match="output alias"):
        _parse_gapfill("SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', '0', '1', "
                       "'1:MILLISECONDS', TIMESERIESON(k)), k FROM t")


def test_gapfill_nested_aggregate_over_gapfill(spark):
    """The public aggregate-over-gapfill shape: outer query aggregates
    the densified series (per-bucket totals across all series) — checked
    against running the projection form and aggregating its rows."""
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_CORRECTNESS

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["events"])
    day = 86_400_000
    start = 1_704_067_200_000
    end = start + 5 * day
    inner = (
        f"SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', '{start}', '{end}', '1:DAYS', "
        f"  FILL(cnt, 'FILL_PREVIOUS_VALUE', 0), TIMESERIESON(event_type)) AS b, "
        f"  event_type, cnt "
        f"FROM (SELECT dateTrunc('DAY', ts) AS b, event_type, COUNT(*) AS cnt "
        f"      FROM events GROUP BY dateTrunc('DAY', ts), event_type)"
    )
    nested = (
        f"SELECT b, SUM(cnt) AS total, COUNT(*) AS series "
        f"FROM ({inner}) g GROUP BY b ORDER BY b"
    )
    got = [(r["b"], r["total"], r["series"]) for r in eng.sql(nested).collect()]
    flat = eng.sql(inner).collect()
    agg: dict = {}
    for r in flat:
        t, c = agg.get(r["b"], (0, 0))
        agg[r["b"]] = (t + r["cnt"], c + 1)
    want = sorted((b, t, c) for b, (t, c) in agg.items())
    assert got == want and len(got) == 5
    # every bucket counts every series (the gapfill densified the grid)
    n_series = len({r["event_type"] for r in flat})
    assert all(c == n_series for _, _, c in got)


def test_gapfill_nested_through_broker_envelope(spark):
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_CORRECTNESS

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["events"])
    day = 86_400_000
    start = 1_704_067_200_000
    q = (
        f"SELECT SUM(cnt) AS total FROM ("
        f"SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', '{start}', '{start + 2 * day}', "
        f"'1:DAYS', FILL(cnt, 'FILL_PREVIOUS_VALUE', 0), TIMESERIESON(event_type)) AS b, "
        f"event_type, cnt "
        f"FROM (SELECT dateTrunc('DAY', ts) AS b, event_type, COUNT(*) AS cnt "
        f"      FROM events GROUP BY dateTrunc('DAY', ts), event_type)) g"
    )
    env = eng.query(q)
    assert env["exceptions"] == []
    assert env["resultTable"]["dataSchema"]["columnNames"] == ["total"]
    assert env["resultTable"]["rows"][0][0] == eng.sql(q).collect()[0]["total"]


def test_gapfill_nested_malformed_still_raises(spark):
    from apache_pinot_spark.sqlfront import PinotEngine

    eng = PinotEngine(spark)
    with pytest.raises(ValueError, match="TIMESERIESON"):
        eng.sql(
            "SELECT SUM(v) FROM (SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', "
            "'0', '100', '10:MILLISECONDS') AS b, v FROM t) g GROUP BY b"
        )
    with pytest.raises(ValueError, match="output alias"):
        eng.sql(
            "SELECT SUM(v) FROM (SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', "
            "'0', '100', '10:MILLISECONDS', TIMESERIESON(k)), v FROM t) g"
        )


def test_gapfill_sql_time_formats_agree(spark):
    """Round 7: the declared time format is honored end-to-end — the
    SECONDS-epoch and SIMPLE_DATE_FORMAT forms of the same daily gapfill
    produce the identical dense grid as the epoch-millis form, with the
    time column rendered in each declared format (seconds integers /
    pattern strings)."""
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_CORRECTNESS

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["events"])
    day = 86_400_000
    start = 1_704_067_200_000
    end = start + 5 * day

    def q(fmt, expr, start_lit, end_lit):
        return (
            f"SELECT GAPFILL(b, '{fmt}', '{start_lit}', '{end_lit}', '1:DAYS', "
            f"  FILL(cnt, 'FILL_DEFAULT_VALUE', 0), TIMESERIESON(event_type)) AS b, "
            f"  event_type, cnt "
            f"FROM (SELECT {expr} AS b, event_type, COUNT(*) AS cnt "
            f"      FROM events GROUP BY {expr}, event_type)"
        )

    ms_rows = eng.sql(
        q("1:MILLISECONDS:EPOCH", "dateTrunc('DAY', ts)", start, end)
    ).collect()
    base = {(r["event_type"], r["b"]): r["cnt"] for r in ms_rows}

    # SECONDS epoch: time expression and start/end literals in seconds
    sec_rows = eng.sql(
        q("1:SECONDS:EPOCH", "dateTrunc('DAY', ts) / 1000",
          start // 1000, end // 1000)
    ).collect()
    assert {(r["event_type"], r["b"] * 1000): r["cnt"] for r in sec_rows} == base

    # SIMPLE_DATE_FORMAT: yyyy-MM-dd strings in and out
    sdf_rows = eng.sql(
        q("1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd",
          "toDateTime(dateTrunc('DAY', ts), 'yyyy-MM-dd')",
          "2024-01-01", "2024-01-06")
    ).collect()
    import datetime as _dt

    def _ms(s):
        return int(_dt.datetime.strptime(s, "%Y-%m-%d")
                   .replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)

    assert {(r["event_type"], _ms(r["b"])): r["cnt"] for r in sdf_rows} == base
    assert all(isinstance(r["b"], str) and len(r["b"]) == 10 for r in sdf_rows)


def test_gapfill_sdf_pattern_coarser_than_bucket_rejects(spark):
    """yyyy-MM-dd with hourly buckets would render 24 buckets per day as
    the same string — the SDF twin of the EPOCH alignment guard."""
    import pytest as _pt

    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_CORRECTNESS

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["events"])
    q = (
        "SELECT GAPFILL(b, '1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd', "
        "'2024-01-01', '2024-01-03', '1:HOURS', TIMESERIESON(event_type)) AS b, "
        "event_type, cnt "
        "FROM (SELECT toDateTime(dateTrunc('DAY', ts), 'yyyy-MM-dd') AS b, "
        "event_type, COUNT(*) AS cnt "
        "FROM events GROUP BY toDateTime(dateTrunc('DAY', ts), 'yyyy-MM-dd'), event_type)"
    )
    with _pt.raises(ValueError, match="cannot represent the bucket grid"):
        eng.sql(q)


def test_gapfill_deep_nested_forms(spark):
    """Every subquery position a gapfilled relation can occupy (late
    r7): CTE body (WITH g AS (…)), a second outer level above the
    aggregate, TWO gapfill calls joined in one statement, HAVING over
    the densified aggregate. The view substitution is a parenthesized
    SELECT, so all positions share one mechanism; results cross-check
    against the single-level aggregate-over-gapfill form."""
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_CORRECTNESS

    eng = PinotEngine(spark, SF_CORRECTNESS, tables=["events"])
    day = 86_400_000
    start = 1_704_067_200_000
    inner = (
        f"SELECT GAPFILL(b, '1:MILLISECONDS:EPOCH', '{start}', "
        f"'{start + 3 * day}', '1:DAYS', "
        f"FILL(cnt, 'FILL_PREVIOUS_VALUE', 0), TIMESERIESON(event_type)) AS b, "
        f"event_type, cnt "
        f"FROM (SELECT dateTrunc('DAY', ts) AS b, event_type, COUNT(*) AS cnt "
        f"      FROM events GROUP BY dateTrunc('DAY', ts), event_type)"
    )
    base = [
        (r["b"], r["total"])
        for r in eng.sql(
            f"SELECT b, SUM(cnt) AS total FROM ({inner}) g "
            f"GROUP BY b ORDER BY b"
        ).collect()
    ]
    assert len(base) == 3
    # CTE body
    cte = [
        (r["b"], r["total"])
        for r in eng.sql(
            f"WITH g AS ({inner}) SELECT b, SUM(cnt) AS total FROM g "
            f"GROUP BY b ORDER BY b"
        ).collect()
    ]
    assert cte == base
    # second outer level
    mx = eng.sql(
        f"SELECT MAX(total) AS mx FROM (SELECT b, SUM(cnt) AS total "
        f"FROM ({inner}) g GROUP BY b) h"
    ).collect()[0]["mx"]
    assert mx == max(t for _, t in base)
    # HAVING over the densified aggregate
    hv = [
        (r["b"], r["total"])
        for r in eng.sql(
            f"SELECT b, SUM(cnt) AS total FROM ({inner}) g GROUP BY b "
            f"HAVING SUM(cnt) > 0 ORDER BY b"
        ).collect()
    ]
    assert hv == [(b, t) for b, t in base if t > 0]
    # two gapfill calls in one statement (self-join of the series)
    pairs = eng.sql(
        f"SELECT a.b AS b, a.cnt + bb.cnt AS s FROM ({inner}) a "
        f"JOIN ({inner}) bb ON a.b = bb.b AND a.event_type = bb.event_type"
    ).collect()
    flat = eng.sql(inner).collect()
    assert len(pairs) == len(flat)
    doubled = sorted((r["b"], 2 * r["cnt"]) for r in flat)
    assert sorted((r["b"], r["s"]) for r in pairs) == doubled
