"""Funnel analysis (operators/funnel.py) + windowed top-k
(operators/topk.py): DP semantics vs a brute-force chain oracle, real
events-table differential, plan shape, DuckDB top-k cross-check."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import funnel as FU
from apache_pinot_spark.operators import topk as TK

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)

STEPS = lambda: [  # noqa: E731 — view -> click -> purchase
    F.col("event_type") == "view",
    F.col("event_type") == "click",
    F.col("event_type") == "purchase",
]


def _df(spark, rows):
    # rows: (user, ts_ms, event_type)
    return spark.createDataFrame(rows, "user string, ts long, event_type string")


def test_funnel_chain_within_window(spark):
    df = _df(spark, [("u", 0, "view"), ("u", 500, "click"), ("u", 900, "purchase")])
    got = FU.funnel_max_step(df, "user", "ts", STEPS(), window_ms=1000).collect()
    assert got[0]["max_step"] == 3


def test_funnel_window_expiry_breaks_chain(spark):
    df = _df(spark, [("u", 0, "view"), ("u", 500, "click"), ("u", 1600, "purchase")])
    got = FU.funnel_max_step(df, "user", "ts", STEPS(), window_ms=1000).collect()
    assert got[0]["max_step"] == 2  # purchase lands outside view@0 + 1s


def test_funnel_later_entry_reopens_window(spark):
    # first view is stale, but a second view restarts the clock
    df = _df(
        spark,
        [("u", 0, "view"), ("u", 2000, "view"), ("u", 2500, "click"),
         ("u", 2900, "purchase")],
    )
    got = FU.funnel_max_step(df, "user", "ts", STEPS(), window_ms=1000).collect()
    assert got[0]["max_step"] == 3


def test_funnel_order_matters_and_other_events_ignored(spark):
    df = _df(
        spark,
        [("u", 0, "purchase"), ("u", 100, "error"), ("u", 200, "click"),
         ("u", 300, "view")],
    )
    got = FU.funnel_max_step(df, "user", "ts", STEPS(), window_ms=10_000).collect()
    assert got[0]["max_step"] == 1  # only the view counts; order is wrong for more


def test_funnel_count_match_complete(spark):
    df = _df(
        spark,
        [
            ("a", 0, "view"), ("a", 1, "click"), ("a", 2, "purchase"),
            ("b", 0, "view"), ("b", 1, "click"),
            ("c", 0, "view"),
            ("d", 0, "error"),  # no funnel events at all
        ],
    )
    steps = STEPS()
    counts = {r["step"]: r["entities"] for r in
              FU.funnel_count(df, "user", "ts", steps, 1000).collect()}
    assert counts == {1: 3, 2: 2, 3: 1}
    matched = {r["user"]: r["matched"] for r in
               FU.funnel_match_step(df, "user", "ts", steps, 1000).collect()}
    assert matched == {"a": [1, 1, 1], "b": [1, 1, 0], "c": [1, 0, 0]}
    assert FU.funnel_complete_count(df, "user", "ts", steps, 1000).collect()[0][
        "completed"
    ] == 1


def test_funnel_multi_step_event_counts_for_each_predicate(spark):
    # one event matching steps 1 AND 2 (overlapping predicates) can serve
    # as both chain links, including at the same timestamp
    df = spark.createDataFrame(
        [("u", 0, "view", 1), ("u", 10, "any", 9)],
        "user string, ts long, event_type string, v int",
    )
    steps = [F.col("event_type") == "view", F.col("v") >= 0]
    got = FU.funnel_max_step(df, "user", "ts", steps, 1000).collect()
    assert got[0]["max_step"] == 2


def test_funnel_rejects_bad_ts_type(spark):
    df = _df(spark, [("u", 0, "view")]).withColumn("s", F.lit("x"))
    with pytest.raises(TypeError, match="timestamp or epoch-ms"):
        FU.funnel_max_step(df, "user", "s", STEPS(), 1000)


def _brute_max_step(events, n_steps, window_ms):
    """Independent oracle: longest k with an index-ordered chain of steps
    1..k within the window, over the same (ts, step) sort order."""
    evs = sorted(events)
    best = 0
    for k in range(n_steps, 0, -1):
        for combo in itertools.combinations(range(len(evs)), k):
            if all(evs[c][1] == i + 1 for i, c in enumerate(combo)) and (
                evs[combo[-1]][0] - evs[combo[0]][0] <= window_ms
            ):
                best = k
                break
        if best:
            break
    return best


def test_funnel_matches_bruteforce_on_real_events(spark):
    """Differential on the real events table: view->click->purchase per
    user inside a 6-hour window, DP vs exhaustive chain search."""
    from apache_pinot_spark.catalog import load_tables
    from tests.conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE)["events"]
    window_ms = 6 * 3600 * 1000
    got = {
        r["user_id"]: r["max_step"]
        for r in FU.funnel_max_step(ev, "user_id", "ts", STEPS(), window_ms).collect()
    }
    step_of = {"view": 1, "click": 2, "purchase": 3}
    pdf = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        "event_type",
    ).toPandas()
    by_user: dict = {}
    for row in pdf.itertuples(index=False):
        if row.event_type in step_of:
            by_user.setdefault(row.user_id, []).append((row.ms, step_of[row.event_type]))
    want = {u: _brute_max_step(evs, 3, window_ms) for u, evs in by_user.items()}
    want = {u: s for u, s in want.items() if s > 0}
    assert got == want


def test_funnel_plan_filters_before_single_shuffle(spark):
    """Scale assert: non-funnel events are dropped below the one entity
    Exchange (slim rows through the shuffle), and the DP fold is pure
    JVM (no Python workers in the plan)."""
    df = _df(spark, [("u", 0, "view")])
    plan = FU.funnel_max_step(
        df, "user", "ts", STEPS(), 1000
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan and "Arrow" not in plan
    # the matched-steps filter must sit on the scan side of the exchange
    # (toString prints top-down, so the map side is after the Exchange line)
    _, _, post = plan.partition("Exchange")
    assert "Filter" in post


def test_windowed_topk_basic_and_ties(spark):
    rows = [
        ("2024-01-01 00:00:05", "a", 10.0), ("2024-01-01 00:00:20", "a", 5.0),
        ("2024-01-01 00:00:40", "b", 12.0), ("2024-01-01 00:00:50", "c", 12.0),
        ("2024-01-01 00:01:10", "b", 1.0),
    ]
    df = spark.createDataFrame(rows, "t string, k string, v double").select(
        F.col("t").cast("timestamp").alias("t"), "k", "v"
    )
    out = TK.windowed_topk(df, "t", "1 minute", ["k"], F.sum("v"), k=2).collect()
    first = sorted(
        [(r["k"], r["metric"], r["rank"]) for r in out if r["window_start"].minute == 0]
    )
    # minute 0: a=15, b=12, c=12 -> top2 = a, then b (tie with c breaks by key)
    assert first == [("a", 15.0, 1), ("b", 12.0, 2)]
    second = [(r["k"], r["rank"]) for r in out if r["window_start"].minute == 1]
    assert second == [("b", 1)]


def test_windowed_topk_matches_duckdb(spark, duck):
    from apache_pinot_spark.catalog import load_tables
    from tests.conftest import SF_CORRECTNESS

    ev = load_tables(spark, SF_CORRECTNESS)["events"]
    got = {
        (str(r["window_start"]), r["event_type"], r["rank"])
        for r in TK.windowed_topk(
            ev, "ts", "1 day", ["event_type"], F.count("*"), k=2
        ).collect()
    }
    want = {
        (str(r[0]), r[1], r[2])
        for r in duck.sql(
            "SELECT ws, event_type, rank FROM ("
            "  SELECT time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) ws, event_type,"
            "         row_number() OVER (PARTITION BY ws ORDER BY count(*) DESC, event_type) rank"
            "  FROM events GROUP BY 1, 2) WHERE rank <= 2"
        ).fetchall()
    }
    assert got == want


def test_windowed_topk_validates_k(spark):
    df = spark.range(1).select(F.current_timestamp().alias("t"), F.col("id"))
    with pytest.raises(ValueError, match="k must be"):
        TK.windowed_topk(df, "t", "1 minute", ["id"], F.count("*"), k=0)


def test_windowed_topk_plan_shape(spark):
    """Scale assert: partial aggregation below the (bucket, key) shuffle;
    the rank window runs over post-aggregation rows; no Python."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:05", "a", 1.0)], "t string, k string, v double"
    ).select(F.col("t").cast("timestamp").alias("t"), "k", "v")
    plan = TK.windowed_topk(
        df, "t", "1 minute", ["k"], F.sum("v"), 2
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan          # map-side combine before shuffle
    assert plan.count("Exchange") == 2    # agg shuffle + window repartition
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_sql_aggregate_matches_operator(spark):
    """FUNNEL_MAX_STEP / FUNNEL_MATCH_STEP as SQL GROUP BY aggregates
    must agree with the DataFrame operator on the real events table."""
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.sqlfront import PinotEngine
    from tests.conftest import SF_SMOKE

    eng = PinotEngine(spark, SF_SMOKE, tables=["events"])
    window = 6 * 3600 * 1000
    sql_got = {
        r["user_id"]: (r["ms"], r["flags"])
        for r in eng.sql(
            f"SELECT user_id, "
            f"FUNNEL_MAX_STEP(unix_millis(CAST(ts AS TIMESTAMP)), {window}, 3, "
            f"  event_type = 'view', event_type = 'click', event_type = 'purchase') AS ms, "
            f"FUNNEL_MATCH_STEP(unix_millis(CAST(ts AS TIMESTAMP)), {window}, 3, "
            f"  event_type = 'view', event_type = 'click', event_type = 'purchase') AS flags "
            f"FROM events GROUP BY user_id LIMIT 1000"
        ).collect()
    }
    ev = load_tables(spark, SF_SMOKE)["events"]
    op_got = {
        r["user_id"]: r["max_step"]
        for r in FU.funnel_max_step(ev, "user_id", "ts", STEPS(), window).collect()
    }
    assert len(sql_got) == 15
    for uid, (ms, flags) in sql_got.items():
        assert ms == op_got.get(uid, 0)
        assert flags == [1 if k + 1 <= ms else 0 for k in range(3)]


def test_funnel_sql_validation(spark):
    from apache_pinot_spark.sqlfront import PinotEngine

    eng = PinotEngine(spark)
    with pytest.raises(ValueError, match="declared 3 steps but got 2"):
        eng.rewrite("SELECT FUNNEL_MAX_STEP(ts, 1000, 3, a = 1, b = 2) FROM t GROUP BY u")
    # strict_increase is SQL-legal now (Arrow grouped-agg UDF emission)
    out = eng.rewrite(
        "SELECT FUNNEL_MAX_STEP(ts, 1000, 1, a = 1, 'strict_increase') FROM t GROUP BY u"
    )
    assert "__pinot_funnel_strict_increase" in out.sql
    with pytest.raises(ValueError, match="not supported in SQL"):
        eng.rewrite(
            "SELECT FUNNEL_MAX_STEP(ts, 1000, 1, a = 1, 'strict_odor') FROM t GROUP BY u"
        )


def _brute_max_step_strict(events, n_steps, window_ms):
    """Exhaustive oracle for STRICT_INCREASE: chains need strictly
    increasing timestamps."""
    evs = sorted(events)
    best = 0
    for k in range(n_steps, 0, -1):
        for combo in itertools.combinations(range(len(evs)), k):
            if (
                all(evs[c][1] == i + 1 for i, c in enumerate(combo))
                and all(evs[combo[i]][0] < evs[combo[i + 1]][0] for i in range(k - 1))
                and evs[combo[-1]][0] - evs[combo[0]][0] <= window_ms
            ):
                best = k
                break
        if best:
            break
    return best


def test_strict_increase_keeps_pareto_frontier(spark):
    """The greedy-killer case: a later B with a worse last_ts must not
    shadow the earlier B that still admits C (docstring counter-example)."""
    df = _df(spark, [("u", 0, "view"), ("u", 3, "click"), ("u", 5, "click"),
                     ("u", 5, "purchase")])
    got = FU.funnel_max_step_strict_increase(
        df, "user", "ts", STEPS(), window_ms=10
    ).collect()
    assert got[0]["max_step"] == 3  # chain view@0, click@3, purchase@5


def test_strict_increase_rejects_ties(spark):
    df = _df(spark, [("u", 0, "view"), ("u", 0, "click")])
    strict = FU.funnel_max_step_strict_increase(
        df, "user", "ts", STEPS(), 1000
    ).collect()[0]["max_step"]
    default = FU.funnel_max_step(df, "user", "ts", STEPS(), 1000).collect()[0]["max_step"]
    assert strict == 1 and default == 2  # ties chain only in default mode


def test_strict_increase_vs_bruteforce_randomized(spark):
    import random

    rng = random.Random(99)
    n_steps, window = 3, 30
    rows, truth = [], {}
    for case in range(60):
        entity = f"s{case}"
        evs = [(rng.randrange(0, 60), rng.randrange(1, n_steps + 1))
               for _ in range(rng.randrange(1, 12))]  # dense ts: many ties
        truth[entity] = _brute_max_step_strict(evs, n_steps, window)
        rows += [(entity, ts, s) for ts, s in evs]
    df = spark.createDataFrame(rows, "e string, ts long, s int")
    steps = [F.col("s") == i for i in range(1, n_steps + 1)]
    got = {
        r["e"]: r["max_step"]
        for r in FU.funnel_max_step_strict_increase(df, "e", "ts", steps, window).collect()
    }
    assert got == truth


# --------------------------------------------------------------------------
# strict_order / strict_deduplication (round 6): pinned ClickHouse
# windowFunnel semantics — independent Python reference scan + corner
# fixtures + randomized differentials (DataFrame fold AND SQL form).
# --------------------------------------------------------------------------


def _ref_strict_scan(events, n_steps, window_ms, mode):
    """Independent single-scan reference for the pinned strict modes —
    incl. the combined 'strict_order,strict_deduplication' form (both
    rule sets in event order; dedup latch checked before order kill).
    events: (ts, step) pairs, step 0 = matches no condition (only
    meaningful when strict_order is active; ignored otherwise)."""
    order_on = "strict_order" in mode
    dedup_on = "strict_deduplication" in mode
    lv = [None] * n_steps
    first = False
    for ts, st in sorted(events):
        if st == 0:
            if order_on and first:
                break
            continue
        if st == 1:
            lv[0] = ts
            first = True
        elif dedup_on and lv[st - 1] is not None:
            return st  # repeat interrupts; returns the repeat's own index
        elif order_on and first and lv[st - 2] is None:
            break  # out-of-order step kills further progress
        elif lv[st - 2] is not None and ts - lv[st - 2] <= window_ms:
            lv[st - 1] = lv[st - 2]
            if st == n_steps and dedup_on:
                return n_steps  # completion latches before any later dup
    for i in range(n_steps):
        if lv[i] is None:
            return i
    return n_steps


def test_strict_order_corner_fixtures(spark):
    window = 1000
    cases = [
        # (rows as (ts, event_type), expected) — D is a non-funnel event
        ([(0, "view"), (1, "click"), (2, "other"), (3, "purchase")], 2),
        # repeated entry step refreshes, never kills
        ([(0, "view"), (1, "view"), (2, "click"), (3, "purchase")], 3),
        # out-of-order step kills (click before purchase missing)
        ([(0, "view"), (1, "purchase"), (2, "click"), (3, "purchase")], 1),
        # pre-entry noise is ignored
        ([(0, "other"), (1, "click"), (2, "view"), (3, "click"), (4, "purchase")], 3),
        # tie: killer sorts before the step at the same ts (step 0 < k)
        ([(0, "view"), (5, "other"), (5, "click")], 1),
    ]
    for i, (evs, want) in enumerate(cases):
        df = _df(spark, [(f"u{i}", ts, et) for ts, et in evs])
        got = FU.funnel_max_step(
            df, "user", "ts", STEPS(), window, mode="strict_order"
        ).collect()[0]["max_step"]
        assert got == want, (i, evs, got, want)


def test_strict_dedup_corner_fixtures(spark):
    window = 1000
    three = STEPS()
    cases3 = [
        ([(0, "view"), (1, "click"), (2, "click"), (3, "purchase")], 2),
        # completion latches BEFORE a later duplicate
        ([(0, "view"), (1, "click"), (2, "purchase"), (3, "click")], 3),
        # repeated entry never interrupts
        ([(0, "view"), (1, "view"), (2, "click")], 2),
        # interleaved non-funnel events are ignored in this mode
        ([(0, "view"), (1, "other"), (2, "click"), (3, "purchase")], 3),
    ]
    for i, (evs, want) in enumerate(cases3):
        df = _df(spark, [(f"d{i}", ts, et) for ts, et in evs])
        got = FU.funnel_max_step(
            df, "user", "ts", three, window, mode="strict_deduplication"
        ).collect()[0]["max_step"]
        assert got == want, (i, evs, got, want)
    # 4-step: a mid-level repeat AFTER deeper progress returns the
    # repeat's index (2), discarding the reached depth 3 — the pinned
    # reference-implementation early return
    df = spark.createDataFrame(
        [("u", 0, 1), ("u", 1, 2), ("u", 2, 3), ("u", 3, 2)],
        "e string, ts long, s int",
    )
    steps4 = [F.col("s") == k for k in range(1, 5)]
    got = FU.funnel_max_step(
        df, "e", "ts", steps4, window, mode="strict_deduplication"
    ).collect()[0]["max_step"]
    assert got == 2


def test_strict_modes_vs_reference_randomized(spark):
    import random

    rng = random.Random(1234)
    n_steps, window = 3, 40
    rows, evs_by_entity = [], {}
    for case in range(80):
        entity = f"m{case}"
        evs = [(rng.randrange(0, 80), rng.randrange(0, n_steps + 1))
               for _ in range(rng.randrange(1, 14))]  # step 0 = no match
        evs_by_entity[entity] = evs
        rows += [(entity, ts, s) for ts, s in evs]
    df = spark.createDataFrame(rows, "e string, ts long, s int")
    steps = [F.col("s") == i for i in range(1, n_steps + 1)]
    for mode in (
        "strict_order",
        "strict_deduplication",
        "strict_order,strict_deduplication",
    ):
        got = {
            r["e"]: r["max_step"]
            for r in FU.funnel_max_step(
                df, "e", "ts", steps, window, mode=mode
            ).collect()
        }
        truth = {
            e: _ref_strict_scan(evs, n_steps, window, mode)
            for e, evs in evs_by_entity.items()
        }
        if mode == "strict_deduplication":
            # entities with zero matching events don't appear (pre-shuffle
            # filter retained in this mode); their truth is 0
            truth = {e: t for e, t in truth.items()
                     if any(s > 0 for _, s in evs_by_entity[e])}
        assert got == truth, mode


def test_strict_modes_sql_matches_operator(spark):
    import random

    from apache_pinot_spark.sqlfront import PinotEngine

    rng = random.Random(77)
    rows = []
    for case in range(40):
        for _ in range(rng.randrange(1, 12)):
            rows.append((f"q{case}", rng.randrange(0, 60), rng.randrange(0, 4)))
    df = spark.createDataFrame(rows, "e string, ts long, s int")
    eng = PinotEngine(spark)
    eng.register("funnel_events", df)
    steps = [F.col("s") == i for i in range(1, 4)]
    window = 25
    for mode in ("strict_order", "strict_deduplication",
                 "strict_order,strict_deduplication"):
        sql_got = {
            r["e"]: r["ms"]
            for r in eng.sql(
                f"SELECT e, FUNNEL_MAX_STEP(ts, {window}, 3, "
                f"s = 1, s = 2, s = 3, '{mode}') AS ms "
                f"FROM funnel_events GROUP BY e LIMIT 1000"
            ).collect()
        }
        op = {
            r["e"]: r["max_step"]
            for r in FU.funnel_max_step(
                df, "e", "ts", steps, window, mode=mode
            ).collect()
        }
        # SQL GROUP BY includes every entity; the operator omits
        # filtered-empty ones (their value is 0)
        for e, ms in sql_got.items():
            assert ms == op.get(e, 0), (mode, e)


def test_funnel_mode_validation_and_dispatch(spark):
    df = _df(spark, [("u", 0, "view"), ("u", 1, "click")])
    with pytest.raises(ValueError, match="funnel mode"):
        FU.funnel_max_step(df, "user", "ts", STEPS(), 10, mode="bogus")
    via_mode = FU.funnel_max_step(
        df, "user", "ts", STEPS(), 10, mode="strict_increase"
    ).collect()[0]["max_step"]
    direct = FU.funnel_max_step_strict_increase(
        df, "user", "ts", STEPS(), 10
    ).collect()[0]["max_step"]
    assert via_mode == direct == 2
    # the funnel-chart + completion forms accept the mode too
    chart = FU.funnel_count(
        df, "user", "ts", STEPS(), 10, mode="strict_order"
    ).collect()
    assert [(r["step"], r["entities"]) for r in chart] == [(1, 1), (2, 1), (3, 0)]


def test_strict_and_default_sql_ignore_null_timestamps(spark):
    """NULL-ts events contribute nothing in ANY SQL funnel mode — the
    DataFrame operator's pre-shuffle filter, mirrored (review finding:
    a null-ts struct used to poison the fold state)."""
    from apache_pinot_spark.sqlfront import PinotEngine

    rows = [("u", None, 1), ("u", 1, 1), ("u", 2, 2), ("u", 3, 3),
            ("v", None, 2), ("v", 1, 1), ("v", 2, 2)]
    df = spark.createDataFrame(rows, "e string, ts long, s int")
    eng = PinotEngine(spark)
    eng.register("nulls_f", df)
    for mode in ("", ", 'strict_order'", ", 'strict_deduplication'"):
        got = {
            r["e"]: r["ms"]
            for r in eng.sql(
                f"SELECT e, FUNNEL_MAX_STEP(ts, 1000, 3, s = 1, s = 2, s = 3"
                f"{mode}) AS ms FROM nulls_f GROUP BY e LIMIT 10"
            ).collect()
        }
        assert got == {"u": 3, "v": 2}, (mode, got)


def test_combined_strict_order_dedup_corner_fixtures(spark):
    """Hand-pinned interplay corners for the combined mode (round 7)."""
    window = 1000
    cases = [
        # dup latches (click repeat at level 2) before anything else
        ([(0, "view"), (1, "click"), (2, "click"), (3, "purchase")], 2),
        # order kill (non-funnel after entry) stops processing, so a
        # LATER duplicate cannot latch — plain level count wins
        ([(0, "view"), (1, "click"), (2, "other"), (3, "click")], 2),
        # completion latch freezes a later kill
        ([(0, "view"), (1, "click"), (2, "purchase"), (3, "other")], 3),
        # out-of-order step kills like pure strict_order
        ([(0, "view"), (1, "purchase"), (2, "click")], 1),
        # repeated entry refreshes, never kills or latches
        ([(0, "view"), (1, "view"), (2, "click"), (3, "purchase")], 3),
        # pre-entry noise ignored
        ([(0, "other"), (1, "view"), (2, "click"), (3, "purchase")], 3),
    ]
    for i, (evs, want) in enumerate(cases):
        df = _df(spark, [(f"c{i}", ts, et) for ts, et in evs])
        got = FU.funnel_max_step(
            df, "user", "ts", STEPS(), window,
            mode="strict_order,strict_deduplication",
        ).collect()[0]["max_step"]
        assert got == want, (i, evs, got, want)


def test_combined_mode_flag_forms_and_rejections(spark):
    import pytest as _pt

    df = _df(spark, [("u", 0, "view")])
    # separator forms all normalize
    for m in ("strict_order,strict_deduplication",
              "strict_deduplication + strict_order",
              "STRICT_ORDER strict_deduplication",
              "strict_increase,strict_order",
              "strict_increase + strict_deduplication",
              "strict_increase strict_order strict_deduplication"):
        got = FU.funnel_max_step(df, "user", "ts", STEPS(), 10, mode=m)
        assert got.collect()[0]["max_step"] == 1
    with _pt.raises(ValueError, match="not in"):
        FU.funnel_max_step(df, "user", "ts", STEPS(), 10, mode="strictest")


# --------------------------------------------------------------------------
# strict_increase combinations (round 7): the Pareto-frontier scan with
# the kill/latch rules composed in — corner fixtures + a randomized
# differential against an UNPRUNED all-chain-states reference (which is
# exactly the pruning-soundness argument the implementation relies on).
# --------------------------------------------------------------------------


def _ref_increase_scan(events, n_steps, window_ms, flags):
    """UNPRUNED strict_increase reference: keeps EVERY reachable
    (start, last) chain state per level (no Pareto dominance pruning),
    applying the same pinned rule order — entry, dedup latch, order
    kill, extension (+ full-depth latch when dedup is on). events:
    (ts, step) pairs, step 0 = matches nothing (only meaningful with
    strict_order)."""
    order_on = "strict_order" in flags
    dedup_on = "strict_deduplication" in flags
    levels = [set() for _ in range(n_steps)]
    entered = False
    for ts, st in sorted(events):
        if st == 0:
            if order_on and entered:
                break
            continue
        if st == 1:
            levels[0].add((ts, ts))
            entered = True
            continue
        if dedup_on and levels[st - 1]:
            return st
        if order_on and entered and not levels[st - 2]:
            break
        new = {(s, ts) for (s, l) in levels[st - 2]
               if ts - s <= window_ms and ts > l}
        levels[st - 1] |= new
        if dedup_on and new and st == n_steps:
            return n_steps
    for i in reversed(range(n_steps)):
        if levels[i]:
            return i + 1
    return 0


def test_strict_increase_order_corner_fixtures(spark):
    window = 1000
    cases = [
        # tie at purchase: strict increase refuses ts == last (order
        # alone would allow the tie-chain to level 3)
        ([(0, "view"), (1, "click"), (1, "purchase")], 2),
        # out-of-order step kills after entry
        ([(0, "view"), (1, "purchase"), (2, "click")], 1),
        # non-funnel event after entry kills
        ([(0, "view"), (1, "other"), (2, "click")], 1),
        # the Pareto counter-example still resolves with order on:
        # B@5 is a VALID in-order step-2 event (level 1 reached), and
        # C@5 chains off the kept (0, 3) pair
        ([(0, "view"), (3, "click"), (5, "click"), (5, "purchase")], 3),
        # pre-entry noise ignored
        ([(0, "other"), (1, "view"), (2, "click"), (3, "purchase")], 3),
    ]
    for i, (evs, want) in enumerate(cases):
        df = _df(spark, [(f"io{i}", ts, et) for ts, et in evs])
        got = FU.funnel_max_step(
            df, "user", "ts", STEPS(), window,
            mode="strict_increase,strict_order",
        ).collect()[0]["max_step"]
        assert got == want, (i, evs, got, want)


def test_strict_increase_dedup_corner_fixtures(spark):
    window = 1000
    cases = [
        # tie-click never reaches level 2, so the second click is the
        # FIRST real extension, and the third latches as a dup
        ([(0, "view"), (0, "click"), (1, "click"), (2, "click")], 2),
        # completion latches at 3 before the later duplicate
        ([(0, "view"), (1, "click"), (2, "purchase"), (3, "click")], 3),
        # plain dup interrupt at level 2
        ([(0, "view"), (1, "click"), (2, "click")], 2),
        # repeated entry never interrupts
        ([(0, "view"), (1, "view"), (2, "click")], 2),
        # non-funnel events ignored in this mode
        ([(0, "view"), (1, "other"), (2, "click"), (3, "purchase")], 3),
    ]
    for i, (evs, want) in enumerate(cases):
        df = _df(spark, [(f"id{i}", ts, et) for ts, et in evs])
        got = FU.funnel_max_step(
            df, "user", "ts", STEPS(), window,
            mode="strict_increase,strict_deduplication",
        ).collect()[0]["max_step"]
        assert got == want, (i, evs, got, want)


def test_strict_increase_all_three_corner_fixtures(spark):
    window = 1000
    cases = [
        # order kill at 'other' stops processing BEFORE the dup latch
        ([(0, "view"), (1, "click"), (2, "other"), (3, "click")], 2),
        # dedup+increase alone would latch 2 here; order's kill fires
        # first on the out-of-order purchase (click unreached)
        ([(0, "view"), (1, "purchase"), (2, "click"), (3, "click")], 1),
        # completion latch freezes the later kill
        ([(0, "view"), (1, "click"), (2, "purchase"), (3, "other")], 3),
        # tie-chain refused by increase, then dup latch on the repeat
        ([(0, "view"), (0, "click"), (1, "click"), (2, "click")], 2),
    ]
    for i, (evs, want) in enumerate(cases):
        df = _df(spark, [(f"ia{i}", ts, et) for ts, et in evs])
        got = FU.funnel_max_step(
            df, "user", "ts", STEPS(), window,
            mode="strict_increase,strict_order,strict_deduplication",
        ).collect()[0]["max_step"]
        assert got == want, (i, evs, got, want)


def test_strict_increase_combos_vs_unpruned_reference_randomized(spark):
    import random

    rng = random.Random(4242)
    n_steps, window = 3, 40
    rows, evs_by_entity = [], {}
    for case in range(80):
        entity = f"x{case}"
        evs = [(rng.randrange(0, 80), rng.randrange(0, n_steps + 1))
               for _ in range(rng.randrange(1, 14))]
        evs_by_entity[entity] = evs
        rows += [(entity, ts, s) for ts, s in evs]
    df = spark.createDataFrame(rows, "e string, ts long, s int")
    steps = [F.col("s") == i for i in range(1, n_steps + 1)]
    for mode in (
        "strict_increase",
        "strict_increase,strict_order",
        "strict_increase,strict_deduplication",
        "strict_increase,strict_order,strict_deduplication",
    ):
        flags = set(mode.split(","))
        got = {
            r["e"]: r["max_step"]
            for r in FU.funnel_max_step(
                df, "e", "ts", steps, window, mode=mode
            ).collect()
        }
        truth = {
            e: _ref_increase_scan(evs, n_steps, window, flags)
            for e, evs in evs_by_entity.items()
        }
        if "strict_order" not in flags:
            # entities with zero matching events don't appear (the
            # pre-shuffle filter stays when order is off); truth is 0
            truth = {e: t for e, t in truth.items()
                     if any(s > 0 for _, s in evs_by_entity[e])}
        assert got == truth, mode


def test_strict_increase_sql_matches_operator(spark):
    """The SQL form (Arrow grouped-agg UDF) agrees with the DataFrame
    Pareto-frontier operator for every strict_increase mode set, on
    randomized histories including non-matching (step-0) traffic."""
    import random

    from apache_pinot_spark.sqlfront import PinotEngine

    rng = random.Random(9090)
    rows = []
    for case in range(40):
        for _ in range(rng.randrange(1, 12)):
            rows.append((f"s{case}", rng.randrange(0, 60), rng.randrange(0, 4)))
    df = spark.createDataFrame(rows, "e string, ts long, s int")
    steps = [F.col("s") == i for i in range(1, 4)]
    eng = PinotEngine(spark)
    eng.register("si_ev", df)
    for mode in (
        "strict_increase",
        "strict_increase,strict_order",
        "strict_increase,strict_deduplication",
        "strict_increase,strict_order,strict_deduplication",
    ):
        sql_got = {
            r["e"]: r["ms"]
            for r in eng.sql(
                f"SELECT e, FUNNEL_MAX_STEP(ts, 40, 3, s = 1, s = 2, s = 3, "
                f"'{mode}') AS ms FROM si_ev GROUP BY e LIMIT 100"
            ).collect()
        }
        op = {
            r["e"]: r["max_step"]
            for r in FU.funnel_max_step(
                df, "e", "ts", steps, 40, mode=mode
            ).collect()
        }
        # SQL GROUP BY includes every entity; the operator omits
        # filtered-empty ones (their value is 0)
        for e, ms in sql_got.items():
            assert ms == op.get(e, 0), (mode, e)
        assert len(sql_got) == 40


def test_strict_increase_sql_null_ts_and_envelope(spark):
    from apache_pinot_spark.sqlfront import PinotEngine

    rows = [("u", None, 1), ("u", 1, 1), ("u", 2, 2), ("u", 3, 3)]
    df = spark.createDataFrame(rows, "e string, ts long, s int")
    eng = PinotEngine(spark)
    eng.register("si_nulls", df)
    env = eng.query(
        "SELECT e, FUNNEL_MAX_STEP(ts, 1000, 3, s = 1, s = 2, s = 3, "
        "'strict_increase') AS ms FROM si_nulls GROUP BY e LIMIT 10"
    )
    assert env["exceptions"] == []
    assert env["resultTable"]["rows"] == [["u", 3]]
