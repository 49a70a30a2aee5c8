"""Driver-gate queries for the round-6 operator families that were
previously pytest-only: funnel, upsert, gapfill, windowed top-k, the
statistical-moment pack, and geospatial radius — each now hash-checked
against a DuckDB oracle by the driver's 50-query correctness window.

Determinism rules follow querysuite's module docstring: exact integer /
decimal aggregation wherever a value crosses the hash comparison, double
math only as a final identical-expression step (+,-,*,/,sqrt are
correctly rounded in IEEE-754, so identical expression trees produce
bit-identical results on both engines), epoch-millis integers instead of
raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.querysuite import df_query

_DAY_MS = 86_400_000
# events span 2024-01-01 .. 2024-01-30 (TESTDATA.md); the gapfill grid
# deliberately extends one empty day past the data so trailing buckets
# exercise the fill modes too.
_GF_START_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
_GF_END_MS = 1_706_745_600_000  # 2024-02-01T00:00:00Z


def _events(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["events"])["events"]


# --------------------------------------------------------------------------
# Funnel — FUNNELMAXSTEP default mode (operators/funnel.py): deepest step
# per user for view -> click -> purchase within a 6 h window, then the
# distribution of depths. The operator's single-scan chain DP computes
# "max k such that a ts-non-decreasing chain with span <= window exists"
# (validated against an exhaustive-search oracle in tests/test_funnel_topk
# .py); the DuckDB oracle states that EXISTS semantics directly. Both
# sides compare chain order at millisecond precision (the operator's
# normalized time unit).
# --------------------------------------------------------------------------

_FUNNEL_WINDOW_MS = 6 * 3600 * 1000
_FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_depths(spark: SparkSession, sf_dir: str):
    # round 8: the slot covers a strict mode too — default (chain DP vs
    # the EXISTS-chain oracle) UNION strict_order+strict_deduplication
    # (single-scan state machine vs a DuckDB list_reduce fold of the SAME
    # pinned rules), tagged by mode.
    from apache_pinot_spark.operators.funnel import funnel_max_step

    ev = _events(spark, sf_dir)
    steps = [F.col("event_type") == t for t in _FUNNEL_STEPS]

    def depths(mode: str, tag: str):
        ms = funnel_max_step(
            ev, "user_id", "ts", steps, _FUNNEL_WINDOW_MS, mode=mode
        )
        return ms.groupBy("max_step").agg(F.count("*").alias("users")).select(
            F.lit(tag).alias("mode"), "max_step", "users"
        )

    return (
        depths("default", "default")
        .unionByName(depths("strict_order+strict_deduplication", "strict_od"))
        .orderBy("mode", "max_step")
    )


def _strict_od_oracle_fragment() -> str:
    """strict_order + strict_deduplication as a DuckDB list_reduce fold —
    the SAME per-event state machine operators/funnel.py pins (entry
    refresh, dedup latch before order kill, kill stops later latches,
    latch freezes later kills). list_reduce seeds from the first element,
    so a neutral init state is prepended and events are wrapped in the
    same struct type (state fields null)."""
    w = _FUNNEL_WINDOW_MS
    s1, s2, s3 = _FUNNEL_STEPS
    state0 = (
        "{'ts': CAST(NULL AS BIGINT), 'st': CAST(NULL AS INT), "
        "'lv1': CAST(NULL AS BIGINT), 'lv2': CAST(NULL AS BIGINT), "
        "'lv3': CAST(NULL AS BIGINT), 'fst': false, 'dead': false, "
        "'ret': CAST(NULL AS INT)}"
    )
    frozen = "(a.dead OR a.ret IS NOT NULL)"
    lvst = "(CASE e.st WHEN 2 THEN a.lv2 WHEN 3 THEN a.lv3 END)"
    lvprev = "(CASE e.st WHEN 2 THEN a.lv1 WHEN 3 THEN a.lv2 END)"
    dup = f"(e.st > 1 AND {lvst} IS NOT NULL)"
    ext = f"(e.st > 1 AND NOT {dup} AND {lvprev} IS NOT NULL AND e.ts - {lvprev} <= {w})"
    body = f"""{{
      'ts': CAST(NULL AS BIGINT), 'st': CAST(NULL AS INT),
      'lv1': CASE WHEN {frozen} THEN a.lv1 WHEN e.st = 1 THEN e.ts ELSE a.lv1 END,
      'lv2': CASE WHEN {frozen} THEN a.lv2 WHEN e.st = 2 AND {ext} THEN a.lv1 ELSE a.lv2 END,
      'lv3': CASE WHEN {frozen} THEN a.lv3 WHEN e.st = 3 AND {ext} THEN a.lv2 ELSE a.lv3 END,
      'fst': a.fst OR (NOT {frozen} AND e.st = 1),
      'dead': a.dead OR (NOT {frozen} AND NOT {dup} AND a.fst
                         AND (e.st = 0 OR (e.st > 1 AND {lvprev} IS NULL))),
      'ret': CASE WHEN a.ret IS NOT NULL THEN a.ret WHEN a.dead THEN CAST(NULL AS INT)
                  WHEN {dup} THEN e.st
                  WHEN {ext} AND e.st = 3 THEN 3 ELSE CAST(NULL AS INT) END
    }}"""
    return f"""
    sev AS (
      SELECT user_id, epoch_ms(ts) AS ts,
             CASE event_type WHEN '{s1}' THEN 1 WHEN '{s2}' THEN 2
                             WHEN '{s3}' THEN 3 ELSE 0 END AS st
      FROM events
    ),
    sevs AS (
      SELECT user_id,
             list_prepend({state0},
               list_transform(list((ts, st) ORDER BY ts, st),
                 e -> {{'ts': e[1], 'st': CAST(e[2] AS INT),
                       'lv1': CAST(NULL AS BIGINT), 'lv2': CAST(NULL AS BIGINT),
                       'lv3': CAST(NULL AS BIGINT), 'fst': false, 'dead': false,
                       'ret': CAST(NULL AS INT)}})) AS l
      FROM sev GROUP BY user_id
    ),
    sfold AS (
      SELECT user_id, list_reduce(l, (a, e) -> {body}) AS s FROM sevs
    ),
    sdepth AS (
      SELECT COALESCE(s.ret,
               CASE WHEN s.lv3 IS NOT NULL THEN 3 WHEN s.lv2 IS NOT NULL THEN 2
                    WHEN s.lv1 IS NOT NULL THEN 1 ELSE 0 END) AS max_step,
             COUNT(*) AS users
      FROM sfold GROUP BY 1
    )"""


def _funnel_oracle() -> str:
    w = _FUNNEL_WINDOW_MS
    s1, s2, s3 = _FUNNEL_STEPS
    return f"""
    WITH fu AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('{s1}', '{s2}', '{s3}')
    ),
    f AS (
      SELECT u.user_id,
        CASE
          WHEN EXISTS (
            SELECT 1 FROM events e1, events e2, events e3
            WHERE e1.user_id = u.user_id AND e2.user_id = u.user_id
              AND e3.user_id = u.user_id
              AND e1.event_type = '{s1}' AND e2.event_type = '{s2}'
              AND e3.event_type = '{s3}'
              AND epoch_ms(e2.ts) >= epoch_ms(e1.ts)
              AND epoch_ms(e3.ts) >= epoch_ms(e2.ts)
              AND epoch_ms(e3.ts) - epoch_ms(e1.ts) <= {w}) THEN 3
          WHEN EXISTS (
            SELECT 1 FROM events e1, events e2
            WHERE e1.user_id = u.user_id AND e2.user_id = u.user_id
              AND e1.event_type = '{s1}' AND e2.event_type = '{s2}'
              AND epoch_ms(e2.ts) >= epoch_ms(e1.ts)
              AND epoch_ms(e2.ts) - epoch_ms(e1.ts) <= {w}) THEN 2
          WHEN EXISTS (
            SELECT 1 FROM events e1
            WHERE e1.user_id = u.user_id AND e1.event_type = '{s1}') THEN 1
          ELSE 0
        END AS max_step
      FROM fu u
    ),
    {_strict_od_oracle_fragment().lstrip()}
    SELECT 'default' AS mode, max_step, COUNT(*) AS users FROM f
    GROUP BY max_step
    UNION ALL
    SELECT 'strict_od' AS mode, max_step, users FROM sdepth
    ORDER BY mode, max_step
    """


df_query(
    "funnel_max_step_depths",
    _funnel_depths,
    _funnel_oracle(),
    tables=["events"],
    doc="FUNNELMAXSTEP default mode (chain DP vs the EXISTS-chain oracle) "
        "+ strict_order+strict_deduplication (single-scan state machine vs "
        "a DuckDB list_reduce fold of the same pinned rules) in one slot "
        "(operators/funnel.py; ClickHouse-pinned windowFunnel semantics)",
)

# --------------------------------------------------------------------------
# Upsert — FULL mode latest-record-per-key view (operators/upsert.py):
# per-user latest event by (ts, event_id), then the distribution of the
# winning records by event type. One pk shuffle via max_by(struct);
# the oracle is the classic row_number()-over-version window.
# --------------------------------------------------------------------------


def _upsert_latest(spark: SparkSession, sf_dir: str):
    from apache_pinot_spark.operators.upsert import UpsertConfig, full_upsert_view

    ev = _events(spark, sf_dir)
    cfg = UpsertConfig(
        primary_keys=["user_id"],
        mode="FULL",
        comparison_column="ts",
        sequence_column="event_id",
    )
    latest = full_upsert_view(ev, cfg)
    return (
        latest.groupBy("event_type")
        .agg(
            F.count("*").alias("winners"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


df_query(
    "upsert_full_latest",
    _upsert_latest,
    """
    WITH w AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type, COUNT(*) AS winners,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM w WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    tables=["events"],
    doc="Upsert FULL latest-record view (upsertConfig, operators/upsert.py) "
        "== row_number version window",
)

# --------------------------------------------------------------------------
# Gapfill — the public GAPFILL transformation (operators/gapfill.py):
# daily buckets per event_type over [2024-01-01, 2024-02-01) with a
# high-value filter so ~60 % of buckets are EMPTY; cnt uses
# FILL_DEFAULT_VALUE(0), sum_v uses FILL_PREVIOUS_VALUE (leading nulls
# stay null). The oracle densifies with generate_series + IGNORE NULLS
# last_value.
# --------------------------------------------------------------------------

_GF_MIN_VALUE = 240.0


def _gapfill_daily(spark: SparkSession, sf_dir: str):
    from apache_pinot_spark.operators.gapfill import gapfill

    ev = (
        _events(spark, sf_dir)
        .where(F.col("value") >= _GF_MIN_VALUE)
        .withColumn("ts_ms", F.unix_millis(F.col("ts").cast("timestamp")))
    )
    dense = gapfill(
        ev,
        "ts_ms",
        _DAY_MS,
        _GF_START_MS,
        _GF_END_MS,
        ["event_type"],
        {
            "cnt": F.count("*"),
            "sum_v": F.sum(F.col("value").cast("decimal(18,2)")),
        },
        fill={
            "cnt": ("FILL_DEFAULT_VALUE", 0),
            "sum_v": ("FILL_PREVIOUS_VALUE", None),
        },
    )
    return dense.select(
        "event_type",
        "bucket_ms_start",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("sum_v").cast("double").alias("sum_v"),
    ).orderBy("event_type", "bucket_ms_start")


df_query(
    "gapfill_daily_series",
    _gapfill_daily,
    f"""
    WITH src AS (
      SELECT event_type, epoch_ms(ts) AS ts_ms,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
      WHERE value >= {_GF_MIN_VALUE}
        AND epoch_ms(ts) >= {_GF_START_MS} AND epoch_ms(ts) < {_GF_END_MS}
    ),
    obs AS (
      SELECT event_type,
             CAST((ts_ms - {_GF_START_MS}) // {_DAY_MS} * {_DAY_MS}
                  + {_GF_START_MS} AS BIGINT) AS bucket_ms_start,
             COUNT(*) AS cnt, SUM(v) AS sum_v
      FROM src GROUP BY 1, 2
    ),
    grid AS (
      SELECT s.event_type, CAST(g.g AS BIGINT) AS bucket_ms_start
      FROM (SELECT DISTINCT event_type FROM src) s
      CROSS JOIN generate_series({_GF_START_MS}, {_GF_END_MS - 1},
                                 {_DAY_MS}) g(g)
    ),
    dense AS (
      SELECT grid.event_type, grid.bucket_ms_start,
             CAST(COALESCE(obs.cnt, 0) AS BIGINT) AS cnt, obs.sum_v
      FROM grid LEFT JOIN obs
        ON grid.event_type = obs.event_type
       AND grid.bucket_ms_start = obs.bucket_ms_start
    )
    SELECT event_type, bucket_ms_start, cnt,
           CAST(last_value(sum_v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket_ms_start
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS sum_v
    FROM dense ORDER BY event_type, bucket_ms_start
    """,
    tables=["events"],
    doc="GAPFILL daily densify: FILL_DEFAULT_VALUE(0) counts + "
        "FILL_PREVIOUS_VALUE carried sums (operators/gapfill.py)",
)

# --------------------------------------------------------------------------
# Windowed top-k — leaderboard shape (operators/topk.py): top 3 users per
# tumbling day by decimal-exact value sum, ties broken by user_id. Spark's
# tumbling windows align to the epoch, so day buckets equal
# floor(epoch_ms / DAY_MS) * DAY_MS.
# --------------------------------------------------------------------------


def _topk_daily(spark: SparkSession, sf_dir: str):
    from apache_pinot_spark.operators.topk import windowed_topk

    ev = _events(spark, sf_dir)
    tk = windowed_topk(
        ev, "ts", "1 day", ["user_id"],
        F.sum(F.col("value").cast("decimal(18,2)")), k=3,
    )
    # NTZ→LTZ cast is lossless: the engine pins the session to UTC
    # (catalog.load_tables), and unix_millis needs an LTZ input.
    return tk.select(
        F.unix_millis(F.col("window_start").cast("timestamp")).alias("day_ms"),
        "user_id",
        F.col("metric").cast("double").alias("sum_value"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("day_ms", "rank")


df_query(
    "topk_daily_users",
    _topk_daily,
    f"""
    WITH agg AS (
      SELECT CAST(epoch_ms(ts) // {_DAY_MS} * {_DAY_MS} AS BIGINT) AS day_ms,
             user_id, SUM(CAST(value AS DECIMAL(18,2))) AS m
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY day_ms ORDER BY m DESC, user_id) AS rank
      FROM agg
    )
    SELECT day_ms, user_id, CAST(m AS DOUBLE) AS sum_value,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3 ORDER BY day_ms, rank
    """,
    tables=["events"],
    doc="Windowed top-k (operators/topk.py): aggregate-then-rank, "
        "decimal-exact metric, deterministic key tiebreak",
)

# --------------------------------------------------------------------------
# Geospatial — planar ST_DISTANCE radius count (functions/geo.py,
# geometry semantics: euclidean in coordinate units). Points derive from
# event_id with exact integer arithmetic onto a 0.1 grid; R = 24.55 keeps
# the squared distance at least 0.0025 away from every achievable grid
# value (dist^2 is a multiple of 0.01 in exact arithmetic, R^2 = 602.7025),
# so membership is stable under last-ulp float differences between
# engines. The geography (haversine) path is pytest-covered
# (tests/test_geo.py) — trig libms differ across engines, so it stays off
# the hash gate.
# --------------------------------------------------------------------------

_GEO_R = 24.55
_GEO_CX, _GEO_CY = 50.0, 50.0


def _geo_radius(spark: SparkSession, sf_dir: str):
    from apache_pinot_spark.functions.geo import st_distance, st_point

    ev = _events(spark, sf_dir)
    pts = ev.select(
        "event_id",
        ((F.col("event_id") * 37 % 1000) / 10.0).alias("x"),
        ((F.col("event_id") * 91 % 1000) / 10.0).alias("y"),
    )
    d = st_distance(
        st_point(F.col("x"), F.col("y")),
        st_point(_GEO_CX, _GEO_CY),
        geography=False,
    )
    return pts.where(d <= _GEO_R).agg(
        F.count("*").alias("geo_cnt"),
        F.sum("event_id").alias("geo_sum_id"),
    )


_GEO_ORACLE_FRAGMENT = f"""
      SELECT COUNT(*) AS geo_cnt, CAST(SUM(event_id) AS BIGINT) AS geo_sum_id
      FROM (SELECT event_id,
                   (event_id * 37 % 1000) / 10.0 AS x,
                   (event_id * 91 % 1000) / 10.0 AS y
            FROM events) pts
      WHERE sqrt(pow(x - {_GEO_CX}, 2) + pow(y - {_GEO_CY}, 2)) <= {_GEO_R}
"""
# geo_radius_planar folded into stats_moment_pack (round 8) to free a
# driver-window slot; the ST_DISTANCE path and margin-safe radius design
# are unchanged (see _geo_radius docs above).

# --------------------------------------------------------------------------
# Statistical moment pack — the population central-moment family the
# dialect binds (VARIANCE/SKEWNESS/KURTOSIS/FOURTHMOMENT, tests/
# test_stats_aggs.py), served by functions/moments.exact_central_moments:
# l_quantity is integral, so the power sums are EXACT BIGINTs on both
# engines (max 50^4 * 6e5 = 3.75e12 < 2^53 < 2^63); the final double
# expression mirrors the oracle text operation-for-operation —
# +,-,*,/,sqrt are IEEE-correctly-rounded, so the hash compares
# bit-identical doubles. tests/test_stats_aggs.py ties the exact path to
# the dialect's float aggregates within tolerance.
# --------------------------------------------------------------------------


def _moment_pack(spark: SparkSession, sf_dir: str):
    # round 8: the geo radius query (previously its own slot,
    # geo_radius_planar) rides this single-row slot as two extra columns
    # (cross join of two one-row aggregates) — freeing a driver-window
    # slot for packing_ffd_bins; both fragments keep their full paths.
    from apache_pinot_spark.functions.moments import exact_central_moments

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    out = exact_central_moments(li, F.col("l_quantity"))
    return out.withColumnRenamed("mean", "mean_qty").crossJoin(
        _geo_radius(spark, sf_dir)
    )


df_query(
    "stats_moment_pack",
    _moment_pack,
    f"""
    WITH geo AS (
      {_GEO_ORACLE_FRAGMENT.strip()}
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS s1,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS s3,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
      FROM lineitem
    ),
    m AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM s
    )
    SELECT n,
           mu AS mean_qty,
           r2 - mu * mu AS var_pop,
           CASE WHEN r2 - mu * mu <> 0 THEN
             (r3 - 3 * mu * r2 + 2 * mu * mu * mu)
               / ((r2 - mu * mu) * sqrt(r2 - mu * mu)) END AS skew_pop,
           CASE WHEN r2 - mu * mu <> 0 THEN
             (r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu)
               / ((r2 - mu * mu) * (r2 - mu * mu)) END AS kurt_pop,
           r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
             AS fourth_moment,
           geo.geo_cnt, geo.geo_sum_id
    FROM m CROSS JOIN geo
    """,
    tables=["lineitem", "events"],
    doc="Population moment family (functions/moments.exact_central_moments; "
        "VARIANCE/SKEWNESS/KURTOSIS/FOURTHMOMENT conventions of "
        "tests/test_stats_aggs.py) from exact BIGINT power sums + the "
        "ST_DISTANCE planar radius membership columns (functions/geo.py; "
        "r8 fold of geo_radius_planar, margin-safe radius)",
)

# --------------------------------------------------------------------------
# Corpus curation — C4-style repeated-line boilerplate removal
# (operators/curation.remove_repeated_lines), promoted into the driver
# gate in round 8. The driver's documents are single-line word soup, so
# the query first derives a deterministic multi-line corpus (3 words per
# line — identical list-slice construction on both engines); with the
# small shared vocabulary, hundreds of 3-word lines recur across >= 3
# documents, so the removal is NON-vacuous (231 boilerplate lines at
# sf0.01). Output is the full cleaned text per document — the strongest
# hashable check of line counting, anti-join, and in-order reassembly.
# --------------------------------------------------------------------------

_CURATION_MIN_COUNT = 3


def _boilerplate_removal(spark: SparkSession, sf_dir: str):
    from apache_pinot_spark.operators.curation import remove_repeated_lines

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    # 3 words per line as ONE regex pass (leftmost non-overlapping, so
    # groups are exactly 3 words — identical RE semantics on both
    # engines; the transform+slice construction was O(words²) per doc)
    ml = docs.select(
        "doc_id",
        F.regexp_replace("text", r"(\S+ \S+ \S+) ", "$1\n").alias("text"),
    )
    cleaned = remove_repeated_lines(
        ml, min_count=_CURATION_MIN_COUNT
    )
    return cleaned.select(
        "doc_id",
        F.col("text").alias("text_clean"),
        F.length("text").alias("clean_chars"),
    ).orderBy("doc_id")


df_query(
    "curation_boilerplate_removal",
    _boilerplate_removal,
    f"""
    WITH src AS (
      SELECT doc_id,
             regexp_replace(text, '(\\S+ \\S+ \\S+) ', '\\1' || chr(10), 'g') AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id,
             CAST(generate_subscripts(string_split(text, chr(10)), 1) AS INT) AS pos,
             unnest(string_split(text, chr(10))) AS ln
      FROM src
    ),
    freq AS (
      SELECT lower(trim(ln)) AS key
      FROM (SELECT DISTINCT doc_id, lower(trim(ln)) AS ln FROM lines
            WHERE length(trim(ln)) >= 1) d(doc_id, ln)
      GROUP BY 1 HAVING COUNT(*) >= {_CURATION_MIN_COUNT}
    ),
    kept AS (
      SELECT l.doc_id, l.pos, l.ln FROM lines l
      WHERE length(trim(l.ln)) < 1
         OR lower(trim(l.ln)) NOT IN (SELECT key FROM freq)
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text_clean
      FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id, COALESCE(r.text_clean, '') AS text_clean,
           CAST(length(COALESCE(r.text_clean, '')) AS INT) AS clean_chars
    FROM src s LEFT JOIN rebuilt r ON r.doc_id = s.doc_id
    ORDER BY s.doc_id
    """,
    tables=["documents"],
    doc="C4-style repeated-line boilerplate removal "
        "(operators/curation.remove_repeated_lines): document-frequency "
        "line counting, broadcast anti-join, in-order reassembly — full "
        "cleaned text hash-checked against the DuckDB doc-frequency oracle",
)

# --------------------------------------------------------------------------
# Sequence packing — per-partition first-fit-decreasing
# (operators/packing.assign_packs), promoted into the driver gate in
# round 8. The gate query pins the ALGORITHM: partitions=1 makes the
# whole corpus one deterministic FFD stream (sort by n_chars DESC,
# doc_id), which a DuckDB RECURSIVE CTE reproduces bin-for-bin (the
# open-bin list rides the recursion as a LIST<STRUCT> column). The
# many-partition scale path (hash repartition, bounded open-bin state)
# keeps its determinism + exact-FFD-reference coverage in
# tests/test_packing.py. Budget 500 sits inside the n_chars range
# (48..553), so the slot also exercises oversize flagging.
# --------------------------------------------------------------------------

_PACK_CAP = 500


def _packing_bins(spark: SparkSession, sf_dir: str):
    from apache_pinot_spark.operators.packing import assign_packs

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    packed = assign_packs(
        docs.select("doc_id", "n_chars"),
        count_col="n_chars",
        max_units=_PACK_CAP,
        key_col="doc_id",
        partitions=1,
        open_bins=1_000_000,  # pure FFD: the oracle has no eviction rule
    )
    return packed.select("doc_id", "pack_id", "pack_offset", "oversize").orderBy(
        "doc_id"
    )


def _packing_oracle() -> str:
    cap = _PACK_CAP
    pos = "list_position(list_transform(f.bins, b -> b.rem >= d.cnt), true)"
    return f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ),
    fit AS (
      SELECT CAST(0 AS BIGINT) AS rn,
             CAST([] AS STRUCT(rem BIGINT, idx INT)[]) AS bins,
             0 AS nxt,
             CAST([] AS STRUCT(doc_id BIGINT, bin INT, off BIGINT, over BOOLEAN)[]) AS asg
      UNION ALL
      SELECT d.rn,
        CASE WHEN d.cnt > {cap} THEN f.bins
          WHEN {pos} > 0 THEN
            f.bins[1:{pos}-1]
            || [{{'rem': f.bins[{pos}].rem - d.cnt, 'idx': f.bins[{pos}].idx}}]
            || f.bins[{pos}+1:]
          ELSE list_append(f.bins, {{'rem': CAST({cap} AS BIGINT) - d.cnt, 'idx': f.nxt}}) END,
        CASE WHEN d.cnt > {cap} OR {pos} = 0 THEN f.nxt + 1 ELSE f.nxt END,
        list_append(f.asg, CASE
          WHEN d.cnt > {cap} THEN
            {{'doc_id': d.doc_id, 'bin': f.nxt, 'off': CAST(0 AS BIGINT), 'over': true}}
          WHEN {pos} > 0 THEN
            {{'doc_id': d.doc_id, 'bin': f.bins[{pos}].idx,
              'off': CAST({cap} AS BIGINT) - f.bins[{pos}].rem, 'over': false}}
          ELSE {{'doc_id': d.doc_id, 'bin': f.nxt, 'off': CAST(0 AS BIGINT), 'over': false}}
        END)
      FROM fit f JOIN docs d ON d.rn = f.rn + 1
    ),
    last AS (SELECT asg FROM fit ORDER BY rn DESC LIMIT 1),
    flat AS (SELECT unnest(asg) AS a FROM last)
    SELECT a.doc_id AS doc_id, '0-' || a.bin AS pack_id,
           a.off AS pack_offset, a.over AS oversize
    FROM flat ORDER BY doc_id
    """


df_query(
    "packing_ffd_bins",
    _packing_bins,
    _packing_oracle(),
    tables=["documents"],
    doc="Sequence packing by first-fit-decreasing "
        "(operators/packing.assign_packs, partitions=1): per-document "
        "pack id / offset / oversize flag vs a DuckDB RECURSIVE-CTE FFD "
        "simulation (open-bin list as LIST<STRUCT> recursion state)",
)
