"""Funnel analysis — windowed multi-step conversion over an event
stream, aggregation-native.

The reference docs mirror does not cover funnels, but the public system
ships a funnel family (FUNNEL_MAX_STEP / FUNNEL_MATCH_STEP /
FUNNEL_COMPLETE_COUNT / FUNNEL_COUNT: per correlation id, how deep into
an ordered list of step predicates did the id get within a time
window). The windowed-funnel semantics implemented here are the
industry-standard ones those functions share (also ClickHouse's
windowFunnel): max step k such that some chain of events e1 ≤ … ≤ ek
exists where e_i matches step i, events are in timestamp order, and
ts(e_k) − ts(e_1) ≤ window.

Spark mapping (scale-first):

  * Step matching is a map-side projection: each event is tested
    against every step predicate and NON-MATCHING EVENTS ARE DROPPED
    BEFORE THE SHUFFLE — at 100 TB the shuffle carries only the funnel
    events (typically a tiny fraction), as slim (entity, ts, step)
    rows.
  * One shuffle on the entity: collect_list of (ts, step) structs with
    map-side partial aggregation, array_sort, then a linear
    F.aggregate fold computing the chain DP entirely JVM-side (the
    lambda state is an array of chain-start timestamps, one per
    level — no Python, no explosion of the expression tree: lambda
    variables are referenced, not re-embedded).
  * Per-entity state is O(n_steps); per-entity event lists are bounded
    by that entity's funnel-event count. Entities hot enough to
    overflow a task should be pre-capped with `max_events_per_entity`
    (keeps the EARLIEST events — funnels measure first conversion).

Mode notes: the JVM fold implements the default ("any other events in
between are ignored") windowed-funnel mode. The chain-start timestamp
for level 1 advances to the latest step-1 event seen, which is exactly
right for this mode: a later entry event can only widen the window for
later steps, and already-reached deeper levels are never unset.
STRICT_INCREASE (chain timestamps strictly increasing) is implemented
EXACTLY in funnel_max_step_strict_increase via per-level Pareto
frontiers (single-chain greedy state is provably wrong there — see its
docstring).

strict_order / strict_deduplication (round 6) pin ClickHouse's
documented windowFunnel modes — the public semantics Pinot's funnel
settings mirror — as single-scan state machines (the modes are
operational: one pass over the time-ordered events, deterministic
scalar state, so a JVM fold is exact; no frontier needed):

  * strict_order — interleaving breaks the funnel. Once a step-1 event
    has been seen, ANY event that is not the next expected step kills
    further progress: a non-matching event ("A→B→D→C stops at D, level
    2" per the ClickHouse docs), or a step event whose previous level
    is unreached. Two pinned corners from the reference scan order:
    a repeated step-1 event only refreshes the chain start (it never
    kills — the entry-step branch precedes the kill checks), and at
    equal timestamps the non-matching event sorts first (events sort
    by (ts, step) with non-matches as step 0, matching the reference's
    (timestamp, cond-index) pair sort). This mode is
    interleaving-sensitive BY DEFINITION, so the pre-shuffle
    funnel-event filter cannot apply: all events of the stream shuffle
    as slim (entity, ts, step-or-0) rows — the documented cost of
    asking for it.
  * strict_deduplication — a repeated condition interrupts processing:
    when an event matches step k (k > 1) and level k is already
    reached, the scan stops and the funnel value IS k — even if deeper
    levels had already been reached (the reference implementation
    returns the repeat's own step index; completing the last step
    returns immediately, which this fold mirrors by latching the
    result at full depth). A repeated step-1 event never interrupts
    (entry-branch precedence again). Non-matching events are ignored,
    so the pre-shuffle filter stays.

Both modes are verified against an independent pure-Python reference
scan on randomized histories plus hand-pinned corner fixtures
(tests/test_funnel_topk.py).

strict_order + strict_deduplication COMBINE (round 7, the ClickHouse
multi-flag form): both rule sets apply in one scan — dedup's latch is
checked before order's kill (consistent by construction: a reached
level implies its predecessor was reached), a kill stops processing so
later duplicates cannot latch, a latch freezes later kills. Mode flags
separate with ','/'+'/whitespace.

strict_increase ALSO combines with either/both (round 7): the pinned
semantics run the SAME operational scan, with two observations that
make the composition exact rather than ad hoc:

  * The kill and latch rules depend only on whether a level is REACHED
    (some valid chain ends there), never on which chain — and Pareto
    pruning preserves reached-ness exactly (a dominated (start, last)
    pair extends only when its dominator does: start' >= start wins
    the window check, last' <= last wins the strict-increase check).
    So order's "previous level unreached → kill" and dedup's "level
    already reached → latch its index" read frontier non-emptiness.
  * Extension swaps the single-chain rule for the frontier rule
    (ts − start ≤ window AND ts > last, over the snapshot of the
    previous level's frontier); completing the last step latches at n
    only when strict_deduplication is on (without it, reaching n is
    terminal for max-step anyway — a latch would be unobservable).

Rule order per event is unchanged from the fixed-state combination:
entry step first (refreshes, never kills or latches), then dedup's
latch, then order's kill, then extension. Verified against an
UNPRUNED all-chain-states reference scan on randomized histories
(tests/test_funnel_topk.py) — that differential exercises exactly the
pruning-soundness argument above.
"""

from __future__ import annotations

import re

import pandas as pd  # module-level: pandas_udf type-hint inference resolves 'pd.Series'
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _matched_events(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: list[Column],
    max_events_per_entity: int | None,
    keep_unmatched: bool = False,
) -> DataFrame:
    """(entity, ts_ms, step) rows for funnel events only — the map-side
    filter that keeps non-funnel traffic out of the shuffle. An event
    matching several steps yields one row per matched step (each
    predicate is evaluated independently, as in the public funnel
    functions). ``keep_unmatched`` (strict_order mode only) emits
    non-matching events as step 0 instead of dropping them — the mode's
    semantics make interleaved traffic significant, so it must ride the
    shuffle."""
    from pyspark.sql import types as T

    dt = df.schema[ts_col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # NTZ→LTZ cast is lossless here: the engine pins the session to
        # UTC (catalog.load_tables), and unix_millis needs an LTZ input.
        ts = F.unix_millis(F.col(ts_col).cast("timestamp"))
    elif isinstance(dt, T.NumericType):
        ts = F.col(ts_col).cast("long")  # caller's epoch-ms (engine norm)
    else:
        raise TypeError(f"funnel ts column {ts_col!r} must be timestamp or epoch-ms, got {dt}")
    tagged = df.select(
        F.col(entity_col).alias("__entity"),
        ts.alias("__ts"),
        F.filter(
            F.array(*[F.when(p, F.lit(i + 1)) for i, p in enumerate(steps)]),
            lambda s: s.isNotNull(),
        ).alias("__steps"),
    ).where(F.col("__ts").isNotNull())
    if keep_unmatched:
        tagged = tagged.withColumn(
            "__steps",
            F.when(F.size("__steps") > 0, F.col("__steps")).otherwise(
                F.array(F.lit(0))
            ),
        )
    else:
        tagged = tagged.where(F.size("__steps") > 0)
    out = tagged.select("__entity", "__ts", F.explode("__steps").alias("__step"))
    if max_events_per_entity is not None:
        # Bounded per-entity state for pathological hot entities: keep the
        # earliest events (first-conversion semantics). Costs one extra
        # shuffle (window rank) — opt-in.
        from pyspark.sql import Window

        w = Window.partitionBy("__entity").orderBy("__ts", "__step")
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_events_per_entity)
            .drop("__rn")
        )
    return out


def _fold_max_step(n_steps: int, window_ms: int) -> Column:
    """The chain DP as a JVM fold over the per-entity sorted event array
    (column name `__evs`): state[i] = chain-start timestamp for level
    i+1 (null = unreached). Levels form a non-null prefix, so max step
    is the count of non-null entries."""
    init = F.array(*[F.lit(None).cast("long") for _ in range(n_steps)])
    state = F.aggregate(
        F.col("__evs"),
        init,
        lambda acc, e: F.transform(
            acc,
            lambda v, i: F.when(
                e["__step"] == i + 1,
                F.when(i == 0, e["__ts"]).otherwise(
                    # F.get is 0-based and null-safe: previous level's
                    # chain start, null at level 0 (branch above) or if
                    # the previous level is unreached.
                    F.when(
                        (e["__ts"] - F.get(acc, i - 1)) <= window_ms,
                        F.get(acc, i - 1),
                    ).otherwise(v)
                ),
            ).otherwise(v),
        ),
    )
    return F.size(F.filter(state, lambda v: v.isNotNull()))


def _fold_strict_order(n_steps: int, window_ms: int) -> Column:
    """strict_order single-scan state machine as a JVM fold over `__evs`
    (which includes step-0 rows for non-matching events): state =
    (level chain-starts, entered?, dead?). See module docstring for the
    pinned rules."""
    init = F.struct(
        F.array(*[F.lit(None).cast("long") for _ in range(n_steps)]).alias("lv"),
        F.lit(False).alias("fst"),
        F.lit(False).alias("dead"),
    )

    def step(acc, e):
        st, ts = e["__step"], e["__ts"]
        lv = acc["lv"]
        dead2 = acc["dead"] | (
            acc["fst"]
            & ((st == 0) | ((st > 1) & F.get(lv, st - 2).isNull()))
        )
        lv2 = F.transform(
            lv,
            lambda v, i: F.when(acc["dead"], v)
            .when((st == 1) & (i == 0), ts)
            .when(
                (st == i + 1)
                & (i > 0)
                & F.get(lv, i - 1).isNotNull()
                & ((ts - F.get(lv, i - 1)) <= window_ms),
                F.get(lv, i - 1),
            )
            .otherwise(v),
        )
        return F.struct(
            lv2.alias("lv"),
            (acc["fst"] | (st == 1)).alias("fst"),
            dead2.alias("dead"),
        )

    state = F.aggregate(F.col("__evs"), init, step)
    return F.size(F.filter(state["lv"], lambda v: v.isNotNull()))


def _fold_strict_order_dedup(n_steps: int, window_ms: int) -> Column:
    """Combined strict_order + strict_deduplication (round 7): both
    rule sets applied in one scan, composing the two pinned single-mode
    semantics in event order — a non-matching event after entry KILLS
    (order), a repeated condition LATCHES the result at its own index
    (dedup; checked before the order kill, which is consistent: a
    reached level implies its predecessor was reached), completing the
    last step latches at n. A kill stops processing, so a duplicate
    after the kill cannot latch; a latch freezes everything including
    later kills. state = (level chain-starts, entered?, dead?, ret)."""
    init = F.struct(
        F.array(*[F.lit(None).cast("long") for _ in range(n_steps)]).alias("lv"),
        F.lit(False).alias("fst"),
        F.lit(False).alias("dead"),
        F.lit(None).cast("int").alias("ret"),
    )

    def step(acc, e):
        st, ts = e["__step"], e["__ts"]
        lv = acc["lv"]
        frozen = acc["dead"] | acc["ret"].isNotNull()
        dup = (st > 1) & F.get(lv, st - 1).isNotNull()
        ext_ok = (
            (st > 1)
            & ~dup
            & F.get(lv, st - 2).isNotNull()
            & ((ts - F.get(lv, st - 2)) <= window_ms)
        )
        ret2 = (
            F.when(acc["ret"].isNotNull(), acc["ret"])
            .when(acc["dead"], F.lit(None).cast("int"))
            .when(dup, st.cast("int"))
            .when(ext_ok & (st == n_steps), F.lit(n_steps))
            .otherwise(F.lit(None).cast("int"))
        )
        dead2 = acc["dead"] | (
            ~frozen
            & ~dup
            & acc["fst"]
            & ((st == 0) | ((st > 1) & F.get(lv, st - 2).isNull()))
        )
        lv2 = F.transform(
            lv,
            lambda v, i: F.when(frozen, v)
            .when((st == 1) & (i == 0), ts)
            .when((st == i + 1) & (i > 0) & ext_ok, F.get(lv, i - 1))
            .otherwise(v),
        )
        return F.struct(
            lv2.alias("lv"),
            (acc["fst"] | (~frozen & (st == 1))).alias("fst"),
            dead2.alias("dead"),
            ret2.alias("ret"),
        )

    state = F.aggregate(F.col("__evs"), init, step)
    return F.coalesce(
        state["ret"], F.size(F.filter(state["lv"], lambda v: v.isNotNull()))
    )


def _fold_strict_dedup(n_steps: int, window_ms: int) -> Column:
    """strict_deduplication single-scan fold: a repeated condition
    (k > 1, level k already reached) latches the result at k; completing
    the last step latches at n (the reference returns immediately in
    both cases — the latch freezes all later state changes)."""
    init = F.struct(
        F.array(*[F.lit(None).cast("long") for _ in range(n_steps)]).alias("lv"),
        F.lit(None).cast("int").alias("ret"),
    )

    def step(acc, e):
        st, ts = e["__step"], e["__ts"]
        lv, done = acc["lv"], acc["ret"].isNotNull()
        dup = (st > 1) & F.get(lv, st - 1).isNotNull()
        ext_ok = (
            (st > 1)
            & ~dup
            & F.get(lv, st - 2).isNotNull()
            & ((ts - F.get(lv, st - 2)) <= window_ms)
        )
        ret2 = (
            F.when(done, acc["ret"])
            .when(dup, st.cast("int"))
            .when(ext_ok & (st == n_steps), F.lit(n_steps))
            .otherwise(F.lit(None).cast("int"))
        )
        lv2 = F.transform(
            lv,
            lambda v, i: F.when(done, v)
            .when((st == 1) & (i == 0), ts)
            .when((st == i + 1) & (i > 0) & ext_ok, F.get(lv, i - 1))
            .otherwise(v),
        )
        return F.struct(lv2.alias("lv"), ret2.alias("ret"))

    state = F.aggregate(F.col("__evs"), init, step)
    return F.coalesce(
        state["ret"], F.size(F.filter(state["lv"], lambda v: v.isNotNull()))
    )


_MODES = ("", "default", "keep_all", "strict_increase", "strict_order",
          "strict_deduplication")


def parse_mode_flags(mode: str | None) -> frozenset:
    """Normalize a funnel mode string into its flag set: lowercase, split
    on ','/'+'/whitespace, empty fragments dropped. The ONE shared parse
    for the DataFrame operator and the SQL front-end — which flags a call
    site supports (and how no-op spellings fold away) stays local to it."""
    return frozenset(f for f in re.split(r"[,+\s]+", (mode or "").lower()) if f)


def funnel_max_step(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: list[Column],
    window_ms: int,
    max_events_per_entity: int | None = None,
    mode: str = "default",
) -> DataFrame:
    """(entity, max_step) — how deep each entity got within the window.
    Entities with no funnel events at all do not appear (their step is
    0 by definition; left-join the entity dimension if you need them).
    ``mode``: default/keep_all, strict_increase, strict_order,
    strict_deduplication; all strict flags COMBINE (separated by
    ','/'+'/whitespace) — see module docstring for the pinned rules.
    Mode sets containing strict_increase run the Pareto-frontier
    applyInPandas scan; the rest stay pure-JVM folds."""
    flags = set(parse_mode_flags(mode or "default"))
    unknown = flags - set(_MODES)
    if unknown:
        raise ValueError(f"funnel mode(s) {sorted(unknown)} not in {_MODES}")
    flags -= {"", "default", "keep_all"}
    if "strict_increase" in flags:
        # every strict_increase combination runs the Pareto-frontier
        # scan (module docstring pins the composed rules)
        return _strict_increase_scan(
            df, entity_col, ts_col, steps, window_ms,
            max_events_per_entity, frozenset(flags),
        )
    ev = _matched_events(
        df, entity_col, ts_col, steps, max_events_per_entity,
        keep_unmatched=("strict_order" in flags),
    )
    if flags == {"strict_order", "strict_deduplication"}:
        fold = _fold_strict_order_dedup(len(steps), window_ms)
    elif flags == {"strict_order"}:
        fold = _fold_strict_order(len(steps), window_ms)
    elif flags == {"strict_deduplication"}:
        fold = _fold_strict_dedup(len(steps), window_ms)
    else:
        fold = _fold_max_step(len(steps), window_ms)
    return (
        ev.groupBy("__entity")
        .agg(F.array_sort(F.collect_list(F.struct("__ts", "__step"))).alias("__evs"))
        .select(
            F.col("__entity").alias(entity_col),
            fold.alias("max_step"),
        )
    )


def funnel_max_step_strict_increase(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: list[Column],
    window_ms: int,
    max_events_per_entity: int | None = None,
) -> DataFrame:
    """STRICT_INCREASE mode: chain events must have STRICTLY increasing
    timestamps (the default mode allows ties). Unlike the default mode,
    a single greedy chain-start per level is NOT exact here — a chain
    is characterized by (start_ts, last_ts), extension needs
    ts − start ≤ window AND ts > last, and neither coordinate dominates
    the other (counter-example: A@0 B@3 B@5 C@5, window 10 — keeping
    B's later last_ts kills the valid A@0,B@3,C@5 chain). So this mode
    keeps the exact PARETO FRONTIER of (max start, min last) pairs per
    level, which is variable-size state — run as an Arrow
    applyInPandas over the same slim filtered rows and single entity
    shuffle as the default mode. Per-entity cost is
    O(events × frontier); cap hot entities with
    ``max_events_per_entity`` (the frontier is bounded by the event
    count). Output matches funnel_max_step's shape."""
    return _strict_increase_scan(
        df, entity_col, ts_col, steps, window_ms,
        max_events_per_entity, frozenset(),
    )


def _strict_increase_scan(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: list[Column],
    window_ms: int,
    max_events_per_entity: int | None,
    flags: frozenset,
) -> DataFrame:
    """The Pareto-frontier scan behind every strict_increase mode set
    (alone or combined with strict_order / strict_deduplication — the
    module docstring pins the composed rules). The kill/latch rules
    read only frontier NON-EMPTINESS, which Pareto pruning preserves,
    so this scan computes the same result as an unpruned all-chains
    scan (the randomized differential in tests/test_funnel_topk.py
    checks exactly that)."""
    n_steps = len(steps)
    order_on = "strict_order" in flags
    dedup_on = "strict_deduplication" in flags
    ev = _matched_events(
        df, entity_col, ts_col, steps, max_events_per_entity,
        keep_unmatched=order_on,
    )
    out_field = df.schema[entity_col]
    from pyspark.sql import types as T

    schema = T.StructType([out_field, T.StructField("max_step", T.IntegerType())])

    def per_entity(pdf):
        import pandas as _pd

        events = sorted(zip(pdf["__ts"], pdf["__step"]))
        # levels[i]: Pareto frontier of (start, last), start strictly
        # decreasing / last strictly decreasing after pruning
        levels: list[list[tuple[int, int]]] = [[] for _ in range(n_steps)]

        def add(level: int, start: int, last: int) -> None:
            fr = levels[level]
            for s, l in fr:
                if s >= start and l <= last:
                    return  # dominated
            fr[:] = [(s, l) for s, l in fr if not (start >= s and last <= l)]
            fr.append((start, last))

        entered = False
        ret = None
        for ts, st in events:
            ts, st = int(ts), int(st)
            if st == 0:
                # non-matching rows only ride when strict_order is on
                if entered:
                    break  # order kill
                continue
            if st == 1:
                # entry step refreshes the frontier — never kills/latches
                add(0, ts, ts)
                entered = True
                continue
            if dedup_on and levels[st - 1]:
                ret = st  # repeat interrupts: the repeat's own index
                break
            if order_on and entered and not levels[st - 2]:
                break  # out-of-order step kills further progress
            extended = False
            # snapshot: an event cannot chain onto a pair it created
            # (ts > last rules that out anyway — strict increase)
            for start, last in list(levels[st - 2]):
                if ts - start <= window_ms and ts > last:
                    add(st - 1, start, ts)
                    extended = True
            if dedup_on and extended and st == n_steps:
                ret = n_steps  # completion latches before any later dup
                break
        if ret is None:
            ret = 0
            for i in range(n_steps):
                if levels[i]:
                    ret = i + 1
        return _pd.DataFrame({
            out_field.name: [pdf["__entity"].iloc[0]],
            "max_step": [ret],
        })

    return ev.groupBy("__entity").applyInPandas(per_entity, schema)


def funnel_match_step(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: list[Column],
    window_ms: int,
    max_events_per_entity: int | None = None,
    mode: str = "default",
) -> DataFrame:
    """(entity, matched array<int>) — per-step 0/1 indicators, the
    FUNNEL_MATCH_STEP shape (matched[k-1] = 1 iff the entity reached
    step k)."""
    ms = funnel_max_step(df, entity_col, ts_col, steps, window_ms,
                         max_events_per_entity, mode)
    n = len(steps)
    return ms.select(
        entity_col,
        F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda k: F.when(k <= F.col("max_step"), 1).otherwise(0),
        ).alias("matched"),
    )


def funnel_count(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: list[Column],
    window_ms: int,
    max_events_per_entity: int | None = None,
    mode: str = "default",
) -> DataFrame:
    """(step, entities) — the funnel chart: for each step k (1..n), how
    many entities reached step k or deeper. Zero-conversion steps are
    present with entities = 0. The cumulative pass runs on at most
    n_steps rows (post-aggregation), so its single-partition window is
    free."""
    ms = funnel_max_step(df, entity_col, ts_col, steps, window_ms,
                         max_events_per_entity, mode)
    # Reduce to ≤ n_steps rows FIRST (one aggregate over the entity
    # frame), then resolve "entities reaching ≥ k" with a range join of
    # two tiny frames — both sides post-aggregation, broadcast for free.
    per_depth = ms.groupBy("max_step").agg(F.count("*").alias("__c"))
    all_steps = df.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("int").alias("step")
    )
    return (
        all_steps.join(per_depth, per_depth["max_step"] >= all_steps["step"], "left")
        .groupBy("step")
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("entities"))
        .orderBy("step")
    )


def funnel_complete_count(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: list[Column],
    window_ms: int,
    max_events_per_entity: int | None = None,
    mode: str = "default",
) -> DataFrame:
    """Single-row (completed) — entities that reached the final step
    within the window (FUNNEL_COMPLETE_COUNT)."""
    ms = funnel_max_step(df, entity_col, ts_col, steps, window_ms,
                         max_events_per_entity, mode)
    return ms.where(F.col("max_step") >= len(steps)).agg(
        F.count("*").alias("completed")
    )


FUNNEL_SI_UDF = "__pinot_funnel_strict_increase"


def register_funnel_udfs(spark) -> None:
    """Register the grouped-agg pandas UDF backing the SQL form of the
    strict_increase funnel modes. Fixed-size SQL accumulators cannot
    hold the Pareto frontier (variable-size state), so the SQL
    front-end emits ``__pinot_funnel_strict_increase(ts, steps, n,
    window, order?, dedup?)`` — an Arrow grouped aggregate running the
    SAME frontier scan as ``_strict_increase_scan`` (the logic is
    inlined, not imported: Python-worker closures must be
    self-contained so the UDF works when the driver runs from a
    non-repo cwd; tests pin SQL == operator on randomized histories).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def pinot_funnel_strict_increase(
        ts: pd.Series,
        steps: pd.Series,
        n: pd.Series,
        window: pd.Series,
        order_f: pd.Series,
        dedup_f: pd.Series,
    ) -> int:
        import pandas as _pd

        n_steps = int(n.iloc[0])
        window_ms = int(window.iloc[0])
        order_on = bool(order_f.iloc[0])
        dedup_on = bool(dedup_f.iloc[0])
        events = []
        for t, st_list in zip(ts, steps):
            if _pd.isna(t):
                continue  # NULL-ts events contribute nothing in any mode
            if st_list is None or len(st_list) == 0:
                if order_on:
                    events.append((int(t), 0))
                continue
            for st in st_list:
                events.append((int(t), int(st)))
        # frontier scan — twin of _strict_increase_scan.per_entity
        levels: list[list[tuple[int, int]]] = [[] for _ in range(n_steps)]

        def add(level: int, start: int, last: int) -> None:
            fr = levels[level]
            for s, l in fr:
                if s >= start and l <= last:
                    return
            fr[:] = [(s, l) for s, l in fr if not (start >= s and last <= l)]
            fr.append((start, last))

        entered = False
        ret = None
        for t, st in sorted(events):
            if st == 0:
                if entered:
                    break
                continue
            if st == 1:
                add(0, t, t)
                entered = True
                continue
            if dedup_on and levels[st - 1]:
                ret = st
                break
            if order_on and entered and not levels[st - 2]:
                break
            extended = False
            for start, last in list(levels[st - 2]):
                if t - start <= window_ms and t > last:
                    add(st - 1, start, t)
                    extended = True
            if dedup_on and extended and st == n_steps:
                ret = n_steps
                break
        if ret is None:
            ret = 0
            for i in range(n_steps):
                if levels[i]:
                    ret = i + 1
        return int(ret)

    spark.udf.register(FUNNEL_SI_UDF, pinot_funnel_strict_increase)
