"""Upsert-table semantics — query-time latest-record resolution per
primary key, full and partial modes.

The reference docs mirror (/root/reference) does not cover upsert, but
it is a flagship capability of the public system this engine replaces
(realtime tables configured with `primaryKeyColumns` + an
`upsertConfig`): queries see exactly ONE row per primary key — the
record with the greatest *comparison column* value — while the segment
store keeps every ingested version. Partial upsert merges individual
columns across versions with per-column strategies; a delete column
tombstones a key. Semantics here follow the public documentation of
that feature (docs.pinot.apache.org: Stream ingestion with upsert);
nothing is ported — the implementation is aggregation-native Spark.

Spark mapping (scale-first):

  * FULL upsert is `groupBy(pk).agg(max_by(struct(all), ord))` — ONE
    shuffle on the primary key with map-side partial aggregation
    (each task pre-reduces to one candidate row per key before the
    exchange). This beats the textbook `row_number() over (partition
    by pk order by ord desc) = 1` window, which must shuffle EVERY
    version of every key and then full-sort each partition. AQE
    splits skewed keys.
  * PARTIAL upsert compiles each column's merge strategy to a plain
    aggregate over the same single shuffle (sum for INCREMENT,
    max_by variants for OVERWRITE/IGNORE, sorted-flatten for
    APPEND/UNION). Every strategy is associative/commutative at the
    partial-aggregation level, so map-side combine still fires.
  * Ties on the comparison column break by ingestion sequence when the
    caller names one (Kafka offset / __stream_batch) — ordering is a
    struct and structs compare lexicographically.
  * Deletes: the winning record's delete flag removes the key from the
    view (filter AFTER the aggregate — one extra narrow stage, no
    second shuffle).

The batch view (`upsert_view`) is the hybrid-table read path: point it
at the full segment store (offline + committed stream batches) and the
result is what an upsert-enabled table serves. `upsert_stateful` is
the incremental streaming flavor: applyInPandasWithState keeps the
current winner per key across micro-batches and emits changed keys
each trigger (outputMode=update), so downstream sinks see an upsert
changelog instead of re-scanning history.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Partial-upsert merge strategies (public upsertConfig.partialUpsertStrategies).
STRATEGIES = (
    "OVERWRITE",        # last non-null value wins (null = column absent)
    "FORCE_OVERWRITE",  # last value wins, even if null
    "IGNORE",           # first record's value is kept forever
    "INCREMENT",        # numeric running sum across versions
    "APPEND",           # array concat in comparison order
    "UNION",            # array concat, distinct elements
    "MAX",              # numeric max across versions
    "MIN",              # numeric min across versions
)


@dataclass
class UpsertConfig:
    """Subset of the public table `upsertConfig` this engine honors.

    ``comparison_column`` decides which version of a key wins (the
    public default is the table's time column); ``sequence_column`` is
    the tie-breaker (e.g. Kafka offset). ``partial_strategies`` maps
    column name → STRATEGIES entry; unlisted non-key columns use
    ``default_strategy``. ``delete_column`` names a boolean column —
    a key whose winning record has it true is dropped from the view.
    """

    primary_keys: list[str]
    mode: str = "FULL"  # FULL | PARTIAL
    comparison_column: str | None = None
    sequence_column: str | None = None
    partial_strategies: dict[str, str] = field(default_factory=dict)
    default_strategy: str = "OVERWRITE"
    delete_column: str | None = None
    # public upsertConfig.metadataTTL (in comparison-column units): keys
    # whose comparison value falls behind max(comparison) - ttl leave
    # the metadata map, so their rows become visible AS-IS (frozen past,
    # possibly duplicated) while the live window keeps resolving —
    # upsert_view reproduces exactly that visible behavior
    metadata_ttl: float | None = None
    # public dropOutOfOrderRecord / outOfOrderRecordColumn: arrival-order
    # semantics, honored by the streaming changelog (upsert_stateful);
    # the batch views have no arrival order to judge by (documented there)
    drop_out_of_order_record: bool = False
    out_of_order_record_column: str | None = None

    def __post_init__(self) -> None:
        if self.mode not in ("FULL", "PARTIAL"):
            raise ValueError(f"upsert mode must be FULL or PARTIAL, got {self.mode!r}")
        if self.metadata_ttl is not None:
            if self.comparison_column is None:
                raise ValueError("metadata_ttl requires a comparison_column")
            if self.metadata_ttl <= 0:
                raise ValueError(f"metadata_ttl must be positive, got {self.metadata_ttl}")
        if self.drop_out_of_order_record and self.out_of_order_record_column:
            raise ValueError(
                "dropOutOfOrderRecord and outOfOrderRecordColumn are mutually "
                "exclusive (a dropped record cannot also be marked)"
            )
        for col, strat in {**self.partial_strategies, "": self.default_strategy}.items():
            if strat not in STRATEGIES:
                raise ValueError(
                    f"unknown partial-upsert strategy {strat!r} for column {col!r}; "
                    f"expected one of {STRATEGIES}"
                )
        if not self.primary_keys:
            raise ValueError("upsert requires at least one primary key column")


def _ordering(cfg: UpsertConfig) -> Column:
    """Version ordering: (comparison, sequence) as a lexicographic struct.
    With neither configured the input must carry at most one row per key
    (ties are broken arbitrarily otherwise — same as the public system
    without a comparison column)."""
    parts = []
    if cfg.comparison_column:
        parts.append(F.col(cfg.comparison_column))
    if cfg.sequence_column:
        parts.append(F.col(cfg.sequence_column))
    if not parts:
        parts = [F.lit(0)]
    return F.struct(*parts)


def full_upsert_view(df: DataFrame, cfg: UpsertConfig) -> DataFrame:
    """Latest-record-per-key view (upsert mode FULL): one aggregate,
    one shuffle, map-side combine. Column order of the input is
    preserved in the output."""
    ord_c = _ordering(cfg)
    payload = [c for c in df.columns if c not in cfg.primary_keys]
    winner = (
        df.groupBy(*cfg.primary_keys)
        .agg(F.max_by(F.struct(*payload), ord_c).alias("__w"))
        .select(*cfg.primary_keys, *[F.col(f"__w.{c}").alias(c) for c in payload])
    )
    return _apply_delete(winner, cfg).select(*df.columns)


def _partial_agg(col: str, strat: str, ord_c: Column) -> Column:
    c = F.col(col)
    if strat == "OVERWRITE":
        # Rows with null value get a null ordering, which max_by ignores —
        # so this is "last non-null", the public OVERWRITE contract
        # (null payload means the column was absent from that event).
        return F.max_by(c, F.when(c.isNotNull(), ord_c)).alias(col)
    if strat == "FORCE_OVERWRITE":
        return F.max_by(c, ord_c).alias(col)
    if strat == "IGNORE":
        return F.min_by(c, ord_c).alias(col)
    if strat == "INCREMENT":
        return F.sum(c).alias(col)
    if strat in ("APPEND", "UNION"):
        # Order-correct array merge: collect (ord, array) pairs, sort by
        # ord, drop null-array versions (column absent from that event —
        # flatten would otherwise NULL the whole merge), flatten.
        # collect_list order is nondeterministic pre-sort, deterministic
        # after. UNION additionally dedups elements.
        merged = F.flatten(
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(ord_c.alias("o"), c.alias("v")))
                    ),
                    lambda x: x["v"],
                ),
                lambda v: v.isNotNull(),
            )
        )
        if strat == "UNION":
            merged = F.array_distinct(merged)
        return merged.alias(col)
    if strat == "MAX":
        return F.max(c).alias(col)
    if strat == "MIN":
        return F.min(c).alias(col)
    raise AssertionError(strat)


def partial_upsert_view(df: DataFrame, cfg: UpsertConfig) -> DataFrame:
    """Per-column merged view (upsert mode PARTIAL): every strategy
    compiles to a builtin aggregate over ONE pk shuffle. The comparison
    and sequence columns themselves always resolve FORCE_OVERWRITE
    (they describe the winning version, not mergeable payload)."""
    ord_c = _ordering(cfg)
    meta = {cfg.comparison_column, cfg.sequence_column, cfg.delete_column} - {None}
    aggs = []
    for col in df.columns:
        if col in cfg.primary_keys:
            continue
        strat = (
            "FORCE_OVERWRITE"
            if col in meta
            else cfg.partial_strategies.get(col, cfg.default_strategy)
        )
        aggs.append(_partial_agg(col, strat, ord_c))
    out = df.groupBy(*cfg.primary_keys).agg(*aggs)
    return _apply_delete(out, cfg).select(*df.columns)


def _apply_delete(winner: DataFrame, cfg: UpsertConfig) -> DataFrame:
    """Tombstone filter: the winning record's delete flag drops the key.
    Runs after the aggregate (narrow stage, no extra shuffle)."""
    if not cfg.delete_column:
        return winner
    d = F.col(cfg.delete_column)
    return winner.where(d.isNull() | ~d)


def upsert_view(df: DataFrame, cfg: UpsertConfig) -> DataFrame:
    """The query-time upsert resolution (what a SELECT against an
    upsert table sees). Pass the raw frame through unchanged to get the
    public `skipUpsert=true` behavior — there is deliberately no flag
    here; callers just query the underlying table.

    With ``metadata_ttl`` set, the TTL window behind the table's max
    comparison value resolves per key as usual, and rows OLDER than the
    watermark resolve per key AMONG THEMSELVES: a key expires from the
    public engine's metadata map carrying its as-of-expiry winner (the
    validDocIds computed while the key was live persist), so the old
    winner stays visible — and if the key reappears in the live window,
    BOTH that old winner and the new live winner show (the documented
    TTL duplicate caveat). Resolving the two regions independently is
    exactly that contract. The watermark is a 1-row aggregate broadcast
    back onto the scan: no collect, and the fact side streams once."""
    resolve = partial_upsert_view if cfg.mode == "PARTIAL" else full_upsert_view
    if cfg.metadata_ttl is None:
        return resolve(df, cfg)
    comp = F.col(cfg.comparison_column)
    bound = df.agg(
        (F.max(comp) - F.lit(cfg.metadata_ttl)).alias("__upsert_wm")
    )
    joined = df.crossJoin(F.broadcast(bound))
    frozen = joined.where(comp < F.col("__upsert_wm")).drop("__upsert_wm")
    live = joined.where(
        comp.isNull() | (comp >= F.col("__upsert_wm"))
    ).drop("__upsert_wm")
    return (
        resolve(frozen, cfg)
        .unionByName(resolve(live, cfg))
        .select(*df.columns)
    )


def dedup_keep_first_view(df: DataFrame, cfg: UpsertConfig) -> DataFrame:
    """Table-level dedup (the public dedup-config on realtime tables):
    the FIRST record per primary key wins and later duplicates are
    invisible — the mirror image of full upsert (min_by instead of
    max_by, same single map-side-combined shuffle). The streaming
    flavor of this contract is
    streaming.realtime.dedup_within_key_stateful.

    ``metadata_ttl`` mirrors the public dedup-config metadataTTL over
    its dedupTimeColumn (= comparison_column here): each side of the
    watermark keeps first-wins among itself, so an expired key's
    original survivor stays visible and a reappearing key yields one
    duplicate across the boundary (the documented TTL caveat) — same
    broadcast-watermark shape as upsert_view."""

    def keep_first(d: DataFrame, c: UpsertConfig) -> DataFrame:
        ord_c = _ordering(c)
        payload = [x for x in d.columns if x not in c.primary_keys]
        first = (
            d.groupBy(*c.primary_keys)
            .agg(F.min_by(F.struct(*payload), ord_c).alias("__w"))
            .select(*c.primary_keys, *[F.col(f"__w.{x}").alias(x) for x in payload])
        )
        return first.select(*d.columns)

    if cfg.metadata_ttl is None:
        return keep_first(df, cfg)
    comp = F.col(cfg.comparison_column)
    bound = df.agg((F.max(comp) - F.lit(cfg.metadata_ttl)).alias("__dedup_wm"))
    joined = df.crossJoin(F.broadcast(bound))
    frozen = joined.where(comp < F.col("__dedup_wm")).drop("__dedup_wm")
    live = joined.where(
        comp.isNull() | (comp >= F.col("__dedup_wm"))
    ).drop("__dedup_wm")
    return (
        keep_first(frozen, cfg)
        .unionByName(keep_first(live, cfg))
        .select(*df.columns)
    )


# --------------------------------------------------------------------------
# Streaming changelog flavor
# --------------------------------------------------------------------------


def upsert_stateful(
    stream_df: DataFrame,
    cfg: UpsertConfig,
    timeout_minutes: float | None = None,
) -> DataFrame:
    """Incremental FULL upsert over a stream: per-key current winner
    maintained in applyInPandasWithState, emitting a key's row whenever
    a new version wins (outputMode=update → an upsert changelog).

    State per key is ONE pickled row + its ordering tuple — constant
    per key regardless of stream length. ``timeout_minutes`` opts into
    processing-time expiry for unbounded key spaces (same contract and
    hasTimedOut discipline as running_totals_stateful). Partial mode is
    deliberately batch-only: APPEND/UNION state would grow unboundedly
    per key, which is exactly what the state store should not hold —
    run partial merges in the batch view over committed segments.

    Out-of-order arrivals (a record whose ordering is BELOW the key's
    current winner — the public dropOutOfOrderRecord /
    outOfOrderRecordColumn semantics, which only make sense with
    arrival order, i.e. here, not in the batch views): by default and
    with ``drop_out_of_order_record`` they never reach the changelog
    (they cannot win); with ``out_of_order_record_column`` set they ARE
    emitted, flagged true in that column, while winners carry false —
    the schema gains the flag column.
    """
    if cfg.mode != "FULL":
        raise ValueError("upsert_stateful implements FULL mode only (see docstring)")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = stream_df.columns
    pk = list(cfg.primary_keys)
    cmp_col, seq_col = cfg.comparison_column, cfg.sequence_column
    ooo_col = cfg.out_of_order_record_column
    if ooo_col in cols:
        raise ValueError(
            f"outOfOrderRecordColumn {ooo_col!r} collides with an input column"
        )
    out_schema = stream_df.schema
    if ooo_col:
        from pyspark.sql import types as _T

        out_schema = _T.StructType(
            out_schema.fields + [_T.StructField(ooo_col, _T.BooleanType(), True)]
        )
    out_cols = cols + ([ooo_col] if ooo_col else [])
    state_schema = "payload BINARY"
    timeout_ms = int(timeout_minutes * 60 * 1000) if timeout_minutes else None

    def update(key, pdfs, state: GroupState):
        import pickle

        import pandas as _pd

        empty = _pd.DataFrame({c: [] for c in out_cols})
        if state.hasTimedOut:
            state.remove()
            yield empty
            return

        def ord_of(row) -> tuple:
            # Null ordering fields sort LOWEST (matching the batch views'
            # max_by over an ordering STRUCT, where a null field sorts
            # first): each part becomes (present?, value), so None/NaN
            # loses to any real value without ever reaching a None-vs-
            # value comparison (which would TypeError the task), and a
            # key whose only rows have null ordering still surfaces —
            # exactly like the batch view of the same data.
            parts = []
            for colname in (cmp_col, seq_col):
                if colname:
                    p = row[colname]
                    parts.append((0, 0) if p is None or p != p else (1, p))
            return tuple(parts)

        best = pickle.loads(state.get[0]) if state.exists else None  # (ord, rowdict)
        changed = False
        late = []  # out-of-order arrivals, only kept when flagged
        for pdf in pdfs:
            for row in pdf.to_dict("records"):
                o = ord_of(row)
                if best is None or o >= best[0]:
                    best = (o, row)
                    changed = True
                elif ooo_col:
                    late.append({**row, ooo_col: True})
        if best is not None:
            state.update((pickle.dumps(best),))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        out = []
        if changed:
            win = dict(best[1])
            if ooo_col:
                win[ooo_col] = False
            out.append(win)
        out.extend(late)
        yield _pd.DataFrame(out, columns=out_cols) if out else empty

    return stream_df.groupBy(*pk).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
