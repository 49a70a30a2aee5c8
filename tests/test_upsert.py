"""Upsert-table semantics (operators/upsert.py): full / partial modes,
delete tombstones, plan shape, DuckDB differential, streaming changelog."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from apache_pinot_spark.operators import upsert as U


def _events(spark):
    rows = [
        # (pk, comparison ts, seq, value, tags, deleted)
        ("k1", 10, 0, 1.0, ["a"], False),
        ("k1", 20, 1, 2.0, ["b"], False),
        ("k1", 15, 2, 9.0, ["c"], False),
        ("k2", 5, 3, 4.0, ["x"], False),
        ("k2", 5, 4, 6.0, ["y"], False),  # same ts as above: seq breaks the tie
        ("k3", 1, 5, 7.0, ["z"], False),
        ("k3", 2, 6, 8.0, ["w"], True),  # tombstoned by its latest version
    ]
    return spark.createDataFrame(
        rows, "pk string, ts long, seq long, value double, tags array<string>, deleted boolean"
    )


def test_full_upsert_latest_wins(spark):
    cfg = U.UpsertConfig(primary_keys=["pk"], comparison_column="ts", sequence_column="seq")
    out = U.full_upsert_view(_events(spark).drop("deleted"), cfg)
    got = {r["pk"]: (r["ts"], r["value"]) for r in out.collect()}
    assert got == {"k1": (20, 2.0), "k2": (5, 6.0), "k3": (2, 8.0)}
    assert out.columns == ["pk", "ts", "seq", "value", "tags"]  # input order kept


def test_full_upsert_delete_tombstone(spark):
    cfg = U.UpsertConfig(
        primary_keys=["pk"], comparison_column="ts", sequence_column="seq",
        delete_column="deleted",
    )
    out = U.upsert_view(_events(spark), cfg)
    assert sorted(r["pk"] for r in out.collect()) == ["k1", "k2"]  # k3 tombstoned


def test_partial_upsert_strategies(spark):
    rows = [
        ("k1", 10, 1.0, "first", ["a"], 3.0),
        ("k1", 20, 2.0, None, ["b", "a"], 1.0),
        ("k1", 30, 4.0, None, ["c"], 2.0),
    ]
    df = spark.createDataFrame(
        rows, "pk string, ts long, inc double, ow string, tags array<string>, m double"
    )
    cfg = U.UpsertConfig(
        primary_keys=["pk"], mode="PARTIAL", comparison_column="ts",
        partial_strategies={"inc": "INCREMENT", "ow": "OVERWRITE", "tags": "UNION", "m": "MAX"},
    )
    r = U.upsert_view(df, cfg).collect()[0]
    assert r["ts"] == 30  # comparison column resolves FORCE_OVERWRITE
    assert r["inc"] == 7.0
    assert r["ow"] == "first"  # later nulls don't clobber (OVERWRITE skips null)
    assert r["tags"] == ["a", "b", "c"]  # comparison order, distinct
    assert r["m"] == 3.0


def test_partial_upsert_append_ignore_min_force(spark):
    rows = [("k", 1, ["a"], "x", 5.0, "old"), ("k", 2, ["b"], "y", 3.0, None)]
    df = spark.createDataFrame(
        rows, "pk string, ts long, ar array<string>, ig string, mn double, fo string"
    )
    cfg = U.UpsertConfig(
        primary_keys=["pk"], mode="PARTIAL", comparison_column="ts",
        partial_strategies={
            "ar": "APPEND", "ig": "IGNORE", "mn": "MIN", "fo": "FORCE_OVERWRITE",
        },
    )
    r = U.upsert_view(df, cfg).collect()[0]
    assert r["ar"] == ["a", "b"]
    assert r["ig"] == "x"
    assert r["mn"] == 3.0
    assert r["fo"] is None  # FORCE_OVERWRITE takes the latest value even when null


def test_upsert_config_validation():
    with pytest.raises(ValueError, match="mode"):
        U.UpsertConfig(primary_keys=["pk"], mode="BOTH")
    with pytest.raises(ValueError, match="strategy"):
        U.UpsertConfig(primary_keys=["pk"], partial_strategies={"c": "SQUARE"})
    with pytest.raises(ValueError, match="primary key"):
        U.UpsertConfig(primary_keys=[])


def test_full_upsert_plan_single_shuffle_with_partial_agg(spark):
    """Scale assert: ONE Exchange (the pk shuffle) and a map-side partial
    aggregate before it — the reason this beats the row_number() window."""
    cfg = U.UpsertConfig(primary_keys=["pk"], comparison_column="ts")
    plan = U.full_upsert_view(
        _events(spark).drop("deleted"), cfg
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # struct-valued max_by buffers compile to SortAggregate, still with a
    # map-side partial_max_by below the Exchange — that's the combine.
    partial_lines = [
        ln for ln in plan.splitlines() if "Aggregate" in ln and "partial_max_by" in ln
    ]
    assert partial_lines, plan


def test_full_upsert_matches_duckdb_window_oracle(spark, duck):
    """Differential: latest-event-per-user over the real events table vs
    DuckDB's row_number() formulation of the same semantics."""
    from tests.conftest import SF_CORRECTNESS

    ev = spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
    cfg = U.UpsertConfig(
        primary_keys=["user_id"], comparison_column="ts", sequence_column="event_id"
    )
    got = {
        (r["user_id"], r["event_id"])
        for r in U.upsert_view(ev.select("user_id", "ts", "event_id", "value"), cfg).collect()
    }
    want = {
        (r[0], r[1])
        for r in duck.sql(
            "SELECT user_id, event_id FROM ("
            "  SELECT user_id, event_id,"
            "         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn"
            "  FROM events) WHERE rn = 1"
        ).fetchall()
    }
    assert got == want


def test_upsert_stateful_streaming_changelog(spark, tmp_path_factory):
    """Streaming FULL upsert: update-mode changelog emits a key's row
    when a new version wins; stale versions never surface."""
    root = tmp_path_factory.mktemp("upsert_state")
    src = root / "src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("pk", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def write(idx, rows):
        (src / f"b{idx}.json").write_text("\n".join(json.dumps(r) for r in rows))

    write(0, [{"pk": "a", "ts": 10, "value": 1.0}, {"pk": "b", "ts": 10, "value": 2.0}])
    stream = spark.readStream.schema(schema).json(str(src))
    cfg = U.UpsertConfig(primary_keys=["pk"], comparison_column="ts")
    out = U.upsert_stateful(stream, cfg)
    q = (
        out.writeStream.outputMode("update")
        .format("memory").queryName("upsert_changelog")
        .option("checkpointLocation", str(root / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # newer version for a; STALE version for b (must not re-emit);
        # null ordering for c's ONLY row (must surface, like the batch
        # view); null ordering for b (sorts lowest: loses to ts=10)
        write(1, [{"pk": "a", "ts": 20, "value": 9.0},
                  {"pk": "b", "ts": 5, "value": 0.0},
                  {"pk": "b", "ts": None, "value": -1.0},
                  {"pk": "c", "ts": None, "value": 3.0}])
        q.processAllAvailable()
        rows = [
            (r["pk"], r["ts"], r["value"])
            for r in spark.sql("SELECT * FROM upsert_changelog").collect()
        ]
        assert ("a", 20, 9.0) in rows and ("a", 10, 1.0) in rows
        assert ("b", 10, 2.0) in rows
        assert ("b", 5, 0.0) not in rows  # stale version suppressed
        assert ("b", None, -1.0) not in rows  # null ordering loses to ts=10
        assert ("c", None, 3.0) in rows  # only-null-ordering key surfaces
        # current state of the table = last emit per key
        latest = {}
        for pk, ts, v in rows:
            key = (-1, -1) if ts is None else (0, ts)  # null sorts lowest
            if pk not in latest or key >= latest[pk][0]:
                latest[pk] = (key, ts, v)
        assert {pk: (ts, v) for pk, (_, ts, v) in latest.items()} == {
            "a": (20, 9.0), "b": (10, 2.0), "c": (None, 3.0)
        }
    finally:
        q.stop()


def test_upsert_stateful_rejects_partial_mode(spark):
    cfg = U.UpsertConfig(primary_keys=["pk"], mode="PARTIAL", comparison_column="ts")
    with pytest.raises(ValueError, match="FULL"):
        U.upsert_stateful(spark.range(1).withColumnRenamed("id", "pk"), cfg)


def test_engine_register_upsert_table(spark):
    """Table-level integration: SQL against the registered name resolves
    upsert; <name>_raw is the skipUpsert escape; re-registering after new
    versions arrive refreshes the view."""
    from apache_pinot_spark.sqlfront import PinotEngine

    eng = PinotEngine(spark)
    cfg = U.UpsertConfig(
        primary_keys=["pk"], comparison_column="ts", sequence_column="seq",
        delete_column="deleted",
    )
    eng.register_upsert_table("orders_up", _events(spark), cfg)
    rows = {r["pk"]: r["value"] for r in
            eng.sql("SELECT pk, value FROM orders_up ORDER BY pk").collect()}
    assert rows == {"k1": 2.0, "k2": 6.0}  # latest per key, k3 tombstoned
    raw_n = eng.sql("SELECT COUNT(*) AS n FROM orders_up_raw").collect()[0]["n"]
    assert raw_n == 7  # full version history via skipUpsert escape

    newer = _events(spark).union(
        spark.createDataFrame(
            [("k1", 99, 9, 42.0, ["zz"], False)],
            "pk string, ts long, seq long, value double, tags array<string>, deleted boolean",
        )
    )
    eng.register_upsert_table("orders_up", newer, cfg)
    assert eng.sql(
        "SELECT value FROM orders_up WHERE pk = 'k1'"
    ).collect()[0]["value"] == 42.0


def test_dedup_keep_first_view_and_engine(spark):
    """Table-level dedup config: FIRST record per key wins (mirror of
    upsert), both as an operator and through the engine registration."""
    from apache_pinot_spark.sqlfront import PinotEngine

    cfg = U.UpsertConfig(primary_keys=["pk"], comparison_column="ts",
                         sequence_column="seq")
    out = U.dedup_keep_first_view(_events(spark), cfg)
    got = {r["pk"]: (r["ts"], r["value"]) for r in out.collect()}
    assert got == {"k1": (10, 1.0), "k2": (5, 4.0), "k3": (1, 7.0)}

    eng = PinotEngine(spark)
    eng.register_dedup_table("clicks_dd", _events(spark), cfg)
    n = eng.sql("SELECT COUNT(*) AS n FROM clicks_dd").collect()[0]["n"]
    assert n == 3
    assert eng.sql("SELECT COUNT(*) AS n FROM clicks_dd_raw").collect()[0]["n"] == 7


def test_partial_upsert_append_skips_null_array_versions(spark):
    """A version where the array column was absent (NULL) must not void
    the APPEND/UNION merge — it contributes nothing."""
    df = spark.createDataFrame(
        [("k", 1, ["a"]), ("k", 2, None), ("k", 3, ["b", "a"])],
        "pk string, ts long, ar array<string>",
    )
    for strat, want in (("APPEND", ["a", "b", "a"]), ("UNION", ["a", "b"])):
        cfg = U.UpsertConfig(primary_keys=["pk"], mode="PARTIAL",
                             comparison_column="ts",
                             partial_strategies={"ar": strat})
        assert U.upsert_view(df, cfg).collect()[0]["ar"] == want


def test_metadata_ttl_frozen_past(spark, duck):
    """upsertConfig.metadataTTL: keys whose rows fall behind
    max(comparison) - TTL expired from the metadata map CARRYING their
    as-of-expiry winner (validDocIds persist), so each side of the
    watermark resolves per key among itself; a key spanning both sides
    would show one winner per side (the documented TTL duplicate
    caveat). Differentialed against a DuckDB window oracle split at the
    same watermark."""
    df = _events(spark)
    cfg = U.UpsertConfig(
        primary_keys=["pk"], comparison_column="ts", sequence_column="seq",
        metadata_ttl=10.0,
    )
    got = sorted(
        (r["pk"], r["ts"], r["seq"]) for r in U.upsert_view(df, cfg).collect()
    )
    # max(ts) = 20 → watermark 10: ts < 10 resolves among itself
    # (k2 → seq 4, k3 → ts 2), ts >= 10 resolves among itself (k1 → 20)
    df.toPandas().to_csv("/tmp/_ttl_events.csv", index=False)
    want = sorted(
        tuple(r)
        for r in duck.sql(
            """
            WITH t AS (SELECT pk, ts, seq FROM '/tmp/_ttl_events.csv'),
            wm AS (SELECT max(ts) - 10 AS w FROM t),
            sides AS (
              SELECT pk, ts, seq, (ts >= w) AS live,
                     row_number() OVER (PARTITION BY pk, (ts >= w)
                                        ORDER BY ts DESC, seq DESC) rn
              FROM t, wm
            )
            SELECT pk, ts, seq FROM sides WHERE rn = 1
            """
        ).fetchall()
    )
    assert got == want
    assert ("k1", 20, 1) in got and ("k1", 10, 0) not in got  # live resolves
    assert ("k2", 5, 4) in got and ("k2", 5, 3) not in got  # frozen winner only
    assert ("k3", 2, 6) in got and ("k3", 1, 5) not in got
    with pytest.raises(ValueError, match="comparison_column"):
        U.UpsertConfig(primary_keys=["pk"], metadata_ttl=5.0)
    with pytest.raises(ValueError, match="positive"):
        U.UpsertConfig(
            primary_keys=["pk"], comparison_column="ts", metadata_ttl=0.0
        )


def test_upsert_stateful_out_of_order_column(spark, tmp_path_factory):
    """outOfOrderRecordColumn: out-of-order arrivals surface in the
    changelog flagged true; winners carry false; the two knobs are
    mutually exclusive."""
    root = tmp_path_factory.mktemp("upsert_ooo")
    src = root / "src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("pk", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def write(idx, rows):
        (src / f"b{idx}.json").write_text("\n".join(json.dumps(r) for r in rows))

    write(0, [{"pk": "a", "ts": 10, "value": 1.0}])
    stream = spark.readStream.schema(schema).json(str(src))
    cfg = U.UpsertConfig(
        primary_keys=["pk"], comparison_column="ts",
        out_of_order_record_column="is_ooo",
    )
    out = U.upsert_stateful(stream, cfg)
    q = (
        out.writeStream.outputMode("update")
        .format("memory").queryName("upsert_ooo")
        .option("checkpointLocation", str(root / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write(1, [{"pk": "a", "ts": 5, "value": 0.5},   # out of order
                  {"pk": "a", "ts": 20, "value": 2.0}])  # new winner
        q.processAllAvailable()
        rows = {
            (r["pk"], r["ts"], r["value"]): r["is_ooo"]
            for r in spark.sql("SELECT * FROM upsert_ooo").collect()
        }
        assert rows[("a", 10, 1.0)] is False
        assert rows[("a", 20, 2.0)] is False
        assert rows[("a", 5, 0.5)] is True  # surfaced, flagged
    finally:
        q.stop()
    with pytest.raises(ValueError, match="mutually"):
        U.UpsertConfig(
            primary_keys=["pk"], comparison_column="ts",
            drop_out_of_order_record=True, out_of_order_record_column="f",
        )
    with pytest.raises(ValueError, match="collides"):
        U.upsert_stateful(
            spark.readStream.schema(schema).json(str(src)),
            U.UpsertConfig(
                primary_keys=["pk"], comparison_column="ts",
                out_of_order_record_column="value",
            ),
        )


def test_dedup_metadata_ttl(spark):
    """Dedup-config metadataTTL: each side of the watermark keeps
    first-wins among itself — an expired key's original survivor stays
    the only old row; a key spanning both sides would add exactly one
    live-side survivor (the documented TTL duplicate caveat)."""
    df = _events(spark)
    cfg = U.UpsertConfig(
        primary_keys=["pk"], comparison_column="ts", sequence_column="seq",
        metadata_ttl=10.0,
    )
    got = sorted(
        (r["pk"], r["ts"], r["seq"]) for r in U.dedup_keep_first_view(df, cfg).collect()
    )
    # watermark = 20 - 10 = 10: live k1 keeps first (10, seq 0); frozen
    # k2 keeps (5, seq 3), frozen k3 keeps (1, seq 5)
    assert got == [("k1", 10, 0), ("k2", 5, 3), ("k3", 1, 5)]
    # a key spanning the boundary keeps one survivor per side
    span = spark.createDataFrame(
        [("a", 1, 0, 0.0, ["x"], False), ("a", 2, 1, 0.0, ["x"], False),
         ("a", 15, 2, 0.0, ["x"], False), ("a", 20, 3, 0.0, ["x"], False)],
        "pk string, ts long, seq long, value double, tags array<string>, deleted boolean",
    )
    got2 = sorted(
        (r["pk"], r["ts"]) for r in U.dedup_keep_first_view(span, cfg).collect()
    )
    assert got2 == [("a", 1), ("a", 15)]
