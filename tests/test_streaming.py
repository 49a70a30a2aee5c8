"""Realtime ingestion + hybrid table tests (SURVEY §2.7 ST1-ST5) using a
file stream source (no Kafka in the container — the source is pluggable)."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_pinot_spark.plans.schema import PinotSchema
from apache_pinot_spark.sources import batch as B
from apache_pinot_spark.streaming import realtime as R

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)

SCHEMA = PinotSchema.from_json(
    {
        "schemaName": "clicks",
        "dimensionFieldSpecs": [
            {"name": "user", "dataType": "STRING"},
            {"name": "page", "dataType": "STRING"},
        ],
        "metricFieldSpecs": [{"name": "n", "dataType": "LONG"}],
        "dateTimeFieldSpecs": [
            {"name": "ts_ms", "dataType": "LONG", "format": "1:MILLISECONDS:EPOCH",
             "granularity": "1:DAYS"}
        ],
    }
)

CFG = B.TableConfig(
    table_name="clicks_rt",
    time_column="ts_ms",
    partition_granularity="1:DAYS",
    text_index_columns=["page"],
)

_SRC_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("page", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

BASE_MS = 1_700_000_000_000


def _write_source_file(src_dir, idx: int, rows: list[dict]) -> None:
    p = src_dir / f"batch_{idx}.json"
    p.write_text("\n".join(json.dumps(r) for r in rows))


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rt")
    src = root / "src"
    src.mkdir()
    table = str(root / "table")
    ckpt = str(root / "ckpt")
    _write_source_file(
        src, 0,
        [{"user": "u1", "page": "spark streaming guide", "n": 1, "ts_ms": BASE_MS},
         {"user": "u2", "page": "hash join deep dive", "n": 2, "ts_ms": BASE_MS + 86_400_000}],
    )
    state = R.ConsumingState()
    stream = spark.readStream.schema(_SRC_SCHEMA).json(str(src))
    q = R.ingest_stream(spark, SCHEMA, CFG, stream, table, ckpt,
                        trigger_seconds=0.5, state=state)
    # wait for first commit (ST1 freshness: rows visible after one trigger)
    deadline = time.time() + 60
    while state.batches < 1 and time.time() < deadline:
        time.sleep(0.25)
    yield spark, src, table, q, state
    q.stop()


def test_stream_rows_visible_after_commit(stream_env):
    spark, src, table, q, state = stream_env
    assert state.batches >= 1
    df = spark.read.parquet(table)
    assert df.count() == 2
    # shared normalize pipeline ran: tokenized text column present (ST5)
    assert "$page$tokens" in df.columns
    toks = df.filter(F.col("user") == "u1").select("$page$tokens").collect()[0][0]
    assert "streaming" in toks


def test_stream_appends_second_batch(stream_env):
    spark, src, table, q, state = stream_env
    before = state.batches
    _write_source_file(
        src, 1, [{"user": "u3", "page": "minhash dedup", "n": 5, "ts_ms": BASE_MS + 3600_000}]
    )
    deadline = time.time() + 60
    while state.batches <= before and time.time() < deadline:
        time.sleep(0.25)
    df = spark.read.parquet(table)
    assert df.count() == 3
    assert state.min_consuming_freshness_ms > 0
    # segment completion: each micro-batch commit added parquet files under
    # time-bucket partition dirs (ST2/S3)
    assert len(B.list_segments(table)) >= 2


def test_hybrid_view_boundary(stream_env, tmp_path_factory):
    spark, src, table, q, state = stream_env
    # offline half: same schema, rows strictly before the boundary
    off_root = tmp_path_factory.mktemp("off")
    off_rows = [
        Row(user="old1", page="ancient page", n=1, ts_ms=BASE_MS - 2 * 86_400_000),
        Row(user="old2", page="newer offline row SHOULD BE HIDDEN", n=1, ts_ms=BASE_MS + 3600_000),
    ]
    off_cfg = B.TableConfig(table_name="clicks_off", time_column="ts_ms",
                            text_index_columns=["page"])
    off_path = B.ingest_batch(spark, SCHEMA, off_cfg, spark.createDataFrame(off_rows),
                              warehouse=str(off_root))
    hybrid = R.hybrid_view(spark, "clicks_hybrid", off_path, table, "ts_ms", str(BASE_MS))
    rows = {r["user"] for r in hybrid.collect()}
    # boundary: offline contributes only rows < BASE_MS; realtime only >= BASE_MS
    assert "old1" in rows and "old2" not in rows
    assert {"u1", "u2"} <= rows
    # queryable via SQL like any table (ST3)
    n = spark.sql("SELECT COUNT(*) AS c FROM clicks_hybrid").collect()[0]["c"]
    assert n == len(rows)


def test_kafka_stream_builder_shape(spark):
    """No Kafka connector in the container: the builder itself must
    construct (schema projection intact) and fail only at stream START
    with the missing-data-source error — proving the API shape is right."""
    from apache_pinot_spark.streaming.realtime import kafka_stream

    try:
        df = kafka_stream(spark, "localhost:9092", "events",
                          "event_id LONG, ts_ms LONG, value DOUBLE")
    except Exception as e:
        # acceptable: connector absent → DATA_SOURCE_NOT_FOUND at build
        assert "kafka" in str(e).lower()
        return
    assert [f.name for f in df.schema.fields] == ["event_id", "ts_ms", "value"]


def test_stream_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a committed batch_id must
    not duplicate rows (the _SUCCESS-marked batch directory is skipped),
    and a partial (crashed) attempt is overwritten, not appended to."""
    import os

    table = str(tmp_path / "table")
    state = R.ConsumingState()
    commit = R.make_batch_committer(SCHEMA, CFG, table, state)
    batch = spark.createDataFrame(
        [Row(user="u1", page="p one", n=1, ts_ms=BASE_MS),
         Row(user="u2", page="p two", n=2, ts_ms=BASE_MS)]
    )
    commit(batch, 0)
    assert spark.read.parquet(table).count() == 2 and state.rows == 2
    # replay of the committed batch: no-op
    commit(batch, 0)
    assert spark.read.parquet(table).count() == 2
    assert state.rows == 2 and state.batches == 1
    # partial attempt (no _SUCCESS marker): replay overwrites cleanly
    os.remove(os.path.join(table, "__stream_batch=0", "_SUCCESS"))
    commit(batch, 0)
    spark.catalog.refreshByPath(table)
    assert spark.read.parquet(table).count() == 2
    assert state.batches == 2  # recommitted once


def test_windowed_counts_with_watermark(spark, tmp_path):
    """ST6: watermarked tumbling windows — out-of-order rows land in their
    event-time window; rows later than the watermark are dropped."""
    import json as _json

    src = tmp_path / "wsrc"
    src.mkdir()
    base = 1_700_000_000_000
    rows = [
        {"user": "u1", "page": "p", "n": 1, "ts_ms": base},           # win 0
        {"user": "u2", "page": "p", "n": 1, "ts_ms": base + 30_000},  # win 0
        {"user": "u1", "page": "p", "n": 1, "ts_ms": base + 90_000},  # win 1
    ]
    (src / "b0.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema(_SRC_SCHEMA).json(str(src))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    out = R.windowed_counts(stream, "ts", "1 minute", watermark_delay="5 minutes")
    q = (
        out.writeStream.outputMode("complete")
        .format("memory").queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"].isoformat(), r["cnt"])
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert len(got) == 2 and {c for _, c in got} == {1, 2}
    finally:
        q.stop()


def test_stateful_running_totals(spark, tmp_path):
    """ST6: applyInPandasWithState — per-key state carried ACROSS
    micro-batches (the custom stateful operator surface)."""
    import json as _json

    src = tmp_path / "ssrc"
    src.mkdir()
    base = 1_700_000_000_000
    (src / "b0.json").write_text("\n".join(
        _json.dumps({"user": u, "page": "p", "n": n, "ts_ms": base})
        for u, n in [("a", 1), ("a", 2), ("b", 10)]
    ))
    stream = spark.readStream.schema(_SRC_SCHEMA).json(str(src))
    out = R.running_totals_stateful(stream, "user", "n")
    q = (
        out.writeStream.outputMode("update")
        .format("memory").queryName("run_totals")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: state must accumulate, not reset
        (src / "b1.json").write_text(_json.dumps(
            {"user": "a", "page": "p", "n": 4, "ts_ms": base + 1000}
        ))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user, max(events) AS e, max(total) AS t FROM run_totals GROUP BY user"
        ).collect()
        got = {r["user"]: (r["e"], r["t"]) for r in rows}
        assert got["a"] == (3, 7.0)   # 2 events batch0 + 1 batch1, 1+2+4
        assert got["b"] == (1, 10.0)
    finally:
        q.stop()


def test_consuming_view_sub_trigger_freshness(spark, tmp_path_factory):
    """ST1: a file dropped in the source dir is queryable through
    consuming_view BEFORE any trigger fires (here: the stream is stopped),
    through the same normalize pipeline as the committed half; once the
    stream commits it, the view result is unchanged (no duplicates)."""
    root = tmp_path_factory.mktemp("consuming")
    src = root / "src"
    src.mkdir()
    table = str(root / "table")
    ckpt = str(root / "ckpt")
    _write_source_file(
        src, 0,
        [{"user": "u1", "page": "spark streaming", "n": 1, "ts_ms": BASE_MS}],
    )
    state = R.ConsumingState()
    stream = spark.readStream.schema(_SRC_SCHEMA).json(str(src))
    q = R.ingest_stream(spark, SCHEMA, CFG, stream, table, ckpt,
                        trigger_seconds=0.5, state=state)
    deadline = time.time() + 60
    while state.batches < 1 and time.time() < deadline:
        time.sleep(0.25)
    q.stop()  # no more triggers will fire

    # in-flight rows: new file with NO stream running
    _write_source_file(
        src, 1,
        [{"user": "u9", "page": "consuming segment", "n": 7, "ts_ms": BASE_MS + 1000}],
    )
    view = R.consuming_view(
        spark, SCHEMA, CFG, str(src), table,
        source_format="json", source_schema=_SRC_SCHEMA,
    )
    assert view.count() == 2  # committed row + in-flight row
    live = view.filter(F.col("user") == "u9")
    assert live.count() == 1
    # the consuming tail went through the SAME normalize pipeline (ST5)
    assert "$page$tokens" in view.columns
    assert "consuming" in live.select("$page$tokens").collect()[0][0]
    # committed half alone does NOT see the row (proves sub-trigger)
    assert spark.read.parquet(table).count() == 1

    # restart the stream; once the file commits, the view is stable
    state2 = R.ConsumingState()
    stream2 = spark.readStream.schema(_SRC_SCHEMA).json(str(src))
    q2 = R.ingest_stream(spark, SCHEMA, CFG, stream2, table, ckpt,
                         trigger_seconds=0.5, state=state2)
    deadline = time.time() + 60
    while state2.batches < 1 and time.time() < deadline:
        time.sleep(0.25)
    q2.stop()
    view2 = R.consuming_view(
        spark, SCHEMA, CFG, str(src), table,
        source_format="json", source_schema=_SRC_SCHEMA,
    )
    assert view2.count() == 2  # no duplicates after commit


def test_dedup_within_key_stateful(spark, tmp_path_factory):
    """ST6/upsert-dedup: each (key, id) is emitted exactly once across
    micro-batches; replays and cross-batch duplicates are suppressed."""
    root = tmp_path_factory.mktemp("dedup_state")
    src = root / "src"
    src.mkdir()
    _write_source_file(
        src, 0,
        [{"user": "u1", "page": "a", "n": 1, "ts_ms": BASE_MS},
         {"user": "u1", "page": "a", "n": 1, "ts_ms": BASE_MS},  # in-batch dup
         {"user": "u1", "page": "b", "n": 2, "ts_ms": BASE_MS},
         {"user": "u2", "page": "a", "n": 3, "ts_ms": BASE_MS}],
    )
    stream = spark.readStream.schema(_SRC_SCHEMA).json(str(src))
    out = R.dedup_within_key_stateful(stream, "user", "page")
    q = (
        out.writeStream.outputMode("update")
        .format("memory").queryName("dedup_state")
        .option("checkpointLocation", str(root / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # cross-batch duplicate + one genuinely new id
        _write_source_file(
            src, 1,
            [{"user": "u1", "page": "a", "n": 9, "ts_ms": BASE_MS + 1},   # dup
             {"user": "u1", "page": "c", "n": 4, "ts_ms": BASE_MS + 1}],  # new
        )
        q.processAllAvailable()
        rows = sorted(
            (r["user"], r["page"])
            for r in spark.sql("SELECT * FROM dedup_state").collect()
        )
        assert rows == [("u1", "a"), ("u1", "b"), ("u1", "c"), ("u2", "a")]
    finally:
        q.stop()


def test_stateful_timeout_expires_state(spark, tmp_path_factory):
    """The opt-in processing-time timeout must actually REMOVE state: an
    id seen before the expiry is re-emitted when it reappears after it.
    (Regression: the update fn previously re-armed the timeout instead of
    branching on state.hasTimedOut, so expiry never removed anything.)"""
    root = tmp_path_factory.mktemp("dedup_timeout")
    src = root / "src"
    src.mkdir()
    _write_source_file(
        src, 0, [{"user": "u1", "page": "a", "n": 1, "ts_ms": BASE_MS}]
    )
    stream = spark.readStream.schema(_SRC_SCHEMA).json(str(src))
    out = R.dedup_within_key_stateful(stream, "user", "page",
                                      timeout_minutes=0.02)  # 1.2 s
    q = (
        out.writeStream.outputMode("update")
        .format("memory").queryName("dedup_timeout")
        .option("checkpointLocation", str(root / "ckpt"))
        .start()
    )
    def _sink_rows():
        return [
            (r["user"], r["page"])
            for r in spark.sql("SELECT * FROM dedup_timeout").collect()
        ]

    def _wait_for(pred, seconds=60):
        deadline = time.time() + seconds
        while time.time() < deadline:
            if pred(_sink_rows()):
                return True
            time.sleep(0.25)
        return False

    # NOTE: with a registered timeout Spark schedules state-cleanup
    # batches continuously, so processAllAvailable() never settles —
    # poll the sink with deadlines instead.
    try:
        assert _wait_for(lambda rows: ("u1", "a") in rows)
        time.sleep(2.5)  # let the processing-time timeout elapse
        # a batch for ANOTHER key gives Spark a trigger in which u1's
        # timed-out state is processed and removed
        _write_source_file(
            src, 1, [{"user": "u2", "page": "z", "n": 1, "ts_ms": BASE_MS + 1}]
        )
        assert _wait_for(lambda rows: ("u2", "z") in rows)
        time.sleep(1.0)
        # the same (key, id) after expiry must be fresh again
        _write_source_file(
            src, 2, [{"user": "u1", "page": "a", "n": 9, "ts_ms": BASE_MS + 2}]
        )
        assert _wait_for(lambda rows: rows.count(("u1", "a")) == 2), _sink_rows()
    finally:
        q.stop()


def test_consuming_view_snapshot_is_race_free(spark, tmp_path_factory):
    """A batch that commits a pending source file AFTER the view is built
    but BEFORE it is actioned must not double-count that file: the
    committed half is pinned to the batch directories observed at
    construction time (regression for the committed-half-read-lazily
    TOCTOU)."""
    root = tmp_path_factory.mktemp("consuming_race")
    src = root / "src"
    src.mkdir()
    table = str(root / "table")
    _write_source_file(
        src, 0, [{"user": "u1", "page": "first", "n": 1, "ts_ms": BASE_MS}]
    )
    commit = R.make_batch_committer(SCHEMA, CFG, table, R.ConsumingState())
    commit(spark.read.schema(_SRC_SCHEMA).json(str(src / "batch_0.json")), 0)

    # a second source file is pending when the view is built
    _write_source_file(
        src, 1, [{"user": "u2", "page": "second", "n": 2, "ts_ms": BASE_MS + 1}]
    )
    view = R.consuming_view(
        spark, SCHEMA, CFG, str(src), table,
        source_format="json", source_schema=_SRC_SCHEMA,
    )
    # ... and a micro-batch commits that pending file before any action
    commit(spark.read.schema(_SRC_SCHEMA).json(str(src / "batch_1.json")), 1)
    assert spark.read.parquet(table).count() == 2  # both committed now
    # the snapshot still counts each row exactly once
    assert view.count() == 2
    assert view.filter(F.col("user") == "u2").count() == 1


def test_realtime_ingestion_transforms_and_filter(spark, tmp_path_factory):
    """ingestionConfig transforms + filterFunction apply to REALTIME
    consumption exactly as to batch (one normalize pipeline): derived
    columns appear in committed segments, filtered rows never land."""
    root = tmp_path_factory.mktemp("rt_tx")
    src = root / "src"
    src.mkdir()
    table = str(root / "table")
    schema = PinotSchema.from_json(
        {
            "schemaName": "rt_tx",
            "dimensionFieldSpecs": [
                {"name": "user", "dataType": "STRING"},
                {"name": "tier", "dataType": "STRING"},
            ],
            "dateTimeFieldSpecs": [
                {"name": "ts_ms", "dataType": "LONG",
                 "format": "1:MILLISECONDS:EPOCH", "granularity": "1:DAYS"}
            ],
        }
    )
    cfg = B.TableConfig(
        table_name="rt_tx",
        time_column="ts_ms",
        ingestion_transforms=[
            {"columnName": "tier",
             "transformFunction": "JSONPATHSTRING(payload, '$.tier', 'unknown')"},
            {"columnName": "ts_ms",
             "transformFunction": "FROMEPOCHSECONDS(epoch_s)"},
        ],
        filter_function="tier = 'bot'",
    )
    src_schema = T.StructType(
        [
            T.StructField("user", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("epoch_s", T.LongType()),
        ]
    )
    _write_source_file(
        src, 0,
        [{"user": "u1", "payload": '{"tier": "pro"}', "epoch_s": 1_700_000_000},
         {"user": "u2", "payload": '{"tier": "bot"}', "epoch_s": 1_700_000_001},
         {"user": "u3", "payload": "{}", "epoch_s": 1_700_000_002}],
    )
    state = R.ConsumingState()
    stream = spark.readStream.schema(src_schema).json(str(src))
    q = R.ingest_stream(spark, schema, cfg, stream, table, str(root / "ckpt"),
                        trigger_seconds=0.5, state=state)
    try:
        deadline = time.time() + 60
        while state.batches < 1 and time.time() < deadline:
            time.sleep(0.25)
        rows = {
            r["user"]: (r["tier"], r["ts_ms"])
            for r in spark.read.parquet(table).collect()
        }
    finally:
        q.stop()
    assert rows == {
        "u1": ("pro", 1_700_000_000_000),
        "u3": ("unknown", 1_700_000_002_000),  # default for missing path
    }  # u2 (bot) filtered before commit
