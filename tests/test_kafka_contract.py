"""Kafka-shaped realtime smoke path (S2, Architecture.md:198-204).

No broker runs in this container, so the test drives a mock source that
emits EXACTLY the Spark Kafka connector's output contract
(realtime.KAFKA_WIRE_SCHEMA: binary key/value + topic/partition/offset/
timestamp). Everything downstream of the socket — the value projection,
the shared normalize pipeline, idempotent segment commits, sub-trigger
consuming view, hybrid time-boundary federation — is the real code path
`kafka_stream` feeds, executed end-to-end."""

from __future__ import annotations

import json
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.plans.schema import PinotSchema
from apache_pinot_spark.sources import batch as B
from apache_pinot_spark.streaming import realtime as R

SCHEMA = PinotSchema.from_json(
    {
        "schemaName": "clicks_kafka",
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
    table_name="clicks_kafka_rt",
    time_column="ts_ms",
    partition_granularity="1:DAYS",
)

VALUE_DDL = "user STRING, page STRING, n LONG, ts_ms LONG"
BASE_MS = 1_700_000_000_000
TOPIC = "clicks"


def _wire_file(src_dir, idx: int, payloads: list[dict | str]) -> None:
    """One parquet file of Kafka wire records — a mock broker poll. Raw
    strings pass through unencoded to model corrupt payloads."""
    values = [
        (p if isinstance(p, str) else json.dumps(p)).encode() for p in payloads
    ]
    tbl = pa.table(
        {
            "key": pa.array([b"k%d" % i for i in range(len(values))], pa.binary()),
            "value": pa.array(values, pa.binary()),
            "topic": pa.array([TOPIC] * len(values), pa.string()),
            "partition": pa.array([i % 2 for i in range(len(values))], pa.int32()),
            "offset": pa.array(
                [idx * 1000 + i for i in range(len(values))], pa.int64()
            ),
            "timestamp": pa.array([BASE_MS * 1000] * len(values), pa.timestamp("us")),
            "timestampType": pa.array([0] * len(values), pa.int32()),
        }
    )
    pq.write_table(tbl, str(src_dir / f"poll_{idx}.parquet"))


@pytest.fixture(scope="module")
def kafka_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("kafka_rt")
    src = root / "wire"
    src.mkdir()
    table = str(root / "table")
    ckpt = str(root / "ckpt")
    _wire_file(
        src, 0,
        [{"user": "u1", "page": "kafka quickstart", "n": 1, "ts_ms": BASE_MS},
         {"user": "u2", "page": "stream table duality", "n": 2,
          "ts_ms": BASE_MS + 86_400_000}],
    )
    state = R.ConsumingState()
    raw = spark.readStream.schema(R.KAFKA_WIRE_SCHEMA).parquet(str(src))
    rows = R.kafka_value_rows(raw, VALUE_DDL)  # what kafka_stream returns
    q = R.ingest_stream(spark, SCHEMA, CFG, rows, table, ckpt,
                        trigger_seconds=0.5, state=state)
    # wait on rows, not batches: the committer bumps `batches` before the
    # read-back row count, so a batches-only wait can yield mid-commit
    deadline = time.time() + 90
    while state.rows < 2 and time.time() < deadline:
        time.sleep(0.25)
    yield spark, src, table, q, state
    q.stop()


def test_wire_records_commit_as_segments(kafka_env):
    spark, _src, table, _q, state = kafka_env
    assert state.batches >= 1 and state.rows >= 2
    got = spark.read.parquet(table)
    assert {r["user"] for r in got.select("user").collect()} >= {"u1", "u2"}
    # the shared normalize pipeline ran: time-bucket partition column exists
    assert B.TIME_BUCKET_COL in got.columns or any(
        B.TIME_BUCKET_COL in f for f in got.schema.fieldNames()
    )


def test_consuming_view_sub_trigger_freshness(kafka_env):
    """A freshly-polled wire file is queryable through consuming_view
    BEFORE any trigger commits it (ST1), via the same value projection;
    the pinned snapshot guarantees no double-count if a trigger lands
    mid-test."""
    spark, src, table, _q, _state = kafka_env
    _wire_file(src, 1, [{"user": "u3", "page": "exactly once", "n": 3,
                         "ts_ms": BASE_MS + 2 * 86_400_000}])
    view = R.consuming_view(
        spark, SCHEMA, CFG, str(src), table,
        source_format="parquet",
        source_schema=R.KAFKA_WIRE_SCHEMA,
        source_projection=lambda df: R.kafka_value_rows(df, VALUE_DDL),
    )
    rows = view.groupBy("user").agg(F.count("*").alias("c")).collect()
    by_user = {r["user"]: r["c"] for r in rows}
    assert by_user.get("u3") == 1  # visible immediately, exactly once
    assert by_user.get("u1") == 1 and by_user.get("u2") == 1
    # let the live stream commit poll_1 so later tests see stable state
    deadline = time.time() + 30
    while time.time() < deadline:
        committed = spark.read.parquet(table)
        if committed.filter(F.col("user") == "u3").count() == 1:
            break
        time.sleep(0.25)


def test_corrupt_payload_survives_as_null_row(kafka_env):
    """from_json semantics: a payload that isn't valid JSON for the value
    schema becomes an all-NULL row, runs the sentinel pass, and commits —
    the stream never dies (at 100 TB a poison message must not stall the
    consuming segment)."""
    spark, src, table, _q, state = kafka_env
    before = state.batches
    _wire_file(src, 2, ["this is not json {{{"])
    deadline = time.time() + 30
    while state.batches == before and time.time() < deadline:
        time.sleep(0.25)
    assert state.batches > before  # the poison batch committed
    got = spark.read.parquet(table)
    # sentinel discipline: the row exists with Pinot null defaults
    assert got.count() >= 4


def test_hybrid_boundary_over_kafka_table(kafka_env, tmp_path):
    """ST3 over the Kafka-shaped realtime half: offline rows strictly
    below the boundary, realtime at/after — one logical table."""
    spark, _src, table, _q, _state = kafka_env
    offline = str(tmp_path / "offline")
    spark.createDataFrame(
        [("u0", "history page", 9, BASE_MS - 86_400_000)],
        "user STRING, page STRING, n LONG, ts_ms LONG",
    ).write.parquet(offline)
    hybrid = R.hybrid_view(
        spark, "clicks_kafka_hybrid", offline, table, "ts_ms", str(BASE_MS)
    )
    users = {r["user"] for r in hybrid.select("user").collect()}
    assert "u0" in users and "u1" in users and "u2" in users
    # boundary respected: the offline row is the only one below it
    assert hybrid.filter(F.col("ts_ms") < BASE_MS).count() == 1


def test_kafka_stream_raises_without_connector(spark):
    """The real builder is honest about the classpath gap: without
    spark-sql-kafka it fails at load() with the standard data-source
    error, not a silent no-op."""
    with pytest.raises(Exception, match="(?i)kafka"):
        R.kafka_stream(spark, "localhost:9092", TOPIC, VALUE_DDL)


def test_realtime_upsert_over_consuming_view(kafka_env):
    """Stream-ingestion-with-upsert end-to-end: a newer version of an
    existing key arrives on the wire; after its batch commits, the
    upsert view over the consuming view serves exactly one row per key —
    the latest by comparison column — while the raw view keeps history."""
    spark, src, table, q, state = kafka_env
    from apache_pinot_spark.operators.upsert import UpsertConfig, upsert_view

    before = state.rows
    _wire_file(
        src, 7,
        [{"user": "u1", "page": "kafka quickstart REVISED", "n": 9,
          "ts_ms": BASE_MS + 10_000}],
    )
    deadline = time.time() + 90
    while state.rows < before + 1 and time.time() < deadline:
        time.sleep(0.25)
    view = R.consuming_view(
        spark, SCHEMA, CFG, str(src), table,
        source_format="parquet", source_schema=R.KAFKA_WIRE_SCHEMA,
        source_projection=lambda df: R.kafka_value_rows(df, VALUE_DDL),
    )
    cfg = UpsertConfig(primary_keys=["user"], comparison_column="ts_ms")
    resolved = upsert_view(view.select("user", "page", "n", "ts_ms"), cfg)
    rows = {r["user"]: (r["page"], r["n"]) for r in resolved.collect()}
    assert rows["u1"] == ("kafka quickstart REVISED", 9)  # latest version wins
    assert resolved.where("user = 'u1'").count() == 1
    # raw history keeps both versions of u1
    assert view.where("user = 'u1'").count() >= 2
