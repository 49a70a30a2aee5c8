"""End-to-end user journey: what a reference (Pinot) user does day to
day, executed against this engine in one flow — schema DDL, configured
batch ingest, dialect queries through the broker envelope, index-backed
rewrites, rollup acceleration, GDPR purge, retention, compaction."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import PinotCatalog
from apache_pinot_spark.plans.rollup import RollupSpec, build_rollup
from apache_pinot_spark.sources import batch as B
from apache_pinot_spark.sqlfront import PinotEngine

SCHEMA_DOC = {
    "schemaName": "clicks",
    "dimensionFieldSpecs": [
        {"name": "user_id", "dataType": "LONG"},
        {"name": "country", "dataType": "STRING"},
        {"name": "page", "dataType": "STRING"},
        {"name": "props", "dataType": "JSON"},
    ],
    "metricFieldSpecs": [{"name": "dwell_ms", "dataType": "LONG"}],
    "dateTimeFieldSpecs": [
        {"name": "ts_ms", "dataType": "LONG",
         "format": "1:MILLISECONDS:EPOCH", "granularity": "1:DAYS"}
    ],
}

BASE = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def _rows(n=2000):
    out = []
    for i in range(n):
        out.append(Row(
            user_id=i % 97,
            country=["us", "de", "jp"][i % 3],
            page=f"docs page {i % 11} about {'spark joins' if i % 5 == 0 else 'storage'}",
            props=json.dumps({"k": i % 50, "ref": "ad" if i % 7 == 0 else "organic"}),
            dwell_ms=100 + (i % 900),
            ts_ms=BASE + (i % 14) * 86_400_000 + (i % 1000),
        ))
    return out


@pytest.fixture(scope="module")
def journey(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("journey_wh"))
    cat = PinotCatalog(spark, wh)
    cat.create_schema(SCHEMA_DOC)
    cfg = B.TableConfig(
        table_name="clicks",
        time_column="ts_ms",
        partition_granularity="1:DAYS",
        sorted_column="user_id",
        bloom_filter_columns=["country"],
        timestamp_index_granularities={"ts_ms": ["DAY"]},
        text_index_columns=["page"],
        segment_partition_column="user_id",
        num_segment_partitions=4,
        retention_days=10,
    )
    path = cat.create_table("clicks", cfg, spark.createDataFrame(_rows()))
    eng = PinotEngine(spark)
    eng.register_ingested("clicks", path)
    eng.infer_json("clicks", "props")
    return spark, cat, eng, cfg, path


def test_schema_and_segments_registered(journey):
    spark, cat, eng, cfg, path = journey
    assert cat.list_schemas() == ["clicks"]
    assert cat.list_tables() == ["clicks"]
    assert len(cat.list_segments("clicks")) >= 14  # 14 days × partitions


def test_dialect_queries_through_envelope(journey):
    spark, cat, eng, cfg, path = journey
    env = eng.query(
        "SELECT country, COUNT(*) AS cnt, DISTINCTCOUNT(user_id) AS users, "
        "round(PERCENTILE(dwell_ms, 90), 3) AS p90 "
        "FROM clicks GROUP BY country ORDER BY country OPTION(timeoutMs=60000)"
    )
    assert env["exceptions"] == []
    assert [r[0] for r in env["resultTable"]["rows"]] == ["de", "jp", "us"]
    assert env["totalDocs"] == 2000 and env["numDocsScanned"] == 2000


def test_index_backed_rewrites(journey):
    spark, cat, eng, cfg, path = journey
    # timestamp index: dateTrunc('DAY', ts_ms) hits the materialized column
    rr = eng.rewrite("SELECT dateTrunc('DAY', ts_ms) AS d, COUNT(*) AS c "
                     "FROM clicks GROUP BY d ORDER BY d")
    assert "$ts_ms$DAY" in rr.sql
    # text index: TEXT_MATCH reads the tokenized shadow column
    rr2 = eng.rewrite("SELECT COUNT(*) AS c FROM clicks WHERE TEXT_MATCH(page, 'joins')")
    assert "$page$tokens" in rr2.sql
    got = eng.sql("SELECT COUNT(*) AS c FROM clicks WHERE TEXT_MATCH(page, 'joins')")
    assert got.collect()[0]["c"] == 400  # every 5th row mentions joins
    # segment partition routing: eq predicate on user_id prunes buckets
    rr3 = eng.rewrite("SELECT COUNT(*) AS c FROM clicks WHERE user_id = 11")
    assert "__segment_partition" in rr3.sql
    assert eng.sql("SELECT COUNT(*) AS c FROM clicks WHERE user_id = 11").collect()[0][
        "c"
    ] == len([r for r in _rows() if r.user_id == 11])
    # JSON_MATCH over the inferred props schema
    n_ad = eng.sql(
        """SELECT COUNT(*) AS c FROM clicks WHERE JSON_MATCH(props, '"$.ref"=''ad''')"""
    ).collect()[0]["c"]
    assert n_ad == len([r for r in _rows() if json.loads(r.props)["ref"] == "ad"])


def test_rollup_acceleration(journey, tmp_path):
    spark, cat, eng, cfg, path = journey
    spec = RollupSpec(table="clicks", dimensions=["country", "page"], metrics=["dwell_ms"])
    build_rollup(spark, spark.table("clicks"), spec, warehouse=str(tmp_path))
    eng.add_rollup(spec)
    q = ("SELECT country, COUNT(*) AS cnt, SUM(dwell_ms) AS sd FROM clicks "
         "WHERE page = 'docs page 0 about spark joins' GROUP BY country")
    hit = eng._try_rollup(eng.rewrite(q).sql)
    assert hit is not None  # dimension filter answered from the rollup
    direct = {(r["country"], r["cnt"]) for r in spark.sql(q).collect()}
    assert {(r["country"], r["cnt"]) for r in hit.collect()} == direct


def test_lifecycle_purge_retention_compaction(journey):
    spark, cat, eng, cfg, path = journey
    total = spark.read.parquet(path).count()
    # GDPR: remove two users
    purged = B.purge_records(
        spark, path, spark.createDataFrame([(7,), (13,)], "user_id LONG"), "user_id"
    )
    assert purged == len([r for r in _rows() if r.user_id in (7, 13)])
    left = spark.read.parquet(path)
    assert left.count() == total - purged
    assert left.filter(F.col("user_id").isin(7, 13)).count() == 0
    # retention: now = day 14 boundary, keep last 10 days
    dropped = B.expire_retention(spark, path, cfg, BASE + 14 * 86_400_000)
    assert dropped, "old daily segments must age out"
    kept = spark.read.parquet(path)
    assert kept.select(F.min("ts_ms")).collect()[0][0] >= BASE + 4 * 86_400_000
    # compaction: merge the per-partition files the purge rewrite left
    B.compact_segments(spark, path, target_file_bytes=1 << 30)
    again = spark.read.parquet(path)
    assert again.count() == kept.count()  # lossless
