"""JSON flatten index (plans/json_flat.py): differential vs json_match's
exists() path, plan asserts (pushed filters, no JSON parse at query
time), validation, and the declared-query wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.functions.json import json_match
from apache_pinot_spark.plans import json_flat as JF

_SCHEMA = "struct<items:array<struct<qty:double,flag:string>>>"
_CTX = "$.items[*]"


def _docs(spark, n=200):
    """n docs with 0-4 items each, deterministic pseudo-random fields."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.to_json(
            F.struct(
                F.expr(
                    "transform(sequence(1, CAST(id % 5 AS INT)), i -> "
                    "named_struct('qty', CAST((id * 7 + i * 13) % 60 AS DOUBLE), "
                    "'flag', CASE WHEN (id + i) % 3 = 0 THEN 'R' ELSE 'N' END))"
                ).alias("items")
            )
        ).alias("doc"),
    )


@pytest.mark.parametrize(
    "filt",
    [
        '"$.items[*].qty">=49 AND "$.items[*].flag"=\'R\'',
        '"$.items[*].qty"<10',
        '"$.items[*].flag"=\'R\' OR "$.items[*].qty">55',
        '"$.items[*].qty" IS NOT NULL',
    ],
)
def test_flat_matches_exists_path(spark, filt):
    """The index lookup and json_match's exists() compilation must select
    the same documents — including the maintained-array-context rule
    (AND binds one element) and OR across element predicates."""
    docs = _docs(spark)
    flat = JF.flatten_array_context(docs, "doc", _SCHEMA, _CTX, ["doc_id"])
    via_flat = sorted(
        r["doc_id"]
        for r in JF.matched_ids(flat, filt, _CTX, ["doc_id"]).collect()
    )
    via_exists = sorted(
        r["doc_id"]
        for r in docs.filter(json_match("doc", filt, _SCHEMA)).collect()
    )
    assert via_flat == via_exists and len(via_flat) > 0


def test_semi_join_form_matches_filter_form(spark):
    docs = _docs(spark)
    flat = JF.flatten_array_context(docs, "doc", _SCHEMA, _CTX, ["doc_id"])
    filt = '"$.items[*].qty">=40 AND "$.items[*].flag"=\'R\''
    got = JF.json_match_via_flat(docs, flat, filt, _CTX, ["doc_id"])
    want = docs.filter(json_match("doc", filt, _SCHEMA))
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )


def test_materialized_index_plan_pushes_filters(spark, tmp_path):
    """The whole point of the index: leaf predicates reach the side
    table's parquet scan (PushedFilters), and the query-time plan
    contains no JSON parsing and no Python."""
    docs = _docs(spark)
    path = str(tmp_path / "flat_idx")
    flat = JF.materialize_flat_index(
        docs, "doc", _SCHEMA, _CTX, ["doc_id"], path, sort_col="qty"
    )
    q = JF.matched_ids(
        flat, '"$.items[*].qty">=49 AND "$.items[*].flag"=\'R\'', _CTX, ["doc_id"]
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "qty" in plan.split("PushedFilters")[1][:200]
    assert "from_json" not in plan and "FromJson" not in plan
    assert "Python" not in plan
    # partial distinct before the shuffle (map-side combine on ids)
    assert "HashAggregate" in plan


def test_scalar_array_flatten(spark):
    df = spark.createDataFrame(
        [(1, '{"tags":["a","b"]}'), (2, '{"tags":["c"]}'), (3, '{"tags":[]}')],
        "doc_id long, doc string",
    )
    flat = JF.flatten_array_context(
        df, "doc", "struct<tags:array<string>>", "$.tags[*]", ["doc_id"]
    )
    assert sorted((r["doc_id"], r["value"]) for r in flat.collect()) == [
        (1, "a"), (1, "b"), (2, "c")
    ]
    ids = JF.matched_ids(flat, '"$.tags[*]"=\'c\'', "$.tags[*]", ["doc_id"])
    assert [r["doc_id"] for r in ids.collect()] == [2]


def test_validation_errors(spark):
    docs = _docs(spark, 5)
    with pytest.raises(ValueError, match="end in"):
        JF.flatten_array_context(docs, "doc", _SCHEMA, "$.items", ["doc_id"])
    with pytest.raises(ValueError, match="one array level"):
        JF.flatten_array_context(docs, "doc", _SCHEMA, "$.a[*].b[*]", ["doc_id"])
    flat = JF.flatten_array_context(docs, "doc", _SCHEMA, _CTX, ["doc_id"])
    with pytest.raises(ValueError, match="outside the flattened context"):
        JF.matched_ids(flat, '"$.other[*].x"=1', _CTX, ["doc_id"])
    with pytest.raises(ValueError, match="nested wildcard"):
        JF.matched_ids(flat, '"$.items[*].sub[*].x"=1', _CTX, ["doc_id"])


def test_declared_query_served_from_index(spark):
    """p8_json_array_context routes through the materialized side table
    and still matches the raw-lineitem oracle shape."""
    import apache_pinot_spark.suites  # noqa: F401 (registers the queries)
    from apache_pinot_spark.querysuite import REGISTRY
    from tests.conftest import SF_SMOKE

    row = REGISTRY["p8_json_array_context"].fn(spark, SF_SMOKE).collect()[0]
    li = __import__(
        "apache_pinot_spark.catalog", fromlist=["load_tables"]
    ).load_tables(spark, SF_SMOKE, ["lineitem"])["lineitem"]
    hit = (
        li.filter((F.col("l_quantity") >= 49) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey").distinct()
    )
    want = hit.agg(
        F.count("*").alias("matched_orders"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    ).collect()[0]
    assert tuple(row) == tuple(want) and row["matched_orders"] > 0
