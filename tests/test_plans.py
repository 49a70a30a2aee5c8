"""Physical-plan quality assertions (SURVEY §4) — the 100 TB checklist:
filters push to the parquet scan, projections prune columns, dimension
joins broadcast, the timestamp-index rewrite eliminates per-row
date_trunc, and the rollup rewrite answers from pre-aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.plans.rollup import RollupSpec, build_rollup
from apache_pinot_spark.plans.schema import PinotSchema
from apache_pinot_spark.sources import batch as B
from apache_pinot_spark.sqlfront import PinotEngine

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF)


def test_filter_pushdown_reaches_scan(spark, tables):
    df = tables["lineitem"].filter(F.col("l_quantity") > 45).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark, tables):
    df = tables["lineitem"].select("l_orderkey", "l_quantity")
    plan = _plan(df)
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs  # wide column pruned from the scan


def test_dimension_join_broadcasts(spark, tables):
    df = (
        tables["supplier"]
        .join(tables["nation"], tables["supplier"]["s_nationkey"] == tables["nation"]["n_nationkey"])
        .groupBy("n_name")
        .count()
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_fact_table_streams_in_star_join(spark):
    """join_customer_revenue must stream the fact table (lineitem) as the
    probe side and broadcast the pre-joined dimension side. Size-based
    planning broadcasts the fact scan whenever the local SF fits the
    threshold — survivable locally, structurally wrong at 100 TB (and the
    driver-side 600k-row hash build measured 2-21s swings in-suite)."""
    import apache_pinot_spark.suites  # noqa: F401
    from apache_pinot_spark.querysuite import REGISTRY

    plan = _plan(REGISTRY["join_customer_revenue"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    # plan text prints a BroadcastExchange directly above its build-side
    # subtree: the streamed lineitem scan must appear before every
    # BroadcastExchange, never under one
    assert plan.index("lineitem.parquet") < plan.index("BroadcastExchange")


def test_partial_aggregation_before_shuffle(spark, tables):
    df = tables["lineitem"].groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(df)
    # partial (map-side) aggregate must appear below the exchange —
    # Pinot's server-side partial aggregation (Architecture.md:117)
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_wholestage_codegen_on_scan_filter_agg(spark, tables):
    df = tables["lineitem"].filter(F.col("l_quantity") > 10).groupBy("l_returnflag").count()
    df.collect()  # AQE: codegen spans appear in the final (executed) plan
    plan = _plan(df)
    # whole-stage-codegen spans print as `*(n)` operator prefixes; the
    # scan→filter→partial-agg pipeline must be inside one
    assert "*(1) HashAggregate" in plan and "*(1) Filter" in plan


@pytest.fixture(scope="module")
def ts_indexed_engine(spark, tmp_path_factory):
    """Ingest events with a timestamp index at DAY granularity, register
    with the engine, and return both."""
    wh = str(tmp_path_factory.mktemp("wh"))
    schema = PinotSchema.from_json(
        {
            "schemaName": "events",
            "dimensionFieldSpecs": [
                {"name": "event_id", "dataType": "LONG"},
                {"name": "user_id", "dataType": "LONG"},
                {"name": "event_type", "dataType": "STRING"},
                {"name": "props", "dataType": "JSON"},
            ],
            "metricFieldSpecs": [{"name": "value", "dataType": "DOUBLE"}],
            "dateTimeFieldSpecs": [
                {"name": "ts_ms", "dataType": "LONG", "format": "1:MILLISECONDS:EPOCH",
                 "granularity": "1:DAYS"}
            ],
        }
    )
    cfg = B.TableConfig(
        table_name="events_ix",
        time_column="ts_ms",
        partition_granularity="1:DAYS",
        timestamp_index_granularities={"ts_ms": ["DAY"]},
    )
    src = load_tables(spark, SF, ["events"])["events"].withColumn(
        "ts_ms", F.unix_millis(F.col("ts").cast("timestamp"))
    )
    path = B.ingest_batch(spark, schema, cfg, src, warehouse=wh)
    eng = PinotEngine(spark)
    eng.register_ingested("events_ix", path)
    return eng, path


def test_timestamp_index_rewrite(ts_indexed_engine):
    eng, path = ts_indexed_engine
    rr = eng.rewrite(
        "SELECT dateTrunc('DAY', ts_ms) AS d, COUNT(*) AS cnt FROM events_ix GROUP BY d"
    )
    assert "`$ts_ms$DAY`" in rr.sql  # materialized column substituted
    assert "date_trunc" not in rr.sql  # no per-row truncation left
    # and it answers identically to the computed form
    got = {
        (r["d"], r["cnt"])
        for r in eng.sql(
            "SELECT dateTrunc('DAY', ts_ms) AS d, COUNT(*) AS cnt FROM events_ix GROUP BY d"
        ).collect()
    }
    want = {
        (r["d"], r["cnt"])
        for r in eng.spark.sql(
            "SELECT CAST(unix_millis(CAST(date_trunc('DAY', timestamp_millis(ts_ms)) AS TIMESTAMP)) AS BIGINT) AS d,"
            " COUNT(*) AS cnt FROM events_ix GROUP BY 1"
        ).collect()
    }
    assert got == want and len(got) > 1


def test_rollup_rewrite(spark, tables, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_rollup"))
    eng = PinotEngine(spark, SF, ["lineitem"])
    spec = RollupSpec(
        table="lineitem",
        dimensions=["l_returnflag", "l_linestatus"],
        metrics=["l_quantity", "l_extendedprice"],
    )
    build_rollup(spark, tables["lineitem"], spec, warehouse=wh)
    eng.add_rollup(spec)
    q = (
        "SELECT l_returnflag, COUNT(*) AS cnt, SUM(l_quantity) AS sq, "
        "MAX(l_extendedprice) AS mx FROM lineitem GROUP BY l_returnflag"
    )
    df = eng.sql(q)
    # the rollup answer must not scan the fact table
    plan = _plan(df)
    assert "__rollup__" in plan and "lineitem.parquet" not in plan
    got = {(r["l_returnflag"], r["cnt"], round(r["sq"], 4), r["mx"]) for r in df.collect()}
    want = {
        (r["l_returnflag"], r["cnt"], round(r["sq"], 4), r["mx"])
        for r in spark.sql(
            "SELECT l_returnflag, COUNT(*) AS cnt, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sq, "
            "MAX(l_extendedprice) AS mx FROM lineitem GROUP BY l_returnflag"
        ).collect()
    }
    assert got == want
    # uncovered query (dim outside the rollup) falls through to the fact table
    df2 = eng.sql(
        "SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey"
    )
    assert "__rollup__" not in _plan(df2)


def test_text_index_materialized_tokens(spark, tmp_path_factory):
    """ST5/P10: a table ingested with textIndexColumns carries $col$tokens;
    TEXT_MATCH through the engine reads the stored array (no re-tokenize)."""
    from apache_pinot_spark.plans.schema import PinotSchema

    wh = str(tmp_path_factory.mktemp("wh_text"))
    schema = PinotSchema.from_json(
        {
            "schemaName": "docs",
            "dimensionFieldSpecs": [
                {"name": "doc_id", "dataType": "LONG"},
                {"name": "text", "dataType": "STRING"},
            ],
        }
    )
    cfg = B.TableConfig(table_name="docs_ix", text_index_columns=["text"])
    src = load_tables(spark, SF, ["documents"])["documents"].select("doc_id", "text")
    path = B.ingest_batch(spark, schema, cfg, src, warehouse=wh)
    eng = PinotEngine(spark)
    eng.register_ingested("docs_ix", path)
    rr = eng.rewrite("SELECT COUNT(*) AS cnt FROM docs_ix WHERE TEXT_MATCH(text, 'spark AND join')")
    assert "`$text$tokens`" in rr.sql
    assert "split(lower(text)" not in rr.sql  # no inline re-tokenization
    n_indexed = eng.sql(
        "SELECT COUNT(*) AS cnt FROM docs_ix WHERE TEXT_MATCH(text, 'spark AND join')"
    ).collect()[0]["cnt"]
    # same answer as the tokenize-inline engine on the raw table
    eng2 = PinotEngine(spark, SF, ["documents"])
    n_inline = eng2.sql(
        "SELECT COUNT(*) AS cnt FROM documents WHERE TEXT_MATCH(text, 'spark AND join')"
    ).collect()[0]["cnt"]
    assert n_indexed == n_inline > 0


def test_limit_zero(spark, tables):
    # LIMIT 0 returns schema, no rows (text-search-support.md:150-153)
    df = spark.sql("SELECT l_orderkey, l_quantity FROM lineitem LIMIT 0")
    assert df.count() == 0 and len(df.schema.fields) == 2


def test_rollup_null_and_type_semantics(spark, tmp_path):
    """The round-1 advice scenario: NULL metrics/dims must not corrupt
    COUNT(col)/AVG answered from the rollup, and SUM keeps its input's
    native result type (SUM(int) stays LONG)."""
    from apache_pinot_spark.plans.rollup import (
        AggRequest,
        RollupSpec,
        answer_from_rollup,
        build_rollup,
        covers,
    )

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", None, 20), ("b", 3, None), (None, 4, 40)],
        "dim STRING, m INT, m2 INT",
    )
    spec = RollupSpec(table="nulls", dimensions=["dim"], metrics=["m", "m2"])
    build_rollup(spark, df, spec, warehouse=str(tmp_path))

    aggs = [
        AggRequest("COUNT", None, "cnt_star"),
        AggRequest("COUNT", "m", "cnt_m"),
        AggRequest("COUNT", "dim", "cnt_dim"),
        AggRequest("SUM", "m", "sum_m"),
        AggRequest("AVG", "m2", "avg_m2"),
    ]
    assert covers(spec, [], aggs)
    row = answer_from_rollup(spark, spec, [], aggs).collect()[0]
    direct = df.selectExpr(
        "COUNT(*) AS cnt_star", "COUNT(m) AS cnt_m", "COUNT(dim) AS cnt_dim",
        "SUM(m) AS sum_m", "AVG(m2) AS avg_m2",
    ).collect()[0]
    assert row["cnt_star"] == direct["cnt_star"] == 4
    assert row["cnt_m"] == direct["cnt_m"] == 3      # NULL metric skipped
    assert row["cnt_dim"] == direct["cnt_dim"] == 3  # NULL dim skipped
    assert row["sum_m"] == direct["sum_m"] == 8
    assert abs(row["avg_m2"] - direct["avg_m2"]) < 1e-12  # / non-null count
    # SUM(int) keeps an integral result type, not DOUBLE
    out = answer_from_rollup(spark, spec, [], [AggRequest("SUM", "m", "s")])
    assert dict(out.dtypes)["s"] == "bigint"


def test_segment_partition_routing_prunes_scan(spark, tmp_path):
    """Pinot segmentPartitionConfig analogue: an equality predicate on the
    partitioned column is rewritten with the matching hash-bucket
    predicate, and the parquet scan partition-prunes to 1/N of the
    segment directories."""
    import json as _json

    from apache_pinot_spark.plans.schema import PinotSchema
    from apache_pinot_spark.sources import batch as B
    from apache_pinot_spark.sqlfront import PinotEngine

    sch = PinotSchema.from_json(_json.dumps({
        "schemaName": "ev",
        "dimensionFieldSpecs": [
            {"name": "user_id", "dataType": "LONG"},
            {"name": "event_type", "dataType": "STRING"},
        ],
        "metricFieldSpecs": [{"name": "value", "dataType": "DOUBLE"}],
        "dateTimeFieldSpecs": [
            {"name": "ts_ms", "dataType": "LONG",
             "format": "1:MILLISECONDS:EPOCH", "granularity": "1:DAYS"}
        ],
    }))
    from pyspark.sql import Row

    rows = [
        Row(user_id=i, event_type=f"t{i % 3}", value=float(i),
            ts_ms=1_700_000_000_000 + (i % 2) * 86_400_000)
        for i in range(200)
    ]
    cfg = B.TableConfig(
        table_name="ev_routed",
        time_column="ts_ms",
        segment_partition_column="user_id",
        num_segment_partitions=8,
    )
    path = B.ingest_batch(spark, sch, cfg, spark.createDataFrame(rows),
                          warehouse=str(tmp_path), mode="overwrite")
    eng = PinotEngine(spark)
    eng.register_ingested("ev_routed", path)

    # the rewrite adds the bucket predicate
    rr = eng.rewrite("SELECT COUNT(*) AS c FROM ev_routed WHERE user_id = 42")
    assert "__segment_partition" in rr.sql and "xxhash64" in rr.sql

    df = eng.sql("SELECT COUNT(*) AS c FROM ev_routed WHERE user_id = 42")
    assert df.collect()[0][0] == 1  # correctness under the extra predicate
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition filters present → only 1/8 of each day's directories read
    assert "__segment_partition" in plan
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__segment_partition" in m.group(1), plan[:2000]
    # a non-equality query is untouched
    rr2 = eng.rewrite("SELECT COUNT(*) AS c FROM ev_routed WHERE user_id > 42")
    assert "__segment_partition" not in rr2.sql


def test_multi_column_segment_partition_routing(spark, tmp_path):
    """segmentPartitionConfig with SEVERAL partitioned columns: each gets
    its own bucket directory level, and predicates on any subset prune
    multiplicatively (user_id=… AND event_type=… touches 1/(N_u·N_e) of
    each day's directories)."""
    import json as _json
    import re as _re

    from apache_pinot_spark.plans.schema import PinotSchema
    from apache_pinot_spark.sources import batch as B
    from apache_pinot_spark.sqlfront import PinotEngine
    from pyspark.sql import Row

    sch = PinotSchema.from_json(_json.dumps({
        "schemaName": "ev2",
        "dimensionFieldSpecs": [
            {"name": "user_id", "dataType": "LONG"},
            {"name": "event_type", "dataType": "STRING"},
        ],
        "metricFieldSpecs": [{"name": "value", "dataType": "DOUBLE"}],
        "dateTimeFieldSpecs": [
            {"name": "ts_ms", "dataType": "LONG",
             "format": "1:MILLISECONDS:EPOCH", "granularity": "1:DAYS"}
        ],
    }))
    rows = [
        Row(user_id=i, event_type=f"t{i % 3}", value=float(i),
            ts_ms=1_700_000_000_000)
        for i in range(300)
    ]
    cfg = B.TableConfig(
        table_name="ev_routed2",
        time_column="ts_ms",
        segment_partition_columns={"user_id": 4, "event_type": 4},
    )
    path = B.ingest_batch(spark, sch, cfg, spark.createDataFrame(rows),
                          warehouse=str(tmp_path), mode="overwrite")
    # both bucket directory levels exist on disk
    import os

    day_dir = next(p for p in os.listdir(path) if p.startswith("__time_bucket"))
    u_dir = next(p for p in os.listdir(os.path.join(path, day_dir))
                 if p.startswith("__segment_partition_user_id"))
    assert any(
        p.startswith("__segment_partition_event_type")
        for p in os.listdir(os.path.join(path, day_dir, u_dir))
    )

    eng = PinotEngine(spark)
    eng.register_ingested("ev_routed2", path)
    sql = ("SELECT COUNT(*) AS c FROM ev_routed2 "
           "WHERE user_id = 42 AND event_type = 't0'")
    rr = eng.rewrite(sql)
    assert "__segment_partition_user_id" in rr.sql
    assert "__segment_partition_event_type" in rr.sql

    df = eng.sql(sql)
    assert df.collect()[0][0] == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan[:2000]
    assert "__segment_partition_user_id" in m.group(1)
    assert "__segment_partition_event_type" in m.group(1)


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count must
    sort-merge join with ZERO exchanges — the co-located join shape that
    makes 100 TB fact-fact joins affordable."""
    import json as _json

    from pyspark.sql import Row

    from apache_pinot_spark.plans.schema import PinotSchema
    from apache_pinot_spark.sources import batch as B

    def mk_schema(name, extra):
        return PinotSchema.from_json(_json.dumps({
            "schemaName": name,
            "dimensionFieldSpecs": [
                {"name": "k", "dataType": "LONG"},
                {"name": extra, "dataType": "STRING"},
            ],
            "metricFieldSpecs": [], "dateTimeFieldSpecs": [],
        }))

    left = [Row(k=i % 50, a=f"a{i}") for i in range(500)]
    right = [Row(k=i % 50, b=f"b{i}") for i in range(300)]
    B.ingest_bucketed(
        spark, mk_schema("l", "a"), B.TableConfig(table_name="bk_left"),
        spark.createDataFrame(left), "k", 8, warehouse=str(tmp_path),
    )
    B.ingest_bucketed(
        spark, mk_schema("r", "b"), B.TableConfig(table_name="bk_right"),
        spark.createDataFrame(right), "k", 8, warehouse=str(tmp_path),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.sql(
            "SELECT l.k, l.a, r.b FROM bk_left l JOIN bk_right r ON l.k = r.k"
        )
        assert j.count() == sum(1 for x in left for y in right if x.k == y.k)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_table_reattaches_in_catalog(spark, tmp_path):
    import json as _json

    from pyspark.sql import Row

    from apache_pinot_spark.plans.schema import PinotSchema
    from apache_pinot_spark.sources import batch as B

    sch = PinotSchema.from_json(_json.dumps({
        "schemaName": "s",
        "dimensionFieldSpecs": [{"name": "k", "dataType": "LONG"},
                                {"name": "v", "dataType": "STRING"}],
        "metricFieldSpecs": [], "dateTimeFieldSpecs": [],
    }))
    path = B.ingest_bucketed(
        spark, sch, B.TableConfig(table_name="bk_re"),
        spark.createDataFrame([Row(k=1, v="x"), Row(k=2, v="y")]),
        "k", 4, warehouse=str(tmp_path),
    )
    spark.sql("DROP TABLE bk_re")  # simulate a fresh session
    B.register_bucketed(spark, "bk_re", path)
    assert spark.sql("SELECT COUNT(*) FROM bk_re").collect()[0][0] == 2
    # bucket spec survived re-registration
    desc = spark.sql("DESCRIBE EXTENDED bk_re").collect()
    txt = "\n".join(str(r) for r in desc)
    assert "Num Buckets" in txt and "4" in txt
    spark.sql("DROP TABLE IF EXISTS bk_re")


def test_incremental_rollup_maintenance(spark, tmp_path):
    """Krypton-style MV maintenance: per-batch partial rows appended to
    the rollup keep covered queries EXACT with O(batch) work; compaction
    re-merges without changing any answer."""
    from apache_pinot_spark.plans.rollup import (
        AggRequest,
        RollupSpec,
        answer_from_rollup,
        append_rollup_delta,
        build_rollup,
        compact_rollup,
    )

    full = spark.createDataFrame(
        [(f"k{i % 5}", i % 13, float(i % 7)) for i in range(2000)],
        "dim STRING, m INT, m2 DOUBLE",
    )
    first, second = full.filter("m % 2 = 0"), full.filter("m % 2 = 1")
    spec = RollupSpec(table="inc", dimensions=["dim"], metrics=["m", "m2"])
    build_rollup(spark, first, spec, warehouse=str(tmp_path))
    append_rollup_delta(spark, second, spec)  # the streamed batch

    aggs = [
        AggRequest("COUNT", None, "cnt"),
        AggRequest("SUM", "m", "sm"),
        AggRequest("MIN", "m2", "mn"),
        AggRequest("MAX", "m2", "mx"),
        AggRequest("AVG", "m", "av"),
    ]

    def canon(df):
        return {
            r["dim"]: (r["cnt"], r["sm"], r["mn"], r["mx"], round(r["av"], 9))
            for r in df.collect()
        }

    direct = canon(full.groupBy("dim").agg(
        F.count("*").alias("cnt"), F.sum("m").alias("sm"),
        F.min("m2").alias("mn"), F.max("m2").alias("mx"), F.avg("m").alias("av"),
    ))
    got = canon(answer_from_rollup(spark, spec, ["dim"], aggs))
    assert got == direct

    # rollup currently holds per-batch partial rows (> #dims combos)
    from apache_pinot_spark.plans.rollup import rollup_df

    assert rollup_df(spark, spec).count() > 5
    compact_rollup(spark, spec)
    assert rollup_df(spark, spec).count() == 5  # one row per dim again
    assert canon(answer_from_rollup(spark, spec, ["dim"], aggs)) == direct
    # appends after compaction remain schema-compatible
    append_rollup_delta(spark, second.limit(10), spec)
    assert answer_from_rollup(
        spark, spec, ["dim"], [AggRequest("COUNT", None, "cnt")]
    ).agg(F.sum("cnt")).collect()[0][0] == 2010


# --------------------------------------------------------------------------
# Sweeping anti-pattern net over EVERY declared driver query (round 5):
# one test that catches a scale regression in any of the 50 plans before
# the bench does. Checked on the compiled physical plan, not execution.
# --------------------------------------------------------------------------


def test_declared_plans_free_of_scale_antipatterns(spark):
    """No unbounded cartesian products and no row-at-a-time Python UDFs
    (BatchEvalPython) anywhere in the declared suite. Arrow-batched
    Python (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the
    sanctioned slow path; BroadcastNestedLoopJoin is allowed ONLY for the
    operators that deliberately broadcast a tiny query side (brute-force
    ANN and its near-dup wrapper)."""
    import apache_pinot_spark.suites  # noqa: F401  (populate the registry)
    from apache_pinot_spark import querysuite

    # deliberate tiny-side broadcast cross joins (documented in
    # operators/similarity.py): the broadcast side is bounded by
    # construction, so the nested-loop join is the intended plan
    bnlj_ok = {
        "sim_ann_family",  # brute/LSH/IVF union — each leg's tiny broadcast
        "sim_cosine_near_dup_pairs",
        # single-ROW build side (a global aggregate attached to every row —
        # the scalar-subquery shape): nested-loop against one broadcast row
        # is a constant-attach, not a quadratic join
        "a6_hll_sketch_bytes",     # merged-sketch row × estimate projection
        "dedup_exact_groups",      # global dup-stats row × group rows
        "eng_approx_aggs",         # 1-row percentile frame × 1-row HLL frame
        "dsir_doc_scores",         # 1-row corpus totals × ≤4096-row weights
        "stats_moment_pack",       # 1-row moment frame × 1-row geo frame (r8 fold)
        "p5_p7_predicates",        # 1-row orders aggregate × 1-row MV count (r8 fold)
    }
    offenders: dict[str, list[str]] = {}
    for name in sorted(querysuite.REGISTRY):
        df = querysuite.REGISTRY[name].fn(spark, SF)
        plan = _plan(df)
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython(row-at-a-time Python UDF)")
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad.append("BroadcastNestedLoopJoin(unexpected)")
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


# --------------------------------------------------------------------------
# Round-8 operator plan shapes: LM scoring, IVF+PQ, BPE, pipeline
# --------------------------------------------------------------------------


def test_lm_scoring_plan_broadcasts_model_one_shuffle(spark, tables):
    """lm_doc_scores: both model joins must be BroadcastHashJoins and the
    only Exchange below the final aggregate is the groupBy(doc) — the
    corpus never shuffles to meet the model."""
    from apache_pinot_spark.operators import lm

    docs = tables["documents"]
    model = lm.train_bigram_lm(docs.filter(F.col("lang") == "en"),
                               vocab_size=200, bigram_size=400)
    plan = _plan(lm.lm_doc_scores(docs, model))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # exchanges: one hash partition for the groupBy + the _spread
    # repartition of the small scan + 2 broadcast exchanges
    non_broadcast = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
    ]
    assert len(non_broadcast) <= 2, non_broadcast


def test_fused_kn_bigram_scoring_plan_one_corpus_exchange(spark, tables):
    """kn_bigram_doc_scores (r13 fused scorer): every model join — KN
    prob/backoff tables per order, bigram table, both unigram tables —
    must be a BroadcastHashJoin, and the only non-broadcast Exchanges
    are the groupBy(doc) + the _spread repartition: ONE corpus-scale
    shuffle scores both estimators (the fusion's whole value is this
    plan shape)."""
    from apache_pinot_spark.operators import knlm, lm

    docs = tables["documents"]
    ref = docs.filter(F.col("lang") == "en")
    kn, bg = knlm.train_kn_bigram_lm(ref, order=3,
                                     prune={1: 100, 2: 200, 3: 200},
                                     ctx_prune={2: 100, 3: 100},
                                     vocab_size=200, bigram_size=400)
    plan = _plan(knlm.kn_bigram_doc_scores(docs, kn, bg))
    # order 3: p2/b2/p3/b3/p1 (5 KN joins) + bigram + unigram = 7
    assert plan.count("BroadcastHashJoin") == 7, \
        plan.count("BroadcastHashJoin")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    non_broadcast = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
    ]
    assert len(non_broadcast) <= 2, non_broadcast
    # one corpus scan feeds the fused walk (model tables are checkpoint
    # blocks, not parquet): the scored documents scan and nothing else
    scans = [ln for ln in plan.splitlines()
             if "Scan parquet" in ln or "FileScan" in ln]
    assert len(scans) <= 1, scans


def test_ivfpq_query_plan_shapes(spark, tables):
    """ivfpq_query: probes and survivors are the broadcast sides; no
    sort-merge join or cartesian product anywhere; Python runs only as
    Arrow passes."""
    from apache_pinot_spark.operators import pq

    emb = tables["embeddings"]
    idx = pq.ivfpq_index(emb, 64, num_clusters=8, m=8, ksub=16)
    q = emb.filter(F.col("vec_id") % 100 == 7).limit(3)
    plan = _plan(pq.ivfpq_query(idx, q, k=3, nprobe=4))
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan  # Arrow only
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # probes + survivors/queries


def test_bpe_encode_plan_is_map_side(spark, tables):
    """bpe_encode after the _spread repartition is pure map-side Arrow:
    no aggregate, no join, no further exchange."""
    from apache_pinot_spark.operators import bpe

    docs = tables["documents"].limit(50)
    merges = bpe.train_bpe(docs, num_merges=20)
    plan = _plan(bpe.bpe_encode(tables["documents"], merges))
    assert "MapInPandas" in plan
    assert "Join" not in plan and "HashAggregate" not in plan
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange" in ln and "Reused" not in ln]
    assert len(exchanges) <= 1, exchanges  # only the small-scan _spread


def test_pipeline_map_stages_fuse_into_one_scan(spark, tables):
    """quality/langid filtering + PII redaction are scan-stage work: with
    the shuffle stages disabled the whole pipeline (minus the split
    label, also map-side) plans with ZERO exchanges."""
    from apache_pinot_spark.operators import pipeline as P

    cfg = P.CurationConfig(exact_dedup=False, boilerplate=False,
                           near_dedup=False, decontaminate=False)
    stages = P.curate_corpus(tables["documents"], cfg)
    plan = _plan(stages["splits"])
    assert "Exchange" not in plan and "Join" not in plan, plan[:2000]
