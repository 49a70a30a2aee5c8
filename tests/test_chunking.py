"""Chunking + deterministic splits (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import chunking as CH


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_chunking_no_overlap(spark):
    df = _doc(spark, " ".join(f"t{i}" for i in range(10)))
    out = CH.chunk_documents(df, window_tokens=4).orderBy("chunk_index").collect()
    assert [(r["chunk_index"], r["chunk_text"], r["n_tokens"]) for r in out] == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t4 t5 t6 t7", 4),
        (2, "t8 t9", 2),  # stride-aligned tail kept, padded downstream
    ]


def test_chunking_overlap_and_min_tokens(spark):
    df = _doc(spark, "a b c d e")
    out = CH.chunk_documents(
        df, window_tokens=3, stride_tokens=2, min_tokens=2
    ).orderBy("chunk_index").collect()
    assert [r["chunk_text"] for r in out] == ["a b c", "c d e"]
    # start 5 would yield 1-token chunk 'e' -> dropped by min_tokens=2


def test_chunking_edge_cases_and_validation(spark):
    assert CH.chunk_documents(_doc(spark, "   "), window_tokens=4).count() == 0
    assert CH.chunk_documents(_doc(spark, "one"), window_tokens=4).count() == 1
    with pytest.raises(ValueError, match="window_tokens"):
        CH.chunk_documents(_doc(spark, "x"), window_tokens=0)
    with pytest.raises(ValueError, match="stride_tokens"):
        CH.chunk_documents(_doc(spark, "x"), window_tokens=4, stride_tokens=5)


def test_chunking_is_map_side_only(spark):
    plan = CH.chunk_documents(
        _doc(spark, "a b c"), window_tokens=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_chunking_real_documents(spark):
    from apache_pinot_spark.catalog import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE)["documents"]
    out = CH.chunk_documents(docs, window_tokens=64, stride_tokens=48)
    assert out.count() >= docs.where("text IS NOT NULL AND trim(text) != ''").count()
    assert out.agg(F.max("n_tokens")).collect()[0][0] <= 64


def test_splits_deterministic_and_keyed(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    a = CH.assign_splits(df, "doc_id")
    b = CH.assign_splits(df, "doc_id")
    assert a.exceptAll(b).count() == 0  # bit-stable across runs
    resalted = CH.assign_splits(df, "doc_id", salt="v2")
    moved = a.join(resalted.withColumnRenamed("split", "s2"), "doc_id").where(
        "split != s2"
    ).count()
    assert moved > 0  # a new salt re-deals
    # distribution ~ 98/1/1 at per-mille resolution
    dist = {r["split"]: r["c"] for r in a.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert abs(dist["train"] - 9800) < 200
    assert 0 < dist["validation"] < 300 and 0 < dist["test"] < 300
    # keyed: all chunks of one doc share its split
    chunks = CH.chunk_documents(
        spark.createDataFrame([(7, " ".join("w" * 9))], "doc_id long, text string"),
        window_tokens=3,
    )
    labeled = CH.assign_splits(chunks, "doc_id")
    assert labeled.select("split").distinct().count() == 1


def test_splits_fraction_validation(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="sum to 1.0"):
        CH.assign_splits(df, "k", fractions={"a": 0.5, "b": 0.4})
    custom = CH.assign_splits(df, "k", fractions={"a": 0.5, "b": 0.5})
    assert set(r["split"] for r in custom.collect()) <= {"a", "b"}


def test_stratified_sample_exact_counts_and_determinism(spark):
    from apache_pinot_spark.operators.chunking import stratified_sample_exact

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    s1 = stratified_sample_exact(df, ["lang"], 20, "doc_id")
    got = {r["lang"]: 0 for r in s1.collect()}
    for r in s1.collect():
        got[r["lang"]] += 1
    assert got == {"a": 20, "b": 20, "c": 20, "tiny": 1}  # small stratum keeps all

    # deterministic: identical call -> identical sample; new salt re-deals
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample_exact(df, ["lang"], 20, "doc_id").collect()
    )
    assert ids1 == ids2
    ids3 = sorted(
        r["doc_id"]
        for r in stratified_sample_exact(df, ["lang"], 20, "doc_id", salt="v2").collect()
    )
    assert ids1 != ids3 and len(ids3) == len(ids1)


def test_stratified_sample_exact_dict_budgets(spark):
    from apache_pinot_spark.operators.chunking import stratified_sample_exact

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample_exact(df, ["lang"], {("a",): 5, ("b",): 10}, "doc_id")
    got = {}
    for r in out.collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got == {"a": 5, "b": 10}  # 'c' absent from the budget -> dropped

    import pytest as _pt

    with _pt.raises(ValueError, match="does not match strata"):
        stratified_sample_exact(df, ["lang"], {("a", "x"): 5}, "doc_id")
    with _pt.raises(ValueError, match="at least one stratum"):
        stratified_sample_exact(df, [], 5, "doc_id")


def test_stratified_sample_exact_budget_validation(spark):
    from apache_pinot_spark.operators.chunking import stratified_sample_exact
    import pytest as _pt

    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with _pt.raises(ValueError, match="empty budget"):
        stratified_sample_exact(df, ["lang"], {}, "doc_id")
    with _pt.raises(ValueError, match="must be >= 1"):
        stratified_sample_exact(df, ["lang"], {("a",): 0}, "doc_id")


def test_portable_splits_match_duckdb_and_fractions(spark, duck):
    """portable=True split assignment replays exactly in SQL (md5-prefix
    thresholds as shared literals) and lands near the requested 98/1/1."""
    import pandas as pd
    from pyspark.sql import functions as F

    from apache_pinot_spark.operators.chunking import (
        assign_splits,
        portable_split_threshold,
    )

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    got = (
        assign_splits(
            df, "doc_id",
            {"train": 0.98, "val": 0.01, "test": 0.01},
            salt="v1", portable=True,
        )
        .groupBy("split").count().orderBy("split").collect()
    )
    t_hi, v_hi = portable_split_threshold(980), portable_split_threshold(990)
    want = duck.sql(f"""
        SELECT split, COUNT(*) AS count FROM (
          SELECT CASE WHEN pfx < '{t_hi}' THEN 'train'
                      WHEN pfx < '{v_hi}' THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT substr(md5(CAST(r AS VARCHAR) || 'v1'), 1, 8) AS pfx
                FROM range(5000) t(r))
        ) GROUP BY split ORDER BY split
    """).fetchall()
    assert [(r["split"], r["count"]) for r in got] == [tuple(w) for w in want]
    counts = {r["split"]: r["count"] for r in got}
    assert abs(counts["train"] / 5000 - 0.98) < 0.01
    # boundary sentinel: 1000 mills maps ABOVE every hex prefix
    assert portable_split_threshold(1000) == "g" > "ffffffff"


def test_portable_sampler_matches_duckdb_md5_ranking(spark, duck):
    """portable=True ranks by md5(CAST(key AS STRING) || salt) so a SQL
    oracle replays the exact member selection (r10, feeds the gated
    pipeline's source_cap stage)."""
    from apache_pinot_spark.operators.chunking import stratified_sample_exact

    rows = [(i, "ab"[i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = sorted(
        (r["lang"], r["doc_id"])
        for r in stratified_sample_exact(
            df, ["lang"], 30, "doc_id", salt="v1", portable=True
        ).collect()
    )
    duck.sql("CREATE OR REPLACE TABLE t AS SELECT unnest(range(200)) AS doc_id")
    want = sorted(
        (r[0], r[1])
        for r in duck.sql(
            """
            SELECT lang, doc_id FROM (
              SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS lang,
                     doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || 'v1'), doc_id
                     ) AS rk
              FROM t)
            WHERE rk <= 30
            """
        ).fetchall()
    )
    assert got == want and len(got) == 60


def test_cap_source_share_portable_flag_changes_members_not_counts(spark):
    from apache_pinot_spark.operators.chunking import cap_source_share

    rows = [(i, f"s{min(i % 10, 3)}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    # share 0.3 binds the dominant source without collapsing (0.2 < 1/4
    # would hit the documented degenerate empty fixed point here)
    a = cap_source_share(df, "source", 0.3, key_col="doc_id")
    b = cap_source_share(df, "source", 0.3, key_col="doc_id", portable=True)
    ca = {r["source"]: r["n"] for r in
          a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    cb = {r["source"]: r["n"] for r in
          b.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert ca == cb  # budgets identical; only the ranked members differ
    assert set(ca) == {"s0", "s1", "s2", "s3"}


def _driver_fixed_point(counts: dict, share: float):
    """Reference replica of the driver-loop fixed point (same float ops):
    returns k* = floor(share * N*), or None when nobody is capped, 0 when
    the corpus collapses."""
    n = sum(counts.values())
    while True:
        cap = int(share * n)
        budgets = {s: min(c, cap) for s, c in counts.items()}
        n2 = sum(budgets.values())
        if n2 == n:
            break
        n = n2
        if n == 0:
            return 0
    if all(budgets[s] == counts[s] for s in counts):
        return None  # passthrough
    return cap


def test_cap_source_share_distributed_matches_driver_loop(spark):
    """r11: past max_domains the fixed point solves DISTRIBUTED
    (closed-form over the distinct-count-value rollup + float-exact
    verification sweep) — per-source survivor counts must equal the
    driver loop's min(count_s, k*) budgets across distributions,
    including the degenerate empty and passthrough regimes."""
    import random

    from apache_pinot_spark.operators.chunking import cap_source_share

    rng = random.Random(411)
    cases = [
        ({f"s{i}": max(1, 200 // (i + 1)) for i in range(12)}, 0.09),
        ({f"s{i}": max(1, 200 // (i + 1)) for i in range(12)}, 0.055),
        ({f"s{i}": 20 for i in range(10)}, 0.09),   # < 1/S -> empty corpus
        ({f"s{i}": 20 for i in range(10)}, 0.5),    # nobody capped
        ({"big": 500, **{f"t{i}": rng.randrange(1, 15) for i in range(15)}},
         0.3),
        ({"only": 73}, 0.4),                         # single source: empty
        ({"only": 73}, 1.0),                         # share=1 passthrough
        ({f"s{i}": rng.randrange(1, 60) for i in range(25)}, 0.07),
    ]
    for counts, share in cases:
        rows = []
        k = 0
        for s, c in counts.items():
            for _ in range(c):
                rows.append((k, s))
                k += 1
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        kstar = _driver_fixed_point(counts, share)
        got = cap_source_share(df, "source", share, key_col="doc_id",
                               max_domains=1)  # force the distributed path
        per_source = {r["source"]: r["n"] for r in got.groupBy("source")
                      .agg(F.count("*").alias("n")).collect()}
        if kstar is None:
            want = dict(counts)  # passthrough
        elif kstar == 0:
            want = {}
        else:
            want = {s: min(c, kstar) for s, c in counts.items()
                    if min(c, kstar) > 0}
        assert per_source == want, (share, kstar, per_source, want)

    # member-level equality on one binding case: the distributed path's
    # integer-budget rank selection picks the SAME rows as the driver
    # dict-budget path
    rows = [(i, f"s{min(i % 10, 3)}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    fast = cap_source_share(df, "source", 0.3, key_col="doc_id")
    dist = cap_source_share(df, "source", 0.3, key_col="doc_id",
                            max_domains=1)
    assert sorted(r.doc_id for r in fast.collect()) == \
           sorted(r.doc_id for r in dist.collect())
