"""DSIR importance resampling — differential + invariant tests.

The hashed-feature pipeline (tokenize → 1..2-grams → md5-substring
bucket) is string-exact across engines, so bucket counts and decimal
scores get DuckDB differentials; the weight table's one float op (ln)
is tolerance-checked, and the score differential inlines the ENGINE's
quantized weights as SQL literals (the LSH-plane-literal pattern), which
keeps the decimal sums bit-exact on both sides.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.operators import dsir
from tests.conftest import SF_CORRECTNESS

_TOKS_CTE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM (
    SELECT doc_id, unnest(t) AS g FROM toks
    UNION ALL
    SELECT doc_id, t[i] || ' ' || t[i+1] AS g
    FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-1, 0))) AS i) s
  )
)
"""


def _docs(spark):
    return load_tables(spark, SF_CORRECTNESS)["documents"].select("doc_id", "text", "source")


def _target(docs):
    return docs.filter(F.col("doc_id") % 10 == 3)


def test_hashed_ngram_counts_match_duckdb(spark, duck):
    got = {
        r["bucket"]: r["cnt"]
        for r in dsir.hashed_ngram_counts(_docs(spark), "text").collect()
    }
    want = dict(
        duck.sql(_TOKS_CTE + "SELECT bucket, count(*) FROM grams GROUP BY bucket").fetchall()
    )
    assert got == want and len(got) > 100


def test_grams_fixture_no_spurious_tail(spark):
    """concat_ws skips nulls — the bigram array must trim the padded tail
    (a one-token doc has ZERO bigrams, not a spurious unigram)."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha beta"), (3, ""), (4, None)],
        "doc_id BIGINT, text STRING",
    )
    rows = df.select(
        "doc_id", dsir._grams(F.col("text"), 2).alias("g")
    ).collect()
    by_id = {r.doc_id: r.g for r in rows}
    assert by_id[1] == ["alpha"]
    assert by_id[2] == ["alpha", "beta", "alpha beta"]
    assert by_id[3] == []
    assert by_id[4] is None


def test_dsir_weights_match_duckdb(spark, duck):
    docs = _docs(spark)
    got = {
        r["bucket"]: float(r["weight"])
        for r in dsir.dsir_log_weights(docs, _target(docs), "text").collect()
    }
    lam, B = 1.0, 16 ** 3
    want_rows = duck.sql(
        _TOKS_CTE
        + f"""
, tc AS (SELECT bucket, count(*) AS c FROM grams WHERE doc_id % 10 = 3 GROUP BY bucket),
rc AS (SELECT bucket, count(*) AS c FROM grams GROUP BY bucket),
tt AS (SELECT sum(c) AS t FROM tc), rt AS (SELECT sum(c) AS t FROM rc)
SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
       ln( ((coalesce(tc.c,0) + {lam}) / (tt.t + {lam} * {B}))
         / ((coalesce(rc.c,0) + {lam}) / (rt.t + {lam} * {B})) ) AS w
FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket, tt, rt
"""
    ).fetchall()
    want = {b: w for b, w in want_rows}
    assert set(got) == set(want)
    for b in got:
        assert abs(got[b] - want[b]) < 1e-9, (b, got[b], want[b])


def test_dsir_log_weights_split_identical_to_two_corpus(spark):
    """The single-pass subset form must be bit-identical to the generic
    two-corpus form (same float expression shape → same doubles)."""
    docs = _docs(spark)
    two = {
        r["bucket"]: r["weight"]
        for r in dsir.dsir_log_weights(docs, _target(docs), "text").collect()
    }
    one = {
        r["bucket"]: r["weight"]
        for r in dsir.dsir_log_weights_split(docs, F.col("doc_id") % 10 == 3, "text").collect()
    }
    assert one == two


def test_dsir_scores_match_duckdb_exactly(spark, duck):
    """Engine-quantized weights inlined as oracle literals → the decimal
    sums must agree EXACTLY (order-independent aggregation)."""
    docs = _docs(spark)
    weights = dsir.dsir_log_weights(docs, _target(docs), "text")
    wrows = weights.collect()
    assert len(wrows) <= 16 ** 3
    values = ",".join(f"('{r['bucket']}', {r['weight']})" for r in wrows)
    got = {
        r["doc_id"]: r["score"] for r in dsir.dsir_scores(docs, weights, "text").collect()
    }
    want_rows = duck.sql(
        _TOKS_CTE
        + f"""
, w(bucket, weight) AS (VALUES {values}),
s AS (
  SELECT g.doc_id, CAST(sum(CAST(w.weight AS DECIMAL(26,12))) AS DECIMAL(38,12)) AS score
  FROM grams g JOIN w ON w.bucket = g.bucket GROUP BY g.doc_id
)
SELECT d.doc_id, coalesce(s.score, 0) AS score
FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
"""
    ).fetchall()
    want = {i: Decimal(s) for i, s in want_rows}
    assert got == want
    # scores must actually separate target-like from other docs
    assert len({v for v in got.values()}) > 10


def test_dsir_scores_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, ""), (3, None), (4, "lorem ipsum dolor sit")],
        "doc_id BIGINT, text STRING",
    )
    target = docs.filter("doc_id = 1")
    w = dsir.dsir_log_weights(docs, target, "text")
    got = {r.doc_id: r.score for r in dsir.dsir_scores(docs, w, "text").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == Decimal("0.000000000000") and got[3] == Decimal("0.000000000000")
    assert got[1] > 0  # doc 1 IS the target distribution
    assert got[4] < 0  # doc 4 shares nothing with the target


def test_dsir_resample_exact_deterministic_and_enriched(spark):
    docs = _docs(spark)
    target = _target(docs)
    w = dsir.dsir_log_weights(docs, target, "text")
    sel1 = dsir.dsir_resample(docs, w, 40, "text", temperature=0.5, salt="a")
    sel2 = dsir.dsir_resample(docs, w, 40, "text", temperature=0.5, salt="a")
    r1 = [(r.doc_id, r.score, r.key) for r in sel1.collect()]
    r2 = [(r.doc_id, r.score, r.key) for r in sel2.collect()]
    assert r1 == r2 and len(r1) == 40
    # resampling must enrich toward high-importance docs
    all_scores = {r.doc_id: float(r.score) for r in dsir.dsir_scores(docs, w, "text").collect()}
    sel_mean = sum(float(s) for _, s, _ in r1) / len(r1)
    corpus_mean = sum(all_scores.values()) / len(all_scores)
    assert sel_mean > corpus_mean
    # a different salt re-deals the Gumbels: same size, generally different set
    r3 = [(r.doc_id,) for r in dsir.dsir_resample(docs, w, 40, "text", temperature=0.5, salt="b").collect()]
    assert len(r3) == 40
    assert {t[0] for t in r3} != {t[0] for t in r1}


def test_dsir_resample_threshold_variant(spark):
    docs = _docs(spark)
    w = dsir.dsir_log_weights(docs, _target(docs), "text")
    total = docs.count()
    n = total // 4
    sel = dsir.dsir_resample(docs, w, n, "text", exact=False).collect()
    assert 0.7 * n <= len(sel) <= 1.3 * n
    # threshold semantics: everything returned clears one global cutoff
    keys = sorted(r.key for r in sel)
    exact = dsir.dsir_resample(docs, w, len(sel), "text").collect()
    assert {r.doc_id for r in exact} == {r.doc_id for r in sel}


def test_dsir_resample_bounds(spark):
    import pytest

    docs = _docs(spark)
    w = dsir.dsir_log_weights(docs, _target(docs), "text")
    with pytest.raises(ValueError, match="max_exact_n"):
        dsir.dsir_resample(docs, w, 101, "text", max_exact_n=100)
    with pytest.raises(ValueError, match="smoothing"):
        dsir.dsir_log_weights(docs, _target(docs), "text", smoothing=0.0)
    with pytest.raises(ValueError, match="hash_chars"):
        dsir.dsir_log_weights(docs, _target(docs), "text", hash_chars=0)


def test_bucket_hash_fast_path_end_to_end(spark):
    """bucket_hash='xxhash64' (the engine fast path): LONG buckets, same
    bounds and determinism as the md5 convention; bad names raise."""
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.operators import dsir
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    w = dsir.dsir_log_weights_split(
        docs, F.col("lang") == "en", hash_chars=3, bucket_hash="xxhash64"
    )
    rows = w.collect()
    assert 0 < len(rows) <= 16**3
    assert all(isinstance(r.bucket, int) and 0 <= r.bucket < 16**3 for r in rows)
    s1 = dsir.dsir_scores(docs, w, bucket_hash="xxhash64").orderBy("doc_id").collect()
    s2 = dsir.dsir_scores(docs, w, bucket_hash="xxhash64").orderBy("doc_id").collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]  # deterministic
    assert any(r.score != 0 for r in s1)
    # resample composes with the fast path and stays salt-re-dealable
    pick = dsir.dsir_resample(docs, w, 10, bucket_hash="xxhash64", salt="a")
    pick2 = dsir.dsir_resample(docs, w, 10, bucket_hash="xxhash64", salt="a")
    assert sorted(r.doc_id for r in pick.collect()) == sorted(
        r.doc_id for r in pick2.collect()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_hash"):
        dsir.hashed_ngram_counts(docs, bucket_hash="sha1").collect()
