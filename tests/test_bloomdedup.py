"""Bloom-filter cross-snapshot dedup (operators/bloomdedup.py): the
no-false-negative guarantee, bounded false positives, broadcast vs
shuffle probe equivalence, incremental update, save/load round trip,
paragraph mode, DuckDB position-arithmetic parity (md5 mode), and the
zero-shuffle plan property of the broadcast probe."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_pinot_spark.operators import bloomdedup as B


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [Row(doc_id=start + i, text=t) for i, t in enumerate(texts)])


SEEN = [f"seen document number {i} with some words" for i in range(200)]
NEW = [f"completely new text {i} never folded in" for i in range(200)]


@pytest.fixture(scope="module")
def meta():
    return {"m_bits": 1 << 16, "k": 5, "hash_mode": "xxhash64"}


@pytest.fixture(scope="module")
def bloom(spark, meta):
    return B.build_bloom(_docs(spark, SEEN), "text", **{
        "m_bits": meta["m_bits"], "k": meta["k"],
        "hash_mode": meta["hash_mode"]}).cache()


def test_no_false_negatives(spark, bloom, meta):
    """EVERY inserted key must probe seen — the Bloom guarantee."""
    flagged = B.mark_seen(_docs(spark, SEEN), "text", bloom, meta)
    assert flagged.where(~F.col("bloom_seen")).count() == 0


def test_false_positive_rate_bounded(spark, bloom, meta):
    """Unseen keys flag mostly new; FP rate within 5× the theoretical
    bound (generous against small-sample noise)."""
    flagged = B.mark_seen(_docs(spark, NEW, start=1000), "text", bloom, meta)
    fp = flagged.where(F.col("bloom_seen")).count()
    bound = B.theoretical_fpp(len(SEEN), meta["m_bits"], meta["k"])
    assert fp / len(NEW) <= max(5 * bound, 0.02)


def test_broadcast_and_shuffle_probes_agree(spark, bloom, meta):
    df = _docs(spark, SEEN[:50] + NEW[:50])
    a = B.mark_seen(df, "text", bloom, meta, mode="broadcast") \
        .orderBy("doc_id").collect()
    b = B.mark_seen(df, "text", bloom, meta, mode="shuffle") \
        .orderBy("doc_id").collect()
    assert [r.bloom_seen for r in a] == [r.bloom_seen for r in b]
    assert sum(r.bloom_seen for r in a) >= 50  # all seen docs flagged


def test_broadcast_probe_has_no_shuffle(spark, bloom, meta, tmp_path):
    """The zero-shuffle property: with a persisted filter (the real
    cross-snapshot shape — load_bloom from parquet), the probe plan is
    chained broadcast joins only: no Exchange over the probed corpus
    (the 100 TB contract)."""
    B.save_bloom(bloom, str(tmp_path / "bf"), **meta)
    loaded, lmeta = B.load_bloom(spark, str(tmp_path / "bf"))
    df = _docs(spark, NEW)
    plan = B.mark_seen(df, "text", loaded, lmeta, mode="broadcast") \
        ._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        ls = line.strip().lstrip("+-: *(0123456789)")
        if ls.startswith("Exchange") and "Broadcast" not in line:
            raise AssertionError(f"corpus-side shuffle in plan: {line}")


def test_null_and_empty_keys_never_match(spark, bloom, meta):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text=""),
         Row(doc_id=3, text=SEEN[0])])
    got = {r.doc_id: r.bloom_seen
           for r in B.mark_seen(df, "text", bloom, meta).collect()}
    assert got == {1: False, 2: False, 3: True}


def test_filter_unseen_cross_snapshot_flow(spark, tmp_path, meta):
    """The incremental-release flow: fold snapshot 1, filter snapshot 2,
    update with snapshot 2, filter snapshot 3."""
    snap1 = _docs(spark, SEEN)
    bloom1 = B.build_bloom(snap1, "text", m_bits=meta["m_bits"],
                           k=meta["k"], hash_mode=meta["hash_mode"])
    B.save_bloom(bloom1, str(tmp_path / "bf"), m_bits=meta["m_bits"],
                 k=meta["k"], hash_mode=meta["hash_mode"],
                 n_items=len(SEEN))
    loaded, lmeta = B.load_bloom(spark, str(tmp_path / "bf"))
    assert lmeta["m_bits"] == meta["m_bits"]
    assert lmeta["theoretical_fpp"] < 0.01

    snap2 = _docs(spark, SEEN[:100] + NEW[:100], start=5000)
    fresh = B.filter_unseen(snap2, "text", loaded, lmeta)
    kept = [r.text for r in fresh.collect()]
    assert all(t in NEW for t in kept)  # every survivor is genuinely new
    assert len(kept) >= 95  # a few FPs allowed

    bloom2 = B.update_bloom(loaded, snap2, "text", lmeta)
    snap3 = _docs(spark, NEW[:100] + NEW[100:120], start=9000)
    flagged = B.mark_seen(snap3, "text", bloom2, lmeta)
    seen_now = flagged.where(F.col("bloom_seen")).count()
    assert seen_now >= 100  # snapshot-2 texts are now folded in


def test_md5_mode_duckdb_position_parity(spark, duck, meta):
    """The md5-mode position arithmetic replays term-for-term in
    DuckDB — filter membership is cross-engine checkable."""
    m_bits, k = 1 << 20, 4
    df = _docs(spark, SEEN[:40])
    spark_pos = (df.select(
        "doc_id",
        B._positions(F.col("text"), m_bits, k, "md5").alias("pos"))
        .orderBy("doc_id").collect())
    duck.sql("CREATE OR REPLACE TABLE bl_docs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO bl_docs VALUES (?, ?)",
                     [(i, t) for i, t in enumerate(SEEN[:40])])
    expr = B.bloom_positions_oracle_sql("text", m_bits, k)
    oracle = duck.sql(
        f"SELECT doc_id, {expr} AS pos FROM bl_docs ORDER BY doc_id"
    ).fetchall()
    for (srow, orow) in zip(spark_pos, oracle):
        assert list(srow.pos) == list(orow[1]), srow.doc_id


def test_md5_mode_end_to_end(spark, meta):
    m = {"m_bits": 1 << 16, "k": 5, "hash_mode": "md5"}
    bloom = B.build_bloom(_docs(spark, SEEN[:50]), "text", **{
        "m_bits": m["m_bits"], "k": m["k"], "hash_mode": "md5"})
    flagged = B.mark_seen(_docs(spark, SEEN[:50] + NEW[:50]), "text",
                          bloom, m)
    rows = flagged.orderBy("doc_id").collect()
    assert all(r.bloom_seen for r in rows[:50])
    assert sum(r.bloom_seen for r in rows[50:]) <= 5


def test_paragraph_dedup_rewrites_text(spark, meta):
    """Dolma paragraph mode: paragraphs seen in the reference corpus are
    excised from new documents, order preserved, lengths refreshed."""
    ref = _docs(spark, ["shared paragraph one\nshared paragraph two"])
    bloom = B.build_paragraph_bloom(ref, m_bits=1 << 16, k=5,
                                    hash_mode="xxhash64")
    new = spark.createDataFrame([Row(
        doc_id=1,
        text="fresh opening\nshared paragraph one\nfresh closing",
        n_chars=48)])
    got = B.dedup_paragraphs(new, bloom, meta).collect()[0]
    assert got.text == "fresh opening\nfresh closing"
    assert got.n_paragraphs_removed == 1
    assert got.n_chars == len(got.text)
    # a doc made ENTIRELY of seen paragraphs empties out
    allseen = spark.createDataFrame([Row(
        doc_id=2, text="shared paragraph two", n_chars=20)])
    got2 = B.dedup_paragraphs(allseen, bloom, meta).collect()[0]
    assert got2.text == "" and got2.n_paragraphs_removed == 1


def test_spec_validation():
    with pytest.raises(ValueError, match="power of two"):
        B._check_spec(100, 5)
    with pytest.raises(ValueError, match="k must be"):
        B._check_spec(1 << 16, 0)
    assert B.theoretical_fpp(0, 1 << 16, 5) == 0.0
    assert 0 < B.theoretical_fpp(1000, 1 << 16, 5) < 0.01


def test_build_is_deterministic_and_bounded(spark, meta):
    a = B.build_bloom(_docs(spark, SEEN), "text", m_bits=1 << 16, k=5) \
        .orderBy("word_idx").collect()
    b = B.build_bloom(_docs(spark, SEEN).repartition(7), "text",
                      m_bits=1 << 16, k=5).orderBy("word_idx").collect()
    assert [(r.word_idx, r.bits) for r in a] == \
        [(r.word_idx, r.bits) for r in b]
    assert len(a) <= (1 << 16) // 64  # never more rows than words


def test_paragraph_dedup_preserves_blank_segments(spark, meta):
    """Span excision semantics (Dolma): blank lines / separators are
    NOT collapsed — an untouched document round-trips byte-identically,
    and excision removes only the seen paragraphs."""
    ref = _docs(spark, ["shared paragraph one"])
    bloom = B.build_paragraph_bloom(ref, m_bits=1 << 16, k=5,
                                    hash_mode="xxhash64")
    untouched = "alpha\n\nbeta\n\n\ngamma\n"
    touched = "alpha\n\nshared paragraph one\ngamma"
    df = spark.createDataFrame([
        Row(doc_id=1, text=untouched, n_chars=len(untouched)),
        Row(doc_id=2, text=touched, n_chars=len(touched))])
    got = {r.doc_id: r for r in B.dedup_paragraphs(df, bloom, meta)
           .collect()}
    assert got[1].text == untouched           # byte-identical round trip
    assert got[1].n_paragraphs_removed == 0
    assert got[1].n_chars == len(untouched)
    assert got[2].text == "alpha\n\ngamma"    # blanks kept, seen excised
    assert got[2].n_paragraphs_removed == 1


def test_filter_unseen_honors_custom_flag_col(spark, bloom, meta):
    """A caller-supplied flag_col flows through mark_seen AND the final
    filter/drop (regression: the drop was hardcoded to bloom_seen)."""
    got = B.filter_unseen(_docs(spark, SEEN[:5] + NEW[:5]), "text",
                          bloom, meta, flag_col="custom_flag")
    texts = {r.text for r in got.collect()}
    assert texts == set(NEW[:5])
    assert "custom_flag" not in got.columns
