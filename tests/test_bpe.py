"""BPE tokenizer (operators/bpe.py): the paper's worked example, merge
determinism (ties, repartition), encode/greedy-apply parity with a pure
Python reference, pass-through of unseen characters, and token budgets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import bpe
from tests.conftest import SF_SMOKE


def _docs(spark):
    from apache_pinot_spark.catalog import load_tables

    return load_tables(spark, SF_SMOKE, ["documents"])["documents"]


def test_paper_style_merges(spark):
    """'low lower lowest' family: the most frequent pair merges first and
    frequent stems coalesce into single pieces."""
    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest")],
        "doc_id int, text string",
    )
    merges = bpe.train_bpe(docs, num_merges=10)
    assert merges[0] == ("e", "s")  # es: 9 occurrences, the clear max
    assert ("es", "t</w>") in merges or ("est", "t</w>") not in merges
    enc = {r.id: list(r.pieces) for r in bpe.bpe_encode(docs, merges).collect()}
    pieces = enc[1]
    # after 10 merges the dominant words are single pieces
    assert "newest</w>" in pieces
    assert "low</w>" in pieces
    # piece concatenation reconstructs the token stream exactly
    joined = "".join(pieces).replace("</w>", " ")
    assert joined.split() == ("low " * 5 + "lower " * 2 + "newest " * 6
                              + "widest " * 3).split()


def test_train_determinism_and_tie_break(spark):
    # 'ab' and 'cd' both appear twice: the tie must break lexicographically
    docs = spark.createDataFrame(
        [(1, "ab ab cd cd")], "doc_id int, text string"
    )
    m1 = bpe.train_bpe(docs, num_merges=2)
    assert m1[0] == ("a", "b</w>")  # ('a','b</w>') < ('c','d</w>')
    m2 = bpe.train_bpe(docs.repartition(5), num_merges=2)
    assert m1 == m2
    with pytest.raises(ValueError, match="num_merges"):
        bpe.train_bpe(docs, num_merges=-1)
    with pytest.raises(ValueError, match="max_words"):
        bpe.train_bpe(docs, max_words=0)


def _ref_encode(word, merges):
    """Independent greedy-apply reference (list-scan formulation)."""
    syms = list(word[:-1]) + [word[-1] + "</w>"]
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    while True:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            return syms
        _, i = min(cands)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]


def test_encode_matches_reference_on_documents(spark):
    docs = _docs(spark).limit(40)
    merges = bpe.train_bpe(docs, num_merges=200)
    got = {r.id: list(r.pieces) for r in bpe.bpe_encode(docs, merges).collect()}
    rows = docs.select("doc_id", "text").collect()
    import re

    for r in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
        want = [p for w in toks for p in _ref_encode(w, merges)]
        assert got[r.doc_id] == want, r.doc_id


def test_unseen_characters_pass_through(spark):
    train = spark.createDataFrame([(1, "aa aa bb")], "doc_id int, text string")
    merges = bpe.train_bpe(train, num_merges=5)
    other = spark.createDataFrame([(9, "zz aa")], "doc_id int, text string")
    enc = {r.id: list(r.pieces) for r in bpe.bpe_encode(other, merges).collect()}
    assert "aa</w>" in enc[9]           # trained word: one piece
    assert "z" in enc[9] and "z</w>" in enc[9]  # unseen: char pieces, kept
    counts = {r.doc_id: r.n_pieces
              for r in bpe.bpe_token_counts(other, merges).collect()}
    assert counts[9] == len(enc[9])


def test_token_budget_shrinks_with_merges(spark):
    docs = _docs(spark).limit(60)
    n0 = (bpe.bpe_token_counts(docs, bpe.train_bpe(docs, num_merges=0))
          .agg(F.sum("n_pieces")).collect()[0][0])
    n200 = (bpe.bpe_token_counts(docs, bpe.train_bpe(docs, num_merges=200))
            .agg(F.sum("n_pieces")).collect()[0][0])
    assert n200 < n0  # merges strictly compress the budget


def test_bpe_chunk_budget_and_no_loss(spark):
    docs = _docs(spark).limit(40)
    merges = bpe.train_bpe(docs, num_merges=100)
    chunks = bpe.bpe_chunk(docs, merges, max_pieces=32).collect()
    assert chunks
    # budget holds except single-word overflows (none in this corpus)
    assert all(c.n_pieces <= 32 for c in chunks)
    # chunk piece counts are EXACT: re-encoding each chunk reproduces them
    cdf = spark.createDataFrame(
        [(i, c.chunk_text) for i, c in enumerate(chunks)], "doc_id long, text string"
    )
    recount = {r[0]: r.n_pieces
               for r in bpe.bpe_token_counts(cdf, merges).collect()}
    for i, c in enumerate(chunks):
        assert recount[i] == c.n_pieces, i
    # no token lost: per-doc total pieces == unchunked totals, and indexes
    # are contiguous from 0
    totals = {}
    seen = {}
    for c in chunks:
        totals[c.doc_id] = totals.get(c.doc_id, 0) + c.n_pieces
        seen.setdefault(c.doc_id, []).append(c.chunk_index)
    want = {r.doc_id: r.n_pieces
            for r in bpe.bpe_token_counts(docs, merges).collect() if r.n_pieces}
    assert totals == want
    assert all(sorted(v) == list(range(len(v))) for v in seen.values())


def test_bpe_chunk_overlong_word_kept(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefgh xy xy")], "doc_id int, text string"
    )
    merges = []  # no merges: every char is a piece
    chunks = {c.chunk_index: c
              for c in bpe.bpe_chunk(docs, merges, max_pieces=4).collect()}
    assert chunks[0].chunk_text == "abcdefgh" and chunks[0].n_pieces == 8
    assert chunks[1].chunk_text == "xy xy" and chunks[1].n_pieces == 4
    with pytest.raises(ValueError, match="max_pieces"):
        bpe.bpe_chunk(docs, merges, max_pieces=0)


def test_frozen_gate_merge_table_provenance(spark):
    """The tx_token_accounting slot budgets tokens against a FROZEN
    24-merge table (a fixed tokenizer artifact, the real-pipeline
    shape). Pin its provenance: train_bpe on the sf0.01 documents corpus
    reproduces it exactly."""
    import os

    import pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("sf0.01 testdata not present")
    from apache_pinot_spark.catalog import load_tables
    from apache_pinot_spark.operators.bpe import train_bpe
    from apache_pinot_spark.suites.textanalysis_suite import _BPE_MERGES

    docs = load_tables(spark, sf, ["documents"])["documents"]
    assert train_bpe(docs, num_merges=24) == [tuple(m) for m in _BPE_MERGES]
