"""Unigram-LM tokenizer (operators/unigram.py): forward-backward
E-step against brute-force segmentation enumeration, EM-objective
monotonicity, Viterbi against exhaustive search, training convergence
on designed corpora, determinism across partitionings, full coverage
(no OOV loss), and the Spark encode/count operators."""

from __future__ import annotations

import math
from itertools import combinations

import pytest
from pyspark.sql import Row

from apache_pinot_spark.operators import unigram as U


def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def _all_segmentations(word):
    n = len(word)
    for k in range(n):
        for cuts in combinations(range(1, n), k):
            bounds = (0,) + cuts + (n,)
            yield [word[bounds[i]:bounds[i + 1]]
                   for i in range(len(bounds) - 1)]


def test_forward_backward_matches_enumeration():
    logp = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.4),
            "ba": math.log(0.1)}
    word = "abab"
    z, counts = U._forward_backward(word, logp, max_len=2)
    # brute force over all segmentations whose pieces exist
    z_ref = 0.0
    counts_ref: dict[str, float] = {}
    for seg in _all_segmentations(word):
        if any(p not in logp for p in seg):
            continue
        pr = math.exp(sum(logp[p] for p in seg))
        z_ref += pr
        for p in seg:
            counts_ref[p] = counts_ref.get(p, 0.0) + pr
    counts_ref = {p: c / z_ref for p, c in counts_ref.items()}
    assert abs(z - z_ref) < 1e-12
    assert set(counts) == set(counts_ref)
    for p in counts:
        assert abs(counts[p] - counts_ref[p]) < 1e-12, p


def test_viterbi_matches_exhaustive_best():
    logp = {"h": -3.0, "e": -3.0, "l": -3.0, "o": -3.0,
            "he": -2.5, "ll": -2.5, "llo": -2.0, "hello": -4.0}
    word = "hello"
    got = U.viterbi_pieces(word, logp)
    best_score, best_seg = -math.inf, None
    for seg in _all_segmentations(word):
        if any(p not in logp for p in seg):
            continue
        sc = sum(logp[p] for p in seg)
        if sc > best_score:
            best_score, best_seg = sc, seg
    assert got == best_seg
    assert "".join(got) == word


def test_viterbi_oov_chars_pass_through():
    logp = {"a": -1.0, "b": -1.0, "ab": -0.5}
    got = U.viterbi_pieces("axb", logp)
    assert "".join(got) == "axb" and "x" in got


def test_em_objective_monotone(spark):
    """Each EM iteration must not decrease Σ freq·log P(word)."""
    texts = ["the cat sat on the mat"] * 5 + ["catalog catalyst category"]
    words = U._word_table(_corpus(spark, texts), "text", 1000)
    vocab = U._seed_vocab(words, vocab_size=60, seed_multiplier=4,
                          max_piece_len=6)
    logp = {p: -math.log(len(vocab)) for p in vocab}
    prev = U.corpus_log_likelihood(words, logp, 6)
    for _ in range(4):
        expected: dict[str, float] = {}
        for w, cnt in words.items():
            _z, counts = U._forward_backward(w, logp, 6)
            for p, c in counts.items():
                expected[p] = expected.get(p, 0.0) + cnt * c
        total = sum(expected.values())
        logp = {p: math.log(max(expected.get(p, 0.0), 1e-10) / total)
                for p in logp}
        cur = U.corpus_log_likelihood(words, logp, 6)
        assert cur >= prev - 1e-9
        prev = cur


def test_training_learns_frequent_whole_words(spark):
    texts = ["internationalization considered harmful"] * 40 + \
            ["nation nation nation inter inter"] * 10
    model = U.train_unigram(_corpus(spark, texts), vocab_size=80,
                            max_piece_len=8, em_iters=3)
    assert len(model) <= 80 + 30  # chars exempt from the cap
    # frequent subwords survive pruning and win Viterbi
    pieces = U.viterbi_pieces("internationalization", model)
    assert "".join(pieces) == "internationalization"
    assert any(len(p) >= 4 for p in pieces), pieces
    assert "nation" in model or "inter" in model


def test_training_deterministic_across_partitioning(spark):
    texts = [f"alpha beta gamma delta word{i % 7}" for i in range(50)]
    m1 = U.train_unigram(_corpus(spark, texts), vocab_size=50)
    m2 = U.train_unigram(_corpus(spark, texts).repartition(13),
                         vocab_size=50)
    assert m1 == m2
    assert abs(sum(math.exp(v) for v in m1.values()) - 1.0) < 1e-6


def test_spark_encode_and_counts(spark):
    texts = ["hello hello world", "hello worldly"]
    df = _corpus(spark, texts)
    model = U.train_unigram(df, vocab_size=40, em_iters=2)
    enc = {r.id: list(r.pieces)
           for r in U.unigram_encode(df, model).collect()}
    # coverage: pieces re-concatenate to the words, in order
    assert "".join(enc[0]) == "hellohelloworld"
    assert "".join(enc[1]) == "helloworldly"
    counts = {r.id: r.n_pieces
              for r in U.unigram_token_counts(df, model).collect()}
    assert counts == {i: len(enc[i]) for i in enc}
    # spark path == driver-side reference, word by word
    for w in ("hello", "world", "worldly"):
        ref = U.viterbi_pieces(w, model,
                               max_len=max(len(p) for p in model))
        assert "".join(ref) == w


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert U.train_unigram(empty, vocab_size=10) == {}
    with pytest.raises(ValueError, match="vocab_size"):
        U.train_unigram(_corpus(spark, ["x"]), vocab_size=1)
    with pytest.raises(ValueError, match="shrink"):
        U.train_unigram(_corpus(spark, ["x"]), shrink=1.0)
