"""Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959) — the
SentencePiece-unigram counterpart to operators/bpe.py, completing the
two dominant subword families a training-data pipeline budgets with.

Spark-first shape (the bpe.py contract, kept deliberately identical):
  * TRAINING runs on the bounded WORD-FREQUENCY table — one distributed
    word count (single shuffle), deterministic prune to the top
    ``max_words`` types, then seed-vocab construction + EM + pruning
    driver-side over that bounded dict. The word table is the
    sufficient statistic; driver state is O(seed vocab), corpus-size
    independent.
  * ENCODING (Viterbi segmentation) is a map-side Arrow pass with a
    per-batch word→pieces memo — zero shuffle, Zipf makes the memo hit
    for nearly every token.
  * DETERMINISM: every selection (seed prune, EM, piece prune) breaks
    ties lexicographically, so the trained model is identical across
    runs, partitionings, and repartitions (pinned in tests).

Algorithm notes:
  * Seed vocab = all substrings (length ≤ ``max_piece_len``) of the
    word types scored by frequency×length, top ``seed_multiplier ×
    vocab_size`` of them, plus every single character (which can never
    be pruned — guarantees full coverage, no OOV loss).
  * E-step = exact forward-backward over each word's segmentation
    lattice (expected piece counts over ALL segmentations, verified in
    tests against brute-force enumeration); M-step renormalizes.
  * PRUNING drops the lowest-expected-count pieces (chars exempt) by
    ``shrink`` per round until ``vocab_size`` — a documented
    simplification of the paper's exact loss-delta criterion (the
    paper notes count-based alternatives behave comparably; the exact
    criterion needs a second lattice pass per candidate).
  * Unseen characters at encode time pass through as single-char pieces
    at the floor probability — nothing is dropped, so piece counts are
    a true token budget (the bpe.py convention).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_pinot_spark.operators.dedup import _spread
from apache_pinot_spark.operators.dsir import _tokens

#: log-prob assigned to out-of-vocabulary single characters at encode
#: time (well below any trained piece; keeps Viterbi total ordering)
_OOV_LOG_PROB = -20.0


def _word_table(corpus: DataFrame, text_col: str,
                max_words: int) -> dict[str, int]:
    rows = (
        _spread(corpus)
        .select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return {r["w"]: int(r["cnt"]) for r in rows}


def _seed_vocab(words: dict[str, int], vocab_size: int,
                seed_multiplier: int, max_piece_len: int) -> set[str]:
    scores: dict[str, int] = {}
    for w, cnt in words.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                sub = w[i:j]
                scores[sub] = scores.get(sub, 0) + cnt * (j - i)
    chars = {c for w in words for c in w}
    budget = max(vocab_size * seed_multiplier, len(chars) + 1)
    multi = sorted((s for s in scores if len(s) > 1),
                   key=lambda s: (-scores[s], s))[:budget - len(chars)]
    return chars | set(multi)


def _forward_backward(word: str, logp: dict[str, float],
                      max_len: int) -> tuple[float, dict[str, float]]:
    """(total probability, expected piece counts) over ALL segmentations
    of one word — the exact E-step lattice."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        acc = 0.0
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is not None and alpha[j] > 0.0:
                acc += alpha[j] * math.exp(lp)
        alpha[i] = acc
    if alpha[n] <= 0.0:
        return 0.0, {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        acc = 0.0
        for j in range(i + 1, min(i + max_len, n) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is not None and beta[j] > 0.0:
                acc += math.exp(lp) * beta[j]
        beta[i] = acc
    z = alpha[n]
    counts: dict[str, float] = {}
    for i in range(n):
        if alpha[i] <= 0.0:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is not None and beta[j] > 0.0:
                counts[piece] = counts.get(piece, 0.0) + \
                    alpha[i] * math.exp(lp) * beta[j] / z
    return z, counts


def train_unigram(
    corpus: DataFrame,
    text_col: str = "text",
    vocab_size: int = 800,
    max_words: int = 100_000,
    seed_multiplier: int = 4,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> dict[str, float]:
    """Train the unigram model; returns {piece: log_prob} — a bounded,
    broadcastable closure artifact (the bpe merge-list analogue)."""
    if vocab_size < 2:
        raise ValueError("vocab_size must be >= 2")
    if not 0.1 <= shrink < 1.0:
        raise ValueError("shrink must be in [0.1, 1)")
    words = _word_table(corpus, text_col, max_words)
    if not words:
        return {}
    vocab = _seed_vocab(words, vocab_size, seed_multiplier, max_piece_len)
    chars = {c for w in words for c in w}
    # uniform init
    logp = {p: -math.log(len(vocab)) for p in vocab}

    while True:
        for _ in range(max(1, em_iters)):
            expected: dict[str, float] = {}
            for w, cnt in words.items():
                _z, counts = _forward_backward(w, logp, max_piece_len)
                for p, c in counts.items():
                    expected[p] = expected.get(p, 0.0) + cnt * c
            total = sum(expected.values())
            if total <= 0.0:
                break
            # M-step; pieces with zero expectation keep a floor so
            # single-char coverage never vanishes mid-training
            floor = 1e-10
            logp = {p: math.log(max(expected.get(p, 0.0), floor) / total)
                    for p in logp}
        if len(logp) <= vocab_size:
            break
        # prune lowest-expected multi-char pieces (chars exempt),
        # deterministic tie-break by piece
        multi = [p for p in logp if p not in chars]
        keep_target = max(vocab_size, int(len(logp) * shrink))
        n_drop = len(logp) - keep_target
        if n_drop <= 0 or not multi:
            break
        victims = sorted(multi, key=lambda p: (expected.get(p, 0.0), p))
        for p in victims[:n_drop]:
            del logp[p]
        # renormalize the survivors
        norm = math.log(sum(math.exp(v) for v in logp.values()))
        logp = {p: v - norm for p, v in logp.items()}
    return dict(sorted(logp.items()))


def corpus_log_likelihood(words: dict[str, int], logp: dict[str, float],
                          max_piece_len: int = 8) -> float:
    """Σ freq·log P(word) under the model — the EM objective (tests pin
    its monotonicity)."""
    total = 0.0
    for w, cnt in words.items():
        z, _ = _forward_backward(w, logp, max_piece_len)
        if z > 0.0:
            total += cnt * math.log(z)
        else:
            total += cnt * _OOV_LOG_PROB * len(w)
    return total


def viterbi_pieces(word: str, logp: dict[str, float],
                   max_len: int = 64) -> list[str]:
    """Best segmentation; unseen characters fall back to single-char
    OOV pieces so every word segments (driver-side reference — the
    Spark path inlines the same loop in its worker closure)."""
    n = len(word)
    best = [(-math.inf, -1)] * (n + 1)
    best[0] = (0.0, -1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j][0] == -math.inf:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None and i - j == 1:
                lp = _OOV_LOG_PROB
            if lp is None:
                continue
            cand = best[j][0] + lp
            if cand > best[i][0]:
                best[i] = (cand, j)
    out = []
    i = n
    while i > 0:
        j = best[i][1]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_encode(
    corpus: DataFrame,
    model: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pieces array<string>) — exact Viterbi pieces per document.
    Map-side Arrow pass with a per-batch word memo (bpe_encode's
    contract)."""
    logp = dict(model)
    id_type = dict(corpus.dtypes)[id_col]
    src = _spread(corpus).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("toks"))
    max_len = max((len(p) for p in logp), default=1)

    def run(batches):
        # self-contained worker closure (imports inside; logp/max_len
        # ship by value — the verify-skill closure rule)
        import math as _math

        import pandas as _pd

        oov = -20.0

        def encode_word(word):
            n = len(word)
            best = [(-_math.inf, -1)] * (n + 1)
            best[0] = (0.0, -1)
            for i in range(1, n + 1):
                for j in range(max(0, i - max_len), i):
                    if best[j][0] == -_math.inf:
                        continue
                    lp = logp.get(word[j:i])
                    if lp is None and i - j == 1:
                        lp = oov
                    if lp is None:
                        continue
                    cand = best[j][0] + lp
                    if cand > best[i][0]:
                        best[i] = (cand, j)
            out = []
            i = n
            while i > 0:
                j = best[i][1]
                out.append(word[j:i])
                i = j
            return out[::-1]

        memo: dict = {}
        for pdf in batches:
            rows = []
            for toks in pdf["toks"]:
                pieces = []
                for w in (toks if toks is not None else []):
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w)
                        memo[w] = got
                    pieces.extend(got)
                rows.append(pieces)
            yield _pd.DataFrame({"id": pdf["id"], "pieces": rows})

    return src.mapInPandas(run, schema=f"id {id_type}, pieces ARRAY<STRING>")


def unigram_token_counts(
    corpus: DataFrame,
    model: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_pieces) — the per-document token budget under the trained
    model (the bpe_token_counts twin)."""
    return (unigram_encode(corpus, model, text_col, id_col)
            .select("id", F.size("pieces").alias("n_pieces")))
