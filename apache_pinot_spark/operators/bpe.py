"""Byte-pair-encoding tokenizer — train real merge rules (Sennrich et
al. 2016, arXiv:1508.07909) and tokenize a corpus with them, the token
accounting a training-data pipeline budgets by (the text-analysis
`bpe_ish_token_count_expr` stays the zero-shuffle scan-time estimate;
this module is the exact subword path).

Spark-first shape:
  * Training operates on the WORD-FREQUENCY table, not the corpus — the
    classic formulation: one distributed word count (single shuffle),
    deterministic prune to the top ``max_words`` types by
    (count DESC, word ASC), then the merge loop runs driver-side over
    that bounded dict (pair counts over at most max_words rows per
    step; pure Python, no Spark job per merge). The word table is the
    sufficient statistic for BPE — this is exactly how the reference
    implementations train, and it bounds driver state by construction.
  * Encoding is a map-side Arrow pass with a per-batch word→pieces memo
    (natural-language word frequency follows Zipf: the memo hits for
    almost every token after the first few thousand words), merge ranks
    shipped once in the closure. Zero shuffle; token counting composes
    with any downstream aggregate.
  * Determinism: merge selection ties break by pair lexicographic
    order ((count DESC, pair ASC) — pinned, unlike the reference's
    arbitrary tie), so trained merges are identical across runs,
    partitionings, and engines.

Vocabulary convention: character-level pieces with the ``</w>``
end-of-word marker on each word's final symbol (the original paper's
scheme); unseen characters pass through as single-character pieces —
nothing is ever dropped, so piece counts are a true token budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_pinot_spark.operators.dedup import _spread
from apache_pinot_spark.operators.dsir import _tokens

_EOW = "</w>"


def _word_symbols(word: str) -> tuple:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_words: int = 100_000,
) -> list:
    """Learn ``num_merges`` merge rules from the corpus word-frequency
    table. Returns the ordered merge list ``[(left, right), ...]`` —
    rank = position, the whole artifact a broadcastable closure value.
    One Spark job (count + prune + bounded collect); the merge loop is
    driver-side over ≤ max_words word types."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    rows = (
        _spread(corpus)
        .select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple, int] = {_word_symbols(r["w"]): int(r["cnt"]) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
    return merges


def bpe_encode(
    corpus: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, pieces array<string>) — exact BPE pieces per document.
    Map-side Arrow pass; a per-batch word→pieces memo exploits Zipf
    repetition so the merge walk runs once per word TYPE per batch."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    id_type = dict(corpus.dtypes)[id_col]  # carry the native id dtype through
    src = _spread(corpus).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("toks")
    )

    def run(batches):
        # self-contained worker closure (imports inside, no package
        # references): the merge-walk logic is inlined so the worker
        # needs nothing beyond ranks, which ships by value
        import pandas as _pd

        eow = _EOW

        def encode_word(word):
            syms = list(word[:-1]) + [word[-1] + eow]
            while len(syms) > 1:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        memo: dict = {}
        for pdf in batches:
            out = []
            for toks in pdf["toks"]:
                pieces = []
                # Arrow hands list columns over as numpy arrays, whose
                # truthiness is ambiguous — explicit None check only
                for w in (toks if toks is not None else []):
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w)
                        memo[w] = got
                    pieces.extend(got)
                out.append(pieces)
            yield _pd.DataFrame({"id": pdf["id"], "pieces": out})

    return src.mapInPandas(run, schema=f"id {id_type}, pieces ARRAY<STRING>")


def bpe_chunk(
    corpus: DataFrame,
    merges: list,
    max_pieces: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, chunk_index, chunk_text, n_pieces) — split each document
    on word boundaries into chunks whose EXACT BPE piece count stays
    ≤ ``max_pieces`` (the context-window budget), greedily packing words
    left to right. No token is ever dropped: a single word whose pieces
    alone exceed the budget becomes its own (over-budget) chunk rather
    than being truncated — callers filter or re-split those. Chunk text
    re-joins the tokenizer's words with single spaces (the corpus
    tokenizer convention). Map-side Arrow pass, zero shuffle, same
    per-batch word memo as bpe_encode."""
    if max_pieces < 1:
        raise ValueError(f"max_pieces must be >= 1, got {max_pieces}")
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    id_type = dict(corpus.dtypes)[id_col]  # carry the native id dtype through
    src = _spread(corpus).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("toks")
    )

    def run(batches):
        import pandas as _pd

        eow = _EOW

        def encode_word(word):
            syms = list(word[:-1]) + [word[-1] + eow]
            while len(syms) > 1:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        memo: dict = {}
        for pdf in batches:
            ids, idxs, texts, npcs = [], [], [], []
            for doc_id, toks in zip(pdf["id"], pdf["toks"]):
                words, budget, idx = [], 0, 0
                for w in (toks if toks is not None else []):
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w)
                        memo[w] = got
                    n = len(got)
                    if words and budget + n > max_pieces:
                        ids.append(doc_id); idxs.append(idx)
                        texts.append(" ".join(words)); npcs.append(budget)
                        words, budget, idx = [], 0, idx + 1
                    words.append(w)
                    budget += n
                if words:
                    ids.append(doc_id); idxs.append(idx)
                    texts.append(" ".join(words)); npcs.append(budget)
            yield _pd.DataFrame(
                {"id": ids, "chunk_index": idxs, "chunk_text": texts,
                 "n_pieces": npcs}
            )

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, chunk_index INT, chunk_text STRING, n_pieces INT",
    )
    return out.select(
        F.col("id").alias(id_col), "chunk_index", "chunk_text", "n_pieces"
    )


def bpe_token_counts(
    corpus: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_pieces) — the exact token budget per document."""
    return bpe_encode(corpus, merges, text_col, id_col).select(
        F.col("id").alias(id_col), F.size("pieces").alias("n_pieces")
    )
