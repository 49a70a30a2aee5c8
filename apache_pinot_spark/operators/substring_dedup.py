"""Exact-substring deduplication (Lee et al. 2021, arXiv:2107.06499,
"Deduplicating Training Data Makes Language Models Better") — the
span-level tier between document-level exact/near dedup and nothing:
long token runs repeated ACROSS documents (license blocks, boilerplate
disclaimers, syndicated passages) are excised from every occurrence but
one, while the surrounding unique prose survives.

The paper builds a corpus-wide suffix array on dedicated hardware; the
Spark-native equivalent is stride-1 rolling WINDOW fingerprints, which
carries the same guarantee the paper's operating point needs: every
duplicated token span of length ≥ ``window_tokens`` shares at least one
aligned window, because every window position is emitted (stride 1 —
a strided variant cannot guarantee alignment across occurrences, which
is why none is offered; winnowed fingerprints for OVERLAP MEASUREMENT
live in textanalysis.winnow_fingerprints).

Plan shape (the honest cost accounting):
  1. one Arrow pass tokenizes with CHARACTER OFFSETS and emits a slim
     (id, win_idx, sig, start_char, end_char) row per window —
     ~total_tokens rows, the inherent cost of span-exact detection
     (the paper pays the same in suffix-array space)
  2. one groupBy(sig): occurrence count + the global canonical
     occurrence (min (doc_id, win_idx)) — map-side combined
  3. windows of duplicated sigs join back (sig-keyed), non-canonical
     spans groupBy(doc) into per-doc cut lists — bounded by the doc's
     own window count
  4. one Arrow pass merges overlapping spans and excises them

Tokenization note: spans must map to character offsets in the ORIGINAL
text, so the Arrow pass tokenizes the original with the case-insensitive
equivalent of the curation family's tokenizer and lowers per-token for
the signature (Python's str.lower can CHANGE STRING LENGTH on a handful
of code points — e.g. 'İ' — so lowering first would corrupt offsets).

At 100 TB: rows are ~24 bytes × total tokens through ONE hash shuffle —
big but spillable and linear; the paper's own pipeline is a comparable
corpus-sized sort. Run AFTER document-level dedup (fewer tokens) and,
like the paper, on the training split only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the paper's operating point: 50-token duplicated spans
DEFAULT_WINDOW_TOKENS = 50

_TOKEN_RE = r"[^0-9A-Za-z]+"


def _window_rows(df: DataFrame, text_col: str, id_col: str,
                 window_tokens: int) -> DataFrame:
    """(id, win_idx, sig, start_char, end_char) per window position —
    one Arrow map pass, stride 1."""
    w = int(window_tokens)
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))

    def run(batches):
        # worker-side imports only: the closure must be self-contained
        import hashlib
        import re

        import numpy as _np
        import pandas as _pd

        MASK = (1 << 64) - 1
        B = 0x100000001B3  # odd multiplier (FNV prime) — invertible mod 2^64
        BW = pow(B, w, 1 << 64)
        tok_memo: dict = {}

        def h64(s: str) -> int:
            # blake2b-derived 64-bit per-TOKEN hash (xxhash is not a
            # declared dependency); window signatures are a degree-w
            # polynomial in B over these — O(1) per window via the
            # rolling update instead of re-joining w tokens (the probed
            # hot loop). Collisions only cost a false dup pair, and the
            # polynomial keeps ORDER sensitivity a bag-of-hashes sum
            # would lose.
            v = tok_memo.get(s)
            if v is None:
                v = int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(),
                    "big")
                tok_memo[s] = v
            return v

        for pdf in batches:
            ids, idxs, sigs, starts, ends = [], [], [], [], []
            for mid, text in zip(pdf["id"], pdf["t"]):
                if text is None:
                    continue
                toks = [(m.start(), m.end(), m.group(0).lower())
                        for m in re.finditer(r"[0-9A-Za-z]+", text)]
                n = len(toks) - w + 1
                if n <= 0:
                    continue
                hs = [h64(t[2]) for t in toks]
                sig = 0
                for v in hs[:w]:
                    sig = (sig * B + v) & MASK
                out_sigs = [sig]
                for i in range(1, n):
                    sig = (sig * B - hs[i - 1] * BW + hs[i + w - 1]) & MASK
                    out_sigs.append(sig)
                ids.extend([mid] * n)
                idxs.extend(range(n))
                # shift to signed 64 for the LongType column
                sigs.extend(s - (1 << 64) if s >= (1 << 63) else s
                            for s in out_sigs)
                starts.extend(t[0] for t in toks[:n])
                ends.extend(toks[i + w - 1][1] for i in range(n))
            yield _pd.DataFrame(
                {"id": ids, "win_idx": _np.array(idxs, dtype="int32"),
                 "sig": _np.array(sigs, dtype="int64"),
                 "start_char": _np.array(starts, dtype="int32"),
                 "end_char": _np.array(ends, dtype="int32")})

    from apache_pinot_spark.operators.dedup import _spread

    return _spread(src).mapInPandas(
        run,
        schema=f"id {id_type}, win_idx int, sig long, "
               "start_char int, end_char int",
    )


def duplicated_window_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = DEFAULT_WINDOW_TOKENS,
) -> DataFrame:
    """(sig, n_occurrences, n_docs) for every window duplicated anywhere
    in the corpus — the measurement half (how much cross-document
    repetition exists at this window size) without rewriting anything."""
    wins = _window_rows(df, text_col, id_col, window_tokens)
    return (
        wins.groupBy("sig")
        .agg(F.count("*").alias("n_occurrences"),
             F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_occurrences") >= 2)
    )


def dedup_exact_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = DEFAULT_WINDOW_TOKENS,
) -> DataFrame:
    """Excise every duplicated ≥``window_tokens``-token span from all
    occurrences EXCEPT the canonical one (global min (doc_id, win_idx)
    per signature — deterministic, partition-invariant). Returns the
    input columns with ``text_col`` rewritten plus ``n_chars_removed``;
    overlapping duplicated windows merge into one maximal cut span, and
    docs with nothing to cut pass through byte-identical."""
    wins = _window_rows(df, text_col, id_col, window_tokens)
    # Non-canonical occurrences of duplicated windows via ONE pass over
    # the window rows: count + row_number over sig (r13; the groupBy+
    # join-back formulation this replaces computed the whole Arrow
    # tokenize/rolling-hash pass TWICE — once under the canon aggregate
    # and once as the join's probe side — since the wins frame was
    # unpersisted and read by two subtrees). rk > 1 under (id, win_idx)
    # ordering is exactly "not the global min (id, win_idx) occurrence":
    # (id, win_idx) pairs are unique within a sig, so the order is
    # strict and the keeper selection is identical — and it is the very
    # formulation the DuckDB oracle replays (occ/cuts CTEs in the gates
    # suite).
    from pyspark.sql import Window

    ws = Window.partitionBy("sig")
    wso = ws.orderBy("id", "win_idx")
    cuts = (
        wins
        .withColumn("__n_occ", F.count(F.lit(1)).over(ws))
        .withColumn("__rk", F.row_number().over(wso))
        .filter((F.col("__n_occ") >= 2) & (F.col("__rk") > 1))
        .groupBy("id")
        .agg(F.collect_list(F.struct("start_char", "end_char")).alias("spans"))
    )
    src = df.join(cuts.withColumnRenamed("id", id_col), on=id_col, how="left")
    other_cols = [c for c in df.columns if c != text_col]

    def apply_cuts(batches):
        import pandas as _pd

        for pdf in batches:
            new_text, removed = [], []
            for text, spans in zip(pdf[text_col], pdf["spans"]):
                if spans is None or len(spans) == 0 or text is None:
                    new_text.append(text)
                    removed.append(0)
                    continue
                ivs = sorted((int(s["start_char"]), int(s["end_char"]))
                             for s in spans)
                merged = [list(ivs[0])]
                for a, b in ivs[1:]:
                    if a <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], b)
                    else:
                        merged.append([a, b])
                out, pos, cut = [], 0, 0
                for a, b in merged:
                    out.append(text[pos:a])
                    cut += b - a
                    pos = b
                out.append(text[pos:])
                new_text.append("".join(out))
                removed.append(cut)
            res = pdf[other_cols].copy()
            res[text_col] = new_text
            res["n_chars_removed"] = _pd.Series(removed, dtype="int64")
            yield res[other_cols + [text_col, "n_chars_removed"]]

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != text_col
    ) + f", `{text_col}` string, n_chars_removed long"
    out = src.mapInPandas(apply_cuts, schema=out_schema)
    return out.select(*df.columns, "n_chars_removed")
