"""Exact-substring dedup (operators/substring_dedup.py) vs an
independent brute-force reference that uses RAW WINDOW TEXT as the
dedup key (no hashing — catches hash-layer bugs), plus planted-span
goldens, overlap merging, Unicode offset safety, and the stats half."""

from __future__ import annotations

import random
import re

import pytest

from apache_pinot_spark.operators import substring_dedup as S


def _ref_dedup(docs: dict, w: int):
    """Independent reference: window text -> occurrence list; canonical
    = min (doc_id, win_idx); others' spans merged and excised."""
    tok = {i: [(m.start(), m.end(), m.group(0).lower())
               for m in re.finditer(r"[0-9A-Za-z]+", t)]
           for i, t in docs.items()}
    occ = {}
    for i in sorted(docs):
        toks = tok[i]
        for j in range(len(toks) - w + 1):
            key = tuple(t[2] for t in toks[j : j + w])
            occ.setdefault(key, []).append((i, j))
    cuts = {i: [] for i in docs}
    for key, occs in occ.items():
        if len(occs) < 2:
            continue
        keeper = min(occs)
        for i, j in occs:
            if (i, j) != keeper:
                cuts[i].append((tok[i][j][0], tok[i][j + w - 1][1]))
    out = {}
    for i, t in docs.items():
        ivs = sorted(cuts[i])
        merged = []
        for a, b in ivs:
            if merged and a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        pos, parts, cut = 0, [], 0
        for a, b in merged:
            parts.append(t[pos:a])
            cut += b - a
            pos = b
        parts.append(t[pos:])
        out[i] = ("".join(parts), cut)
    return out


_DUP = ("this exact legal disclaimer paragraph is repeated verbatim in "
        "every single syndicated article and contains precisely enough "
        "tokens to cross the window threshold for the dedup")
_W = 10


def _spark_out(spark, docs, w=_W):
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id bigint, text string")
    got = S.dedup_exact_substrings(df, window_tokens=w).collect()
    return {r.doc_id: (r.text, r.n_chars_removed) for r in got}


def test_planted_duplicate_span(spark):
    docs = {
        1: "unique opening prose for document one. " + _DUP + " and a unique tail one.",
        2: "different unique opening for two! " + _DUP + " with its own tail two.",
        3: "document three says something entirely of its own making here "
           "with no duplicated content at all in any window of this size",
    }
    got = _spark_out(spark, docs)
    ref = _ref_dedup(docs, _W)
    assert got == ref
    # the canonical occurrence (doc 1, earliest) keeps the span
    assert _DUP in got[1][0] and got[1][1] == 0
    assert _DUP not in got[2][0] and got[2][1] > 0
    # unique prose around the cut survives
    assert got[2][0].startswith("different unique opening for two!")
    assert got[2][0].endswith("tail two.")
    # untouched doc is byte-identical
    assert got[3] == (docs[3], 0)


def test_random_corpora_match_reference(spark):
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta",
             "eta", "theta", "iota", "kappa"]
    for seed in (3, 17):
        rng = random.Random(seed)
        base = [rng.choice(vocab) for _ in range(40)]
        docs = {}
        for i in range(6):
            toks = [rng.choice(vocab) for _ in range(80)]
            if i % 2 == 0:  # plant a shared run in half the docs
                p = rng.randrange(0, 40)
                toks[p : p + 20] = base[:20]
            docs[i] = " ".join(toks)
        assert _spark_out(spark, docs, w=8) == _ref_dedup(docs, 8)


def test_overlapping_windows_merge_to_one_cut(spark):
    # the docs share MORE than the planted span — the common framing
    # tokens extend the duplicated run, so the maximal cut swallows
    # "carrier ... end" too; only the genuinely unique words survive
    span = " ".join(f"tok{i}" for i in range(30))  # 30-token span, w=10
    docs = {1: "first carrier of the long span: " + span + " end one",
            2: "second carrier of the long span: " + span + " end two"}
    got = _spark_out(spark, docs, w=10)
    assert got == _ref_dedup(docs, 10)
    # every duplicated window in doc 2 merged into ONE contiguous cut
    assert got[2][0] == "second  two"
    assert got[1] == (docs[1], 0)  # canonical doc untouched


def test_unicode_length_changing_lower_offsets(spark):
    # 'İ'.lower() is TWO characters — offsets must come from the
    # original text, never the lowered one
    prefix1 = "İstanbul prose here first: "
    prefix2 = "ordinary opening for two... "
    docs = {1: prefix1 + _DUP, 2: prefix2 + _DUP}
    got = _spark_out(spark, docs)
    assert got == _ref_dedup(docs, _W)
    assert got[1][0] == docs[1]
    assert got[2][0].rstrip() == prefix2.rstrip()


def test_duplicated_window_stats(spark):
    docs = {1: _DUP + " one", 2: _DUP + " two", 3: "nothing shared here"}
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id bigint, text string")
    stats = S.duplicated_window_stats(df, window_tokens=_W).collect()
    assert len(stats) > 0
    assert all(r.n_occurrences >= 2 and r.n_docs == 2 for r in stats)


def test_plan_is_arrow_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = S.dedup_exact_substrings(df, window_tokens=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
