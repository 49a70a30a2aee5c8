"""Property-based tests (hypothesis) — SURVEY §5: parser robustness and
estimator soundness, checked over generated inputs rather than fixtures."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_pinot_spark.functions.text import (
    DEFAULT_STOP_WORDS,
    _norm_terms,
    parse_text_expression,
)

_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@st.composite
def text_exprs(draw, depth=0):
    """Random well-formed TEXT_MATCH expressions."""
    if depth >= 3:
        choices = ["term", "phrase", "prefix"]
    else:
        choices = ["term", "phrase", "prefix", "and", "or", "group"]
    kind = draw(st.sampled_from(choices))
    if kind == "term":
        return draw(_WORD)
    if kind == "prefix":
        return draw(_WORD) + "*"
    if kind == "phrase":
        words = draw(st.lists(_WORD, min_size=1, max_size=3))
        return '"' + " ".join(words) + '"'
    if kind == "group":
        return "(" + draw(text_exprs(depth=depth + 1)) + ")"
    op = " AND " if kind == "and" else " OR "
    return draw(text_exprs(depth=depth + 1)) + op + draw(text_exprs(depth=depth + 1))


@given(text_exprs())
@settings(max_examples=200, deadline=None)
def test_text_parser_total_on_wellformed(expr):
    """The parser accepts every well-formed expression without raising."""
    node = parse_text_expression(expr)
    assert node is not None


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_text_parser_never_hangs_or_crashes_unexpectedly(s):
    """Arbitrary input either parses or raises ValueError — nothing else."""
    try:
        parse_text_expression(s)
    except ValueError:
        pass


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_analyzer_normalization_idempotent(s):
    """Tokenizing the space-joined token stream reproduces it (analyzer
    output is a fixed point — what the text index stores is canonical)."""
    toks = _norm_terms(s, DEFAULT_STOP_WORDS)
    again = _norm_terms(" ".join(toks), DEFAULT_STOP_WORDS)
    assert toks == again
    for t in toks:
        assert re.fullmatch("[a-z0-9]+", t)
        assert t not in DEFAULT_STOP_WORDS


def _minhash_sig(shingles: set[str], num_hashes: int = 64) -> list[str]:
    """Pure-python mirror of the portable minhash (md5 slices)."""
    import hashlib

    out = []
    for i in range(num_hashes):
        seed = i // 4
        lo = 8 * (i % 4)
        out.append(
            min(
                hashlib.md5(f"{seed}|{s}".encode()).hexdigest()[lo : lo + 8]
                for s in shingles
            )
        )
    return out


@given(
    st.sets(_WORD, min_size=1, max_size=30),
    st.sets(_WORD, min_size=1, max_size=30),
)
@settings(max_examples=50, deadline=None)
def test_minhash_estimates_jaccard(a, b):
    """Signature agreement approximates true Jaccard within a loose bound
    (64 hashes → stderr ≈ 0.06; allow 4 sigma)."""
    sa, sb = _minhash_sig(a), _minhash_sig(b)
    est = sum(x == y for x, y in zip(sa, sb)) / len(sa)
    true = len(a & b) / len(a | b)
    assert abs(est - true) <= 0.25 + 1e-9
