"""PII detection and redaction — the scrubbing pass every
training-data pipeline runs before text leaves the curation boundary.

Sibling of the GDPR purge job (sources/batch.py s8): purge deletes
ROWS for known subjects; redaction rewrites CONTENT that embeds
personal data (emails, phone numbers, IP addresses, credit-card-like
and SSN-like numbers, secret-bearing URLs). At 100 TB this must be a
pure map-side pass — and it is: every detector is a JVM
`regexp_replace`/`regexp_count` chain inside whole-stage codegen, no
shuffle, no Python, no driver involvement. Counting and redaction
share one pattern table so audits and scrubs can never disagree.

Detection is regex-heuristic by design (the industry baseline —
high-recall patterns, deliberately no checksum/NER validation): the
job is to keep obvious PII out of training corpora, not to certify
its absence. Each category redacts to a STABLE typed token
("<EMAIL>", …) so downstream tokenizers see one vocabulary item and
redaction is idempotent (tokens never re-match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: category → (java regex, replacement token). Order matters: broader
#: containers (urls with credentials) run before the pieces they contain.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "url_credential": (
        r"[a-zA-Z][a-zA-Z0-9+.-]*://[^\s/@]+:[^\s/@]+@[^\s]+",
        "<URL_CRED>",
    ),
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
        "<IP>",
    ),
    "ssn_like": (
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    "credit_card_like": (
        r"\b(?:[0-9][ -]?){13,16}[0-9]\b",
        "<CARD>",
    ),
    "phone": (
        r"(?<![\w.-])\+?[0-9]{1,3}[ .-]?\(?[0-9]{2,4}\)?(?:[ .-]?[0-9]{2,4}){2,3}"
        r"(?![\w-])",
        "<PHONE>",
    ),
}

#: categories whose patterns stay in the RE2-compatible subset (no
#: lookaround) and replace identically under Java regex and DuckDB/RE2 —
#: the set a SQL oracle can replay verbatim. "phone" is excluded: its
#: lookbehind/lookahead guards have no RE2 form.
PORTABLE_CATEGORIES: tuple = (
    "url_credential", "email", "ipv4", "ssn_like", "credit_card_like",
)


def redact_oracle_sql(col_sql: str, categories: list[str] | None = None) -> str:
    """The DuckDB regexp_replace chain equivalent to ``redact_expr`` for
    the portable categories — one source of truth for the gated
    pipeline oracle and the cross-engine parity tests. DuckDB needs the
    explicit 'g' flag (Java's regexp_replace is global by default)."""
    cats = list(categories) if categories is not None else list(
        PORTABLE_CATEGORIES)
    bad = [c for c in cats if c not in PORTABLE_CATEGORIES]
    if bad:
        raise ValueError(f"non-RE2-portable categories {bad}")
    expr = col_sql
    for cat in cats:
        pattern, token = PII_PATTERNS[cat]
        escaped = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{escaped}', '{token}', 'g')"
    return expr


def redact_expr(col: Column | str, categories: list[str] | None = None) -> Column:
    """One chained `regexp_replace` per enabled category — a single
    map-side projection (pattern order = PII_PATTERNS order)."""
    c = F.col(col) if isinstance(col, str) else col
    for cat in categories or list(PII_PATTERNS):
        pattern, token = PII_PATTERNS[cat]
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts_expr(col: Column | str, categories: list[str] | None = None) -> Column:
    """map<category, count> of detector hits — the audit side, from the
    SAME pattern table as the scrub."""
    c = F.col(col) if isinstance(col, str) else col
    cats = categories or list(PII_PATTERNS)
    return F.map_from_arrays(
        F.array(*[F.lit(cat) for cat in cats]),
        F.array(
            *[F.regexp_count(c, F.lit(PII_PATTERNS[cat][0])) for cat in cats]
        ),
    )


def redact_documents(
    df: DataFrame,
    text_col: str = "text",
    categories: list[str] | None = None,
    audit: bool = True,
) -> DataFrame:
    """Scrub ``text_col`` in place; with ``audit``, add
    ``pii_counts`` (per-category hits found) and ``pii_total``.
    Rows are never dropped — filtering on ``pii_total`` is the
    caller's policy decision (keep, drop, or route to review)."""
    unknown = set(categories or []) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(
            f"unknown PII categories {sorted(unknown)}; known: {sorted(PII_PATTERNS)}"
        )
    out = df
    if audit:
        counts = pii_counts_expr(text_col, categories)
        out = out.withColumn("pii_counts", counts).withColumn(
            "pii_total",
            F.aggregate(F.map_values("pii_counts"), F.lit(0), lambda a, x: a + x),
        )
    return out.withColumn(text_col, redact_expr(text_col, categories))
