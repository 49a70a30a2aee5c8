"""CLP-style log encoding — split log messages into a repetitive
logtype template plus extracted variables, the layout that makes
petabyte log search cheap.

The public system ingests log fields with a CLP encoder
(clpEncodedFields: one text field becomes `_logtype`,
`_dictionaryVars`, `_encodedVars` columns) and decodes at query time
with CLPDECODE. The scheme is public (Rodrigues et al., OSDI'21:
"CLP: Efficient and Scalable Search on Compressed Log Data"): log
messages are overwhelmingly template + variables, so storing each
template ONCE (dictionary-encoded by parquet automatically) and the
variables as slim typed arrays compresses and searches far better
than raw text.

This engine's mapping (all pure JVM expressions, no UDFs):

  * Tokens are space-separated runs. Integer tokens become ENCODED
    variables (array<long>, lossless text round-trip); any other token
    containing a digit — uuids, hex ids, floats, "task_123" — becomes
    a DICTIONARY variable (array<string>). Everything else stays in
    the logtype, with one placeholder char per variable ('\\x11' for
    encoded, '\\x12' for dictionary, the CLP convention).
  * Simplification vs full CLP, documented: CLP also splits on
    punctuation delimiters inside tokens and float-encodes decimals
    into longs; here tokens are whitespace-delimited and non-integer
    numerics go to the dictionary. Round-trip is EXACT (including
    repeated spaces — empty split tokens are static), which full CLP's
    float encoding cannot always promise.
  * A raw token that already contains a placeholder byte is forced
    into the dictionary so decode can never mis-substitute.
  * Decode rebuilds the message with a single JVM fold whose state is
    (pieces, next-dict-index, next-encoded-index) — linear, no Python.

Why it scales: the logtype column has tiny cardinality (templates),
so parquet dictionary-encodes it and predicates like
`logtype = '<template>'` prune via dictionary/stats before any row is
read; variable search (`array_contains(dictionaryVars, 'task_123')`)
scans slim arrays instead of full message text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENCODED_PLACEHOLDER = "\x11"
DICT_PLACEHOLDER = "\x12"

_INT_RE = "^-?[0-9]+$"
_HAS_DIGIT_RE = "[0-9]"


def _tokens(col: Column) -> Column:
    # split on single spaces, KEEPING empty tokens: "a  b" → [a, '', b],
    # so join(' ') reconstructs the original spacing exactly
    return F.split(col, " ", -1)


def _is_encoded(t: Column) -> Column:
    return t.rlike(_INT_RE)


def _is_dict(t: Column) -> Column:
    # any digit-bearing non-integer token; plus placeholder-byte escapes
    return (~_is_encoded(t)) & (
        t.rlike(_HAS_DIGIT_RE)
        | t.contains(ENCODED_PLACEHOLDER)
        | t.contains(DICT_PLACEHOLDER)
    )


def clp_logtype(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    toks = _tokens(c)
    return F.array_join(
        F.transform(
            toks,
            lambda t: F.when(_is_encoded(t), F.lit(ENCODED_PLACEHOLDER))
            .when(_is_dict(t), F.lit(DICT_PLACEHOLDER))
            .otherwise(t),
        ),
        " ",
    )


def clp_dictionary_vars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(_tokens(c), _is_dict)


def clp_encoded_vars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.filter(_tokens(c), _is_encoded), lambda t: t.cast("long"))


def clp_encode(df: DataFrame, col: str, drop_original: bool = True) -> DataFrame:
    """The ingestion transform: `col` → `{col}_logtype` /
    `{col}_dictionaryVars` / `{col}_encodedVars` (the public
    clpEncodedFields column triple)."""
    out = (
        df.withColumn(f"{col}_logtype", clp_logtype(col))
        .withColumn(f"{col}_dictionaryVars", clp_dictionary_vars(col))
        .withColumn(f"{col}_encodedVars", clp_encoded_vars(col))
    )
    return out.drop(col) if drop_original else out


def clp_decode(
    logtype: Column | str, dictionary_vars: Column | str, encoded_vars: Column | str
) -> Column:
    """CLPDECODE: reassemble the original message. One fold over the
    logtype tokens; state carries the next index into each variable
    array. NULL logtype decodes to NULL (as the public function's
    default-null form)."""
    lt = F.col(logtype) if isinstance(logtype, str) else logtype
    dv = F.col(dictionary_vars) if isinstance(dictionary_vars, str) else dictionary_vars
    ev = F.col(encoded_vars) if isinstance(encoded_vars, str) else encoded_vars
    toks = _tokens(lt)
    state = F.aggregate(
        toks,
        F.struct(
            F.array().cast("array<string>").alias("pieces"),
            F.lit(0).alias("d"),
            F.lit(0).alias("e"),
        ),
        lambda acc, t: F.when(
            t == ENCODED_PLACEHOLDER,
            F.struct(
                F.concat(
                    acc["pieces"],
                    F.array(F.element_at(ev, acc["e"] + 1).cast("string")),
                ).alias("pieces"),
                acc["d"].alias("d"),
                (acc["e"] + 1).alias("e"),
            ),
        )
        .when(
            t == DICT_PLACEHOLDER,
            F.struct(
                F.concat(
                    acc["pieces"], F.array(F.element_at(dv, acc["d"] + 1))
                ).alias("pieces"),
                (acc["d"] + 1).alias("d"),
                acc["e"].alias("e"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["pieces"], F.array(t)).alias("pieces"),
                acc["d"].alias("d"),
                acc["e"].alias("e"),
            )
        ),
    )
    return F.array_join(state["pieces"], " ")
