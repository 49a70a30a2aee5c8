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

Variables are extracted IN PLACE (CLP's model): the logtype keeps
every delimiter and space verbatim, with one placeholder byte per
variable, so `user=1234, path=/a/b1` has logtype
`user=\\x11, path=\\x12` — ints embedded in punctuation still become
encoded variables. Two passes of pure JVM regex, no UDFs:

  1. integer runs not embedded in a word/number
     (`(?<![\\w.+-])-?\\d+(?![\\w.+-])`) → '\\x11' placeholders +
     array<long> encodedVars (lossless text round-trip);
  2. remaining digit-bearing token runs (`[\\w.+-]*\\d[\\w.+-]*` —
     uuids, hexes, floats, "task_123") → '\\x12' placeholders +
     array<string> dictionaryVars.

Decode interleaves split-parts with the placeholder sequence in one
indexed fold — byte-exact reconstruction, including all whitespace
and punctuation. Simplification vs full CLP, documented: non-integer
numerics go to the dictionary instead of CLP's float-to-long encoding
(which is lossy for trailing zeros); a message already containing a
placeholder byte is stored as one whole-message dictionary variable
(exact, rare, never ambiguous).

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

#: standalone integer runs (not embedded in a word, decimal, or
#: sign/hyphen compound — those stay for the dictionary pass)
INT_PATTERN = r"(?<![\w.+-])-?\d+(?![\w.+-])"
#: digit-bearing token runs left after integer extraction
DICT_PATTERN = r"[\w.+-]*\d[\w.+-]*"
_PLACEHOLDER_CLASS = f"[{ENCODED_PLACEHOLDER}{DICT_PLACEHOLDER}]"


def _has_placeholder(c: Column) -> Column:
    return c.rlike(_PLACEHOLDER_CLASS)


def clp_logtype(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    after_int = F.regexp_replace(c, INT_PATTERN, ENCODED_PLACEHOLDER)
    template = F.regexp_replace(after_int, DICT_PATTERN, DICT_PLACEHOLDER)
    return F.when(c.isNull(), None).when(
        _has_placeholder(c), F.lit(DICT_PLACEHOLDER)  # escape: whole-message var
    ).otherwise(template)


def clp_dictionary_vars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    after_int = F.regexp_replace(c, INT_PATTERN, ENCODED_PLACEHOLDER)
    return F.when(c.isNull(), None).when(
        _has_placeholder(c), F.array(c)
    ).otherwise(F.regexp_extract_all(after_int, F.lit(DICT_PATTERN), F.lit(0)))


def clp_encoded_vars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    ints = F.transform(
        F.regexp_extract_all(c, F.lit(INT_PATTERN), F.lit(0)), lambda t: t.cast("long")
    )
    return F.when(c.isNull(), None).when(
        _has_placeholder(c), F.array().cast("array<long>")
    ).otherwise(ints)


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
    """CLPDECODE: reassemble the original message byte-exactly. The
    logtype splits into literal parts around placeholder bytes; one
    indexed fold interleaves parts with the right variable stream
    (placeholder order recovered via regexp_extract_all). NULL logtype
    decodes to NULL."""
    lt = F.col(logtype) if isinstance(logtype, str) else logtype
    dv = F.col(dictionary_vars) if isinstance(dictionary_vars, str) else dictionary_vars
    ev = F.col(encoded_vars) if isinstance(encoded_vars, str) else encoded_vars
    phs = F.regexp_extract_all(lt, F.lit(_PLACEHOLDER_CLASS), F.lit(0))
    parts = F.split(lt, _PLACEHOLDER_CLASS, -1)
    state = F.aggregate(
        phs,
        F.struct(
            F.element_at(parts, 1).alias("s"),
            F.lit(0).alias("d"),
            F.lit(0).alias("e"),
        ),
        lambda acc, p: F.when(
            p == ENCODED_PLACEHOLDER,
            F.struct(
                F.concat(
                    acc["s"],
                    F.element_at(ev, acc["e"] + 1).cast("string"),
                    F.element_at(parts, acc["d"] + acc["e"] + 2),
                ).alias("s"),
                acc["d"].alias("d"),
                (acc["e"] + 1).alias("e"),
            ),
        ).otherwise(
            F.struct(
                F.concat(
                    acc["s"],
                    F.element_at(dv, acc["d"] + 1),
                    F.element_at(parts, acc["d"] + acc["e"] + 2),
                ).alias("s"),
                (acc["d"] + 1).alias("d"),
                acc["e"].alias("e"),
            )
        ),
    )
    return state["s"]
