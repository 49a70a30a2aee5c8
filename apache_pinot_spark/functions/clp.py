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
and punctuation.

Float variables (round 6, closing the round-5 caveat): canonical
decimal tokens (`-?(0|[1-9]\\d*)\\.\\d+`, ≤15 mantissa digits) get
CLP's float-to-long treatment — packed into ONE int64 preserving the
exact rendering (sign bit 62, fraction-digit count bits 56-59,
mantissa digits-as-integer bits 0-55), '\\x13' placeholders, stored in
the same encodedVars stream as ints (the placeholder byte disambiguates
on decode, as in CLP). The pattern admits only tokens whose rendering
is BYTE-EXACTLY reproducible from (sign, mantissa, frac-count) — no
leading zeros in the integer part, no exponent, bounded digits — so
round-trip loss is impossible by construction; anything else
("007.5", "1e-3", 16+ digits, "1.2.3") falls through to the dictionary
pass exactly as before, which is lossless by storing the raw text.
A message already containing a placeholder byte is stored as one
whole-message dictionary variable (exact, rare, never ambiguous).

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
FLOAT_PLACEHOLDER = "\x13"

#: standalone integer runs (not embedded in a word, decimal, or
#: sign/hyphen compound — those stay for the dictionary pass)
INT_PATTERN = r"(?<![\w.+-])-?\d+(?![\w.+-])"
#: canonical decimal tokens whose rendering is reproducible from
#: (sign, mantissa-digits, frac-count): no leading zero in the integer
#: part, one dot, ≤15 total digits (mantissa < 2^50, so the decode-side
#: long arithmetic is exact), no exponent. Anything else goes to the
#: dictionary pass — lossless either way.
FLOAT_PATTERN = (
    r"(?<![\w.+-])-?(?=[0-9.]{3,16}(?![\w.+-]))(?:0|[1-9]\d*)\.\d+(?![\w.+-])"
)
#: digit-bearing token runs left after float + integer extraction
DICT_PATTERN = r"[\w.+-]*\d[\w.+-]*"
_PLACEHOLDER_CLASS = (
    f"[{ENCODED_PLACEHOLDER}{DICT_PLACEHOLDER}{FLOAT_PLACEHOLDER}]"
)

_POW10 = [10**i for i in range(16)]  # frac-count → divisor lookup


def _has_placeholder(c: Column) -> Column:
    return c.rlike(_PLACEHOLDER_CLASS)


def _strip_numeric(c: Column) -> Column:
    """c with float then integer tokens replaced by their placeholders
    (the shared first two encode passes)."""
    after_float = F.regexp_replace(c, FLOAT_PATTERN, FLOAT_PLACEHOLDER)
    return F.regexp_replace(after_float, INT_PATTERN, ENCODED_PLACEHOLDER)


def _pack_float(t: Column) -> Column:
    """'-12.50' → sign<<62 | frac_digits<<56 | int('1250'). Exact by
    the FLOAT_PATTERN constraints (≤15 digits, canonical form)."""
    neg = F.substring(t, 1, 1) == "-"
    body = F.when(neg, F.substr(t, F.lit(2), F.length(t))).otherwise(t)
    ip = F.element_at(F.split(body, r"\."), 1)
    fp = F.element_at(F.split(body, r"\."), 2)
    m = F.concat(ip, fp).cast("long")
    return (
        F.when(neg, F.lit(1 << 62)).otherwise(F.lit(0))
        + F.length(fp).cast("long") * F.lit(1 << 56)
        + m
    )


def unpack_float_str(v: Column) -> Column:
    """Inverse of _pack_float: the exact original rendering."""
    neg = F.shiftright(v, 62) % 2 == 1
    frac = (F.shiftright(v, 56) % 16).cast("int")
    m = v.bitwiseAND(F.lit((1 << 56) - 1))
    pow10 = F.element_at(F.array(*[F.lit(p) for p in _POW10]), frac + 1)
    ipart = ((m - m % pow10) / pow10).cast("long")  # exact: m < 2^50
    fpart = F.lpad((m % pow10).cast("string"), frac, "0")
    return F.concat(
        F.when(neg, F.lit("-")).otherwise(F.lit("")),
        ipart.cast("string"), F.lit("."), fpart,
    )


def clp_logtype(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    template = F.regexp_replace(_strip_numeric(c), DICT_PATTERN, DICT_PLACEHOLDER)
    return F.when(c.isNull(), None).when(
        _has_placeholder(c), F.lit(DICT_PLACEHOLDER)  # escape: whole-message var
    ).otherwise(template)


def clp_dictionary_vars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), None).when(
        _has_placeholder(c), F.array(c)
    ).otherwise(
        F.regexp_extract_all(_strip_numeric(c), F.lit(DICT_PATTERN), F.lit(0))
    )


def clp_encoded_vars(col: Column | str) -> Column:
    """Floats and ints share one stream in appearance order (the
    placeholder byte in the logtype says which decoder applies) — the
    CLP encodedVars contract."""
    c = F.col(col) if isinstance(col, str) else col
    nums = F.transform(
        F.regexp_extract_all(
            c, F.lit(f"{FLOAT_PATTERN}|{INT_PATTERN}"), F.lit(0)
        ),
        lambda t: F.when(t.contains("."), _pack_float(t)).otherwise(
            t.cast("long")
        ),
    )
    return F.when(c.isNull(), None).when(
        _has_placeholder(c), F.array().cast("array<long>")
    ).otherwise(nums)


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
        ).when(
            p == FLOAT_PLACEHOLDER,
            F.struct(
                F.concat(
                    acc["s"],
                    unpack_float_str(F.element_at(ev, acc["e"] + 1)),
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
