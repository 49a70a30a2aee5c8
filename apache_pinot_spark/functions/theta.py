"""Theta sketches — approximate distinct counting WITH set algebra
(union / intersection / difference), the capability HLL lacks.

The public system exposes DISTINCT_COUNT_THETA_SKETCH: per-group theta
sketches that can be combined with set expressions at query time
("users who did A and B" from two filtered sketches), which plain
DISTINCTCOUNTHLL cannot answer (HLL unions, but never intersects).
This module implements the standard theta-sketch framework (Dasgupta,
Lang, Rhodes, Thorne: "Theta-Sketch Framework" / the KMV bottom-k
family):

  * A sketch is (cut, entries): entries = the retained distinct 64-bit
    hash values, all < cut, capped at nominal size k. cut = 2^64 means
    the sketch is EXACT (all distinct hashes retained). theta is the
    normalized cut (cut / 2^64).
  * estimate = |entries| / theta.
  * union: cut = min(cuts), keep distinct entries < cut, trim to the k
    smallest (new cut = the (k+1)-th smallest entry) if over k.
  * intersect: cut = min(cuts), keep entries present in BOTH and
    < cut. a_not_b: entries of A below cut and absent from B.

The cut is kept as an EXACT integer (never a rounded float64 theta) so
trim/filter boundary comparisons are deterministic; only the final
estimate converts to float.

WIRE-COMPATIBLE with Apache DataSketches (since round 6): hashing is
MurmurHash3-x64-128 seed 9001 (h1 >> 1, zero rejected — the exact
datasketches update pipeline, vectorized in numpy), the hash domain is
[1, 2^63-1), and serialize/deserialize speak the published compact-theta
layout (functions/theta_wire.py — byte-identical round trips golden-
tested against datasketches-java 6.2.0, which ships on Spark's
classpath). A migrating Pinot user's serialized BYTES sketch columns
(reference configuration-reference/schema.md:48) load, merge, and
estimate here directly, and blobs built here heapify in any DataSketches
implementation. Integers hash as 8-byte LE longs, strings as UTF-8
bytes, doubles as canonicalized Double.doubleToLongBits — matching the
datasketches update() overload contracts, so the SAME VALUES produce the
SAME SKETCH ENTRIES across systems (set algebra between a Pinot-built
and an engine-built sketch is meaningful, not just parseable).

Scale shape (100 TB): identical to tdigest_sketch — a mapInPandas
pass emits one ≤k-entry partial sketch per (group, Arrow batch)
(map-side combine), then groupBy + applyInPandas merges the
constant-size partials. Only sketches shuffle, never raw rows;
per-group state is bounded by k·8 bytes regardless of cardinality —
the constant-state property the HLL fold fallback (functions/hll.py)
loses in join shapes.
"""

from __future__ import annotations

import re
import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint inference needs 'pd.*'

from apache_pinot_spark.functions import theta_wire as _wire

DEFAULT_NOMINAL = 4096  # nominal entries k (datasketches' default lg_k=12)
DEFAULT_SEED = _wire.DEFAULT_SEED  # 9001, DataSketches/Pinot default
_EXACT_CUT = _wire.LONG_MAX  # 2^63-1 (initial theta): "retain everything"


class ThetaSketch:
    """(cut, sorted uint64 entries) with nominal cap k. ``cut`` is a
    Python int in (0, 2^63-1]; all entries are < cut (the DataSketches
    hash domain — murmur3 h1 >> 1)."""

    __slots__ = ("cut", "entries", "k")

    def __init__(self, cut: int, entries: np.ndarray, k: int = DEFAULT_NOMINAL):
        self.cut = int(cut)
        self.entries = np.asarray(entries, dtype=np.uint64)
        self.k = int(k)

    # -- construction ------------------------------------------------------
    @classmethod
    def empty(cls, k: int = DEFAULT_NOMINAL) -> "ThetaSketch":
        return cls(_EXACT_CUT, np.empty(0, dtype=np.uint64), k)

    @classmethod
    def from_hashes(cls, hashes: np.ndarray, k: int = DEFAULT_NOMINAL) -> "ThetaSketch":
        h = np.asarray(hashes, dtype=np.uint64)
        # datasketches rejects hash 0 and hashes >= initial theta
        h = h[(h != np.uint64(0)) & (h < np.uint64(_EXACT_CUT))]
        return cls(_EXACT_CUT, np.unique(h), k)._trim()

    @classmethod
    def from_values(cls, values: "pd.Series", k: int = DEFAULT_NOMINAL) -> "ThetaSketch":
        """Hash a pandas Series with the per-type canonical encodings of
        datasketches update(): ints/datetimes as 8-byte LE longs, floats
        as canonicalized doubleToLongBits, strings as UTF-8, bytes raw —
        all via the vectorized murmur batches in theta_wire."""
        v = values.dropna()
        if v.empty:
            return cls.empty(k)
        kind = v.dtype.kind
        if kind in "iub":
            h = _wire.hash64_longs(v.to_numpy(dtype=np.int64))
        elif kind == "f":
            h = _wire.hash64_longs(_wire.java_double_bits(v.to_numpy(dtype=np.float64)))
        elif kind == "M":
            h = _wire.hash64_longs(v.to_numpy(dtype="datetime64[ns]").view(np.int64))
        else:
            encoded = [
                x if isinstance(x, bytes)
                else (x.encode("utf-8") if isinstance(x, str) else None)
                for x in v
            ]
            # mixed/odd object values fall back to their canonical long
            # or string form (matches the datasketches overload a Java
            # caller would hit)
            for i, (x, e) in enumerate(zip(v, encoded)):
                if e is None:
                    if isinstance(x, (int, np.integer)):
                        encoded[i] = struct.pack("<q", int(x))
                    elif isinstance(x, (float, np.floating)):
                        encoded[i] = struct.pack(
                            "<q", int(_wire.java_double_bits(np.array([x]))[0])
                        )
                    else:
                        encoded[i] = str(x).encode("utf-8")
            h = _wire.hash64_bytes(encoded)
        return cls.from_hashes(h, k)

    def _trim(self) -> "ThetaSketch":
        """Enforce the nominal cap: keep the k smallest entries, set cut
        to the (k+1)-th smallest (the standard QuickSelect compact rule,
        so estimate = k / theta)."""
        if self.entries.size <= self.k:
            return self
        return ThetaSketch(int(self.entries[self.k]), self.entries[: self.k], self.k)

    def _below(self, cut: int) -> np.ndarray:
        if cut >= _EXACT_CUT:
            return self.entries
        return self.entries[self.entries < np.uint64(cut)]

    # -- estimation --------------------------------------------------------
    @property
    def theta(self) -> float:
        return self.cut / _EXACT_CUT

    @property
    def is_exact(self) -> bool:
        return self.cut >= _EXACT_CUT

    def estimate(self) -> float:
        # exact integer ratio, converted to float once
        return float(self.entries.size * _EXACT_CUT / self.cut)

    # -- set algebra -------------------------------------------------------
    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        cut = min(self.cut, other.cut)
        merged = np.union1d(self._below(cut), other._below(cut))
        return ThetaSketch(cut, merged, min(self.k, other.k))._trim()

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        cut = min(self.cut, other.cut)
        common = np.intersect1d(self._below(cut), other._below(cut))
        return ThetaSketch(cut, common, min(self.k, other.k))

    def a_not_b(self, other: "ThetaSketch") -> "ThetaSketch":
        cut = min(self.cut, other.cut)
        kept = np.setdiff1d(self._below(cut), other.entries)
        return ThetaSketch(cut, kept, self.k)


def union_all(sketches: Iterable[ThetaSketch]) -> ThetaSketch:
    out: ThetaSketch | None = None
    for s in sketches:
        out = s if out is None else out.union(s)
    return out if out is not None else ThetaSketch.empty()


# -- wire format (Apache DataSketches compact theta; theta_wire.py) --------
def serialize(s: ThetaSketch, seed: int = DEFAULT_SEED) -> bytes:
    """The DataSketches compact-theta wire form — heapifiable by
    datasketches-java/cpp/py and loadable as a Pinot BYTES sketch
    column. The nominal k is not part of the wire format (DataSketches
    doesn't serialize it for compact sketches); deserialize takes it as
    a parameter."""
    return _wire.serialize_compact(s.entries, s.cut, seed)


def deserialize(blob: bytes, k: int = DEFAULT_NOMINAL,
                seed: int = DEFAULT_SEED) -> ThetaSketch:
    """Parse any DataSketches compact-theta blob (empty / single-item /
    exact / estimation, ordered or not) with seed-hash validation and
    the hostile-blob bounds checks (theta_wire.deserialize_compact)."""
    entries, theta_long = _wire.deserialize_compact(blob, seed)
    return ThetaSketch(theta_long, entries, k)


def merge_blobs(blobs: Iterable[bytes], k: int = DEFAULT_NOMINAL) -> ThetaSketch:
    """k is a merge-time parameter (the wire format doesn't carry it —
    DataSketches unions take lgNomEntries the same way).

    Bulk union: min-cut across all blobs, ONE concatenate + unique over
    the surviving entries, ONE trim — the same state the library's
    Union reaches by inserting every input into one table, and flat in
    blob count where pairwise union1d would rescan the accumulator per
    blob (thousands of per-segment sketches per group)."""
    parsed = [deserialize(b, k=k) for b in blobs if b is not None]
    if not parsed:
        return ThetaSketch.empty(k)
    cut = min(p.cut for p in parsed)
    parts = [p._below(cut) for p in parsed]
    merged = np.unique(np.concatenate(parts))
    return ThetaSketch(cut, merged, min(min(p.k for p in parsed), k))._trim()


# -- Spark integration -----------------------------------------------------
def theta_sketch(df, keys: list[str], value_col: str,
                 k: int = DEFAULT_NOMINAL, out_col: str = "theta"):
    """Per-group theta-sketch BYTES column, built map-side-first (same
    partial/final contract as tdigest_sketch: raw rows reduce to ≤k
    hashes per group per Arrow batch before any shuffle)."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        [df.schema[kk] for kk in keys] + [StructField(out_col, BinaryType())]
    )

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # self-contained closure: runs on Python workers (imports inside)
        import pandas as _pd

        from apache_pinot_spark.functions import theta as _t

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for kv, grp in pdf.groupby(keys, dropna=False, sort=False):
                if not isinstance(kv, tuple):
                    kv = (kv,)
                rows.append(
                    (*kv, _t.serialize(_t.ThetaSketch.from_values(grp[value_col], k)))
                )
            yield _pd.DataFrame(rows, columns=[*keys, out_col])

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from apache_pinot_spark.functions import theta as _t

        head = pdf.iloc[[0]][keys].copy()
        head[out_col] = [_t.serialize(_t.merge_blobs(pdf[out_col], k))]
        return head

    return (
        df.select(*keys, value_col)
        .mapInPandas(partials, schema)
        .groupBy(*keys)
        .applyInPandas(merge, schema)
    )


def theta_sketch_global(df, value_col: str, k: int = DEFAULT_NOMINAL) -> ThetaSketch:
    """One sketch over the whole frame (no grouping): mapInPandas emits
    ≤k-entry partial blobs (one per Arrow batch), which are merged on
    the driver. The collect is bounded — #partial-blobs × (25 + 8k)
    bytes — the standard sketch-aggregation driver cost, independent of
    row count."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType([StructField("blob", BinaryType())])

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        from apache_pinot_spark.functions import theta as _t

        for pdf in batches:
            if pdf.empty:
                continue
            yield _pd.DataFrame(
                {"blob": [_t.serialize(_t.ThetaSketch.from_values(pdf[value_col], k))]}
            )

    blobs = [r["blob"] for r in df.select(value_col).mapInPandas(partials, schema).collect()]
    merged = merge_blobs(blobs, k)
    return merged if blobs else ThetaSketch.empty(k)


_SET_OPS = {"SET_UNION", "SET_INTERSECT", "SET_DIFF"}
_SET_TOKEN = re.compile(
    r"\s*(SET_UNION|SET_INTERSECT|SET_DIFF|\(|\)|,|\$\d+)\s*", re.IGNORECASE
)


def evaluate_set_expression(expr: str, sketches: dict[str, ThetaSketch]) -> ThetaSketch:
    """Evaluate a post-aggregation set expression over named sketches —
    the public DISTINCT_COUNT_THETA_SKETCH combinator surface:
    ``SET_UNION($1, $2, …)``, ``SET_INTERSECT(…)``, ``SET_DIFF(a, b)``
    (exactly two arguments), nesting allowed, ``$k`` referencing the
    k-th filtered sketch."""
    toks: list[str] = []
    pos = 0
    while pos < len(expr):
        m = _SET_TOKEN.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip() == "":
                break
            raise ValueError(f"theta set expression: cannot parse {expr[pos:]!r}")
        toks.append(m.group(1))
        pos = m.end()
    if not toks:
        raise ValueError("theta set expression: empty expression")

    def parse(i: int) -> tuple[ThetaSketch, int]:
        if i >= len(toks):
            raise ValueError("theta set expression: unexpected end of expression")
        t = toks[i]
        if t.startswith("$"):
            if t not in sketches:
                raise ValueError(f"theta set expression: unknown sketch ref {t}")
            return sketches[t], i + 1
        op = t.upper()
        if op not in _SET_OPS:
            raise ValueError(f"theta set expression: expected operator or $k, got {t!r}")
        if i + 1 >= len(toks) or toks[i + 1] != "(":
            raise ValueError(f"theta set expression: {op} needs parenthesized args")
        args: list[ThetaSketch] = []
        i += 2
        while True:
            s, i = parse(i)
            args.append(s)
            if i >= len(toks):
                raise ValueError("theta set expression: unbalanced parentheses")
            if toks[i] == ",":
                i += 1
                continue
            if toks[i] == ")":
                i += 1
                break
            raise ValueError(f"theta set expression: expected ',' or ')', got {toks[i]!r}")
        if op == "SET_DIFF":
            if len(args) != 2:
                raise ValueError("SET_DIFF takes exactly two arguments")
            return args[0].a_not_b(args[1]), i
        out = args[0]
        for s in args[1:]:
            out = out.union(s) if op == "SET_UNION" else out.intersect(s)
        return out, i

    result, end = parse(0)
    if end != len(toks):
        raise ValueError(f"theta set expression: trailing tokens {toks[end:]}")
    return result


ESTIMATE_UDF = "pinot_theta_estimate"
UNION_UDF = "pinot_theta_union"
BUILD_UDF = "pinot_theta_build"
SETEXPR_UDF = "pinot_theta_setexpr"
SETEXPR_RAW_UDF = "pinot_theta_setexpr_raw"


def register_theta_udfs(spark) -> None:
    """SQL surface over BYTES sketch columns: ``pinot_theta_union(blob)``
    (grouped-agg union returning a merged blob) and
    ``pinot_theta_estimate(blob)`` (scalar estimate per blob) —
    composable as estimate(union(...)) with GROUP BY, the
    DISTINCT_COUNT_THETA_SKETCH query shape. Idempotent per session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pinot_theta_union(blobs: pd.Series) -> bytes:
        from apache_pinot_spark.functions import theta as _t

        return _t.serialize(_t.merge_blobs(blobs.dropna()))

    @pandas_udf("double")
    def pinot_theta_estimate(blobs: pd.Series) -> pd.Series:
        from apache_pinot_spark.functions import theta as _t

        return blobs.map(
            lambda b: float("nan") if b is None else _t.deserialize(b).estimate()
        )

    @pandas_udf("binary")
    def pinot_theta_build(values: pd.Series, k: pd.Series) -> bytes:
        # grouped-agg build from RAW values (the filtered-sketch leg of
        # the in-SQL set-expression form over non-sketch columns)
        from apache_pinot_spark.functions import theta as _t

        return _t.serialize(
            _t.ThetaSketch.from_values(values.dropna(), int(k.iloc[0]))
        )

    def _eval_setexpr(exprs: pd.Series, blob_arrays: pd.Series):
        from apache_pinot_spark.functions import theta as _t

        out = []
        for e, arr in zip(exprs, blob_arrays):
            sketches = {
                f"${i + 1}": (
                    _t.ThetaSketch.empty()
                    if b is None
                    else _t.deserialize(bytes(b))
                )
                for i, b in enumerate(arr if arr is not None else [])
            }
            out.append(_t.evaluate_set_expression(e, sketches))
        return out

    @pandas_udf("double")
    def pinot_theta_setexpr(exprs: pd.Series, blobs: pd.Series) -> pd.Series:
        return pd.Series([s.estimate() for s in _eval_setexpr(exprs, blobs)])

    @pandas_udf("binary")
    def pinot_theta_setexpr_raw(exprs: pd.Series, blobs: pd.Series) -> pd.Series:
        from apache_pinot_spark.functions import theta as _t

        return pd.Series([_t.serialize(s) for s in _eval_setexpr(exprs, blobs)])

    spark.udf.register(UNION_UDF, pinot_theta_union)
    spark.udf.register(ESTIMATE_UDF, pinot_theta_estimate)
    spark.udf.register(BUILD_UDF, pinot_theta_build)
    spark.udf.register(SETEXPR_UDF, pinot_theta_setexpr)
    spark.udf.register(SETEXPR_RAW_UDF, pinot_theta_setexpr_raw)
