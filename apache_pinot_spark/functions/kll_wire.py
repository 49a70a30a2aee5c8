"""Apache DataSketches KLL doubles-sketch BYTES interop — READ side.

The reference's PERCENTILEKLL family stores per-segment percentile
state as serialized org.apache.datasketches.kll.KllDoublesSketch BYTES
columns (configuration-reference/schema.md:48). This module parses
that wire format and answers quantile queries over one or many blobs,
so a migrating user's KLL sketch columns keep answering percentile
queries here.

Wire layout (datasketches-java/cpp KLL serialization, little-endian;
validated byte-level against datasketches-java 6.2.0 on Spark's
classpath — tests/test_kll_wire.py):

    byte 0    preamble ints (2 empty/single, 5 full)
    byte 1    serial version (1 full, 2 single-item)
    byte 2    family id = 15 (KLL)
    byte 3    flags: 1=EMPTY, 2=LEVEL_ZERO_SORTED, 4=SINGLE_ITEM
    bytes 4-5 k (uint16)
    byte 6    m (min level width, 8)
    byte 7    unused
  single-item: one double follows the 8-byte preamble.
  full (preamble ints 5):
    bytes 8-15  n (uint64)
    bytes 16-17 min-k (uint16)   byte 18 numLevels   byte 19 unused
    numLevels × uint32: the levels offsets array (first numLevels
        entries; the terminal boundary is implied by retained count)
    min item (double), max item (double)
    retained items (doubles), stored from offset levels[0] — level i
        holds items [levels[i], levels[i+1]) each of weight 2^i.

Weights are EXACT in KLL (a compaction replaces 2 items of weight w by
1 of weight 2w), so sum(weights) == n and quantile evaluation over the
weighted retained items reproduces the library's own sorted-view rule:
    quantile(rank, INCLUSIVE) = smallest item whose cumulative weight
    ≥ rank·n  (EXCLUSIVE: > rank·n, clamped to the largest item).

Merging across blobs here happens in WEIGHTED-SAMPLE space (concat the
(item, weight) pairs, evaluate the same rule): this is a deterministic
valid estimator whose error is bounded by the per-sketch errors.

WRITE side (build_kll_doubles / merge_kll_blobs): the library's own
compaction is randomized, so byte-parity with a Java build is not a
meaningful target; instead a DETERMINISTIC compactor (alternating
parity — a de-randomization of the same 2-to-1 step) emits structurally
valid wire state that heapifies in datasketches-java (jar-validated in
tests/test_kll_wire.py), keeping this engine's reproducibility/oracle
contract while giving migrating users loadable blobs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint inference needs 'pd.*'

_FAMILY_KLL = 15
_F_EMPTY = 1
_F_SINGLE = 4


@dataclass
class KllDoubles:
    k: int
    n: int
    items: np.ndarray    # retained items (float64)
    weights: np.ndarray  # per-item weights (uint64), sum == n
    min_item: float
    max_item: float


def parse_kll_doubles(blob: bytes) -> KllDoubles:
    """Parse a serialized KllDoublesSketch (any DataSketches impl)."""
    if len(blob) < 8:
        raise ValueError("KLL blob too short for a preamble")
    pre_ints, ser_ver, family, flags = struct.unpack_from("<BBBB", blob, 0)
    k, m = struct.unpack_from("<HB", blob, 4)
    if family != _FAMILY_KLL:
        raise ValueError(f"not a KLL sketch (family {family})")
    if ser_ver not in (1, 2):
        raise ValueError(f"unsupported KLL serial version {ser_ver}")
    if k < 8 or m != 8:
        raise ValueError(f"KLL blob invalid: k={k} m={m}")
    if flags & _F_EMPTY:
        return KllDoubles(k, 0, np.empty(0), np.empty(0, np.uint64),
                          float("nan"), float("nan"))
    if flags & _F_SINGLE or ser_ver == 2:
        if len(blob) < 16:
            raise ValueError("single-item KLL blob truncated")
        v = struct.unpack_from("<d", blob, 8)[0]
        return KllDoubles(k, 1, np.array([v]), np.array([1], np.uint64), v, v)
    if pre_ints != 5 or len(blob) < 20:
        raise ValueError(f"unsupported KLL preamble ({pre_ints} ints)")
    n, min_k, num_levels = struct.unpack_from("<QHB", blob, 8)
    if n <= 0 or num_levels < 1 or num_levels > 61:
        raise ValueError(f"KLL blob invalid: n={n} levels={num_levels}")
    off = 20
    need = off + 4 * num_levels + 16
    if len(blob) < need:
        raise ValueError("KLL blob truncated in levels/min/max")
    levels = np.frombuffer(blob, dtype="<u4", count=num_levels, offset=off).astype(
        np.int64
    )
    off += 4 * num_levels
    min_item, max_item = struct.unpack_from("<dd", blob, off)
    off += 16
    retained = (len(blob) - off) // 8
    if retained < 1 or len(blob) < off + 8 * retained:
        raise ValueError("KLL blob truncated in items")
    items = np.frombuffer(blob, dtype="<f8", count=retained, offset=off).copy()
    # levels are offsets into the in-memory array starting at levels[0];
    # the terminal boundary is levels[0] + retained
    bounds = np.append(levels, levels[0] + retained)
    counts = np.diff(bounds)
    if (counts < 0).any():
        raise ValueError("KLL blob invalid: decreasing level offsets")
    weights = np.repeat(
        np.left_shift(np.uint64(1), np.arange(num_levels, dtype=np.uint64)),
        counts,
    )
    if int(weights.sum()) != n:
        raise ValueError(
            f"KLL blob invalid: weights sum {int(weights.sum())} != n {n}"
        )
    return KllDoubles(k, int(n), items, weights, min_item, max_item)


def quantile_from_samples(
    items: np.ndarray, weights: np.ndarray, total: int, rank: float,
    inclusive: bool = True,
) -> float:
    """The DataSketches sorted-view rule over weighted samples."""
    if total <= 0 or items.size == 0:
        raise ValueError("quantile of an empty sketch")
    if not 0.0 <= rank <= 1.0:
        raise ValueError(f"rank {rank} outside [0, 1]")
    order = np.argsort(items, kind="stable")
    s_items = items[order]
    cum = np.cumsum(weights[order].astype(np.float64))
    target = rank * total
    if inclusive:
        idx = int(np.searchsorted(cum, target, side="left"))
    else:
        idx = int(np.searchsorted(cum, target, side="right"))
    if idx >= s_items.size:
        idx = s_items.size - 1
    return float(s_items[idx])


def kll_quantile(blobs, rank: float, inclusive: bool = True) -> float:
    """Quantile over one blob or an iterable of blobs (weighted-sample
    merge — see module doc)."""
    if isinstance(blobs, (bytes, bytearray)):
        blobs = [blobs]
    parsed = [parse_kll_doubles(bytes(b)) for b in blobs if b is not None]
    parsed = [p for p in parsed if p.n > 0]
    if not parsed:
        raise ValueError("KLL quantile: no non-empty sketches")
    # the library's rule: exact ranks 0.0 / 1.0 answer from the
    # separately-stored min/max items (compaction may have dropped them
    # from the retained set)
    if rank == 0.0:
        return float(min(p.min_item for p in parsed))
    if rank == 1.0:
        return float(max(p.max_item for p in parsed))
    items = np.concatenate([p.items for p in parsed])
    weights = np.concatenate([p.weights for p in parsed])
    total = sum(p.n for p in parsed)
    return quantile_from_samples(items, weights, total, rank, inclusive)


# --------------------------------------------------------------------------
# WRITE side: deterministic KLL builder + serializer.
#
# The library's own compaction is randomized (each compaction picks an
# even/odd offset by coin flip) — that is why byte-level build parity is
# not a meaningful target.  But a DETERMINISTIC compactor (alternating
# parity, a published de-randomization of the same 2-to-1 step) still
# produces STRUCTURALLY VALID KLL state: the serialized blob heapifies
# in datasketches-java and answers quantiles within the sketch's error
# envelope, while OUR output is reproducible run-to-run — which is what
# this engine's determinism/oracle contract needs.  The wire layout
# requires the library's EXACT level-capacity rule (items are stored
# right-aligned against computeTotalItemCapacity(k, m, numLevels); the
# terminal levels boundary is implied by it), reproduced below from the
# public KllHelper arithmetic: cap(level) = max(m, round(k·(2/3)^depth))
# computed exactly as ((2k·2^depth)/3^depth + 1) >> 1.
# --------------------------------------------------------------------------
_M = 8  # the library's fixed min level width


def _level_capacity(k: int, num_levels: int, level: int) -> int:
    depth = num_levels - level - 1
    if depth > 30:
        return _M
    cap = (((2 * k) << depth) // (3**depth) + 1) >> 1
    return max(_M, cap)


def _total_capacity(k: int, num_levels: int) -> int:
    return sum(_level_capacity(k, num_levels, lv) for lv in range(num_levels))


def _compact_levels(levels: list[np.ndarray], k: int) -> list[np.ndarray]:
    """Deterministic KLL compaction: while any level overflows its
    capacity (or total retained exceeds total capacity), compact the
    lowest overfull level — sort, promote every other item (alternating
    parity), odd leftover stays.  Growing numLevels shrinks lower-level
    capacities (depth increases), so loop to a fixed point."""
    parity = 0
    while True:
        nl = len(levels)
        caps = [_level_capacity(k, nl, lv) for lv in range(nl)]
        over = [
            lv for lv in range(nl)
            if levels[lv].size > caps[lv]
        ]
        if not over:
            # every level within its capacity ⇒ total within total
            # capacity too — done
            return levels
        lv = over[0]
        src = np.sort(levels[lv])
        odd = src.size % 2
        keep = src[:odd]  # odd leftover: the smallest item stays, weight 1
        # the even-count block compacts 2-to-1: survivors at the chosen
        # parity double their weight, the others transfer theirs
        promoted = src[odd + parity :: 2]
        parity ^= 1
        levels[lv] = keep
        if lv + 1 == len(levels):
            levels.append(np.empty(0))
        levels[lv + 1] = np.sort(np.concatenate([levels[lv + 1], promoted]))


def _serialize_levels(levels: list[np.ndarray], k: int, n: int,
                      min_item: float, max_item: float,
                      min_k: int | None = None) -> bytes:
    num_levels = len(levels)
    retained = sum(a.size for a in levels)
    cap = _total_capacity(k, num_levels)
    assert retained <= cap, "compaction must fit capacity before serialize"
    offsets = np.zeros(num_levels, np.int64)
    # right-aligned: level0 starts at cap - retained; terminal == cap
    pos = cap - retained
    for lv in range(num_levels):
        offsets[lv] = pos
        pos += levels[lv].size
    out = bytearray()
    # flags 2 = LEVEL_ZERO_SORTED (every level we emit is sorted)
    out += struct.pack("<BBBBHBB", 5, 1, _FAMILY_KLL, 2, k, _M, 0)
    out += struct.pack("<QHBB", n, min_k if min_k is not None else k,
                       num_levels, 0)
    out += offsets.astype("<u4").tobytes()
    out += struct.pack("<dd", min_item, max_item)
    for a in levels:
        out += np.sort(a).astype("<f8").tobytes()
    return bytes(out)


def build_kll_doubles(values: np.ndarray, k: int = 200) -> bytes:
    """Build a serialized KllDoublesSketch from raw values with the
    deterministic compactor (write side of a KLL migration: the blob
    heapifies in datasketches-java).  k must be in the library's
    accepted range [8, 65535]."""
    if not 8 <= k <= 65535:
        raise ValueError(f"KLL k {k} outside [8, 65535]")
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return struct.pack("<BBBBHBB", 2, 1, _FAMILY_KLL, _F_EMPTY, k, _M, 0)
    if v.size == 1:
        return struct.pack("<BBBBHBB", 2, 2, _FAMILY_KLL, _F_SINGLE,
                           k, _M, 0) + struct.pack("<d", float(v[0]))
    levels = _compact_levels([v.copy()], k)
    return _serialize_levels(levels, k, int(v.size),
                             float(v.min()), float(v.max()))


def merge_kll_blobs(blobs) -> bytes:
    """Deterministically merge serialized KLL sketches into one valid
    serialized sketch (k = min of inputs, the library's merge rule for
    accuracy bookkeeping).  KLL weights are exact powers of two, so
    every parsed (item, weight) pair maps back to level log2(weight);
    stacking per-level and re-compacting with the deterministic rule
    yields loadable wire state — the PERCENTILERAWKLL shape."""
    parsed = [parse_kll_doubles(bytes(b)) for b in blobs if b is not None]
    parsed = [p for p in parsed if p.n > 0]
    if not parsed:
        raise ValueError("KLL merge: no non-empty sketches")
    k = min(p.k for p in parsed)
    n = sum(p.n for p in parsed)
    if n == 1:
        only = next(p for p in parsed if p.n == 1)
        return build_kll_doubles(only.items, k)
    levels: list[np.ndarray] = []
    for p in parsed:
        lv_idx = np.log2(p.weights.astype(np.float64)).astype(np.int64)
        for lv in range(int(lv_idx.max()) + 1):
            while len(levels) <= lv:
                levels.append(np.empty(0))
            sel = p.items[lv_idx == lv]
            if sel.size:
                levels[lv] = np.concatenate([levels[lv], sel])
    levels = _compact_levels(levels, k)
    return _serialize_levels(
        levels, k, n,
        float(min(p.min_item for p in parsed)),
        float(max(p.max_item for p in parsed)),
        min_k=k,
    )


PCT_UDF = "pinot_kll_pct"
RAW_UDF = "pinot_kll_raw"
BUILD_UDF = "pinot_kll_build"


def register_kll_udfs(spark) -> None:
    """``pinot_kll_pct(blob, pct)`` grouped-agg: merge the group's KLL
    blobs in weighted-sample space and return the percentile (0-100) —
    the PERCENTILEKLL query shape over migrated BYTES columns."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pinot_kll_pct(blobs: pd.Series, pct: pd.Series) -> float:
        from apache_pinot_spark.functions import kll_wire as _k

        present = [
            b for b in blobs.dropna()
            if _k.parse_kll_doubles(bytes(b)).n > 0
        ]
        if not present:
            return None  # all-NULL/empty group → NULL, not a failed job
        return _k.kll_quantile(present, float(pct.iloc[0]) / 100.0)

    @pandas_udf("binary")
    def pinot_kll_raw(blobs: pd.Series) -> bytes:
        from apache_pinot_spark.functions import kll_wire as _k

        # single parse pass: merge_kll_blobs drops empty sketches itself
        # and raises only when NOTHING is non-empty — map that case to
        # NULL (all-NULL/empty group must not fail the job)
        present = [b for b in blobs.dropna()]
        try:
            return _k.merge_kll_blobs(present)
        except ValueError as e:
            if "no non-empty" in str(e):
                return None
            raise

    @pandas_udf("binary")
    def pinot_kll_build(values: pd.Series, kk: pd.Series) -> bytes:
        from apache_pinot_spark.functions import kll_wire as _k

        v = pd.to_numeric(values.dropna()).to_numpy(dtype="float64")
        return _k.build_kll_doubles(v, int(kk.iloc[0]))

    spark.udf.register(PCT_UDF, pinot_kll_pct)
    spark.udf.register(RAW_UDF, pinot_kll_raw)
    spark.udf.register(BUILD_UDF, pinot_kll_build)
