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
Re-serializing a merged KLL sketch is deliberately OUT: KLL compaction
is randomized by design (the library's own merges are
run-to-run nondeterministic), which would break this engine's
determinism/oracle contract — documented, raised explicitly by
PERCENTILERAWKLL.

Building sketches from raw values is also out (same randomness
argument); raw columns answer through the engine's deterministic
percentile paths instead.
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


PCT_UDF = "pinot_kll_pct"


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

    spark.udf.register(PCT_UDF, pinot_kll_pct)
