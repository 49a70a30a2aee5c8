"""RoaringBitmap (org.roaringbitmap) BYTES wire interop.

Pinot's ``DISTINCTCOUNTBITMAP`` over a BYTES column treats every cell as
a SERIALIZED 32-bit RoaringBitmap, ORs them together, and returns the
union's cardinality (DistinctCountBitmapAggregationFunction — the
reference's schema docs name BYTES metric columns for exactly this
migration shape, configuration-reference/schema.md:48).  This module
makes those migrated columns load here: parse, union, cardinality, and
re-serialization that is byte-identical to the Java library so blobs
built HERE load in any RoaringBitmap implementation.

Everything derives from the PUBLIC RoaringFormatSpec
(github.com/RoaringBitmap/RoaringFormatSpec — the interoperable
serialization implemented by the Java, C, Go and Rust libraries), and
is golden-tested byte-for-byte against the real ``RoaringBitmap-1.3.0``
jar that ships on Spark's classpath:

    cookie (little-endian, 4 bytes):
      12346 (SERIAL_COOKIE_NO_RUNCONTAINER): followed by int32 container
            count; NO run containers anywhere in the stream.
      12347 (SERIAL_COOKIE, low 16 bits): container count - 1 in the
            HIGH 16 bits; followed by ceil(size/8) bytes — a little-
            endian bitset flagging which containers are run-encoded.
    descriptive header: per container, uint16 key (value >> 16) then
            uint16 cardinality-1.
    offset header: int32 byte offset (from stream start) of each
            container's payload.  Present always for cookie 12346, and
            for cookie 12347 only when size >= NO_OFFSET_THRESHOLD (4).
    container payloads, ascending key order:
      array  (card <= 4096, not run): cardinality sorted uint16 values
      bitmap (card >  4096, not run): 1024 uint64 words (8 KiB), LE,
             bit i of word w  <=>  value (w<<6)+i present
      run:   uint16 run count, then per run (uint16 start,
             uint16 length-1) — value range [start, start+length]

In-memory representation here: ``dict[int high16] -> np.uint64[1024]``
dense bitset per container key.  Dense-per-key is the right shape for
the UNION hot path (a grouped aggregate ORs thousands of blobs: OR of
aligned uint64 words vectorizes; array/run containers are expanded once
at parse).  At 65 KiB per touched key the transient state is bounded by
the value universe's high-16 spread, not by row count — the same bound
the Java library's BitmapContainer carries.

``run_optimize()`` reproduces the Java library's container-selection
rule (Container.runOptimize: convert to run encoding iff the run form
is strictly smaller than the current representation's serialized size)
so ``serialize(run_optimize=True)`` is byte-identical to
``RoaringBitmap.runOptimize(); serialize()`` — pinned by the jar tests.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint inference needs 'pd.*'

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4

_WORDS = 1024  # uint64 words per container bitset (2^16 bits)
_ARRAY_MAX = 4096  # max cardinality of an array container

# popcount via byte lookup (numpy 1.26 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _popcount(words: np.ndarray) -> int:
    return int(_POP8[words.view(np.uint8)].sum())


def _bits_to_words(bits: np.ndarray) -> np.ndarray:
    """65536-element uint8 0/1 array -> 1024 uint64 LE words."""
    packed = np.packbits(bits, bitorder="little")
    return np.frombuffer(packed.tobytes(), dtype="<u8").copy()


def _words_to_values(words: np.ndarray) -> np.ndarray:
    """1024 uint64 words -> sorted uint16-range values present."""
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    return np.flatnonzero(bits).astype(np.uint16)


class RoaringBitmap32:
    """Parsed 32-bit roaring bitmap: {high16 key -> uint64[1024] bitset}."""

    __slots__ = ("containers",)

    def __init__(self, containers: dict[int, np.ndarray] | None = None):
        self.containers = containers or {}

    # -- construction ------------------------------------------------------
    @classmethod
    def from_values(cls, values: np.ndarray) -> "RoaringBitmap32":
        v = np.asarray(values)
        if v.size == 0:
            return cls()
        if v.dtype.kind in ("i", "u"):
            vv = v.astype(np.int64)
        else:
            vv = v.astype(np.int64)
        if vv.size and (vv.min() < 0 or vv.max() > 0xFFFFFFFF):
            raise ValueError(
                "RoaringBitmap32 holds uint32 values; got value outside "
                "[0, 2^32) — the 64-bit format is a different wire layout"
            )
        u = np.unique(vv.astype(np.uint32))
        keys = (u >> np.uint32(16)).astype(np.int64)
        lows = (u & np.uint32(0xFFFF)).astype(np.int64)
        out: dict[int, np.ndarray] = {}
        start = 0
        for key, count in zip(*np.unique(keys, return_counts=True)):
            bits = np.zeros(1 << 16, dtype=np.uint8)
            bits[lows[start : start + count]] = 1
            out[int(key)] = _bits_to_words(bits)
            start += count
        return cls(out)

    # -- set algebra -------------------------------------------------------
    def union_inplace(self, other: "RoaringBitmap32") -> "RoaringBitmap32":
        for k, w in other.containers.items():
            mine = self.containers.get(k)
            if mine is None:
                self.containers[k] = w.copy()
            else:
                np.bitwise_or(mine, w, out=mine)
        return self

    def cardinality(self) -> int:
        return sum(_popcount(w) for w in self.containers.values())

    def to_values(self) -> np.ndarray:
        """All values, ascending, as uint32 (test/debug surface)."""
        parts = []
        for k in sorted(self.containers):
            lows = _words_to_values(self.containers[k]).astype(np.uint32)
            parts.append((np.uint32(k) << np.uint32(16)) | lows)
        return np.concatenate(parts) if parts else np.zeros(0, np.uint32)

    def contains(self, value: int) -> bool:
        w = self.containers.get(value >> 16)
        if w is None:
            return False
        low = value & 0xFFFF
        return bool((int(w[low >> 6]) >> (low & 63)) & 1)


def _num_runs(bits: np.ndarray) -> int:
    """Number of runs in a 65536-element 0/1 array (rising edges)."""
    if not bits.any():
        return 0
    d = np.diff(bits.astype(np.int8))
    return int((d == 1).sum()) + int(bits[0])


def _runs_of(bits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths-1) of the runs in a 0/1 array, uint16 pairs."""
    padded = np.concatenate(([0], bits.astype(np.int8), [0]))
    d = np.diff(padded)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)  # exclusive
    return starts.astype(np.uint16), (ends - starts - 1).astype(np.uint16)


def serialize(bm: RoaringBitmap32, run_optimize: bool = False) -> bytes:
    """Portable serialization, byte-identical to the Java library.

    run_optimize=False mirrors plain ``RoaringBitmap.serialize()`` on a
    bitmap that holds no run containers (cookie 12346).  True mirrors
    ``runOptimize(); serialize()``: each container converts to run
    encoding iff that form is strictly smaller (the library's
    Container.runOptimize rule); cookie 12347 iff any container
    converted.
    """
    keys = sorted(bm.containers)
    size = len(keys)
    cards: list[int] = []
    payloads: list[bytes] = []
    is_run: list[bool] = []
    for k in keys:
        words = bm.containers[k]
        card = _popcount(words)
        if card == 0:
            raise ValueError("empty container in serialize (internal)")
        cards.append(card)
        bits = np.unpackbits(words.view(np.uint8), bitorder="little")
        use_run = False
        if run_optimize:
            nruns = _num_runs(bits)
            run_size = 2 + 4 * nruns
            cur_size = 8192 if card > _ARRAY_MAX else 2 * card
            use_run = run_size < cur_size
        is_run.append(use_run)
        if use_run:
            starts, lens = _runs_of(bits)
            payloads.append(
                struct.pack("<H", starts.size)
                + np.column_stack([starts, lens]).astype("<u2").tobytes()
            )
        elif card > _ARRAY_MAX:
            payloads.append(words.astype("<u8").tobytes())
        else:
            payloads.append(_words_to_values(words).astype("<u2").tobytes())

    has_run = any(is_run)
    out = bytearray()
    if has_run:
        out += struct.pack("<I", SERIAL_COOKIE | ((size - 1) << 16))
        flag_bits = np.zeros(size, dtype=np.uint8)
        flag_bits[np.flatnonzero(is_run)] = 1
        out += np.packbits(flag_bits, bitorder="little").tobytes()
    else:
        out += struct.pack("<I", SERIAL_COOKIE_NO_RUN)
        out += struct.pack("<I", size)
    for k, card in zip(keys, cards):
        out += struct.pack("<HH", k, card - 1)
    if (not has_run) or size >= NO_OFFSET_THRESHOLD:
        pos = len(out) + 4 * size
        for p in payloads:
            out += struct.pack("<I", pos)
            pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def deserialize(blob: bytes) -> RoaringBitmap32:
    """Parse a portable-format blob (any container mix) into bitsets."""
    if len(blob) < 4:
        raise ValueError("roaring blob too short for a cookie")
    (cookie,) = struct.unpack_from("<I", blob, 0)
    pos = 4
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        nrun_bytes = (size + 7) // 8
        if len(blob) < pos + nrun_bytes:
            raise ValueError("roaring blob truncated in run-flag bitset")
        run_flags = np.unpackbits(
            np.frombuffer(blob, np.uint8, nrun_bytes, pos), bitorder="little"
        )[:size].astype(bool)
        pos += nrun_bytes
        has_offsets = size >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        if len(blob) < 8:
            raise ValueError("roaring blob truncated in container count")
        (size,) = struct.unpack_from("<I", blob, 4)
        run_flags = np.zeros(size, dtype=bool)
        pos = 8
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap: cookie {cookie & 0xFFFF}")
    if size < 0 or size > (1 << 16):
        raise ValueError(f"roaring blob: invalid container count {size}")
    if len(blob) < pos + 4 * size:
        raise ValueError("roaring blob truncated in descriptive header")
    desc = np.frombuffer(blob, "<u2", 2 * size, pos)
    keys = desc[0::2].astype(np.int64)
    cards = desc[1::2].astype(np.int64) + 1
    pos += 4 * size
    if has_offsets:
        pos += 4 * size  # offsets are redundant for a sequential parse
    containers: dict[int, np.ndarray] = {}
    for i in range(size):
        key, card = int(keys[i]), int(cards[i])
        if run_flags[i]:
            if len(blob) < pos + 2:
                raise ValueError("roaring blob truncated in run count")
            (nruns,) = struct.unpack_from("<H", blob, pos)
            pos += 2
            if len(blob) < pos + 4 * nruns:
                raise ValueError("roaring blob truncated in run payload")
            pairs = np.frombuffer(blob, "<u2", 2 * nruns, pos).astype(np.int64)
            pos += 4 * nruns
            bits = np.zeros(1 << 16, dtype=np.uint8)
            for r in range(nruns):
                start, ln = pairs[2 * r], pairs[2 * r + 1]
                bits[start : start + ln + 1] = 1
            words = _bits_to_words(bits)
        elif card > _ARRAY_MAX:
            if len(blob) < pos + 8192:
                raise ValueError("roaring blob truncated in bitmap payload")
            words = np.frombuffer(blob, "<u8", _WORDS, pos).copy()
            pos += 8192
        else:
            if len(blob) < pos + 2 * card:
                raise ValueError("roaring blob truncated in array payload")
            vals = np.frombuffer(blob, "<u2", card, pos)
            pos += 2 * card
            bits = np.zeros(1 << 16, dtype=np.uint8)
            bits[vals.astype(np.int64)] = 1
            words = _bits_to_words(bits)
        if key in containers:
            raise ValueError(f"roaring blob: duplicate container key {key}")
        containers[int(key)] = words
    return RoaringBitmap32(containers)


def merge_blobs(blobs: Iterable[bytes]) -> RoaringBitmap32:
    acc = RoaringBitmap32()
    for b in blobs:
        if b is None:
            continue
        acc.union_inplace(deserialize(bytes(b)))
    return acc


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------
CARD_UDF = "pinot_bitmap_card"
UNION_UDF = "pinot_bitmap_union"
BUILD_UDF = "pinot_bitmap_build"


def register_bitmap_udfs(spark) -> None:
    """Grouped-agg pandas UDFs over serialized-bitmap BYTES columns.

    Like the theta family these are two-phase-safe: UNION returns a
    wire blob, so partial unions re-merge losslessly; CARD is the
    terminal count.  State per group is the union bitset — bounded by
    the value universe, not the row count.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pinot_bitmap_union(blobs: pd.Series) -> bytes:
        return serialize(merge_blobs(blobs.dropna()))

    @pandas_udf("long")
    def pinot_bitmap_card(blobs: pd.Series) -> int:
        return merge_blobs(blobs.dropna()).cardinality()

    @pandas_udf("binary")
    def pinot_bitmap_build(values: pd.Series) -> bytes:
        v = pd.to_numeric(values.dropna()).to_numpy()
        return serialize(RoaringBitmap32.from_values(v))

    spark.udf.register(UNION_UDF, pinot_bitmap_union)
    spark.udf.register(CARD_UDF, pinot_bitmap_card)
    spark.udf.register(BUILD_UDF, pinot_bitmap_build)


def bitmap_aggregate(df, keys: list[str], value_col: str):
    """Build wire-format RoaringBitmap blobs per group from a raw int
    column (the write side of a bitmap migration: produce columns the
    Java library loads).  Grouped-agg pandas UDF; for very hot keys the
    two-phase union path (partial blobs -> UNION_UDF) applies unchanged
    because the wire format re-merges losslessly."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def build(values: pd.Series) -> bytes:
        v = pd.to_numeric(values.dropna()).to_numpy()
        return serialize(RoaringBitmap32.from_values(v))

    return df.groupBy(*[F.col(k) for k in keys]).agg(
        build(F.col(value_col)).alias("bitmap")
    )
