"""Clearspring (stream-lib) HyperLogLogPlus BYTES wire interop — the
serialized format behind the reference's DISTINCTCOUNTHLLPLUS sketch
columns (stream-lib HyperLogLogPlus.getBytes()), completing the
sketch-column migration surface next to functions/hll_clearspring.py.

Everything derives from the public stream-lib implementation and the
HLL++ paper (Heule, Nunkesser, Hall: "HyperLogLog in Practice",
EDBT'13); the empirical bias-correction arrays in
functions/hllplus_tables.py are the data Google published with the
paper, transcribed from the public stream-lib constants. All of it is
golden-tested against the stream-2.9.8 jar on Spark's classpath
(tests/test_hllplus_wire.py): byte-identical serialization across the
sparse AND normal regimes (including the sparse→normal conversion
threshold), exact cardinality parity, and merges both ways.

Wire layout (little observed facts, validated byte-level):

    int32 BE -2 (version marker) | varint p | varint sp | varint format
    format 0 (NORMAL): varint register-byte-count, then the same 5-bit
        six-per-word RegisterSet words as plain HLL (hll_clearspring),
        32-bit BE each.
    format 1 (SPARSE): varint count, then the sorted encoded sparse
        ints DELTA-encoded as unsigned varints.

Sparse encoding of a 64-bit value hash (murmur2-64A, seed 0xe17a1465;
non-String/non-byte[] values hash via their Java toString rendering —
the stream-lib hash64(Object) dispatch):

    idx_sp = hash >>> (64 - sp)                      (top sp bits)
    if the low (sp - p) bits of idx_sp are all zero:
        k = (idx_sp << 7) | ((63 - rho_p) << 1) | 1
        where rho_p = nlz64(hash << p) + 1 (the NORMAL-precision rho —
        it cannot be recovered from idx_sp alone in this case)
    else:
        k = idx_sp << 1                              (rho recoverable)

Normal registers: idx = hash >>> (64 - p),
rho = nlz64((hash << p) | (1 << (p - 1))) + 1, register-max, clamped at
31 (5-bit registers). Known divergence, documented rather than
reproduced: stream-lib's RegisterSet stores rho UNMASKED, so a rho > 31
(expected once per ~2^31 distinct values) bleeds a bit into the
adjacent register in the reference — a reference-side defect this
implementation does not emulate; at such inputs bytes can differ and
estimates differ infinitesimally.

Cardinality: sparse → linear counting over m_sp = 2^sp; normal → the
HLL++ pipeline (raw estimate, k-nearest-neighbor bias correction for
E ≤ 5m via the published tables, linear counting below the published
per-p threshold).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint inference needs 'pd.*'

from apache_pinot_spark.functions.hllplus_tables import (
    BIAS_DATA,
    RAW_ESTIMATE_DATA,
    THRESHOLD_DATA,
)

_M64 = (1 << 64) - 1
_MULT64 = 0xC6A4A7935BD1E995
_SEED64 = 0xE17A1465


# --------------------------------------------------------------------------
# MurmurHash 64A (stream-lib hash64) — scalar + vectorized
# --------------------------------------------------------------------------
def murmur2_64(data: bytes, seed: int = _SEED64) -> int:
    m, r = _MULT64, 47
    h = (seed ^ (len(data) * m)) & _M64
    n8 = len(data) // 8
    for i in range(n8):
        k = int.from_bytes(data[8 * i : 8 * i + 8], "little")
        k = (k * m) & _M64
        k ^= k >> r
        k = (k * m) & _M64
        h ^= k
        h = (h * m) & _M64
    tail = data[n8 * 8 :]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _M64
    h ^= h >> r
    h = (h * m) & _M64
    h ^= h >> r
    return h


def _murmur64_matrix(mat: np.ndarray, seed: int = _SEED64) -> np.ndarray:
    """Vectorized murmur2-64A over n equal-length byte rows."""
    n, length = mat.shape
    m = np.uint64(_MULT64)
    r = np.uint64(47)
    with np.errstate(over="ignore"):
        h = np.full(n, np.uint64((seed ^ (length * _MULT64)) & _M64),
                    dtype=np.uint64)
        for i in range(length // 8):
            k = (
                np.ascontiguousarray(mat[:, 8 * i : 8 * i + 8])
                .view("<u8").ravel().astype(np.uint64)
            )
            k = k * m
            k ^= k >> r
            k = k * m
            h ^= k
            h = h * m
        rem = length % 8
        if rem:
            tail = np.zeros(n, dtype=np.uint64)
            for j in range(rem):
                tail |= mat[:, length - rem + j].astype(np.uint64) << np.uint64(
                    8 * j
                )
            h ^= tail
            h = h * m
        h ^= h >> r
        h = h * m
        h ^= h >> r
    return h


def hash64_bytes_batch(values: list[bytes]) -> np.ndarray:
    from apache_pinot_spark.functions.theta_wire import batch_hash_by_length

    return batch_hash_by_length(
        values, _murmur64_matrix, empty_value=murmur2_64(b"")
    )


def java_double_str(d: float) -> str:
    """Java Double.toString rendering (the hash64(Object) dispatch for
    Double values goes through toString): shortest round-trip digits,
    plain form for 1e-3 ≤ |d| < 1e7 with a mandatory fraction digit,
    otherwise d.dddE±x scientific.

    This is the JDK 19+ (Ryū) convention. Pre-19 JVMs use the legacy
    FloatingDecimal algorithm, which occasionally emits MORE digits
    than the shortest form (the long-standing JDK-4511638 quirk, ~3 %
    of doubles) — DOUBLE-valued offers hashed on such a JVM can land in
    different registers than ours. Documented divergence, affecting
    only sketches BUILT here from float columns and compared against
    legacy-JVM builds; int/string/bytes offers render identically on
    every JVM, and the read/merge/estimate paths never re-hash."""
    if math.isnan(d):
        return "NaN"
    if math.isinf(d):
        return "Infinity" if d > 0 else "-Infinity"
    if d == 0.0:
        return "-0.0" if math.copysign(1.0, d) < 0 else "0.0"
    from decimal import Decimal

    sign, digits, exp = Decimal(repr(float(d))).as_tuple()
    ds = "".join(map(str, digits)).rstrip("0") or "0"
    mag = exp + len(digits) - 1  # floor(log10(|d|))
    s = "-" if sign else ""
    if -3 <= mag < 7:
        if mag >= 0:
            ip = ds[: mag + 1].ljust(mag + 1, "0")
            fp = ds[mag + 1 :] or "0"
            return f"{s}{ip}.{fp}"
        return f"{s}0.{'0' * (-mag - 1)}{ds}"
    fp = ds[1:] or "0"
    return f"{s}{ds[0]}.{fp}E{mag}"


def hash_series(values) -> np.ndarray:
    """stream-lib hash64(Object): String → UTF-8 bytes, byte[] raw,
    everything else via its Java toString rendering."""
    kind = values.dtype.kind
    if kind in "iu":
        encoded = [str(int(x)).encode() for x in values.to_numpy()]
    elif kind == "f":
        encoded = [java_double_str(float(x)).encode() for x in values.to_numpy()]
    elif kind == "b":
        encoded = [b"true" if x else b"false" for x in values.to_numpy()]
    else:
        encoded = []
        for x in values:
            if isinstance(x, bytes):
                encoded.append(x)
            elif isinstance(x, str):
                encoded.append(x.encode("utf-8"))
            elif isinstance(x, (bool, np.bool_)):
                encoded.append(b"true" if x else b"false")
            elif isinstance(x, (int, np.integer)):
                encoded.append(str(int(x)).encode())
            elif isinstance(x, (float, np.floating)):
                encoded.append(java_double_str(float(x)).encode())
            else:
                encoded.append(str(x).encode("utf-8"))
    return hash64_bytes_batch(encoded)


# --------------------------------------------------------------------------
# varints (protobuf-style unsigned LEB128 — stream-lib Varint)
# --------------------------------------------------------------------------
def _write_varint(out: bytearray, v: int) -> None:
    v &= 0xFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if pos >= len(buf):
            raise ValueError("HLL++ blob truncated in varint")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 35:
            raise ValueError("HLL++ blob invalid: varint too long")


# --------------------------------------------------------------------------
# The sketch
# --------------------------------------------------------------------------
def _nlz64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit leading-zero count (exact via two 32-bit
    float64 log2 halves — each half < 2^32 is exactly representable)."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl_hi = np.where(hi > 0, np.floor(np.log2(np.maximum(hi, 1))) + 1, 0)
    bl_lo = np.where(lo > 0, np.floor(np.log2(np.maximum(lo, 1))) + 1, 0)
    bl = np.where(hi > 0, bl_hi + 32, bl_lo)
    return (64 - bl).astype(np.int64)


class HyperLogLogPlusSketch:
    """p/sp precisions, SPARSE (sorted encoded ints) or NORMAL (5-bit
    registers) representation — mirroring stream-lib state exactly so
    serialization is byte-identical."""

    __slots__ = ("p", "sp", "sparse", "sparse_map", "registers")

    def __init__(self, p: int = 14, sp: int = 25):
        if not 4 <= p <= 28 or (sp != 0 and not p <= sp <= 32):
            raise ValueError(f"HLL++ precisions out of range: p={p} sp={sp}")
        self.p = p
        self.sp = sp
        self.sparse = sp != 0
        # idx → encoded k; ONE entry per sparse index (the reference
        # dedups same-idx flag entries keeping the max-rho = smallest-k
        # encoding — pinned empirically at p=20/sp=25 where same-idx
        # collisions actually occur)
        self.sparse_map: dict[int, int] = {}
        self.registers = (
            None if self.sparse else np.zeros(1 << p, dtype=np.uint8)
        )

    @property
    def m(self) -> int:
        return 1 << self.p

    # the stream-lib conversion threshold: sparseSetThreshold
    @property
    def _sparse_threshold(self) -> int:
        return int(0.75 * self.m)

    # -- offering ----------------------------------------------------------
    def offer_hashed(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if self.sparse:
            for k in self._encode_sparse(h):
                k = int(k)
                idx = self._idx_of(k)
                cur = self.sparse_map.get(idx)
                if cur is None or k < cur:
                    self.sparse_map[idx] = k
            if len(self.sparse_map) <= self._sparse_threshold:
                return
            self._to_normal()
            return  # the sparse entries already carry these hashes
        self._normal_update(h)

    def _encode_sparse(self, h: np.ndarray) -> np.ndarray:
        """Encoded ints serialize sorted by their DECODED sparse
        index (flag entries interleave at their idx position, so raw-k
        order would misplace them); deltas wrap mod 2^32 — both part of
        the wire contract, pinned against stream-lib byte streams."""
        sp, p = self.sp, self.p
        idx_sp = (h >> np.uint64(64 - sp)).astype(np.int64)
        low_zero = (idx_sp & ((1 << (sp - p)) - 1)) == 0
        shifted = (h << np.uint64(p)) & np.uint64(_M64)
        rho_p = _nlz64(shifted) + 1
        with_rho = (idx_sp << 7) | ((63 - rho_p) << 1) | 1
        plain = idx_sp << 1
        return np.where(low_zero, with_rho, plain) & 0xFFFFFFFF

    @staticmethod
    def _idx_of(k: int) -> int:
        k &= 0xFFFFFFFF
        return (k >> 7) if (k & 1) else (k >> 1)

    def _sorted_sparse(self) -> list[int]:
        return [self.sparse_map[i] for i in sorted(self.sparse_map)]

    def _sparse_decode(self, k: int) -> tuple[int, int]:
        """encoded sparse int → (normal idx, normal rho)."""
        sp, p = self.sp, self.p
        k &= 0xFFFFFFFF  # bit extraction happens on the unsigned form
        if k & 1:
            idx_sp = k >> 7
            rho = 63 - ((k >> 1) & 0x3F)
        else:
            idx_sp = k >> 1
            low = idx_sp & ((1 << (sp - p)) - 1)
            rho = (sp - p) - low.bit_length() + 1
        return idx_sp >> (sp - p), rho

    def _to_normal(self) -> None:
        regs = np.zeros(self.m, dtype=np.uint8)
        for k in self.sparse_map.values():
            idx, rho = self._sparse_decode(k)
            if rho > regs[idx]:
                regs[idx] = min(rho, 31)
        self.registers = regs
        self.sparse = False
        self.sparse_map = {}

    def _normal_update(self, h: np.ndarray) -> None:
        p = self.p
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        shifted = ((h << np.uint64(p)) | np.uint64(1 << (p - 1))) & np.uint64(_M64)
        rho = np.minimum(_nlz64(shifted) + 1, 31).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def offer_values(self, values) -> None:
        v = values.dropna()
        if not v.empty:
            self.offer_hashed(hash_series(v))

    # -- cardinality -------------------------------------------------------
    def cardinality(self) -> int:
        if self.sparse:
            sm = 1 << self.sp
            zeros = sm - len(self.sparse_map)
            return int(round(sm * math.log(sm / zeros)))
        m = self.m
        if self.p == 4:
            alpha_mm = 0.673 * m * m
        elif self.p == 5:
            alpha_mm = 0.697 * m * m
        elif self.p == 6:
            alpha_mm = 0.709 * m * m
        else:
            alpha_mm = (0.7213 / (1 + 1.079 / m)) * m * m
        reg = self.registers.astype(np.float64)
        est = alpha_mm / np.power(2.0, -reg).sum()
        est_prime = est - self._bias(est) if est <= 5 * m else est
        zeros = int((self.registers == 0).sum())
        h = m * math.log(m / zeros) if zeros > 0 else est_prime
        # the published tables stop at p=18; above that the reference
        # takes bias 0 and decides H-vs-est' on the raw-estimate range
        if self.p - 4 < len(THRESHOLD_DATA):
            result = h if h <= THRESHOLD_DATA[self.p - 4] else est_prime
        else:
            result = h if est <= 5 * m else est_prime
        return int(round(result))

    def _bias(self, est: float) -> float:
        """k-nearest-neighbor (k=6) interpolation in the published
        raw-estimate → bias tables (the stream-lib estimateBias)."""
        if self.p - 4 >= len(RAW_ESTIMATE_DATA):
            return 0.0  # reference behavior above the published range
        raw = RAW_ESTIMATE_DATA[self.p - 4]
        bias = BIAS_DATA[self.p - 4]
        dists = [(r - est) ** 2 for r in raw]
        order = sorted(range(len(raw)), key=lambda i: dists[i])[:6]
        return sum(bias[i] for i in order) / len(order)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "HyperLogLogPlusSketch") -> "HyperLogLogPlusSketch":
        if (self.p, self.sp) != (other.p, other.sp):
            raise ValueError(
                f"cannot merge HLL++ of different precisions "
                f"(p/sp {self.p}/{self.sp} vs {other.p}/{other.sp})"
            )
        out = HyperLogLogPlusSketch(self.p, self.sp)
        if self.sparse and other.sparse:
            merged = dict(self.sparse_map)
            for idx, k in other.sparse_map.items():
                cur = merged.get(idx)
                if cur is None or k < cur:
                    merged[idx] = k
            out.sparse_map = merged
            if len(merged) > out._sparse_threshold:
                out._to_normal()
            return out
        out.sparse = False
        out.sparse_map = {}
        out.registers = np.zeros(out.m, dtype=np.uint8)
        for side in (self, other):
            if side.sparse:
                for k in side.sparse_map.values():
                    idx, rho = side._sparse_decode(k)
                    if rho > out.registers[idx]:
                        out.registers[idx] = min(rho, 31)
            else:
                np.maximum(out.registers, side.registers, out=out.registers)
        return out

    # -- wire --------------------------------------------------------------
    def serialize(self) -> bytes:
        out = bytearray(struct.pack(">i", -2))  # VERSION marker
        _write_varint(out, self.p)
        _write_varint(out, self.sp)
        if self.sparse:
            _write_varint(out, 1)
            _write_varint(out, len(self.sparse_map))
            prev = 0
            for k in self._sorted_sparse():  # idx order; deltas wrap mod 2^32
                _write_varint(out, (k - prev) & 0xFFFFFFFF)
                prev = k
            return bytes(out)
        _write_varint(out, 0)
        nwords = -(-self.m // 6)
        words = np.zeros(nwords, dtype=np.uint64)
        for lane in range(6):
            regs = self.registers[lane::6].astype(np.uint64)
            words[: regs.size] |= regs << np.uint64(5 * lane)
        body = words.astype(">u4").tobytes()
        _write_varint(out, len(body))
        return bytes(out) + body

    @classmethod
    def deserialize(cls, blob: bytes) -> "HyperLogLogPlusSketch":
        blob = bytes(blob)
        if len(blob) < 5:
            raise ValueError("HLL++ blob too short for a preamble")
        if struct.unpack_from(">i", blob, 0)[0] != -2:
            raise ValueError("not an HLL++ blob (missing -2 version marker)")
        pos = 4
        p, pos = _read_varint(blob, pos)
        sp, pos = _read_varint(blob, pos)
        fmt, pos = _read_varint(blob, pos)
        out = cls(p, sp)
        if fmt == 1:
            if sp == 0 or sp < p:
                raise ValueError(
                    f"HLL++ blob invalid: SPARSE format with sp={sp}, p={p}"
                )
            n, pos = _read_varint(blob, pos)
            if n < 0 or n > (1 << min(sp, 26)):
                raise ValueError(f"HLL++ blob invalid: sparse count {n}")
            cur = 0
            smap: dict[int, int] = {}
            for _ in range(n):
                d, pos = _read_varint(blob, pos)
                cur = (cur + d) & 0xFFFFFFFF
                idx = cls._idx_of(cur)
                prev = smap.get(idx)
                if prev is None or cur < prev:
                    smap[idx] = cur
            out.sparse = True
            out.sparse_map = smap
            return out
        if fmt != 0:
            raise ValueError(f"HLL++ blob invalid: format {fmt}")
        size, pos = _read_varint(blob, pos)
        m = 1 << p
        nwords = -(-m // 6)
        if size != nwords * 4 or len(blob) < pos + size:
            raise ValueError(
                f"HLL++ blob invalid: register bytes {size} for p={p}"
            )
        words = np.frombuffer(blob, dtype=">u4", count=nwords, offset=pos).astype(
            np.uint64
        )
        regs = np.zeros(m, dtype=np.uint8)
        for lane in range(6):
            lane_regs = ((words >> np.uint64(5 * lane)) & np.uint64(31)).astype(
                np.uint8
            )
            regs[lane::6] = lane_regs[: regs[lane::6].size]
        out.sparse = False
        out.sparse_map = {}
        out.registers = regs
        return out


def merge_blobs(blobs) -> HyperLogLogPlusSketch:
    out: HyperLogLogPlusSketch | None = None
    for b in blobs:
        if b is None:
            continue
        s = HyperLogLogPlusSketch.deserialize(bytes(b))
        out = s if out is None else out.merge(s)
    if out is None:
        raise ValueError("no HLL++ blobs to merge")
    return out


MERGE_UDF = "pinot_hllplus_merge"
ESTIMATE_UDF = "pinot_hllplus_estimate"
BUILD_UDF = "pinot_hllplus_build"


def register_hllplus_udfs(spark) -> None:
    """``pinot_hllplus_merge(blob)`` grouped-agg merge → merged wire
    blob (NULL for all-NULL groups); ``pinot_hllplus_estimate(blob)``
    scalar cardinality — the DISTINCTCOUNTHLLPLUS query shape over
    migrated BYTES columns."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pinot_hllplus_merge(blobs: pd.Series) -> bytes:
        from apache_pinot_spark.functions import hllplus_wire as _w

        present = blobs.dropna()
        if present.empty:
            return None
        return _w.merge_blobs(present).serialize()

    @pandas_udf("long")
    def pinot_hllplus_estimate(blobs: pd.Series) -> pd.Series:
        from apache_pinot_spark.functions import hllplus_wire as _w

        return blobs.map(
            lambda b: None if b is None
            else _w.HyperLogLogPlusSketch.deserialize(bytes(b)).cardinality()
        )

    @pandas_udf("binary")
    def pinot_hllplus_build(values: pd.Series) -> bytes:
        # RAW form over a raw column: build a WIRE sketch from the
        # group's values (default p=14/sp=25, the stream-lib default) —
        # the emitted blob loads in the reference client libraries
        from apache_pinot_spark.functions import hllplus_wire as _w

        sk = _w.HyperLogLogPlusSketch(14, 25)
        sk.offer_values(values)
        return sk.serialize()

    spark.udf.register(MERGE_UDF, pinot_hllplus_merge)
    spark.udf.register(ESTIMATE_UDF, pinot_hllplus_estimate)
    spark.udf.register(BUILD_UDF, pinot_hllplus_build)
