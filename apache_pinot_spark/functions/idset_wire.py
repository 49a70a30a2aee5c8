"""Pinot IdSet wire interop (the ID_SET / IN_ID_SET carrier format).

The public engine's ID_SET(col) returns a Base64 string whose payload
is a typed IdSet (public source tree:
pinot-core/src/main/java/org/apache/pinot/core/query/utils/idset/):

    byte 0  type id: 0 = EMPTY, 1 = ROARING_BITMAP (INT columns),
            2 = ROARING_64_NAVIGABLE_MAP (LONG columns),
            3 = BLOOM_FILTER (the bounded-size fallback / non-int types)
    then    the underlying structure's own serialization.

Type 1 payload is the portable 32-bit RoaringBitmap serialization —
exactly functions/bitmap_wire.py (byte-golden vs RoaringBitmap-1.3.0).
Type 2 is Roaring64NavigableMap.serialize(): 1 boolean byte
(signedLongs ordering), an int32 BIG-endian bucket count, then per
bucket an int32 BIG-endian high-32 key followed by that bucket's
portable 32-bit RoaringBitmap — layout probed and byte-validated
against the same jar (tests/test_idset_wire.py).  Type 3 (Guava bloom
filter) is approximate-membership state: documented OUT here — this
engine's IN_ID_SET is exact, and a bloom IdSet cannot be made exact, so
it raises with that explanation rather than silently approximating.

Signedness: Java ints/longs are two's complement; an INT idset stores
the unsigned 32-bit wrap of the signed value (RoaringBitmap.add(int)),
and values read back convert to signed for comparison with column
values.  The engine builds type 1 when every value fits in int32
(Pinot's INT-column case), else type 2 — both parse back identically.

Non-integer columns keep the engine-local JSON layout (sorted distinct
strings, JSON-escaped, base64) that earlier rounds shipped; IN_ID_SET
auto-detects which carrier it was handed (a JSON payload starts with
'[' = 0x5B, never a valid type id).
"""

from __future__ import annotations

import base64
import struct

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint inference needs 'pd.*'

from apache_pinot_spark.functions import bitmap_wire as _bw

TYPE_EMPTY = 0
TYPE_ROARING = 1
TYPE_ROARING64 = 2
TYPE_BLOOM = 3

_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1


def _to_signed32(u: np.ndarray) -> np.ndarray:
    return u.astype(np.uint32).astype(np.int32).astype(np.int64)


def _to_signed64(u: np.ndarray) -> np.ndarray:
    return u.astype(np.uint64).astype(np.int64)


def parse_roaring64(blob: bytes) -> np.ndarray:
    """Roaring64NavigableMap.serialize() payload -> signed int64 values."""
    if len(blob) < 5:
        raise ValueError("roaring64 blob too short")
    # byte 0: signedLongs ordering flag — irrelevant to the SET of values
    (count,) = struct.unpack_from(">i", blob, 1)
    if count < 0:
        raise ValueError(f"roaring64 blob: negative bucket count {count}")
    pos = 5
    parts = []
    for _ in range(count):
        if len(blob) < pos + 4:
            raise ValueError("roaring64 blob truncated in bucket key")
        (high,) = struct.unpack_from(">I", blob, pos)
        pos += 4
        bm = _bw.deserialize(blob[pos:])
        pos += _roaring_serialized_length(blob, pos)
        lows = bm.to_values().astype(np.uint64)
        parts.append((np.uint64(high) << np.uint64(32)) | lows)
    if len(blob) != pos:
        raise ValueError("roaring64 blob: trailing bytes after last bucket")
    if not parts:
        return np.zeros(0, np.int64)
    return _to_signed64(np.concatenate(parts))


def _roaring_serialized_length(blob: bytes, pos: int) -> int:
    """Byte length of the portable roaring32 blob starting at pos."""
    (cookie,) = struct.unpack_from("<I", blob, pos)
    if (cookie & 0xFFFF) == _bw.SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        header = 4 + (size + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(blob, np.uint8, (size + 7) // 8, pos + 4),
            bitorder="little",
        )[:size].astype(bool)
        has_offsets = size >= _bw.NO_OFFSET_THRESHOLD
    elif cookie == _bw.SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        header = 8
        run_flags = np.zeros(size, dtype=bool)
        has_offsets = True
    else:
        raise ValueError("not a roaring bitmap inside roaring64 stream")
    desc = np.frombuffer(blob, "<u2", 2 * size, pos + header)
    cards = desc[1::2].astype(np.int64) + 1
    length = header + 4 * size + (4 * size if has_offsets else 0)
    for i in range(size):
        if run_flags[i]:
            (nruns,) = struct.unpack_from("<H", blob, pos + length)
            length += 2 + 4 * nruns
        elif cards[i] > 4096:
            length += 8192
        else:
            length += 2 * int(cards[i])
    return length


def serialize_roaring64(values: np.ndarray) -> bytes:
    """Signed int64 values -> Roaring64NavigableMap.serialize() bytes,
    byte-identical to the Java library's default (unsigned-ordered)
    form."""
    u = np.unique(np.asarray(values, np.int64).astype(np.uint64))
    highs = (u >> np.uint64(32)).astype(np.uint32)
    lows = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = bytearray(b"\x00")  # signedLongs = false (the default ordering)
    uniq_highs, counts = np.unique(highs, return_counts=True)
    out += struct.pack(">i", uniq_highs.size)
    start = 0
    order = np.argsort(highs, kind="stable")
    lows_sorted = lows[order]
    for h, c in zip(uniq_highs, counts):
        out += struct.pack(">I", int(h))
        bucket = _bw.RoaringBitmap32.from_values(
            lows_sorted[start : start + c].astype(np.int64)
        )
        out += _bw.serialize(bucket, run_optimize=False)
        start += c
    return bytes(out)


def parse_idset(blob: bytes) -> np.ndarray:
    """Typed IdSet payload -> signed int64 values (types 0/1/2)."""
    if not blob:
        raise ValueError("empty IdSet payload")
    t = blob[0]
    if t == TYPE_EMPTY:
        if len(blob) != 1:
            raise ValueError("EMPTY IdSet with trailing bytes")
        return np.zeros(0, np.int64)
    if t == TYPE_ROARING:
        return _to_signed32(_bw.deserialize(blob[1:]).to_values())
    if t == TYPE_ROARING64:
        return parse_roaring64(blob[1:])
    if t == TYPE_BLOOM:
        raise ValueError(
            "BLOOM_FILTER IdSet: approximate-membership state cannot be "
            "evaluated exactly — regenerate the IdSet below the bloom "
            "size threshold, or filter with IN_SUBQUERY instead"
        )
    raise ValueError(f"unknown IdSet type {t}")


def serialize_idset(values: np.ndarray) -> bytes:
    """Signed int values -> the smallest exact Pinot IdSet carrier:
    EMPTY / ROARING_BITMAP (all fit int32) / ROARING_64_NAVIGABLE_MAP."""
    v = np.unique(np.asarray(values, np.int64))
    if v.size == 0:
        return bytes([TYPE_EMPTY])
    if v.min() >= _I32_MIN and v.max() <= _I32_MAX:
        u = v.astype(np.int32).astype(np.uint32).astype(np.int64)
        return bytes([TYPE_ROARING]) + _bw.serialize(
            _bw.RoaringBitmap32.from_values(u)
        )
    return bytes([TYPE_ROARING64]) + serialize_roaring64(v)


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------
BUILD_UDF = "pinot_idset_build"


def register_idset_udfs(spark) -> None:
    """ID_SET's grouped-agg builder: integer COLUMNS -> the Pinot wire
    carrier (base64), other types -> the engine-local JSON layout
    (sorted distinct strings) that IN_ID_SET also accepts.

    The dispatch key is the SQL-side typeof() string (second argument,
    emitted by the handler), NOT the pandas dtype: Arrow ships an int64
    column containing NULLs to pandas as float64, so dtype-sniffing
    would silently flip an integer column to the JSON carrier (with
    '1.0'-formatted values that match nothing) whenever a null happened
    to be present."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def pinot_idset_build(values: pd.Series, sqltype: pd.Series) -> str:
        import base64 as _b64
        import json as _json

        from apache_pinot_spark.functions import idset_wire as _iw

        present = values.dropna()
        t = str(sqltype.iloc[0]).lower() if len(sqltype) else ""
        if t in ("tinyint", "smallint", "int", "bigint"):
            ints = present.to_numpy(dtype="int64")
            return _b64.b64encode(_iw.serialize_idset(ints)).decode()
        strs = sorted(set(str(x) for x in present))
        return _b64.b64encode(
            _json.dumps(strs, separators=(",", ":")).encode()
        ).decode()

    spark.udf.register(BUILD_UDF, pinot_idset_build)
