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
filter) is approximate-membership state: IN_ID_SET evaluates it with
the PUBLIC approximate semantics (false positives at the filter's
configured rate, never false negatives) via the Guava-validated reader
below — parse_idset still refuses to ENUMERATE it (there is no value
set to enumerate) and points at bloom_might_contain.

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
            "BLOOM_FILTER IdSet holds approximate-membership state, not "
            "an enumerable value set — evaluate it with "
            "bloom_might_contain() (the public approximate IN_ID_SET "
            "semantics, false positives possible), or regenerate the "
            "IdSet below the bloom size threshold for exact filtering"
        )
    raise ValueError(f"unknown IdSet type {t}")


# --------------------------------------------------------------------------
# Guava BloomFilter (IdSet type 3) — READ side.
#
# Layout (com.google.common.hash.BloomFilter.writeTo, stable across
# Guava versions and validated against the guava jar on Spark's
# classpath in tests/test_idset_wire.py):
#     byte 0      strategy ordinal (1 = MURMUR128_MITZ_64, the default)
#     byte 1      numHashFunctions (unsigned)
#     int32 BE    number of int64 words
#     then        words, int64 BIG-endian (DataOutputStream)
# Membership (MURMUR128_MITZ_64): hash = murmur3_x64_128(funnel bytes,
# seed 0); h1/h2 = the two LITTLE-endian longs of the 16-byte digest;
# bit index i in 0..k-1 tests ((h1 + i*h2) & Long.MAX) % bitSize.
# The long funnel renders the value as 8 little-endian bytes
# (Guava Hasher.putLong) — the convention an integer IdSet uses.
# --------------------------------------------------------------------------
def parse_bloom(blob: bytes):
    """(num_hash_functions, bits words as uint64 ascending) of a type-3
    payload (WITHOUT the leading type byte)."""
    if len(blob) < 6:
        raise ValueError("bloom payload too short")
    strategy, k = blob[0], blob[1]
    if strategy != 1:
        raise ValueError(
            f"bloom strategy ordinal {strategy} unsupported (expected 1 = "
            "MURMUR128_MITZ_64, the library default)"
        )
    if k < 1:
        raise ValueError("bloom payload: zero hash functions")
    (nwords,) = struct.unpack_from(">i", blob, 2)
    if nwords < 1 or len(blob) != 6 + 8 * nwords:
        raise ValueError("bloom payload truncated or mis-sized")
    words = np.frombuffer(blob, ">u8", nwords, 6).astype(np.uint64)
    return int(k), words


def _murmur_pair_longs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (h1, h2) of murmur3_x64_128 over 8-byte little-endian
    long inputs, seed 0 — the Guava long-funnel hash (single tail
    block, so the whole digest is a handful of numpy uint64 ops;
    cross-checked against the scalar reference in tests)."""
    from apache_pinot_spark.functions.theta_wire import (
        _C1,
        _C2,
        _vfmix,
        _vrotl,
    )

    v = np.asarray(values, np.int64).astype(np.uint64)
    c1, c2 = np.uint64(_C1), np.uint64(_C2)
    with np.errstate(over="ignore"):
        k1 = _vrotl(v * c1, 31) * c2
        h1 = k1.copy()  # h1 starts at seed 0, then ^= k1
        h2 = np.zeros_like(h1)
        eight = np.uint64(8)
        h1 ^= eight
        h2 ^= eight
        h1 += h2
        h2 += h1
        h1 = _vfmix(h1)
        h2 = _vfmix(h2)
        h1 += h2
        h2 += h1
    return h1, h2


def _bloom_probe(words: np.ndarray, k: int, h1: np.ndarray,
                 h2: np.ndarray) -> np.ndarray:
    """Vectorized k-probe membership over the bit array."""
    bit_size = np.uint64(words.size * 64)
    mask63 = np.uint64((1 << 63) - 1)
    out = np.ones(h1.size, dtype=bool)
    combined = h1.copy()
    with np.errstate(over="ignore"):
        for _ in range(k):
            idx = (combined & mask63) % bit_size
            w = words[(idx >> np.uint64(6)).astype(np.int64)]
            out &= ((w >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
            combined += h2
    return out


def build_bloom(values: np.ndarray, expected_insertions: int,
                fpp: float) -> bytes:
    """Write side of the bloom fallback: a FULL type-3 IdSet payload
    whose bytes match what Guava's BloomFilter.create(longFunnel, n,
    fpp) + put(value)* + writeTo() produces (the library's sizing
    formulas are deterministic: bits = (long)(-n·ln p / ln²2), words =
    ceil(bits/64), k = max(1, round(bits/n·ln 2)) — jar-validated in
    tests)."""
    import math

    n = max(1, int(expected_insertions))
    p = min(max(float(fpp), 5e-324), 1.0)
    bits = int(-n * math.log(p) / (math.log(2) ** 2))
    nwords = max(1, -(-bits // 64))
    # Math.round is HALF-UP; Python round() is half-even — mirror Java
    k = max(1, math.floor(bits / n * math.log(2) + 0.5))
    if k > 255:
        raise ValueError(f"bloom fpp {fpp} needs {k} hash functions (>255)")
    words = np.zeros(nwords, np.uint64)
    bit_size = np.uint64(nwords * 64)
    mask63 = np.uint64((1 << 63) - 1)
    h1, h2 = _murmur_pair_longs(np.asarray(values, np.int64))
    combined = h1.copy()
    with np.errstate(over="ignore"):
        for _ in range(k):
            idx = (combined & mask63) % bit_size
            np.bitwise_or.at(
                words,
                (idx >> np.uint64(6)).astype(np.int64),
                np.left_shift(np.uint64(1), (idx & np.uint64(63))),
            )
            combined += h2
    return (
        bytes([TYPE_BLOOM, 1, k])
        + struct.pack(">i", nwords)
        + words.astype(">u8").tobytes()
    )


def bloom_might_contain(blob: bytes, values: np.ndarray) -> np.ndarray:
    """Vectorized Guava mightContain over int64 values for a FULL
    type-3 IdSet blob (leading type byte included): one fused murmur
    pass + k gather probes, all numpy. False positives at the filter's
    configured rate; never false negatives — the public approximate
    IN_ID_SET contract."""
    if not blob or blob[0] != TYPE_BLOOM:
        raise ValueError("not a BLOOM_FILTER IdSet payload")
    k, words = parse_bloom(blob[1:])
    h1, h2 = _murmur_pair_longs(np.asarray(values, np.int64))
    return _bloom_probe(words, k, h1, h2)


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


def parse_idset_options(opts: str) -> dict:
    """The public ID_SET options string —
    'sizeThresholdInBytes=…;expectedInsertions=…;fpp=…' — with the
    documented defaults (8 MiB threshold, 5M insertions, 0.03)."""
    out = {
        "sizeThresholdInBytes": 8 * 1024 * 1024,
        "expectedInsertions": 5_000_000,
        "fpp": 0.03,
    }
    for kv in (opts or "").split(";"):
        if "=" not in kv:
            continue
        key, v = kv.split("=", 1)
        key = key.strip()
        if key in ("sizeThresholdInBytes", "expectedInsertions"):
            out[key] = int(float(v))
        elif key == "fpp":
            out[key] = float(v)
        elif key:
            raise ValueError(f"ID_SET: unknown option {key!r}")
    if out["sizeThresholdInBytes"] < 16:
        raise ValueError("ID_SET: sizeThresholdInBytes too small")
    if not 0 < out["fpp"] < 1:
        raise ValueError(f"ID_SET: fpp {out['fpp']} outside (0, 1)")
    return out


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------
BUILD_UDF = "pinot_idset_build"
BLOOM_UDF = "pinot_idset_bloom_contains"


def register_idset_udfs(spark) -> None:
    """ID_SET's grouped-agg builder: integer COLUMNS -> the Pinot wire
    carrier (base64), other types -> the engine-local JSON layout
    (sorted distinct strings) that IN_ID_SET also accepts.

    The dispatch key is the SQL-side typeof() string (second argument),
    NOT the pandas dtype, and the VALUES arrive as STRINGS (the handler
    emits CAST(col AS STRING)): Arrow ships an int64 column containing
    NULLs to pandas as float64, which both flips dtype-sniffing AND
    silently rounds values beyond 2^53 — strings survive exactly."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def pinot_idset_build(
        values: pd.Series, sqltype: pd.Series, options: pd.Series
    ) -> str:
        import base64 as _b64
        import json as _json

        from apache_pinot_spark.functions import idset_wire as _iw

        present = values.dropna()
        t = str(sqltype.iloc[0]).lower() if len(sqltype) else ""
        opts = _iw.parse_idset_options(
            str(options.iloc[0]) if len(options) else ""
        )
        if t in ("tinyint", "smallint", "int", "bigint"):
            ints = np.array([int(x) for x in present], np.int64)
            exact = _iw.serialize_idset(ints)
            if len(exact) > opts["sizeThresholdInBytes"]:
                # the public size-bounded fallback: approximate bloom
                # state instead of an unbounded exact carrier
                exact = _iw.build_bloom(
                    np.unique(ints),
                    opts["expectedInsertions"],
                    opts["fpp"],
                )
            return _b64.b64encode(exact).decode()
        strs = sorted(set(str(x) for x in present))
        payload = _json.dumps(strs, separators=(",", ":")).encode()
        if len(payload) > opts["sizeThresholdInBytes"]:
            raise ValueError(
                f"ID_SET: {len(payload)} bytes of distinct strings exceeds "
                f"sizeThresholdInBytes={opts['sizeThresholdInBytes']} and "
                "the bloom fallback only covers integer columns here (the "
                "string funnel is not pinned) — raise the threshold or "
                "filter with IN_SUBQUERY"
            )
        return _b64.b64encode(payload).decode()

    @pandas_udf("boolean")
    def pinot_idset_bloom_contains(b64: pd.Series, vals: pd.Series) -> pd.Series:
        # vals arrive as STRINGS (handler emits CAST(expr AS STRING)) so
        # NULL-bearing int64 batches keep exact values (Arrow would
        # otherwise float64 them, rounding beyond 2^53 — a false-negative
        # source). Non-integer input fails LOUDLY: the long funnel under
        # this bloom cannot hash strings, and silent NULL-casting would
        # guarantee false negatives.
        import base64 as _b64

        from apache_pinot_spark.functions import idset_wire as _iw

        blob = _b64.b64decode(b64.iloc[0]) if len(b64) else b"\x03"
        mask = vals.notna().to_numpy()
        try:
            ints = np.array(
                [int(x) for x in vals.dropna()], np.int64
            )
        except ValueError as e:
            raise ValueError(
                "IN_ID_SET(bloom): the filter hashes LONG values; got "
                f"non-integer input ({e}) — bloom idsets over non-integer "
                "columns use a funnel this engine does not reproduce"
            )
        hits = _iw.bloom_might_contain(blob, ints)
        out = pd.array([None] * len(vals), dtype="boolean")
        out[mask] = hits  # NULL input stays NULL, like the exact path
        return pd.Series(out)

    spark.udf.register(BUILD_UDF, pinot_idset_build)
    spark.udf.register(BLOOM_UDF, pinot_idset_bloom_contains)
