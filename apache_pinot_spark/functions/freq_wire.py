"""Apache DataSketches frequencies (frequent-items) BYTES wire interop
— LongsSketch and ItemsSketch<String>, the serialized forms behind the
reference's FREQUENTLONGSSKETCH / FREQUENTSTRINGSSKETCH columns.

Wire layout (datasketches frequencies serialization, little-endian;
byte-validated against datasketches-java 6.2.0 — tests/test_freq_wire.py):

    byte 0    preamble longs (1 empty, 4 non-empty)
    byte 1    serial version = 1
    byte 2    family id = 10 (FREQUENCY)
    byte 3    lgMaxMapSize        byte 4  lgCurMapSize
    byte 5    flags (4 = EMPTY... stored as 0x05 on empty blobs; only
              the EMPTY bit is meaningful on read)
    bytes 6-7 unused
  non-empty:
    long 1    numActive (int32 + 4 unused bytes)
    long 2    streamLength
    long 3    offset (the accumulated purge error)
    numActive counts (int64 each)
    numActive items — int64 each (LongsSketch), or the serde stream
              (ItemsSketch<String>: int32 length + UTF-8 bytes per item)

Query semantics (pinned from the library): for a PRESENT item,
estimate = count + offset, lowerBound = count, upperBound = count +
offset; absent items estimate 0 with upperBound = offset.
NO_FALSE_POSITIVES returns items with lowerBound > offset;
NO_FALSE_NEGATIVES returns items with upperBound > offset.

Merging here happens in count space — sum matching counts, sum offsets
— WITHOUT re-purging: every per-item bound of the no-purge merge is at
least as tight as the library's purged merge, so results remain valid
frequent-items answers; re-serialized merged blobs heapify in the
library (lg sizes grown to fit the unpurged item set). This keeps the
merge deterministic, which the library's purge cascade also is, but
matching its exact eviction order adds nothing to answer quality.

The engine-local Misra-Gries module (functions/freqitems.py) remains
the build path for raw columns; THIS module is for migrated BYTES
columns already in the DataSketches wire domain.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import pandas as pd  # module-level: pandas_udf type-hint inference needs 'pd.*'

_FAMILY_FREQ = 10
_F_EMPTY = 4


@dataclass
class FreqWire:
    lg_max: int
    stream_length: int = 0
    offset: int = 0
    counts: dict = field(default_factory=dict)  # item (int|str) → count

    # -- query surface (library-pinned semantics) ---------------------------
    def estimate(self, item) -> int:
        c = self.counts.get(item)
        return 0 if c is None else c + self.offset

    def lower_bound(self, item) -> int:
        return self.counts.get(item, 0)

    def upper_bound(self, item) -> int:
        c = self.counts.get(item)
        return self.offset if c is None else c + self.offset

    def frequent_items(self, no_false_positives: bool = True):
        """[(item, estimate, lower, upper)] sorted by estimate desc —
        getFrequentItems(NO_FALSE_POSITIVES | NO_FALSE_NEGATIVES)."""
        out = []
        for item, c in self.counts.items():
            keep = c > self.offset if no_false_positives else (
                c + self.offset > self.offset
            )
            if keep:
                out.append((item, c + self.offset, c, c + self.offset))
        out.sort(key=lambda t: (-t[1], str(t[0])))
        return out

    def merge(self, other: "FreqWire") -> "FreqWire":
        merged = dict(self.counts)
        for item, c in other.counts.items():
            merged[item] = merged.get(item, 0) + c
        return FreqWire(
            max(self.lg_max, other.lg_max),
            self.stream_length + other.stream_length,
            self.offset + other.offset,
            merged,
        )


def _parse_preamble(blob: bytes) -> tuple[int, int, int, int, int] | None:
    """Returns (lg_max, num_active, stream_len, offset, items_offset)
    or None for a valid EMPTY blob; raises on hostile bytes."""
    if len(blob) < 8:
        raise ValueError("frequencies blob too short for a preamble")
    pre, ser, family, lg_max, _lg_cur, flags = struct.unpack_from("<BBBBBB", blob, 0)
    if family != _FAMILY_FREQ:
        raise ValueError(f"not a frequencies sketch (family {family})")
    if ser != 1:
        raise ValueError(f"unsupported frequencies serial version {ser}")
    if not 1 <= lg_max <= 31:
        raise ValueError(f"frequencies blob invalid: lgMaxMapSize {lg_max}")
    if flags & _F_EMPTY:
        return None
    if pre != 4 or len(blob) < 32:
        raise ValueError(f"unsupported frequencies preamble ({pre} longs)")
    num_active = struct.unpack_from("<i", blob, 8)[0]
    stream_len, offset = struct.unpack_from("<qq", blob, 16)
    if num_active < 0 or stream_len < 0 or offset < 0:
        raise ValueError("frequencies blob invalid: negative counters")
    need = 32 + 8 * num_active
    if len(blob) < need:
        raise ValueError(f"frequencies blob truncated: need ≥{need}")
    return lg_max, num_active, stream_len, offset, need


def parse_longs_sketch(blob: bytes) -> FreqWire:
    blob = bytes(blob)
    head = _parse_preamble(blob)
    if head is None:
        return FreqWire(struct.unpack_from("<BBBB", blob, 0)[3])
    lg_max, n, stream_len, offset, items_off = head
    if len(blob) < items_off + 8 * n:
        raise ValueError("LongsSketch blob truncated in items")
    counts = struct.unpack_from(f"<{n}q", blob, 32)
    items = struct.unpack_from(f"<{n}q", blob, items_off)
    return FreqWire(lg_max, stream_len, offset, dict(zip(items, counts)))


def parse_strings_sketch(blob: bytes) -> FreqWire:
    """ItemsSketch<String> with ArrayOfStringsSerDe (the reference's
    FREQUENTSTRINGSSKETCH serde): items are int32-length-prefixed
    UTF-8."""
    blob = bytes(blob)
    head = _parse_preamble(blob)
    if head is None:
        return FreqWire(struct.unpack_from("<BBBB", blob, 0)[3])
    lg_max, n, stream_len, offset, pos = head
    counts = struct.unpack_from(f"<{n}q", blob, 32)
    items = []
    for _ in range(n):
        if len(blob) < pos + 4:
            raise ValueError("ItemsSketch blob truncated in item length")
        ln = struct.unpack_from("<i", blob, pos)[0]
        pos += 4
        if ln < 0 or len(blob) < pos + ln:
            raise ValueError("ItemsSketch blob truncated in item bytes")
        items.append(blob[pos : pos + ln].decode("utf-8"))
        pos += ln
    return FreqWire(lg_max, stream_len, offset, dict(zip(items, counts)))


def _serialize(s: FreqWire, longs: bool) -> bytes:
    n = len(s.counts)
    if n == 0 and s.stream_length == 0:
        return struct.pack("<BBBBBBH", 1, 1, _FAMILY_FREQ, s.lg_max, 3, 0x05, 0)
    # grow lg sizes so the library heapifies the unpurged item set:
    # hash maps purge above a 0.75 load factor, so cur must hold n/0.75
    lg_cur = 3
    while (1 << lg_cur) * 3 // 4 < n:
        lg_cur += 1
    lg_max = max(s.lg_max, lg_cur)
    items = sorted(s.counts, key=lambda it: (-s.counts[it], str(it)))
    head = struct.pack("<BBBBBBH", 4, 1, _FAMILY_FREQ, lg_max, lg_cur, 0, 0)
    head += struct.pack("<iiqq", n, 0, s.stream_length, s.offset)
    body = struct.pack(f"<{n}q", *[s.counts[it] for it in items])
    if longs:
        tail = struct.pack(f"<{n}q", *items)
    else:
        tail = b"".join(
            struct.pack("<i", len(enc := str(it).encode("utf-8"))) + enc
            for it in items
        )
    return head + body + tail


def serialize_longs_sketch(s: FreqWire) -> bytes:
    return _serialize(s, longs=True)


def serialize_strings_sketch(s: FreqWire) -> bytes:
    return _serialize(s, longs=False)


def merge_blobs(blobs, kind: str) -> FreqWire:
    parse = parse_longs_sketch if kind == "longs" else parse_strings_sketch
    out: FreqWire | None = None
    for b in blobs:
        if b is None:
            continue
        s = parse(b)
        out = s if out is None else out.merge(s)
    if out is None:
        raise ValueError("no frequencies blobs to merge")
    return out


MERGE_LONGS_UDF = "pinot_freq_wire_merge_longs"
MERGE_STRINGS_UDF = "pinot_freq_wire_merge_strings"


def register_freq_wire_udfs(spark) -> None:
    """Grouped-agg merges over wire BYTES columns, returning the merged
    blob (clients deserialize for top-k + bounds — the
    FREQUENT*SKETCH query shape over migrated columns)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pinot_freq_wire_merge_longs(blobs: pd.Series) -> bytes:
        from apache_pinot_spark.functions import freq_wire as _f

        present = blobs.dropna()
        if present.empty:
            return None  # all-NULL group → NULL blob, not a failed job
        return _f.serialize_longs_sketch(_f.merge_blobs(present, "longs"))

    @pandas_udf("binary")
    def pinot_freq_wire_merge_strings(blobs: pd.Series) -> bytes:
        from apache_pinot_spark.functions import freq_wire as _f

        present = blobs.dropna()
        if present.empty:
            return None
        return _f.serialize_strings_sketch(_f.merge_blobs(present, "strings"))

    spark.udf.register(MERGE_LONGS_UDF, pinot_freq_wire_merge_longs)
    spark.udf.register(MERGE_STRINGS_UDF, pinot_freq_wire_merge_strings)
