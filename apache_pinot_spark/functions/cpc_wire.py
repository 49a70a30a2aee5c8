"""Apache DataSketches CPC sketch — wire-format read side + merge +
re-serialization, pure Python/numpy-free.

This closes the last BYTES sketch-column kind of the migration contract
(reference: configuration-reference/schema.md:48 — BYTES metric columns
holding serialized sketch state).  A Pinot deployment using
DISTINCTCOUNTCPCSKETCH stores blobs produced by datasketches-java's
CpcSketch.toByteArray(); this module parses that layout, reproduces the
library's estimates exactly (HIP accumulator for un-merged sketches, the
ICON estimator for merged ones), merges blobs (bit-matrix OR with
cross-lgK downsampling) and emits MERGED-format blobs that heapify in
the library.

Format knowledge comes from the published Apache-2.0 implementation
(datasketches-java 6.2.0, org.apache.datasketches.cpc) and the CPC paper
(Lang, "Back to the Future: an Even More Nearly Optimal Cardinality
Estimation Algorithm", arXiv:1708.06839).  The static code tables of the
compressed format live in functions/_cpc_tables.py (extracted from the
library, re-verified against it byte-for-byte in tests/test_cpc_wire.py;
decoding tables are DERIVED from the encoding tables exactly the way the
library derives them at class-init).

Serialized layout (little-endian; preamble ints -> byte offsets):
  byte 0   preInts        2/4/6/8/10 by format
  byte 1   serVer         1
  byte 2   family         16 (CPC)
  byte 3   lgK
  byte 4   fiCol          first interesting column
  byte 5   flags          b1 compressed, b2 hasHip, b3 hasSV, b4 hasWindow
  byte 6-7 seedHash       ThetaUtil.computeSeedHash(9001) for the default
  format ordinal = (hasWindow<<2) | (hasSV<<1) | (hip? 1 : 0 inverted):
    0 EMPTY_MERGED   2 SPARSE_HYBRID_MERGED       [numCoupons, csvLen]
    1 EMPTY_HIP      3 SPARSE_HYBRID_HIP          [numCoupons, csvLen, kxp, hip]
    4 PINNED_SLIDING_MERGED_NOSV  [numCoupons, cwLen]
    5 PINNED_SLIDING_HIP_NOSV     [numCoupons, cwLen, kxp, hip]
    6 PINNED_SLIDING_MERGED       [numCoupons, numSV, csvLen, cwLen]
    7 PINNED_SLIDING_HIP          [numCoupons, numSV, kxp, hip, csvLen, cwLen]
  then the compressed window stream (if any), then the csv stream.

Flavors by coupon count c vs k = 2^lgK (the library's determineFlavor):
  EMPTY c==0; SPARSE 32c < 3k; HYBRID 2c < k; PINNED 8c < 27k; else SLIDING.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import pandas as pd  # module-level: pandas_udf type-hint inference needs 'pd.*'

from apache_pinot_spark.functions._cpc_tables import (
    COLUMN_PERMUTATIONS_FOR_DECODING,
    COLUMN_PERMUTATIONS_FOR_ENCODING,
    DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE,
    ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE,
    ICON_POLYNOMIAL_COEFFICIENTS,
    LENGTH_LIMITED_UNARY_DECODING_TABLE_65,
    LENGTH_LIMITED_UNARY_ENCODING_TABLE_65,
)
from apache_pinot_spark.functions.theta_wire import DEFAULT_SEED, compute_seed_hash

CPC_FAMILY = 16
SER_VER = 1
_M64 = (1 << 64) - 1

# ---------------------------------------------------------------------------
# flavor / offset / phase arithmetic (CpcUtil + CpcCompression)
# ---------------------------------------------------------------------------


def determine_flavor(lg_k: int, c: int) -> str:
    k = 1 << lg_k
    if c == 0:
        return "EMPTY"
    if (c << 5) < 3 * k:
        return "SPARSE"
    if (c << 1) < k:
        return "HYBRID"
    if (c << 3) < 27 * k:
        return "PINNED"
    return "SLIDING"


def determine_correct_offset(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    tmp = (c << 3) - 19 * k
    return 0 if tmp < 0 else tmp >> (lg_k + 3)


def determine_pseudo_phase(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16
        if 10 * c < 11 * k:
            return 17
        if 100 * c < 132 * k:
            return 18
        if 3 * c < 5 * k:
            return 19
        if 1000 * c < 1965 * k:
            return 20
        if 1000 * c < 2275 * k:
            return 21
        return 6
    return (c >> (lg_k - 4)) & 15


def golomb_choose_number_of_base_bits(k: int, count: int) -> int:
    quotient = (k - count) // count
    return 0 if quotient == 0 else quotient.bit_length() - 1


# ---------------------------------------------------------------------------
# bit-stream codec (CpcCompression low-level, word-exact translation)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("words", "bit_buf", "buf_bits")

    def __init__(self):
        self.words: list[int] = []
        self.bit_buf = 0
        self.buf_bits = 0

    def put(self, code: int, length: int) -> None:
        self.bit_buf |= code << self.buf_bits
        self.buf_bits += length
        if self.buf_bits >= 32:
            self.words.append(self.bit_buf & 0xFFFFFFFF)
            self.bit_buf >>= 32
            self.buf_bits -= 32

    def write_unary(self, value: int) -> None:
        remaining = value
        while remaining >= 16:
            remaining -= 16
            self.put(0, 16)
        self.put(1 << remaining, remaining + 1)

    def pad_and_flush(self, padding: int) -> None:
        self.buf_bits += padding
        if self.buf_bits >= 32:
            self.words.append(self.bit_buf & 0xFFFFFFFF)
            self.bit_buf >>= 32
            self.buf_bits -= 32
        if self.buf_bits > 0:
            self.words.append(self.bit_buf & 0xFFFFFFFF)
            self.bit_buf = 0
            self.buf_bits = 0


class _BitReader:
    __slots__ = ("words", "idx", "bit_buf", "buf_bits")

    def __init__(self, words):
        self.words = words
        self.idx = 0
        self.bit_buf = 0
        self.buf_bits = 0

    def _fill(self, need: int) -> None:
        if self.buf_bits < need:
            self.bit_buf |= (self.words[self.idx] & 0xFFFFFFFF) << self.buf_bits
            self.idx += 1
            self.buf_bits += 32

    def take(self, length: int) -> int:
        out = self.bit_buf & ((1 << length) - 1)
        self.bit_buf >>= length
        self.buf_bits -= length
        return out

    def read_unary(self) -> int:
        sub_total = 0
        while True:
            self._fill(8)
            peek8 = self.bit_buf & 0xFF
            # min(8, ntz): ntz(0) would be >8
            tz = 8 if peek8 == 0 else (peek8 & -peek8).bit_length() - 1
            if tz == 8:
                sub_total += 8
                self.take(8)
                continue
            break
        self.take(1 + tz)
        return sub_total + tz


def low_level_compress_bytes(byte_values, encoding_table) -> list[int]:
    w = _BitWriter()
    for b in byte_values:
        e = encoding_table[b & 0xFF] & 0xFFFF
        w.put(e & 0xFFF, e >> 12)
    w.pad_and_flush(11)
    return w.words


def low_level_uncompress_bytes(num_bytes, decoding_table, words) -> bytes:
    r = _BitReader(words)
    out = bytearray(num_bytes)
    for i in range(num_bytes):
        r._fill(12)
        lookup = decoding_table[r.bit_buf & 0xFFF] & 0xFFFF
        out[i] = lookup & 0xFF
        r.take(lookup >> 8)
    return bytes(out)


def low_level_compress_pairs(pairs, num_base_bits: int) -> list[int]:
    """Sorted (row<<6)|col pairs -> compressed words: column delta via the
    length-limited-unary-65 table, row delta golomb-coded (low bits raw,
    high bits unary)."""
    w = _BitWriter()
    mask = (1 << num_base_bits) - 1
    pred_row, pred_col = 0, 0
    for row_col in pairs:
        row, col = row_col >> 6, row_col & 63
        if row != pred_row:
            pred_col = 0
        y_delta = row - pred_row
        x_delta = col - pred_col
        pred_row, pred_col = row, col + 1
        e = LENGTH_LIMITED_UNARY_ENCODING_TABLE_65[x_delta] & 0xFFFF
        w.put(e & 0xFFF, e >> 12)
        w.write_unary(y_delta >> num_base_bits)
        w.put(y_delta & mask, num_base_bits)
    w.pad_and_flush(max(0, 10 - num_base_bits))
    return w.words


def low_level_uncompress_pairs(num_pairs: int, num_base_bits: int, words) -> list[int]:
    r = _BitReader(words)
    out = []
    pred_row, pred_col = 0, 0
    for _ in range(num_pairs):
        r._fill(12)
        lookup = LENGTH_LIMITED_UNARY_DECODING_TABLE_65[r.bit_buf & 0xFFF] & 0xFFFF
        x_delta = lookup & 0xFF
        r.take(lookup >> 8)
        golomb_hi = r.read_unary()
        r._fill(num_base_bits)
        y_delta = (golomb_hi << num_base_bits) | r.take(num_base_bits)
        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        out.append((row << 6) | col)
        pred_row, pred_col = row, col + 1
    return out


# ---------------------------------------------------------------------------
# sketch state
# ---------------------------------------------------------------------------


@dataclass
class CpcState:
    lg_k: int
    fi_col: int = 0
    merged: bool = True
    num_coupons: int = 0
    kxp: float = 0.0
    hip: float = 0.0
    window: bytes | None = None  # k bytes when present
    pairs: list[int] = field(default_factory=list)  # decoded (row<<6)|col
    seed_hash: int = 0

    @property
    def flavor(self) -> str:
        return determine_flavor(self.lg_k, self.num_coupons)

    @property
    def window_offset(self) -> int:
        return determine_correct_offset(self.lg_k, self.num_coupons)


def parse(blob: bytes, seed: int = DEFAULT_SEED) -> CpcState:
    """Parse a CpcSketch.toByteArray() blob into decoded state (window
    bytes + surprising-value pairs, column permutation undone)."""
    if len(blob) < 8:
        raise ValueError(f"CPC blob too short: {len(blob)} bytes")
    pre_ints, ser_ver, family, lg_k, fi_col, flags = struct.unpack_from("<6B", blob, 0)
    seed_hash = struct.unpack_from("<H", blob, 6)[0]
    if family != CPC_FAMILY:
        raise ValueError(f"not a CPC sketch: family {family}")
    if ser_ver != SER_VER:
        raise ValueError(f"unsupported CPC serVer {ser_ver}")
    if not flags & 0x02:
        raise ValueError("CPC blob without the compressed flag")
    expect = compute_seed_hash(seed)
    if seed_hash != expect:
        raise ValueError(
            f"CPC seed hash mismatch (blob {seed_hash:#x}, expected {expect:#x})"
        )
    has_hip = bool(flags & 0x04)
    has_sv = bool(flags & 0x08)
    has_window = bool(flags & 0x10)
    st = CpcState(lg_k=lg_k, fi_col=fi_col, merged=not has_hip, seed_hash=seed_hash)
    pos = 8
    num_csv = csv_len = cw_len = 0
    if has_sv or has_window:
        st.num_coupons = struct.unpack_from("<i", blob, pos)[0]
        pos += 4
        if has_window:
            if has_sv:
                num_csv = struct.unpack_from("<i", blob, pos)[0]
                pos += 4
                if has_hip:
                    st.kxp, st.hip = struct.unpack_from("<2d", blob, pos)
                    pos += 16
                csv_len, cw_len = struct.unpack_from("<2i", blob, pos)
                pos += 8
            else:
                cw_len = struct.unpack_from("<i", blob, pos)[0]
                pos += 4
                if has_hip:
                    st.kxp, st.hip = struct.unpack_from("<2d", blob, pos)
                    pos += 16
        else:
            num_csv = st.num_coupons  # sparse/hybrid: csv carries every coupon
            csv_len = struct.unpack_from("<i", blob, pos)[0]
            pos += 4
            if has_hip:
                st.kxp, st.hip = struct.unpack_from("<2d", blob, pos)
                pos += 16
    # EMPTY formats (no sv, no window) store nothing past the first 8
    # bytes even when the HIP flag is set; hip stays 0.0.
    k = 1 << lg_k
    if has_window:
        cw_words = list(struct.unpack_from(f"<{cw_len}I", blob, pos))
        pos += 4 * cw_len
        phase = determine_pseudo_phase(lg_k, st.num_coupons)
        st.window = low_level_uncompress_bytes(
            k, DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE[phase], cw_words
        )
    if num_csv > 0:
        csv_words = list(struct.unpack_from(f"<{csv_len}I", blob, pos))
        pos += 4 * csv_len
        base_bits = golomb_choose_number_of_base_bits(k + num_csv, num_csv)
        raw_pairs = low_level_uncompress_pairs(num_csv, base_bits, csv_words)
        flavor = st.flavor
        if flavor in ("SPARSE", "HYBRID"):
            st.pairs = raw_pairs
        elif flavor == "PINNED":
            st.pairs = [p + 8 for p in raw_pairs]  # cols stored -8
        else:  # SLIDING: undo the per-phase column permutation + rotation
            phase = determine_pseudo_phase(lg_k, st.num_coupons)
            perm = COLUMN_PERMUTATIONS_FOR_DECODING[phase]
            offset = st.window_offset
            st.pairs = [
                ((p >> 6) << 6) | ((perm[p & 63] + offset + 8) & 63)
                for p in raw_pairs
            ]
    return st


def to_bit_matrix(st: CpcState) -> list[int]:
    """The sketch's coupon set as k 64-bit rows (CpcUtil.bitMatrixOfSketch):
    columns below the window offset default to 1, window bytes sit at the
    offset, surprising-value pairs TOGGLE bits."""
    k = 1 << st.lg_k
    if st.num_coupons == 0:
        return [0] * k
    offset = st.window_offset
    default_row = (1 << offset) - 1
    matrix = [default_row] * k
    flavor = st.flavor
    if st.window is not None and flavor in ("HYBRID", "PINNED", "SLIDING"):
        for i in range(k):
            matrix[i] |= (st.window[i] & 0xFF) << offset
    for p in st.pairs:
        matrix[p >> 6] ^= (1 << (p & 63)) & _M64
    # hybrid blobs fold window bits into the csv: those pairs TOGGLED the
    # bits in, which is correct because default_row is 0 at offset 0
    return matrix


def matrix_to_state(matrix: list[int], lg_k: int, seed: int = DEFAULT_SEED) -> CpcState:
    """A MERGED-sketch state from a coupon bit matrix (CpcUnion.getResult
    semantics: numCoupons = popcount, derived window offset, deviations
    from the windowed default become surprising-value pairs, fiCol =
    min(ntz of the OR of all deviations, offset))."""
    k = 1 << lg_k
    c = sum(row.bit_count() for row in matrix)
    st = CpcState(
        lg_k=lg_k, merged=True, num_coupons=c, seed_hash=compute_seed_hash(seed)
    )
    if c == 0:
        return st
    flavor = st.flavor
    if flavor in ("SPARSE", "HYBRID"):
        pairs = []
        for i, row in enumerate(matrix):
            r = row
            while r:
                col = (r & -r).bit_length() - 1
                r ^= 1 << col
                pairs.append((i << 6) | col)
        st.pairs = pairs
        st.fi_col = 0
        if flavor == "HYBRID":
            # sketch form: cols 0-7 live in the window, rest in pairs
            win = bytearray(k)
            hp = []
            for p in pairs:
                if p & 63 < 8:
                    win[p >> 6] |= 1 << (p & 63)
                else:
                    hp.append(p)
            st.window = bytes(win)
            st.pairs = hp
        return st
    offset = st.window_offset
    win = bytearray(k)
    pairs = []
    or_mask = 0
    mask_all = _M64 ^ (0xFF << offset)
    default_row = (1 << offset) - 1
    for i, row in enumerate(matrix):
        win[i] = (row >> offset) & 0xFF
        pattern = (row & mask_all) ^ default_row
        or_mask |= pattern
        while pattern:
            col = (pattern & -pattern).bit_length() - 1
            pattern ^= 1 << col
            pairs.append((i << 6) | col)
    st.window = bytes(win)
    st.pairs = pairs
    fi = (or_mask & -or_mask).bit_length() - 1 if or_mask else 64
    st.fi_col = min(fi, offset)
    return st


def serialize(st: CpcState) -> bytes:
    """CpcSketch.toByteArray() for a state (MERGED or HIP): compress the
    window / surprising values per flavor and emit the preamble+streams.
    Output heapifies in datasketches-java."""
    k = 1 << st.lg_k
    flavor = st.flavor
    csv_words: list[int] = []
    cw_words: list[int] = []
    num_csv = 0
    if flavor in ("SPARSE", "HYBRID"):
        pairs = list(st.pairs)
        if st.window is not None:
            # hybrid sketch form: window bits ride the csv (compressHybrid)
            for i in range(k):
                b = st.window[i]
                while b:
                    col = (b & -b).bit_length() - 1
                    b ^= 1 << col
                    pairs.append((i << 6) | col)
        pairs.sort()
        num_csv = len(pairs)
        if num_csv:
            bb = golomb_choose_number_of_base_bits(k + num_csv, num_csv)
            csv_words = low_level_compress_pairs(pairs, bb)
    elif flavor in ("PINNED", "SLIDING"):
        phase = determine_pseudo_phase(st.lg_k, st.num_coupons)
        cw_words = low_level_compress_bytes(
            st.window, ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[phase]
        )
        if st.pairs:
            if flavor == "PINNED":
                pairs = sorted(p - 8 for p in st.pairs)
            else:
                perm = COLUMN_PERMUTATIONS_FOR_ENCODING[phase]
                offset = st.window_offset
                pairs = sorted(
                    ((p >> 6) << 6) | perm[((p & 63) + 56 - offset) & 63]
                    for p in st.pairs
                )
            num_csv = len(pairs)
            bb = golomb_choose_number_of_base_bits(k + num_csv, num_csv)
            csv_words = low_level_compress_pairs(pairs, bb)
    has_window = len(cw_words) > 0
    has_sv = num_csv > 0
    has_hip = not st.merged
    fmt = (4 if has_window else 0) | (2 if has_sv else 0) | (0 if st.merged else 1)
    pre_ints = {0: 2, 1: 2, 2: 4, 3: 8, 4: 4, 5: 8, 6: 6, 7: 10}[fmt]
    flags = 0x02 | (0x04 if has_hip else 0) | (0x08 if has_sv else 0) | (
        0x10 if has_window else 0
    )
    out = bytearray()
    out += struct.pack(
        "<6BH", pre_ints, SER_VER, CPC_FAMILY, st.lg_k, st.fi_col, flags,
        st.seed_hash or compute_seed_hash(DEFAULT_SEED),
    )
    if fmt in (2, 3):
        out += struct.pack("<2i", st.num_coupons, len(csv_words))
        if has_hip:
            out += struct.pack("<2d", st.kxp, st.hip)
    elif fmt in (4, 5):
        out += struct.pack("<2i", st.num_coupons, len(cw_words))
        if has_hip:
            out += struct.pack("<2d", st.kxp, st.hip)
    elif fmt in (6, 7):
        out += struct.pack("<2i", st.num_coupons, num_csv)
        if has_hip:
            out += struct.pack("<2d", st.kxp, st.hip)
        out += struct.pack("<2i", len(csv_words), len(cw_words))
    if cw_words:
        out += struct.pack(f"<{len(cw_words)}I", *cw_words)
    if csv_words:
        out += struct.pack(f"<{len(csv_words)}I", *csv_words)
    return bytes(out)


# ---------------------------------------------------------------------------
# estimation (IconEstimator + HIP)
# ---------------------------------------------------------------------------


def icon_estimate(lg_k: int, c: int) -> float:
    if c < 2:
        return 0.0 if c == 0 else 1.0
    k = 1 << lg_k
    threshold = 5.7 if lg_k < 14 else 5.6
    if c > threshold * k:
        # exponential regime
        return 0.7940236163830469 * k * (2.0 ** (c / k))
    start = 20 * (lg_k - 4)
    x = c / (2.0 * k)
    acc = ICON_POLYNOMIAL_COEFFICIENTS[start + 19]
    for i in range(start + 18, start - 1, -1):
        acc = acc * x + ICON_POLYNOMIAL_COEFFICIENTS[i]
    ratio = c / k
    term = 1.0 + (ratio * ratio * ratio) / 66.774757
    result = c * acc * term
    return result if result > c else float(c)


def estimate(st: CpcState) -> float:
    """The library's getEstimate: HIP accumulator for un-merged sketches,
    ICON for merged ones."""
    if st.merged:
        return icon_estimate(st.lg_k, st.num_coupons)
    return st.hip


def estimate_blob(blob: bytes, seed: int = DEFAULT_SEED) -> float:
    return estimate(parse(blob, seed))


# ---------------------------------------------------------------------------
# merge
# ---------------------------------------------------------------------------


def merge_to_matrix(blobs, seed: int = DEFAULT_SEED) -> tuple[list[int], int]:
    """OR the coupon matrices of all blobs; cross-lgK unions fold rows of
    the larger sketch into the smaller K (the library's downsampling:
    dest[i & (k'-1)] |= src[i])."""
    states = [parse(bytes(b), seed) for b in blobs]
    if not states:
        raise ValueError("merge of zero CPC sketches")
    lg_k = min(s.lg_k for s in states)
    k = 1 << lg_k
    acc = [0] * k
    for s in states:
        m = to_bit_matrix(s)
        if s.lg_k == lg_k:
            for i in range(k):
                acc[i] |= m[i]
        else:
            for i, row in enumerate(m):
                acc[i & (k - 1)] |= row
    return acc, lg_k


def merge_blobs(blobs, seed: int = DEFAULT_SEED) -> bytes:
    """Union the blobs and re-serialize as a MERGED sketch (loadable by
    datasketches-java; its estimate there == our ICON estimate here)."""
    matrix, lg_k = merge_to_matrix(blobs, seed)
    return serialize(matrix_to_state(matrix, lg_k, seed))


def merge_estimate(blobs, seed: int = DEFAULT_SEED) -> float:
    """Estimate of the union.  A single un-merged blob keeps its HIP
    estimate (parity with the library, which only switches to ICON once a
    union is involved)."""
    blobs = list(blobs)
    if len(blobs) == 1:
        return estimate_blob(bytes(blobs[0]), seed)
    matrix, lg_k = merge_to_matrix(blobs, seed)
    c = sum(row.bit_count() for row in matrix)
    return icon_estimate(lg_k, c)


# ---------------------------------------------------------------------------
# Spark surface (mirrors bitmap/tuple/freq wire kinds)
# ---------------------------------------------------------------------------

UNION_UDF = "pinot_cpc_union"
EST_UDF = "pinot_cpc_estimate"


def register_cpc_udfs(spark) -> None:
    """Grouped-agg pandas UDFs over serialized-CPC BYTES columns.  UNION
    returns a MERGED wire blob (two-phase-safe: merged blobs re-merge
    losslessly — the coupon matrix is the state); ESTIMATE is the
    terminal number (library-exact: HIP for one un-merged blob, ICON
    otherwise)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pinot_cpc_union(blobs: pd.Series) -> bytes:
        from apache_pinot_spark.functions.cpc_wire import merge_blobs

        present = blobs.dropna()
        if present.empty:
            # an all-NULL group is an empty union; datasketches-java's
            # CpcUnion with no updates yields an empty sketch — NULL here
            # (mirrors hllplus_wire's convention for the same case)
            return None
        return merge_blobs(present)

    @pandas_udf("double")
    def pinot_cpc_estimate(blobs: pd.Series) -> float:
        from apache_pinot_spark.functions.cpc_wire import merge_estimate

        present = blobs.dropna()
        if present.empty:
            return 0.0  # empty union estimates 0 distinct items
        return float(merge_estimate(present))

    spark.udf.register(UNION_UDF, pinot_cpc_union)
    spark.udf.register(EST_UDF, pinot_cpc_estimate)
