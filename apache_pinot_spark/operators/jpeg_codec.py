"""Minimal pure-Python/numpy baseline JPEG codec — the second
in-container image tier of the multimodal decode probe (sibling of
operators/png_codec.py), covering the dominant web-corpus format.

Everything here is a transcription of the PUBLIC JPEG standard
(ITU-T T.81): marker segments, canonical Huffman construction (Annex
C), the entropy-coded DC/AC run-size scheme (F.1.2), byte stuffing and
restart markers (F.1.2.3), zig-zag ordering, dequantization, the 8×8
type-III DCT (A.3.3, as an orthonormal matrix product, batched in
numpy per plane), chroma upsampling, and JFIF YCbCr→RGB.

Scope — checked up front, rejected with None rather than guessed
(capability-tier contract: corrupt or out-of-scope blobs flow to the
reject stream, never an exception mid-scan):

  decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
          sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0 and friends),
          restart markers, multi-segment DQT/DHT. Progressive (SOF2),
          arithmetic coding, 12-bit, and 4-component CMYK return None.
  encode: 8-bit gray (H×W) or RGB (H×W×3), 4:4:4, one flat
          quantization table (default all-ones: error bounded by DCT
          float rounding — the property the golden tests pin), and a
          UNIFORM 9-bit Huffman table over all 256 symbols carried in
          DHT. Large but perfectly valid baseline JPEG — the encoder
          exists to assemble real in-container goldens and re-encode
          resized output, not to compress.

The decoder hot path batches all entropy-decoded blocks per component
and runs ONE einsum IDCT per plane; only the Huffman bit walk is
per-symbol Python. That is the documented cost of the no-PIL tier —
the capability probe prefers PIL wherever it is importable.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order (T.81 Figure A.6): index = scan position, value =
# row-major position in the 8x8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_UNZIG = np.argsort(np.array(ZIGZAG))  # scan position for each raster pos


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()  # orthonormal: spatial = A.T @ F @ A


# --------------------------------------------------------------------------
# Huffman (canonical construction, T.81 Annex C)
# --------------------------------------------------------------------------
def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(bit-length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 un-stuffing; stops at any
    real marker (caller checks for restarts)."""

    __slots__ = ("data", "pos", "bit", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.marker: int | None = None

    def read_bit(self) -> int:
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("entropy data exhausted")
        b = d[p]
        if b == 0xFF and self.bit == 0:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt != 0x00:
                self.marker = nxt
                raise ValueError("marker inside entropy data")
        out = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffed 0x00
        return out

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_to_marker(self) -> int | None:
        """Skip to the next marker (restart handling); returns marker byte."""
        if self.bit:
            self.bit = 0
            self.pos += 1
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


def _extend(v: int, s: int) -> int:
    """Sign-extend a category-s magnitude (T.81 F.12)."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------
def decode_jpeg(data: bytes) -> "np.ndarray | None":
    """Baseline JPEG bytes → H×W×3 RGB (or H×W×1 gray) uint8 array;
    None for anything out of scope or corrupt."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes) -> "np.ndarray | None":
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:  # SOI
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # no payload
        if marker == 0xD9:  # EOI
            return None  # EOI before SOS
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    return None  # 16-bit tables: out of scope (12-bit)
                qt[tq] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.int32
                )
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = bytes(body[i + 17 : i + 17 + n])
                table = _build_huffman(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if any(not 1 <= c["h"] <= 2 or not 1 <= c["v"] <= 2 for c in comps):
                return None
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # progressive/arithmetic/hierarchical: out of scope
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = {}
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan[cs] = (tables >> 4, tables & 0xF)
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    return None


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["dc_t"], c["ac_t"] = scan[c["id"]]
        c["blocks"] = []  # zigzag int32 coefficient vectors, MCU order
        c["pred"] = 0
    reader = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if dri and mcu and mcu % dri == 0:
            m = reader.align_to_marker()
            if m is None or not 0xD0 <= m <= 0xD7:
                raise ValueError("missing restart marker")
            for c in comps:
                c["pred"] = 0
        for c in comps:
            dc_table, ac_table = huff_dc[c["dc_t"]], huff_ac[c["ac_t"]]
            for _ in range(c["h"] * c["v"]):
                blk = np.zeros(64, dtype=np.int32)
                s = reader.decode_symbol(dc_table)
                diff = _extend(reader.read_bits(s), s) if s else 0
                c["pred"] += diff
                blk[0] = c["pred"]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(ac_table)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    blk[k] = _extend(reader.read_bits(s), s)
                    k += 1
                c["blocks"].append(blk)
    # batched dequantize + IDCT per component, then assemble planes
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        blocks = np.stack(c["blocks"]) if c["blocks"] else np.zeros((0, 64), np.int32)
        coeffs = (blocks * q)[:, _UNZIG].reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _A, coeffs, _A, optimize=True)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        # blocks are stored per MCU: for each MCU, h*v blocks row-major
        ch, cv = c["h"], c["v"]
        pw, ph = mcux * ch * 8, mcuy * cv * 8
        plane = np.zeros((ph, pw), dtype=np.uint8)
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[bi]
                        bi += 1
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (golden-assembly tier: 4:4:4, flat quant, uniform Huffman)
# --------------------------------------------------------------------------
# AC table, near-uniform: 255 symbols at 9 bits + symbol 0xFF at 10 (a
# DHT count byte caps at 255 per length). Canonical codes: symbol k →
# code k at 9 bits for k < 255, then 255<<1 = 510 at 10 bits for 0xFF.
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMBOLS = bytes(range(256))
_AC_CODE = {sym: (9, sym) for sym in range(255)}
_AC_CODE[255] = (10, 510)
# DC table: libjpeg-family decoders REQUIRE DC symbols ≤ 15, so the DC
# table lists exactly the 12 baseline DC categories at 4 bits each
# (codes 0..11; the all-ones 4-bit code stays unused).
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = bytes(range(12))
_DC_CODE = {sym: (4, sym) for sym in range(12)}


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec custom


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(pixels: "np.ndarray", quant: int = 1,
                restart_interval: int = 0) -> bytes:
    """H×W (gray) or H×W×3 (RGB) uint8 → baseline JPEG bytes. With the
    default all-ones quantization the decode error is bounded by DCT
    float rounding (a couple of gray levels) — the golden-test
    property. ``restart_interval`` emits DRI + RSTn markers every N
    MCUs (exercises the decoder's resync path)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg takes H×W gray or H×W×3 RGB uint8")
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    out = bytearray(b"\xff\xd8")  # SOI
    # flat quant table: zig-zag order is the identity on it
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([int(quant)] * 64)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])  # 4:4:4, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, counts, symbols in (
        (0x00, _DC_COUNTS, _DC_SYMBOLS),
        (0x10, _AC_COUNTS, _AC_SYMBOLS),
    ):
        body = bytes([tc_th]) + bytes(counts) + symbols
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc]) + b"".join(bytes([cid, 0x00]) for cid in range(1, nc + 1))
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    preds = [0] * nc
    mcu_i = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)])
                bw = _BitWriter()
                preds = [0] * nc
            mcu_i += 1
            for ci, plane in enumerate(padded):
                blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                coeff = _A @ blk @ _A.T
                qz = np.round(coeff / float(quant)).astype(np.int64)
                zz = qz.reshape(64)[ZIGZAG]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                s = _category(diff)
                ln, code = _DC_CODE[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        if run == 16:
                            ln, code = _AC_CODE[0xF0]  # ZRL
                            bw.write(code, ln)
                            run = 0
                        continue
                    s = _category(v)
                    ln, code = _AC_CODE[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    ln, code = _AC_CODE[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
