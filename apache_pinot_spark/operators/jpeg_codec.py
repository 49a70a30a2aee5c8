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

  decode: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
          spectral selection, successive approximation first + refine
          for DC and AC, EOB runs per T.81 Annex G; round 8), 8-bit,
          1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 /
          4:2:0 and friends), restart markers, multi-scan sequential,
          multi-segment DQT/DHT. Arithmetic coding, lossless /
          hierarchical, 12-bit, and 4-component CMYK return None.
  encode: 8-bit gray (H×W) or RGB (H×W×3), 4:4:4, one flat
          quantization table (default all-ones: error bounded by DCT
          float rounding — the property the golden tests pin), and a
          UNIFORM 9-bit Huffman table over all 256 symbols carried in
          DHT. ``progressive=True`` emits a spectral-selection scan
          script (DC scan, then per-component AC bands 1-5 and 6-63,
          EOB-run coded) — successive approximation is decode-only,
          golden-tested against the JVM ImageIO writer's full libjpeg
          progression script. Large but perfectly valid JPEG — the
          encoder exists to assemble real in-container goldens and
          re-encode resized output, not to compress.

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
    """JPEG bytes (baseline sequential or progressive) → H×W×3 RGB (or
    H×W×1 gray) uint8 array; None for anything out of scope or corrupt."""
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
    scanned_ids: set[int] = set()
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker are legal
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # no payload
        if marker == 0xD9:  # EOI: reconstruct what the scans accumulated
            if frame is None or not scanned_ids:
                return None
            return _reconstruct(frame, qt)
        if pos + 2 > len(data):
            return None
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if any(not 1 <= c["h"] <= 2 or not 1 <= c["v"] <= 2 for c in comps):
                return None
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # full padded block grid (what interleaved scans cover)
                c["bw"], c["bv"] = mcux * c["h"], mcuy * c["v"]
                # non-interleaved scan dims (T.81 A.2.2: ceil of the
                # component's own sample dims, NOT the padded grid)
                cw = -(-w * c["h"] // hmax)
                chh = -(-h * c["v"] // vmax)
                c["sbw"], c["sbv"] = -(-cw // 8), -(-chh // 8)
                # zigzag-order coefficient grid, one row per block; every
                # scan (sequential or any progressive pass) accumulates
                # into this, and _reconstruct IDCTs it once at the end
                c["coef"] = np.zeros((c["bv"] * c["bw"], 64), dtype=np.int32)
                c["pred"] = 0
            frame = {
                "h": h, "w": w, "comps": comps, "prog": marker == 0xC2,
                "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless/arithmetic/hierarchical: out of scope
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS (one of possibly many)
            if frame is None:
                return None
            ns = body[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scomps = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scomps.append((by_id[cs], tables >> 4, tables & 0xF))
                scanned_ids.add(cs)
            if frame["prog"]:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0xF
            else:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(
                data, pos + seglen, frame, scomps, huff_dc, huff_ac,
                restart_interval, ss, se, ah, al,
            )
            if not frame["prog"] and scanned_ids >= set(by_id):
                # sequential with every component scanned: done (tolerate
                # a missing EOI, matching the old single-scan behavior)
                return _reconstruct(frame, qt)
            continue
        pos += seglen
    return None


def _decode_scan(data, pos, frame, scomps, huff_dc, huff_ac, dri,
                 ss, se, ah, al):
    """Decode ONE entropy-coded scan into the per-component coefficient
    grids; returns the byte offset just past the scan's entropy data.
    Handles interleaved (ns>1: MCU order over the padded grid) and
    non-interleaved (ns=1: raster over the component's own block dims)
    layouts, restart intervals, and all four progressive passes."""
    reader = _BitReader(data, pos)
    prog = frame["prog"]
    for comp, _, _ in scomps:
        comp["pred"] = 0
    eobrun = 0
    interleaved = len(scomps) > 1
    if interleaved:
        units = frame["mcux"] * frame["mcuy"]
    else:
        comp0 = scomps[0][0]
        units = comp0["sbw"] * comp0["sbv"]
    for unit in range(units):
        if dri and unit and unit % dri == 0:
            m = reader.align_to_marker()
            if m is None or not 0xD0 <= m <= 0xD7:
                raise ValueError("missing restart marker")
            for comp, _, _ in scomps:
                comp["pred"] = 0
            eobrun = 0
        if interleaved:
            mx, my = unit % frame["mcux"], unit // frame["mcux"]
            for comp, dc_t, ac_t in scomps:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = (my * comp["v"] + by) * comp["bw"] + (
                            mx * comp["h"] + bx
                        )
                        eobrun = _decode_block(
                            reader, comp, comp["coef"][row],
                            huff_dc.get(dc_t), huff_ac.get(ac_t),
                            ss, se, ah, al, prog, eobrun,
                        )
        else:
            comp, dc_t, ac_t = scomps[0]
            mx, my = unit % comp["sbw"], unit // comp["sbw"]
            row = my * comp["bw"] + mx
            eobrun = _decode_block(
                reader, comp, comp["coef"][row],
                huff_dc.get(dc_t), huff_ac.get(ac_t),
                ss, se, ah, al, prog, eobrun,
            )
    # byte-align past the final (possibly 0xFF-stuffed) entropy byte
    if reader.bit:
        reader.pos += 2 if reader.data[reader.pos] == 0xFF else 1
    return reader.pos


def _decode_block(reader, comp, blk, dc_table, ac_table,
                  ss, se, ah, al, prog, eobrun):
    """Decode one block's contribution from the current scan into ``blk``
    (a zigzag-order int32 view). Returns the updated AC EOB-run counter.
    The four progressive passes follow T.81 Annex G (the refinement
    control flow mirrors the spec's figure G.7 semantics)."""
    if not prog:
        s = reader.decode_symbol(dc_table)
        diff = _extend(reader.read_bits(s), s) if s else 0
        comp["pred"] += diff
        blk[0] = comp["pred"]
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
        return 0
    if ss == 0:  # DC pass (progressive DC scans carry ONLY coefficient 0)
        if ah == 0:  # first: full diff at precision Al
            s = reader.decode_symbol(dc_table)
            diff = _extend(reader.read_bits(s), s) if s else 0
            comp["pred"] += diff
            blk[0] = comp["pred"] << al
        else:  # refinement: one bit per block
            if reader.read_bit():
                blk[0] |= 1 << al
        return eobrun
    if ah == 0:  # AC first pass for the band ss..se
        if eobrun > 0:
            return eobrun - 1  # block is inside an EOB run: all zero
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:  # EOBn: this block ends; 2^r-1+bits more follow
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    return eobrun
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return 0
    # AC refinement pass: walk zero-history positions, appending one
    # correction bit to every already-nonzero coefficient passed over
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_table)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("refine size must be 1")
                newval = p1 if reader.read_bit() else m1
            elif r != 15:  # EOBn: refine the rest of the band below
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            # advance over r still-zero coefficients (16 for ZRL),
            # refining nonzero ones along the way
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break  # reached the target zero coefficient
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB-run blocks still carry correction bits
            if blk[k] != 0:
                if reader.read_bit() and not (blk[k] & p1):
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, qt):
    """Dequantize + batched IDCT every component grid, assemble planes
    (raster block layout: one reshape/transpose, no per-MCU loop),
    upsample chroma, crop, and color-convert."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        q = qt[c["tq"]]
        coeffs = (c["coef"] * q)[:, _UNZIG].reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _A, coeffs, _A, optimize=True)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        bv, bw = c["bv"], c["bw"]
        plane = spatial.reshape(bv, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
            bv * 8, bw * 8
        )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
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
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """H×W (gray) or H×W×3 (RGB) uint8 → JPEG bytes. With the default
    all-ones quantization the decode error is bounded by DCT float
    rounding (a couple of gray levels) — the golden-test property.
    ``restart_interval`` emits DRI + RSTn markers every N MCUs
    (exercises the decoder's resync path). ``progressive=True`` emits a
    spectral-selection SOF2 script — DC scan, then per-component AC
    bands 1-5 and 6-63 with EOB-run coding — so progressive streams can
    be assembled as in-container goldens without a third-party codec
    (successive approximation is decode-only; the JVM ImageIO interop
    tests cover those refinement passes with real libjpeg streams)."""
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
    out += bytes([0xFF, 0xC2 if progressive else 0xC0])
    out += struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, counts, symbols in (
        (0x00, _DC_COUNTS, _DC_SYMBOLS),
        (0x10, _AC_COUNTS, _AC_SYMBOLS),
    ):
        body = bytes([tc_th]) + bytes(counts) + symbols
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # one batched DCT per plane: raster-order zigzag blocks (4:4:4, so
    # raster block order IS MCU order and non-interleaved scan order)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nbv, nbh = ph // 8, pw // 8
    zzblocks = []
    for p in planes:
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blks = padded.reshape(nbv, 8, nbh, 8).transpose(0, 2, 1, 3)
        coeff = np.einsum("ux,nxy,vy->nuv", _A, blks.reshape(-1, 8, 8), _A,
                          optimize=True)
        qz = np.round(coeff / float(quant)).astype(np.int64).reshape(-1, 64)
        zzblocks.append(qz[:, ZIGZAG])

    def sos_header(comp_ids, ss, se):
        sos = bytes([len(comp_ids)])
        sos += b"".join(bytes([cid, 0x00]) for cid in comp_ids)
        sos += bytes([ss, se, 0x00])  # Ah=Al=0
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    if not progressive:
        out += sos_header(list(range(1, nc + 1)), 0, 63)
        out += _write_seq_scan(zzblocks, restart_interval)
    else:
        out += sos_header(list(range(1, nc + 1)), 0, 0)
        out += _write_dc_scan(zzblocks, restart_interval)
        for lo, hi in ((1, 5), (6, 63)):
            for ci in range(nc):
                out += sos_header([ci + 1], lo, hi)
                out += _write_ac_scan(zzblocks[ci], lo, hi, restart_interval)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _write_dc_block(bw, zz, pred, ci):
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    s = _category(diff)
    ln, code = _DC_CODE[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _write_ac_band(bw, zz, lo, hi, eobrun):
    """Emit one block's AC coefficients for the band lo..hi with EOB-run
    accumulation; returns the updated pending EOB-run count."""
    nz = [k for k in range(lo, hi + 1) if zz[k]]
    if not nz:
        eobrun += 1
        if eobrun == 0x7FFF:
            _flush_eobrun(bw, eobrun)
            eobrun = 0
        return eobrun
    eobrun = _flush_eobrun(bw, eobrun)
    run = 0
    for k in range(lo, nz[-1] + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODE[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = _AC_CODE[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] < hi:
        eobrun = 1  # this block's EOB opens a (possibly longer) run
    return eobrun


def _flush_eobrun(bw, eobrun):
    """Emit a pending EOBn symbol (r = floor(log2 n), plus r appended
    bits holding the low bits of n)."""
    if eobrun:
        nbits = eobrun.bit_length() - 1
        ln, code = _AC_CODE[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
    return 0


def _write_seq_scan(zzblocks, restart_interval):
    """Baseline interleaved scan: DC diff + full-spectrum AC per block,
    RSTn every ``restart_interval`` MCUs."""
    out = bytearray()
    bw = _BitWriter()
    pred = [0] * len(zzblocks)
    n = zzblocks[0].shape[0]
    for i in range(n):
        if restart_interval and i and i % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            bw = _BitWriter()
            pred = [0] * len(zzblocks)
        for ci, zzb in enumerate(zzblocks):
            zz = zzb[i]
            _write_dc_block(bw, zz, pred, ci)
            # baseline EOB = EOB-run of exactly 1 (symbol 0x00), flushed
            # per block — runs never span blocks in a sequential scan
            _flush_eobrun(bw, _write_ac_band(bw, zz, 1, 63, 0))
    bw.flush()
    out += bw.out
    return out


def _write_dc_scan(zzblocks, restart_interval):
    """Progressive DC-only scan (Ss=Se=0, Al=0), all components
    interleaved in MCU (= raster, 4:4:4) order."""
    out = bytearray()
    bw = _BitWriter()
    pred = [0] * len(zzblocks)
    n = zzblocks[0].shape[0]
    for i in range(n):
        if restart_interval and i and i % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            bw = _BitWriter()
            pred = [0] * len(zzblocks)
        for ci, zzb in enumerate(zzblocks):
            _write_dc_block(bw, zzb[i], pred, ci)
    bw.flush()
    out += bw.out
    return out


def _write_ac_scan(zzb, lo, hi, restart_interval):
    """Progressive AC band scan (single component, Al=0) with EOB runs
    spanning blocks; runs flush before restart markers and at scan end."""
    out = bytearray()
    bw = _BitWriter()
    eobrun = 0
    for i in range(zzb.shape[0]):
        if restart_interval and i and i % restart_interval == 0:
            eobrun = _flush_eobrun(bw, eobrun)
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            bw = _BitWriter()
        eobrun = _write_ac_band(bw, zzb[i], lo, hi, eobrun)
    _flush_eobrun(bw, eobrun)
    bw.flush()
    out += bw.out
    return out
