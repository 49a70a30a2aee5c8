"""Baseline H.264/AVC intra-frame codec (ITU-T Rec. H.264 / ISO/IEC
14496-10) — the keyframe-sampling slice a video-curation pipeline
actually needs: decode the IDR frames `sample_mp4_frames` already picks
and byte-slices out of 'avc1' tracks, without any native codec library.

Scope (decoder):
  * Annex B NAL stream or raw NAL list (the MP4 length-prefixed form),
    emulation-prevention unescaping
  * SPS/PPS (baseline flags: frame_mbs_only, CAVLC), pic_order_cnt_type
    0/2, frame cropping
  * I slices, single slice group: I_4x4 (all 9 prediction modes),
    I_16x16 (all 4), I_PCM; 8x8 chroma prediction (all 4 modes, 4:2:0)
  * CAVLC residual decoding (coeff_token contexts nC<2/ <4/ <8 / FLC /
    chroma-DC, adaptive level suffix, total_zeros, run_before)
  * dequant + 4x4 inverse integer transform, 4x4 luma-DC and 2x2
    chroma-DC Hadamard paths, per spec 8.5
  * deblocking is NOT implemented; streams must signal
    disable_deblocking_filter_idc == 1 (the sibling encoder always
    does) — others reject rather than silently mis-decode

Scope (encoder — the fixture/golden generator, same stance as the FLAC
tier's encoder): I_4x4 / I_16x16 with SAD mode decision over all
prediction modes, CAVLC, constant QP, even-dimension inputs padded to
macroblock size with spec cropping. The encoder reconstructs through
the DECODER's dequant path, so `decode(encode(x))` equals the encoder's
reconstruction BIT-EXACTLY (asserted in tests), and PSNR vs the source
is bounded by QP as usual.

FIDELITY: no reference H.264 codec exists in this environment (no
ffmpeg/JCodec), so spec conformance is asserted structurally — VLC
prefix-freeness, spec table cross-transcription (h264_tables), syntax
element ordering per clause 7.3, arithmetic per clauses 8.3/8.5 — plus
exhaustive self-roundtrip and corrupt-NAL mutation tests, not against
third-party golden bitstreams. The 4<=nC<8 coeff_token context carries
an explicit codeword-value caveat (see h264_tables._build_vlc2).

Scale shape: per-row map-side work over binary columns (Arrow-batched,
zero shuffle); corrupt blobs reject to the all-NULL row like every
multimodal decoder in this repo.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from apache_pinot_spark.operators.h264_tables import (
    CBP_INTRA_CODENUM_TO_CBP,
    COEFF_TOKEN,
    COEFF_TOKEN_CHROMA_DC,
    DEQUANT_V,
    QUANT_MF,
    RUN_BEFORE,
    TOTAL_ZEROS_4x4,
    TOTAL_ZEROS_CHROMA_DC,
    ZIGZAG_4x4,
)

# ---------------------------------------------------------------------------
# bitstream primitives
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list = []

    def u(self, val: int, n: int) -> None:
        if val < 0 or (n < 64 and val >> n):
            raise ValueError(f"u({n}) cannot hold {val}")
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, val: int) -> None:
        if val < 0:
            raise ValueError("ue(v) needs a non-negative value")
        code = val + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, val: int) -> None:
        self.ue(2 * val - 1 if val > 0 else -2 * val)

    def bitstring(self, s: str) -> None:
        for ch in s:
            self.bits.append(1 if ch == "1" else 0)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        self.align()

    def getvalue(self) -> bytes:
        if len(self.bits) % 8:
            raise ValueError("unaligned bitstream")
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("bitstream exhausted")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("exp-Golomb prefix too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k % 2 else -(k >> 1)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        # true if any bit beyond the position differs from the trailing
        # pattern (a single 1 followed by zeros)
        total = len(self.data) * 8
        if self.pos >= total:
            return False
        # find last 1-bit in the stream
        last_one = -1
        for i in range(len(self.data) - 1, -1, -1):
            if self.data[i]:
                b = self.data[i]
                low = 0
                while not (b >> low) & 1:
                    low += 1
                last_one = i * 8 + (7 - low)
                break
        return self.pos < last_one


def _prefix_decoder(table: dict) -> dict:
    """bitstring -> symbol map for VLC decode."""
    return {code: sym for sym, code in table.items()}


def _read_vlc(r: _BitReader, dec: dict, max_len: int = 16):
    s = ""
    for _ in range(max_len):
        s += "1" if r.u(1) else "0"
        if s in dec:
            return dec[s]
    raise ValueError(f"invalid VLC code {s!r}")


_CT_DEC = tuple(_prefix_decoder(t) for t in COEFF_TOKEN)
_CT_CHROMA_DEC = _prefix_decoder(COEFF_TOKEN_CHROMA_DC)
_TZ_DEC = {tc: _prefix_decoder(dict(enumerate(codes)))
           for tc, codes in TOTAL_ZEROS_4x4.items()}
_TZC_DEC = {tc: _prefix_decoder(dict(enumerate(codes)))
            for tc, codes in TOTAL_ZEROS_CHROMA_DC.items()}
_RB_DEC = {zl: _prefix_decoder(dict(enumerate(codes)))
           for zl, codes in RUN_BEFORE.items()}
_CBP_TO_CODENUM = {cbp: i for i, cbp in enumerate(CBP_INTRA_CODENUM_TO_CBP)}

# ---------------------------------------------------------------------------
# NAL framing (Annex B) + RBSP escaping
# ---------------------------------------------------------------------------


def _escape_rbsp(raw: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_rbsp(data: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def parse_annexb(blob: bytes):
    """Yield (nal_ref_idc, nal_unit_type, rbsp) for each NAL in an
    Annex B byte stream (3- or 4-byte start codes)."""
    i = 0
    n = len(blob)
    starts = []
    while i + 3 <= n:
        if blob[i] == 0 and blob[i + 1] == 0 and blob[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex B start codes")
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else n
        # a 4-byte start code leaves one stray zero before the next code
        while e > s and blob[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        if e <= s:
            raise ValueError("empty NAL unit")
        hdr = blob[s]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        yield (hdr >> 5) & 3, hdr & 0x1F, _unescape_rbsp(blob[s + 1 : e])


def _nal(ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + \
        _escape_rbsp(rbsp)


# ---------------------------------------------------------------------------
# parameter sets
# ---------------------------------------------------------------------------


@dataclass
class SPS:
    profile_idc: int = 66
    level_idc: int = 20
    sps_id: int = 0
    log2_max_frame_num: int = 4
    poc_type: int = 2
    log2_max_poc_lsb: int = 4
    width_mbs: int = 0
    height_mbs: int = 0
    crop_right: int = 0  # in 2-sample units (4:2:0)
    crop_bottom: int = 0

    @property
    def width(self) -> int:
        return self.width_mbs * 16 - 2 * self.crop_right

    @property
    def height(self) -> int:
        return self.height_mbs * 16 - 2 * self.crop_bottom


@dataclass
class PPS:
    pps_id: int = 0
    sps_id: int = 0
    pic_init_qp: int = 26
    deblocking_control: bool = True
    chroma_qp_offset: int = 0


def _write_sps(s: SPS) -> bytes:
    w = _BitWriter()
    w.u(s.profile_idc, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(s.level_idc, 8)
    w.ue(s.sps_id)
    w.ue(s.log2_max_frame_num - 4)
    w.ue(s.poc_type)
    if s.poc_type == 0:
        w.ue(s.log2_max_poc_lsb - 4)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed
    w.ue(s.width_mbs - 1)
    w.ue(s.height_mbs - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop = 1 if (s.crop_right or s.crop_bottom) else 0
    w.u(crop, 1)
    if crop:
        w.ue(0)
        w.ue(s.crop_right)
        w.ue(0)
        w.ue(s.crop_bottom)
    w.u(0, 1)  # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def parse_sps(rbsp: bytes) -> SPS:
    r = _BitReader(rbsp)
    s = SPS()
    s.profile_idc = r.u(8)
    r.u(8)
    s.level_idc = r.u(8)
    s.sps_id = r.ue()
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise ValueError("high-profile SPS not supported (baseline codec)")
    s.log2_max_frame_num = r.ue() + 4
    s.poc_type = r.ue()
    if s.poc_type == 0:
        s.log2_max_poc_lsb = r.ue() + 4
    elif s.poc_type == 1:
        raise ValueError("pic_order_cnt_type 1 not supported")
    r.ue()  # max_num_ref_frames
    r.u(1)
    s.width_mbs = r.ue() + 1
    s.height_mbs = r.ue() + 1
    if r.u(1) != 1:
        raise ValueError("interlaced streams not supported")
    r.u(1)
    if r.u(1):  # cropping
        left = r.ue()
        s.crop_right = r.ue()
        top = r.ue()
        s.crop_bottom = r.ue()
        if left or top:
            raise ValueError("left/top cropping not supported")
    return s


def _write_pps(p: PPS) -> bytes:
    w = _BitWriter()
    w.ue(p.pps_id)
    w.ue(p.sps_id)
    w.u(0, 1)  # entropy_coding_mode_flag = CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(p.pic_init_qp - 26)
    w.se(0)  # pic_init_qs
    w.se(p.chroma_qp_offset)
    w.u(1 if p.deblocking_control else 0, 1)
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def parse_pps(rbsp: bytes) -> PPS:
    r = _BitReader(rbsp)
    p = PPS()
    p.pps_id = r.ue()
    p.sps_id = r.ue()
    if r.u(1) != 0:
        raise ValueError("CABAC streams not supported (CAVLC codec)")
    r.u(1)
    if r.ue() != 0:
        raise ValueError("slice groups not supported")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    p.pic_init_qp = 26 + r.se()
    r.se()
    p.chroma_qp_offset = r.se()
    p.deblocking_control = bool(r.u(1))
    if r.u(1):
        raise ValueError("constrained_intra_pred not supported")
    r.u(1)
    return p


# ---------------------------------------------------------------------------
# transforms + quantization (spec 8.5; flat scaling matrices)
# ---------------------------------------------------------------------------

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
               dtype=np.int64)
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
               dtype=np.int64)
_H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)

#: position class per (i, j): 0 for corners-of-even grid, 1 for odd-odd,
#: 2 for the rest — indexes DEQUANT_V / QUANT_MF
_POS_CLS = np.array([[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]],
                    dtype=np.int64)

#: QPc mapping table for qPi in 30..51 (below 30: identity)
_QPC_TAB = (29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38,
            38, 38, 39, 39, 39, 39)


def _chroma_qp(qp: int, offset: int = 0) -> int:
    qpi = max(0, min(51, qp + offset))
    return qpi if qpi < 30 else _QPC_TAB[qpi - 30]


def _forward4(x: np.ndarray) -> np.ndarray:
    return _CF @ x.astype(np.int64) @ _CF.T


def _inverse4(d: np.ndarray) -> np.ndarray:
    """Spec 8.5.12.2 inverse core transform (without the final >>6)."""
    d = d.astype(np.int64)
    # horizontal
    e = np.empty_like(d)
    e[:, 0] = d[:, 0] + d[:, 2]
    e[:, 1] = d[:, 0] - d[:, 2]
    e[:, 2] = (d[:, 1] >> 1) - d[:, 3]
    e[:, 3] = d[:, 1] + (d[:, 3] >> 1)
    f = np.empty_like(d)
    f[:, 0] = e[:, 0] + e[:, 3]
    f[:, 1] = e[:, 1] + e[:, 2]
    f[:, 2] = e[:, 1] - e[:, 2]
    f[:, 3] = e[:, 0] - e[:, 3]
    # vertical
    g = np.empty_like(d)
    g[0, :] = f[0, :] + f[2, :]
    g[1, :] = f[0, :] - f[2, :]
    g[2, :] = (f[1, :] >> 1) - f[3, :]
    g[3, :] = f[1, :] + (f[3, :] >> 1)
    h = np.empty_like(d)
    h[0, :] = g[0, :] + g[3, :]
    h[1, :] = g[1, :] + g[2, :]
    h[2, :] = g[1, :] - g[2, :]
    h[3, :] = g[0, :] - g[3, :]
    return h


def _dequant4(c: np.ndarray, qp: int, skip_dc: bool = False) -> np.ndarray:
    v = np.array(DEQUANT_V[qp % 6], dtype=np.int64)[_POS_CLS]
    d = c.astype(np.int64) * v << (qp // 6)
    if skip_dc:
        d[0, 0] = 0
    return d


def _quant4(w: np.ndarray, qp: int, skip_dc: bool = False) -> np.ndarray:
    mf = np.array(QUANT_MF[qp % 6], dtype=np.int64)[_POS_CLS]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3  # intra rounding
    lv = np.sign(w) * ((np.abs(w) * mf + f) >> qbits)
    if skip_dc:
        lv[0, 0] = 0
    return lv.astype(np.int64)


def _recon_block(pred: np.ndarray, d: np.ndarray) -> np.ndarray:
    r = (_inverse4(d) + 32) >> 6
    return np.clip(pred.astype(np.int64) + r, 0, 255).astype(np.uint8)


def _dequant_luma_dc(c: np.ndarray, qp: int) -> np.ndarray:
    """Inverse 4x4 Hadamard + DC scaling. The shift base pairs the DC
    path's effective quantization step with the AC path's (the design
    constraint the spec's 8.5.10 formulas satisfy): a flat macroblock
    reconstructs identically through either path — asserted by the
    flat-content roundtrip tests at low QP."""
    f = _H4 @ c.astype(np.int64) @ _H4
    ls = DEQUANT_V[qp % 6][0]
    if qp >= 12:
        return (f * ls) << (qp // 6 - 2)
    return (f * ls + (1 << (1 - qp // 6))) >> (2 - qp // 6)


def _dequant_chroma_dc(c: np.ndarray, qp: int) -> np.ndarray:
    """Inverse 2x2 Hadamard + DC scaling, AC-step-paired as above."""
    f = _H2 @ c.astype(np.int64) @ _H2
    return ((f * DEQUANT_V[qp % 6][0]) << (qp // 6)) >> 1


def _quant_luma_dc(dc: np.ndarray, qp: int) -> np.ndarray:
    w = (_H4 @ dc.astype(np.int64) @ _H4) >> 1
    mf = QUANT_MF[qp % 6][0]
    qbits = 16 + qp // 6
    f = (1 << qbits) // 3
    return (np.sign(w) * ((np.abs(w) * mf + f) >> qbits)).astype(np.int64)


def _quant_chroma_dc(dc: np.ndarray, qp: int) -> np.ndarray:
    w = _H2 @ dc.astype(np.int64) @ _H2
    mf = QUANT_MF[qp % 6][0]
    qbits = 16 + qp // 6
    f = (1 << qbits) // 3
    return (np.sign(w) * ((np.abs(w) * mf + f) >> qbits)).astype(np.int64)


# ---------------------------------------------------------------------------
# intra prediction (spec 8.3) — shared by encoder and decoder, driven by
# the reconstruction plane and a 4x4-granular decoded map
# ---------------------------------------------------------------------------


def _pred4x4(plane, dec, bx, by, mode):
    nby, nbx = dec.shape
    x, y = bx * 4, by * 4
    left_av = bx > 0 and dec[by, bx - 1]
    up_av = by > 0 and dec[by - 1, bx]
    ul_av = bx > 0 and by > 0 and dec[by - 1, bx - 1]
    ur_av = by > 0 and bx + 1 < nbx and dec[by - 1, bx + 1]
    left = plane[y : y + 4, x - 1].astype(np.int64) if left_av else None
    up = plane[y - 1, x : x + 4].astype(np.int64) if up_av else None
    ul = int(plane[y - 1, x - 1]) if ul_av else None
    if up_av:
        ur = (plane[y - 1, x + 4 : x + 8].astype(np.int64)
              if ur_av else np.full(4, up[3], dtype=np.int64))
        if ur_av and len(ur) < 4:  # picture edge truncation
            ur = np.concatenate([ur, np.full(4 - len(ur), ur[-1] if len(ur)
                                             else up[3], dtype=np.int64)])
    else:
        ur = None
    p = np.zeros((4, 4), dtype=np.int64)
    if mode == 0:  # vertical
        if not up_av:
            raise ValueError("mode 0 needs the up neighbor")
        p[:, :] = up[None, :]
    elif mode == 1:  # horizontal
        if not left_av:
            raise ValueError("mode 1 needs the left neighbor")
        p[:, :] = left[:, None]
    elif mode == 2:  # DC
        if up_av and left_av:
            p[:, :] = (int(up.sum()) + int(left.sum()) + 4) >> 3
        elif up_av:
            p[:, :] = (int(up.sum()) + 2) >> 2
        elif left_av:
            p[:, :] = (int(left.sum()) + 2) >> 2
        else:
            p[:, :] = 128
    elif mode == 3:  # diagonal down-left
        if not up_av:
            raise ValueError("mode 3 needs the up neighbor")
        t = np.concatenate([up, ur])
        for yy in range(4):
            for xx in range(4):
                if xx == 3 and yy == 3:
                    p[yy, xx] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    k = xx + yy
                    p[yy, xx] = (t[k] + 2 * t[k + 1] + t[k + 2] + 2) >> 2
    elif mode == 4:  # diagonal down-right
        if not (up_av and left_av and ul_av):
            raise ValueError("mode 4 needs up+left+corner")
        for yy in range(4):
            for xx in range(4):
                if xx > yy:
                    k = xx - yy
                    a = ul if k - 2 < 0 else up[k - 2]
                    b = ul if k - 1 < 0 else up[k - 1]
                    p[yy, xx] = (a + 2 * b + up[k] + 2) >> 2
                elif xx < yy:
                    k = yy - xx
                    a = ul if k - 2 < 0 else left[k - 2]
                    b = ul if k - 1 < 0 else left[k - 1]
                    p[yy, xx] = (a + 2 * b + left[k] + 2) >> 2
                else:
                    p[yy, xx] = (up[0] + 2 * ul + left[0] + 2) >> 2
    elif mode == 5:  # vertical-right
        if not (up_av and left_av and ul_av):
            raise ValueError("mode 5 needs up+left+corner")
        t = np.concatenate([[ul], up])  # t[0]=p[-1,-1], t[1+i]=p[i,-1]
        for yy in range(4):
            for xx in range(4):
                z = 2 * xx - yy
                if z >= 0 and z % 2 == 0:
                    k = xx - (yy >> 1)
                    p[yy, xx] = (t[k] + t[k + 1] + 1) >> 1
                elif z >= 0:
                    k = xx - (yy >> 1)
                    p[yy, xx] = (t[k - 1] + 2 * t[k] + t[k + 1] + 2) >> 2
                elif z == -1:
                    p[yy, xx] = (left[0] + 2 * ul + up[0] + 2) >> 2
                else:
                    p[yy, xx] = (left[yy - 1] + 2 * left[yy - 2]
                                 + (left[yy - 3] if yy - 3 >= 0 else ul)
                                 + 2) >> 2
    elif mode == 6:  # horizontal-down
        if not (up_av and left_av and ul_av):
            raise ValueError("mode 6 needs up+left+corner")
        t = np.concatenate([[ul], left])
        for yy in range(4):
            for xx in range(4):
                z = 2 * yy - xx
                if z >= 0 and z % 2 == 0:
                    k = yy - (xx >> 1)
                    p[yy, xx] = (t[k] + t[k + 1] + 1) >> 1
                elif z >= 0:
                    k = yy - (xx >> 1)
                    p[yy, xx] = (t[k - 1] + 2 * t[k] + t[k + 1] + 2) >> 2
                elif z == -1:
                    p[yy, xx] = (left[0] + 2 * ul + up[0] + 2) >> 2
                else:
                    p[yy, xx] = (up[xx - 1] + 2 * up[xx - 2]
                                 + (up[xx - 3] if xx - 3 >= 0 else ul)
                                 + 2) >> 2
    elif mode == 7:  # vertical-left
        if not up_av:
            raise ValueError("mode 7 needs the up neighbor")
        t = np.concatenate([up, ur])
        for yy in range(4):
            for xx in range(4):
                k = xx + (yy >> 1)
                if yy % 2 == 0:
                    p[yy, xx] = (t[k] + t[k + 1] + 1) >> 1
                else:
                    p[yy, xx] = (t[k] + 2 * t[k + 1] + t[k + 2] + 2) >> 2
    elif mode == 8:  # horizontal-up
        if not left_av:
            raise ValueError("mode 8 needs the left neighbor")
        for yy in range(4):
            for xx in range(4):
                z = xx + 2 * yy
                if z > 5:
                    p[yy, xx] = left[3]
                elif z == 5:
                    p[yy, xx] = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    k = z >> 1
                    p[yy, xx] = (left[k] + left[k + 1] + 1) >> 1
                else:
                    k = (z - 1) >> 1
                    p[yy, xx] = (left[k] + 2 * left[k + 1] + left[k + 2]
                                 + 2) >> 2
    else:
        raise ValueError(f"bad intra4x4 mode {mode}")
    return p


def _avail_modes4(dec, bx, by):
    nby, nbx = dec.shape
    left = bx > 0 and dec[by, bx - 1]
    up = by > 0 and dec[by - 1, bx]
    ul = bx > 0 and by > 0 and dec[by - 1, bx - 1]
    modes = [2]
    if up:
        modes += [0, 3, 7]
    if left:
        modes += [1, 8]
    if up and left and ul:
        modes += [4, 5, 6]
    return modes


def _pred16(plane, mx, my, mode, mb_w, mb_h):
    x, y = mx * 16, my * 16
    left_av, up_av = mx > 0, my > 0
    left = plane[y : y + 16, x - 1].astype(np.int64) if left_av else None
    up = plane[y - 1, x : x + 16].astype(np.int64) if up_av else None
    p = np.zeros((16, 16), dtype=np.int64)
    if mode == 0:
        if not up_av:
            raise ValueError("16x16 vertical needs up")
        p[:, :] = up[None, :]
    elif mode == 1:
        if not left_av:
            raise ValueError("16x16 horizontal needs left")
        p[:, :] = left[:, None]
    elif mode == 2:
        if up_av and left_av:
            p[:, :] = (int(up.sum()) + int(left.sum()) + 16) >> 5
        elif up_av:
            p[:, :] = (int(up.sum()) + 8) >> 4
        elif left_av:
            p[:, :] = (int(left.sum()) + 8) >> 4
        else:
            p[:, :] = 128
    elif mode == 3:
        if not (up_av and left_av):
            raise ValueError("16x16 plane needs up+left")
        ul = int(plane[y - 1, x - 1])
        hsum = sum((i + 1) * (int(up[8 + i]) - (int(up[6 - i]) if 6 - i >= 0
                                                else ul)) for i in range(8))
        vsum = sum((i + 1) * (int(left[8 + i]) - (int(left[6 - i]) if 6 - i
                                                  >= 0 else ul))
                   for i in range(8))
        a = 16 * (int(left[15]) + int(up[15]))
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
        xs = np.arange(16, dtype=np.int64)
        p = np.clip((a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16)
                    >> 5, 0, 255)
    else:
        raise ValueError(f"bad intra16x16 mode {mode}")
    return p


def _pred_chroma(plane, mx, my, mode):
    x, y = mx * 8, my * 8
    left_av, up_av = mx > 0, my > 0
    left = plane[y : y + 8, x - 1].astype(np.int64) if left_av else None
    up = plane[y - 1, x : x + 8].astype(np.int64) if up_av else None
    p = np.zeros((8, 8), dtype=np.int64)
    if mode == 0:  # DC, per 4x4 quadrant
        for qy in (0, 4):
            for qx in (0, 4):
                u = up[qx : qx + 4] if up_av else None
                le = left[qy : qy + 4] if left_av else None
                if qx == 0 and qy == 0 or qx == 4 and qy == 4:
                    if up_av and left_av:
                        v = (int(u.sum()) + int(le.sum()) + 4) >> 3
                    elif up_av:
                        v = (int(u.sum()) + 2) >> 2
                    elif left_av:
                        v = (int(le.sum()) + 2) >> 2
                    else:
                        v = 128
                elif qx == 4 and qy == 0:
                    if up_av:
                        v = (int(u.sum()) + 2) >> 2
                    elif left_av:
                        v = (int(le.sum()) + 2) >> 2
                    else:
                        v = 128
                else:  # qx == 0, qy == 4
                    if left_av:
                        v = (int(le.sum()) + 2) >> 2
                    elif up_av:
                        v = (int(u.sum()) + 2) >> 2
                    else:
                        v = 128
                p[qy : qy + 4, qx : qx + 4] = v
    elif mode == 1:  # horizontal
        if not left_av:
            raise ValueError("chroma horizontal needs left")
        p[:, :] = left[:, None]
    elif mode == 2:  # vertical
        if not up_av:
            raise ValueError("chroma vertical needs up")
        p[:, :] = up[None, :]
    elif mode == 3:  # plane
        if not (up_av and left_av):
            raise ValueError("chroma plane needs up+left")
        ul = int(plane[y - 1, x - 1])
        hsum = sum((i + 1) * (int(up[4 + i]) - (int(up[2 - i]) if 2 - i >= 0
                                                else ul)) for i in range(4))
        vsum = sum((i + 1) * (int(left[4 + i]) - (int(left[2 - i]) if 2 - i
                                                  >= 0 else ul))
                   for i in range(4))
        a = 16 * (int(left[7]) + int(up[7]))
        b = (17 * hsum + 16) >> 5
        c = (17 * vsum + 16) >> 5
        xs = np.arange(8, dtype=np.int64)
        p = np.clip((a + b * (xs[None, :] - 3) + c * (xs[:, None] - 3) + 16)
                    >> 5, 0, 255)
    else:
        raise ValueError(f"bad chroma mode {mode}")
    return p


def _chroma_modes_avail(mx, my):
    modes = [0]
    if mx > 0:
        modes.append(1)
    if my > 0:
        modes.append(2)
    if mx > 0 and my > 0:
        modes.append(3)
    return modes


# ---------------------------------------------------------------------------
# CAVLC residual block coding (spec 9.2)
# ---------------------------------------------------------------------------


def _nc_for(nnz, bx, by):
    """nC from the 4x4-granular TotalCoeff map (-1 entries mean
    unavailable/outside)."""
    na = nnz[by, bx - 1] if bx > 0 else -1
    nb = nnz[by - 1, bx] if by > 0 else -1
    if na >= 0 and nb >= 0:
        return (na + nb + 1) >> 1
    if na >= 0:
        return int(na)
    if nb >= 0:
        return int(nb)
    return 0


def _decode_residual(r: _BitReader, nC: int, max_coeff: int):
    """Scan-order coefficient list (len max_coeff) + TotalCoeff."""
    if nC == -1:
        t1, tc = _read_vlc(r, _CT_CHROMA_DEC, 8)
    elif nC < 2:
        t1, tc = _read_vlc(r, _CT_DEC[0])
    elif nC < 4:
        t1, tc = _read_vlc(r, _CT_DEC[1])
    elif nC < 8:
        t1, tc = _read_vlc(r, _CT_DEC[2], 10)
    else:
        code = r.u(6)
        if code == 3:
            t1, tc = 0, 0
        else:
            t1, tc = code & 3, (code >> 2) + 1
    coeffs = [0] * max_coeff
    if tc == 0:
        return coeffs, 0
    if tc > max_coeff:
        raise ValueError("TotalCoeff exceeds block size")
    levels = []
    suffix_length = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(tc):
        if i < t1:
            levels.append(1 - 2 * r.u(1))
            continue
        level_prefix = 0
        while r.u(1) == 0:
            level_prefix += 1
            if level_prefix > 32:
                raise ValueError("level_prefix too long")
        size = suffix_length
        if level_prefix == 14 and suffix_length == 0:
            size = 4
        elif level_prefix >= 15:
            size = level_prefix - 3
        suffix = r.u(size) if size else 0
        code = (min(15, level_prefix) << suffix_length) + suffix
        if level_prefix >= 15 and suffix_length == 0:
            code += 15
        if level_prefix >= 16:
            code += (1 << (level_prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(int(level))
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    if tc < max_coeff:
        if max_coeff == 4:  # chroma DC
            total_zeros = _read_vlc(r, _TZC_DEC[tc], 4)
        else:
            total_zeros = _read_vlc(r, _TZ_DEC[tc], 10)
    else:
        total_zeros = 0
    zeros_left = total_zeros
    idx = tc + total_zeros - 1
    if idx >= max_coeff:
        raise ValueError("total_zeros overruns block")
    for i, lv in enumerate(levels):
        coeffs[idx] = lv
        if i == tc - 1:
            break
        if zeros_left > 0:
            run = _read_vlc(r, _RB_DEC[min(zeros_left, 7)], 11)
            if run > zeros_left:
                raise ValueError("run_before exceeds zeros_left")
        else:
            run = 0
        zeros_left -= run
        idx -= 1 + run
    return coeffs, tc


def _encode_residual(w: _BitWriter, coeffs, nC: int, max_coeff: int) -> int:
    """Encode scan-order coeffs; returns TotalCoeff (for the nnz map)."""
    coeffs = list(coeffs)
    assert len(coeffs) == max_coeff
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    # trailing ones: up to 3 |1| values at the high-frequency end
    t1 = 0
    for i in range(tc - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    if nC == -1:
        tab = COEFF_TOKEN_CHROMA_DC
        if (t1, tc) not in tab:
            raise ValueError("chroma DC coeff_token out of range")
        w.bitstring(tab[(t1, tc)])
    elif nC < 8:
        tab = COEFF_TOKEN[0 if nC < 2 else (1 if nC < 4 else 2)]
        w.bitstring(tab[(t1, tc)])
    else:
        w.u(3 if tc == 0 else ((tc - 1) << 2) | t1, 6)
    if tc == 0:
        return 0
    suffix_length = 1 if (tc > 10 and t1 < 3) else 0
    for k in range(tc):
        i = tc - 1 - k  # highest frequency first
        level = nz[i][1]
        if k < t1:
            w.u(0 if level > 0 else 1, 1)
            continue
        code = 2 * abs(level) - 2 if level > 0 else 2 * abs(level) - 1
        if k == t1 and t1 < 3:
            code -= 2
        if suffix_length == 0 and code < 14:
            w.u(0, code)
            w.u(1, 1)
        elif suffix_length == 0 and code < 30:
            w.u(0, 14)
            w.u(1, 1)
            w.u(code - 14, 4)
        elif suffix_length > 0 and (code >> suffix_length) < 15:
            w.u(0, code >> suffix_length)
            w.u(1, 1)
            w.u(code & ((1 << suffix_length) - 1), suffix_length)
        else:
            # escape: level_prefix >= 15 with a (prefix-3)-bit suffix;
            # contiguous windows per prefix (mirrors the decoder's
            # prefix>=16 accumulation), so any level is representable
            base = (15 << suffix_length) + (15 if suffix_length == 0 else 0)
            p = 15
            while code >= base + (1 << (p - 3)) - 4096 + (1 << (p - 3)):
                p += 1
                if p > 32:
                    raise ValueError("level out of any escape window")
            suffix = code - (base + (1 << (p - 3)) - 4096)
            w.u(0, p)
            w.u(1, 1)
            w.u(suffix, p - 3)
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    last_nz = nz[-1][0]
    total_zeros = last_nz + 1 - tc
    if tc < max_coeff:
        if max_coeff == 4:
            w.bitstring(TOTAL_ZEROS_CHROMA_DC[tc][total_zeros])
        else:
            w.bitstring(TOTAL_ZEROS_4x4[tc][total_zeros])
    zeros_left = total_zeros
    for k in range(tc - 1, 0, -1):  # from highest freq, skip the last
        run = nz[k][0] - nz[k - 1][0] - 1
        if zeros_left > 0:
            w.bitstring(RUN_BEFORE[min(zeros_left, 7)][run])
        zeros_left -= run
    return tc


def _zig_to_block(coeffs, skip_dc: bool = False) -> np.ndarray:
    b = np.zeros((4, 4), dtype=np.int64)
    if skip_dc:
        for k, v in enumerate(coeffs):
            r, c = ZIGZAG_4x4[k + 1]
            b[r, c] = v
    else:
        for k, v in enumerate(coeffs):
            r, c = ZIGZAG_4x4[k]
            b[r, c] = v
    return b


def _block_to_zig(b: np.ndarray, skip_dc: bool = False):
    if skip_dc:
        return [int(b[r, c]) for r, c in ZIGZAG_4x4[1:]]
    return [int(b[r, c]) for r, c in ZIGZAG_4x4]


#: luma4x4BlkIdx -> (x4, y4) within the macroblock
_BLK_XY = tuple(((blk >> 2 & 1) * 2 + (blk & 1), (blk >> 3) * 2
                 + (blk >> 1 & 1)) for blk in range(16))


# ---------------------------------------------------------------------------
# slice decode
# ---------------------------------------------------------------------------


class _Picture:
    def __init__(self, sps: SPS):
        self.sps = sps
        w, h = sps.width_mbs * 16, sps.height_mbs * 16
        self.y = np.zeros((h, w), dtype=np.uint8)
        self.cb = np.zeros((h // 2, w // 2), dtype=np.uint8)
        self.cr = np.zeros((h // 2, w // 2), dtype=np.uint8)
        nbx, nby = sps.width_mbs * 4, sps.height_mbs * 4
        self.dec = np.zeros((nby, nbx), dtype=bool)  # luma 4x4 decoded map
        self.nnz_y = np.full((nby, nbx), -1, dtype=np.int64)
        cbx, cby = sps.width_mbs * 2, sps.height_mbs * 2
        self.nnz_cb = np.full((cby, cbx), -1, dtype=np.int64)
        self.nnz_cr = np.full((cby, cbx), -1, dtype=np.int64)
        # per-4x4 intra prediction mode (2 = DC for non-I4x4 MBs)
        self.modes = np.full((nby, nbx), -1, dtype=np.int64)


def _pred_mode4(pic: _Picture, bx, by):
    """predIntra4x4PredMode: min(left, up), DC (2) when unavailable."""
    ma = pic.modes[by, bx - 1] if bx > 0 else -1
    mb = pic.modes[by - 1, bx] if by > 0 else -1
    if ma < 0 or mb < 0:
        return 2
    return int(min(ma, mb))


def _decode_slice(r: _BitReader, sps: SPS, pps: PPS, pic: _Picture) -> None:
    first_mb = r.ue()
    if first_mb != 0:
        raise ValueError("multi-slice streams not supported")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise ValueError("only I slices supported")
    r.ue()  # pps id
    r.u(sps.log2_max_frame_num)  # frame_num
    r.ue()  # idr_pic_id
    if sps.poc_type == 0:
        r.u(sps.log2_max_poc_lsb)
    # dec_ref_pic_marking (IDR, nal_ref_idc > 0)
    r.u(1)
    r.u(1)
    qp = pps.pic_init_qp + r.se()
    if pps.deblocking_control:
        if r.ue() != 1:
            raise ValueError(
                "deblocking not implemented: streams must set "
                "disable_deblocking_filter_idc == 1")
    n_mbs = sps.width_mbs * sps.height_mbs
    for mb in range(n_mbs):
        qp = _decode_mb(r, sps, pps, pic, mb, qp)


def _decode_mb(r, sps: SPS, pps: PPS, pic: _Picture, mb: int, qp: int) -> int:
    mx, my = mb % sps.width_mbs, mb // sps.width_mbs
    bx0, by0 = mx * 4, my * 4
    mb_type = r.ue()
    if mb_type > 25:
        raise ValueError(f"bad I-slice mb_type {mb_type}")
    if mb_type == 25:  # I_PCM
        r.align()
        y = np.frombuffer(bytes(r.u(8) for _ in range(256)),
                          dtype=np.uint8).reshape(16, 16)
        cb = np.frombuffer(bytes(r.u(8) for _ in range(64)),
                           dtype=np.uint8).reshape(8, 8)
        cr = np.frombuffer(bytes(r.u(8) for _ in range(64)),
                           dtype=np.uint8).reshape(8, 8)
        pic.y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = y
        pic.cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = cb
        pic.cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = cr
        pic.dec[by0 : by0 + 4, bx0 : bx0 + 4] = True
        pic.nnz_y[by0 : by0 + 4, bx0 : bx0 + 4] = 16
        pic.nnz_cb[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
        pic.nnz_cr[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
        pic.modes[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        return qp
    if mb_type == 0:  # I_4x4
        modes = []
        for blk in range(16):
            x4, y4 = _BLK_XY[blk]
            pred = _pred_mode4(pic, bx0 + x4, by0 + y4)
            if r.u(1):
                mode = pred
            else:
                rem = r.u(3)
                mode = rem if rem < pred else rem + 1
            modes.append(mode)
            # provisional: the mode map must be filled in block order so
            # later blocks in THIS mb predict from it
            pic.modes[by0 + y4, bx0 + x4] = mode
        chroma_mode = r.ue()
        cbp = CBP_INTRA_CODENUM_TO_CBP[r.ue()]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qp = _apply_qp_delta(r, qp)
        # luma blocks: predict + residual, sequentially
        for blk in range(16):
            x4, y4 = _BLK_XY[blk]
            bx, by = bx0 + x4, by0 + y4
            if cbp_luma & (1 << (blk >> 2)):
                nC = _nc_for(pic.nnz_y, bx, by)
                coeffs, tc = _decode_residual(r, nC, 16)
            else:
                coeffs, tc = [0] * 16, 0
            pred = _pred4x4(pic.y, pic.dec, bx, by, modes[blk])
            d = _dequant4(_zig_to_block(coeffs), qp)
            pic.y[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = \
                _recon_block(pred, d)
            pic.dec[by, bx] = True
            pic.nnz_y[by, bx] = tc
    else:  # I_16x16
        m = mb_type - 1
        pred_mode = m % 4
        cbp_chroma = (m // 4) % 3
        cbp_luma = 15 if m >= 12 else 0
        chroma_mode = r.ue()
        qp = _apply_qp_delta(r, qp)
        pred = _pred16(pic.y, mx, my, pred_mode, sps.width_mbs,
                       sps.height_mbs)
        # DC block (nC as for luma4x4BlkIdx 0)
        nC = _nc_for(pic.nnz_y, bx0, by0)
        dc_coeffs, _ = _decode_residual(r, nC, 16)
        dc = _dequant_luma_dc(_zig_to_block(dc_coeffs), qp)
        for blk in range(16):
            x4, y4 = _BLK_XY[blk]
            bx, by = bx0 + x4, by0 + y4
            if cbp_luma:
                nC = _nc_for(pic.nnz_y, bx, by)
                coeffs, tc = _decode_residual(r, nC, 15)
            else:
                coeffs, tc = [0] * 15, 0
            d = _dequant4(_zig_to_block(coeffs, skip_dc=True), qp,
                          skip_dc=True)
            d[0, 0] = dc[y4, x4]
            blk_pred = pred[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4]
            pic.y[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = \
                _recon_block(blk_pred, d)
            pic.dec[by, bx] = True
            pic.nnz_y[by, bx] = tc
        pic.modes[by0 : by0 + 4, bx0 : bx0 + 4] = 2
    # chroma (shared by I_4x4 / I_16x16)
    _decode_chroma(r, pps, pic, mx, my, chroma_mode, cbp_chroma, qp)
    return qp


def _apply_qp_delta(r, qp: int) -> int:
    qp = qp + r.se()
    if not 0 <= qp <= 51:
        raise ValueError("mb_qp_delta drives QP out of range")
    return qp


def _decode_chroma(r, pps, pic, mx, my, chroma_mode, cbp_chroma, qp):
    """Residual order per 7.3.5.3.3: ChromaDCLevel Cb then Cr, then
    ChromaACLevel for Cb's four 4x4s then Cr's; reconstruction after all
    parsing (chroma prediction uses only neighbor MBs)."""
    qpc = _chroma_qp(qp, pps.chroma_qp_offset)
    cx0, cy0 = mx * 2, my * 2  # chroma 4x4-block origin
    dcs = []
    for _ in range(2):  # Cb, Cr
        if cbp_chroma:
            dc_coeffs, _ = _decode_residual(r, -1, 4)
        else:
            dc_coeffs = [0, 0, 0, 0]
        dcs.append(dc_coeffs)
    acs = [[None] * 4, [None] * 4]
    for ci, nnz in enumerate((pic.nnz_cb, pic.nnz_cr)):
        for blk in range(4):  # raster within the 8x8
            bx, by = cx0 + (blk & 1), cy0 + (blk >> 1)
            if cbp_chroma == 2:
                nC = _nc_for(nnz, bx, by)
                coeffs, tc = _decode_residual(r, nC, 15)
            else:
                coeffs, tc = [0] * 15, 0
            acs[ci][blk] = coeffs
            nnz[by, bx] = tc
    for ci, plane in enumerate((pic.cb, pic.cr)):
        pred = _pred_chroma(plane, mx, my, chroma_mode)
        dc = _dequant_chroma_dc(
            np.array(dcs[ci], dtype=np.int64).reshape(2, 2), qpc)
        for blk in range(4):
            x4, y4 = blk & 1, blk >> 1
            d = _dequant4(_zig_to_block(acs[ci][blk], skip_dc=True), qpc,
                          skip_dc=True)
            d[0, 0] = dc[y4, x4]
            blk_pred = pred[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4]
            plane[my * 8 + y4 * 4 : my * 8 + y4 * 4 + 4,
                  mx * 8 + x4 * 4 : mx * 8 + x4 * 4 + 4] = \
                _recon_block(blk_pred, d)


def decode_h264_nals(nals) -> tuple:
    """Decode a decoded-order list of (nal_ref_idc, nal_unit_type, rbsp)
    triples holding SPS + PPS + one IDR slice → (y, cb, cr) uint8
    planes, cropped. The MP4 path feeds this from avcC + the sample's
    length-prefixed NALs; Annex B callers use decode_h264_annexb."""
    sps = pps = None
    pic = None
    for ref_idc, ntype, rbsp in nals:
        if ntype == 7:
            sps = parse_sps(rbsp)
        elif ntype == 8:
            pps = parse_pps(rbsp)
        elif ntype in (1, 5):
            if ntype == 1:
                raise ValueError("non-IDR slices not supported (intra codec)")
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            if pps.sps_id != sps.sps_id:
                raise ValueError("PPS references an unknown SPS")
            pic = _Picture(sps)
            _decode_slice(_BitReader(rbsp), sps, pps, pic)
        elif ntype in (6, 9, 10, 11, 12):
            continue  # SEI / AU delimiter / end-of-* : ignorable
        else:
            raise ValueError(f"unsupported NAL type {ntype}")
    if pic is None:
        raise ValueError("no IDR slice in stream")
    s = pic.sps
    y = pic.y[: s.height, : s.width]
    cb = pic.cb[: s.height // 2, : s.width // 2]
    cr = pic.cr[: s.height // 2, : s.width // 2]
    return y.copy(), cb.copy(), cr.copy()


def decode_h264_annexb(blob: bytes) -> tuple:
    """(y, cb, cr) uint8 planes from an Annex B IDR access unit."""
    return decode_h264_nals(parse_annexb(blob))


# ---------------------------------------------------------------------------
# encoder (fixture/golden generator): I_4x4 / I_16x16, SAD mode decision,
# CAVLC, constant QP — reconstructs through the decoder's dequant path
# ---------------------------------------------------------------------------


def _sad(a, b) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def _encode_mb(w: _BitWriter, pic: _Picture, src_y, src_cb, src_cr,
               pps: PPS, mb: int, qp: int, force_i4: bool | None) -> None:
    sps = pic.sps
    mx, my = mb % sps.width_mbs, mb // sps.width_mbs
    bx0, by0 = mx * 4, my * 4
    y_src = src_y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]

    # ---- luma mode decision
    i16_mode = i16_pred = None
    if force_i4 is True:
        use_i16 = False
    else:
        best = None
        for mode in ([0] if my > 0 else []) + ([1] if mx > 0 else []) \
                + [2] + ([3] if mx > 0 and my > 0 else []):
            pred = _pred16(pic.y, mx, my, mode, sps.width_mbs,
                           sps.height_mbs)
            s = _sad(y_src, pred)
            if best is None or s < best[0]:
                best = (s, mode, pred)
        i16_sad, i16_mode, i16_pred = best
        # flat MBs take I_16x16; force_i4=False pins it for tests
        use_i16 = True if force_i4 is False else i16_sad <= 1800

    # ---- chroma mode decision (shared syntax element)
    cb_src = src_cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
    cr_src = src_cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
    best = None
    for mode in _chroma_modes_avail(mx, my):
        s = _sad(cb_src, _pred_chroma(pic.cb, mx, my, mode)) + \
            _sad(cr_src, _pred_chroma(pic.cr, mx, my, mode))
        if best is None or s < best[0]:
            best = (s, mode)
    chroma_mode = best[1]
    qpc = _chroma_qp(qp, pps.chroma_qp_offset)

    # ---- chroma residuals (computed before luma syntax because cbp needs
    # them; the 8x8 prediction depends only on neighbor MBs)
    ch_levels = []  # per component: (dc_levels[4], [ac15 x4])
    any_ch_dc = any_ch_ac = False
    for plane, src in ((pic.cb, cb_src), (pic.cr, cr_src)):
        pred = _pred_chroma(plane, mx, my, chroma_mode)
        resid = src.astype(np.int64) - pred
        wdc = np.zeros((2, 2), dtype=np.int64)
        wblks = []
        for blk in range(4):
            x4, y4 = blk & 1, blk >> 1
            wmat = _forward4(resid[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4])
            wdc[y4, x4] = wmat[0, 0]
            wblks.append(wmat)
        dc_lv = _quant_chroma_dc(wdc, qpc)
        ac_lvs = [_block_to_zig(_quant4(wm, qpc, skip_dc=True), skip_dc=True)
                  for wm in wblks]
        if np.any(dc_lv):
            any_ch_dc = True
        if any(any(v != 0 for v in ac) for ac in ac_lvs):
            any_ch_ac = True
        ch_levels.append((dc_lv, ac_lvs))
    cbp_chroma = 2 if any_ch_ac else (1 if any_ch_dc else 0)

    if use_i16:
        # ---- I_16x16: transform, split DC/AC, derive cbp_luma
        resid = y_src.astype(np.int64) - i16_pred
        wdc = np.zeros((4, 4), dtype=np.int64)
        ac_lvs = []
        for blk in range(16):
            x4, y4 = _BLK_XY[blk]
            wmat = _forward4(resid[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4])
            wdc[y4, x4] = wmat[0, 0]
            ac_lvs.append(_block_to_zig(_quant4(wmat, qp, skip_dc=True),
                                        skip_dc=True))
        dc_lv = _quant_luma_dc(wdc, qp)
        cbp_luma = 15 if any(any(v != 0 for v in ac) for ac in ac_lvs) else 0
        if cbp_luma == 0:
            ac_lvs = [[0] * 15 for _ in range(16)]
        mb_type = 1 + i16_mode + 4 * cbp_chroma + 12 * (cbp_luma == 15)
        w.ue(mb_type)
        w.ue(chroma_mode)
        w.se(0)  # mb_qp_delta (always present for I_16x16)
        # DC block
        nC = _nc_for(pic.nnz_y, bx0, by0)
        _encode_residual(w, _block_to_zig(dc_lv), nC, 16)
        dc = _dequant_luma_dc(dc_lv, qp)
        for blk in range(16):
            x4, y4 = _BLK_XY[blk]
            bx, by = bx0 + x4, by0 + y4
            tc = 0
            if cbp_luma:
                nC = _nc_for(pic.nnz_y, bx, by)
                tc = _encode_residual(w, ac_lvs[blk], nC, 15)
            d = _dequant4(_zig_to_block(ac_lvs[blk], skip_dc=True), qp,
                          skip_dc=True)
            d[0, 0] = dc[y4, x4]
            blk_pred = i16_pred[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4]
            pic.y[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = \
                _recon_block(blk_pred, d)
            pic.dec[by, bx] = True
            pic.nnz_y[by, bx] = tc
        pic.modes[by0 : by0 + 4, bx0 : bx0 + 4] = 2
    else:
        # ---- I_4x4: per-block mode decision is sequential (prediction
        # uses the evolving reconstruction), so pick modes, transform and
        # reconstruct in block order, BUFFERING the syntax elements; the
        # cbp and residual bits can only be written after all 16 blocks
        mode_bits = []  # (flag, rem or None)
        blk_levels = []
        blk_tcs = []
        saved_nnz = pic.nnz_y.copy()
        for blk in range(16):
            x4, y4 = _BLK_XY[blk]
            bx, by = bx0 + x4, by0 + y4
            best = None
            for mode in _avail_modes4(pic.dec, bx, by):
                pred = _pred4x4(pic.y, pic.dec, bx, by, mode)
                s = _sad(y_src[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4],
                         pred)
                if best is None or s < best[0]:
                    best = (s, mode, pred)
            _, mode, pred = best
            pred_mode = _pred_mode4(pic, bx, by)
            if mode == pred_mode:
                mode_bits.append((1, None))
            else:
                mode_bits.append((0, mode if mode < pred_mode else mode - 1))
            pic.modes[by, bx] = mode
            resid = y_src[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4].astype(
                np.int64) - pred
            lv = _quant4(_forward4(resid), qp)
            zig = _block_to_zig(lv)
            blk_levels.append(zig)
            tc = sum(1 for v in zig if v)
            blk_tcs.append(tc)
            d = _dequant4(_zig_to_block(zig), qp)
            pic.y[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = \
                _recon_block(pred, d)
            pic.dec[by, bx] = True
            pic.nnz_y[by, bx] = tc
        # cbp: an 8x8 group codes iff any of its blocks has coefficients
        cbp_luma = 0
        for blk in range(16):
            if blk_tcs[blk]:
                cbp_luma |= 1 << (blk >> 2)
        # blocks inside a coded 8x8 keep their tc; blocks in uncoded 8x8s
        # have all-zero levels already (tc 0), consistent either way
        w.ue(0)  # I_4x4
        for flag, rem in mode_bits:
            w.u(flag, 1)
            if not flag:
                w.u(rem, 3)
        w.ue(chroma_mode)
        cbp = cbp_luma | (cbp_chroma << 4)
        w.ue(_CBP_TO_CODENUM[cbp])
        if cbp:
            w.se(0)  # mb_qp_delta
        # residuals with the DECODER's nC context: replay nnz evolution
        pic.nnz_y[by0 : by0 + 4, bx0 : bx0 + 4] = \
            saved_nnz[by0 : by0 + 4, bx0 : bx0 + 4]
        for blk in range(16):
            x4, y4 = _BLK_XY[blk]
            bx, by = bx0 + x4, by0 + y4
            if cbp_luma & (1 << (blk >> 2)):
                nC = _nc_for(pic.nnz_y, bx, by)
                tc = _encode_residual(w, blk_levels[blk], nC, 16)
                pic.nnz_y[by, bx] = tc
            else:
                pic.nnz_y[by, bx] = 0

    # ---- chroma syntax + reconstruction (both MB types)
    if cbp_chroma:
        for ci in range(2):
            _encode_residual(w, _block_to_zig2x2(ch_levels[ci][0]), -1, 4)
    for ci, nnz in enumerate((pic.nnz_cb, pic.nnz_cr)):
        for blk in range(4):
            bx, by = mx * 2 + (blk & 1), my * 2 + (blk >> 1)
            if cbp_chroma == 2:
                nC = _nc_for(nnz, bx, by)
                tc = _encode_residual(w, ch_levels[ci][1][blk], nC, 15)
                nnz[by, bx] = tc
            else:
                nnz[by, bx] = 0
    for ci, plane in enumerate((pic.cb, pic.cr)):
        pred = _pred_chroma(plane, mx, my, chroma_mode)
        dc_lv = ch_levels[ci][0] if cbp_chroma else np.zeros((2, 2),
                                                             dtype=np.int64)
        dc = _dequant_chroma_dc(dc_lv, qpc)
        for blk in range(4):
            x4, y4 = blk & 1, blk >> 1
            ac = ch_levels[ci][1][blk] if cbp_chroma == 2 else [0] * 15
            d = _dequant4(_zig_to_block(ac, skip_dc=True), qpc, skip_dc=True)
            d[0, 0] = dc[y4, x4]
            blk_pred = pred[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4]
            plane[my * 8 + y4 * 4 : my * 8 + y4 * 4 + 4,
                  mx * 8 + x4 * 4 : mx * 8 + x4 * 4 + 4] = \
                _recon_block(blk_pred, d)


def _block_to_zig2x2(dc_lv: np.ndarray):
    """2x2 chroma DC scan order is raster."""
    return [int(dc_lv[0, 0]), int(dc_lv[0, 1]), int(dc_lv[1, 0]),
            int(dc_lv[1, 1])]


def encode_h264_annexb(y, cb, cr, qp: int = 26,
                       force_i4: bool | None = None) -> tuple:
    """(annexb_bytes, recon_planes): one IDR access unit (SPS + PPS +
    IDR slice, Annex B framing) for 4:2:0 planes — y (H, W) uint8, cb/cr
    (H/2, W/2). Even dimensions required; padding to macroblock size is
    edge-replicated and signalled via spec cropping. ``force_i4`` pins
    the luma MB type (None = SAD decision) so tests can exercise each
    path. The returned recon is what ANY conforming decoder must output
    (the encoder reconstructs through the decoder's dequant path)."""
    y = np.asarray(y, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    h, wd = y.shape
    if h % 2 or wd % 2:
        raise ValueError("4:2:0 needs even luma dimensions")
    if cb.shape != (h // 2, wd // 2) or cr.shape != cb.shape:
        raise ValueError("chroma planes must be (H/2, W/2)")
    if not 0 <= qp <= 51:
        raise ValueError("qp must be 0..51")
    mbw, mbh = (wd + 15) // 16, (h + 15) // 16
    pad_r, pad_b = mbw * 16 - wd, mbh * 16 - h
    src_y = np.pad(y, ((0, pad_b), (0, pad_r)), mode="edge")
    src_cb = np.pad(cb, ((0, pad_b // 2), (0, pad_r // 2)), mode="edge")
    src_cr = np.pad(cr, ((0, pad_b // 2), (0, pad_r // 2)), mode="edge")
    sps = SPS(width_mbs=mbw, height_mbs=mbh,
              crop_right=pad_r // 2, crop_bottom=pad_b // 2)
    pps = PPS(pic_init_qp=qp)
    pic = _Picture(sps)
    w = _BitWriter()
    # slice header (IDR)
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I (all slices)
    w.ue(pps.pps_id)
    w.u(0, sps.log2_max_frame_num)  # frame_num
    w.ue(0)  # idr_pic_id
    w.u(0, 1)  # no_output_of_prior_pics_flag
    w.u(0, 1)  # long_term_reference_flag
    w.se(0)  # slice_qp_delta
    w.ue(1)  # disable_deblocking_filter_idc = 1 (no deblocking)
    for mb in range(mbw * mbh):
        _encode_mb(w, pic, src_y, src_cb, src_cr, pps, mb, qp, force_i4)
    w.rbsp_trailing()
    blob = (_nal(3, 7, _write_sps(sps)) + _nal(3, 8, _write_pps(pps))
            + _nal(3, 5, w.getvalue()))
    recon = (pic.y[:h, :wd].copy(), pic.cb[: h // 2, : wd // 2].copy(),
             pic.cr[: h // 2, : wd // 2].copy())
    return blob, recon


# ---------------------------------------------------------------------------
# MP4 integration: avcC decoder configuration + length-prefixed samples
# ---------------------------------------------------------------------------


def parse_avcc(data: bytes) -> tuple:
    """(sps_nal_list, pps_nal_list, nal_length_size) from an
    AVCDecoderConfigurationRecord (ISO/IEC 14496-15 5.2.4.1) — the
    'avcC' box payload in an avc1 sample entry. The stored NAL units
    keep their header byte and emulation-prevention escaping."""
    if len(data) < 7 or data[0] != 1:
        raise ValueError("not an AVCDecoderConfigurationRecord")
    length_size = (data[4] & 3) + 1
    n_sps = data[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        if pos + 2 > len(data):
            raise ValueError("avcC SPS length overruns")
        ln = int.from_bytes(data[pos : pos + 2], "big")
        pos += 2
        if pos + ln > len(data):
            raise ValueError("avcC SPS overruns")
        sps_list.append(data[pos : pos + ln])
        pos += ln
    if pos >= len(data):
        raise ValueError("avcC missing PPS count")
    n_pps = data[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        if pos + 2 > len(data):
            raise ValueError("avcC PPS length overruns")
        ln = int.from_bytes(data[pos : pos + 2], "big")
        pos += 2
        if pos + ln > len(data):
            raise ValueError("avcC PPS overruns")
        pps_list.append(data[pos : pos + ln])
        pos += ln
    if not sps_list or not pps_list:
        raise ValueError("avcC without SPS/PPS")
    return sps_list, pps_list, length_size


def build_avcc(sps_rbsp: bytes, pps_rbsp: bytes) -> bytes:
    """AVCDecoderConfigurationRecord for one SPS + one PPS (RBSP form;
    header bytes + escaping added here) — the fixture generator's side."""
    sps_nal = bytes([0x67]) + _escape_rbsp(sps_rbsp)  # ref_idc 3, type 7
    pps_nal = bytes([0x68]) + _escape_rbsp(pps_rbsp)
    return (bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFF, 0xE1])
            + len(sps_nal).to_bytes(2, "big") + sps_nal
            + bytes([1]) + len(pps_nal).to_bytes(2, "big") + pps_nal)


def _split_length_prefixed(sample: bytes, length_size: int):
    pos = 0
    n = len(sample)
    while pos < n:
        if pos + length_size > n:
            raise ValueError("NAL length prefix overruns sample")
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if ln == 0 or pos + ln > n:
            raise ValueError("NAL overruns sample")
        nal = sample[pos : pos + ln]
        pos += ln
        hdr = nal[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        yield (hdr >> 5) & 3, hdr & 0x1F, _unescape_rbsp(nal[1:])


def decode_h264_avcc_sample(avcc: bytes, sample: bytes) -> tuple:
    """(y, cb, cr) from one MP4 'avc1' sample (length-prefixed NALs)
    using the track's avcC configuration — the shape sample_mp4_frames
    feeds from its picked keyframes."""
    sps_list, pps_list, length_size = parse_avcc(avcc)
    nals = []
    for nal in sps_list + pps_list:
        hdr = nal[0]
        nals.append(((hdr >> 5) & 3, hdr & 0x1F, _unescape_rbsp(nal[1:])))
    nals.extend(_split_length_prefixed(sample, length_size))
    return decode_h264_nals(nals)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------


def h264_iframe_features(
    df,
    content_col: str = "content",
    id_col: str = "media_id",
):
    """(media_id, height, width, qp, mean_luma, mean_cb, mean_cr, n_bytes)
    per Annex B IDR blob — the decode-backed audit columns a video
    pipeline derives from the keyframes it sampled (operators/mp4 slices
    those bytes; this decodes standalone Annex B units). One Arrow map
    pass, zero shuffle; corrupt/unsupported blobs emit ONE all-NULL row
    (the multimodal reject convention)."""
    from pyspark.sql import functions as F

    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import numpy as _np
        import pandas as _pd

        from apache_pinot_spark.operators.h264 import (
            decode_h264_annexb,
            parse_annexb,
            parse_pps,
        )

        cols = ("id", "height", "width", "qp", "mean_luma", "mean_cb",
                "mean_cr", "n_bytes")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, blob in zip(pdf["id"], pdf["c"]):
                out["id"].append(mid)
                try:
                    data = bytes(blob) if blob is not None else None
                    qp = None
                    for _, ntype, rbsp in parse_annexb(data):
                        if ntype == 8:
                            qp = parse_pps(rbsp).pic_init_qp
                    y, cb, cr = decode_h264_annexb(data)
                except Exception:
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                out["height"].append(int(y.shape[0]))
                out["width"].append(int(y.shape[1]))
                out["qp"].append(qp)
                out["mean_luma"].append(float(_np.mean(y)))
                out["mean_cb"].append(float(_np.mean(cb)))
                out["mean_cr"].append(float(_np.mean(cr)))
                out["n_bytes"].append(len(data))
            yield _pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        schema=f"id {id_type}, height INT, width INT, qp INT, "
               "mean_luma DOUBLE, mean_cb DOUBLE, mean_cr DOUBLE, "
               "n_bytes BIGINT",
    )
    return out.withColumnRenamed("id", id_col)
