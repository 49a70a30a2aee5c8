"""Minimal pure-Python GIF decoder — the third stdlib image tier
(siblings: png_codec, jpeg_codec), covering the last common legacy
web-corpus image format.

Everything here is a transcription of the PUBLIC GIF89a specification:
logical screen descriptor, global/local color tables, the variable-
code-width LZW scheme (with CLEAR/EOI codes and code-size growth),
four-pass interlacing, graphic control extensions (transparency index,
disposal), and multi-frame compositing.

Scope — checked up front, rejected with None (capability-tier
contract: corrupt or out-of-scope blobs flow to the reject stream):

  decode_gif:        first frame → H×W×3 RGB (or H×W×4 RGBA when the
                     frame declares a transparency index) uint8.
  decode_gif_frames: up to ``max_frames`` frames composited onto the
                     running canvas — disposal 0/1 leave the canvas,
                     disposal 2 restores the background, disposal 3
                     (restore-previous) restores the pre-frame canvas
                     snapshot (GIF89a §23).

There is deliberately NO encoder: tests assemble streams by hand (the
LZW "all root codes" construction below is always spec-legal) and use
the JVM ImageIO GIF writer as the real third-party golden.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list | None:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, EOI ends the stream, width grows after the
    table reaches 2^width (capped at 12 bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader over the concatenated sub-block data, LSB first
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated streams: best effort (caller checks)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out.extend(entry)
        if len(out) > max_pixels:
            return None  # declared size exceeded: corrupt
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step) passes


def decode_gif(data: bytes) -> "np.ndarray | None":
    """First frame of a GIF → H×W×3 (or ×4 with transparency) uint8;
    None for anything out of scope or corrupt."""
    frames = decode_gif_frames(data, max_frames=1)
    return frames[0] if frames else None


def decode_gif_frames(data: bytes, max_frames: int = 16) -> "list | None":
    """Up to ``max_frames`` composited frames (logical-screen-sized).
    Returns a list of H×W×3/4 uint8 arrays, or None if the stream is
    not a decodable GIF."""
    try:
        return _decode_frames(data, max_frames)
    except Exception:
        return None


def _decode_frames(data: bytes, max_frames: int) -> "list | None":
    if len(data) < 13 or data[:6] not in GIF_MAGIC:
        return None
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", data, 6)
    if w == 0 or h == 0:
        return None
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        if len(gct) < n:
            return None
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    canvas_alpha = np.zeros((h, w), dtype=np.uint8)  # background: transparent
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    frames: list = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data) and len(frames) < max_frames:
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gflags = data[pos + 1]
                transparent = data[pos + 4] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
                pos += 1 + size
            # skip any remaining sub-blocks (and the whole block for
            # other extension labels: comment/app/plain-text)
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1  # block terminator
            continue
        if b != 0x2C:  # not an image descriptor: corrupt
            return None
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if iw == 0 or ih == 0 or ix + iw > w or iy + ih > h:
            return None
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            if len(lct) < n:
                return None
            pos += 3 * n
        if lct is None:
            return None
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            return None
        chunks = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            chunks += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # terminator
        idx = _lzw_decode(min_code, bytes(chunks), iw * ih)
        if idx is None or len(idx) < iw * ih:
            return None
        pix = np.asarray(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if int(pix.max()) >= len(lct):
            return None
        if iflags & 0x40:  # interlaced: rows arrive in four passes
            de = np.empty_like(pix)
            src = 0
            for start, step in _INTERLACE:
                rows = range(start, ih, step)
                for r in rows:
                    de[r] = pix[src]
                    src += 1
            pix = de
        rgb = lct[pix]
        if transparent is not None:
            opaque = pix != transparent
        else:
            opaque = np.ones((ih, iw), dtype=bool)
        if disposal == 3:
            # restore-to-previous: snapshot the pre-draw region (GIF89a
            # §23 disposal 3 — the canvas as it was BEFORE this frame
            # rendered comes back once the frame's delay elapses)
            prev_c = canvas[iy : iy + ih, ix : ix + iw].copy()
            prev_a = canvas_alpha[iy : iy + ih, ix : ix + iw].copy()
        region_c = canvas[iy : iy + ih, ix : ix + iw]
        region_a = canvas_alpha[iy : iy + ih, ix : ix + iw]
        region_c[opaque] = rgb[opaque]
        region_a[opaque] = 255
        if canvas_alpha.all():
            frames.append(canvas.copy())
        else:
            frames.append(
                np.concatenate([canvas, canvas_alpha[:, :, None]], axis=2)
            )
        if disposal == 2:  # restore background
            canvas[iy : iy + ih, ix : ix + iw] = (
                gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
            )
            canvas_alpha[iy : iy + ih, ix : ix + iw] = 0
        elif disposal == 3:  # restore the pre-frame snapshot
            canvas[iy : iy + ih, ix : ix + iw] = prev_c
            canvas_alpha[iy : iy + ih, ix : ix + iw] = prev_a
        transparent = None
        disposal = 0
    return frames or None


# --------------------------------------------------------------------------
# BMP (windows bitmap) — trivial sibling kept here rather than a fourth
# codec module: uncompressed BI_RGB, 8-bit palette / 24-bit BGR /
# 32-bit BGRA, bottom-up or top-down rows, 4-byte row padding.
# --------------------------------------------------------------------------


def decode_bmp(data: bytes) -> "np.ndarray | None":
    """BMP bytes → H×W×3 (or ×4 for 32-bit with alpha) uint8; None for
    anything out of scope (compressed/16-bit/OS2 headers) or corrupt."""
    try:
        if len(data) < 54 or data[:2] != b"BM":
            return None
        pix_off = struct.unpack_from("<I", data, 10)[0]
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        if hdr_size < 40:
            return None  # OS/2 core headers: out of scope
        w, h, planes, bpp, comp = struct.unpack_from("<iihHI", data, 18)
        if planes != 1 or comp != 0 or w <= 0 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)
        if bpp == 8:
            n_colors = struct.unpack_from("<I", data, 46)[0] or 256
            pal_off = 14 + hdr_size
            pal = np.frombuffer(
                data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
            ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
            row_bytes = (w + 3) & ~3
            rows = []
            for y in range(h):
                off = pix_off + y * row_bytes
                idx = np.frombuffer(data, np.uint8, count=w, offset=off)
                if int(idx.max()) >= len(pal):
                    return None
                rows.append(pal[idx])
            px = np.stack(rows)
        elif bpp in (24, 32):
            ch = bpp // 8
            row_bytes = (w * ch + 3) & ~3
            rows = []
            for y in range(h):
                off = pix_off + y * row_bytes
                line = np.frombuffer(data, np.uint8, count=w * ch, offset=off)
                line = line.reshape(w, ch)
                rgb = line[:, :3][:, ::-1]  # BGR -> RGB
                if ch == 4:
                    rgb = np.concatenate([rgb, line[:, 3:4]], axis=1)
                rows.append(rgb)
            px = np.stack(rows)
        else:
            return None  # 1/4/16-bit: out of scope
        return px if top_down else px[::-1].copy()
    except Exception:
        return None
