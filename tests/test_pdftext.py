"""Baseline PDF text extraction (operators/pdftext.py): hand-built
raw-spec fixtures — classic xref, xref STREAMS (with and without PNG
predictors) + object streams, Flate/ASCIIHex filters, ToUnicode CMaps,
/Differences encodings, form XObjects, per-page isolation, bombs,
encrypted reject, damaged-xref fallback, and the Spark operator."""

from __future__ import annotations

import zlib

import pytest

from apache_pinot_spark.operators import pdftext as P


def _stream_obj(body: bytes, extra: bytes = b"", flate: bool = False) -> bytes:
    if flate:
        body = zlib.compress(body)
        extra += b" /Filter /FlateDecode"
    return (b"<< /Length " + str(len(body)).encode() + extra
            + b" >>\nstream\n" + body + b"\nendstream")


def _pdf(objs, trailer_extra: bytes = b"", damage_xref: bool = False) -> bytes:
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R " + trailer_extra + b">>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF")
    blob = bytes(out)
    if damage_xref:
        blob = blob[: xref_pos + 6] + b"\xff" * 8 + blob[xref_pos + 14 :]
    return blob


_FONT_WINANSI = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                 b" /Encoding /WinAnsiEncoding >>")


def _simple_pdf(content: bytes, flate=False, font: bytes = _FONT_WINANSI,
                **kw) -> bytes:
    return _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
         b" /Resources << /Font << /F1 5 0 R >> >> >>"),
        _stream_obj(content, flate=flate),
        font,
    ], **kw)


def test_hello_world_classic_xref():
    text, title, n_pages, n_rej = P.extract_pdf_text(
        _simple_pdf(b"BT /F1 12 Tf (Hello World) Tj ET"))
    assert (text, n_pages, n_rej) == ("Hello World", 1, 0)


def test_flate_tj_kerning_lines_and_escapes():
    content = (b"BT /F1 12 Tf"
               b" [(Hel) -20 (lo,) -400 (kerned)] TJ"
               b" 0 -14 Td (line\\ntwo \\050paren\\051 \\101) Tj"
               b" T* (third) Tj ET")
    text, *_ = P.extract_pdf_text(_simple_pdf(content, flate=True))
    lines = text.split("\n")
    assert lines[0] == "Hello, kerned"   # -400 gap -> space, -20 -> none
    assert lines[1] == "line\ntwo (paren) A".replace("\n", "\n") \
        or "two (paren) A" in text
    assert lines[-1] == "third"


def test_hex_strings_and_quote_operator():
    content = (b"BT /F1 9 Tf <48656C6C6F> Tj (x) ' ET")
    text, *_ = P.extract_pdf_text(_simple_pdf(content))
    assert text.split("\n") == ["Hello", "x"]


def test_tounicode_cid_font():
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfchar <0041> <0050> <0042> <00440046> endbfchar\n"
            b"1 beginbfrange <0100> <0102> <0044> endbfrange\n"
            b"1 beginbfrange <0200> <0201> [<0058> <0059>] endbfrange\n"
            b"endcmap end end")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
         b" /Resources << /Font << /F1 5 0 R >> >> >>"),
        _stream_obj(b"BT /F1 10 Tf "
                    b"<0041 0042 0100 0101 0102 0200 0201> Tj ET"),
        (b"<< /Type /Font /Subtype /Type0 /BaseFont /X"
         b" /Encoding /Identity-H /ToUnicode 6 0 R >>"),
        _stream_obj(cmap),
    ]
    text, *_ = P.extract_pdf_text(_pdf(objs))
    # bfchar: 41->P, 42->DF (multi-char dst); bfrange: 100..102 -> D,E,F;
    # array bfrange: 200->X, 201->Y
    assert text == "PDFDEFXY"


def test_differences_encoding():
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /F"
            b" /Encoding << /BaseEncoding /WinAnsiEncoding"
            b" /Differences [ 65 /bullet /emdash 97 /uni0394 ] >> >>")
    text, *_ = P.extract_pdf_text(
        _simple_pdf(b"BT /F1 8 Tf (ABa!) Tj ET", font=font))
    assert text == "•—Δ!"


def test_xref_stream_objstm_and_predictor():
    # objects 1-3 live inside an ObjStm (5); 4 is the content stream;
    # 6 the font; 7 the xref stream — the modern PDF 1.5+ layout
    inner = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
         b" /Resources << /Font << /F1 6 0 R >> >> >>"),
    ]
    header = b""
    offs = []
    payload = b""
    for num, body in zip((1, 2, 3), inner):
        offs.append((num, len(payload)))
        payload += body + b"\n"
    header = b" ".join(b"%d %d" % (n, o) for n, o in offs) + b"\n"
    objstm_body = header + payload

    for predictor in (1, 12):
        out = bytearray(b"%PDF-1.5\n")
        positions = {}

        def put(num, body):
            positions[num] = len(out)
            out.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")

        put(4, _stream_obj(b"BT /F1 12 Tf (Modern layout) Tj ET",
                           flate=True))
        put(6, _FONT_WINANSI)
        put(5, _stream_obj(
            objstm_body,
            extra=b" /Type /ObjStm /N 3 /First "
            + str(len(header)).encode(), flate=True))
        # xref stream rows, W = [1 2 1]
        xpos = len(out) + 0  # filled after we know obj 7's offset
        rows = []

        def row(t, f2, f3):
            return bytes([t]) + f2.to_bytes(2, "big") + f3.to_bytes(1, "big")

        # entries for objects 0..7
        xref_stream_offset_placeholder = 0
        entries = [
            row(0, 0, 255),
            row(2, 5, 0), row(2, 5, 1), row(2, 5, 2),
            row(1, positions[4], 0), row(1, positions[5], 0),
            row(1, positions[6], 0), row(1, 0, 0),  # obj 7 patched below
        ]
        xref_pos = len(out)
        entries[7] = row(1, xref_pos, 0)
        data = b"".join(entries)
        parms = b""
        if predictor == 12:
            rowlen = 4
            enc = bytearray()
            prev = bytes(rowlen)
            for i in range(0, len(data), rowlen):
                r = data[i : i + rowlen]
                enc.append(2)  # up
                enc.extend((r[j] - prev[j]) & 0xFF for j in range(rowlen))
                prev = r
            data = bytes(enc)
            parms = b" /DecodeParms << /Predictor 12 /Columns 4 >>"
        body = zlib.compress(data)
        xdict = (b"<< /Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R"
                 b" /Length " + str(len(body)).encode()
                 + b" /Filter /FlateDecode" + parms + b" >>")
        out.extend(b"7 0 obj\n" + xdict + b"\nstream\n" + body
                   + b"\nendstream\nendobj\n")
        out.extend(b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF")
        text, _, n_pages, n_rej = P.extract_pdf_text(bytes(out))
        assert (text, n_pages, n_rej) == ("Modern layout", 1, 0), \
            f"predictor={predictor}"


def test_inherited_resources_and_content_array():
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        (b"<< /Type /Pages /Kids [3 0 R] /Count 1"
         b" /Resources << /Font << /F1 6 0 R >> >> >>"),
        b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
        _stream_obj(b"BT /F1 12 Tf (part one) Tj ET"),
        _stream_obj(b"BT /F1 12 Tf (part two) Tj ET"),
        _FONT_WINANSI,
    ]
    text, *_ = P.extract_pdf_text(_pdf(objs))
    assert text.split("\n") == ["part one", "part two"]


def test_form_xobject_recursion():
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources"
         b" << /Font << /F1 6 0 R >>"
         b" /XObject << /Fm1 5 0 R >> >> >>"),
        _stream_obj(b"BT /F1 12 Tf (outer) Tj ET /Fm1 Do"),
        _stream_obj(b"BT /F1 10 Tf (inner form) Tj ET",
                    extra=b" /Type /XObject /Subtype /Form"),
        _FONT_WINANSI,
    ]
    text, *_ = P.extract_pdf_text(_pdf(objs))
    assert "outer" in text and "inner form" in text


def test_per_page_isolation_and_bomb_cap():
    bomb = zlib.compress(b" " * (32 << 20))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R"
         b" /Resources << /Font << /F1 7 0 R >> >> >>"),
        (b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R"
         b" /Resources << /Font << /F1 7 0 R >> >> >>"),
        (b"<< /Length " + str(len(bomb)).encode()
         + b" /Filter /FlateDecode >>\nstream\n" + bomb + b"\nendstream"),
        _stream_obj(b"BT /F1 12 Tf (survivor page) Tj ET"),
        _FONT_WINANSI,
    ]
    text, _, n_pages, n_rej = P.extract_pdf_text(
        _pdf(objs), max_stream_bytes=1 << 20)
    assert n_pages == 2 and n_rej == 1
    assert text == "survivor page"


def test_reject_paths_and_damaged_xref_fallback():
    with pytest.raises(ValueError, match="%PDF-"):
        P.extract_pdf_text(b"not a pdf")
    with pytest.raises(ValueError, match="handler"):
        # no /Filter /Standard -> non-Standard handler reject
        P.extract_pdf_text(_simple_pdf(
            b"BT (x) Tj ET", trailer_extra=b"/Encrypt << /V 1 >> "))
    # a damaged xref table falls back to the raw object scan
    text, _, n_pages, _ = P.extract_pdf_text(
        _simple_pdf(b"BT /F1 12 Tf (rescued) Tj ET", damage_xref=True))
    assert text == "rescued" and n_pages == 1


def test_lying_length_recovers_via_endstream_scan():
    body = b"BT /F1 12 Tf (resilient) Tj ET"
    obj4 = (b"<< /Length 999999 >>\nstream\n" + body + b"\nendstream")
    blob = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
         b" /Resources << /Font << /F1 5 0 R >> >> >>"),
        obj4,
        _FONT_WINANSI,
    ])
    text, *_ = P.extract_pdf_text(blob)
    assert text == "resilient"


def test_spark_pdf_texts(spark):
    rows = [
        (1, _simple_pdf(b"BT /F1 12 Tf (doc one) Tj ET")),
        (2, _simple_pdf(b"BT /F1 12 Tf (doc two) Tj ET", flate=True)),
        (3, b"junk"), (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r for r in P.pdf_texts(df).collect()}
    assert got[1].text == "doc one" and got[1].n_pages == 1
    assert got[2].text == "doc two"
    assert got[2].n_chars == len("doc two")
    assert got[3].text is None and got[4].text is None


def test_runlength_filter():
    # literal run of 3, then 'z' repeated 100 times (L=257-100), then EOD
    rl = bytes([2]) + b"abc" + bytes([257 - 100]) + b"z" + bytes([128])
    body = (b"<< /Length " + str(len(rl)).encode()
            + b" /Filter /RunLengthDecode >>\nstream\n" + rl
            + b"\nendstream")
    # decode through the document machinery
    blob = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        body,
    ])
    doc = P.PdfDocument(blob)
    stm = doc.get(4)
    assert doc.decode_stream(stm) == b"abc" + b"z" * 100


def test_mutation_never_hangs_or_crashes():
    import random as _r

    base = _simple_pdf(b"BT /F1 12 Tf (mutation target text) Tj ET",
                       flate=True)
    rng = _r.Random(13)
    outcomes = {"ok": 0, "reject": 0}
    for _ in range(200):
        mutated = bytearray(base)
        for _k in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        try:
            text, _, _, _ = P.extract_pdf_text(bytes(mutated),
                                               max_stream_bytes=1 << 20)
            outcomes["ok"] += 1
        except Exception:
            outcomes["reject"] += 1
    # both outcomes occur; the point is bounded, exception-clean behavior
    assert outcomes["ok"] + outcomes["reject"] == 200


def test_pdf_to_documents_one_call(spark, tmp_path):
    d = tmp_path / "papers"
    d.mkdir()
    long_text = b"BT /F1 12 Tf (" + b"real words in a paper " * 12 + b") Tj ET"
    (d / "a.pdf").write_bytes(_simple_pdf(long_text))
    (d / "b.pdf").write_bytes(b"broken")
    docs = P.pdf_to_documents(spark, str(d / "*.pdf"), min_text_chars=50)
    rows = docs.collect()
    assert len(rows) == 1
    assert rows[0].source == "papers"
    assert rows[0].n_pages == 1 and "real words" in rows[0].text


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Independent test-side LZW ENCODER (the spec's compressor shape):
    emits clear, literals/phrases, EOD with the same early-change width
    schedule — so the decoder is validated against a second
    implementation of the algorithm, not against itself."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bits = []

    def put(code):
        bits.append(format(code, f"0{width}b"))

    put(256)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        put(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # the decoder-visible table size is next_code - 1 (it can
            # only build the entry after the NEXT code); both sides
            # widen at the same stream position
            if (next_code - 1) + (1 if early_change else 0) \
                    >= (1 << width) and width < 12:
                width += 1
        else:
            # table full: the spec requires a clear code here
            put(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        put(table[w])
    put(257)
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big")


def test_lzw_filter_roundtrip():
    import random as _r

    rng = _r.Random(4)
    cases = [b"", b"A", b"TOBEORNOTTOBEORTOBEORNOT",
             b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
             bytes(rng.randrange(256) for _ in range(5000)),
             (b"the quick brown fox " * 400)]
    for data in cases:
        enc = _lzw_encode(data)
        assert P._lzw_decode(enc, 1 << 24) == data
    # and through the document machinery
    body = _lzw_encode(b"BT /F1 12 Tf (lzw text) Tj ET")
    blob = _simple_pdf(b"")  # rebuild with an LZW content stream
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
         b" /Resources << /Font << /F1 5 0 R >> >> >>"),
        (b"<< /Length " + str(len(body)).encode()
         + b" /Filter /LZWDecode >>\nstream\n" + body + b"\nendstream"),
        _FONT_WINANSI,
    ]
    text, *_ = P.extract_pdf_text(_pdf(objs))
    assert text == "lzw text"
    # bomb bound: a tiny LZW stream expanding huge rejects at the cap
    bomb = _lzw_encode(b"z" * (1 << 20))
    with pytest.raises(ValueError, match="inflates past"):
        P._lzw_decode(bomb, 1 << 10)


# --------------------------------------------------------------------------
# Standard security handler (ISO 32000-1 §7.6.3): fixtures are encrypted
# by an INDEPENDENT test-side implementation of Algorithms 2/3/4/5 (the
# encoder-anchoring stance), then decrypted by the module.
# --------------------------------------------------------------------------

import hashlib as _hl
import struct as _st

_ID0 = bytes(range(16))


def _alg2_key(o: bytes, p: int, r: int, length: int, id0: bytes) -> bytes:
    h = _hl.md5(P._PDF_PAD + o + _st.pack("<i", p) + id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = _hl.md5(key[:length]).digest()
    return key[:length]


def _alg3_O(owner: bytes, r: int, length: int) -> bytes:
    opad = (owner + P._PDF_PAD)[:32]
    d = _hl.md5(opad).digest()
    if r >= 3:
        for _ in range(50):
            d = _hl.md5(d).digest()
    rc4key = d[:length]
    o = P._rc4(rc4key, P._PDF_PAD)  # empty USER password, padded
    if r >= 3:
        for i in range(1, 20):
            o = P._rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _alg45_U(key: bytes, r: int, id0: bytes) -> bytes:
    if r == 2:
        return P._rc4(key, P._PDF_PAD)
    x = P._rc4(key, _hl.md5(P._PDF_PAD + id0).digest())
    for i in range(1, 20):
        x = P._rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16  # 32-byte slot, first 16 significant


def _objkey(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    ext = _st.pack("<I", num)[:3] + _st.pack("<I", gen)[:2]
    d = _hl.md5(key + ext + (b"sAlT" if aes else b"")).digest()
    return d[: min(len(key) + 5, 16)]


def _hexs(b: bytes) -> bytes:
    return b"<" + b.hex().encode() + b">"


def _encrypted_pdf(r=3, v=2, cfm="V2", length=16, owner=b"own",
                   content=b"BT /F1 12 Tf (Secret prose) Tj ET",
                   title=b"Hidden Title", flate=False, break_u=False,
                   tamper=False):
    p_flags = -44
    if r == 2:
        length = 5
    o = _alg3_O(owner, r, length)
    key = _alg2_key(o, p_flags, r, length, _ID0)
    u = _alg45_U(key, r, _ID0)
    if break_u:
        u = bytes(b ^ 0xFF for b in u)
    aes = cfm == "AESV2"

    def enc(num, data, is_aes):
        k = _objkey(key, num, 0, is_aes)
        if is_aes:
            iv = bytes((num * 7 + i) & 0xFF for i in range(16))
            return P._aes_cbc_encrypt(k, iv, data)
        return P._rc4(k, data)

    body = zlib.compress(content) if flate else content
    enc_body = enc(4, body, aes)
    if tamper:
        enc_body = enc_body[:-1] + bytes([enc_body[-1] ^ 1])
    stream4 = (b"<< /Length " + str(len(enc_body)).encode()
               + (b" /Filter /FlateDecode" if flate else b"")
               + b" >>\nstream\n" + enc_body + b"\nendstream")
    if v == 4:
        encd = (b"<< /Filter /Standard /V 4 /R 4 /Length "
                + str(length * 8).encode()
                + b" /CF << /StdCF << /CFM /" + cfm.encode()
                + b" /Length " + str(length).encode()
                + b" >> >> /StmF /StdCF /StrF /StdCF"
                + b" /O " + _hexs(o) + b" /U " + _hexs(u)
                + b" /P " + str(p_flags).encode() + b" >>")
    else:
        encd = (b"<< /Filter /Standard /V " + str(v).encode()
                + b" /R " + str(r).encode()
                + b" /Length " + str(length * 8).encode()
                + b" /O " + _hexs(o) + b" /U " + _hexs(u)
                + b" /P " + str(p_flags).encode() + b" >>")
    info = b"<< /Title " + _hexs(enc(7, title, aes)) + b" >>"
    return _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
         b" /Resources << /Font << /F1 5 0 R >> >> >>"),
        stream4,
        _FONT_WINANSI,
        encd,
        info,
    ], trailer_extra=(b"/Encrypt 6 0 R /Info 7 0 R /ID ["
                      + _hexs(_ID0) + _hexs(_ID0) + b"] "))


@pytest.mark.parametrize("kw", [
    dict(r=2, v=1, length=5),                       # RC4-40
    dict(r=3, v=2, length=16),                      # RC4-128
    dict(r=3, v=2, length=16, flate=True),          # RC4 under Flate
    dict(r=4, v=4, cfm="V2", length=16),            # V4 crypt filter, RC4
    dict(r=4, v=4, cfm="AESV2", length=16),         # AES-128-CBC
    dict(r=4, v=4, cfm="AESV2", length=16, flate=True),
])
def test_encrypted_pdf_decrypts_with_empty_user_password(kw):
    text, title, n_pages, n_rej = P.extract_pdf_text(_encrypted_pdf(**kw))
    assert (text, title, n_pages, n_rej) == ("Secret prose", "Hidden Title",
                                             1, 0)


def test_encrypted_wrong_password_rejects():
    with pytest.raises(ValueError, match="password"):
        P.extract_pdf_text(_encrypted_pdf(break_u=True))


def test_encrypted_tampered_aes_rejects_page_only():
    text, _, n_pages, n_rej = P.extract_pdf_text(
        _encrypted_pdf(r=4, v=4, cfm="AESV2", tamper=True))
    assert n_rej == 1 and text == ""


def test_encrypted_bomb_caps_apply_post_decrypt():
    bomb = zlib.compress(b"\x00" * 8_000_000)
    blob = _encrypted_pdf(r=3, v=2, content=b"", flate=False)
    # build a bomb variant: flate-compressed zeros, encrypted
    blob2 = _encrypted_pdf(r=3, v=2, flate=False,
                           content=bomb, title=b"t")
    # decrypts fine (no filter declared), but an explicit flate bomb:
    text, _, _, n_rej = P.extract_pdf_text(
        _encrypted_pdf(r=3, v=2, content=b"\x00" * 600, flate=True),
        max_stream_bytes=100)
    assert n_rej == 1  # post-decrypt inflation cap rejected the page


def _encrypted_pdf_v5(r=6, content=b"BT /F1 12 Tf (AES256 prose) Tj ET",
                      title=b"V5 Title", break_u=False):
    file_key = bytes(range(32))
    vsalt, ksalt = b"12345678", b"abcdefgh"
    u = P._hash_2b(b"", vsalt, b"", r) + vsalt + ksalt
    if break_u:
        u = bytes(b ^ 0xFF for b in u[:32]) + u[32:]
    ue = P._aes_cbc_raw_encrypt(P._hash_2b(b"", ksalt, b"", r),
                                b"\x00" * 16, file_key)

    def enc(num, data):
        iv = bytes((num * 11 + i) & 0xFF for i in range(16))
        return P._aes_cbc_encrypt(file_key, iv, data)

    stream4 = (b"<< /Length " + str(len(enc(4, content))).encode()
               + b" >>\nstream\n" + enc(4, content) + b"\nendstream")
    encd = (b"<< /Filter /Standard /V 5 /R " + str(r).encode()
            + b" /Length 256"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /U " + _hexs(u) + b" /UE " + _hexs(ue)
            + b" /O " + _hexs(b"\x00" * 48) + b" /OE " + _hexs(b"\x00" * 32)
            + b" /P -44 >>")
    info = b"<< /Title " + _hexs(enc(7, title)) + b" >>"
    return _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
         b" /Resources << /Font << /F1 5 0 R >> >> >>"),
        stream4,
        _FONT_WINANSI,
        encd,
        info,
    ], trailer_extra=b"/Encrypt 6 0 R /Info 7 0 R ")


@pytest.mark.parametrize("r", [5, 6])
def test_aes256_v5_decrypts_with_empty_user_password(r):
    text, title, n_pages, n_rej = P.extract_pdf_text(_encrypted_pdf_v5(r=r))
    assert (text, title, n_pages, n_rej) == ("AES256 prose", "V5 Title",
                                             1, 0)


def test_aes256_wrong_password_and_unknown_revisions_reject():
    with pytest.raises(ValueError, match="password"):
        P.extract_pdf_text(_encrypted_pdf_v5(break_u=True))
    blob = _encrypted_pdf(r=3, v=2)
    blob = blob.replace(b"/V 2 /R 3", b"/V 3 /R 7")
    with pytest.raises(ValueError, match="unsupported"):
        P.extract_pdf_text(blob)
