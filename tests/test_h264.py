"""Baseline H.264 intra codec (operators/h264.py): spec-table
validation, exhaustive self-roundtrip across content kinds / QPs / MB
types / croppings, CAVLC property tests, corrupt-NAL mutation rejection,
the avcC/MP4 sample path, and the Spark operator.

No reference H.264 codec exists in this environment, so the guarantee
asserted here is the one the module docstring states: prefix-free
spec-profiled tables, syntax per clause 7.3, decode(encode(x)) ==
encoder reconstruction BIT-EXACTLY, quality bounded by QP."""

from __future__ import annotations

import numpy as np
import pytest

from apache_pinot_spark.operators import h264 as H
from apache_pinot_spark.operators import h264_tables as T


def _img(kind, h, w, seed=7):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return (rng.integers(0, 256, (h, w), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8))
    if kind == "gradient":
        yy, xx = np.mgrid[0:h, 0:w]
        y = (((xx * 255) // max(w - 1, 1) + (yy * 128) // max(h - 1, 1))
             % 256).astype(np.uint8)
        return (y, (y[::2, ::2] // 2 + 64).astype(np.uint8),
                (255 - y[::2, ::2] // 2).astype(np.uint8))
    if kind == "flat":
        return (np.full((h, w), 77, np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8),
                np.full((h // 2, w // 2), 90, np.uint8))
    y = np.zeros((h, w), np.uint8)
    y[:, w // 2 :] = 230
    y[h // 2 :, :] //= 2
    y[h // 3 :: 7, :] = 10
    return (y, np.where(y[::2, ::2] > 100, 200, 30).astype(np.uint8),
            np.full((h // 2, w // 2), 128, np.uint8))


def test_vlc_tables_prefix_free_and_complete():
    def check(codes):
        codes = list(codes)
        assert len(set(codes)) == len(codes)
        for a in codes:
            for b in codes:
                assert a == b or not b.startswith(a), (a, b)

    for i, tab in enumerate(T.COEFF_TOKEN):
        check(tab.values())
        # full alphabet: every legal (t1, tc) pair
        assert set(tab) == {(t1, tc) for tc in range(17)
                            for t1 in range(min(tc, 3) + 1)}, i
    check(T.COEFF_TOKEN_CHROMA_DC.values())
    assert set(T.COEFF_TOKEN_CHROMA_DC) == {
        (t1, tc) for tc in range(5) for t1 in range(min(tc, 3) + 1)}
    for tc, codes in T.TOTAL_ZEROS_4x4.items():
        assert len(codes) == 17 - tc
        check(codes)
    for tc, codes in T.TOTAL_ZEROS_CHROMA_DC.items():
        assert len(codes) == 5 - tc
        check(codes)
    for zl, codes in T.RUN_BEFORE.items():
        assert len(codes) == (zl + 1 if zl < 7 else 15)
        check(codes)
    assert sorted(T.CBP_INTRA_CODENUM_TO_CBP) == list(range(48))
    # spec anchors for the short heads of the canonical-built context
    assert T.COEFF_TOKEN[2][(0, 0)] == "1111"
    assert T.COEFF_TOKEN[2][(1, 1)] == "1110"
    assert T.COEFF_TOKEN[2][(2, 2)] == "1101"
    assert T.COEFF_TOKEN[2][(3, 3)] == "1100"


def test_exp_golomb_roundtrip():
    w = H._BitWriter()
    vals = list(range(40)) + [255, 1023, 70000]
    svals = [0, 1, -1, 2, -2, 17, -17, 300, -300]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = H._BitReader(w.getvalue())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_rbsp_escaping_roundtrip():
    cases = [b"\x00\x00\x00", b"\x00\x00\x01\x00\x00\x02",
             b"\x00\x00\x03\x00\x00", b"abc\x00\x00\x00\x00\x00\x01",
             bytes(range(256)) * 3]
    for raw in cases:
        esc = H._escape_rbsp(raw)
        # no start-code or escape-trigger patterns survive
        for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
            assert bad not in esc
        assert H._unescape_rbsp(esc) == raw


def test_cavlc_residual_property_roundtrip():
    """Random coefficient blocks through encode->decode for every nC
    context and block size — exercises coeff_token, adaptive suffix,
    total_zeros and run_before far beyond what image content reaches."""
    rng = np.random.default_rng(42)
    for trial in range(400):
        max_coeff = int(rng.choice([4, 15, 16]))
        nC = int(rng.choice([-1, 0, 1, 2, 3, 4, 5, 7, 8, 16]))
        if max_coeff == 4:
            nC = -1
        elif nC == -1:
            nC = 0
        density = rng.uniform(0, 1)
        coeffs = [int(rng.integers(-2000, 2000))
                  if rng.uniform(0, 1) < density else 0
                  for _ in range(max_coeff)]
        if max_coeff == 4:  # chroma DC magnitudes are modest
            coeffs = [max(-500, min(500, c)) for c in coeffs]
        w = H._BitWriter()
        tc = H._encode_residual(w, coeffs, nC, max_coeff)
        w.rbsp_trailing()
        r = H._BitReader(w.getvalue())
        got, got_tc = H._decode_residual(r, nC, max_coeff)
        assert got == coeffs, (trial, nC, max_coeff, coeffs, got)
        assert got_tc == tc == sum(1 for c in coeffs if c)


def test_roundtrip_sweep_bit_exact():
    """decode(encode(x)) == encoder reconstruction for every content
    kind x size x QP x forced-MB-type combination, including
    non-multiple-of-16 sizes (cropping)."""
    for kind in ("noise", "gradient", "flat", "edges"):
        for (h, w) in ((16, 16), (32, 48), (36, 52)):
            for qp in (4, 20, 35, 51):
                for fi4 in (None, True, False):
                    y, cb, cr = _img(kind, h, w)
                    blob, recon = H.encode_h264_annexb(y, cb, cr, qp=qp,
                                                       force_i4=fi4)
                    dy, dcb, dcr = H.decode_h264_annexb(blob)
                    assert dy.shape == (h, w)
                    assert np.array_equal(dy, recon[0]), (kind, h, w, qp, fi4)
                    assert np.array_equal(dcb, recon[1])
                    assert np.array_equal(dcr, recon[2])


def test_quality_bounded_by_qp():
    y, cb, cr = _img("gradient", 48, 64)
    maes = []
    for qp in (4, 16, 28, 40):
        blob, _ = H.encode_h264_annexb(y, cb, cr, qp=qp)
        dy, _, _ = H.decode_h264_annexb(blob)
        maes.append(float(np.abs(dy.astype(int) - y.astype(int)).mean()))
    assert maes[0] < 2.0  # near-lossless at low QP
    assert maes == sorted(maes)  # monotone degradation
    # compression actually happens on smooth content
    blob, _ = H.encode_h264_annexb(y, cb, cr, qp=28)
    assert len(blob) < y.size // 2


def test_dc_path_matches_ac_path_on_flat_content():
    """The AC-step-paired DC scaling (module docstring): a flat MB
    reconstructs near-exactly through I_16x16 (DC Hadamard path) at low
    QP, same as through I_4x4."""
    y, cb, cr = _img("flat", 32, 32)
    for fi4 in (True, False):
        blob, _ = H.encode_h264_annexb(y, cb, cr, qp=4, force_i4=fi4)
        dy, dcb, dcr = H.decode_h264_annexb(blob)
        assert np.abs(dy.astype(int) - y.astype(int)).max() <= 1, fi4
        assert np.abs(dcb.astype(int) - cb.astype(int)).max() <= 1
        assert np.abs(dcr.astype(int) - cr.astype(int)).max() <= 1


def test_parameter_set_roundtrip_and_rejects():
    s = H.SPS(width_mbs=3, height_mbs=2, crop_right=2, crop_bottom=1)
    got = H.parse_sps(H._write_sps(s))
    assert (got.width_mbs, got.height_mbs, got.crop_right,
            got.crop_bottom) == (3, 2, 2, 1)
    assert got.width == 44 and got.height == 30
    p = H.PPS(pic_init_qp=33)
    assert H.parse_pps(H._write_pps(p)).pic_init_qp == 33
    with pytest.raises(ValueError, match="start codes"):
        H.decode_h264_annexb(b"not a stream at all")
    with pytest.raises(ValueError, match="no IDR"):
        H.decode_h264_nals([(3, 7, H._write_sps(s))])
    # CABAC PPS rejects
    w = H._BitWriter()
    w.ue(0); w.ue(0); w.u(1, 1); w.u(0, 1); w.ue(0)
    w.rbsp_trailing()
    with pytest.raises(ValueError, match="CABAC"):
        H.parse_pps(w.getvalue())


def test_mutation_never_hangs_or_crashes_unhandled():
    """Random single-byte corruptions must either decode (harmless
    field) or raise ValueError — never hang, never crash with an
    unexpected exception type, never return a wrong-shaped frame."""
    import random

    y, cb, cr = _img("edges", 32, 32)
    blob, _ = H.encode_h264_annexb(y, cb, cr, qp=24)
    rng = random.Random(1311)
    outcomes = {"ok": 0, "reject": 0}
    for _ in range(300):
        mut = bytearray(blob)
        mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            dy, dcb, dcr = H.decode_h264_annexb(bytes(mut))
            assert dy.shape[0] % 2 == 0 and dy.shape[1] % 2 == 0
            assert dcb.shape == (dy.shape[0] // 2, dy.shape[1] // 2)
            outcomes["ok"] += 1
        except (ValueError, IndexError):
            outcomes["reject"] += 1
    assert outcomes["reject"] > 100, outcomes  # most flips must reject


def test_avcc_sample_path():
    y, cb, cr = _img("gradient", 32, 32)
    blob, recon = H.encode_h264_annexb(y, cb, cr, qp=22)
    nals = list(H.parse_annexb(blob))
    sps = next(r for _, t, r in nals if t == 7)
    pps = next(r for _, t, r in nals if t == 8)
    idr = next(r for _, t, r in nals if t == 5)
    avcc = H.build_avcc(sps, pps)
    sps_l, pps_l, lsz = H.parse_avcc(avcc)
    assert lsz == 4 and len(sps_l) == 1 and len(pps_l) == 1
    nal = bytes([0x65]) + H._escape_rbsp(idr)
    sample = len(nal).to_bytes(4, "big") + nal
    dy, dcb, dcr = H.decode_h264_avcc_sample(avcc, sample)
    assert np.array_equal(dy, recon[0]) and np.array_equal(dcb, recon[1])
    with pytest.raises(ValueError):
        H.parse_avcc(b"\x02junk")
    with pytest.raises(ValueError, match="overruns"):
        H.decode_h264_avcc_sample(avcc, sample[:-3])


def test_spark_operator_iframe_features(spark):
    y, cb, cr = _img("gradient", 32, 48)
    blob, recon = H.encode_h264_annexb(y, cb, cr, qp=30)
    rows = [(1, bytearray(blob)), (2, bytearray(b"garbage" * 10)), (3, None)]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    got = {r.media_id: r for r in H.h264_iframe_features(df).collect()}
    assert (got[1].height, got[1].width, got[1].qp) == (32, 48, 30)
    assert got[1].mean_luma == pytest.approx(float(np.mean(recon[0])))
    assert got[2].height is None and got[3].height is None
    plan = H.h264_iframe_features(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
