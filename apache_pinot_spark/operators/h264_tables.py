"""CAVLC code tables for the baseline H.264 intra codec
(operators/h264.py) — transcriptions of the PUBLIC ITU-T Rec. H.264 /
ISO/IEC 14496-10 spec tables:

  * Table 9-5  coeff_token (three nC-context VLCs + the chroma-DC VLC;
               the nC >= 8 context is a fixed 6-bit code, generated in
               code)
  * Table 9-7/9-8  total_zeros for 4x4 blocks (tzVlcIndex 1..15)
  * Table 9-9  total_zeros for 2x2 chroma-DC blocks (4:2:0)
  * Table 9-10 run_before
  * Table 9-4  coded_block_pattern me(v) mapping (intra column)

Every table is machine-validated by tests/test_h264.py: each VLC must
be prefix-free and cover its full symbol alphabet, and encoder/decoder
round-trips exercise every entry reachable at the fixture sizes. No
reference H.264 codec exists in this environment (no ffmpeg/JCodec/...),
so bit-exact interop against third-party streams is asserted
structurally (prefix-freeness, spec-derived code LENGTH profiles,
self-roundtrip), not against golden third-party bitstreams — the same
stance as the FLAC tier, stated here so nobody mistakes the guarantee.

Codes are bit STRINGS ('0'/'1') keyed by their symbol; the codec builds
encode/decode maps from these at import.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Table 9-5: coeff_token. Key (trailing_ones, total_coeff) -> bit string.
# Context 0: 0 <= nC < 2; context 1: 2 <= nC < 4; context 2: 4 <= nC < 8.
# (nC >= 8 is the fixed-length code, built programmatically by the codec;
# chroma DC uses COEFF_TOKEN_CHROMA_DC.)
# ---------------------------------------------------------------------------

COEFF_TOKEN = (
    {  # 0 <= nC < 2
        (0, 0): "1",
        (0, 1): "000101", (1, 1): "01",
        (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
        (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
        (3, 3): "00011",
        (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
        (3, 4): "000011",
        (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
        (3, 5): "0000100",
        (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101",
        (3, 6): "00000100",
        (0, 7): "0000000001011", (1, 7): "0000000001110",
        (2, 7): "00000000101", (3, 7): "000000100",
        (0, 8): "0000000001000", (1, 8): "0000000001010",
        (2, 8): "0000000001101", (3, 8): "0000000100",
        (0, 9): "00000000001111", (1, 9): "00000000001110",
        (2, 9): "0000000001001", (3, 9): "00000000100",
        (0, 10): "00000000001011", (1, 10): "00000000001010",
        (2, 10): "00000000001101", (3, 10): "0000000001100",
        (0, 11): "000000000001111", (1, 11): "000000000001110",
        (2, 11): "00000000001001", (3, 11): "00000000001100",
        (0, 12): "000000000001011", (1, 12): "000000000001010",
        (2, 12): "000000000001101", (3, 12): "00000000001000",
        (0, 13): "0000000000001111", (1, 13): "000000000000001",
        (2, 13): "000000000001001", (3, 13): "000000000001100",
        (0, 14): "0000000000001011", (1, 14): "0000000000001110",
        (2, 14): "0000000000001101", (3, 14): "000000000001000",
        (0, 15): "0000000000000111", (1, 15): "0000000000001010",
        (2, 15): "0000000000001001", (3, 15): "0000000000001100",
        (0, 16): "0000000000000100", (1, 16): "0000000000000110",
        (2, 16): "0000000000000101", (3, 16): "0000000000001000",
    },
    {  # 2 <= nC < 4
        (0, 0): "11",
        (0, 1): "001011", (1, 1): "10",
        (0, 2): "000111", (1, 2): "00111", (2, 2): "011",
        (0, 3): "0000111", (1, 3): "001010", (2, 3): "001001", (3, 3): "0101",
        (0, 4): "00000111", (1, 4): "000110", (2, 4): "000101", (3, 4): "0100",
        (0, 5): "00000100", (1, 5): "0000110", (2, 5): "0000101",
        (3, 5): "00110",
        (0, 6): "000000111", (1, 6): "00000110", (2, 6): "00000101",
        (3, 6): "001000",
        (0, 7): "00000001111", (1, 7): "000000110", (2, 7): "000000101",
        (3, 7): "000100",
        (0, 8): "00000001011", (1, 8): "00000001110", (2, 8): "00000001101",
        (3, 8): "0000100",
        (0, 9): "000000001111", (1, 9): "00000001010", (2, 9): "00000001001",
        (3, 9): "000000100",
        (0, 10): "000000001011", (1, 10): "000000001110",
        (2, 10): "000000001101", (3, 10): "00000001100",
        (0, 11): "000000001000", (1, 11): "000000001010",
        (2, 11): "000000001001", (3, 11): "00000001000",
        (0, 12): "0000000001111", (1, 12): "0000000001110",
        (2, 12): "0000000001101", (3, 12): "000000001100",
        (0, 13): "0000000001011", (1, 13): "0000000001010",
        (2, 13): "0000000001001", (3, 13): "0000000001100",
        (0, 14): "0000000000111", (1, 14): "00000000001011",
        (2, 14): "0000000000110", (3, 14): "0000000001000",
        (0, 15): "00000000001001", (1, 15): "00000000001000",
        (2, 15): "00000000001010", (3, 15): "0000000000001",
        (0, 16): "00000000000111", (1, 16): "00000000000110",
        (2, 16): "00000000000101", (3, 16): "00000000000100",
    },
    # 4 <= nC < 8: built below from the spec's code-LENGTH profile with a
    # canonical prefix assignment — see _build_vlc2's docstring for the
    # fidelity caveat (the exact codeword VALUES of this one context could
    # not be transcribed verbatim in this environment).
    None,
)


def _build_vlc2() -> dict:
    """coeff_token VLC for 4 <= nC < 8: the spec's code-length profile
    (Table 9-5, third column — 4-bit heads for small TotalCoeff growing
    to a fixed 10-bit tail) with CANONICAL codeword assignment (symbols
    ordered by (total_coeff, trailing_ones), shorter codes numerically
    higher — the convention the other two contexts follow).

    FIDELITY CAVEAT (narrowed r12): the length profile is now
    double-transcribed (tests/test_h264_tables_crosscheck.py carries an
    independently written copy diffed length-by-length) and the
    canonical assignment is second-sourced by an independent builder
    diffed codeword-by-codeword, with a Kraft regression pin; what
    remains unverifiable in this environment is whether the SPEC's
    literal codeword values equal this canonical assignment — so
    third-party bitstreams that exercise the 4 <= nC < 8 context may
    still diverge until the verbatim spec column can be diffed in."""
    lens = {
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
    # canonical assignment: sort by (length, symbol order), allocate
    # codes downward from all-ones so short codes sit at the top of the
    # code space (matching the other contexts' shape)
    order = sorted(lens, key=lambda k: (lens[k], k[1], -k[0]))
    table = {}
    code, prev_len = 0, None
    # classic canonical build upward from zero, then bit-flip so the
    # shortest code is the all-ones head like the sibling contexts
    for sym in order:
        ln = lens[sym]
        if prev_len is None:
            code = 0
        else:
            code = (code + 1) << (ln - prev_len)
        prev_len = ln
        bits = format(code, f"0{ln}b")
        table[sym] = "".join("1" if b == "0" else "0" for b in bits)
    return table


COEFF_TOKEN = (COEFF_TOKEN[0], COEFF_TOKEN[1], _build_vlc2())

#: chroma DC (4:2:0) coeff_token — nC == -1
COEFF_TOKEN_CHROMA_DC = {
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010", (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010",
    (3, 4): "0000000",
}

# ---------------------------------------------------------------------------
# Table 9-7 / 9-8: total_zeros for 4x4 blocks. TOTAL_ZEROS_4x4[tc][tz]
# with tc = TotalCoeff (1..15), tz in 0..(16 - tc).
# ---------------------------------------------------------------------------

TOTAL_ZEROS_4x4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
        "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

#: Table 9-9 (4:2:0): total_zeros for the 2x2 chroma DC block
TOTAL_ZEROS_CHROMA_DC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# ---------------------------------------------------------------------------
# Table 9-10: run_before. RUN_BEFORE[min(zeros_left, 7)][run]
# ---------------------------------------------------------------------------

RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001", "00001",
        "000001", "0000001", "00000001", "000000001", "0000000001",
        "00000000001"],
}

# ---------------------------------------------------------------------------
# Table 9-4: codeNum -> coded_block_pattern for Intra_4x4 / Intra_8x8
# macroblock prediction modes (the me(v) mapping).
# ---------------------------------------------------------------------------

CBP_INTRA_CODENUM_TO_CBP = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]

# ---------------------------------------------------------------------------
# Dequant scale table V (spec 8.5.9): LevelScale for qP % 6, positions
# grouped by (0,0),(2,0),... — v[m][idx] with idx 0 for positions
# (0,0),(0,2),(2,0),(2,2); idx 1 for (1,1),(1,3),(3,1),(3,3); idx 2 rest.
# ---------------------------------------------------------------------------

DEQUANT_V = [
    (10, 16, 13),
    (11, 18, 14),
    (13, 20, 16),
    (14, 23, 18),
    (16, 25, 20),
    (18, 29, 23),
]

#: forward quant multipliers MF (spec-derived, the JM reference encoder's
#: table): MF[m][idx], same position grouping as DEQUANT_V; satisfies
#: MF[m][i] * V[m][i] ~= 2^20 / scale pairing used by the encoder tests
QUANT_MF = [
    (13107, 5243, 8066),
    (11916, 4660, 7490),
    (10082, 4194, 6554),
    (9362, 3647, 5825),
    (8192, 3355, 5243),
    (7282, 2893, 4559),
]

#: zig-zag scan order for a 4x4 block (spec Table 8-13, frame coding)
ZIGZAG_4x4 = (
    (0, 0), (0, 1), (1, 0), (2, 0),
    (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2),
    (1, 3), (2, 3), (3, 2), (3, 3),
)
