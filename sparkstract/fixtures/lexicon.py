"""Shared wordlist — the Dawg seam (K4's dictionary half).

The reference's beam decoder consults word Dawgs loaded from traineddata
(/root/reference/src/dict/dawg.h:385 DawgPositionVector walked by
RecodeBeamSearch's DecodeStep, recodebeam.cpp:87): the language pack ships
the dictionary, and recognition prefers top-k paths that form dictionary
words. Our model seam is the same shape as the glyph LUT (fixtures/font.py,
C11): the fixture generator draws its words from this list, and the
kernel's beam re-decode (operators/page.py _decode_row) consults it as the
dictionary — swap in a real wordlist the way you'd swap in a real model.
"""

from __future__ import annotations

WORDS: tuple[str, ...] = (
    "THE QUICK BROWN FOX JUMPS OVER LAZY DOG SPARK QUERY SCAN JOIN SORT "
    "MERGE BATCH GRID PAGE LINE WORD BLOCK TEXT IMAGE ORDER COLUMN ROW "
    "TABLE INDEX CACHE SHARD TOKEN GLYPH PIXEL RASTER VECTOR STREAM"
).split()

LEXICON: frozenset[str] = frozenset(WORDS)


# Thai wordlist — the dictionary that DEFINES word boundaries: Thai
# writes no inter-word spaces, so segmentation is greedy longest-match
# against this list (the reference's Thai pack drives segmentation from
# its Dawgs the same way). The fixture generator concatenates these
# words into space-less phrase runs; tests/test_thai.py proves greedy
# longest-match recovers every fixture phrase's intended split (the
# list is curated so no fixture concatenation creates a cross-boundary
# longer match).
THAI_WORDS: tuple[str, ...] = (
    "กา", "ขา", "มา", "นา", "ตา", "คน", "นก", "มด", "จาน", "งาน",
)

THAI_LEXICON: frozenset[str] = frozenset(THAI_WORDS)
THAI_MAX_WORD: int = max(len(w) for w in THAI_WORDS)
