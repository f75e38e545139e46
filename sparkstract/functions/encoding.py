"""Mojibake repair — the fix-encoding pass every web-crawl pipeline runs.

The classic damage: UTF-8 bytes mis-decoded as cp1252/latin-1 somewhere
upstream ("é" -> "Ã©", "’" -> "â€™"). The repair is the standard
table approach (the core of ftfy's most common fix): for a curated set of
frequent targets, the mojibake form is DERIVED at import time as
`char.encode('utf-8').decode('cp1252')` — never transcribed — and applied
as a longest-first chain of plain string replaces, so 3-byte-sequence
damage ("â€™") repairs before its 2-byte prefixes could mis-match.

Assumption, stated plainly: a sequence like "Ã©" is treated as damage,
not as the legitimate text "Ã"+"©" — the right trade for crawl corpora
(the legitimate digraph is vanishingly rare; the damage is everywhere).
`passes=2` additionally repairs double-encoded text (mojibake of
mojibake), a real shape in multiply-relayed feeds — the table closes over
its own mojibake alphabet so the first pass lands exactly on
single-encoded damage.

Scale shape: the whole chain compiles to ONE whole-stage-codegen string
expression — zero joins, zero Python, applied in the same scan as any
other per-doc projection. The DuckDB twin nests the same replaces from
the same generated table, so the oracle pins byte equality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Curated repair targets: the Latin letters and punctuation that dominate
# real multilingual web text. Order in this list is irrelevant — the
# applied chain sorts longest-mojibake-first, then lexicographic.
_TARGETS = (
    # western-European letters (2-byte UTF-8)
    "àáâãäåæçèéêëìíîïñòóôõöøùúûüýÿ"
    "ÀÁÂÄÅÆÇÈÉÊËÌÍÎÏÑÒÓÔÖØÙÚÛÜß"
    # ordinals/symbols in Latin-1
    "¡¿«»°±²³µ·¼½¾×÷¢£¥©®¬¦§¨"
    # Latin Extended-A regulars
    "āăćčďēěğīłńňōœřśšťūůźžż"
    # common punctuation/symbols (3-byte UTF-8)
    "–—‘’‚“”„†‡"
    "•…‰‹›€™"
)


def _sloppy_cp1252(bs: bytes) -> str:
    """cp1252 with latin-1 passthrough for its five undefined bytes
    (0x81/8D/8F/90/9D) — what real lenient decoders do to those bytes
    (ftfy's 'sloppy-windows-1252'); without it the mojibake of e.g. '”'
    (UTF-8 e2 80 9d) would be unrepresentable and unrepairable."""
    return "".join(
        bytes([b]).decode("cp1252") if b not in (0x81, 0x8D, 0x8F, 0x90,
                                                 0x9D) else chr(b)
        for b in bs)


def _build_table() -> list[tuple[str, str]]:
    targets = set(_TARGETS)
    # close over the mojibake ALPHABET itself: double-encoded damage
    # (mojibake of mojibake) repairs to single-encoded damage on pass 1
    # only if every non-ASCII char a first corruption produces is itself
    # a repair target — one closure level suffices for passes=2
    for ch in _TARGETS:
        for c in _sloppy_cp1252(ch.encode("utf-8")):
            if ord(c) >= 0x80:
                targets.add(c)
    out = []
    for ch in sorted(targets):
        moji = _sloppy_cp1252(ch.encode("utf-8"))
        if len(moji) >= 2:
            out.append((moji, ch))
    # longest damage first so multi-byte sequences repair before any
    # 2-char prefix; lexicographic second for determinism
    out.sort(key=lambda t: (-len(t[0]), t[0]))
    return out


MOJIBAKE_TABLE = _build_table()


def fix_mojibake(col: Column, passes: int = 1) -> Column:
    """Repair cp1252-mojibake in a string column (see module docstring).
    passes=2 also unwinds double-encoded damage."""
    out = col
    for _ in range(passes):
        for moji, ch in MOJIBAKE_TABLE:
            out = F.replace(out, F.lit(moji), F.lit(ch))
    return out


def mojibake_sql_chunks(col: str = "t", chunk: int = 60,
                        passes: int = 1) -> list[str]:
    """The DuckDB twin, chunked: the same replace chain as a LIST of
    nested-replace expressions, each over `col` and at most `chunk` deep —
    apply them as successive CTE stages (SQL engines cap expression
    nesting well below the table size; DuckDB at 128)."""
    steps = [(m, c) for _ in range(passes) for m, c in MOJIBAKE_TABLE]
    exprs = []
    for i in range(0, len(steps), chunk):
        out = col
        for moji, ch in steps[i:i + chunk]:
            m = moji.replace("'", "''")
            c = ch.replace("'", "''")
            out = f"replace({out}, '{m}', '{c}')"
        exprs.append(out)
    return exprs
