"""JBIG2 (ITU-T T.88) — the embedded-in-PDF organization, from scratch.

Archival scanned PDFs carry their bilevel page images as /JBIG2Decode
XObjects (ISO 32000 §7.4.7) at least as often as /CCITTFaxDecode — the
same corpora that motivated functions/ccitt.py. The reference reads them
through Leptonica's PDF path (SetImage sniff, /root/reference/src/api/
baseapi.cpp:881). Scope: the segment stream (T.88 §7.2 headers, embedded
organization, no file header), page-info composition, and BOTH generic
region coding families — MMR=1 (whose coded data IS T.6/G4, so the
decoder is ccitt.g4_decode behind a segment walk) and MMR=0, the MQ
arithmetic coder (T.88 §6.2.5.7: GB templates 0-3 with movable AT
pixels, TPGDON typical-prediction rows) — plus the dominant real-world
scanned-PDF organization: arithmetically-coded SYMBOL DICTIONARIES
(§6.5: IADH/IADW height classes, shared generic contexts, IAEX export
runs) and TEXT REGIONS (§6.4: strip/instance placement with all four
reference corners and transposition). The MQ coder itself is shared
with functions/jp2.py (T.88 Annex E and T.800 Annex C specify the same
coder). Huffman-coded segments, refinement/aggregate coding and
halftone segments raise NAMED out-of-scope errors at their exact seams.

The fixture encoders emit the same organizations (page info + immediate
generic regions + end-of-page; page info + symbol dictionary in
/JBIG2Globals + immediate text region in-stream) so PDF fixtures
roundtrip bit-exactly on two-level ink, like the CCITT families.
"""

from __future__ import annotations

import numpy as np

from .ccitt import g4_decode, g4_encode
from .jp2 import MQDecoder, MQEncoder

# segment types (T.88 §7.3)
_T_SYMBOL_DICT = 0
_T_TEXT = (4, 6, 7)
_T_PATTERN = 16
_T_HALFTONE = (20, 22, 23)
_T_GENERIC_INTERMEDIATE = 36
_T_GENERIC_IMMEDIATE = (38, 39)
_T_REFINEMENT = (40, 42, 43)
_T_PAGE_INFO = 48
_T_END_OF_PAGE = 49
_T_END_OF_STRIPE = 50
_T_END_OF_FILE = 51
_T_TABLES = 53
_SKIPPABLE = (49, 50, 51, 52, 62)   # ends / profiles / extensions

_MAX_PIXELS = 64_000_000  # decode-bomb guard, matches the codec family


class _Cursor:
    __slots__ = ("d", "pos")

    def __init__(self, d: bytes, pos: int = 0) -> None:
        self.d = d
        self.pos = pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.d):
            raise ValueError("JBIG2 segment stream truncated")
        b = self.d[self.pos:self.pos + n]
        self.pos += n
        return b

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return int.from_bytes(self.take(2), "big")

    def u32(self) -> int:
        return int.from_bytes(self.take(4), "big")


def _parse_segment_header(c: _Cursor) -> dict:
    """T.88 §7.2 segment header -> dict with type, refs, page, length."""
    number = c.u32()
    flags = c.u8()
    seg_type = flags & 0x3F
    page_4 = bool(flags & 0x40)
    rts = c.u8()
    count = rts >> 5
    if count == 7:
        c.pos -= 1
        count = c.u32() & 0x1FFFFFFF
        c.take((count + 8) // 8)       # retain bits, ceil((count+1)/8)
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    refs = [int.from_bytes(c.take(ref_size), "big") for _ in range(count)]
    page = c.u32() if page_4 else c.u8()
    length = c.u32()
    if length == 0xFFFFFFFF:
        raise ValueError("JBIG2 unknown segment length: out of scope "
                         "(requires generic-region row tracking)")
    return dict(number=number, type=seg_type, refs=refs, page=page,
                length=length)


def _region_info(c: _Cursor) -> dict:
    """Region segment information field (T.88 §7.4.1)."""
    w, h, x, y = c.u32(), c.u32(), c.u32(), c.u32()
    op = c.u8() & 0x07
    return dict(w=w, h=h, x=x, y=y, op=op)


# ------------------------------------------- arithmetic (MQ) machinery
#
# Generic-region context layouts (T.88 figures 4-7). Slots are listed
# MSB->LSB; ("A", k) marks the k-th adaptive (AT) pixel, whose BIT SLOT
# sits at its nominal raster position while its VALUE is read from the
# segment's actual AT coordinates (§6.2.5.3: the context index is the
# raster-order reading of the template with the A slots fixed).

_NOMINAL_AT = {
    0: ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}

_TEMPLATE_SLOTS = {
    0: (("A", 3), (-1, -2), (0, -2), (1, -2), ("A", 2),
        ("A", 1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), ("A", 0),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    1: ((-1, -2), (0, -2), (1, -2), (2, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), ("A", 0),
        (-3, 0), (-2, 0), (-1, 0)),
    2: ((-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), ("A", 0),
        (-2, 0), (-1, 0)),
    3: ((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), ("A", 0),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
}

# TPGDON pseudo-pixel contexts (§6.2.5.7 step 2) and per-template
# nominal row windows for the incremental fast path:
# (r2_lo, r2_hi, r1_lo, r1_hi, cur_len, shift2, shift1)
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}
_FAST_WINDOWS = {
    0: (-2, 2, -3, 3, 4, 11, 4),
    1: (-1, 2, -2, 3, 3, 9, 3),
    2: (-1, 1, -2, 2, 2, 7, 2),
    3: (0, 0, -3, 2, 4, 0, 4),   # no y-2 row: window stays 0
}
_CTX_BITS = {0: 16, 1: 13, 2: 10, 3: 10}

_MAX_SYMBOLS = 65_536          # symbol-count bomb guard
_MAX_INSTANCES = 4_000_000     # text-region instance bomb guard
_MAX_SYM_DIM = 1 << 14


def _bank(n: int) -> list:
    """Fresh MQ context bank: n [state_index, mps] records."""
    return [[0, 0] for _ in range(n)]


def _resolve_slots(template: int, at: tuple) -> list:
    offs = []
    for s in _TEMPLATE_SLOTS[template]:
        if s[0] == "A":
            dx, dy = at[s[1]]
            if not (dy < 0 or (dy == 0 and dx < 0)):
                raise ValueError("JBIG2 AT pixel not strictly causal")
            if abs(dx) > 64 or dy < -64:
                raise ValueError("JBIG2 AT pixel offset out of range")
            offs.append((dx, dy))
        else:
            offs.append(s)
    return offs


def _decode_generic(mq: MQDecoder, cxs: list, w: int, h: int,
                    template: int, at: tuple, tpgdon: bool) -> np.ndarray:
    """T.88 §6.2 generic region decoding procedure, MMR=0."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("JBIG2 generic region size invalid")
    offs = _resolve_slots(template, at)
    pad = max(8, max(abs(dx) for dx, _ in offs) + 1)
    rw = w + 2 * pad
    zero = [0] * rw
    decode = mq.decode
    tctx = cxs[_TPGDON_CTX[template]]
    ltp = 0
    out_rows: list[list[int]] = []
    if tuple(at) == _NOMINAL_AT[template]:
        # incremental sliding-window path (the jbig2dec/pdf.js-style
        # optimization for nominal ATs — identical contexts, ~6 ops/px)
        r2lo, r2hi, r1lo, r1hi, clen, sh2, sh1 = _FAST_WINDOWS[template]
        n2 = r2hi - r2lo + 1
        m2 = ((1 << n2) - 1) if template != 3 else 0
        m1 = (1 << (r1hi - r1lo + 1)) - 1
        mc = (1 << clen) - 1
        row2 = zero
        row1 = zero
        for _y in range(h):
            if tpgdon:
                ltp ^= decode(tctx)
                if ltp:
                    out_rows.append(row1)
                    row2, row1 = row1, row1
                    continue
            cur_row = [0] * rw
            w2 = 0
            if template != 3:
                for dx in range(r2lo, r2hi + 1):
                    w2 = (w2 << 1) | row2[pad + dx]
            w1 = 0
            for dx in range(r1lo, r1hi + 1):
                w1 = (w1 << 1) | row1[pad + dx]
            cur = 0
            p2 = pad + r2hi + 1
            p1 = pad + r1hi + 1
            for x in range(w):
                b = decode(cxs[(w2 << sh2) | (w1 << sh1) | cur])
                if b:
                    cur_row[pad + x] = 1
                cur = ((cur << 1) | b) & mc
                w2 = ((w2 << 1) | row2[p2 + x]) & m2
                w1 = ((w1 << 1) | row1[p1 + x]) & m1
            out_rows.append(cur_row)
            row2, row1 = row1, cur_row
    else:
        # general path: arbitrary AT positions, per-pixel slot reads
        depth = max(-dy for _, dy in offs)
        hist = [zero] * depth          # hist[k] = row y-1-k, padded
        for _y in range(h):
            if tpgdon:
                ltp ^= decode(tctx)
                if ltp:
                    out_rows.append(hist[0] if depth else zero)
                    if depth:
                        hist = [hist[0]] + hist[:-1]
                    continue
            cur_row = [0] * rw
            rows = [cur_row] + hist    # rows[-dy] = row y+dy
            for x in range(w):
                ctx = 0
                for dx, dy in offs:
                    ctx = (ctx << 1) | rows[-dy][pad + x + dx]
                b = decode(cxs[ctx])
                if b:
                    cur_row[pad + x] = 1
            out_rows.append(cur_row)
            if depth:
                hist = [cur_row] + hist[:-1]
    bitmap = np.zeros((h, w), np.uint8)
    for y, r in enumerate(out_rows):
        bitmap[y] = r[pad:pad + w]
    return bitmap


def _encode_generic(enc: MQEncoder, cxs: list, bits: np.ndarray,
                    template: int, at: tuple, tpgdon: bool) -> None:
    """Mirror of _decode_generic (runs once at fixture-build time, so the
    general per-pixel path is enough)."""
    h, w = bits.shape
    offs = _resolve_slots(template, at)
    pad = max(8, max(abs(dx) for dx, _ in offs) + 1)
    rw = w + 2 * pad
    zero = [0] * rw
    depth = max(-dy for _, dy in offs)
    hist = [zero] * depth
    tctx = cxs[_TPGDON_CTX[template]]
    ltp = 0
    prev: list[int] | None = None
    for y in range(h):
        row = [0] * pad + [int(v) for v in bits[y]] + [0] * pad
        if tpgdon:
            typical = row == (prev if prev is not None else zero)
            enc.encode(ltp ^ typical, tctx)
            ltp = typical
            if ltp:
                prev = row
                if depth:
                    hist = [row] + hist[:-1]
                continue
        rows = [row] + hist
        for x in range(w):
            ctx = 0
            for dx, dy in offs:
                ctx = (ctx << 1) | rows[-dy][pad + x + dx]
            enc.encode(row[pad + x], cxs[ctx])
        prev = row
        if depth:
            hist = [row] + hist[:-1]


# Annex A: arithmetic integer decoding (IADH/IADW/IAEX/IAAI/IADT/IAFS/
# IADS/IAIT all share this procedure over 512-record context banks) and
# the IAID symbol-code variant.


def _int_decode(mq: MQDecoder, bank: list) -> int | None:
    """Annex A.2 -> value, or None for OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = mq.decode(bank[prev])
        prev = ((prev << 1) | b) if prev < 256 else \
            (((((prev << 1) | b) & 511) | 256))
        return b

    def bits(n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | bit()
        return v

    s = bit()
    if not bit():
        v = bits(2)
    elif not bit():
        v = bits(4) + 4
    elif not bit():
        v = bits(6) + 20
    elif not bit():
        v = bits(8) + 84
    elif not bit():
        v = bits(12) + 340
    else:
        v = bits(32) + 4436
    if s and v == 0:
        return None
    return -v if s else v


def _int_encode(enc: MQEncoder, bank: list, value: int | None) -> None:
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(b, bank[prev])
        prev = ((prev << 1) | b) if prev < 256 else \
            (((((prev << 1) | b) & 511) | 256))

    if value is None:                      # OOB = sign 1, magnitude 0
        bit(1)
        bit(0)
        bit(0)
        bit(0)
        return
    s = 1 if value < 0 else 0
    v = -value if value < 0 else value
    bit(s)
    for bound, n, off, prefix in ((4, 2, 0, (0,)),
                                  (20, 4, 4, (1, 0)),
                                  (84, 6, 20, (1, 1, 0)),
                                  (340, 8, 84, (1, 1, 1, 0)),
                                  (4436, 12, 340, (1, 1, 1, 1, 0)),
                                  (None, 32, 4436, (1, 1, 1, 1, 1))):
        if bound is None or v < bound:
            for p in prefix:
                bit(p)
            d = v - off
            for i in range(n - 1, -1, -1):
                bit((d >> i) & 1)
            return


def _iaid_decode(mq: MQDecoder, bank: list, codelen: int) -> int:
    prev = 1
    for _ in range(codelen):
        prev = (prev << 1) | mq.decode(bank[prev])
    return prev - (1 << codelen)


def _iaid_encode(enc: MQEncoder, bank: list, value: int,
                 codelen: int) -> None:
    prev = 1
    for i in range(codelen - 1, -1, -1):
        b = (value >> i) & 1
        enc.encode(b, bank[prev])
        prev = (prev << 1) | b


def _s8(b: int) -> int:
    return b - 256 if b >= 128 else b


def _read_at(body: _Cursor, n: int) -> tuple:
    return tuple((_s8(body.u8()), _s8(body.u8())) for _ in range(n))


def _decode_symbol_dict(body: _Cursor, input_syms: list) -> list:
    """§6.5 symbol dictionary decoding, arithmetic organization only ->
    exported symbol bitmaps in decode order."""
    flags = body.u16()
    if flags & 0x01:
        raise ValueError("JBIG2 Huffman-coded symbol dictionary: out of "
                         "scope (arithmetic supported)")
    if flags & 0x02:
        raise ValueError("JBIG2 refinement/aggregate symbol coding: out "
                         "of scope")
    if flags & 0x100 or flags & 0x200:
        raise ValueError("JBIG2 bitmap coding context import/export: out "
                         "of scope")
    template = (flags >> 10) & 3
    at = _read_at(body, 4 if template == 0 else 1)
    num_ex = body.u32()
    num_new = body.u32()
    if num_new > _MAX_SYMBOLS or num_ex > _MAX_SYMBOLS:
        raise ValueError("JBIG2 symbol dictionary too large")
    mq = MQDecoder(body.d[body.pos:])
    iadh, iadw, iaex = _bank(512), _bank(512), _bank(512)
    gcx = _bank(1 << _CTX_BITS[template])
    newsyms: list[np.ndarray] = []
    hcheight = 0
    total_px = 0
    classes = 0
    while len(newsyms) < num_new:
        classes += 1
        if classes > num_new + 64:
            raise ValueError("JBIG2 symbol dictionary: runaway height "
                             "classes")
        dh = _int_decode(mq, iadh)
        if dh is None:
            raise ValueError("JBIG2 OOB height-class delta")
        hcheight += dh
        if not 0 < hcheight <= _MAX_SYM_DIM:
            raise ValueError("JBIG2 symbol height out of range")
        symwidth = 0
        while True:
            dw = _int_decode(mq, iadw)
            if dw is None:
                break
            symwidth += dw
            if not 0 < symwidth <= _MAX_SYM_DIM:
                raise ValueError("JBIG2 symbol width out of range")
            if len(newsyms) >= num_new:
                raise ValueError("JBIG2 symbol count overflow")
            total_px += symwidth * hcheight
            if total_px > _MAX_PIXELS:
                raise ValueError("JBIG2 symbol dictionary pixel bomb")
            newsyms.append(_decode_generic(mq, gcx, symwidth, hcheight,
                                           template, at, False))
    # §6.5.10 export flags: alternating not-exported/exported runs over
    # input symbols followed by new symbols
    allsyms = input_syms + newsyms
    exported: list[np.ndarray] = []
    i = 0
    cur = 0
    runs = 0
    while i < len(allsyms):
        runs += 1
        if runs > 2 * len(allsyms) + 2:
            raise ValueError("JBIG2 symbol export: runaway runs")
        run = _int_decode(mq, iaex)
        if run is None or run < 0 or i + run > len(allsyms):
            raise ValueError("JBIG2 symbol export run invalid")
        if cur:
            exported.extend(allsyms[i:i + run])
        i += run
        cur ^= 1
    if len(exported) != num_ex:
        raise ValueError("JBIG2 symbol export count mismatch")
    return exported


def _decode_text_region(body: _Cursor, ri: dict,
                        syms: list) -> np.ndarray:
    """§6.4 text region decoding, arithmetic organization only."""
    flags = body.u16()
    if flags & 0x01:
        raise ValueError("JBIG2 Huffman-coded text region: out of scope "
                         "(arithmetic supported)")
    if flags & 0x02:
        raise ValueError("JBIG2 refined text region: out of scope")
    strips = 1 << ((flags >> 2) & 3)
    refcorner = (flags >> 4) & 3           # 0 BL, 1 TL, 2 BR, 3 TR
    transposed = (flags >> 6) & 1
    combop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    num_inst = body.u32()
    if not syms:
        raise ValueError("JBIG2 text region with no referred symbols")
    if num_inst > _MAX_INSTANCES:
        raise ValueError("JBIG2 text region instance bomb")
    codelen = max(1, (len(syms) - 1).bit_length())
    w, h = ri["w"], ri["h"]
    if w * h > _MAX_PIXELS:
        raise ValueError("JBIG2 region too large")
    region = np.full((h, w), defpixel, np.uint8)
    mq = MQDecoder(body.d[body.pos:])
    iadt, iafs, iads, iait = _bank(512), _bank(512), _bank(512), _bank(512)
    iaid = _bank(1 << (codelen + 1))
    first_dt = _int_decode(mq, iadt)
    if first_dt is None:
        raise ValueError("JBIG2 OOB strip T")
    stript = -first_dt * strips
    firsts = 0
    inst = 0
    strips_seen = 0
    while inst < num_inst:
        strips_seen += 1
        if strips_seen > num_inst + _MAX_SYM_DIM:
            raise ValueError("JBIG2 text region: runaway strips")
        dt = _int_decode(mq, iadt)
        if dt is None:
            raise ValueError("JBIG2 OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = _int_decode(mq, iafs)
                if dfs is None:
                    raise ValueError("JBIG2 OOB first S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = _int_decode(mq, iads)
                if ids is None:
                    break
                curs += ids + dsoffset
            if inst >= num_inst:
                raise ValueError("JBIG2 text region instance overflow")
            curt = _int_decode(mq, iait) if strips > 1 else 0
            if curt is None:
                raise ValueError("JBIG2 OOB instance T")
            t = stript + curt
            sid = _iaid_decode(mq, iaid, codelen)
            if sid >= len(syms):
                raise ValueError("JBIG2 symbol id out of range")
            sym = syms[sid]
            sh, sw = sym.shape
            # §6.4.5 (3)(c): RIGHT corners advance S before drawing,
            # LEFT corners after; transposed swaps the roles of S/T and
            # the advance becomes the symbol height
            if not transposed:
                if refcorner in (2, 3):
                    curs += sw - 1
                x0 = curs - (sw - 1 if refcorner in (2, 3) else 0)
                y0 = t - (sh - 1 if refcorner in (0, 2) else 0)
            else:
                if refcorner in (0, 2):
                    curs += sh - 1
                y0 = curs - (sh - 1 if refcorner in (0, 2) else 0)
                x0 = t - (sw - 1 if refcorner in (2, 3) else 0)
            # clip to the region (tolerant, like the page composition)
            sy0, sx0 = max(0, -y0), max(0, -x0)
            sy1 = min(sh, h - y0)
            sx1 = min(sw, w - x0)
            if sy1 > sy0 and sx1 > sx0:
                tgt = region[y0 + sy0:y0 + sy1, x0 + sx0:x0 + sx1]
                src = sym[sy0:sy1, sx0:sx1]
                if combop == 0:
                    tgt |= src
                elif combop == 1:
                    tgt &= src
                elif combop == 2:
                    tgt ^= src
                else:
                    raise ValueError("JBIG2 XNOR text composition: out "
                                     "of scope")
            if not transposed:
                if refcorner in (0, 1):
                    curs += sw - 1
            else:
                if refcorner in (1, 3):
                    curs += sh - 1
            inst += 1
    return region


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded JBIG2 stream (+ optional /JBIG2Globals bytes) -> bilevel
    page bitmap, uint8 HxW with 1 = black.  MMR generic regions only;
    every other coding family raises a NAMED out-of-scope error."""
    c = _Cursor(globals_data + data)
    page_w = page_h = None
    page_default = 0
    page: np.ndarray | None = None
    sym_store: dict[int, list] = {}

    def compose(ri: dict, bits: np.ndarray) -> None:
        nonlocal page, page_w, page_h
        if page is None:
            # standalone region (a PDF producer may omit page info)
            page = np.zeros((ri["y"] + ri["h"], ri["x"] + ri["w"]),
                            np.uint8)
            page_h, page_w = page.shape
        ys, xs = ri["y"], ri["x"]
        if ys + ri["h"] > page_h or xs + ri["w"] > page_w:
            raise ValueError("JBIG2 region outside page bounds")
        tgt = page[ys:ys + ri["h"], xs:xs + ri["w"]]
        if ri["op"] == 0:                  # OR
            tgt |= bits
        elif ri["op"] == 1:                # AND
            tgt &= bits
        elif ri["op"] == 2:                # XOR
            tgt ^= bits
        elif ri["op"] == 4:                # REPLACE
            tgt[:] = bits
        else:
            raise ValueError("JBIG2 XNOR composition: out of scope")

    while c.pos < len(c.d):
        seg = _parse_segment_header(c)
        body = _Cursor(c.take(seg["length"]))
        t = seg["type"]
        if t == _T_PAGE_INFO:
            page_w, page_h = body.u32(), body.u32()
            body.u32()                      # x resolution
            body.u32()                      # y resolution
            pflags = body.u8()
            page_default = (pflags >> 2) & 1
            if page_h == 0xFFFFFFFF:
                raise ValueError("JBIG2 unknown page height: out of scope")
            if page_w * page_h > _MAX_PIXELS:
                raise ValueError("JBIG2 page too large")
            page = np.full((page_h, page_w), page_default, np.uint8)
        elif t in _T_GENERIC_IMMEDIATE or t == _T_GENERIC_INTERMEDIATE:
            if t == _T_GENERIC_INTERMEDIATE:
                raise ValueError("JBIG2 intermediate generic region: out "
                                 "of scope (immediate regions supported)")
            ri = _region_info(body)
            gflags = body.u8()
            if ri["w"] * ri["h"] > _MAX_PIXELS:
                raise ValueError("JBIG2 region too large")
            if gflags & 0x01:                       # MMR=1: T.6 data
                if gflags & 0x08:
                    raise ValueError("JBIG2 TPGDON with MMR: invalid "
                                     "stream")
                bits = g4_decode(body.d[body.pos:], ri["w"], ri["h"])
            else:                                   # MMR=0: MQ coder
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 0x08)
                at = _read_at(body, 4 if template == 0 else 1)
                mq = MQDecoder(body.d[body.pos:])
                cxs = _bank(1 << _CTX_BITS[template])
                bits = _decode_generic(mq, cxs, ri["w"], ri["h"],
                                       template, at, tpgdon)
            compose(ri, bits)
        elif t == _T_SYMBOL_DICT:
            input_syms: list = []
            for r in seg["refs"]:
                input_syms.extend(sym_store.get(r, []))
            sym_store[seg["number"]] = _decode_symbol_dict(body, input_syms)
        elif t in _T_TEXT:
            if t == 4:
                raise ValueError("JBIG2 intermediate text region: out of "
                                 "scope (immediate regions supported)")
            syms: list = []
            for r in seg["refs"]:
                syms.extend(sym_store.get(r, []))
            ri = _region_info(body)
            compose(ri, _decode_text_region(body, ri, syms))
        elif t == _T_PATTERN or t in _T_HALFTONE:
            raise ValueError("JBIG2 halftone segments: out of scope")
        elif t in _T_REFINEMENT:
            raise ValueError("JBIG2 refinement segments: out of scope")
        elif t == _T_TABLES:
            raise ValueError("JBIG2 custom code tables: out of scope")
        elif t in _SKIPPABLE:
            pass
        else:
            raise ValueError(f"JBIG2 unknown segment type {t}")
    if page is None:
        raise ValueError("JBIG2 stream has no region")
    return page


# ---------------------------------------------------------------- encode


def _segment_header(number: int, seg_type: int, page: int,
                    length: int, refs: list[int] | None = None) -> bytes:
    refs = refs or []
    out = number.to_bytes(4, "big")
    out += bytes([seg_type & 0x3F])          # 1-byte page association
    out += bytes([len(refs) << 5])           # short form, retain bits 0
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    for r in refs:
        out += r.to_bytes(ref_size, "big")
    out += bytes([page])
    out += length.to_bytes(4, "big")
    return out


def _page_info_segment(w: int, h: int) -> bytes:
    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                 + bytes([0]) + (0).to_bytes(2, "big"))
    return _segment_header(0, _T_PAGE_INFO, 1, len(page_info)) + page_info


def encode_jbig2(bits: np.ndarray, stripes: int = 1, coder: str = "mmr",
                 template: int = 0, tpgdon: bool = False) -> bytes:
    """Bilevel HxW (1 = black) -> embedded JBIG2 stream: page info +
    `stripes` immediate lossless generic regions (stacked bands, OR
    composition — exercises region placement) + end-of-page. `coder` is
    "mmr" (T.6 data) or "arith" (MQ, GB `template` 0-3, optional
    TPGDON typical-prediction rows)."""
    h, w = bits.shape
    out = bytearray()
    out += _page_info_segment(w, h)
    band = (h + stripes - 1) // stripes
    seg_n = 1
    for i in range(stripes):
        y0 = i * band
        sub = bits[y0:min(y0 + band, h)]
        if not sub.size:
            break
        if coder == "mmr":
            coded = bytes([0x01]) + g4_encode(sub)       # flags: MMR=1
        else:
            at = _NOMINAL_AT[template]
            enc = MQEncoder()
            cxs = _bank(1 << _CTX_BITS[template])
            _encode_generic(enc, cxs, sub, template, at, tpgdon)
            gflags = (template << 1) | (0x08 if tpgdon else 0)
            atb = b"".join(bytes([dx & 0xFF, dy & 0xFF]) for dx, dy in at)
            coded = bytes([gflags]) + atb + enc.flush()
        body = (w.to_bytes(4, "big") + sub.shape[0].to_bytes(4, "big")
                + (0).to_bytes(4, "big") + y0.to_bytes(4, "big")
                + bytes([0])              # external combination op OR
                + coded)
        out += _segment_header(seg_n, 39, 1, len(body)) + body
        seg_n += 1
    out += _segment_header(seg_n, _T_END_OF_PAGE, 1, 0)
    return bytes(out)


def _encode_symbol_dict(number: int, syms: list) -> bytes:
    """Arithmetic symbol dictionary segment: height classes ascending,
    widths ascending inside each class, all new symbols exported."""
    at = _NOMINAL_AT[0]
    enc = MQEncoder()
    iadh, iadw, iaex = _bank(512), _bank(512), _bank(512)
    gcx = _bank(1 << _CTX_BITS[0])
    hcheight = 0
    i = 0
    while i < len(syms):
        h = syms[i].shape[0]
        _int_encode(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(syms) and syms[i].shape[0] == h:
            w = syms[i].shape[1]
            _int_encode(enc, iadw, w - symwidth)
            symwidth = w
            _encode_generic(enc, gcx, syms[i], 0, at, False)
            i += 1
        _int_encode(enc, iadw, None)                     # OOB ends class
    _int_encode(enc, iaex, 0)                            # no unexported run
    _int_encode(enc, iaex, len(syms))                    # export all
    atb = b"".join(bytes([dx & 0xFF, dy & 0xFF]) for dx, dy in at)
    body = ((0).to_bytes(2, "big")                       # flags: arith, T0
            + atb
            + len(syms).to_bytes(4, "big")               # SDNUMEXSYMS
            + len(syms).to_bytes(4, "big")               # SDNUMNEWSYMS
            + enc.flush())
    return _segment_header(number, _T_SYMBOL_DICT, 1, len(body)) + body


def _encode_text_region(number: int, dict_seg: int, w: int, h: int,
                        syms: list, instances: list,
                        refcorner: int = 1, transposed: int = 0) -> bytes:
    """Immediate text region segment (type 6). `instances` is a list of
    (symbol_id, x_left, y_top) placements; strips of 1."""
    codelen = max(1, (len(syms) - 1).bit_length())
    enc = MQEncoder()
    iadt, iafs, iads = _bank(512), _bank(512), _bank(512)
    iaid = _bank(1 << (codelen + 1))
    # group into strips: non-transposed strips share y, transposed share x
    def strip_key(it):
        sid, x, y = it
        sh, sw = syms[sid].shape
        if not transposed:
            return y + (sh - 1 if refcorner in (0, 2) else 0)
        return x + (sw - 1 if refcorner in (2, 3) else 0)

    def s_coord(it):
        # the S chain tracks the leading (left/top) edge at entry for ALL
        # corners — the decoder pre-advances CURS for trailing corners
        sid, x, y = it
        return y if transposed else x

    order = sorted(instances, key=lambda it: (strip_key(it), s_coord(it)))
    _int_encode(enc, iadt, 0)                            # STRIPT = 0
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(order):
        t = strip_key(order[k])
        _int_encode(enc, iadt, t - prev_t)
        prev_t = t
        first = True
        curs = 0
        while k < len(order) and strip_key(order[k]) == t:
            sid, _x, _y = order[k]
            s = s_coord(order[k])
            if first:
                _int_encode(enc, iafs, s - firsts)
                firsts = s
                first = False
            else:
                _int_encode(enc, iads, s - curs)
            _iaid_encode(enc, iaid, sid, codelen)
            sh, sw = syms[sid].shape
            curs = s + ((sh if transposed else sw) - 1)
            k += 1
        _int_encode(enc, iads, None)                     # OOB ends strip
    flags = (refcorner << 4) | (transposed << 6)         # arith, strips=1
    body = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
            + bytes([0])                                 # region op OR
            + flags.to_bytes(2, "big")
            + len(order).to_bytes(4, "big")
            + enc.flush())
    return _segment_header(number, 6, 1, len(body), refs=[dict_seg]) + body


def encode_jbig2_text(bits: np.ndarray, refcorner: int = 1,
                      transposed: int = 0) -> tuple[bytes, bytes]:
    """Bilevel HxW -> (stream, globals): the dominant real-world scanned
    organization — the page's connected components deduplicated into an
    arithmetic symbol dictionary (carried in /JBIG2Globals, like Acrobat
    writes shared dictionaries) and placed by an immediate text region
    in-stream. OR-composited ink crops reproduce the page bit-exactly.
    Falls back to a generic region when the page has no ink."""
    from .cclabel import label_blobs

    h, w = bits.shape
    blobs = label_blobs(bits.astype(bool))
    if len(blobs) == 0:
        full = encode_jbig2(bits, coder="arith")
        split = 11 + 19                   # page-info header + body
        return full[split:], full[:split]
    uniq: dict[bytes, int] = {}
    sym_list: list[np.ndarray] = []
    instances: list[tuple[int, int, int]] = []
    for i in range(len(blobs)):
        t, b = int(blobs.top[i]), int(blobs.bottom[i])
        l, r = int(blobs.left[i]), int(blobs.right[i])
        crop = np.ascontiguousarray(bits[t:b + 1, l:r + 1])
        key = crop.shape[1].to_bytes(4, "big") + crop.tobytes()
        sid = uniq.get(key)
        if sid is None:
            sid = len(sym_list)
            uniq[key] = sid
            sym_list.append(crop)
        instances.append((sid, l, t))
    # decode order is (height, width) ascending — remap ids to match
    perm = sorted(range(len(sym_list)),
                  key=lambda i: (sym_list[i].shape[0], sym_list[i].shape[1]))
    remap = {old: new for new, old in enumerate(perm)}
    syms = [sym_list[i] for i in perm]
    instances = [(remap[sid], x, y) for sid, x, y in instances]
    glob = _page_info_segment(w, h) + _encode_symbol_dict(1, syms)
    stream = (_encode_text_region(2, 1, w, h, syms, instances,
                                  refcorner, transposed)
              + _segment_header(3, _T_END_OF_PAGE, 1, 0))
    return stream, glob
