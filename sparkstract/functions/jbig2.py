"""JBIG2 (ITU-T T.88) — the embedded-in-PDF organization, generic
regions in MMR mode, from scratch.

Archival scanned PDFs carry their bilevel page images as /JBIG2Decode
XObjects (ISO 32000 §7.4.7) at least as often as /CCITTFaxDecode — the
same corpora that motivated functions/ccitt.py. The reference reads them
through Leptonica's PDF path (SetImage sniff, /root/reference/src/api/
baseapi.cpp:881). Scope here mirrors the round-4 plan: the segment
stream (T.88 §7.2 headers: embedded organization, no file header),
page-info composition, and generic region decoding with MMR=1 — whose
coded data IS T.6/G4, so the decoder is ccitt.g4_decode behind a segment
walk. Arithmetic-coded regions (MMR=0, the MQ coder) and
symbol/text/halftone/refinement segment families raise NAMED
out-of-scope errors at their exact seams.

The fixture encoder emits the same organization (page info + immediate
lossless generic regions + end-of-page) so PDF fixtures roundtrip
bit-exactly on two-level ink, like the CCITT families.
"""

from __future__ import annotations

import numpy as np

from .ccitt import g4_decode, g4_encode

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


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded JBIG2 stream (+ optional /JBIG2Globals bytes) -> bilevel
    page bitmap, uint8 HxW with 1 = black.  MMR generic regions only;
    every other coding family raises a NAMED out-of-scope error."""
    c = _Cursor(globals_data + data)
    page_w = page_h = None
    page_default = 0
    page: np.ndarray | None = None
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
            if not gflags & 0x01:
                raise ValueError("JBIG2 arithmetic-coded generic region "
                                 "(MMR=0, MQ coder): out of scope "
                                 "(MMR=1 supported)")
            if gflags & 0x08:
                raise ValueError("JBIG2 TPGDON with MMR: invalid stream")
            if ri["w"] * ri["h"] > _MAX_PIXELS:
                raise ValueError("JBIG2 region too large")
            bits = g4_decode(body.d[body.pos:], ri["w"], ri["h"])
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
        elif t == _T_SYMBOL_DICT or t in _T_TEXT:
            raise ValueError("JBIG2 symbol/text segments: out of scope "
                             "(generic MMR regions supported)")
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


def encode_jbig2(bits: np.ndarray, stripes: int = 1) -> bytes:
    """Bilevel HxW (1 = black) -> embedded JBIG2 stream: page info +
    `stripes` immediate lossless MMR generic regions (stacked bands, OR
    composition — exercises region placement) + end-of-page."""
    h, w = bits.shape
    out = bytearray()
    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                 + bytes([0]) + (0).to_bytes(2, "big"))
    out += _segment_header(0, _T_PAGE_INFO, 1, len(page_info)) + page_info
    band = (h + stripes - 1) // stripes
    seg_n = 1
    for i in range(stripes):
        y0 = i * band
        sub = bits[y0:min(y0 + band, h)]
        if not sub.size:
            break
        body = (w.to_bytes(4, "big") + sub.shape[0].to_bytes(4, "big")
                + (0).to_bytes(4, "big") + y0.to_bytes(4, "big")
                + bytes([0])              # external combination op OR
                + bytes([0x01])           # generic flags: MMR=1
                + g4_encode(sub))
        out += _segment_header(seg_n, 39, 1, len(body)) + body
        seg_n += 1
    out += _segment_header(seg_n, _T_END_OF_PAGE, 1, 0)
    return bytes(out)
