"""Codec dispatch for the media-bytes column — the SetImage seam.

The reference accepts any Leptonica-readable raster and sniffs the format
from the byte stream (SetImage /root/reference/src/api/baseapi.cpp:881,906;
pixReadMem does the magic-number dispatch). Here: PNG (functions/png.py) and
TIFF incl. multipage + LZW (functions/tiff.py). A multipage container yields
several pages from ONE media ref — the ProcessPagesMultipageTiff contract
(baseapi.cpp:1657): downstream block order runs page 1's blocks, then
page 2's, in file order.
"""

from __future__ import annotations

import numpy as np

from .png import decode_gray
from .tiff import decode_gray_tiff

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_pages(data: bytes) -> list[np.ndarray]:
    """Encoded image bytes -> list of uint8 HxW grayscale pages."""
    if data[:8] == _PNG_SIG:
        return [decode_gray(data)]
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_gray_tiff(data)
    raise ValueError("unsupported image format (PNG and TIFF supported)")


def decode_gray_any(data: bytes) -> np.ndarray:
    """First (usually only) page of any supported format."""
    return decode_pages(data)[0]
