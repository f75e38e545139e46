"""Otsu global thresholding — the reference's default binarization.

Reimplements the semantics of OtsuStats/OtsuThreshold
(/root/reference/src/ccstruct/otsuthr.cpp:37,115): build a 256-bin histogram,
pick the threshold that maximizes between-class variance
omega0 * omega1 * (mu0 - mu1)^2. Pure numpy — runs inside the decode
mapInPandas kernel (SURVEY.md §2.2 F1/F2), never per-row Python.
"""

from __future__ import annotations

import numpy as np


def otsu_threshold(gray: np.ndarray) -> int:
    """Return t such that ink pixels are gray <= t (dark foreground).

    Degenerate (constant) images return -1 → no ink, matching the
    reference's empty-page early-exit (baseapi.cpp:1333).
    """
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    w0 = np.cumsum(hist)
    w1 = total - w0
    cum = np.cumsum(hist * np.arange(256.0))
    tot = cum[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = np.where(w0 > 0, cum / w0, 0.0)
        mu1 = np.where(w1 > 0, (tot - cum) / w1, 0.0)
    var = w0 * w1 * (mu0 - mu1) ** 2
    if var.max() <= 0.0:
        return -1
    return int(np.argmax(var))


def normalize_background(gray: np.ndarray, cell: int = 24,
                         floor: int = 128) -> np.ndarray:
    """Flatten uneven illumination before global Otsu (the
    Otsu-on-normalized-background threshold variant,
    /root/reference/src/ccmain/thresholder.cpp:454-586 / baseapi.cpp:1485).

    Background is estimated as a 3x3-dilated coarse block maximum (paper is
    the brightest thing in any neighbourhood); each pixel is rescaled by its
    local background. Cells darker than `floor` are treated as content
    (photo interiors, rules) and left un-normalized, so large dark regions
    stay dark. A flat white page normalizes to itself exactly.
    """
    h, w = gray.shape
    ncy, ncx = -(-h // cell), -(-w // cell)
    padded = np.full((ncy * cell, ncx * cell), 0, dtype=np.uint8)
    padded[:h, :w] = gray
    bg = padded.reshape(ncy, cell, ncx, cell).max(axis=(1, 3)).astype(np.float64)
    # separable 3x3 max (vertical then horizontal) over a zero-padded
    # frame — identical to the 8-neighbour dilation with zeroed
    # out-of-edge cells, without nine roll copies
    p = np.zeros((ncy + 2, ncx), dtype=np.float64)
    p[1:-1] = bg
    v = np.maximum(np.maximum(p[:-2], p[1:-1]), p[2:])
    q = np.zeros((ncy, ncx + 2), dtype=np.float64)
    q[:, 1:-1] = v
    dil = np.maximum(np.maximum(q[:, :-2], q[:, 1:-1]), q[:, 2:])
    dil = np.where(dil < floor, 255.0, dil)
    if np.all(dil == 255.0):
        # evenly lit page: g / 255 * 255 is the exact identity for every
        # uint8 value (verified over all 256), so skip the full-page
        # float pass entirely
        return gray
    bg_full = np.repeat(np.repeat(dil, cell, axis=0), cell, axis=1)[:h, :w]
    out = np.clip(gray.astype(np.float64) / bg_full * 255.0, 0, 255)
    return out.astype(np.uint8)


def binarize(gray: np.ndarray) -> np.ndarray:
    """Gray uint8 -> bool ink mask (True = foreground ink). Background is
    normalized first (identity on evenly lit pages), then global Otsu."""
    norm = normalize_background(gray)
    t = otsu_threshold(norm)
    if t < 0:
        return np.zeros_like(gray, dtype=bool)
    return norm <= t
