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


def binarize(gray: np.ndarray) -> np.ndarray:
    """Gray uint8 -> bool ink mask (True = foreground ink)."""
    t = otsu_threshold(gray)
    if t < 0:
        return np.zeros_like(gray, dtype=bool)
    return gray <= t
