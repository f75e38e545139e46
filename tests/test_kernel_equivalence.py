"""Equivalence pins for the round-3 kernel optimization pass.

Each optimization replaced a straightforward numpy formulation with a
faster one arguing value-identity (reduceat grouping, partition-based
median, separable dilation, integer block sums). These tests encode those
equivalence arguments permanently: every optimized primitive is compared
against its direct reference formulation over seeded fuzz cases, so a
future "optimization of the optimization" that drifts by one ulp or one
tie-break fails here rather than in a span diff at sf0.1.
"""

from __future__ import annotations

import numpy as np

from sparkstract.functions.cclabel import label_blobs
from sparkstract.functions.geometry import fast_median
from sparkstract.functions.otsu import normalize_background


def _naive_components(ink: np.ndarray):
    """8-connected components by stack flood fill — the definitional
    reference for label_blobs (bbox + area per component, sorted)."""
    h, w = ink.shape
    seen = np.zeros_like(ink, dtype=bool)
    comps = []
    for y in range(h):
        for x in range(w):
            if ink[y, x] and not seen[y, x]:
                stack = [(y, x)]
                seen[y, x] = True
                px = []
                while stack:
                    cy, cx = stack.pop()
                    px.append((cy, cx))
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            ny, nx = cy + dy, cx + dx
                            if (0 <= ny < h and 0 <= nx < w
                                    and ink[ny, nx] and not seen[ny, nx]):
                                seen[ny, nx] = True
                                stack.append((ny, nx))
                ys = [p[0] for p in px]
                xs = [p[1] for p in px]
                comps.append((min(xs), min(ys), max(xs), max(ys), len(px)))
    return sorted(comps)


def test_label_blobs_matches_flood_fill():
    rng = np.random.default_rng(7)
    for i in range(40):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        dens = [0.05, 0.2, 0.5, 0.8][i % 4]
        ink = rng.random((h, w)) < dens
        b = label_blobs(ink)
        got = sorted(zip(b.left.tolist(), b.top.tolist(),
                         b.right.tolist(), b.bottom.tolist(),
                         b.area.tolist()))
        assert got == _naive_components(ink), (i, h, w, dens)


def test_label_blobs_pathological_shapes():
    # tall 1px rule (the long run-chain case pointer jumping exists for),
    # full page, empty page, checkerboard (max component count)
    cases = [
        np.zeros((40, 40), dtype=bool),
        np.ones((40, 40), dtype=bool),
        np.eye(40, dtype=bool),
    ]
    rule = np.zeros((64, 9), dtype=bool)
    rule[:, 4] = True
    cases.append(rule)
    checker = np.zeros((20, 20), dtype=bool)
    checker[::2, ::2] = True
    cases.append(checker)
    for ink in cases:
        b = label_blobs(ink)
        got = sorted(zip(b.left.tolist(), b.top.tolist(),
                         b.right.tolist(), b.bottom.tolist(),
                         b.area.tolist()))
        assert got == _naive_components(ink)


def test_fast_median_matches_np_median():
    rng = np.random.default_rng(1)
    for i in range(4000):
        n = int(rng.integers(1, 40))
        kind = i % 3
        if kind == 0:
            a = rng.integers(-1000, 1000, n)
        elif kind == 1:
            a = rng.normal(0, 100, n)
        else:
            a = rng.integers(0, 5, n).astype(np.float64)
        assert fast_median(a) == float(np.median(a))
    # list input (page.py body-scale site passes a plain list)
    assert fast_median([3, 1, 2]) == 2.0
    assert fast_median([4, 1, 2, 3]) == 2.5


def _naive_normalize(gray: np.ndarray, cell: int = 24,
                     floor: int = 128) -> np.ndarray:
    """The original roll-based formulation of normalize_background."""
    h, w = gray.shape
    ncy, ncx = -(-h // cell), -(-w // cell)
    padded = np.full((ncy * cell, ncx * cell), 0, dtype=np.uint8)
    padded[:h, :w] = gray
    bg = padded.reshape(ncy, cell, ncx, cell).max(axis=(1, 3)) \
        .astype(np.float64)
    dil = bg.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = np.roll(np.roll(bg, dy, 0), dx, 1)
            if dy == -1:
                shifted[-1, :] = 0
            if dy == 1:
                shifted[0, :] = 0
            if dx == -1:
                shifted[:, -1] = 0
            if dx == 1:
                shifted[:, 0] = 0
            dil = np.maximum(dil, shifted)
    dil = np.where(dil < floor, 255.0, dil)
    bg_full = np.repeat(np.repeat(dil, cell, axis=0), cell, axis=1)[:h, :w]
    out = np.clip(gray.astype(np.float64) / bg_full * 255.0, 0, 255)
    return out.astype(np.uint8)


def test_normalize_background_matches_roll_formulation():
    rng = np.random.default_rng(0)
    for i in range(24):
        h, w = int(rng.integers(5, 300)), int(rng.integers(5, 300))
        mode = i % 3
        if mode == 0:
            g = rng.integers(0, 256, (h, w)).astype(np.uint8)
        elif mode == 1:
            g = np.full((h, w), 255, np.uint8)
            g[rng.random((h, w)) < 0.05] = 0
        else:
            grad = np.linspace(120, 255, w)[None, :]
            g = (np.ones((h, 1)) * grad).astype(np.uint8)
            g[rng.random((h, w)) < 0.05] = 10
        assert np.array_equal(normalize_background(g), _naive_normalize(g))


def test_integer_blocksum_threshold_equals_float_mean():
    # sum * 2 > s*s  <=>  mean > 0.5 for bool blocks — over every possible
    # (sum, s) pair the kernel can see
    for s in range(1, 9):
        for tot in range(0, s * s + 1):
            as_mean = (tot / (s * s)) > 0.5
            as_int = tot * 2 > s * s
            assert as_mean == as_int, (s, tot)
