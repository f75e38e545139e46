"""Connected-component labeling, run-based min-label propagation, pure numpy.

The reference extracts components by crack-edge outline tracing
(/root/reference/src/textord/edgblob.cpp:343 extract_edges →
outlines_to_blobs :456). We need only per-component statistics — bbox and
area — so we use the classic run-length two-pass algorithm instead of
outline chaining: extract horizontal ink runs per scanline (vectorized),
union runs that 8-overlap between adjacent scanlines, then aggregate stats
per root. No scipy in this container; loops are over *runs* (thousands per
page), never pixels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Blobs:
    """Per-component stats; index = dense blob id (arbitrary stable order)."""

    left: np.ndarray    # int32
    top: np.ndarray     # int32
    right: np.ndarray   # int32, inclusive
    bottom: np.ndarray  # int32, inclusive
    area: np.ndarray    # int64 ink pixel count

    def __len__(self) -> int:
        return int(self.left.shape[0])

    @property
    def width(self) -> np.ndarray:
        return self.right - self.left + 1

    @property
    def height(self) -> np.ndarray:
        return self.bottom - self.top + 1


def label_blobs(ink: np.ndarray) -> Blobs:
    """bool HxW ink mask -> Blobs (8-connectivity)."""
    h, w = ink.shape
    d = np.diff(ink.astype(np.int8), axis=1, prepend=np.int8(0), append=np.int8(0))
    sr, sc = np.nonzero(d == 1)   # run starts, sorted by (row, col)
    _, ec = np.nonzero(d == -1)   # run ends (exclusive), same order
    n = sr.shape[0]
    if n == 0:
        z = np.zeros(0, dtype=np.int32)
        return Blobs(z, z, z, z, z.astype(np.int64))

    parent = np.arange(n, dtype=np.int64)
    # 8-connectivity: run i (row r, [s, e_incl]) touches prev-row run j
    # ([s2, e2_incl]) iff s <= e2_incl + 1 and s2 <= e_incl + 1. Runs are
    # sorted by (row, col), so with composite keys row*BIG + col the
    # overlapping prev runs of EVERY run form a contiguous global index range
    # — two vectorized searchsorteds for the whole page.
    e_incl = ec - 1
    big = np.int64(w + 3)
    key_e = sr * big + e_incl          # ascending (rows grouped, cols sorted)
    key_s = sr * big + sc
    lo = np.searchsorted(key_e, (sr - 1) * big + sc - 1, side="left")
    hi = np.searchsorted(key_s, (sr - 1) * big + e_incl + 1, side="right")
    cnt = np.maximum(hi - lo, 0)
    i_rep = np.repeat(np.arange(n, dtype=np.int64), cnt)
    total = int(cnt.sum())
    if total:
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        j_rep = np.repeat(lo, cnt) + offs
        # vectorized connected labeling: min-label propagation over the run
        # adjacency edges, with pointer jumping (labels = labels[labels]) so
        # long chains (a tall image rect is a path of H runs) converge in
        # O(log H) sweeps instead of H — no per-edge Python.
        # Both scatter-min directions are expressed as grouped reduceat
        # (i_rep is already sorted; the j side is sorted ONCE outside the
        # loop) — buffered ufunc.at is several times slower per sweep
        nz = cnt > 0
        idx_i = np.nonzero(nz)[0]
        seg_i = (np.cumsum(cnt) - cnt)[nz]
        order = np.argsort(j_rep, kind="stable")
        j_sorted = j_rep[order]
        first_j = np.empty(j_sorted.shape[0], dtype=bool)
        first_j[0] = True
        np.not_equal(j_sorted[1:], j_sorted[:-1], out=first_j[1:])
        idx_j = j_sorted[first_j]
        seg_j = np.nonzero(first_j)[0]
        labels = parent
        while True:
            m = labels.copy()
            m[idx_i] = np.minimum(
                m[idx_i], np.minimum.reduceat(labels[j_rep], seg_i))
            m[idx_j] = np.minimum(
                m[idx_j], np.minimum.reduceat(labels[i_rep][order], seg_j))
            while True:
                mm = m[m]
                if (mm == m).all():
                    break
                m = mm
            if (m == labels).all():
                break
            labels = m
        roots = labels
    else:
        roots = parent
    uniq, dense = np.unique(roots, return_inverse=True)
    k = uniq.shape[0]

    left = np.full(k, np.iinfo(np.int32).max, dtype=np.int64)
    right = np.zeros(k, dtype=np.int64)
    top = np.full(k, np.iinfo(np.int32).max, dtype=np.int64)
    bottom = np.zeros(k, dtype=np.int64)
    area = np.zeros(k, dtype=np.int64)
    np.minimum.at(left, dense, sc)
    np.maximum.at(right, dense, ec - 1)
    np.minimum.at(top, dense, sr)
    np.maximum.at(bottom, dense, sr)
    np.add.at(area, dense, ec - sc)
    return Blobs(
        left.astype(np.int32),
        top.astype(np.int32),
        right.astype(np.int32),
        bottom.astype(np.int32),
        area,
    )
