"""Train the C11 model recognizer pack (fixtures/recognizer_weights.npz).

The reference ships recognition as DATA — an lstm network inside a
.traineddata pack, trained offline (tesstrain) and loaded at run time
(src/ccmain/tessedit.cpp TessdataManager). This script is the offline half
of our seam: it trains a one-hidden-layer numpy MLP on the fixture glyph
set plus bit-corruption augmentation and writes the weights pack that
operators/recognizer.py::ModelRecognizer loads.

The network REGRESSES the per-class cost vector (the template matcher's
distance landscape) rather than classifying: softmax heads are
shift-invariant, so they cannot carry the ABSOLUTE match quality that
every downstream gate consumes (OSD retry threshold, beam candidate
margin, dict margin, fuzzy-space re-decode — all in cost units), and
hard-label training collapses the landscape to {0, max}, starving the
beam of its top-k alternatives. A cost-vector head is also what the
reference's classifier path produces (ratings per class, ratngs.h
BLOB_CHOICE); the LSTM path converts its softmax to the same
ratings/certainty currency before anything downstream sees it. Because
the two recognizers agree on integer costs, argmin ties resolve by the
same char-order rule and the strategies are interchangeable behind the
seam — which is precisely the claim the pack exists to prove.

Deterministic: fixed seed, fixed architecture, full-batch Adam. Re-run
whenever the font charset changes (ModelRecognizer refuses a stale pack).

Usage: python scripts/train_recognizer.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstract.fixtures.font import DECODE_CHARS, DECODE_MATRIX  # noqa: E402

CELL_BITS = DECODE_MATRIX.shape[1]
N = len(DECODE_CHARS)
HIDDEN = 64
SEED = 1234


def template_label(x: np.ndarray) -> np.ndarray:
    """Distillation target: nearest-hamming class with argmin tie-break by
    char order — byte-identical to the template path's argmin."""
    d = (x[:, None, :].astype(np.int16)
         ^ DECODE_MATRIX[None, :, :].astype(np.int16)).sum(axis=2)
    return d.argmin(axis=1), d


def build_dataset(rng: np.random.Generator):
    clean = DECODE_MATRIX.astype(np.int8)
    xs, flips = [], []
    # clean glyphs, repeated so the model weights exactness highly
    for _ in range(8):
        xs.append(clean.copy())
        flips.append(np.zeros(N, dtype=np.int64))
    # every 1-bit corruption of every glyph
    one = np.repeat(clean, CELL_BITS, axis=0)
    pos = np.tile(np.arange(CELL_BITS), N)
    one[np.arange(one.shape[0]), pos] ^= 1
    xs.append(one)
    flips.append(np.ones(one.shape[0], dtype=np.int64))
    # random k-bit corruptions, k = 2..5
    for k, reps in ((2, 120), (3, 80), (4, 50), (5, 30)):
        for _ in range(reps):
            x = clean.copy()
            cols = rng.integers(0, CELL_BITS, size=(N, k))
            for j in range(k):
                x[np.arange(N), cols[:, j]] ^= 1
            xs.append(x)
            flips.append(np.full(N, k, dtype=np.int64))
    Xu = np.concatenate(xs).astype(np.uint8)
    X = Xu.astype(np.float32)
    y, d = template_label(Xu)
    kflips = np.concatenate(flips)
    return X, y, d, kflips


def train(X, d, y, rng):
    n = X.shape[0]
    w1 = (rng.standard_normal((CELL_BITS, HIDDEN)) * 0.3).astype(np.float64)
    b1 = np.zeros(HIDDEN)
    w2 = (rng.standard_normal((HIDDEN, N)) * 0.1).astype(np.float64)
    b2 = np.zeros(N)
    m = [np.zeros_like(p) for p in (w1, b1, w2, b2)]
    v = [np.zeros_like(p) for p in (w1, b1, w2, b2)]
    lr, beta1, beta2, eps = 0.02, 0.9, 0.999, 1e-8
    Xf = X.astype(np.float64)
    df = d.astype(np.float64)
    for it in range(1, 1501):
        h = np.maximum(Xf @ w1 + b1, 0.0)
        pred = h @ w2 + b2
        g = 2.0 * (pred - df) / (n * N)
        gw2 = h.T @ g
        gb2 = g.sum(axis=0)
        gh = g @ w2.T
        gh[h <= 0] = 0.0
        gw1 = Xf.T @ gh
        gb1 = gh.sum(axis=0)
        params = [w1, b1, w2, b2]
        grads = [gw1, gb1, gw2, gb2]
        for i in range(4):
            m[i] = beta1 * m[i] + (1 - beta1) * grads[i]
            v[i] = beta2 * v[i] + (1 - beta2) * grads[i] ** 2
            mh = m[i] / (1 - beta1 ** it)
            vh = v[i] / (1 - beta2 ** it)
            params[i] -= lr * mh / (np.sqrt(vh) + eps)
        if it % 250 == 0:
            acc = (pred.argmin(axis=1) == y).mean()
            mae = np.abs(pred - df).mean()
            mx = np.abs(pred - df).max()
            print(f"iter {it}: argmin acc {acc:.4f}  mae {mae:.4f}  max {mx:.3f}")
    return w1, b1, w2, b2




def main() -> None:
    rng = np.random.default_rng(SEED)
    X, y, d, kflips = build_dataset(rng)
    print(f"dataset: {X.shape[0]} samples, {N} classes")
    w1, b1, w2, b2 = train(X, d, y, rng)
    # hard gates before shipping the pack: rounded integer costs must agree
    # with the template across the WHOLE (sample, class) matrix, and every
    # clean glyph must cost exactly 0 against itself
    def fwd(x):
        h = np.maximum(x.astype(np.float64) @ w1 + b1, 0.0)
        return np.rint(np.clip(h @ w2 + b2, 0.0, CELL_BITS)).astype(np.int64)

    clean_cost = fwd(DECODE_MATRIX)
    assert (clean_cost[np.arange(N), np.arange(N)] == 0).all(), \
        "clean glyph nonzero self-cost"
    assert (clean_cost.argmin(axis=1) == np.arange(N)).all(), \
        "clean glyph misclassified"
    all_cost = fwd(X)
    cell_agree = (all_cost == np.minimum(d, CELL_BITS)).mean()
    argmin_agree = (all_cost.argmin(axis=1) == y).mean()
    print(f"integer cost agreement: {cell_agree:.6f}  "
          f"argmin agreement: {argmin_agree:.6f}")
    assert cell_agree > 0.999 and argmin_agree > 0.9995, \
        "model does not reproduce the template cost landscape"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sparkstract", "fixtures",
        "recognizer_weights.npz")
    np.savez_compressed(
        out, chars=np.array(DECODE_CHARS), w1=w1.astype(np.float64),
        b1=b1.astype(np.float64), w2=w2.astype(np.float64),
        b2=b2.astype(np.float64))
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
