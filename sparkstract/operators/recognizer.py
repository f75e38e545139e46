"""C11 recognizer seam: the pluggable character classifier behind decode.

The reference routes every word through one narrow interface —
``LSTMRecognizeWord`` (/root/reference/src/ccmain/linerec.cpp:237) calls
``LSTMRecognizer::RecognizeLine`` (src/lstm/lstmrecognizer.cpp:263), which
returns per-timestep class SCORES (softmax outputs, folded into ratings/
certainties on the WERD_RES); everything upstream (layout, rows, pitch) and
downstream (dict beam, fix-space) is recognizer-agnostic. This module is
that interface for the Spark kernel: a Recognizer maps a batch of glyph-cell
bitmaps to a per-character COST matrix, and every consumer in
operators/page.py (greedy argmin, offset resampling, K4 beam, C15 fuzzy
re-decode) works off costs alone.

Two implementations prove the seam is an interface, not prose:

* TemplateRecognizer — the shared-LUT hamming matcher (the test-font analog
  of template classification). Cost = bit disagreement count.
* ModelRecognizer — a real trained model: a one-hidden-layer numpy MLP
  whose weights ship in a versioned .npz "language pack"
  (fixtures/recognizer_weights.npz, written by scripts/train_recognizer.py)
  exactly like the reference loads lstm weights from .traineddata
  (tesstrain'd models through TessdataManager, src/ccmain/tessedit.cpp).
  Cost = calibrated -log2 softmax probability, scaled so one cost unit ≈
  one bit of corruption — the same units the template path uses, so every
  downstream margin (OSD retry, BEAM_CELL_MARGIN, DICT_MARGIN) is
  recognizer-independent, mirroring how the reference's dict_ratio /
  cert_offset gates apply to any loaded model.

Scale shape: a Recognizer is a small immutable object captured into the
mapInPandas closure (Spark task serialization broadcasts it once per task
batch); ``cost`` is one matmul / one XOR-popcount over the whole row batch —
no per-cell Python.
"""

from __future__ import annotations

import os

import numpy as np

from ..fixtures.font import DECODE_CHARS, DECODE_MATRIX, GLYPH_H, GLYPH_W

CELL_BITS = GLYPH_H * GLYPH_W

WEIGHTS_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "fixtures", "recognizer_weights.npz")


class TemplateRecognizer:
    """Nearest-template matcher over a boolean glyph LUT (the fixture-font
    stand-in for classification — SURVEY.md §2.8 C11). Cost of cell i vs
    character j = hamming distance of the downsampled cell bitmap to j's
    template."""

    __slots__ = ("chars", "bits")

    def __init__(self, chars: list[str], bits: np.ndarray) -> None:
        self.chars = chars
        self.bits = bits.astype(bool)

    def cost(self, cells: np.ndarray) -> np.ndarray:
        """(m, CELL_BITS) bool cell bitmaps -> (m, n_chars) int64 costs."""
        return (cells[:, None, :] ^ self.bits[None, :, :]).sum(axis=2)

    def restrict(self, keep) -> "TemplateRecognizer":
        """Recognizer limited to a character subset (SetBlackAndWhitelist
        baseapi.cpp:1338 / per-script unicharset gating). Unknown or empty
        subsets fall back to the full set, matching decode_tables."""
        allow = set(keep)
        idx = [i for i, c in enumerate(self.chars) if c in allow]
        if not idx or len(idx) == len(self.chars):
            return self
        return TemplateRecognizer([self.chars[i] for i in idx],
                                  self.bits[idx])


class ModelRecognizer:
    """A trained model behind the same cost contract: 35 input bits → ReLU
    hidden layer → one linear COST output per character, rounded and
    clipped to [0, CELL_BITS]. A cost-vector head (not a softmax) because
    every downstream gate consumes ABSOLUTE match quality — the OSD retry
    threshold, the beam candidate margin, the dict margin, the fuzzy-space
    re-decode all reason in cost units, and a softmax is shift-invariant.
    This is the currency the reference's recognizers emit too: the static
    classifier produces per-class ratings (ratngs.h BLOB_CHOICE) and the
    LSTM path folds its softmax into the same ratings/certainty fields of
    WERD_RES before anything downstream reads them."""

    __slots__ = ("chars", "_w1", "_b1", "_w2", "_b2", "_idx")

    def __init__(self, chars: list[str], w1, b1, w2, b2,
                 idx: np.ndarray | None = None) -> None:
        self.chars = chars
        self._w1, self._b1, self._w2, self._b2 = w1, b1, w2, b2
        # restriction = column selection over the FULL output (the model
        # always scores every class; a whitelist only limits which classes
        # may win — the same semantics as the template path's subset LUT)
        self._idx = idx

    def cost(self, cells: np.ndarray) -> np.ndarray:
        x = cells.astype(np.float64)
        h = np.maximum(x @ self._w1 + self._b1, 0.0)
        c = np.rint(np.clip(h @ self._w2 + self._b2,
                            0.0, CELL_BITS)).astype(np.int64)
        return c if self._idx is None else c[:, self._idx]

    def restrict(self, keep) -> "ModelRecognizer":
        allow = set(keep)
        base_chars = self.chars
        base_idx = (np.arange(len(base_chars))
                    if self._idx is None else self._idx)
        sel = [k for k, c in enumerate(base_chars) if c in allow]
        if not sel or len(sel) == len(base_chars):
            return self
        return ModelRecognizer([base_chars[k] for k in sel],
                               self._w1, self._b1, self._w2, self._b2,
                               base_idx[sel])


_TEMPLATE: TemplateRecognizer | None = None
_MODELS: dict[str, ModelRecognizer] = {}

# second pack: same architecture retrained with degradation-harvested
# cells in the training set (scripts/train_recognizer_degraded.py) — the
# analog of the reference's fast-vs-best .traineddata choice
# (unittest/apiexample_test.cc:89-99): one seam, interchangeable packs.
PACK_PATHS = {
    "clean": WEIGHTS_PATH,
    "degraded": WEIGHTS_PATH.replace(".npz", "_degraded.npz"),
}


def template_recognizer() -> TemplateRecognizer:
    global _TEMPLATE
    if _TEMPLATE is None:
        _TEMPLATE = TemplateRecognizer(DECODE_CHARS,
                                       DECODE_MATRIX.astype(bool))
    return _TEMPLATE


def model_recognizer(pack: str = "clean") -> ModelRecognizer:
    """Load a shipped model pack (lazy, cached per process — each Spark
    python worker pays the ~10 kB read once, like the reference's cached
    TessdataManager load). `pack`: 'clean' (distilled on clean glyphs +
    synthetic bit noise) or 'degraded' (adds cells harvested from the
    degraded fixture families)."""
    if pack not in PACK_PATHS:
        raise ValueError(f"unknown recognizer pack {pack!r}")
    if pack not in _MODELS:
        with np.load(PACK_PATHS[pack], allow_pickle=False) as z:
            chars = [str(c) for c in z["chars"]]
            if chars != DECODE_CHARS:
                raise ValueError(
                    f"{os.path.basename(PACK_PATHS[pack])} charset does "
                    "not match the font; re-run the trainer script")
            _MODELS[pack] = ModelRecognizer(chars, z["w1"], z["b1"],
                                            z["w2"], z["b2"])
    return _MODELS[pack]


def get_recognizer(name: str):
    """The ExtractConfig.recognizer strategy: 'template' | 'model' |
    'model-degraded'."""
    if name == "template":
        return template_recognizer()
    if name == "model":
        return model_recognizer("clean")
    if name == "model-degraded":
        return model_recognizer("degraded")
    raise ValueError(f"unknown recognizer strategy {name!r}")
