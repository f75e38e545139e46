"""Measure beam/dict margin behavior of the recognizer packs
(VERDICT r4 item 7): over clean glyphs and cells harvested from the
degraded fixture families, report per pack the argmin agreement with the
template path and the best-vs-runner-up cost margin distribution — the
quantity the beam top-k and dict gates actually consume (thin margins
are what trigger their re-decodes). Output pasted into COVERAGE.md.

Usage: python scripts/recognizer_margins.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

from train_recognizer_degraded import harvest  # noqa: E402

from sparkstract.fixtures.font import DECODE_MATRIX  # noqa: E402
from sparkstract.operators.recognizer import (  # noqa: E402
    model_recognizer,
    template_recognizer,
)


def _stats(name: str, rec, cells: np.ndarray, want: np.ndarray) -> str:
    d = rec.cost(cells.astype(bool))
    best = d.argmin(axis=1)
    part = np.partition(d, 1, axis=1)
    margin = part[:, 1] - part[:, 0]
    agree = (best == want).mean()
    return (f"| {name} | {agree:.4f} | {np.median(margin):.0f} | "
            f"{np.percentile(margin, 10):.0f} | "
            f"{(margin <= 1).mean():.4f} |")


def main() -> None:
    tmpl = template_recognizer()
    clean = DECODE_MATRIX.astype(np.uint8)
    degraded = harvest()
    print(f"{degraded.shape[0]} harvested degraded cells, "
          f"{clean.shape[0]} clean glyphs\n")
    for title, cells in (("clean glyphs", clean),
                         ("harvested degraded cells", degraded)):
        want = tmpl.cost(cells.astype(bool)).argmin(axis=1)
        print(f"### {title}")
        print("| pack | argmin agreement vs template | median margin "
              "| p10 margin | frac margin<=1 |")
        print("|---|---|---|---|---|")
        print(_stats("template (reference)", tmpl, cells, want))
        print(_stats("model (clean pack)", model_recognizer("clean"),
                     cells, want))
        print(_stats("model (degraded pack)",
                     model_recognizer("degraded"), cells, want))
        print()


if __name__ == "__main__":
    main()
