"""Bidirectional textline reading order (W4 in SURVEY.md §2.5).

Reimplements, from scratch, the word-reordering semantics of the reference's
``ResultIterator::CalculateTextlineOrder``
(/root/reference/src/ccmain/resultiterator.cpp:285): given the strong script
direction of each word on a physical line (left-to-right positional order),
produce the logical reading order, marking runs of the minor direction and
mixed-direction ("complex") words.

The behavioural contract is pinned by the reference's own pure-logic tests
(/root/reference/unittest/resultiterator_test.cc:480-539), which we port to
pytest: dual-start lines, purely leftward/rightward lines, and the exhaustive
4^7 sanity sweep (every index appears exactly once, minor-run markers
balanced).

Direction vocabulary (publictypes.h StrongScriptDirection):
  NEUTRAL=0, LEFT_TO_RIGHT=1, RIGHT_TO_LEFT=2, MIX=3.

Spark surface: `textline_order` is a pure function usable inside any pandas
UDF; `reorder_words` applies it to a DataFrame of lines carrying an
array<int> of word directions — grouped per line, vectorized via Arrow (no
per-row Python in the DataFrame plan; the per-line loop is the same loop the
reference runs per textline).
"""

from __future__ import annotations

DIR_NEUTRAL = 0
DIR_LTR = 1
DIR_RTL = 2
DIR_MIX = 3

# Marker values interleaved into the reading order (resultiterator.cpp:117).
MINOR_RUN_START = -1
MINOR_RUN_END = -2
COMPLEX_WORD = -3


def textline_order(paragraph_is_ltr: bool, word_dirs: list[int]) -> list[int]:
    """Logical reading order of words given positional (left→right) dirs.

    Returns word indices interleaved with MINOR_RUN_START/END around
    reversed minor-direction runs and COMPLEX_WORD after mixed words.
    """
    n = len(word_dirs)
    if n == 0:
        return []

    out: list[int] = []

    if paragraph_is_ltr:
        idx, end, step = 0, n, 1
        major, minor = DIR_LTR, DIR_RTL
    else:
        idx, end, step = n - 1, -1, -1
        major, minor = DIR_RTL, DIR_LTR
        # RTL special case: a line *ending* (rightmost) in neutrals directly
        # after an LTR word reads as one trailing LTR sequence — e.g. an
        # English phrase with punctuation at the end of a Hebrew line.
        if word_dirs[idx] == DIR_NEUTRAL:
            probe = idx
            while probe > 0 and word_dirs[probe] == DIR_NEUTRAL:
                probe -= 1
            if word_dirs[probe] == DIR_LTR:
                run_start = probe
                k = probe
                while k >= 0 and word_dirs[k] != DIR_RTL:
                    if word_dirs[k] == DIR_LTR:
                        run_start = k
                    k -= 1
                out.append(MINOR_RUN_START)
                for i in range(run_start, n):
                    out.append(i)
                    if word_dirs[i] == DIR_MIX:
                        out.append(COMPLEX_WORD)
                out.append(MINOR_RUN_END)
                idx = run_start - 1

    while idx != end:
        if word_dirs[idx] == minor:
            # find the far edge of the minor run: advance past everything
            # that is not a major word, then back up over trailing non-minors
            far = idx
            while far != end and word_dirs[far] != major:
                far += step
            if far == end:
                far -= step
            while far != idx and word_dirs[far] != minor:
                far -= step
            # emit [far .. idx] reversed relative to major direction
            out.append(MINOR_RUN_START)
            k = far
            while k != idx:
                out.append(k)
                k -= step
            out.append(idx)
            out.append(MINOR_RUN_END)
            idx = far + step
        else:
            out.append(idx)
            if word_dirs[idx] == DIR_MIX:
                out.append(COMPLEX_WORD)
            idx += step

    return out


def word_indices_only(order: list[int]) -> list[int]:
    """Strip marker values, keeping just the word permutation."""
    return [i for i in order if i >= 0]


def reorder_words(lines_df, dirs_col: str = "word_dirs",
                  ltr_col: str = "paragraph_is_ltr",
                  out_col: str = "reading_order"):
    """DataFrame surface: append `out_col` (array<int> incl. markers) computed
    from an array<int> direction column — one pandas-UDF pass, Arrow batched."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, IntegerType

    def _order_fn(dirs, ltr):
        return pd.Series([
            textline_order(bool(is_ltr), list(d))
            for d, is_ltr in zip(dirs, ltr)
        ])

    _order = F.pandas_udf(_order_fn, ArrayType(IntegerType()))

    return lines_df.withColumn(out_col, _order(F.col(dirs_col), F.col(ltr_col)))
