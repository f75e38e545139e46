"""Bidi textline reading order — ports the reference's pure-logic tests
(/root/reference/unittest/resultiterator_test.cc:480-539)."""

from sparkstract.operators.bidi import (
    COMPLEX_WORD,
    DIR_LTR,
    DIR_MIX,
    DIR_NEUTRAL,
    DIR_RTL,
    MINOR_RUN_END,
    MINOR_RUN_START,
    textline_order,
    word_indices_only,
)

dL, dR, dN, dZ = DIR_LTR, DIR_RTL, DIR_NEUTRAL, DIR_MIX
S, E, C = MINOR_RUN_START, MINOR_RUN_END, COMPLEX_WORD


def test_dual_start_line():
    # resultiterator_test.cc:481 DualStartTextlineOrderTest
    dirs = [dL, dL, dN, dL, dN, dR, dR, dR]
    assert textline_order(False, dirs) == [7, 6, 5, 4, S, 0, 1, 2, 3, E]
    assert textline_order(True, dirs) == [0, 1, 2, 3, 4, S, 7, 6, 5, E]


def test_leftward_line():
    # resultiterator_test.cc:496 LeftwardTextlineOrderTest
    dirs = [dL, dL, dN, dL, dN, dN, dL, dL]
    assert textline_order(True, dirs) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert textline_order(False, dirs) == [S, 0, 1, 2, 3, 4, 5, 6, 7, E]


def test_rightward_line():
    # resultiterator_test.cc:513 RightwardTextlineOrderTest
    dirs = [dR, dR, dN, dR, dN, dN, dR, dR]
    assert textline_order(False, dirs) == [7, 6, 5, 4, 3, 2, 1, 0]


def test_empty_line():
    assert textline_order(True, []) == []
    assert textline_order(False, []) == []


def test_complex_word_marker():
    order = textline_order(True, [dL, dZ, dL])
    assert order == [0, 1, C, 2]


def _verify_sane(paragraph_is_ltr, dirs):
    """resultiterator_test.cc VerifySaneTextlineOrder: every index exactly
    once; markers balanced and non-nested."""
    order = textline_order(paragraph_is_ltr, dirs)
    words = word_indices_only(order)
    assert sorted(words) == list(range(len(dirs))), (paragraph_is_ltr, dirs, order)
    depth = 0
    for v in order:
        if v == MINOR_RUN_START:
            depth += 1
            assert depth == 1, (dirs, order)
        elif v == MINOR_RUN_END:
            depth -= 1
            assert depth == 0, (dirs, order)
    assert depth == 0


def test_textline_order_sanity_sweep():
    # resultiterator_test.cc:521 TextlineOrderSanityCheck — all 4^7 direction
    # combinations over a 7-word line, both paragraph contexts.
    k = 7
    for combo in range(4 ** k):
        tmp = combo
        dirs = []
        for _ in range(k):
            dirs.append(tmp % 4)
            tmp //= 4
        _verify_sane(True, dirs)
        _verify_sane(False, dirs)
