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


def test_word_direction_classification():
    """StrongScriptDirection per decoded word (resultiterator.cpp:121 feed):
    Hebrew = RTL, Latin = LTR, digits/punct = neutral, both scripts = MIX."""
    from sparkstract.operators.bidi import (
        DIR_LTR,
        DIR_MIX,
        DIR_NEUTRAL,
        DIR_RTL,
    )
    from sparkstract.operators.page import _word_direction

    assert _word_direction("אב") == DIR_RTL
    assert _word_direction("FOX") == DIR_LTR
    assert _word_direction("123") == DIR_NEUTRAL
    assert _word_direction("=+-") == DIR_NEUTRAL
    assert _word_direction("אX") == DIR_MIX
    assert _word_direction("א1") == DIR_RTL   # digits don't dilute a script
    assert _word_direction("X1") == DIR_LTR


def test_kernel_bidi_reorder_and_script_vote():
    """End-to-end kernel: a page whose glyphs are majority strong-RTL is
    detected by the script vote (osdetect.cpp:286) and its lines come out in
    logical bidi order with the LTR minor run preserved — no config flag."""
    from sparkstract.fixtures.render import PageSpec, Text, render_page
    from sparkstract.operators.page import analyse_page

    spec = PageSpec(elements=[Text(
        ["אב גד FOX DOG הו", "זח טי"],
        truth_lines=["הו FOX DOG גד אב", "טי זח"], col=0)],
        scale=2, width_chars=17, rtl=True)
    img, truth = render_page(spec)
    # voted path (no rtl flag) and config path must agree with hand truth
    for kwargs in ({}, {"rtl": True}):
        blocks = analyse_page(img, **kwargs)
        assert [(b.kind, b.text) for b in blocks] == \
            [(t.kind, t.text) for t in truth], kwargs


def test_ltr_page_unaffected_by_rtl_config():
    """An all-Latin line under ExtractConfig(rtl=True) keeps positional word
    order (resultiterator_test.cc left-rtl case: indices stay 0..n-1)."""
    from sparkstract.fixtures.render import PageSpec, Text, render_page
    from sparkstract.operators.page import analyse_page

    spec = PageSpec(elements=[Text(["THE QUICK FOX"], col=0)], scale=2,
                    width_chars=15)
    img, _ = render_page(spec)
    blocks = analyse_page(img, rtl=True)
    assert blocks[0].text == "THE QUICK FOX"


def test_page_script_four_way_vote():
    """The per-script OSD vote (osdetect.cpp:286) is a real argmax over
    latin/greek/cyrillic/hebrew — each script's page elects its own script,
    and only the RTL winner flips reading order."""
    from sparkstract.fixtures.render import PageSpec, Text, render_page
    from sparkstract.operators.page import _page_script, analyse_page

    cases = {
        "latin": ["THE QUICK FOX", "JUMPS OVER IT"],
        "greek": ["ΓΔΛ ΠΣΦ ΨΩΘ", "ΞΣΔ ΓΠΦ ΛΩΨ"],
        "cyrillic": ["БЖЗ ИЦЧ ШЩЮ", "ЯЗБ ЖИШ ЦЮЧ"],
    }
    for want, lines in cases.items():
        spec = PageSpec(elements=[Text(lines, col=0)], scale=2,
                        width_chars=15)
        img, truth = render_page(spec)
        blocks = analyse_page(img)
        assert _page_script(blocks) == want
        # LTR scripts must not trigger the RTL re-run: text is verbatim
        assert [b.text for b in blocks] == [t.text for t in truth]


def test_page_script_mixed_majority():
    """A page mixing scripts elects the majority script; a bare-majority
    cyrillic page must not fall back to latin (strictly-more tie-break)."""
    from sparkstract.fixtures.render import PageSpec, Text, render_page
    from sparkstract.operators.page import _page_script, analyse_page

    spec = PageSpec(elements=[Text(["БЖЗИЦ FOX", "ШЩЮЯЗ DOG"], col=0)],
                    scale=2, width_chars=11)
    img, _ = render_page(spec)
    assert _page_script(analyse_page(img)) == "cyrillic"


def test_script_consistency_pass_fixes_stray_glyphs():
    """Bowed pages whose warped Latin glyphs hamming-match foreign LUT
    entries must re-decode via the page-majority script (found by the
    scaling bench's span-exact-match metric: a corpus bowed page decoded
    THE as THΞ). Property form — every bowed/wavy page in the corpus
    decodes to its truth with zero foreign-script strays — so the pin
    survives fixture-family growth (the exact rng draw that produced the
    original stray shifts whenever a family is added)."""
    from sparkstract.fixtures.gen import generate_corpus
    from sparkstract.functions.codecs import decode_pages
    from sparkstract.operators.page import analyse_page

    fx = generate_corpus(500, seed=42, heavy_every=100, heavy_pages=32)
    media = fx.media.set_index("media_ref")
    checked = 0
    for doc_id, g in fx.truth.groupby("doc_id"):
        refs = [r for r in g.media_ref if r and ("bowed" in r or "wavy" in r)]
        if not refs:
            continue
        for ref in refs:
            img = decode_pages(media.loc[ref, "image"])[0]
            got = "\n".join(b.text for b in analyse_page(img) if b.text)
            assert "Ξ" not in got and "Б" not in got, (doc_id, ref, got)
            checked += 1
    assert checked >= 5  # the corpus genuinely carries bowed/wavy pages


def test_script_strays_and_lut_semantics():
    """_script_strays: a couple of foreign glyphs on an 8:1-majority page
    trip the pass; a genuinely mixed (bidi-like) page never does.
    _script_restrict drops other scripts' strong glyphs, keeps shared
    ones."""
    from sparkstract.operators.page import (Block, _script_restrict,
                                            _script_strays)
    from sparkstract.operators.recognizer import template_recognizer

    def blk(text):
        return [Block(0, "flowing_text", text, 0, 0, 1, 1)]

    assert _script_strays(blk("THE QUICK BROWN FOX JUMPS OVER LAZY Ξ"),
                          "latin")
    assert not _script_strays(blk("FOX DOG אב גד הו זח"), "latin")
    assert not _script_strays(blk("CLEAN LATIN ONLY PAGE"), "latin")
    rec = _script_restrict(template_recognizer(), "latin")
    chars = rec.chars
    assert "Ξ" not in chars and "א" not in chars
    assert "E" in chars and "0" in chars
    assert len(chars) == rec.bits.shape[0]
