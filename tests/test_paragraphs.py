"""Paragraph detection — ports the reference's ASCII-art pure-logic tests
(/root/reference/unittest/paragraphs_test.cc:206-420).

Each case is (ascii_row, expected) where expected is:
  'start'        — first line of a paragraph
  'cont'         — continuation line
  'none'         — not a paragraph line (blank)
plus optional flags in the tuple: justification, crown, list.
The evaluation mirrors EvaluateParagraphDetection (paragraphs_test.cc:110):
breaks must match exactly; where a justification is given it must match;
crown and list-item flags must match on start rows.
"""

import pytest

from sparkstract.operators.paragraphs import (
    ParaModel,
    RowInfo,
    detect_paragraphs,
    likely_list_item,
)


def run_case(case, seed_models=None):
    rows = [RowInfo.from_ascii(c[0]) for c in case]
    out = detect_paragraphs(rows, seed_models=seed_models)
    assert len(out) == len(case)
    # breaks
    for i in range(1, len(case)):
        expected_break = case[i][1] != "cont"
        detected_break = out[i].para_id != out[i - 1].para_id
        assert detected_break == expected_break, (
            f"row {i}: {case[i][0]!r} break={detected_break} want={expected_break}")
    # per-start attributes
    for i, c in enumerate(case):
        kind = c[1]
        opts = c[2] if len(c) > 2 else {}
        if kind == "none":
            assert out[i].model is None, f"row {i} should be unmodeled"
            continue
        if kind == "start":
            if "just" in opts:
                assert out[i].model.justification == opts["just"], f"row {i}"
            assert out[i].is_crown == opts.get("crown", False), f"row {i} crown"
            assert out[i].is_list_item == opts.get("list", False), f"row {i} list"


def test_list_items_identified():
    # paragraphs_test.cc:205 ListItemsIdentified
    for w in ["iii", "A.", "B.", "C.", "1.", "2.", "3.", "1", "2", "3",
              "[[1]]", "A-1.", "A-2", "(A)(i)"]:
        assert likely_list_item(w), w
    for w in ["The", "first", "house", "Oregonian.", "on."]:
        assert not likely_list_item(w), w


# paragraphs_test.cc:232 kTwoSimpleParagraphs
TWO_SIMPLE = [
    ("  Look here, I have a paragraph.", "start", {"just": "left"}),
    ("This paragraph starts at the top", "cont"),
    ("of the page and takes 3 lines.  ", "cont"),
    ("  Here I have a second paragraph", "start", {"just": "left"}),
    ("which indicates that the first  ", "cont"),
    ("paragraph is not a continuation ", "cont"),
    ("from a previous page, as it is  ", "cont"),
    ("indented just like this second  ", "cont"),
    ("paragraph.                      ", "cont"),
]


def test_two_simple_paragraphs():
    run_case(TWO_SIMPLE)


# paragraphs_test.cc:247 kFewCluesWithCrown
FEW_CLUES_CROWN = [
    ("This paragraph starts at the top", "start", {"just": "left", "crown": True}),
    ("of the page and takes two lines.", "cont"),
    ("  Here I have a second paragraph", "start", {"just": "left"}),
    ("which indicates that the first  ", "cont"),
    ("paragraph is a continuation from", "cont"),
    ("a previous page, as it is       ", "cont"),
    ("indented just like this second  ", "cont"),
    ("paragraph.                      ", "cont"),
]


def test_few_clues_with_crown():
    run_case(FEW_CLUES_CROWN)


# paragraphs_test.cc:262 kCrownedParagraph
CROWNED = [
    ("The first paragraph on a page is", "start", {"just": "left", "crown": True}),
    ("often not indented as the rest  ", "cont"),
    ("of the paragraphs are.  Nonethe-", "cont"),
    ("less it should be counted as the", "cont"),
    ("same type of paragraph.         ", "cont"),
    ("  The second and third para-    ", "start", {"just": "left"}),
    ("graphs are both indented two    ", "cont"),
    ("spaces.                         ", "cont"),
    ("  The first paragraph has what  ", "start", {"just": "left"}),
    ("fmt refers to as a 'crown.'     ", "cont"),
]


def test_crowned_paragraph():
    run_case(CROWNED)


# paragraphs_test.cc:279 kFlushLeftParagraphs
FLUSH_LEFT = [
    ("It  is sometimes  the case  that", "start", {"just": "left"}),
    ("flush  left   paragraphs  (those", "cont"),
    ("with  no  body  indent)  are not", "cont"),
    ("actually crowns.                ", "cont"),
    ("Instead,  further paragraphs are", "start", {"just": "left"}),
    ("also flush left aligned.  Usual-", "cont"),
    ("ly,  these  paragraphs  are  set", "cont"),
    ("apart vertically  by some white-", "cont"),
    ("space,  but you can also  detect", "cont"),
    ("them by observing  the big empty", "cont"),
    ("space at the  ends  of the para-", "cont"),
    ("graphs.                         ", "cont"),
]


def test_flush_left_paragraphs():
    run_case(FLUSH_LEFT)


# paragraphs_test.cc:297 kSingleFullPageContinuation — needs the seeded model
FULL_PAGE_CONT = [
    ("sometimes a page is one giant", "start", {"just": "left", "crown": True}),
    ("continuation.  It flows  from", "cont"),
    ("line to  line, using the full", "cont"),
    ("column  width  with  no clear", "cont"),
    ("paragraph  break,  because it", "cont"),
    ("actually doesn't have one. It", "cont"),
    ("is the  middle of one monster", "cont"),
    ("paragraph continued  from the", "cont"),
    ("previous page and  continuing", "cont"),
    ("onto the  next  page.  There-", "cont"),
    ("fore,  it  ends  up   getting", "cont"),
    ("marked  as a  crown  and then", "cont"),
    ("getting re-marked as any  ex-", "cont"),
    ("isting model.  Not great, but", "cont"),
]


def test_single_full_page_continuation():
    run_case(FULL_PAGE_CONT,
             seed_models=[ParaModel("left", 0, 20, 0)])


# paragraphs_test.cc:330 kRightAligned
RIGHT_ALIGNED = [
    ("Right-aligned paragraphs are", "start", {"just": "right"}),
    ("   uncommon in Left-to-Right", "cont"),
    ("      languages, but they do", "cont"),
    ("                      exist.", "cont"),
    ("    Mostly, however, they're", "start", {"just": "right"}),
    (" horribly tiny paragraphs in", "cont"),
    ("  tables on which we have no", "cont"),
    ("             chance anyways.", "cont"),
]


def test_right_aligned():
    run_case(RIGHT_ALIGNED)


# paragraphs_test.cc:344 kTinyParagraphs
TINY = [
    ("  Occasionally, interspersed with", "start", {"just": "left"}),
    ("obvious paragraph text, you might", "cont"),
    ("find short exchanges of dialogue ", "cont"),
    ("between characters.              ", "cont"),
    ("  'Oh?'                          ", "start", {"just": "left"}),
    ("  'Don't be confused!'           ", "start", {"just": "left"}),
    ("  'Not me!'                      ", "start", {"just": "left"}),
    ("  One naive approach would be to ", "start", {"just": "left"}),
    ("mark a new paragraph whenever one", "cont"),
    ("of the statistics (left, right or", "cont"),
    ("center)  changes  from  one text-", "cont"),
    ("line  to  the  next.    Such   an", "cont"),
    ("approach  would  misclassify  the", "cont"),
    ("tiny paragraphs above as a single", "cont"),
    ("paragraph.                       ", "cont"),
]


def test_tiny_paragraphs():
    run_case(TINY)


# The centered-title head of kComplexPage1 (paragraphs_test.cc:369) as its
# own zone, followed by the blank PNONE row and an indented body zone.
TITLE_AND_BODY = [
    ("       Awesome                  ", "start", {"just": "center"}),
    ("   Centered Title               ", "cont"),
    (" Paragraph Detection            ", "cont"),
    ("      OCR TEAM                  ", "cont"),
    ("  10 November 2010              ", "cont"),
    ("                                ", "none"),
    ("  Look here, I have a paragraph.", "start", {"just": "left"}),
    ("This paragraph starts at the top", "cont"),
    ("of the page and takes 3 lines.  ", "cont"),
    ("  Here I have a second paragraph", "start", {"just": "left"}),
    ("which indicates that the first  ", "cont"),
    ("paragraph is not a continuation ", "cont"),
    ("from a previous page, as it is  ", "cont"),
    ("indented just like this second  ", "cont"),
    ("paragraph.                      ", "cont"),
]


def test_centered_title_then_body():
    run_case(TITLE_AND_BODY)


# The list-item tail of kComplexPage1 (paragraphs_test.cc:392-400) as its own
# block: hanging-indent numbered items.
LIST_ITEMS = [
    ("1. Make a plan.                 ", "start", {"just": "left", "list": True}),
    ("2. Use a heuristic, for example,", "start", {"just": "left", "list": True}),
    ("   looking for lines where the  ", "cont"),
    ("   first word of the next line  ", "cont"),
    ("   would fit on the previous    ", "cont"),
    ("   line.                        ", "cont"),
    ("8. Try to implement the plan in ", "start", {"just": "left", "list": True}),
    ("   Python and try it out.       ", "cont"),
    ("4. Determine how to fix the     ", "start", {"just": "left", "list": True}),
    ("   mistakes.                    ", "cont"),
    ("5. Repeat.                      ", "start", {"just": "left", "list": True}),
]


def test_list_items():
    run_case(LIST_ITEMS)


def test_paragraphs_df(spark):
    rows = [("d1", 0, i, t) for i, (t, *_rest) in enumerate(TWO_SIMPLE)]
    df = spark.createDataFrame(rows, "doc_id string, block_order int, "
                               "row_order int, line_text string")
    out = (
        __import__("sparkstract.operators.paragraphs", fromlist=["paragraphs_df"])
        .paragraphs_df(df)
        .orderBy("row_order")
        .collect()
    )
    para_ids = [r["para_id"] for r in out]
    assert para_ids == [0, 0, 0, 1, 1, 1, 1, 1, 1]
    assert out[0]["justification"] == "left"


# paragraphs_test.cc:369-407 kComplexPage1 — the full mixed page: centered
# title, indented paragraphs, a block quote, numbered list items.
COMPLEX_PAGE_1 = [
    ("       Awesome                  ", "start", {"just": "center"}),
    ("   Centered Title               ", "cont"),
    (" Paragraph Detection            ", "cont"),
    ("      OCR TEAM                  ", "cont"),
    ("  10 November 2010              ", "cont"),
    ("                                ", "none"),
    ("  Look here, I have a paragraph.", "start", {"just": "left"}),
    ("This paragraph starts at the top", "cont"),
    ("of the page and takes 3 lines.  ", "cont"),
    ("  Here I have a second paragraph", "start", {"just": "left"}),
    ("which indicates that the first  ", "cont"),
    ("paragraph is not a continuation ", "cont"),
    ("from a previous page, as it is  ", "cont"),
    ("indented just like this second  ", "cont"),
    ("paragraph.                      ", "cont"),
    ("   Here is a block quote. It    ", "start", {"just": "left", "crown": True}),
    ("   looks like the prior text    ", "cont"),
    ("   but it  is indented  more    ", "cont"),
    ("   and is fully justified.      ", "cont"),
    ("  So how does one deal with     ", "start", {"just": "left"}),
    ("centered text, block quotes,    ", "cont"),
    ("normal paragraphs, and lists    ", "cont"),
    ("like what follows?              ", "cont"),
    ("1. Make a plan.                 ", "start", {"just": "left", "list": True}),
    ("2. Use a heuristic, for example,", "start", {"just": "left", "list": True}),
    ("   looking for lines where the  ", "cont"),
    ("   first word of the next line  ", "cont"),
    ("   would fit on the previous    ", "cont"),
    ("   line.                        ", "cont"),
    ("8. Try to implement the plan in ", "start", {"just": "left", "list": True}),
    ("   Python and try it out.       ", "cont"),
    ("4. Determine how to fix the     ", "start", {"just": "left", "list": True}),
    ("   mistakes.                    ", "cont"),
    ("5. Repeat.                      ", "start", {"just": "left", "list": True}),
    ("  For extra painful penalty work", "start", {"just": "left"}),
    ("you can try to identify source  ", "cont"),
    ("code.  Ouch!                    ", "cont"),
]


def test_complex_page_1():
    run_case(COMPLEX_PAGE_1)


# paragraphs_test.cc:455-468 kSubtleCrown: un-indented first paragraph
# (crown) followed by an indented-start paragraph
SUBTLE_CROWN = [
    ("The first paragraph on a page is", "start", {"crown": True}),
    ("often not indented as the rest  ", "cont"),
    ("of the paragraphs are.  Nonethe-", "cont"),
    ("less it should be counted as the", "cont"),
    ("same type of paragraph.         ", "cont"),
    ("  Even a short second paragraph ", "start"),
    ("should suffice.                 ", "cont"),
]


def test_subtle_crown():
    run_case(SUBTLE_CROWN)


def test_stray_line_in_block():
    """paragraphs_test.cc:470 TestStrayLineInBlock: a stray centered number
    after the block is its own UNMODELED row (PNONE in the reference — the
    evaluation harness checks `detector_output[i]->model == nullptr`) and
    must not perturb the crown/indent models of the preceding rows."""
    rows = [RowInfo.from_ascii(c[0]) for c in SUBTLE_CROWN]
    rows.append(RowInfo.from_ascii("             1235               "))
    out = detect_paragraphs(rows)
    # same breaks as SUBTLE_CROWN, stray breaks into its own paragraph
    breaks = [out[i].para_id != out[i - 1].para_id for i in range(1, len(out))]
    assert breaks == [False, False, False, False, True, False, True]
    assert out[-1].model is None          # PNONE
    assert out[0].is_crown                # crown evidence undisturbed
    assert out[0].model.justification == "left"


def test_index_page():
    """paragraphs_test.cc:724 IndexPageTest (excerpt): hanging-indent index
    model — flush-left entry starts with rare deeper overflow lines."""
    case = [
        ("Oats, 51                      ", "start", {"just": "left"}),
        ("O'Brien, Gregory, 175         ", "start", {"just": "left"}),
        ("Occupational composition, 110,", "start", {"just": "left"}),
        ("   138                        ", "cont"),
        ("OECD rankings, 155, 172       ", "start", {"just": "left"}),
        ("Okiato (original capital), 47 ", "start", {"just": "left"}),
        ("Oil shock: 1974, xxx, 143; 1979,", "start", {"just": "left"}),
        ("   145                        ", "cont"),
        ("Old Age Pensions, xxii, 89-90 ", "start", {"just": "left"}),
        ("Old World evils, 77           ", "start", {"just": "left"}),
    ]
    run_case(case)


# paragraphs_test.cc:607 kOldManAndSea (excerpt) — chains of single-line
# 5-space-indented dialogue paragraphs between indented body paragraphs.
# Row 0 carries {"crown": True}: the reference harness never evaluates row 0
# (EvaluateParagraphDetection starts at i=1, paragraphs_test.cc:112), and an
# un-indented page-opening row under an indented model IS a crown.
OLD_MAN_AND_SEA = [
    ("royal  palm  which  are called  guano  and  in it  there was a bed,  a", "start",
     {"just": "left", "crown": True}),
    ("table, one chair, and a place on the dirt floor to cook with charcoal.", "cont"),
    ("On  the  brown  walls  of  the flattened,  overlapping  leaves  of  the", "cont"),
    ("shirt.                                                                ", "cont"),
    ("     \"What  do  you  have  to  eat?\"     the  boy   asked.          ", "start",
     {"just": "left"}),
    ("     \"A pot of yellow rice with fish. Do you want some?\"            ", "start",
     {"just": "left"}),
    ("     \"No. I will eat at home. Do you want me to make the fire?\"   ", "start",
     {"just": "left"}),
    ("     \"May I take the cast net?\"                                     ", "start",
     {"just": "left"}),
    ("     \"Of course.\"                                                   ", "start",
     {"just": "left"}),
    ("     There was  no  cast net  and  the boy  remembered  when  they had", "start",
     {"just": "left"}),
    ("sold it.   But they went through  this fiction every day. There was no", "cont"),
    ("pot of yellow rice and fish and the boy knew this too.               ", "cont"),
    ("     \"The Yankees cannot lose.\"                                     ", "start",
     {"just": "left"}),
    ("     \"But I fear the Indians of Cleveland.\"                         ", "start",
     {"just": "left"}),
    ("     \"Have faith  in  the Yankees  my son.   Think of  the great  Di-", "start",
     {"just": "left"}),
    ("Maggio.\"                                                             ", "cont"),
]


def test_dialogue_chains_not_overmerged():
    # paragraphs_test.cc:687 NotOverlyAggressiveWithBlockQuotes
    run_case(OLD_MAN_AND_SEA)


# paragraphs_test.cc:543 TestUnlvInsurance (excerpt) — a body line opening
# with "1993," must not fire the list-item rule; the zone is the classic
# first-line-indent model.
UNLV_INSURANCE = [
    ("    Defined contribution plans cover employees in Australia, New", "start",
     {"just": "left"}),
    ("Zealand, Spain, the United Kingdom and some U.S. subsidiaries.  ", "cont"),
    ("In addition, employees in the U.S. are eligible to participate in    ", "cont"),
    ("charged to income for defined contribution plans were $92 in    ", "cont"),
    ("1993, $98 in 1992 and $89 in 1991.                             ", "cont"),
    ("     In addition to providing pension benefits, the Company pro- ", "start",
     {"just": "left"}),
    ("vides certain health care and life insurance benefits to retired     ", "cont"),
    ("benefits were paid. These pretax costs amounted to $53 in 1991.   ", "cont"),
    ("     The U.S. plan covering the parent company is the largest plan.", "start",
     {"just": "left"}),
    ("It provides medical and life insurance benefits including hospital,  ", "cont"),
    ("benefits at any time.                                            ", "cont"),
]


def test_unlv_insurance_digit_lines():
    run_case(UNLV_INSURANCE)
