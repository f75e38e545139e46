"""Paragraph detection (W6 in SURVEY.md §2.5).

A from-scratch reimplementation of the *behaviour* pinned by the reference's
pure-logic paragraph tests (/root/reference/unittest/paragraphs_test.cc,
detector entry /root/reference/src/ccmain/paragraphs.cpp:2588
``DetectParagraphs``): given per-row geometry (left/right indents, first and
last words) for the rows of one text block, group rows into paragraphs and
fit an alignment model per paragraph.

The reference runs a 4-pass model-consensus search over ~2.6k LoC; we use a
much smaller zone-based design (alignment classification per blank-separated
zone, then model-specific break rules) that reproduces the documented
outcomes: indent-started paragraphs, crowns (opening paragraph without its
first-line indent, or a continuation from a previous page), flush-left
paragraphs split by the "would the next word have fit?" rule, right-aligned
and centered blocks, tiny consecutive one-line paragraphs, and numbered /
bulleted list items.

Row input is monospace-normalized: indents in character cells (the test
harness maps 1 char = 10 px like AsciiToRowInfo, paragraphs_test.cc:49).

Spark surface: `paragraphs_df` assigns para ids per (doc_id, block) group
with applyInPandas — per-group logic identical to the local detector.
"""

from __future__ import annotations

from dataclasses import dataclass

JUST_LEFT = "left"
JUST_RIGHT = "right"
JUST_CENTER = "center"
JUST_UNKNOWN = "unknown"

_OPENING_PUNCT = "'\"({[<"
_TERMINAL_PUNCT = ".,;:!?'\")}]>"
_LIST_MARKS = "0Oo*.,+."
_ROMANS = set("ivxlmdIVXLMD")
_DIGITS = set("012345789")
_OPEN = set("[{(")
_SEP = set(":;-.,")
_CLOSE = set("]})")


def _skip_while(s: str, i: int, allowed) -> int:
    while i < len(s) and s[i] in allowed:
        i += 1
    return i


def likely_list_numeral(word: str) -> bool:
    """Does the word look like '1.', 'iv)', '[[1]]', 'A-1.', '(A)(i)' …?
    Up to three numeral segments, each optionally parenthesized, separated
    by punctuation (mirrors the ASCII heuristic the reference documents at
    paragraphs.cpp:257)."""
    i = 0
    segments = 0
    while i < len(word) and segments < 3:
        j = _skip_while(word, i, _OPEN)
        j = min(j, i + 2)  # at most two opening brackets
        start = _skip_while(word, i, _OPEN)
        start = min(start, i + 2)
        end = _skip_while(word, start, _ROMANS)
        if end == start:
            end = _skip_while(word, start, _DIGITS)
            if end == start:
                end = start
                while end < len(word) and word[end].isalpha():
                    end += 1
                if end - start != 1:
                    break
        segments += 1
        nxt = _skip_while(word, end, _CLOSE)
        nxt = _skip_while(word, nxt, _SEP)
        if nxt == end:
            i = end
            break
        i = nxt
    return i == len(word) and segments > 0


def likely_list_mark(word: str) -> bool:
    return len(word) == 1 and word in _LIST_MARKS


def likely_list_item(word: str) -> bool:
    return likely_list_mark(word) or likely_list_numeral(word)


@dataclass
class RowInfo:
    """Geometry + word attributes of one text row (monospace chars)."""
    text: str
    lindent: int        # leading blank cells
    rindent: int        # trailing blank cells
    lword: str
    rword: str
    num_words: int

    @classmethod
    def from_ascii(cls, text: str) -> "RowInfo":
        words = text.split()
        stripped = text.rstrip()
        lindent = len(stripped) - len(stripped.lstrip()) if stripped else 0
        rindent = len(text) - len(stripped)
        return cls(text=text, lindent=lindent, rindent=rindent,
                   lword=words[0] if words else "",
                   rword=words[-1] if words else "",
                   num_words=len(words))


@dataclass
class ParaModel:
    justification: str
    margin: int = 0        # px
    first_indent: int = 0  # px, indent of a paragraph's first line
    body_indent: int = 0   # px, indent of its continuation lines

    def comparable(self, other: "ParaModel", tol: int = 11) -> bool:
        return (self.justification == other.justification
                and abs(self.first_indent - other.first_indent) < tol
                and abs(self.body_indent - other.body_indent) < tol)


@dataclass
class RowPara:
    para_id: int
    model: ParaModel | None
    is_crown: bool = False
    is_list_item: bool = False


_CHAR_PX = 10  # monospace cell width used by the model px units


def _fit_break(prev_trailing_cells: int, next_first_word: str) -> bool:
    """Would the next row's first word have fit comfortably (word + leading
    space + one cell of slack) in the trailing blank cells of the previous
    row?  If so, the previous row ended a paragraph on purpose. The slack
    cell keeps tightly justified text (block quotes) from false breaks."""
    return prev_trailing_cells >= len(next_first_word) + 2


def _classify_zone(rows: list[RowInfo]) -> str:
    if len(rows) < 2:
        return JUST_LEFT
    lind = [r.lindent for r in rows]
    rind = [r.rindent for r in rows]
    l_spread = max(lind) - min(lind)
    r_spread = max(rind) - min(rind)
    centers = [(r.lindent - r.rindent) / 2 for r in rows]
    c_spread = max(centers) - min(centers)
    if l_spread > 1 and r_spread > 1 and c_spread <= 1.5:
        return JUST_CENTER
    if r_spread <= 1 and l_spread > 1:
        return JUST_RIGHT
    return JUST_LEFT


def _left_zone(rows: list[RowInfo], first_para_of_page: bool,
               seed_models: list[ParaModel]) -> list[tuple[bool, ParaModel, bool, bool]]:
    """Per row: (starts_para, model, is_crown, is_list_item) for a
    left-justified zone."""
    lind = [r.lindent for r in rows]
    levels = sorted(set(lind))
    out: list[tuple[bool, ParaModel, bool, bool]] = []

    if len(levels) >= 2:
        low, high = levels[0], levels[-1]
        low_rows = [r for r in rows if r.lindent == low]
        list_led = (
            sum(likely_list_item(r.lword) for r in low_rows) > len(low_rows) / 2
        )
        if list_led:
            # hanging list: marker lines start at the low indent, wrapped
            # continuations sit at the high indent
            model = ParaModel(JUST_LEFT, 0, low * _CHAR_PX, high * _CHAR_PX)
            for r in rows:
                starts = r.lindent == low
                out.append((starts, model, False, starts))
            return out
        # hanging indent WITHOUT list markers — the index-page model
        # (paragraphs_test.cc:724 IndexPageTest, e.g. "Occupational
        # composition, 110, / [cont]   138"): entries start flush-left and
        # rare overflow continuations sit deeper. Discriminator vs the
        # classic first-line-indent model: a real first line fills its
        # paragraph's width, an overflow continuation is a runt — if EVERY
        # deep row is a short fragment (and deep rows are a minority), the
        # deep level is the continuation level, not the start level.
        width = max(len(r.text) for r in rows)
        high_rows = [r for r in rows if r.lindent == high]
        if (len(high_rows) * 2 < len(rows)
                and all(r.rindent >= max(8, width // 2) for r in high_rows)):
            model = ParaModel(JUST_LEFT, 0, low * _CHAR_PX, high * _CHAR_PX)
            for r in rows:
                starts = r.lindent < high
                out.append((starts, model, False, False))
            return out
        # classic first-line indent: starts at the high level
        model = ParaModel(JUST_LEFT, 0, high * _CHAR_PX, low * _CHAR_PX)
        for i, r in enumerate(rows):
            starts = r.lindent >= high or i == 0
            crown = i == 0 and first_para_of_page and r.lindent == low
            out.append((starts, model, crown, False))
        return out

    # flush zone (single indent level): break on the would-it-have-fit rule
    base = levels[0] if levels else 0
    model = ParaModel(JUST_LEFT, base * _CHAR_PX if base else 0,
                      base * _CHAR_PX, base * _CHAR_PX)
    crown0 = False
    if first_para_of_page:
        for sm in seed_models:
            if (sm.justification == JUST_LEFT
                    and sm.first_indent > sm.body_indent
                    and abs(sm.body_indent - base * _CHAR_PX) < 11):
                # page opens mid-paragraph relative to a known indented model
                model = sm
                crown0 = True
                break
    for i, r in enumerate(rows):
        if i == 0:
            out.append((True, model, crown0, False))
        else:
            starts = _fit_break(rows[i - 1].rindent, r.lword)
            out.append((starts, model, False, False))
    return out


def _segment_left_zone(rows: list[RowInfo]) -> list[tuple[str, int, int]]:
    """Split a left zone at margin shifts: runs of rows indented well past
    the base margin are block quotes (unless they continue a list item),
    runs led by list-mark rows are list segments, and an indent OUTLIER is a
    stray line (a centered page number or junk row — the reference marks it
    PNONE, paragraphs_test.cc:455-473 kSubtleCrown/TestStrayLineInBlock).
    Returns (kind, lo, hi) with kind in body|quote|list|stray. The reference
    reaches the same grouping through its model-consensus passes
    (paragraphs.cpp:2339-2429)."""
    base = min(r.lindent for r in rows)
    n = len(rows)
    # stray = the single row at an extreme outlier indent: it must not feed
    # the level set (it would fake a first-line-indent model) nor merge into
    # any neighbouring run
    lind = [r.lindent for r in rows]
    mx = max(lind)
    rest = [v for v in lind if v != mx]
    stray = [False] * n
    if rest and lind.count(mx) == 1 and mx - max(rest) >= 4:
        stray[lind.index(mx)] = True
    deep = [not stray[i] and r.lindent >= base + 3
            for i, r in enumerate(rows)]
    # a list marker is a SHORT pure mark ('1.', 'iv)', 'B.'): longer
    # numeral-led words ('1993,' opening a body line) are prose, not markers
    # (reference case paragraphs_test.cc:543 TestUnlvInsurance)
    markish = [r.lindent <= base + 2 and likely_list_item(r.lword)
               and len(r.lword) <= 3 for r in rows]
    # a list-mark word only OPENS a list segment with corroboration: its
    # wrapped continuation is deeper, or the next row is another item
    # ("a previous page..." must not read as item "a")
    is_list_start = [
        m and i + 1 < n and (deep[i + 1] or markish[i + 1])
        for i, m in enumerate(markish)
    ]
    segments: list[tuple[str, int, int]] = []
    i = 0
    while i < n:
        if stray[i]:
            segments.append(("stray", i, i + 1))
            i += 1
        elif is_list_start[i]:
            j = i
            while j < n and not stray[j] and (
                    is_list_start[j] or deep[j] or (markish[j] and j > i)):
                j += 1
            segments.append(("list", i, j))
            i = j
        elif deep[i]:
            j = i
            while j < n and deep[j]:
                j += 1
            looks_quote = j - i >= 2
            if (looks_quote and j < n and not stray[j]
                    and not _fit_break(rows[j - 1].rindent, rows[j].lword)):
                # the run's last row is CONTINUED by the following base row
                # (its first word would not have fit): these deep rows are
                # first-line indents of base-margin paragraphs — a chain of
                # indented dialogue starts, not a quote margin (reference
                # kOldManAndSea, paragraphs_test.cc:687: "Have faith ... Di-"
                # wraps to "Maggio." at the base margin)
                looks_quote = False
            segments.append(("quote" if looks_quote else "body", i, j))
            i = j
        else:
            j = i
            while j < n and not deep[j] and not is_list_start[j] and not stray[j]:
                j += 1
            segments.append(("body", i, j))
            i = j
    # merge adjacent body segments (a single deep row inside a body run is
    # just a strongly indented first line)
    merged: list[tuple[str, int, int]] = []
    for seg in segments:
        if merged and seg[0] == "body" and merged[-1][0] == "body":
            merged[-1] = ("body", merged[-1][1], seg[2])
        else:
            merged.append(seg)
    return merged


def _list_zone(rows: list[RowInfo]) -> list[tuple[bool, ParaModel, bool, bool]]:
    """Hanging list items: marker rows start paragraphs, deep rows continue."""
    base = min(r.lindent for r in rows)
    deep_levels = [r.lindent for r in rows if r.lindent >= base + 3]
    body_ind = (min(deep_levels) if deep_levels else base) * _CHAR_PX
    model = ParaModel(JUST_LEFT, 0, base * _CHAR_PX, body_ind)
    out = []
    for r in rows:
        starts = r.lindent <= base + 2
        out.append((starts, model, False, starts))
    return out


def _right_zone(rows: list[RowInfo]) -> list[tuple[bool, ParaModel, bool, bool]]:
    model = ParaModel(JUST_RIGHT, 0, 0, 0)
    out = [(True, model, False, False)]
    for i in range(1, len(rows)):
        starts = _fit_break(rows[i - 1].lindent, rows[i].lword)
        out.append((starts, model, False, False))
    return out


def detect_paragraphs(rows: list[RowInfo],
                      seed_models: list[ParaModel] | None = None) -> list[RowPara]:
    """Assign every row to a paragraph; blank rows get model None."""
    seed_models = seed_models or []
    result: list[RowPara] = [None] * len(rows)  # type: ignore[list-item]
    para_id = -1
    first_text_zone = True

    i = 0
    while i < len(rows):
        if rows[i].num_words == 0:
            para_id += 1
            result[i] = RowPara(para_id, None)
            i += 1
            continue
        j = i
        while j < len(rows) and rows[j].num_words > 0:
            j += 1
        zone = rows[i:j]
        just = _classify_zone(zone)
        if just == JUST_CENTER:
            marks = [(k == 0, ParaModel(JUST_CENTER, 0, 0, 0), False, False)
                     for k in range(len(zone))]
        elif just == JUST_RIGHT:
            marks = _right_zone(zone)
        else:
            marks = []
            for kind, lo, hi in _segment_left_zone(zone):
                sub = zone[lo:hi]
                if kind == "stray":
                    # indent-outlier junk row (centered page number): its own
                    # UNMODELED paragraph — PNONE in the reference harness
                    # (paragraphs_test.cc:470 TestStrayLineInBlock)
                    sub_marks = [(True, None, False, False)]
                elif kind == "list":
                    sub_marks = _list_zone(sub)
                elif kind == "quote":
                    sub_marks = _left_zone(sub, False, seed_models)
                    # a block quote opens without its own first-line indent
                    # relative to its deeper margin → crown, like the
                    # reference's kComplexPage1 expectation
                    if len({r.lindent for r in sub}) == 1:
                        s0 = sub_marks[0]
                        q_margin = sub[0].lindent * _CHAR_PX
                        sub_marks[0] = (True, ParaModel(JUST_LEFT, q_margin, 0, 0),
                                        True, s0[3])
                else:
                    sub_marks = _left_zone(sub, first_text_zone and lo == 0,
                                           seed_models)
                # a sub-zone always opens a new paragraph
                if sub_marks:
                    s0 = sub_marks[0]
                    sub_marks[0] = (True, s0[1], s0[2], s0[3])
                marks.extend(sub_marks)
        for k, (starts, model, crown, is_list) in enumerate(marks):
            if starts or k == 0:
                para_id += 1
            result[i + k] = RowPara(para_id, model, crown if (starts or k == 0) else False,
                                    is_list if (starts or k == 0) else False)
        first_text_zone = False
        i = j

    return result


def paragraphs_df(rows_df, group_cols: tuple[str, ...] = ("doc_id", "block_order"),
                  text_col: str = "line_text", order_col: str = "row_order"):
    """DataFrame surface: per (doc, block) group, assign `para_id`,
    `justification`, `is_crown`, `is_list_item` to each row.  One
    applyInPandas pass — groups are single blocks, so the per-group Python
    work is the same per-block loop the reference runs."""
    import pandas as pd
    from pyspark.sql import functions as F

    schema = (", ".join(f"{c} string" for c in group_cols)
              + f", {order_col} int, {text_col} string, para_id int, "
              "justification string, is_crown boolean, is_list_item boolean")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        infos = [RowInfo.from_ascii(t or "") for t in pdf[text_col]]
        ras = detect_paragraphs(infos)
        pdf["para_id"] = [ra.para_id for ra in ras]
        pdf["justification"] = [
            ra.model.justification if ra.model else None for ra in ras]
        pdf["is_crown"] = [ra.is_crown for ra in ras]
        pdf["is_list_item"] = [ra.is_list_item for ra in ras]
        return pdf

    cast = rows_df.select(
        *[F.col(c).cast("string").alias(c) for c in group_cols],
        F.col(order_col).cast("int").alias(order_col),
        F.col(text_col).cast("string").alias(text_col),
    )
    return cast.groupBy(*group_cols).applyInPandas(fn, schema=schema)
