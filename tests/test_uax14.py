"""UAX-14 line-breaking conformance: the LB rule chain against
hand-derived break opportunities (reference surface
utf8_linebreaks/serial.h LB1-LB31)."""

from __future__ import annotations

from sz_spark.uax14 import (
    line_break_class,
    linebreak_opportunities,
    linebreak_segments as lb,
)

NBSP = chr(0xA0)
ZWSP = chr(0x200B)
WJ = chr(0x2060)
SHY = chr(0xAD)


def test_spaces_and_hyphens():
    assert lb("foo bar") == ["foo ", "bar"]  # LB18 after the space run
    assert lb("foo  bar") == ["foo  ", "bar"]
    assert lb("foo-bar") == ["foo-", "bar"]  # break after hyphen (LB21/31)
    assert lb("3-4") == ["3-4"]  # LB25 HY x NU
    assert lb("a" + SHY + "b") == ["a" + SHY, "b"]  # soft hyphen is BA


def test_glue_classes():
    assert lb("a" + NBSP + "b") == ["a" + NBSP + "b"]  # LB12 GL
    assert lb("a" + WJ + "b") == ["a" + WJ + "b"]  # LB11 WJ
    assert lb("a" + ZWSP + "b") == ["a" + ZWSP, "b"]  # LB8 ZW breaks after
    # LB12a: break allowed before GL when preceded by SP
    assert lb("a " + NBSP + "b") == ["a ", NBSP + "b"]


def test_numeric_context():
    assert lb("3.14 ok") == ["3.14 ", "ok"]  # IS/NU joins
    assert lb("100% off") == ["100% ", "off"]  # NU x PO
    assert lb("$25 off") == ["$25 ", "off"]  # PR x NU
    assert lb("1,234,567") == ["1,234,567"]  # IS chains
    assert lb("v1/2") == ["v1/2"]  # SY x NU + AL x NU


def test_mandatory_breaks():
    ops = linebreak_opportunities("ab\ncd")
    assert ops == [(3, True)]  # only the newline, mandatory
    assert lb("ab\ncd") == ["ab\n", "cd"]
    assert lb("a\r\nb") == ["a\r\n", "b"]  # LB5 CR x LF


def test_ideographic_and_korean():
    kanji = chr(0x6F22) + chr(0x5B57)  # 漢字
    assert lb(kanji) == [kanji[0], kanji[1]]  # ID x ID breaks (LB31)
    hangul = chr(0xD55C) + chr(0xAD6D)  # 한국 (both H3 syllables)
    assert lb(hangul) == [hangul[0], hangul[1]]
    jamo = chr(0x1100) + chr(0x1161) + chr(0x11A8)  # JL JV JT
    assert lb(jamo) == [jamo]  # LB26 composes one syllable
    # small kana are NS: no break before (CJ -> NS per LB1)
    kata = chr(0x30AB) + chr(0x30C3) + chr(0x30D7)  # カップ
    assert lb(kata) == [kata[0:2], kata[2]]


def test_quotes_and_brackets():
    assert lb('"hi" x') == ['"hi" ', "x"]  # LB19 quotes glue
    assert lb("(ab) x") == ["(ab) ", "x"]  # LB14 OP, LB13 CL
    assert lb("a (b)") == ["a ", "(b)"]
    assert lb("f(x)!") == ["f(x)!"]  # LB30 AL x OP, LB13 EX


def test_emoji_and_flags():
    flags = chr(0x1F1FA) + chr(0x1F1F8) + chr(0x1F1EB) + chr(0x1F1F7)
    assert lb(flags) == [flags[:2], flags[2:]]  # LB30a RI pairs
    person = chr(0x1F466) + chr(0x1F3FD)
    assert lb(person + " x") == [person + " ", "x"]  # LB30b EB x EM
    zwj_seq = chr(0x1F468) + chr(0x200D) + chr(0x1F469)
    assert lb(zwj_seq) == [zwj_seq]  # LB8a ZWJ glue


def test_combining_marks_attach():
    t = "e" + chr(0x301) + "tude ok"
    assert lb(t) == ["e" + chr(0x301) + "tude ", "ok"]  # LB9
    # LB10: lone mark at start acts as AL
    t2 = chr(0x301) + "x"
    assert lb(t2) == [t2]


def test_hebrew_hyphen_lb21a():
    heb = chr(0x5D0) + chr(0x5D1)
    assert lb(heb + "-x") == [heb + "-x"]  # LB21a: HL HY x (no break)
    assert lb("ab-x") == ["ab-", "x"]  # Latin left side still breaks


def test_class_spot_checks():
    from sz_spark import uax14 as m

    assert line_break_class(0x0020) == m.LB_SP
    assert line_break_class(0x00A0) == m.LB_GL
    assert line_break_class(0x4E00) == m.LB_ID
    assert line_break_class(0xD55C) == m.LB_H3
    assert line_break_class(0xAC00) == m.LB_H2
    assert line_break_class(0x0024) == m.LB_PR  # currency via Sc
    assert line_break_class(0x1F1E6) == m.LB_RI
    assert line_break_class(0x30FC) == m.LB_NS  # CJ -> NS


def test_tiling_fuzz():
    import random

    rng = random.Random(7)
    pool = (
        "ab 12-.,()\"'\n\r"
        + NBSP + ZWSP + WJ
        + chr(0x6F22) + chr(0xD55C) + chr(0x301) + chr(0x200D)
        + chr(0x1F1FA) + chr(0x1F600)
    )
    for _ in range(300):
        t = "".join(rng.choice(pool) for _ in range(rng.randint(0, 30)))
        segs = lb(t)
        assert "".join(segs) == t
        assert all(segs)
