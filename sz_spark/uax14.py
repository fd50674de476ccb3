"""UAX-14 line-breaking: break-opportunity detection over Line_Break
classes with the classic LB1-LB31 rule chain.

Mirrors the reference's sz_utf8_linebreaks surface
(utf8_linebreaks/serial.h): LB1 class resolution, LB4-LB6 mandatory
breaks, LB7/LB18 space handling, LB8/LB8a ZW/ZWJ, LB9/LB10 combining
mark attachment, LB11-LB17 glue/bracket/quote/B2 rules (classic LB15),
LB19-LB24 quote/dash/number adjacency, LB25 numeric-context pairs,
LB26/LB27 Korean syllable blocks (JL/JV/JT/H2/H3 derived
arithmetically from the Hangul range), LB28-LB30 alphabetic/bracket
joins, LB30a regional-indicator parity, LB30b emoji base x modifier,
LB31 default break.

Class derivation: vendored range/selector lists for the classes the
UCD's LineBreak.txt enumerates (public data), with unicodedata
categories as the fallback partition; LB1's SA/AI/CJ/XX remaps are
applied in the classifier.  Omitted refinements vs the newest TR14:
LB15a/b Pi/Pf quote context (classic LB15 QU SP* x OP is used), LB28a
orthographic-syllable (aksara) clusters, LB20 CB (no inline-object
class in a text corpus).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from sz_spark.uax29 import _HEBREW_RANGES, _in_ranges, is_extended_pictographic

# Line_Break classes (subset relevant to the rule chain)
(
    LB_AL, LB_BK, LB_CR, LB_LF, LB_NL, LB_SP, LB_ZW, LB_WJ, LB_GL, LB_CM,
    LB_ZWJ, LB_B2, LB_BA, LB_BB, LB_HY, LB_CL, LB_CP, LB_EX, LB_IN, LB_NS,
    LB_OP, LB_QU, LB_IS, LB_NU, LB_PO, LB_PR, LB_SY, LB_HL, LB_ID, LB_EB,
    LB_EM, LB_RI, LB_JL, LB_JV, LB_JT, LB_H2, LB_H3,
) = range(37)

_BA_CPS = frozenset(
    [0x0009, 0x00AD, 0x058A, 0x2010, 0x2012, 0x2013]
    + list(range(0x2000, 0x2007))
    + list(range(0x2008, 0x200B))
)
_GL_CPS = frozenset((0x00A0, 0x2007, 0x202F, 0x2011, 0x0F08, 0x0F0C, 0x0F12))
_WJ_CPS = frozenset((0x2060, 0xFEFF))
_B2_CPS = frozenset((0x2014,))
_BB_CPS = frozenset((0x02C8, 0x02CC, 0x00B4, 0x1FFD))
_CP_CPS = frozenset((0x0029, 0x005D))
_CL_EXTRA = frozenset((0x3001, 0x3002, 0xFF0C, 0xFF0E, 0xFF61, 0xFF64, 0xFE50, 0xFE52))
_EX_CPS = frozenset((0x0021, 0x003F, 0x2762, 0x2763, 0xFF01, 0xFF1F))
_IN_CPS = frozenset((0x2024, 0x2025, 0x2026, 0x22EF, 0xFE19))
_NS_CPS = frozenset((0x17D4, 0x17D5, 0x17D6, 0x203D, 0x2047, 0x2048, 0x2049, 0x30FB, 0xFF65))
# CJ (conditional Japanese starters) -> NS per default LB1
_CJ_CPS = frozenset(
    [0x30FC]
    + [0x3041 + i for i in (0, 2, 4, 6, 8)]  # small a i u e o hiragana
    + [0x30A1 + i for i in (0, 2, 4, 6, 8)]  # small katakana
    + list(range(0x3063, 0x3064)) + [0x3083, 0x3085, 0x3087, 0x308E]
    + list(range(0x30C3, 0x30C4)) + [0x30E3, 0x30E5, 0x30E7, 0x30EE]
    + list(range(0xFF67, 0xFF71))  # halfwidth small kana
)
_IS_CPS = frozenset((0x002C, 0x002E, 0x003A, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D))
_PO_CPS = frozenset((0x0025, 0x00A2, 0x00B0, 0x2030, 0x2031, 0x2032, 0x2033, 0x2103, 0xFF05, 0xFE6A))
_PR_EXTRA = frozenset((0x002B, 0x005C, 0x00B1, 0x2212, 0x2213))
_SY_CPS = frozenset((0x002F,))
_OP_EXTRA = frozenset((0x00A1, 0x00BF))
_QU_CPS = frozenset((0x0022, 0x0027))

_ID_RANGES = (
    (0x2E80, 0x2FFF),  # radicals / ideographic description
    (0x3000, 0x3000),  # ideographic space
    (0x3041, 0x309F),  # Hiragana (CJ members remapped first)
    (0x30A0, 0x30FF),  # Katakana (CJ/NS members remapped first)
    (0x3130, 0x318F),  # Hangul compatibility jamo (ID per TR14)
    (0x3400, 0x4DBF),
    (0x4E00, 0x9FFF),
    (0xA000, 0xA48F),  # Yi
    (0xF900, 0xFAFF),
    (0xFF66, 0xFF9D),  # halfwidth katakana
    (0x1B000, 0x1B16F),
    (0x20000, 0x3FFFD),
)

_EB_RANGES = (  # emoji modifier bases (subset: people/hands/faces that take tones)
    (0x261D, 0x261D), (0x26F9, 0x26F9), (0x270A, 0x270D),
    (0x1F385, 0x1F385), (0x1F3C2, 0x1F3C4), (0x1F3C7, 0x1F3C7),
    (0x1F3CA, 0x1F3CC), (0x1F442, 0x1F443), (0x1F446, 0x1F450),
    (0x1F466, 0x1F478), (0x1F47C, 0x1F47C), (0x1F481, 0x1F483),
    (0x1F485, 0x1F487), (0x1F4AA, 0x1F4AA), (0x1F574, 0x1F575),
    (0x1F57A, 0x1F57A), (0x1F590, 0x1F590), (0x1F595, 0x1F596),
    (0x1F645, 0x1F647), (0x1F64B, 0x1F64F), (0x1F6A3, 0x1F6A3),
    (0x1F6B4, 0x1F6B6), (0x1F6C0, 0x1F6C0), (0x1F6CC, 0x1F6CC),
    (0x1F90C, 0x1F90C), (0x1F918, 0x1F91F), (0x1F926, 0x1F926),
    (0x1F930, 0x1F939), (0x1F93C, 0x1F93E), (0x1F977, 0x1F977),
    (0x1F9B5, 0x1F9B6), (0x1F9B8, 0x1F9B9), (0x1F9BB, 0x1F9BB),
    (0x1F9CD, 0x1F9DD),
)


@lru_cache(maxsize=None)
def line_break_class(cp: int) -> int:
    """LB1-resolved Line_Break class of a codepoint."""
    if cp in (0x000B, 0x000C, 0x2028, 0x2029):
        return LB_BK
    if cp == 0x000D:
        return LB_CR
    if cp == 0x000A:
        return LB_LF
    if cp == 0x0085:
        return LB_NL
    if cp == 0x0020:
        return LB_SP
    if cp == 0x200B:
        return LB_ZW
    if cp == 0x200D:
        return LB_ZWJ
    if cp in _WJ_CPS:
        return LB_WJ
    if cp in _GL_CPS:
        return LB_GL
    if cp == 0x002D:
        return LB_HY
    if cp in _BA_CPS:
        return LB_BA
    if cp in _BB_CPS:
        return LB_BB
    if cp in _B2_CPS:
        return LB_B2
    if cp in _CP_CPS:
        return LB_CP
    if cp in _EX_CPS:
        return LB_EX
    if cp in _IN_CPS:
        return LB_IN
    if cp in _CJ_CPS or cp in _NS_CPS:
        return LB_NS  # LB1: CJ -> NS at default tailoring
    if cp in _IS_CPS:
        return LB_IS
    if cp in _PO_CPS:
        return LB_PO
    if cp in _PR_EXTRA:
        return LB_PR
    if cp in _SY_CPS:
        return LB_SY
    if cp in _QU_CPS:
        return LB_QU
    if cp in _OP_EXTRA:
        return LB_OP
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return LB_RI
    if 0x1F3FB <= cp <= 0x1F3FF:
        return LB_EM
    if 0x1100 <= cp <= 0x115F:
        return LB_JL
    if 0x1160 <= cp <= 0x11A7:
        return LB_JV
    if 0x11A8 <= cp <= 0x11FF:
        return LB_JT
    if 0xAC00 <= cp <= 0xD7A3:
        return LB_H2 if (cp - 0xAC00) % 28 == 0 else LB_H3
    if _in_ranges(cp, _EB_RANGES):
        return LB_EB
    if _in_ranges(cp, _ID_RANGES):
        return LB_ID
    if _in_ranges(cp, _HEBREW_RANGES):
        return LB_HL
    ch = chr(cp)
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me") or cp == 0x200C:
        return LB_CM
    if cat == "Nd":
        return LB_NU
    if cat == "Sc":
        return LB_PR
    if cat == "Ps":
        return LB_OP
    if cat == "Pe":
        return LB_CL
    if cat in ("Pi", "Pf"):
        return LB_QU
    if is_extended_pictographic(cp) and cp > 0xFFFF:
        return LB_ID  # non-EB pictographics behave like ideographs
    return LB_AL  # LB1: AI/SG/XX/SA(non-mark) -> AL


_MANDATORY_AFTER = frozenset((LB_BK, LB_CR, LB_LF, LB_NL))
_LB25_NO_BREAK_PAIRS = frozenset(
    [
        (LB_CL, LB_PO), (LB_CP, LB_PO), (LB_CL, LB_PR), (LB_CP, LB_PR),
        (LB_NU, LB_PO), (LB_NU, LB_PR), (LB_PO, LB_OP), (LB_PO, LB_NU),
        (LB_PR, LB_OP), (LB_PR, LB_NU), (LB_HY, LB_NU), (LB_IS, LB_NU),
        (LB_NU, LB_NU), (LB_SY, LB_NU),
    ]
)


def _collapse(cps: list[int]) -> tuple[list[int], list[int]]:
    """LB9/LB10: fold CM/ZWJ runs onto their base; a mark with no
    attachable base becomes a lone AL.  Returns (start_index_per_cluster,
    class_per_cluster); a cluster's class is its base's class, and a
    trailing ZWJ marks the NEXT boundary as LB8a-protected via the
    returned class list (handled by the caller checking raw cps)."""
    starts: list[int] = []
    classes: list[int] = []
    i, n = 0, len(cps)
    while i < n:
        cls = line_break_class(cps[i])
        if cls in (LB_CM, LB_ZWJ):
            cls = LB_AL  # LB10: lone mark
        starts.append(i)
        classes.append(cls)
        i += 1
        if line_break_class(cps[starts[-1]]) not in (
            LB_BK, LB_CR, LB_LF, LB_NL, LB_SP, LB_ZW
        ):
            while i < n and line_break_class(cps[i]) in (LB_CM, LB_ZWJ):
                i += 1  # LB9: marks attach
    return starts, classes


def _break_allowed(cps, starts, classes, k: int) -> bool:
    """Whether a break opportunity exists before cluster k (k >= 1) —
    the LB4-LB31 chain over collapsed clusters, first match wins."""
    b, a = classes[k - 1], classes[k]
    prev_last_cp = cps[starts[k] - 1]  # last raw cp of cluster k-1
    if b == LB_BK:
        return True  # LB4
    if b == LB_CR and a == LB_LF:
        return False  # LB5
    if b in (LB_CR, LB_LF, LB_NL):
        return True  # LB5
    if a in _MANDATORY_AFTER or a in (LB_CR,):
        return False  # LB6
    if a in (LB_SP, LB_ZW):
        return False  # LB7
    # LB8: ZW SP* (break after, even across spaces)
    j = k - 1
    while j >= 0 and classes[j] == LB_SP:
        j -= 1
    if j >= 0 and classes[j] == LB_ZW:
        return True
    if line_break_class(prev_last_cp) == LB_ZWJ:
        return False  # LB8a
    if b == LB_WJ or a == LB_WJ:
        return False  # LB11
    if b == LB_GL:
        return False  # LB12
    if b not in (LB_SP, LB_BA, LB_HY) and a == LB_GL:
        return False  # LB12a
    if a in (LB_CL, LB_CP, LB_EX, LB_IS, LB_SY):
        return False  # LB13
    # left context across spaces for LB14-LB17
    nsc = classes[j] if j >= 0 else None  # nearest non-SP class
    if nsc == LB_OP:
        return False  # LB14
    if nsc == LB_QU and a == LB_OP:
        return False  # LB15 (classic)
    if nsc in (LB_CL, LB_CP) and a == LB_NS:
        return False  # LB16
    if nsc == LB_B2 and a == LB_B2:
        return False  # LB17
    if b == LB_SP:
        return True  # LB18
    if a == LB_QU or b == LB_QU:
        return False  # LB19
    if a in (LB_BA, LB_HY, LB_NS):
        return False  # LB21
    if b == LB_BB:
        return False  # LB21
    if (
        k >= 2
        and classes[k - 2] == LB_HL
        and b in (LB_HY, LB_BA)
        and a != LB_HL
    ):
        return False  # LB21a
    if b == LB_SY and a == LB_HL:
        return False  # LB21b
    if a == LB_IN:
        return False  # LB22
    if b in (LB_AL, LB_HL) and a == LB_NU:
        return False  # LB23
    if b == LB_NU and a in (LB_AL, LB_HL):
        return False  # LB23
    if b == LB_PR and a in (LB_ID, LB_EB, LB_EM):
        return False  # LB23a
    if b in (LB_ID, LB_EB, LB_EM) and a == LB_PO:
        return False  # LB23a
    if b in (LB_PR, LB_PO) and a in (LB_AL, LB_HL):
        return False  # LB24
    if b in (LB_AL, LB_HL) and a in (LB_PR, LB_PO):
        return False  # LB24
    if (b, a) in _LB25_NO_BREAK_PAIRS:
        return False  # LB25 (pair approximation of the numeric regex;
        # b is genuinely adjacent — a space left side already broke at LB18)
    if b == LB_JL and a in (LB_JL, LB_JV, LB_H2, LB_H3):
        return False  # LB26
    if b in (LB_JV, LB_H2) and a in (LB_JV, LB_JT):
        return False  # LB26
    if b in (LB_JT, LB_H3) and a == LB_JT:
        return False  # LB26
    if b in (LB_JL, LB_JV, LB_JT, LB_H2, LB_H3) and a == LB_PO:
        return False  # LB27
    if b == LB_PR and a in (LB_JL, LB_JV, LB_JT, LB_H2, LB_H3):
        return False  # LB27
    if b in (LB_AL, LB_HL) and a in (LB_AL, LB_HL):
        return False  # LB28
    if b == LB_IS and a in (LB_AL, LB_HL):
        return False  # LB29
    if b in (LB_AL, LB_HL, LB_NU) and a == LB_OP:
        return False  # LB30
    if b == LB_CP and a in (LB_AL, LB_HL, LB_NU):
        return False  # LB30
    if b == LB_RI and a == LB_RI:
        run = 0
        m = k - 1
        while m >= 0 and classes[m] == LB_RI:
            run += 1
            m -= 1
        if run % 2 == 1:
            return False  # LB30a: pair up RIs
    if b == LB_EB and a == LB_EM:
        return False  # LB30b
    return True  # LB31


def linebreak_opportunities(text: str) -> list[tuple[int, bool]]:
    """(codepoint_position, mandatory) for every break opportunity —
    position p means "a line may end before text[p]"."""
    if not text:
        return []
    cps = [ord(c) for c in text]
    starts, classes = _collapse(cps)
    out = []
    for k in range(1, len(starts)):
        if _break_allowed(cps, starts, classes, k):
            mand = classes[k - 1] in _MANDATORY_AFTER or (
                classes[k - 1] == LB_CR
            )
            out.append((starts[k], mand))
    return out


def linebreak_segments(text: str) -> list[str]:
    """Tiling of ``text`` at every break opportunity (the lines you get
    by breaking at each chance); segments concatenate to the input."""
    if not text:
        return []
    cuts = [p for p, _ in linebreak_opportunities(text)]
    out, prev = [], 0
    for p in cuts:
        out.append(text[prev:p])
        prev = p
    out.append(text[prev:])
    return out
