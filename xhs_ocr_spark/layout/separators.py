"""Inter-block separator rule (X16).

Semantics of tbpu/parser_tools/paragraph_parse.py:9-36: CJK/CJK adjacency
joins with no separator; trailing hyphen joins; leading punctuation joins;
everything else gets one space.
"""

from __future__ import annotations

import unicodedata

_CJK_RANGES = (
    (0x4E00, 0x9FFF),   # CJK unified
    (0x3040, 0x30FF),   # kana
    (0x1100, 0x11FF),   # hangul jamo
    (0x3130, 0x318F),   # hangul compat
    (0xAC00, 0xD7AF),   # hangul syllables
    (0x3000, 0x303F),   # CJK punctuation
    (0xFE30, 0xFE4F),   # compat forms
    (0xFF00, 0xFFEF),   # full/half-width forms
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def word_separator(prev_last: str, next_first: str) -> str:
    if _is_cjk(prev_last) and _is_cjk(next_first):
        return ""
    if prev_last == "-":
        return ""
    if unicodedata.category(next_first).startswith("P"):
        return ""
    return " "
