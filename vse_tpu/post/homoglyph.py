"""Cross-script homoglyph normalization for bilingual rec heads.

The cyrillic / greek charsets (reference dict files
backend/ppocr/utils/dict/cyrillic_dict.txt etc., mirrored in
vse_tpu/assets/dicts/) contain BOTH the native script and basic latin.
In DejaVu — the renderer this framework trains from — many letter pairs
are pixel-identical across scripts (а/a, е/e, о/o, р/p, с/c, …), so the
trained head genuinely cannot tell them apart and emits an arbitrary
member of each twin class. Left alone that scrambles output text across
scripts ("пpивeт" with a latin p/e), which breaks downstream dedup,
similarity grouping, and CER even though every glyph is visually right.

The arabic head solves this at TRAINING time by folding twin classes
(vse_tpu/core/arabic.py HOMOGLYPHS -> Charset.aliased); for the
cyrillic/greek bilingual heads the two scripts must stay separate classes
(the same head serves latin text), so the fold happens at DECODE time
instead: a per-line majority vote picks the dominant script, then every
twin is folded toward it. Pixel-identical twins carry no information
either way, so the vote is the maximum-likelihood assignment under the
constraint that real subtitle lines do not mix scripts letter-by-letter.
"""

from __future__ import annotations

import unicodedata
from typing import Dict

# DejaVu pixel-identical (or indistinguishable-at-rec-resolution) twins.
# latin -> cyrillic
_L2CYR: Dict[str, str] = {
    "a": "а", "c": "с", "e": "е", "o": "о", "p": "р", "x": "х", "y": "у",
    "i": "і", "s": "ѕ", "j": "ј",
    "A": "А", "B": "В", "C": "С", "E": "Е", "H": "Н", "I": "І", "J": "Ј",
    "K": "К", "M": "М", "O": "О", "P": "Р", "S": "Ѕ", "T": "Т", "X": "Х",
    "Y": "У", "3": "З", "6": "б",
}
# digits stay digits: 3/6 folds only apply when the line has NO other
# digits (a timestamp like 3:16 must survive) — handled in the fold loop.
_DIGIT_FOLDS = {"3", "6"}

# latin -> greek
_L2EL: Dict[str, str] = {
    "o": "ο", "v": "ν", "u": "υ", "n": "η",
    "A": "Α", "B": "Β", "E": "Ε", "Z": "Ζ", "H": "Η", "I": "Ι", "K": "Κ",
    "M": "Μ", "N": "Ν", "O": "Ο", "P": "Ρ", "T": "Τ", "Y": "Υ", "X": "Χ",
}

_CYR2L = {v: k for k, v in _L2CYR.items() if k not in _DIGIT_FOLDS}
_EL2L = {v: k for k, v in _L2EL.items()}


def _script_of(ch: str) -> str:
    o = ord(ch)
    if 0x0400 <= o <= 0x052F:
        return "cyrillic"
    if 0x0370 <= o <= 0x03FF or 0x1F00 <= o <= 0x1FFF:
        return "greek"
    if ch.isalpha() and o < 0x250:
        return "latin"
    return ""


def normalize_script(text: str, family: str) -> str:
    """Fold homoglyph twins toward the line's majority script.

    `family` is the rec head's script family ('cyrillic' | 'el'); other
    families pass through unchanged. Ties break toward the native (non-
    latin) script — that is the head's primary language.
    """
    if family == "cyrillic":
        native, to_native, to_latin = "cyrillic", _L2CYR, _CYR2L
    elif family == "el":
        native, to_native, to_latin = "greek", _L2EL, _EL2L
    else:
        return text
    counts = {"latin": 0, native: 0}
    for ch in text:
        s = _script_of(ch)
        if s in counts:
            counts[s] += 1
    if not counts["latin"] and not counts[native]:
        return text
    if counts[native] >= counts["latin"]:
        # fold digits only when the line carries no real digit context
        has_digits = any(c.isdigit() and c not in _DIGIT_FOLDS for c in text)
        out = []
        for ch in text:
            if ch in _DIGIT_FOLDS and has_digits:
                out.append(ch)
            else:
                out.append(to_native.get(ch, ch))
        return "".join(out)
    return "".join(to_latin.get(ch, ch) for ch in text)


def strip_confusable_marks(text: str) -> str:
    """NFKC pass used by tests to compare normalized forms."""
    return unicodedata.normalize("NFKC", text)
