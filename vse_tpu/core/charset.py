"""Character-set registry for the recognition heads.

The reference resolves rec models + char dicts per language family
(reference backend/tools/paddle_model_config.py:25-45,84-91: 87 languages
mapped onto script families latin/arabic/cyrillic/devanagari plus the CJK
heads). The dict files themselves live inside the PaddleOCR wheel in the
reference; here charsets are first-class framework objects, loadable from a
one-char-per-line file (the same on-disk format) or built in.

CTC convention: index 0 is the blank; characters are 1..N. A trailing space
character is appended when `use_space_char` (PaddleOCR-compatible behavior).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

# Deterministic ASCII charset (printable ASCII minus control chars).
EN_CHARS = (
    "0123456789"
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
)

DIGITS = "0123456789"

# Language -> script family (reference backend/tools/paddle_model_config.py:25-45)
LATIN_LANGS = (
    "af", "az", "bs", "cs", "cy", "da", "de", "es", "et", "fr", "ga", "hr",
    "hu", "id", "is", "it", "ku", "la", "lt", "lv", "mi", "ms", "mt", "nl",
    "no", "oc", "pi", "pl", "pt", "ro", "rs_latin", "sk", "sl", "sq", "sv",
    "sw", "tl", "tr", "uz", "vi", "french", "german",
)
ARABIC_LANGS = ("ar", "fa", "ug", "ur")
CYRILLIC_LANGS = (
    "ru", "rs_cyrillic", "be", "bg", "uk", "mn", "abq", "ady", "kbd", "ava",
    "dar", "inh", "che", "lbe", "lez", "tab",
)
DEVANAGARI_LANGS = (
    "hi", "mr", "ne", "bh", "mai", "ang", "bho", "mah", "sck", "new", "gom",
    "sa", "bgc",
)


def script_family(language: str) -> str:
    """Map a language code to its rec-head script family (reference
    paddle_model_config.py:84-91)."""
    if language in LATIN_LANGS:
        return "latin"
    if language in ARABIC_LANGS:
        return "arabic"
    if language in CYRILLIC_LANGS:
        return "cyrillic"
    if language in DEVANAGARI_LANGS:
        return "devanagari"
    return language  # ch, en, korean, japan, chinese_cht, ta, te, ka, th, el


@dataclass(frozen=True)
class Charset:
    """Immutable charset with CTC blank at index 0.

    `fold_case=True` lowercases text at encode time (the charset must then
    contain only lowercase letters): case twins like c/C, s/S, o/O differ
    only in glyph size and split CTC probability mass — folding them is the
    difference between convergence and blank collapse when training heads
    from scratch.

    `aliases` maps variant chars onto a canonical class the same way: pairs
    whose glyphs are pixel-identical in the rendering font (Arabic-Indic vs
    Extended Arabic-Indic digits ١/۱, ه/ە, ى/ی) are indistinguishable BY
    CONSTRUCTION, so separate classes just force coin-flip errors; encode
    folds the variant onto the canonical char (which alone keeps a class)."""

    name: str
    chars: Tuple[str, ...]
    use_space_char: bool = True
    fold_case: bool = False
    aliases: Tuple[Tuple[str, str], ...] = ()

    def __post_init__(self):
        chars = tuple(self.chars)
        if self.use_space_char and " " not in chars:
            chars = chars + (" ",)
        object.__setattr__(self, "chars", chars)
        object.__setattr__(
            self, "_index", {c: i + 1 for i, c in enumerate(chars)}
        )
        object.__setattr__(self, "_alias_map", dict(self.aliases))

    @property
    def vocab_size(self) -> int:
        return len(self.chars)

    @property
    def num_classes(self) -> int:
        return len(self.chars) + 1  # + blank

    def encode(self, text: str) -> List[int]:
        """Text -> label ids (unknown chars dropped, like PP-OCR's encoder)."""
        if self.fold_case:
            text = text.lower()
        idx = self._index  # type: ignore[attr-defined]
        am = self._alias_map  # type: ignore[attr-defined]
        if am:
            text = "".join(am.get(c, c) for c in text)
        return [idx[c] for c in text if c in idx]

    def decode_ids(self, ids: Sequence[int]) -> str:
        """Non-blank, already-deduped ids -> text."""
        out = []
        for i in ids:
            if 1 <= i <= len(self.chars):
                out.append(self.chars[i - 1])
        return "".join(out)

    def without_space(self) -> "Charset":
        """Space-class-free variant (CTC heads trained from scratch converge
        far faster without a gap-supervised space class; the word-segmentation
        reformat stage re-splits, reference backend/tools/reformat.py)."""
        if not self.use_space_char and " " not in self.chars:
            return self
        return Charset(
            name=self.name,
            chars=tuple(c for c in self.chars if c != " "),
            use_space_char=False,
            fold_case=self.fold_case,
            aliases=self.aliases,
        )

    def aliased(self, alias_map: Dict[str, str]) -> "Charset":
        """Homoglyph-folded variant: each alias key loses its class and
        encodes as its canonical value (which must stay in the charset)."""
        keys = set(alias_map)
        return Charset(
            name=self.name,
            chars=tuple(c for c in self.chars if c not in keys),
            use_space_char=self.use_space_char,
            fold_case=self.fold_case,
            aliases=tuple(sorted(alias_map.items())),
        )

    def folded(self) -> "Charset":
        """Case-folded variant: lowercase letters only, encode() lowercases.

        Keeps the family name: the fold is recorded in the checkpoint's
        vse_meta.json, and the registry resolves checkpoints by the stable
        family name (renaming here once sent trained latin heads to a path
        the engine never looked up)."""
        seen = []
        for c in self.chars:
            lc = c.lower()
            if lc not in seen:
                seen.append(lc)
        return Charset(
            name=self.name,
            chars=tuple(seen),
            use_space_char=self.use_space_char,
            fold_case=True,
        )

    @classmethod
    def from_file(cls, name: str, path: str, use_space_char: bool = True) -> "Charset":
        """Load a one-character-per-line dict file (PaddleOCR format)."""
        chars = []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n").rstrip("\r")
                if line:
                    chars.append(line)
        return cls(name=name, chars=tuple(chars), use_space_char=use_space_char)


# Conjoining-jamo token blocks (Unicode choseong/jungseong/jongseong): each
# positional jamo class gets its own codepoint, so initial-ㄱ and final-ㄱ are
# DISTINCT CTC classes and syllable recomposition at decode time is
# unambiguous (L then V then optional T, positions never collide).
_CHOSEONG = tuple(chr(0x1100 + i) for i in range(19))
_JUNGSEONG = tuple(chr(0x1161 + i) for i in range(21))
_JONGSEONG = tuple(chr(0x11A8 + i) for i in range(27))  # index 1..27 of FINALS


@dataclass(frozen=True)
class JamoCharset(Charset):
    """Korean charset factored to positional-jamo CTC classes.

    The syllable-level korean head is a 2,350-way classification through a
    ~25 px glyph — the r3 accuracy frontier (CER 0.30). Every modern
    syllable decomposes arithmetically into (initial, medial, final) jamo
    (vse_tpu/core/hangul.py), and the stroke composer draws exactly those
    jamo, so the natural TPU-native head is 19+21+27 positional jamo
    classes plus the non-Hangul chars: encode() emits 2-3 jamo ids per
    syllable, decode_ids() recomposes. Standalone compatibility jamo
    (subtitle 'ㅋㅋㅋ') encode as lone positional tokens and decode back to
    compatibility forms. The reference's korean head keeps syllable classes
    (reference backend/models/V3/korean_rec_fast) — the factorization is a
    rebuild choice, invisible at the text-output contract.

    `render_chars` keeps the syllable-level alphabet for the synthetic
    renderer (text is still GENERATED as syllables; only labels factor)."""

    render_chars: Tuple[str, ...] = ()

    def encode(self, text: str) -> List[int]:
        from vse_tpu.core.hangul import (
            FINALS, INITIALS, MEDIALS, decompose_indices, is_syllable,
        )

        idx = self._index  # type: ignore[attr-defined]
        out: List[int] = []
        for c in text:
            if is_syllable(c):
                l, v, t = decompose_indices(c)
                out.append(idx[_CHOSEONG[l]])
                out.append(idx[_JUNGSEONG[v]])
                if t:
                    out.append(idx[_JONGSEONG[t - 1]])
            elif c in idx:
                out.append(idx[c])
            elif c in INITIALS:  # standalone compatibility consonant
                out.append(idx[_CHOSEONG[INITIALS.index(c)]])
            elif c in MEDIALS:
                out.append(idx[_JUNGSEONG[MEDIALS.index(c)]])
            elif c in FINALS:  # final-only compounds (ㄳ ㄵ ...)
                out.append(idx[_JONGSEONG[FINALS.index(c) - 1]])
            # unknown chars dropped (PP-OCR encoder behavior)
        return out

    def decode_ids(self, ids: Sequence[int]) -> str:
        from vse_tpu.core.hangul import FINALS, INITIALS, MEDIALS, compose

        toks = [
            self.chars[i - 1] for i in ids if 1 <= i <= len(self.chars)
        ]
        out: List[str] = []
        i = 0
        n = len(toks)
        while i < n:
            o = ord(toks[i])
            if 0x1100 <= o <= 0x1112:  # choseong
                if i + 1 < n and 0x1161 <= ord(toks[i + 1]) <= 0x1175:
                    l, v = o - 0x1100, ord(toks[i + 1]) - 0x1161
                    i += 2
                    t = 0
                    if i < n and 0x11A8 <= ord(toks[i]) <= 0x11C2:
                        t = ord(toks[i]) - 0x11A7
                        i += 1
                    out.append(compose(l, v, t))
                else:  # lone consonant -> compatibility form (ㅋㅋㅋ)
                    out.append(INITIALS[o - 0x1100])
                    i += 1
            elif 0x1161 <= o <= 0x1175:  # stray vowel
                out.append(MEDIALS[o - 0x1161])
                i += 1
            elif 0x11A8 <= o <= 0x11C2:  # stray final
                out.append(FINALS[o - 0x11A7])
                i += 1
            else:
                out.append(toks[i])
                i += 1
        return "".join(out)

    def without_space(self) -> "JamoCharset":
        if not self.use_space_char and " " not in self.chars:
            return self
        return JamoCharset(
            name=self.name,
            chars=tuple(c for c in self.chars if c != " "),
            use_space_char=False,
            fold_case=self.fold_case,
            render_chars=self.render_chars,
        )


def to_jamo(base: Charset) -> JamoCharset:
    """Factor a syllable-level korean charset into the jamo charset. The
    non-Hangul chars keep their identity; syllables and compatibility jamo
    are replaced by the 67 positional jamo classes."""
    from vse_tpu.core.hangul import is_syllable

    def _is_compat(c: str) -> bool:
        return 0x3130 <= ord(c) < 0x3190

    keep = tuple(
        c for c in base.chars
        if c != " " and not is_syllable(c) and not _is_compat(c)
    )
    return JamoCharset(
        name=base.name,
        chars=keep + _CHOSEONG + _JUNGSEONG + _JONGSEONG,
        use_space_char=base.use_space_char,
        fold_case=False,
        render_chars=base.chars,
    )


_BUILTIN: Dict[str, Charset] = {}


def get_charset(language: str) -> Charset:
    """Resolve a charset for a language (built-ins + on-disk dicts under
    vse_tpu/assets/dicts/<family>.txt when present)."""
    family = script_family(language)
    if family in _BUILTIN:
        return _BUILTIN[family]
    dict_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "dicts", f"{family}.txt",
    )
    if os.path.exists(dict_path):
        cs = Charset.from_file(family, dict_path)
    elif family == "en":
        cs = Charset(name="en", chars=tuple(EN_CHARS))
    elif family == "digits":
        cs = Charset(name="digits", chars=tuple(DIGITS), use_space_char=False)
    else:
        # Fallback so every language resolves; real deployments drop a dict
        # file into assets/dicts/.
        cs = Charset(name=family, chars=tuple(EN_CHARS))
    _BUILTIN[family] = cs
    return cs
