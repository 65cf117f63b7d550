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
    from scratch."""

    name: str
    chars: Tuple[str, ...]
    use_space_char: bool = True
    fold_case: bool = False

    def __post_init__(self):
        chars = tuple(self.chars)
        if self.use_space_char and " " not in chars:
            chars = chars + (" ",)
        object.__setattr__(self, "chars", chars)
        object.__setattr__(
            self, "_index", {c: i + 1 for i, c in enumerate(chars)}
        )

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
