#!/usr/bin/env python
"""Generate rec charset dictionaries for every script family.

The reference's per-language dicts live inside the PaddleOCR wheel; here the
framework owns them as assets (vse_tpu/assets/dicts/<family>.txt, one char
per line — the same on-disk format, loadable by Charset.from_file). Coverage
is built from Unicode blocks; when converting upstream rec weights the
matching upstream dict must be dropped in instead (the head's class order is
part of the checkpoint).
"""

import os
import sys
import unicodedata

ASCII = [chr(c) for c in range(0x21, 0x7F)]  # printable, no space (added by Charset)
DIGITS = [chr(c) for c in range(0x30, 0x3A)]


def block(a, b):
    out = []
    for c in range(a, b + 1):
        ch = chr(c)
        if unicodedata.category(ch).startswith(("L", "N", "M", "P", "S")):
            out.append(ch)
    return out


def hangul_ksx1001():
    """The 2,350 modern syllables of KS X 1001 (the EUC-KR wansung rows).

    The full composable block is 11,172 syllables, but real Korean text —
    and the reference's korean_rec_fast head — lives almost entirely in the
    KS X 1001 set; an 11k-way CTC softmax on a mobile CRNN converges far
    too slowly for the rare tail to be worth the classes."""
    out = []
    for c in range(0xAC00, 0xD7A4):
        try:
            b = chr(c).encode("euc_kr")
        except UnicodeEncodeError:
            continue
        if len(b) == 2 and 0xB0 <= b[0] <= 0xC8 and 0xA1 <= b[1] <= 0xFE:
            out.append(chr(c))
    return out


FAMILIES = {
    # CJK Unified Ideographs + CJK punctuation
    "ch": ASCII + block(0x3000, 0x303F) + block(0x4E00, 0x9FA5),
    "chinese_cht": ASCII + block(0x3000, 0x303F) + block(0x4E00, 0x9FA5),
    # kana + CJK
    "japan": ASCII + block(0x3000, 0x303F) + block(0x3040, 0x309F)
    + block(0x30A0, 0x30FF) + block(0x4E00, 0x9FA5),
    # hangul syllables (KS X 1001 modern set) + jamo
    "korean": ASCII + block(0x3130, 0x318F) + hangul_ksx1001(),
    "latin": ASCII + block(0x00C0, 0x024F),
    "arabic": DIGITS + block(0x0600, 0x06FF) + block(0x0750, 0x077F),
    "cyrillic": ASCII + block(0x0400, 0x04FF),
    "devanagari": DIGITS + block(0x0900, 0x097F),
    "ta": DIGITS + block(0x0B80, 0x0BFF),
    "te": DIGITS + block(0x0C00, 0x0C7F),
    "ka": DIGITS + block(0x10A0, 0x10FF),
    "th": DIGITS + block(0x0E00, 0x0E7F),
    "el": ASCII + block(0x0370, 0x03FF),
}


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vse_tpu", "assets", "dicts",
    )
    os.makedirs(out_dir, exist_ok=True)
    for family, chars in FAMILIES.items():
        seen = []
        seen_set = set()
        for c in chars:
            if c not in seen_set:
                seen.append(c)
                seen_set.add(c)
        path = os.path.join(out_dir, f"{family}.txt")
        with open(path, "w", encoding="utf-8") as f:
            for c in seen:
                f.write(c + "\n")
        print(f"{family}: {len(seen)} chars -> {path}")


if __name__ == "__main__":
    main()
