#!/usr/bin/env python
"""Frequency-weighted running-text coverage of the CJK composed core.

The composer (vse_tpu/core/cjk.py + cjk_ids.py) renders only a curated
high-frequency subset of the 21k-char CJK dicts. A raw char count
("1.4k of 21k") says nothing about usefulness; what matters is the share
of REAL running text those chars carry. This tool weights coverage by a
word-frequency corpus (jieba's built-in dict: 349k words with counts,
simplified Chinese — a subtitle-adjacent colloquial distribution) and
reports, per family, the fraction of character occurrences the composed
set can render.

Caveats (also noted in ARCHITECTURE.md):
- the corpus is simplified-Chinese; for `chinese_cht` the number is a
  proxy (no offline s2t converter here), and for `japan` it covers only
  the kanji share — kana (the majority of Japanese subtitle characters)
  are fully authored (core/kana.py), so the true japan coverage is higher.

Usage: python tools/cjk_coverage.py [--json]
"""

from __future__ import annotations

import argparse
import collections
import json
import os

JIEBA_DICT = os.path.join(
    os.path.dirname(os.__file__), "site-packages", "jieba", "dict.txt")


def char_freq() -> collections.Counter:
    cf = collections.Counter()
    with open(JIEBA_DICT, encoding="utf-8") as f:
        for ln in f:
            parts = ln.split()
            if len(parts) >= 2:
                try:
                    n = int(parts[1])
                except ValueError:
                    continue
                for ch in parts[0]:
                    cf[ch] += n
    return cf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--top-missing", type=int, default=0,
                    help="also print the N highest-frequency uncovered chars")
    args = ap.parse_args()

    from vse_tpu.core.cjk import cjk_script_for

    cf = char_freq()
    total = sum(cf.values())
    out = {}
    for fam in ("ch", "chinese_cht", "japan"):
        s = cjk_script_for(fam)
        cov = sum(n for ch, n in cf.items() if ch in s.glyphs)
        n_render = sum(1 for ch in cf if ch in s.glyphs)
        out[fam] = {"renderable_chars": n_render,
                    "running_text_coverage": round(cov / total, 4)}
        if args.top_missing and fam == "ch":
            missing = [(c, n) for c, n in cf.most_common()
                       if c not in s.glyphs and ord(c) >= 0x3400]
            out[fam]["top_missing"] = "".join(
                c for c, _ in missing[:args.top_missing])
    if args.json:
        print(json.dumps(out, ensure_ascii=False))
    else:
        for fam, r in out.items():
            print(f"{fam}: {r['renderable_chars']} renderable chars -> "
                  f"{r['running_text_coverage']:.1%} of running text"
                  + (f"; top missing: {r['top_missing']}"
                     if "top_missing" in r else ""))


if __name__ == "__main__":
    main()
