#!/usr/bin/env python
"""Glyph-source audit: which rec families can be trained in this image?

Scans every TTF/OTF/TTC/WOFF on the filesystem with fontTools and reports
per-family dict coverage, plus the programmatic composers that substitute
where no font covers a script (hangul jamo composition, strokefont
modules). This is the committed evidence behind the ARCHITECTURE.md parity
note on CJK: if a covering font ever lands in the image, this tool shows
it and `tools/train_all.py` picks the family up with no code changes.

  python tools/probe_fonts.py [--roots /usr /opt ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILIES = ["en", "latin", "cyrillic", "el", "ka", "arabic", "korean",
            "th", "devanagari", "ta", "te", "ch", "chinese_cht", "japan"]


def find_fonts(roots):
    exts = (".ttf", ".otf", ".ttc", ".woff", ".woff2")
    out = []
    for root in roots:
        try:
            proc = subprocess.run(
                ["find", root, "-xdev", "-type", "f"],
                capture_output=True, text=True, timeout=300,
            )
        except Exception:
            continue
        out.extend(
            p for p in proc.stdout.splitlines()
            if p.lower().endswith(exts)
            and "/root/repo" not in p and "/root/reference" not in p
        )
    return sorted(set(out))


def font_cmap(path):
    from fontTools.ttLib import TTFont, TTCollection

    try:
        if path.lower().endswith(".ttc"):
            coll = TTCollection(path, lazy=True)
            cm = set()
            for f in coll.fonts:
                cm |= set((f.getBestCmap() or {}).keys())
            return cm
        return set((TTFont(path, lazy=True).getBestCmap() or {}).keys())
    except Exception:
        return set()


def dict_chars(family):
    p = os.path.join(REPO, "vse_tpu", "assets", "dicts", f"{family}.txt")
    if not os.path.exists(p):
        return []
    with open(p, encoding="utf-8") as f:
        return [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]


def composer_coverage(family, chars):
    """Coverage provided by programmatic composers (no font needed)."""
    if family == "korean":
        from vse_tpu.core.hangul import is_syllable

        return sum(1 for c in chars if is_syllable(c))
    from vse_tpu.core.strokefont import stroke_script_for

    s = stroke_script_for(family)
    if s is None:
        return 0
    return sum(1 for c in chars if s.covers(c))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="*", default=["/usr", "/opt", "/root"])
    args = ap.parse_args()

    fonts = find_fonts(args.roots)
    print(f"{len(fonts)} font files found", file=sys.stderr)
    cmaps = {p: font_cmap(p) for p in fonts}

    report = {}
    for fam in FAMILIES:
        chars = dict_chars(fam)
        if not chars:
            continue
        best_font, best_cov = None, 0
        for p, cm in cmaps.items():
            cov = sum(1 for c in chars if all(ord(x) in cm for x in c))
            if cov > best_cov:
                best_font, best_cov = p, cov
        comp = composer_coverage(fam, chars)
        total = len(chars)
        trainable = max(best_cov, comp + best_cov // 2) / total > 0.5
        report[fam] = {
            "dict_chars": total,
            "best_font": best_font,
            "best_font_coverage": best_cov,
            "composer_coverage": comp,
            "trainable": bool(best_cov / total > 0.5
                              or (comp + min(best_cov, total - comp)) / total
                              > 0.5),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
