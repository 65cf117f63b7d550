"""Hand-authored stroke scripts (vse_tpu/core/strokefont.py + thai/
devanagari/tamil/telugu data modules): coverage, distinctness, and the
renderer integration that trains the th/devanagari/ta/te rec heads the
reference serves (reference backend/tools/paddle_model_config.py:25-45)
without any covering font in the image."""

import os

import numpy as np
import pytest

FAMILIES = ["th", "devanagari", "ta", "te"]


def _dict_chars(family):
    path = os.path.join(
        os.path.dirname(__file__), "..", "vse_tpu", "assets", "dicts",
        f"{family}.txt",
    )
    with open(path, encoding="utf-8") as f:
        return [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]


@pytest.mark.parametrize("family", FAMILIES)
def test_full_dict_coverage(family):
    """Every dict char must be drawable: stroke glyph, mark, ligature, or
    ascii (font fallback)."""
    from vse_tpu.core.strokefont import stroke_script_for

    s = stroke_script_for(family)
    missing = [c for c in _dict_chars(family)
               if not (s.covers(c) or c.isascii())]
    assert not missing, f"{family}: uncovered {missing!r}"


@pytest.mark.parametrize("family", FAMILIES)
def test_figures_in_bounds(family):
    """Glyph figures stay within a sane box (marks/ticks may overhang a
    little, never wildly)."""
    from vse_tpu.core.strokefont import compose_line, stroke_script_for

    s = stroke_script_for(family)
    for ch in list(s.glyphs):
        figs, adv = compose_line(s, ch)
        assert figs, ch
        assert 0 < adv < 2.0, (ch, adv)
        for fig, is_ell in figs:
            pts = [fig[:2], fig[2:]] if is_ell else fig
            for x, y in pts:
                assert -0.5 <= x <= 2.0 and -0.6 <= y <= 1.6, (ch, x, y)


@pytest.mark.parametrize("family", FAMILIES)
def test_distinct_renders(family):
    """A sample of base glyphs must rasterize distinctly (identical bitmaps
    would merge CTC classes silently)."""
    from PIL import Image, ImageDraw

    from vse_tpu.core.strokefont import draw_text, stroke_script_for

    s = stroke_script_for(family)
    seen = {}
    bases = sorted(s.glyphs)[:40]
    for ch in bases:
        img = Image.new("L", (90, 70), 0)
        draw_text(ImageDraw.Draw(img), (6, 8), ch, 48, s, fill=255)
        arr = np.asarray(img)
        assert arr.max() == 255, ch
        key = arr.tobytes()
        assert key not in seen, f"{family}: {ch!r} renders same as {seen.get(key)!r}"
        seen[key] = ch


@pytest.mark.parametrize("family", FAMILIES)
def test_renderer_batch(family):
    """End-to-end renderer smoke: orthographic pseudo-words, labels within
    vocab, drawn pixels present."""
    pytest.importorskip("cv2")
    from vse_tpu.core.charset import get_charset
    from vse_tpu.train.synth import SynthConfig, TextRenderer

    cs = get_charset(family).without_space()
    r = TextRenderer(
        cs, SynthConfig(words_only=True, fixed_stroke=2, max_label_len=36),
        seed=11,
    )
    b = r.rec_batch(4)
    assert (b["labels"] < cs.num_classes).all()
    assert b["label_lengths"].min() > 0
    assert b["rec_images"].max() > 200


def test_marks_attach_to_base():
    """Combining marks land in their slot relative to the preceding base
    (above marks above the base band, pre marks before the base x)."""
    from vse_tpu.core.strokefont import compose_line, stroke_script_for

    s = stroke_script_for("th")
    # ที = tho thahan + sara i (above)
    figs, _ = compose_line(s, "ที")
    ys = [min(p[1] for p in fig) for fig, is_ell in figs if not is_ell]
    assert min(ys) < s.base_band[0], "above mark must rise above the band"
    # เท = pre vowel stored first, drawn before the base
    figs_pre, adv = compose_line(s, "เท")
    figs_base, adv_base = compose_line(s, "ท")
    assert adv > adv_base, "pre vowel must widen the line"
