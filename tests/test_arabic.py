"""Arabic contextual shaping + visual ordering (vse_tpu/core/arabic.py)."""

import numpy as np
import pytest

from vse_tpu.core.arabic import (
    render_forms,
    shape,
    visual_to_logical,
)


def test_shape_isolated_vs_joined():
    # "كتب" (k-t-b): kaf initial, teh medial, beh final
    pairs = shape("كتب")
    assert [ord(g) for _, g in pairs] == [0xFEDB, 0xFE98, 0xFE90]
    # single letter: isolated form
    assert ord(shape("ب")[0][1]) == 0xFE8F


def test_right_joining_breaks_connection():
    # "دار": dal isolated (nothing joins before it, alef doesn't take ini),
    # alef final (joins prev? no - dal is right-joining, doesn't join
    # forward) -> alef isolated, reh isolated
    forms = [ord(g) for _, g in shape("دار")]
    assert forms == [0xFEA9, 0xFE8D, 0xFEAD]
    # "بار": beh initial (dual joins forward), alef final, reh isolated
    forms = [ord(g) for _, g in shape("بار")]
    assert forms == [0xFE91, 0xFE8E, 0xFEAD]


def test_lam_alef_ligature():
    pairs = shape("لا")
    assert len(pairs) == 1
    assert pairs[0][0] == "لا"
    assert ord(pairs[0][1]) == 0xFEFB  # isolated lam-alef
    # joined after a dual letter -> final ligature form
    pairs = shape("بلا")
    assert ord(pairs[-1][1]) == 0xFEFC


def test_visual_order_and_digits():
    glyphs, label = render_forms("كتب 123")
    # RTL: last logical chars come first visually; digit run stays LTR
    assert label.startswith("123 ")
    assert visual_to_logical(label) == "كتب 123"


def test_visual_roundtrip():
    for text in ("سلام", "مرحبا 45 بكم", "لا شيء"):
        _, label = render_forms(text)
        # lam-alef keeps both base chars in the label
        assert visual_to_logical(label) == text


def test_coverage_fallback():
    # uncovered form falls back to the base char (never tofu)
    pairs = shape("كتب", coverage=set("كتب"))
    assert [g for _, g in pairs] == ["ك", "ت", "ب"]


def test_renderer_draws_shaped_arabic():
    cv2 = pytest.importorskip("cv2")  # noqa: F841

    from vse_tpu.core.charset import get_charset
    from vse_tpu.train.synth import SynthConfig, TextRenderer

    r = TextRenderer(get_charset("ar"), SynthConfig(words_only=True,
                                                    fixed_stroke=2), seed=3)
    img, label = r.render_line()
    assert img.shape == (48, 320, 3)
    assert img.max() > 200  # something was drawn
    assert label
    # labels are visual-order base chars: every char must be encodable
    assert r.charset.encode(label)
