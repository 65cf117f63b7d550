"""Programmatic Hangul composition (vse_tpu/core/hangul.py)."""

import numpy as np
import pytest

from vse_tpu.core.hangul import (
    decompose,
    draw_hangul,
    is_syllable,
    syllable_figures,
)


def test_decompose_arithmetic():
    assert decompose("가") == ("ㄱ", "ㅏ", "")
    assert decompose("한") == ("ㅎ", "ㅏ", "ㄴ")
    assert decompose("국") == ("ㄱ", "ㅜ", "ㄱ")
    assert decompose("값") == ("ㄱ", "ㅏ", "ㅄ")
    assert decompose("뷁") == ("ㅂ", "ㅞ", "ㄺ")
    assert is_syllable("가") and is_syllable("힣")
    assert not is_syllable("a") and not is_syllable("ㄱ")


def test_every_syllable_composes():
    """All 11172 syllables must produce in-bounds figures (no KeyError on
    any jamo, no coordinates outside the unit square)."""
    import random

    rng = random.Random(0)
    codepoints = [0xAC00 + i for i in range(11172)]
    sample = rng.sample(codepoints, 500) + [0xAC00, 0xD7A3]
    for cp in sample:
        polylines, ellipses = syllable_figures(chr(cp))
        assert polylines or ellipses, hex(cp)
        for pl in polylines:
            for x, y in pl:
                assert -0.01 <= x <= 1.01 and -0.01 <= y <= 1.01, (hex(cp), x, y)


def test_distinct_syllables_render_distinct():
    from PIL import Image, ImageDraw

    def render(ch):
        img = Image.new("L", (48, 48), 0)
        draw_hangul(ImageDraw.Draw(img), (4, 4), ch, 40, fill=255)
        return np.asarray(img)

    a, b, c = render("가"), render("나"), render("각")
    assert a.max() == 255
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_synth_renderer_korean():
    cv2 = pytest.importorskip("cv2")  # noqa: F841

    from vse_tpu.core.charset import get_charset
    from vse_tpu.train.synth import SynthConfig, TextRenderer

    cs = get_charset("korean")
    r = TextRenderer(cs, SynthConfig(words_only=True, fixed_stroke=2), seed=1)
    # the renderable alphabet must be dominated by composable syllables
    # (the dict carries the KS X 1001 modern set — 2,350 syllables)
    n_syll = sum(1 for c in r.alphabet if is_syllable(c))
    assert n_syll == 2350
    img, label = r.render_line()
    assert img.shape == (48, 320, 3)
    assert img.max() > 200
    assert cs.encode(label)


def test_jamo_charset_roundtrip():
    """JamoCharset factors syllables into positional-jamo CTC classes and
    recomposes at decode (vse_tpu/core/charset.py); the text contract is
    unchanged vs the syllable-level head."""
    from vse_tpu.core.charset import get_charset, to_jamo

    j = to_jamo(get_charset("korean")).without_space()
    # 94 ascii + 19 choseong + 21 jungseong + 27 jongseong
    assert j.vocab_size == 161
    for t in ["안녕하세요", "한국어자막123", "ㅋㅋㅋ대박", "값넓다닭",
              "hello월드!"]:
        assert j.decode_ids(j.encode(t)) == t
    # every modern syllable in the dict round-trips
    base = get_charset("korean")
    syll = [c for c in base.chars if is_syllable(c)]
    assert all(j.decode_ids(j.encode(c)) == c for c in syll)
    # 2-3 ids per syllable
    assert len(j.encode("한")) == 3 and len(j.encode("하")) == 2


def test_jamo_renderer_alphabet():
    """The renderer generates/draws syllables even when labels factor to
    jamo (render_chars keeps the syllable alphabet)."""
    import pytest

    pytest.importorskip("cv2")
    from vse_tpu.core.charset import get_charset, to_jamo
    from vse_tpu.train.synth import SynthConfig, TextRenderer

    cs = to_jamo(get_charset("korean")).without_space()
    r = TextRenderer(
        cs, SynthConfig(words_only=True, fixed_stroke=2, max_label_len=56),
        seed=3,
    )
    n_syll = sum(1 for c in r.alphabet if is_syllable(c))
    assert n_syll == 2350
    b = r.rec_batch(4)
    # labels are jamo ids: strictly more ids than syllables for any Hangul
    # text, and every id within the jamo vocab
    assert (b["labels"] < cs.num_classes).all()
    assert b["label_lengths"].max() > 0


def test_korean_dict_is_ksx1001():
    """The shipped korean dict must carry exactly the KS X 1001 modern
    syllable set (tools/gen_charsets.py::hangul_ksx1001) — the trained
    head's class order depends on this file being stable."""
    from vse_tpu.core.charset import get_charset

    cs = get_charset("korean")
    syll = [c for c in cs.chars if is_syllable(c)]
    assert len(syll) == 2350
    # every entry is EUC-KR row 0xB0-0xC8 (the wansung block)
    for c in (syll[0], syll[1000], syll[-1]):
        b = c.encode("euc_kr")
        assert len(b) == 2 and 0xB0 <= b[0] <= 0xC8 and 0xA1 <= b[1] <= 0xFE
    # total vocab: blank + ascii + jamo + syllables (+space if configured)
    assert len(cs.chars) in (2538, 2539)
