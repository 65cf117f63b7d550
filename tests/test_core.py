import json

import pytest

from vse_tpu.core.config import Decoder, Mode, VseConfig, default_config
from vse_tpu.core.subtitle_area import ABSection, SubtitleArea


def test_default_config_matches_reference_defaults():
    # reference backend/config.py:50-98
    c = default_config()
    assert c.language == "ch"
    assert c.mode == Mode.FAST
    assert c.rec_batch_number == 6
    assert c.max_batch_size == 10
    assert c.extract_frequency == 3
    assert c.threshold_text_similarity == 80
    assert c.drop_score == 75
    assert c.subtitle_area_deviation_rate == 0.0
    assert c.watermark_area_num == 5
    assert c.subtitle_area_deviation_pixel == 50
    assert c.tolerant_pixel_x == 100
    assert c.tolerant_pixel_y == 50
    assert c.delete_empty_timestamp is True
    assert c.word_segmentation is True
    assert c.generate_txt is False
    assert c.subtitle_selection_areas == "0.78,0.99,0.05,0.95"
    assert c.scanner_decoder == Decoder.OPENCV


def test_config_json_roundtrip(tmp_path):
    c = VseConfig(language="en", mode=Mode.ACCURATE, drop_score=90)
    p = tmp_path / "config.json"
    p.write_text(json.dumps(c.to_json()))
    c2 = VseConfig.from_json(str(p))
    assert c2.language == "en"
    assert c2.mode == Mode.ACCURATE
    assert c2.drop_score == 90


def test_config_validation():
    with pytest.raises(ValueError):
        VseConfig(rec_batch_number=0)
    with pytest.raises(ValueError):
        VseConfig(drop_score=101)


def test_subtitle_area_from_ratios():
    # reference default area 0.78,0.99,0.05,0.95 on 1920x1080
    a = SubtitleArea.from_ratios("0.78,0.99,0.05,0.95", width=1920, height=1080)
    assert a.ymin == int(0.78 * 1080)
    assert a.ymax == int(0.99 * 1080)
    assert a.xmin == int(0.05 * 1920)
    assert a.xmax == int(0.95 * 1920)


def test_overflow_area_rate_semantics():
    # reference backend/tools/subtitle_ocr.py:55-60
    a = SubtitleArea(ymin=0, ymax=100, xmin=0, xmax=100)
    # box fully inside -> union == sub area -> rate 0
    assert a.overflow_area_rate(10, 90, 10, 90) == pytest.approx(0.0)
    # box half outside: box 100x100 at x 50..150 -> inter 50*100=5000,
    # union = 10000 + 10000 - 5000 = 15000 -> rate = 0.5
    assert a.overflow_area_rate(50, 150, 0, 100) == pytest.approx(0.5)
    # disjoint -> inf (reference drops unconditionally)
    assert a.overflow_area_rate(200, 300, 0, 100) == float("inf")


def test_contains_box_and_ab_section():
    a = SubtitleArea(ymin=0, ymax=100, xmin=0, xmax=100)
    assert a.contains_box(0, 100, 0, 100)
    assert not a.contains_box(-1, 100, 0, 100)
    s = ABSection(10, 20)
    assert s.contains(10) and s.contains(20) and not s.contains(21)
    assert ABSection(5, -1).contains(10**9)


def test_mesh_8_devices():
    from vse_tpu.core.accelerator import Accelerator, frame_sharding

    acc = Accelerator.instance()
    mesh = acc.make_mesh(("data",))
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    sh = frame_sharding(mesh)
    assert sh.mesh is mesh


def test_rec_ckpt_path_matches_resolve_and_trainer():
    """ADVICE r1 (high): the trainer once saved latin-script heads under a
    '<family>_folded' path the registry never looked up. The canonical path
    helper is shared; folded()/without_space() keep the family name."""
    from vse_tpu.core.charset import get_charset
    from vse_tpu.core.config import Mode
    from vse_tpu.core.registry import rec_ckpt_path, resolve

    for lang in ("en", "ch", "de", "ru", "ar", "hi", "japan"):
        spec = resolve(lang, Mode.FAST)
        assert spec.rec_ckpt == rec_ckpt_path(lang, spec.rec_variant)
        # the trainer derives its charset via fold/space transforms; the name
        # (and hence any path built from it) must stay the family name
        cs = get_charset(lang).folded().without_space()
        assert cs.name == get_charset(lang).name


def test_mobile_only_rec_families(tmp_path, monkeypatch):
    """The reference pins latin/arabic/cyrillic/devanagari rec heads to the
    fast (mobile) model (reference backend/tools/paddle_model_config.py:
    84-91) — an upstream AVAILABILITY constraint: the pin applies only
    while no trained server checkpoint exists for the family. With one on
    disk, auto/accurate resolve to it."""
    import os

    from vse_tpu.core.config import Mode
    from vse_tpu.core.registry import rec_ckpt_path, resolve

    monkeypatch.setenv("VSE_MODELS", str(tmp_path))
    for lang in ("de", "ru", "ar", "hi"):
        for mode in (Mode.FAST, Mode.AUTO, Mode.ACCURATE):
            assert resolve(lang, mode).rec_variant == "mobile"
    # CJK/en families still get server heads in accurate mode
    assert resolve("ch", Mode.ACCURATE).rec_variant == "server"
    # a trained server checkpoint lifts the pin (fast stays mobile)
    os.makedirs(rec_ckpt_path("de", "server"))
    assert resolve("de", Mode.ACCURATE).rec_variant == "server"
    assert resolve("de", Mode.FAST).rec_variant == "mobile"
    assert resolve("ru", Mode.ACCURATE).rec_variant == "mobile"
