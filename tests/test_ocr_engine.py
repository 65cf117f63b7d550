import numpy as np
import pytest

pytestmark = pytest.mark.slow

from vse_tpu.core.config import Mode, VseConfig
from vse_tpu.core.registry import resolve
from vse_tpu.pipeline.ocr_engine import OcrEngine, sort_into_lines, y_round


def test_y_round():
    # reference backend/tools/ocr.py:16-22
    assert y_round(12) == 10
    assert y_round(17) == 20
    assert y_round(15) == 10  # tie goes down (strict < in the reference)


def test_y_round_matches_reference_formula():
    for y in range(0, 100):
        up = y + 10 - y % 10
        down = y - y % 10
        want = up if abs(y - up) < abs(y - down) else down
        assert y_round(y) == want


def test_sort_into_lines_orders_y_then_x():
    # two lines: y~100 and y~200; boxes out of order
    coords = [
        (500, 600, 201, 230),  # line 2, right
        (100, 200, 99, 130),   # line 1, left
        (300, 400, 102, 130),  # line 1, right (y snaps to same line)
        (100, 200, 199, 230),  # line 2, left
    ]
    items = ["d", "a", "b", "c"]
    sc, si = sort_into_lines(coords, items)
    assert si == ["a", "b", "c", "d"]
    # snapped ymins equal within a line
    assert sc[0][2] == sc[1][2]
    assert sc[2][2] == sc[3][2]


def test_resolve_mode_matrix():
    # reference README_en.md:87-93 semantics
    assert resolve("en", Mode.FAST).det_variant == "mobile"
    assert resolve("en", Mode.AUTO, accelerated=True).det_variant == "server"
    assert resolve("en", Mode.AUTO, accelerated=False).det_variant == "mobile"
    assert resolve("en", Mode.ACCURATE).rec_variant == "server"
    assert resolve("german", Mode.FAST).rec_family == "latin"


@pytest.fixture(scope="module")
def engine():
    cfg = VseConfig(
        language="en",
        det_image_height=64,
        det_image_width=96,
        rec_image_height=48,
        rec_image_width=64,
        max_boxes_per_frame=4,
    )
    return OcrEngine(language="en", mode=Mode.FAST, config=cfg)


def test_engine_predict_shapes(engine):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
    dt_box, rec_res = engine.predict(img)
    assert isinstance(dt_box, list)
    assert len(dt_box) == len(rec_res)
    for quad, (text, prob) in zip(dt_box, rec_res):
        assert len(quad) == 4
        assert isinstance(text, str)
        assert 0.0 <= prob <= 1.0


def test_engine_batch_matches_single(engine):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(2, 64, 96, 3), dtype=np.uint8)
    batch = engine.predict_batch(frames)
    single0 = engine.predict(frames[0])
    assert len(batch) == 2
    assert batch[0][1] == single0[1]


def test_detect_batch_boxes_in_bounds(engine):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(1, 64, 96, 3), dtype=np.uint8)
    boxes, scores, valid = engine.detect_batch(frames)
    assert boxes.shape == (1, 4, 4)
    assert (boxes[..., 0] <= 95).all() and (boxes[..., 2] <= 95).all()
    assert (boxes[..., 1] <= 63).all() and (boxes[..., 3] <= 63).all()


def test_beam_decode_path(engine):
    from vse_tpu.pipeline.ocr_engine import OcrEngine

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
    beam = OcrEngine(
        language="en", mode=Mode.FAST, config=engine.config,
        det_params=engine.det_params, rec_params=engine.rec_params,
        decode="beam", beam_width=4,
    )
    beam.det_model = engine.det_model
    dt_box, rec_res = beam.predict(img)
    assert len(dt_box) == len(rec_res)
    for text, prob in rec_res:
        assert isinstance(text, str)
        assert 0.0 <= prob <= 1.0


def test_server_rec_falls_back_to_trained_mobile():
    """Accurate/auto modes must not run a random-init server recognizer
    while a trained mobile head exists (reference paddle_model_config.py:
    72-82 falls back server -> fast)."""
    import os

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.core.registry import rec_ckpt_path
    from vse_tpu.pipeline.ocr_engine import OcrEngine

    if not os.path.isdir(rec_ckpt_path("en", "mobile")):
        pytest.skip("no trained en mobile checkpoint")
    eng = OcrEngine(language="en", mode=Mode.ACCURATE,
                    config=VseConfig(language="en", mode=Mode.ACCURATE))
    assert eng.spec.rec_variant == "server"  # resolution unchanged
    if not os.path.isdir(rec_ckpt_path("en", "server")):
        assert eng.rec_variant == "mobile"  # fallback engaged
        assert eng.rec_loaded


@pytest.mark.slow
def test_rectify_reads_tilted_subtitle():
    """Rotated-text path end-to-end (VERDICT r2 weak #6): a tilted burned-in
    line goes through predict_batch with rectify on — the PCA angle from
    db_postprocess drives the perspective crop and the REAL rec head must
    still read it."""
    import os

    from PIL import Image, ImageDraw, ImageFont

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.core.registry import rec_ckpt_path
    from vse_tpu.pipeline.ocr_engine import OcrEngine

    if not os.path.isdir(rec_ckpt_path("en", "mobile")):
        pytest.skip("no trained en head")

    # render a tilted subtitle line onto a dark frame
    text_img = Image.new("RGBA", (360, 60), (0, 0, 0, 0))
    d = ImageDraw.Draw(text_img)
    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 30
    )
    d.text((6, 8), "hello world", font=font, fill=(255, 255, 255, 255),
           stroke_width=2, stroke_fill=(0, 0, 0, 255))
    rot = text_img.rotate(6, expand=True, resample=Image.BICUBIC)
    frame = Image.new("RGB", (640, 360), (25, 30, 45))
    frame.paste(rot, (130, 250), rot)
    f = np.asarray(frame, np.uint8)

    cfg = VseConfig(language="en", mode=Mode.FAST, rec_rectify=True)
    eng = OcrEngine(language="en", mode=Mode.FAST, config=cfg)
    if not eng.rec_loaded:
        pytest.skip("rec head not loaded")
    dt_box, rec_res = eng.predict(f)
    assert rec_res, "no text detected on the tilted line"
    joined = "".join(t for t, _ in rec_res).replace(" ", "")
    from vse_tpu.ops.levenshtein import ratio

    assert ratio(joined, "helloworld") >= 0.8, rec_res


def test_wide_rec_checkpoint_roundtrip(tmp_path, monkeypatch):
    """A checkpoint trained with hidden/cnn_scale overrides (large-vocab CJK
    mobile heads — models/crnn.py) must rebuild the exact architecture from
    vse_meta.json; a silent fallback to the variant defaults would fail the
    shape-checked load and run random-init."""
    import jax
    import jax.numpy as jnp

    from vse_tpu.core.charset import get_charset
    from vse_tpu.core.registry import rec_ckpt_path, save_params
    from vse_tpu.models.crnn import CRNNRecognizer

    monkeypatch.setenv("VSE_MODELS", str(tmp_path))
    cs = get_charset("en").folded().without_space()
    m = CRNNRecognizer(vocab_size=cs.vocab_size, variant="mobile",
                       hidden=128, cnn_scale=0.75, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 320, 3)), train=True)
    save_params(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        rec_ckpt_path("en", "mobile"),
        meta={"language": "en", "use_space_char": False, "fold_case": True,
              "vocab_size": cs.vocab_size, "variant": "mobile", "hidden": 128,
              "cnn_scale": 0.75, "jamo": False, "homoglyph_fold": False,
              "geometry": "tight1", "step": 1},
    )
    eng = OcrEngine(language="en", mode=Mode.FAST,
                    config=VseConfig(language="en", mode=Mode.FAST))
    assert eng.rec_loaded
    assert eng.rec_model.hidden == 128
    assert eng.rec_model.cnn_scale == 0.75
    out = eng.rec_model.apply(eng.rec_params, jnp.zeros((1, 48, 320, 3)))
    assert out.shape == (1, 80, cs.vocab_size + 1)
