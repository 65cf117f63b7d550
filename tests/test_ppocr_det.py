"""PP-OCRv3-compat detector: structure + real-weight loading + detection
quality on rendered text (uses the reference's only intact weights file)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF_DIR = "/root/reference/backend/models/V3/ch_det_fast"
needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_DIR), reason="reference weights not mounted"
)


@pytest.fixture(scope="module")
def loaded():
    import convert_paddle

    from vse_tpu.models.ppocr_det import PPOCRv3DetMobile, load_ppocr_det_weights

    w = convert_paddle.convert(REF_DIR)
    variables = load_ppocr_det_weights(w)
    model = PPOCRv3DetMobile(dtype=jnp.float32)
    return model, variables


@needs_ref
def test_weight_tree_matches_model(loaded):
    model, variables = loaded
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    import jax.tree_util as jtu

    s1 = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(ref)}
    s2 = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(variables)}
    assert s1.keys() == s2.keys()
    assert all(s1[k] == s2[k] for k in s1)


@needs_ref
def test_real_weights_detect_rendered_text(loaded):
    from vse_tpu.core.charset import get_charset
    from vse_tpu.ops.db_postprocess import db_postprocess
    from vse_tpu.ops.image import normalize_det
    from vse_tpu.train.synth import SynthConfig, TextRenderer

    model, variables = loaded
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    r = TextRenderer(
        get_charset("en"),
        SynthConfig(det_h=256, det_w=448, min_font=28, max_font=36),
        seed=3,
    )
    found, total = 0, 0
    for _ in range(4):
        img, boxes = r.render_frame()
        prob = fwd(variables, normalize_det(jnp.asarray(img[None])))
        b, s, v = db_postprocess(prob, max_boxes=4, pool=4, box_thresh=0.5)
        b, v = np.array(b[0]), np.array(v[0])
        for (x0, y0, x1, y1) in boxes:
            total += 1
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            if any(
                vv and bb[0] <= cx <= bb[2] and bb[1] <= cy <= bb[3]
                for bb, vv in zip(b, v)
            ):
                found += 1
    assert total >= 4
    assert found / total >= 0.8  # real weights must actually detect text


def test_tconv_weight_mapping_matches_paddle_semantics():
    """paddle conv2d_transpose scatters the kernel UN-flipped; flax
    ConvTranspose correlates. _tconv_w must flip spatial axes so converted
    deconv weights reproduce the paddle output (ADVICE r1: without the flip
    every 2x2 upsample block is 180-degree rotated)."""
    import flax.linen as nn

    from vse_tpu.models.ppocr_det import _tconv_w

    rng = np.random.default_rng(0)
    I, O, k, s = 3, 2, 2, 2
    w = rng.normal(size=(I, O, k, k)).astype(np.float32)  # paddle (I,O,kH,kW)
    x = rng.normal(size=(1, 5, 7, I)).astype(np.float32)

    # numpy reference of paddle/torch transposed conv: scatter-add the
    # un-flipped kernel at each input position
    Ho, Wo = (5 - 1) * s + k, (7 - 1) * s + k
    ref = np.zeros((1, Ho, Wo, O), np.float32)
    for i in range(5):
        for j in range(7):
            for c in range(I):
                ref[0, i * s : i * s + k, j * s : j * s + k, :] += (
                    x[0, i, j, c] * np.transpose(w[c], (1, 2, 0))
                )

    m = nn.ConvTranspose(O, (k, k), strides=(s, s), padding="VALID",
                         use_bias=False)
    out = m.apply({"params": {"kernel": jnp.asarray(_tconv_w(w))}},
                  jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
