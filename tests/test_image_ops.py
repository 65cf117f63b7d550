import jax.numpy as jnp
import numpy as np
import pytest

from vse_tpu.ops.image import (
    crop_and_rectify,
    crop_axis_aligned_fixed,
    letterbox,
    normalize_det,
    normalize_rec,
    resize_bilinear,
)


def test_normalize_ranges():
    x = jnp.full((2, 4, 4, 3), 255, jnp.uint8)
    d = np.array(normalize_det(x))
    r = np.array(normalize_rec(x))
    assert d[0, 0, 0, 0] == pytest.approx((1 - 0.485) / 0.229, abs=1e-4)
    assert r[0, 0, 0, 0] == pytest.approx(1.0, abs=1e-6)


def test_letterbox_preserves_aspect():
    x = jnp.ones((1, 100, 200, 3), jnp.float32)
    out, sy, sx = letterbox(x, 64, 64)
    assert out.shape == (1, 64, 64, 3)
    # scale = 64/200 -> content occupies 32 rows
    assert np.array(out)[0, :32].sum() > 0
    assert np.array(out)[0, 33:].sum() == 0
    assert sy == sx == pytest.approx(200 / 64)


def test_crop_and_rectify_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 64, 3)).astype(np.float32)
    # axis-aligned quad covering exactly a sub-rect, out size == rect size
    quad = jnp.asarray([[[8.0, 4.0], [23.0, 4.0], [23.0, 19.0], [8.0, 19.0]]])
    crop = np.array(crop_and_rectify(jnp.asarray(img), quad, 16, 16))[0]
    np.testing.assert_allclose(crop, img[4:20, 8:24], atol=1e-4)


def test_crop_axis_aligned_fixed_pads_width():
    img = jnp.ones((32, 64, 3), jnp.float32)
    box = jnp.asarray([10.0, 10.0, 20.0, 20.0])  # 10x10 box
    out = np.array(crop_axis_aligned_fixed(img, box, 16, 64))
    # scaled to h=16 -> w=16; columns beyond must be zero-padded
    assert out.shape == (16, 64, 3)
    assert out[:, :15].min() > 0
    assert out[:, 20:].max() == 0


def test_resize_bilinear_shape():
    x = jnp.zeros((3, 10, 20, 3))
    assert resize_bilinear(x, 32, 64).shape == (3, 32, 64, 3)
