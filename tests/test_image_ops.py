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


def test_letterbox_matmul_matches_cv2_bilinear():
    """The MXU letterbox must match cv2.INTER_LINEAR (PaddleOCR's
    preprocessing kernel) within bf16 tolerance — NOT jax.image.resize's
    anti-aliased triangle."""
    import cv2
    import jax

    from vse_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD, letterbox_matmul

    rng = np.random.default_rng(0)
    # smooth natural-ish image (random noise overstates kernel differences)
    img = rng.integers(0, 255, size=(9, 16, 3)).astype(np.float64)
    img = np.kron(img, np.ones((12, 12, 1)))[:100, :180]  # 100x180 smooth
    img = img.astype(np.uint8)
    H, W = img.shape[:2]
    out_h, out_w = 64, 128
    scale = min(out_h / H, out_w / W)
    nh, nw = int(round(H * scale)), int(round(W * scale))
    ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    ref = (ref.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(
        IMAGENET_STD
    )
    canvas, (inv_y, inv_x) = jax.jit(
        lambda f: letterbox_matmul(f, out_h, out_w)
    )(jnp.asarray(img[None]))
    got = np.asarray(canvas)[0, :nh, :nw]
    assert abs(inv_y - H / nh) < 1e-9 and abs(inv_x - W / nw) < 1e-9
    # bf16 matmul accumulates ~1 gray-level error; normalized units
    assert np.abs(got - ref).max() < 0.08


def test_crop_windowed_matches_full_for_short_boxes():
    from vse_tpu.ops.image import (
        crop_axis_aligned_matmul,
        crop_axis_aligned_matmul_windowed,
    )

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((400, 640, 3)).astype(np.float32) * 255)
    for box in ([50.0, 300.0, 600.0, 380.0], [0.0, 0.0, 100.0, 40.0],
                [10.0, 250.0, 630.0, 390.0]):
        b = jnp.asarray(box)
        a = crop_axis_aligned_matmul(img, b, 48, 320)
        w = crop_axis_aligned_matmul_windowed(img, b, 48, 320, window_rows=288)
        # f32 accumulation-order noise from the band slice (values 0..255)
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), atol=0.02)


def test_rectified_crop_straightens_rotated_text():
    """A 15-degree-tilted ink bar: the rectified quad crop is nearly all ink
    (geometry recovered), while the axis-aligned crop of its bbox dilutes
    ink with background (VERDICT r1 missing #5 — rotated-text handling)."""
    import jax

    from vse_tpu.ops.image import (
        crop_axis_aligned_matmul_windowed,
        crop_quad_rectified_windowed,
        quads_from_boxes,
    )

    H, W = 400, 640
    img = np.zeros((H, W, 3), np.float32)
    a = np.radians(15.0)
    # filled rotated bar, w=300 h=30 around (320, 200)
    yy, xx = np.mgrid[0:H, 0:W]
    u = (xx - 320) * np.cos(a) + (yy - 200) * np.sin(a)
    v = -(xx - 320) * np.sin(a) + (yy - 200) * np.cos(a)
    ink = (np.abs(u) <= 150) & (np.abs(v) <= 15)
    img[ink] = 255.0

    ys, xs = np.nonzero(ink)
    bbox = jnp.asarray(
        [xs.min(), ys.min(), xs.max(), ys.max()], jnp.float32
    )
    imgj = jnp.asarray(img)
    quad = quads_from_boxes(bbox, jnp.asarray(a))
    rect = np.asarray(crop_quad_rectified_windowed(imgj, quad, 48, 320))
    axis = np.asarray(crop_axis_aligned_matmul_windowed(imgj, bbox, 48, 320))

    def ink_fraction(crop):
        cols = np.nonzero(crop[..., 0].max(axis=0) > 10)[0]
        if len(cols) == 0:
            return 0.0
        region = crop[:, cols.min():cols.max() + 1, 0]
        return float((region > 128).mean())

    assert ink_fraction(rect) > 0.9, ink_fraction(rect)
    assert ink_fraction(axis) < 0.75, ink_fraction(axis)
