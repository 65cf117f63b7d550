"""Device-side image ops: normalization, letterbox resize, batched box crops.

Replaces the reference's host-side OpenCV preprocessing — per-frame crop
(reference backend/tools/subtitle_ocr.py:270-289 `frame_preprocess`), det
resize/normalize (inside PaddleOCR), and perspective text-crop rectification —
with fused XLA ops so frames stay in HBM from decode hand-off to logits.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# PP-OCR det normalization (ImageNet stats) and rec normalization (0.5/0.5).
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)


def normalize_det(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [.., H, W, 3] RGB -> float det-normalized."""
    x = images_u8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def normalize_rec(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [.., H, W, 3] RGB -> float rec-normalized ((x-0.5)/0.5)."""
    x = images_u8.astype(jnp.float32) / 255.0
    return (x - 0.5) / 0.5


def resize_bilinear(images: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Batched bilinear resize [B, H, W, C] -> [B, out_h, out_w, C]."""
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, out_h, out_w, c), method="bilinear")


def letterbox(
    images: jnp.ndarray, out_h: int, out_w: int
) -> Tuple[jnp.ndarray, float, float]:
    """Aspect-preserving resize + zero pad to (out_h, out_w).

    Returns (padded, scale_y, scale_x) where scale maps output coords back to
    input coords (same scalar for both when aspect preserved). Shapes are
    static, so the scale is a Python float computed from static dims.
    """
    b, h, w, c = images.shape
    scale = min(out_h / h, out_w / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(images, (b, new_h, new_w, c), method="bilinear")
    padded = jnp.zeros((b, out_h, out_w, c), dtype=resized.dtype)
    padded = jax.lax.dynamic_update_slice(padded, resized, (0, 0, 0, 0))
    return padded, 1.0 / scale, 1.0 / scale


def _tent_matrix(out_n: int, in_n: int) -> jnp.ndarray:
    """2-tap bilinear resampling matrix [out_n, in_n] (half-pixel centers,
    exact in/out ratio per axis).

    Matches cv2.INTER_LINEAR — the kernel PaddleOCR preprocesses with — NOT
    jax.image.resize's anti-aliased triangle (which widens the kernel by
    1/scale on downscale). The converted PP-OCR weights were trained behind
    cv2 resize, so this is the parity-correct det resize. cv2 maps
    src = (dst + 0.5) * (in/out) - 0.5 with the exact per-axis ratio (NOT a
    shared rounded letterbox scale — the drift reaches a third of a pixel at
    the right edge and crosses texture boundaries)."""
    import numpy as np

    out = np.arange(out_n, dtype=np.float64) + 0.5
    src = out * (in_n / out_n) - 0.5
    rows = np.arange(in_n, dtype=np.float64)
    w = np.clip(1.0 - np.abs(src[:, None] - rows[None, :]), 0.0, 1.0)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-9)
    return jnp.asarray(w, jnp.bfloat16)


def letterbox_matmul(
    frames_u8: jnp.ndarray, out_h: int, out_w: int,
    mean: jnp.ndarray = IMAGENET_MEAN, std: jnp.ndarray = IMAGENET_STD,
) -> Tuple[jnp.ndarray, Tuple[float, float]]:
    """Fused det preprocessing: uint8 [B, H, W, 3] -> normalized float32
    letterboxed canvas [B, out_h, out_w, 3], via two bf16 MXU matmuls
    (separable bilinear). ~3x faster than jax.image.resize at 64x1080p
    (measured 29ms -> 11ms) and skips the full-res f32 intermediate.

    Returns (canvas, (inv_scale_y, inv_scale_x)) — per-axis canvas->frame
    coordinate factors (they differ slightly because the resized dims round
    to integers)."""
    B, H, W, C = frames_u8.shape
    scale = min(out_h / H, out_w / W)
    nh, nw = int(round(H * scale)), int(round(W * scale))
    wy = _tent_matrix(nh, H)
    wx = _tent_matrix(nw, W)
    x = frames_u8.astype(jnp.bfloat16)
    x = jnp.einsum("bhwc,oh->bowc", x, wy, preferred_element_type=jnp.bfloat16)
    x = jnp.einsum("bowc,pw->bopc", x, wx, preferred_element_type=jnp.float32)
    x = (x / 255.0 - mean) / std
    # pad with the normalized value of a BLACK pixel — matching the
    # _resize_fn+normalize_det path and the reference's zero-pixel padding;
    # a 0.0 pad in normalized space is ImageNet-mean gray and shifts det
    # responses near the letterbox border
    pad = jnp.broadcast_to(
        ((0.0 - mean) / std).astype(jnp.float32), (B, out_h, out_w, C)
    )
    canvas = jax.lax.dynamic_update_slice(pad, x, (0, 0, 0, 0))
    return canvas, (H / nh, W / nw)


def _bilinear_sample_one(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample image [H, W, C] at float coords ys/xs [h, w] -> [h, w, C]."""
    H, W = image.shape[0], image.shape[1]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0.astype(ys.dtype), 0.0, 1.0)[..., None]
    wx = jnp.clip(xs - x0.astype(xs.dtype), 0.0, 1.0)[..., None]
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _perspective_matrix(quad: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Homography mapping output-rect coords -> quad coords.

    quad: [4, 2] (x, y) points clockwise from top-left (the contract of
    PaddleOCR's get_rotate_crop_image, which the reference consumes through
    `OcrRecogniser.predict`, reference backend/tools/ocr.py:24-86).
    Solves the standard 8x8 DLT system on device (batched via vmap).
    """
    dst = jnp.array(
        [[0.0, 0.0], [out_w - 1.0, 0.0], [out_w - 1.0, out_h - 1.0], [0.0, out_h - 1.0]],
        dtype=jnp.float32,
    )
    src = dst  # we map from output coords (src of transform) to quad (dst)
    tgt = quad.astype(jnp.float32)
    # Build A p = b for p = [a,b,c,d,e,f,g,h]
    A = []
    b = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        X, Y = tgt[i, 0], tgt[i, 1]
        A.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -x * X, -y * X]))
        b.append(X)
        A.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -x * Y, -y * Y]))
        b.append(Y)
    A = jnp.stack(A)
    b = jnp.stack(b)
    p = jnp.linalg.solve(A, b)
    return jnp.concatenate([p, jnp.ones((1,), jnp.float32)]).reshape(3, 3)


def crop_and_rectify(
    image: jnp.ndarray, quads: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Perspective-rectify N text quads out of one frame on device.

    image: [H, W, C] float; quads: [N, 4, 2] (x, y). Returns [N, out_h, out_w, C].
    Degenerate quads (all zeros) yield black crops.
    """
    yy = jnp.arange(out_h, dtype=jnp.float32)
    xx = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xx, yy)  # [out_h, out_w]
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=-1)  # [h, w, 3]

    def crop_one(quad):
        M = _perspective_matrix(quad, out_h, out_w)
        mapped = grid @ M.T  # [h, w, 3]
        xs = mapped[..., 0] / jnp.maximum(mapped[..., 2], 1e-6)
        ys = mapped[..., 1] / jnp.maximum(mapped[..., 2], 1e-6)
        return _bilinear_sample_one(image, ys, xs)

    return jax.vmap(crop_one)(quads)


def quads_from_boxes(boxes_xyxy: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Oriented quads from axis-aligned bboxes + principal-axis angles.

    boxes: [..., 4] xyxy (the bounding box OF the rotated component);
    angles: [...] radians. Inverts Wbb = w|cos| + h|sin|, Hbb = w|sin| +
    h|cos| to recover the rotated rect's true (w, h), then emits corners
    [..., 4, 2] clockwise from top-left (PaddleOCR quad convention).
    Near |angle| = 45 deg the inversion degenerates — dims clamp to the
    bbox (axis-aligned fallback)."""
    x0, y0, x1, y1 = (boxes_xyxy[..., i] for i in range(4))
    wbb = jnp.maximum(x1 - x0, 1.0)
    hbb = jnp.maximum(y1 - y0, 1.0)
    c = jnp.abs(jnp.cos(angles))
    s = jnp.abs(jnp.sin(angles))
    det = c * c - s * s  # cos(2a)
    safe = jnp.abs(det) > 0.2
    w = jnp.where(safe, (c * wbb - s * hbb) / jnp.where(safe, det, 1.0), wbb)
    h = jnp.where(safe, (c * hbb - s * wbb) / jnp.where(safe, det, 1.0), hbb)
    # a thin rotated bar's true length EXCEEDS its bbox width — the only
    # hard upper bound is the bbox diagonal
    diag = jnp.sqrt(wbb * wbb + hbb * hbb)
    w = jnp.clip(w, 1.0, diag)
    h = jnp.clip(h, 1.0, diag)
    cx = (x0 + x1) / 2.0
    cy = (y0 + y1) / 2.0
    ca = jnp.cos(angles)
    sa = jnp.sin(angles)
    ux, uy = ca * w / 2.0, sa * w / 2.0
    vx, vy = -sa * h / 2.0, ca * h / 2.0
    corners = jnp.stack(
        [
            jnp.stack([cx - ux - vx, cy - uy - vy], axis=-1),
            jnp.stack([cx + ux - vx, cy + uy - vy], axis=-1),
            jnp.stack([cx + ux + vx, cy + uy + vy], axis=-1),
            jnp.stack([cx - ux + vx, cy - uy + vy], axis=-1),
        ],
        axis=-2,
    )
    return corners


def crop_quad_rectified_windowed(
    image: jnp.ndarray, quad: jnp.ndarray, out_h: int, out_w: int,
    window_rows: int = 288,
) -> jnp.ndarray:
    """Perspective-rectify one text quad with the PP-OCR rec aspect policy
    (scale to height out_h, keep aspect, zero-pad right), sampling only a
    `window_rows`-high band around the quad (same rationale as
    `crop_axis_aligned_matmul_windowed` — bound the gather footprint).

    The big area reduction happens via the cheap band slice; the irregular
    affine sampling then touches a small tensor — the TPU-friendly split of
    a rotation (not separable, so not a matmul pair like the axis-aligned
    path)."""
    H, W = image.shape[0], image.shape[1]
    window_rows = min(window_rows, H)
    ymin = jnp.min(quad[:, 1])
    y_start = jnp.clip(jnp.floor(ymin).astype(jnp.int32), 0, H - window_rows)
    band = jax.lax.dynamic_slice(
        image, (y_start, 0, 0), (window_rows, W, image.shape[2])
    )
    local = quad.at[:, 1].add(-y_start.astype(quad.dtype))
    # quad side lengths -> aspect-preserved target width
    qw = 0.5 * (
        jnp.linalg.norm(local[1] - local[0]) + jnp.linalg.norm(local[2] - local[3])
    )
    qh = 0.5 * (
        jnp.linalg.norm(local[3] - local[0]) + jnp.linalg.norm(local[2] - local[1])
    )
    qw = jnp.maximum(qw, 1.0)
    qh = jnp.maximum(qh, 1.0)
    target_w = jnp.minimum(jnp.float32(out_w), qw * out_h / qh)
    # homography dst rect scaled to (target_w, out_h); built per-quad on
    # device (dst is traced, so the DLT solve happens with dynamic values)
    dst = jnp.stack(
        [
            jnp.stack([jnp.float32(0.0), jnp.float32(0.0)]),
            jnp.stack([target_w - 1.0, jnp.float32(0.0)]),
            jnp.stack([target_w - 1.0, jnp.float32(out_h - 1.0)]),
            jnp.stack([jnp.float32(0.0), jnp.float32(out_h - 1.0)]),
        ]
    )
    M = _perspective_matrix_dyn(dst, local.astype(jnp.float32))
    yy = jnp.arange(out_h, dtype=jnp.float32)
    xx = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xx, yy)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    mapped = grid @ M.T
    xs = mapped[..., 0] / jnp.maximum(mapped[..., 2], 1e-6)
    ys = mapped[..., 1] / jnp.maximum(mapped[..., 2], 1e-6)
    sampled = _bilinear_sample_one(band, ys, xs)
    pad = (gx < target_w)[..., None]
    return jnp.where(pad, sampled, 0.0)


def _perspective_matrix_dyn(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """`_perspective_matrix` with a traced (non-static) source rect."""
    A = []
    b = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        X, Y = tgt[i, 0], tgt[i, 1]
        A.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -x * X, -y * X]))
        b.append(X)
        A.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -x * Y, -y * Y]))
        b.append(Y)
    A = jnp.stack(A)
    b = jnp.stack(b)
    p = jnp.linalg.solve(A, b)
    return jnp.concatenate([p, jnp.ones((1,), jnp.float32)]).reshape(3, 3)


def crop_axis_aligned_matmul(
    image: jnp.ndarray, box_xyxy: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """MXU formulation of `crop_axis_aligned_fixed`: axis-aligned bilinear
    sampling is separable, so each axis's interpolation is a dense matmul
    with a tent-weight matrix (Wy [out_h, H], Wx [out_w, W]) —
    out = Wy @ image @ Wx^T. On TPU this beats 4-point gathers by ~30x
    (measured 103ms -> ~3ms for 64 crops from 1080p frames).

    Both matmuls run CHANNEL-BATCHED ([C, h, W] x [w, W] dot_general): with
    channels as the trailing (lane) dim the x-interpolation einsum padded
    C=3 to the 128-lane MXU tile, ~42x waste — measured 27.6 -> 14.2 ms for
    1024 crops from 1080p frames. uint8 images additionally compute in bf16
    (u8 values are exact in bf16; the lerp rounds within ~0.5 gray level);
    float images keep f32 math (parity/verification callers)."""
    H, W = image.shape[0], image.shape[1]
    cdt = jnp.bfloat16 if image.dtype == jnp.uint8 else jnp.float32
    xmin, ymin, xmax, ymax = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    bw = jnp.maximum(xmax - xmin, 1.0)
    bh = jnp.maximum(ymax - ymin, 1.0)
    scale_y = out_h / bh
    target_w = jnp.minimum(jnp.float32(out_w), bw * scale_y)
    scale_x = target_w / bw
    ys = ymin + jnp.arange(out_h, dtype=jnp.float32) / jnp.maximum(scale_y, 1e-6)
    xs = xmin + jnp.arange(out_w, dtype=jnp.float32) / jnp.maximum(scale_x, 1e-6)
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    wy = jnp.clip(1.0 - jnp.abs(ys[:, None] - rows[None, :]), 0.0, 1.0)
    wx = jnp.clip(1.0 - jnp.abs(xs[:, None] - cols[None, :]), 0.0, 1.0)
    # zero-pad beyond the (aspect-preserved) target width
    pad_mask = (jnp.arange(out_w, dtype=jnp.float32) < target_w)[:, None]
    wx = wx * pad_mask
    img_cb = image.astype(cdt).transpose(2, 0, 1)  # [C, H, W]
    mid = jnp.einsum("hk,ckW->chW", wy.astype(cdt), img_cb,
                     preferred_element_type=cdt)
    out = jnp.einsum("chW,wW->chw", mid, wx.astype(cdt),
                     preferred_element_type=jnp.float32)
    return out.transpose(1, 2, 0)


def crop_axis_aligned_matmul_windowed(
    image: jnp.ndarray, box_xyxy: jnp.ndarray, out_h: int, out_w: int,
    window_rows: int = 288,
) -> jnp.ndarray:
    """`crop_axis_aligned_matmul` restricted to a `window_rows`-high band.

    Subtitle boxes are short (a 1080p two-line subtitle is < 150 px); the
    full [out_h, H] row-interpolation matmul wastes ~8x FLOPs on rows the
    box never touches. dynamic_slice the band starting at ymin (clamped),
    then interpolate inside it. Boxes taller than the window are sampled
    with the bottom clamped to the window edge (rare; still full-width)."""
    H, W = image.shape[0], image.shape[1]
    window_rows = min(window_rows, H)
    xmin, ymin, xmax, ymax = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    y_start = jnp.clip(
        jnp.floor(ymin).astype(jnp.int32), 0, H - window_rows
    )
    band = jax.lax.dynamic_slice(
        image, (y_start, 0, 0), (window_rows, W, image.shape[2])
    )
    local_box = jnp.stack(
        [
            xmin,
            jnp.clip(ymin - y_start.astype(ymin.dtype), 0.0, window_rows - 1.0),
            xmax,
            jnp.clip(ymax - y_start.astype(ymax.dtype), 0.0, window_rows - 1.0),
        ]
    )
    return crop_axis_aligned_matmul(band, local_box, out_h, out_w)


def ink_rows(crop: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vertical ink extent of one rec crop [h, w, C] (float 0..255).

    Text rows carry strong horizontal gradients (glyph strokes + the burned
    outline); background rows — even gradient backgrounds — are smooth in x.
    Returns (y0, y1, ok): first/last rows whose mean |dI/dx| clears 12% of
    the crop's dynamic range, and a validity flag (enough contrast AND a
    plausible band height). Drives the tight re-crop that recovers glyph
    resolution lost to det-box margins (rec_crop_expand_y): at margin 0.45
    per side glyphs occupy ~19 of 48 px, which erases dot/diacritic
    distinctions in arabic/thai/devanagari-class scripts (r5: ar trained
    AND evaluated under that geometry plateaued at CER 0.21)."""
    h = crop.shape[0]
    g = jnp.mean(crop, axis=-1)  # [h, w]
    e = jnp.mean(jnp.abs(g[:, 1:] - g[:, :-1]), axis=1)  # [h]
    lo = jnp.min(e)
    rng = jnp.max(e) - lo
    mask = (e - lo) > 0.12 * rng
    idx = jnp.arange(h)
    # Two-line cues: the y-expansion of one line's det box reaches the
    # neighboring subtitle line, and a global min/max ink extent then merges
    # both ink bands — the re-crop squeezes ~1.5 lines into the rec window
    # and garbles the text (r5: two_line_960 e2e F1 1.0 -> 0.70 under the
    # ink-tight geometry). The det box is centered on its OWN line, so keep
    # only the contiguous inked run containing the crop center: bridge
    # 1-2-row dips first (dot/diacritic gaps must not split a band), then
    # stop at the nearest >=3-row clean gap on each side.
    dm = mask | jnp.concatenate([mask[1:], mask[-1:]]) \
        | jnp.concatenate([mask[:1], mask[:-1]])
    c = h // 2
    y0run = jnp.max(jnp.where((~dm) & (idx <= c), idx, -1)) + 1
    y1run = jnp.min(jnp.where((~dm) & (idx >= c), idx, h)) - 1
    # tightest raw-ink rows inside the bridged center run
    y0 = jnp.min(jnp.where(mask & (idx >= y0run), idx, h))
    y1 = jnp.max(jnp.where(mask & (idx <= y1run), idx, -1))
    ok = (rng > 2.0) & (y1 - y0 >= 3) & (y1 - y0 <= h - 2)
    return y0, y1, ok


def refine_boxes_ink(
    crops: jnp.ndarray, boxes_xyxy: jnp.ndarray, margin: float, frame_h: int
) -> jnp.ndarray:
    """Tighten boxes vertically to their measured ink band.

    crops: [..., h, w, C] provisional rec crops sampled from `boxes_xyxy`
    ([..., 4], frame coords) with crop_axis_aligned_matmul's policy (row r
    of the crop reads frame y = ymin + r * bh / h). Returns refined boxes:
    ink extent plus `margin` of the ink height (+1.5 px) per side, mapped
    back to frame coordinates; boxes whose crop has no measurable ink band
    pass through unchanged. The caller re-crops from the full-res frame, so
    the final crop resamples original pixels (no double interpolation)."""
    h = crops.shape[-3]

    def one(crop, box):
        y0, y1, ok = ink_rows(crop)
        ymin, ymax = box[1], box[3]
        bh = jnp.maximum(ymax - ymin, 1.0)
        ink_h = (y1 - y0 + 1).astype(jnp.float32)
        pad = margin * ink_h + 1.5
        ny0 = ymin + (y0.astype(jnp.float32) - pad) * bh / h
        ny1 = ymin + (y1.astype(jnp.float32) + 1.0 + pad) * bh / h
        ny0 = jnp.clip(ny0, 0.0, frame_h - 1.0)
        ny1 = jnp.clip(ny1, 0.0, frame_h - 1.0)
        return jnp.where(
            ok,
            jnp.stack([box[0], ny0, box[2], ny1]),
            box,
        )

    flat_c = crops.reshape((-1,) + crops.shape[-3:])
    flat_b = boxes_xyxy.reshape((-1, 4))
    out = jax.vmap(one)(flat_c, flat_b)
    return out.reshape(boxes_xyxy.shape)


def crop_axis_aligned_fixed(
    image: jnp.ndarray, box_xyxy: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Crop an axis-aligned (xmin, ymin, xmax, ymax) box and resize to a fixed
    shape with the PP-OCR rec aspect policy: scale to height out_h; if the
    scaled width exceeds out_w, compress horizontally to exactly out_w,
    otherwise keep aspect and zero-pad the right."""
    xmin, ymin, xmax, ymax = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    bw = jnp.maximum(xmax - xmin, 1.0)
    bh = jnp.maximum(ymax - ymin, 1.0)
    scale_y = out_h / bh
    target_w = jnp.minimum(jnp.float32(out_w), bw * scale_y)
    scale_x = target_w / bw
    yy = jnp.arange(out_h, dtype=jnp.float32)
    xx = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xx, yy)
    xs = xmin + gx / jnp.maximum(scale_x, 1e-6)
    ys = ymin + gy / jnp.maximum(scale_y, 1e-6)
    valid = (gx < target_w)[..., None]
    sampled = _bilinear_sample_one(image, ys, xs)
    return jnp.where(valid, sampled, 0.0)
