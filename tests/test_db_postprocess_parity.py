"""Device DB postprocess vs the reference stack's semantics.

The reference consumes PaddleOCR's DBPostProcess (cv2.findContours ->
cv2.minAreaRect -> box_score inside the quad -> pyclipper Vatti offset with
delta = area*ratio/perimeter -> minAreaRect of the offset polygon), via
`OcrRecogniser.predict` (reference backend/tools/ocr.py:24-86). VERDICT r2
weak #4: the device path had only been verified against this repo's own
scipy host reimplementation. This file implements the reference semantics
as a cv2 oracle and asserts per-box IoU parity of the device path (pooled
fast path included) on DB-shaped probability maps and on REAL converted
PP-OCRv3 det outputs.

Oracle note: pyclipper's round-join offset of a CONVEX polygon is its
Minkowski sum with a disk; the minAreaRect of that sum is the original
minAreaRect inflated by 2*delta per dimension — so the offset is applied
analytically to the rect. Text components are near-convex, making this
equivalent to the reference for subtitle content.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp  # noqa: E402

from vse_tpu.ops.db_postprocess import db_postprocess  # noqa: E402


def paddle_db_oracle(prob, thresh=0.3, box_thresh=0.6, unclip_ratio=1.6,
                     min_size=3):
    """Reference-semantics postprocess for one [H, W] prob map.

    Returns a list of (quad [4,2] float32, score) like DBPostProcess."""
    H, W = prob.shape
    bitmap = (prob > thresh).astype(np.uint8)
    contours, _ = cv2.findContours(
        bitmap, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
    )
    out = []
    for c in contours:
        rect = cv2.minAreaRect(c)
        (cx, cy), (w, h), ang = rect
        if min(w, h) < min_size:
            continue
        pts = cv2.boxPoints(rect)
        x0 = int(np.clip(np.floor(pts[:, 0].min()), 0, W - 1))
        x1 = int(np.clip(np.ceil(pts[:, 0].max()), 0, W - 1))
        y0 = int(np.clip(np.floor(pts[:, 1].min()), 0, H - 1))
        y1 = int(np.clip(np.ceil(pts[:, 1].max()), 0, H - 1))
        mask = np.zeros((y1 - y0 + 1, x1 - x0 + 1), np.uint8)
        cv2.fillPoly(mask, [np.round(pts - [x0, y0]).astype(np.int32)], 1)
        score = cv2.mean(prob[y0 : y1 + 1, x0 : x1 + 1].astype(np.float32),
                         mask)[0]
        if score < box_thresh:
            continue
        delta = (w * h) * unclip_ratio / max(2 * (w + h), 1e-6)
        pts2 = cv2.boxPoints(((cx, cy), (w + 2 * delta, h + 2 * delta), ang))
        pts2[:, 0] = pts2[:, 0].clip(0, W - 1)
        pts2[:, 1] = pts2[:, 1].clip(0, H - 1)
        out.append((pts2, score))
    return out


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def _device_boxes(prob_maps, pool=4):
    boxes, scores, valid = db_postprocess(
        jnp.asarray(np.stack(prob_maps)), max_boxes=8, pool=pool
    )
    return np.asarray(boxes), np.asarray(valid)


def _parity(prob_maps, pool=4, iou_gate=0.9, frac_gate=0.95):
    boxes, valid = _device_boxes(prob_maps, pool)
    n_oracle = n_matched = n_dev = n_dev_matched = 0
    for i, prob in enumerate(prob_maps):
        oracle = paddle_db_oracle(prob)
        o_aabbs = [
            (q[:, 0].min(), q[:, 1].min(), q[:, 0].max(), q[:, 1].max())
            for q, _ in oracle
        ]
        d_aabbs = [tuple(b) for b, v in zip(boxes[i], valid[i]) if v]
        for ob in o_aabbs:
            n_oracle += 1
            if d_aabbs and max(_iou(db, ob) for db in d_aabbs) >= iou_gate:
                n_matched += 1
        for db in d_aabbs:
            n_dev += 1
            if o_aabbs and max(_iou(db, ob) for ob in o_aabbs) >= iou_gate:
                n_dev_matched += 1
    assert n_oracle > 0
    assert n_matched / n_oracle >= frac_gate, (
        f"device matched only {n_matched}/{n_oracle} oracle boxes at "
        f"IoU>={iou_gate}"
    )
    # no spurious device boxes either
    assert n_dev_matched / max(n_dev, 1) >= frac_gate, (
        f"{n_dev - n_dev_matched}/{n_dev} device boxes match no oracle box"
    )


def _synthetic_db_maps(n_maps=30, H=256, W=448, seed=0):
    """DB-shrink-shaped prob maps: soft-edged line blobs at subtitle-ish
    sizes, including short (14 px) and long (400 px) lines."""
    rng = np.random.default_rng(seed)
    margin = 12  # DB shrink maps never contain touching line blobs (the
    # shrink step separates adjacent lines by construction); keep blobs
    # apart by more than the pool size so pooled labels match too
    maps = []
    for _ in range(n_maps):
        m = np.zeros((H, W), np.float32)
        placed = []
        for _ in range(rng.integers(1, 4)):
            for _attempt in range(20):
                bh = int(rng.integers(10, 36))
                bw = int(rng.integers(60, W - 20))
                y = int(rng.integers(2, H - bh - 2))
                x = int(rng.integers(2, W - bw - 2))
                if all(
                    x + bw + margin <= px or px + pw + margin <= x
                    or y + bh + margin <= py or py + ph + margin <= y
                    for px, py, pw, ph in placed
                ):
                    break
            else:
                continue
            placed.append((x, y, bw, bh))
            m[y : y + bh, x : x + bw] = rng.uniform(0.75, 0.98)
        # soft edges like a trained det head
        m = cv2.GaussianBlur(m, (5, 5), 1.2)
        m += rng.normal(0, 0.01, m.shape).astype(np.float32)
        maps.append(np.clip(m, 0, 1))
    return maps


def test_parity_synthetic_maps_pooled():
    _parity(_synthetic_db_maps(), pool=4)


def test_parity_synthetic_maps_product_pool():
    # pool=8 is the product default (VseConfig.db_pool)
    _parity(_synthetic_db_maps(n_maps=12, seed=3), pool=8)


@pytest.mark.slow
def test_parity_synthetic_maps_exact():
    _parity(_synthetic_db_maps(), pool=1)


def _real_det_probs(n_frames):
    """Converted PP-OCRv3 mobile det probs on rendered subtitle frames."""
    from vse_tpu.core.charset import get_charset
    from vse_tpu.core.registry import models_root
    from vse_tpu.models.ppocr_det import PPOCRv3DetMobile, load_ppocr_det_weights
    from vse_tpu.ops.image import normalize_det
    from vse_tpu.train.synth import SynthConfig, TextRenderer

    npz = os.path.join(models_root(), "ppocr_v3_det_mobile.npz")
    if not os.path.exists(npz):
        pytest.skip("converted det weights not present")
    model = PPOCRv3DetMobile()
    params = load_ppocr_det_weights(dict(np.load(npz)))
    r = TextRenderer(get_charset("en"), SynthConfig(det_h=256, det_w=448),
                     seed=7)
    frames = np.stack([r.render_frame()[0] for _ in range(n_frames)])
    x = normalize_det(jnp.asarray(frames))
    return list(np.asarray(model.apply(params, x)))


@pytest.mark.slow
def test_parity_real_det_outputs():
    """Device path vs reference-semantics oracle on REAL det prob maps."""
    _parity(_real_det_probs(24), pool=4)
