"""Stage-by-stage timing of the fused OCR program (accurate mode, 1080p,
batch 128) to locate the r4 throughput gap. Each prefix of the pipeline is
compiled as its own jit and timed steady-state; stage cost = successive
difference."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vse_jax_cache")
import numpy as np, jax, jax.numpy as jnp

from vse_tpu.core.config import Mode, VseConfig
from vse_tpu.pipeline.ocr_engine import OcrEngine, _expand_boxes_y
from vse_tpu.ops.db_postprocess import db_postprocess
from vse_tpu.ops.image import letterbox_matmul, normalize_det, crop_axis_aligned_matmul_windowed

B, H, W = 128, 1080, 1920
cfg = VseConfig(language="en", mode=Mode.ACCURATE, max_batch_size=B)
eng = OcrEngine(language="en", mode=Mode.ACCURATE, config=cfg)
hd, wd = eng.det_bucket(H, W)
rng = np.random.default_rng(0)
frames = jax.device_put(rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8))

def stage_letterbox(det_p, rec_p, fr):
    x, inv = letterbox_matmul(fr, hd, wd)
    return x

def stage_det(det_p, rec_p, fr):
    x, inv = letterbox_matmul(fr, hd, wd)
    return eng.det_model.apply(det_p, x)

def stage_post(det_p, rec_p, fr):
    x, inv = letterbox_matmul(fr, hd, wd)
    prob = eng.det_model.apply(det_p, x)
    return db_postprocess(prob, max_boxes=eng.max_boxes, thresh=cfg.db_thresh,
                          box_thresh=cfg.db_box_thresh,
                          unclip_ratio=cfg.db_unclip_ratio, pool=cfg.db_pool,
                          num_sweeps=cfg.db_sweeps, with_angles=True)

def _boxes(fr):
    x, inv = letterbox_matmul(fr, hd, wd)
    prob = eng.det_model.apply(eng.det_params, x)
    boxes, s, v, a = db_postprocess(prob, max_boxes=eng.max_boxes,
                                    thresh=cfg.db_thresh,
                                    box_thresh=cfg.db_box_thresh,
                                    unclip_ratio=cfg.db_unclip_ratio,
                                    pool=cfg.db_pool, num_sweeps=cfg.db_sweeps,
                                    with_angles=True)
    inv_y, inv_x = inv
    boxes = jnp.stack([jnp.clip(boxes[..., 0] * inv_x, 0, W - 1),
                       jnp.clip(boxes[..., 1] * inv_y, 0, H - 1),
                       jnp.clip(boxes[..., 2] * inv_x, 0, W - 1),
                       jnp.clip(boxes[..., 3] * inv_y, 0, H - 1)], axis=-1)
    return boxes

def stage_crop(det_p, rec_p, fr):
    boxes = _boxes(fr)
    cb = _expand_boxes_y(boxes, cfg.rec_crop_expand_y, H)
    def per_frame(frame, fb):
        return jax.vmap(lambda b: crop_axis_aligned_matmul_windowed(
            frame, b, eng.rec_h, eng.rec_w))(fb)
    return jax.vmap(per_frame)(fr, cb)

def stage_rec(det_p, rec_p, fr):
    crops = stage_crop(det_p, rec_p, fr)
    Bk = crops.shape[0] * crops.shape[1]
    crops = crops.reshape((Bk,) + crops.shape[2:])
    crops = (crops / 255.0 - 0.5) / 0.5
    return eng.rec_model.apply(rec_p, crops)

stages = [("letterbox", stage_letterbox), ("det", stage_det),
          ("post", stage_post), ("crop", stage_crop), ("rec", stage_rec)]
prev = 0.0
for name, fn in stages:
    jf = jax.jit(fn)
    out = jf(eng.det_params, eng.rec_params, frames)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = jf(eng.det_params, eng.rec_params, frames)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5 * 1000
    print(f"{name:10s} cum {dt:8.2f} ms   stage {dt - prev:8.2f} ms", flush=True)
    prev = dt

# full product program
t = eng.ocr_step_device(frames); jax.block_until_ready(t)
t0 = time.perf_counter()
for _ in range(5):
    t = eng.ocr_step_device(frames)
jax.block_until_ready(t)
dt = (time.perf_counter() - t0) / 5 * 1000
print(f"{'FULL':10s} cum {dt:8.2f} ms   fps {B / (dt/1000):8.1f}", flush=True)
