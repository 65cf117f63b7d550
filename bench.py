#!/usr/bin/env python
"""Benchmark: accurate-mode OCR throughput (det+rec) on 1080p frames.

Primary metric (BASELINE.json): frames OCR'd per second per chip through the
full device pipeline — letterbox -> DB det forward -> box extraction ->
crop -> CRNN rec forward -> CTC decode. Baseline target: 1000 f/s/chip on
TPU v5e (accurate mode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# persist XLA compiles across bench invocations (first TPU compile of the
# fused pipeline takes minutes through the remote-compile tunnel)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vse_jax_cache")


def bench_ocr(mode: str, batch: int, iters: int, warmup: int = 2):
    import jax

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.pipeline.ocr_engine import OcrEngine

    cfg = VseConfig(language="en", mode=Mode(mode))
    engine = OcrEngine(language="en", mode=Mode(mode), config=cfg)

    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(batch, H, W, 3), dtype=np.uint8)

    # build compiled path once
    import jax.numpy as jnp

    hd, wd = engine.det_bucket(H, W)
    resize, inv_scale = engine._resize_fn(H, W, hd, wd)
    det = engine._detect_fn(hd, wd)
    crop_rec = engine._crop_rec_fn(H, W)
    frames_dev = jax.device_put(jnp.asarray(frames))

    def step(frames_dev):
        canvas = resize(frames_dev)
        prob, boxes, scores, valid = det(engine.det_params, canvas)
        boxes_full = boxes * inv_scale
        ids, mask, rec_scores = crop_rec(engine.rec_params, frames_dev, boxes_full)
        return ids, mask, rec_scores, valid

    # warmup/compile
    for _ in range(warmup):
        out = step(frames_dev)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(frames_dev)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    return fps, {"batch": batch, "iters": iters, "det_bucket": [hd, wd],
                 "seconds": round(dt, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="accurate", choices=["fast", "auto", "accurate"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    fps, extra = bench_ocr(args.mode, args.batch, args.iters)
    print(json.dumps({
        "metric": f"{args.mode}-mode OCR throughput (det+rec, 1080p)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 1000.0, 4),
        "backend": backend,
        **extra,
    }))


if __name__ == "__main__":
    main()
