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


def _prod_geometry(imgs: "np.ndarray", expand_y: float = 0.45) -> "np.ndarray":
    """Deterministic production crop geometry: the engine's rec crops pass
    through rec_crop_expand_y (vse_tpu/core/config.py), so glyphs occupy
    1/(1+2*expand_y) of the 48-px height with edge-replicated margins, AND
    short lines aspect-fit into the 320-px window with a hard black right
    pad (ops/image.py crop_axis_aligned_matmul zero-pads beyond target_w).
    Renders are born full-height/full-width; evaluating without these
    transforms over-reports real-pipeline quality (r3: full-height CER 0.0
    read 'hello world' as 'xemuwnd' through the real path; r4: full-width
    CER 0.0 measured 0.26 under the black pad)."""
    import cv2

    h, w = imgs.shape[1], imgs.shape[2]
    nh = max(8, int(round(h / (1.0 + 2.0 * expand_y))))
    y0 = (h - nh) // 2
    rng = np.random.default_rng(424242)
    out = np.empty_like(imgs)
    for k in range(imgs.shape[0]):
        small = cv2.resize(imgs[k], (w, nh), interpolation=cv2.INTER_LINEAR)
        out[k, :y0] = small[0]
        out[k, y0:y0 + nh] = small
        out[k, y0 + nh:] = small[-1]
        if rng.random() < 0.6:  # deterministic seed: stable gate numbers
            # uniform-scale short line: x shrinks by the SAME factor as y
            # (natural glyph aspect), black pad beyond
            fit = int(w * (nh / h) * rng.uniform(0.9, 1.1))
            fitted = cv2.resize(out[k], (fit, h),
                                interpolation=cv2.INTER_LINEAR)
            out[k, :, :fit] = fitted
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
