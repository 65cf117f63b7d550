#!/usr/bin/env python
"""End-to-end quality benchmark on a synthetic burned-subtitle video.

The reference's bundled test videos are LFS-stripped (SURVEY.md §2.5), so the
golden-output corpus is regenerated: render a video with known subtitle
script (DejaVu text burned into the bottom band), run the REAL pipeline
(converted PP-OCRv3 det + synthetic-pretrained rec), and score subtitle-line
F1 + CER against the known script (BASELINE.json quality metric).

  python tools/eval_synth.py --mode fast --language en
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vse_jax_cache")

import numpy as np


def make_video(path, script, w=960, h=540, fps=25.0, font_size=30):
    """script: [(start_s, end_s, text)]; text burned at the bottom band."""
    import cv2
    from PIL import Image, ImageDraw, ImageFont

    import matplotlib, glob

    font_path = sorted(
        glob.glob(os.path.join(os.path.dirname(matplotlib.__file__),
                               "mpl-data", "fonts", "ttf", "DejaVuSans.ttf"))
    )[0]
    font = ImageFont.truetype(font_path, font_size)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    total = max(e for _, e, _ in script) + 0.5
    rng = np.random.default_rng(0)
    # moving gradient background so frames aren't identical
    n = int(total * fps)
    for f in range(n):
        t = f / fps
        base = np.zeros((h, w, 3), np.uint8)
        gx = (np.linspace(0, 80, w) + f * 0.5) % 120
        base[:] = (40 + gx[None, :, None]).astype(np.uint8)
        img = Image.fromarray(base)
        draw = ImageDraw.Draw(img)
        for (s, e, text) in script:
            if s <= t < e:
                bbox = draw.textbbox((0, 0), text, font=font, stroke_width=2)
                tw = bbox[2] - bbox[0]
                x = (w - tw) // 2
                y = h - 70
                draw.text((x, y), text, font=font, fill=(255, 255, 255),
                          stroke_width=2, stroke_fill=(0, 0, 0))
        vw.write(np.asarray(img)[:, :, ::-1])
    vw.release()
    return n


def script_to_srt(script, path):
    from vse_tpu.post.srt import SrtFile, SrtItem

    srt = SrtFile(
        [SrtItem(i + 1, int(s * 1000), int(e * 1000), t)
         for i, (s, e, t) in enumerate(script)]
    )
    srt.save(path)


DEFAULT_SCRIPT = [
    (0.4, 2.4, "hello world"),
    (2.8, 5.0, "this is a test"),
    (5.6, 8.0, "subtitles from video"),
    (8.4, 10.6, "the quick brown fox"),
    (11.0, 13.2, "jumps over the dog"),
    (13.8, 16.0, "one more line here"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fast", choices=["fast", "auto", "accurate"])
    ap.add_argument("--language", default="en")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.core.subtitle_area import SubtitleArea
    from vse_tpu.eval import evaluate_files
    from vse_tpu.pipeline.extractor import SubtitleExtractor

    workdir = args.workdir or tempfile.mkdtemp(prefix="vse_eval_")
    os.makedirs(workdir, exist_ok=True)
    video = os.path.join(workdir, "synth.mp4")
    ref_srt = os.path.join(workdir, "ref.srt")
    make_video(video, DEFAULT_SCRIPT)
    script_to_srt(DEFAULT_SCRIPT, ref_srt)

    cfg = VseConfig(language=args.language, mode=Mode(args.mode),
                    word_segmentation=False)
    area = SubtitleArea.from_ratios("0.80,0.99,0.05,0.95", 960, 540)
    ex = SubtitleExtractor(video, sub_area=area, config=cfg)
    out = ex.run()
    result = evaluate_files(out, ref_srt)
    print(json.dumps({
        "metric": f"{args.mode}-mode synthetic e2e quality",
        "det_loaded": ex.engine.det_loaded,
        "rec_loaded": ex.engine.rec_loaded,
        **result.as_dict(),
        "srt": out,
    }))
    if not args.keep:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
