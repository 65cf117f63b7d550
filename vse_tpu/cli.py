"""`vse` command-line interface.

The reference's CLI is interactive `input()` prompts (reference
backend/main.py:1085-1100: video path, then "ymin ymax xmin xmax" subtitle
area). We keep that interactive flow under ``vse extract`` with no arguments,
and add proper flags for batch use. ``vse sync`` exposes the re-timer
(reference runs it as ``python -m sushi``, ui/timeline_sync_interface.py:167).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional


def _build_extract_parser(sub) -> argparse.ArgumentParser:
    p = sub.add_parser("extract", help="extract hard subtitles from video(s)")
    p.add_argument("videos", nargs="*", help="video file(s); prompts if omitted")
    p.add_argument("--area", default=None, metavar="ymin,ymax,xmin,xmax",
                   help="subtitle area in pixels (or ratios <= 1.0)")
    p.add_argument("--language", default=None, help="subtitle language (default: config)")
    p.add_argument("--mode", default=None, choices=["fast", "auto", "accurate"])
    p.add_argument("--config", default=None, help="path to config.json (reference format)")
    p.add_argument("--output", default=None, help="output directory (default: video dir)")
    p.add_argument("--txt", action="store_true", help="also emit .txt transcript")
    p.add_argument("--no-word-segmentation", action="store_true")
    p.add_argument("--interactive-filters", action="store_true",
                   help="prompt y/n for watermark/scene-text filters like the reference")
    return p


def cmd_extract(args) -> int:
    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.core.subtitle_area import SubtitleArea
    from vse_tpu.pipeline.extractor import SubtitleExtractor
    from vse_tpu.video.decode import probe

    cfg = VseConfig.from_json(args.config) if args.config else VseConfig()
    overrides = {}
    if args.language:
        overrides["language"] = args.language
    if args.mode:
        overrides["mode"] = Mode(args.mode)
    if args.txt:
        overrides["generate_txt"] = True
    if args.no_word_segmentation:
        overrides["word_segmentation"] = False
    if overrides:
        cfg = cfg.replace(**overrides)

    videos: List[str] = list(args.videos)
    if not videos:
        path = input("video path: ").strip()
        if not path:
            print("no video given", file=sys.stderr)
            return 2
        videos = [path]

    area_arg = args.area
    if area_arg is None and not args.videos:
        raw = input("subtitle area 'ymin ymax xmin xmax' (empty = auto): ").strip()
        area_arg = raw.replace(" ", ",") if raw else None

    rc = 0
    engine = None
    for video in videos:
        if not os.path.exists(video):
            print(f"not found: {video}", file=sys.stderr)
            rc = 1
            continue
        meta = probe(video)
        sub_area = None
        if area_arg:
            try:
                parts = [float(t) for t in area_arg.replace(";", ",").split(",")[:4]]
                if len(parts) != 4:
                    raise ValueError(f"expected 4 values, got {len(parts)}")
            except ValueError as e:
                print(
                    f"error: --area must be 'ymin,ymax,xmin,xmax' "
                    f"(pixels or 0-1 ratios), got {area_arg!r}: {e}",
                    file=sys.stderr,
                )
                return 2
            if all(p <= 1.0 for p in parts):
                sub_area = SubtitleArea.from_ratios(
                    ",".join(str(p) for p in parts), meta.width, meta.height
                )
            else:
                ymin, ymax, xmin, xmax = (int(p) for p in parts)
                sub_area = SubtitleArea(ymin, ymax, xmin, xmax)
        confirm = None
        if args.interactive_filters:
            confirm = lambda prompt: input(f"{prompt} [y/n] ").strip().lower() in ("y", "")
        ex = SubtitleExtractor(
            video, sub_area=sub_area, config=cfg, engine=engine, confirm=confirm
        )
        if args.output:
            os.makedirs(args.output, exist_ok=True)
            from pathlib import Path

            ex.subtitle_output_path = os.path.join(
                args.output, Path(video).stem + ".srt"
            )
        out = ex.run()
        engine = ex.engine  # reuse compiled engine across the batch queue
        print(out)
    return rc


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="vse", description="TPU-native hard-subtitle extractor")
    sub = ap.add_subparsers(dest="command")
    _build_extract_parser(sub)
    sub.add_parser("sync", add_help=False,
                   help="audio-correlation subtitle re-timer (sushi-compatible flags)")
    sub.add_parser("gui", add_help=False,
                   help="browser-based GUI (http server; see vse_tpu/gui)")
    args, rest = ap.parse_known_args(argv)
    if args.command == "extract":
        return cmd_extract(args)
    if args.command == "sync":
        from vse_tpu.sync.cli import parse_args_and_run

        parse_args_and_run(rest)
        return 0
    if args.command == "gui":
        from vse_tpu.gui.server import main as gui_main

        gui_main(rest)
        return 0
    ap.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())
