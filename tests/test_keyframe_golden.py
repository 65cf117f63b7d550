"""Keyframe scanner recall vs rendered ground truth.

VERDICT r1 #5 asked for validation against the VideoSubFinder binary; the
bundled binary is LFS-stripped (reference .MISSING_LARGE_BLOBS), so the
golden oracle is rendered ground truth instead — videos with KNOWN subtitle
span frame ranges. The recall contract matches how the reference treats
VSF: every true span must be hit by at least one detected span (extra
detections are fine — OCR dedup absorbs them)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vse_tpu.kernels.keyframe import ScanParams, find_spans, frame_stats, rgb_to_gray

W, H, FPS = 480, 270, 25.0
BAND = (220, 260)  # subtitle band rows


def render_video(path, script, style):
    """script: [(start_f, end_f, seed)] spans with text-like stripe blocks."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 20
    )
    total = max(e for _, e, _ in script) + 20
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    rng = np.random.default_rng(0)
    words = ["HELLO WORLD", "ANOTHER LINE", "THIRD CUE", "MORE TEXT HERE",
             "FIFTH ONE"]
    for f in range(total):
        if style == "plain":
            base = np.full((H, W, 3), 35, np.uint8)
        elif style in ("gradient", "fade", "karaoke"):
            gx = (np.linspace(0, 120, W) + f * 0.7) % 160
            base = (30 + gx[None, :, None] * np.ones((H, 1, 3))).astype(np.uint8)
        else:  # noisy
            base = rng.integers(20, 70, size=(H, W, 3), dtype=np.uint8)
        img = Image.fromarray(base)
        d = ImageDraw.Draw(img)
        for si, (s, e, seed) in enumerate(script):
            if s <= f < e:
                text = words[seed % len(words)]
                if style == "karaoke":
                    # text reveals left-to-right across the span
                    frac = max(0.15, min(1.0, (f - s) / max(e - s - 8, 1)))
                    text = text[: max(1, int(round(len(text) * frac)))]
                alpha = 1.0
                if style == "fade":
                    # 8-frame alpha ramp at both span edges
                    alpha = min(1.0, min(f - s + 1, e - f) / 8.0)
                tw = d.textlength(text, font=font)
                if alpha >= 1.0:
                    d.text(((W - tw) // 2, BAND[0] + 6), text, font=font,
                           fill=(255, 255, 255), stroke_width=2,
                           stroke_fill=(0, 0, 0))
                else:
                    overlay = Image.new("RGBA", (W, H), (0, 0, 0, 0))
                    od = ImageDraw.Draw(overlay)
                    od.text(((W - tw) // 2, BAND[0] + 6), text, font=font,
                            fill=(255, 255, 255, int(255 * alpha)),
                            stroke_width=2,
                            stroke_fill=(0, 0, 0, int(255 * alpha)))
                    img = Image.alpha_composite(
                        img.convert("RGBA"), overlay
                    ).convert("RGB")
                    d = ImageDraw.Draw(img)
        vw.write(np.asarray(img)[:, :, ::-1])
    vw.release()


def scan(path):
    from vse_tpu.video.decode import FrameStream

    p = ScanParams()
    stats, nos = [], []
    for b in FrameStream(path, batch_size=32):
        n = int(b.valid.sum())
        band = b.frames[:n, BAND[0]:BAND[1], :]
        stats.append(frame_stats(np.asarray(rgb_to_gray(band)), p))
        nos.append(b.frame_nos[:n])
    return find_spans(np.concatenate(stats), np.concatenate(nos), p)


SCRIPTS = [
    [(10, 60, 0), (75, 130, 1), (150, 200, 2)],
    [(5, 40, 3), (41, 90, 4), (120, 170, 0)],   # adjacent spans (text swap)
    [(20, 100, 1), (140, 160, 2)],
    [(15, 70, 0), (95, 150, 2)],                 # fade in/out at edges
    [(10, 80, 3), (110, 175, 1)],                # karaoke reveal
]

STYLES = ["plain", "gradient", "noisy", "fade", "karaoke"]


@pytest.mark.parametrize("style", STYLES)
def test_span_recall_100pct(tmp_path, style):
    script = SCRIPTS[STYLES.index(style)]
    path = str(tmp_path / f"{style}.mp4")
    render_video(path, script, style)
    spans = scan(path)
    for (s, e, _) in script:
        # frame numbers are 1-based in the stream
        hit = any(sp.start_frame <= e and sp.end_frame >= s + 1 for sp in spans)
        assert hit, (style, (s, e), [(x.start_frame, x.end_frame) for x in spans])
    # no hallucinated spans in long no-text stretches: every detected span
    # must overlap SOME true span (tolerance 5 frames for fades)
    for sp in spans:
        near = any(sp.start_frame <= e + 5 and sp.end_frame >= s - 4
                   for (s, e, _) in script)
        assert near, (style, (sp.start_frame, sp.end_frame))
