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


def _font(font_size):
    import glob

    import matplotlib
    from PIL import ImageFont

    font_path = sorted(
        glob.glob(os.path.join(os.path.dirname(matplotlib.__file__),
                               "mpl-data", "fonts", "ttf", "DejaVuSans.ttf"))
    )[0]
    return ImageFont.truetype(font_path, font_size)


def _background(style, w, h, f, rng):
    base = np.zeros((h, w, 3), np.uint8)
    if style in ("gradient", "fade", "two_line", "karaoke"):
        gx = (np.linspace(0, 80, w) + f * 0.5) % 120
        base[:] = (40 + gx[None, :, None]).astype(np.uint8)
    elif style == "noise":
        base[:] = rng.integers(10, 120, size=(h, w, 3), dtype=np.uint8)
    elif style == "moving":
        yy, xx = np.mgrid[0:h, 0:w]
        blob = (
            90 + 70 * np.sin((xx + f * 6) / 97.0) * np.cos((yy - f * 4) / 71.0)
        )
        base[:] = np.clip(blob, 0, 255).astype(np.uint8)[..., None]
    else:
        raise ValueError(style)
    return base


def make_video(path, script, w=960, h=540, fps=25.0, font_size=30,
               style="gradient", seed=0, language="en"):
    """script: [(start_s, end_s, text)]; text burned at the bottom band.

    Styles (VERDICT r2 next #2: several resolutions, moving/noisy
    backgrounds, 2-line cues, fades):
      gradient — slowly scrolling gradient (the original corpus)
      noise    — per-frame uniform noise background
      moving   — animated smooth blobs (moving high-contrast content)
      fade     — text alpha-fades in/out over 0.3 s at cue edges
      two_line — "a|b" cue text renders as two stacked lines
      karaoke  — text reveals left-to-right over the cue (VSF-style stress)
    """
    import cv2
    from PIL import Image, ImageDraw

    font = _font(font_size)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    total = max(e for _, e, _ in script) + 0.5
    rng = np.random.default_rng(seed)
    n = int(total * fps)
    line_h = font_size + 10
    from vse_tpu.core.charset import script_family

    family = script_family(language)
    hangul = family == "korean"
    if hangul:
        from vse_tpu.core.hangul import render_hangul_text, text_width
    # arabic burns SHAPED presentation forms in visual order (what real
    # subtitles show and what the head trains on — vse_tpu/core/arabic.py);
    # a naive LTR draw of logical text produces unjoined letterforms
    arabic = family == "arabic"
    if arabic:
        from fontTools.ttLib import TTFont
        from PIL import features

        from vse_tpu.core.arabic import render_forms

        # with raqm, PIL itself applies BiDi + shaping to LOGICAL text —
        # pre-shaping to the visual glyph string would be re-reversed by
        # raqm's BiDi pass, burning logical-order pixels (observed e2e:
        # the engine's visual_to_logical then *introduced* the reversal,
        # ar F1 0.0). Only the raqm-less fallback pre-shapes by hand,
        # mirroring the training renderer (vse_tpu/train/synth.py).
        arabic_preshape = not features.check("raqm")
        cm = {chr(c) for c in TTFont(
            _font(font_size).path, lazy=True).getBestCmap()}
    stroke = None
    if not hangul and not arabic:
        from vse_tpu.core.strokefont import stroke_script_for

        stroke = stroke_script_for(family)
    if stroke is not None:
        from vse_tpu.core.strokefont import draw_text as stroke_draw
        from vse_tpu.core.strokefont import line_width as stroke_width
    for f in range(n):
        t = f / fps
        base = _background(style, w, h, f, rng)
        img = Image.fromarray(base)
        draw = ImageDraw.Draw(img)
        for (s, e, text) in script:
            if not (s <= t < e):
                continue
            alpha = 1.0
            if style == "fade":
                edge = min(t - s, e - t)
                alpha = min(1.0, edge / 0.3)
            lines = text.split("|")
            rendered = Image.new("RGBA", (w, h), (0, 0, 0, 0))
            rdraw = ImageDraw.Draw(rendered)
            for li, line in enumerate(lines):
                if style == "karaoke":
                    frac = min(1.0, max(0.1, (t - s) / max(e - s - 0.4, 0.1)))
                    line = line[: max(1, int(round(len(line) * frac)))]
                y = h - 70 - (len(lines) - 1 - li) * line_h
                if hangul:
                    tw = text_width(line, font_size, font, rdraw)
                    render_hangul_text(
                        rdraw, ((w - tw) // 2, y), line, font_size, font,
                        fill=(255, 255, 255, 255), stroke_width=2,
                        stroke_fill=(0, 0, 0, 255),
                    )
                    continue
                if stroke is not None:
                    tw = stroke_width(stroke, line, font_size)
                    stroke_draw(
                        rdraw, ((w - tw) // 2, y), line, font_size, stroke,
                        fill=(255, 255, 255, 255), stroke_width=2,
                        stroke_fill=(0, 0, 0, 255),
                    )
                    continue
                if arabic and arabic_preshape:
                    line, _ = render_forms(line, cm)
                bbox = rdraw.textbbox((0, 0), line, font=font, stroke_width=2)
                tw = bbox[2] - bbox[0]
                x = (w - tw) // 2
                rdraw.text((x, y), line, font=font, fill=(255, 255, 255, 255),
                           stroke_width=2, stroke_fill=(0, 0, 0, 255))
            if alpha < 1.0:
                a = rendered.getchannel("A").point(
                    lambda v: int(v * alpha)
                )
                rendered.putalpha(a)
            img = Image.alpha_composite(img.convert("RGBA"), rendered).convert("RGB")
            draw = ImageDraw.Draw(img)
        vw.write(np.asarray(img)[:, :, ::-1])
    vw.release()
    return n


def script_to_srt(script, path):
    from vse_tpu.post.srt import SrtFile, SrtItem

    srt = SrtFile(
        [SrtItem(i + 1, int(s * 1000), int(e * 1000), t.replace("|", "\n"))
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


def _timed(lines, dur=2.0, gap=0.5):
    script, t = [], 0.4
    for line in lines:
        script.append((round(t, 2), round(t + dur, 2), line))
        t += dur + gap
    return script


# >= 50 cues across resolutions and styles (VERDICT r2 next #2). Texts are
# real-word lines so the word-segmentation reformat stage applies.
GOLDEN_CORPUS = [
    {
        "name": "gradient_960",
        "style": "gradient", "w": 960, "h": 540, "font": 30,
        "script": _timed([
            "hello world", "this is a test", "subtitles from video",
            "the quick brown fox", "jumps over the dog", "one more line here",
            "people said the time had come", "a small house near the water",
            "she found the right answer", "nothing was left behind",
            "they walked home together",
        ]),
    },
    {
        "name": "noise_1280",
        "style": "noise", "w": 1280, "h": 720, "font": 38,
        "script": _timed([
            "the night was quiet", "we should go now", "work begins at dawn",
            "every word was true", "the door opened slowly",
            "light filled the room", "he never looked back",
            "the story ends here", "music played all night",
            "children ran outside", "rain fell for hours",
        ]),
    },
    {
        "name": "moving_854",
        "style": "moving", "w": 854, "h": 480, "font": 26,
        "script": _timed([
            "keep your eyes open", "follow the old road",
            "the bridge was broken", "someone called my name",
            "winter came early", "the letter never arrived",
            "stars appeared above", "a long way from home",
            "the city slept below", "morning brought good news",
            "everything had changed",
        ]),
    },
    {
        "name": "fade_960",
        "style": "fade", "w": 960, "h": 540, "font": 30,
        "script": _timed([
            "voices in the hall", "the game was over",
            "water under the bridge", "first light of day",
            "hold on a little longer", "words left unsaid",
            "the end of the line", "a new beginning",
            "thanks for everything", "see you tomorrow",
            "the show must go on",
        ], dur=2.2, gap=0.6),
    },
    {
        "name": "two_line_960",
        "style": "two_line", "w": 960, "h": 540, "font": 28,
        "script": _timed([
            "two lines of text|stacked together", "the upper line|and the lower line",
            "questions came first|answers came later", "some words above|other words below",
            "the top half speaks|the bottom half listens",
            "read this line first|then read this one",
            "short top|a much longer bottom line",
            "a long opening line here|short end", "left unsaid|left undone",
            "first the thunder|then the rain",
        ], dur=2.4, gap=0.6),
    },
]


# per-language golden variants (VERDICT r2 next #2): one video per
# renderable non-latin family, scored with that language's trained head.
# Heads are trained space-free (CTC convergence; vse_tpu/train/pretrain.py),
# and the word-segmentation re-split is English-only — CER on these reflects
# missing inter-word spaces; cue F1 uses indel similarity and is robust.
LANGUAGE_CORPUS = {
    "ru": {
        "name": "lang_ru", "language": "ru", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "привет мир", "это тестовые субтитры", "вечер был тихим",
            "мы идем домой", "первый луч солнца", "разговор продолжался",
            "дети играли во дворе", "музыка звучала тихо",
            "улица была пустой", "спокойной ночи всем",
        ]),
    },
    "el": {
        "name": "lang_el", "language": "el", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "γεια σου κοσμε", "αυτη ειναι μια δοκιμη",
            "το βραδυ ηταν ησυχο", "παμε σπιτι τωρα",
            "το φως του πρωινου", "η θαλασσα ηταν ηρεμη",
            "τα παιδια επαιζαν εξω", "η μουσικη επαιζε απαλα",
            "ο δρομος ηταν αδειος", "καληνυχτα σε ολους",
        ]),
    },
    "ka": {
        "name": "lang_ka", "language": "ka", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "გამარჯობა მსოფლიო", "ეს არის ტესტი", "საღამო იყო წყნარი",
            "მივდივართ სახლში", "დილის სინათლე", "ზღვა იყო მშვიდი",
            "ბავშვები თამაშობდნენ", "მუსიკა ისმოდა",
            "ქუჩა ცარიელი იყო", "ღამე მშვიდობისა",
        ]),
    },
    "ar": {
        "name": "lang_ar", "language": "ar", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "مرحبا بالعالم", "هذه تجربة للترجمة", "كان المساء هادئا",
            "نذهب الى البيت", "ضوء الصباح الاول", "كان البحر هادئا",
            "الاطفال يلعبون في الخارج", "الموسيقى تعزف بهدوء",
            "كان الشارع فارغا", "تصبحون على خير",
        ]),
    },
    "korean": {
        "name": "lang_korean", "language": "korean", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "안녕하세요 세계", "자막 테스트입니다", "저녁은 조용했다",
            "우리는 집에 간다", "아침의 첫 빛", "바다는 잔잔했다",
            "아이들이 밖에서 놀았다", "음악이 조용히 흘렀다",
            "거리는 비어 있었다", "안녕히 주무세요",
        ]),
    },
    "th": {
        "name": "lang_th", "language": "th", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "สวัสดีชาวโลก", "นี่คือการทดสอบ", "ตอนเย็นเงียบสงบ",
            "เรากลับบ้านกัน", "แสงแรกของวัน", "ทะเลสงบนิ่ง",
            "เด็กเล่นข้างนอก", "เพลงบรรเลงเบา", "ถนนว่างเปล่า",
            "ราตรีสวัสดิ์",
        ]),
    },
    "ch": {
        "name": "lang_ch", "language": "ch", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "你好世界", "这是一个测试", "我们回家吧", "今天天气很好",
            "孩子们在外面玩", "音乐很安静", "街上没有人", "大家晚安",
            "明天早上见", "海水很平静",
        ]),
    },
    "japan": {
        "name": "lang_japan", "language": "japan", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "こんにちは世界", "これはテストです", "わたしたちは家に帰ります",
            "今日はいい天気です", "子供たちが外で遊んでいます",
            "音楽が静かに流れる", "道には誰もいません", "おやすみなさい",
            "明日の朝に会いましょう", "海はとても静かです",
        ]),
    },
    "hi": {
        "name": "lang_hi", "language": "hi", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "नमस्ते दुनिया", "यह एक परीक्षण है", "शाम शांत थी",
            "हम घर जाते हैं", "सुबह की पहली किरण", "समुद्र शांत था",
            "बच्चे बाहर खेलते हैं", "संगीत धीरे बजता है",
            "सड़क खाली थी", "शुभ रात्रि",
        ]),
    },
    "ta": {
        "name": "lang_ta", "language": "ta", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "வணக்கம் உலகம்", "இது ஒரு சோதனை", "மாலை அமைதியாக",
            "வீட்டுக்கு போகிறோம்", "காலை முதல் ஒளி", "கடல் அமைதியாக",
            "குழந்தைகள் வெளியே", "இசை மெதுவாக", "தெரு காலியாக",
            "இனிய இரவு",
        ]),
    },
    "te": {
        "name": "lang_te", "language": "te", "style": "gradient", "w": 960, "h": 540,
        "font": 30,
        "script": _timed([
            "నమస్కారం ప్రపంచం", "ఇది ఒక పరీక్ష", "సాయంత్రం ప్రశాంతం",
            "మనం ఇంటికి వెళ్తాం", "ఉదయపు మొదటి కాంతి", "సముద్రం ప్రశాంతం",
            "పిల్లలు బయట ఆడారు", "సంగీతం మెల్లగా", "వీధి ఖాళీగా ఉంది",
            "శుభరాత్రి",
        ]),
    },
}


def build_corpus(workdir, specs=None):
    """Render the golden corpus; returns [(name, video_path, ref_srt_path,
    n_cues, area_ratios)]. Cached by name inside `workdir`."""
    out = []
    for spec in specs or GOLDEN_CORPUS:
        video = os.path.join(workdir, f"{spec['name']}.mp4")
        ref = os.path.join(workdir, f"{spec['name']}.ref.srt")
        if not os.path.exists(video):
            make_video(video, spec["script"], w=spec["w"], h=spec["h"],
                       font_size=spec["font"], style=spec["style"],
                       language=spec.get("language", "en"))
        script_to_srt(spec["script"], ref)
        # two-line cues need a taller band; single-line corpora use the
        # reference default-ish bottom band
        top = 0.76 if spec["style"] == "two_line" else 0.80
        out.append((spec["name"], video, ref, len(spec["script"]),
                    f"{top},0.99,0.05,0.95"))
    return out


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
