"""End-to-end pipeline tests on a synthetic video with a scripted fake OCR
engine: validates strategy plumbing, gating, dedup, SRT generation and the
progress contract without trained model weights (SURVEY.md §4 test pyramid)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vse_tpu.core.config import Mode, VseConfig
from vse_tpu.core.subtitle_area import SubtitleArea
from vse_tpu.pipeline.extractor import SubtitleExtractor
from vse_tpu.post.srt import SrtFile

W, H, FPS = 320, 240, 25.0


def write_video(path, texts, seconds_each=2, fps=FPS):
    """Synthesize a video: white 'subtitle' stripes burned into the bottom
    band, one text id per segment (rendered as distinct stripe patterns)."""
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, fps, (W, H))
    n = int(seconds_each * fps)
    for seg, text in enumerate(texts):
        for _ in range(n):
            frame = np.full((H, W, 3), 40, np.uint8)
            if text is not None:
                # distinct stripe phase per segment = distinct "subtitle"
                frame[200:224, 20 + seg * 3 : 300 : 5] = 255
            vw.write(frame)
    vw.release()


class FakeEngine:
    """Scripted OCR: returns a fixed text per ~2s segment based on frame
    stripe pattern; mimics the OcrEngine predict_batch contract."""

    class _Spec:
        rec_family = "en"

    spec = _Spec()

    def __init__(self, texts, seconds_each=2, fps=FPS):
        self.texts = texts
        self.n = int(seconds_each * fps)

    def lookup(self, frame):
        """Find the stripe band anywhere in the (possibly band-cropped)
        frame; returns (text, y0, y1) in INPUT coords, like a real det."""
        rows = np.nonzero((frame > 128).any(axis=(1, 2)))[0]
        if len(rows) == 0:
            return None
        y0, y1 = int(rows.min()), int(rows.max()) + 1
        cols = np.nonzero(frame[y0, :, 0] > 128)[0]
        seg = max(0, (cols[0] - 20) // 3)
        return self.texts[min(seg, len(self.texts) - 1)], y0, y1

    def predict_batch(self, frames, origin=(0, 0)):
        dy, dx = origin
        out = []
        for f in frames:
            hit = self.lookup(np.asarray(f))
            if hit is None:
                out.append(([], []))
            else:
                # input-relative coords + origin, like the real engine
                text, y0, y1 = hit
                quad = [(20 + dx, y0 + dy), (300 + dx, y0 + dy),
                        (300 + dx, y1 + dy), (20 + dx, y1 + dy)]
                out.append(([quad], [(text, 0.95)]))
        return out

    def predict(self, frame):
        return self.predict_batch(frame[None])[0]


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vid") / "synthetic.mp4")
    write_video(p, ["hello world", None, "second line"])
    return p


def make_extractor(video, mode, sub_area=None, **cfg_kw):
    cfg = VseConfig(language="en", mode=mode, word_segmentation=False, **cfg_kw)
    texts = ["hello world", None, "second line"]
    ex = SubtitleExtractor(
        video, sub_area=sub_area, config=cfg, engine=FakeEngine(texts)
    )
    return ex


def test_fps_mode_end_to_end(video, tmp_path):
    ex = make_extractor(video, Mode.FAST)  # no sub_area -> fps strategy
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    progress = []
    ex.add_progress_listener(lambda fe, ocr: progress.append((fe, ocr)))
    path = ex.run()
    subs = SrtFile.open(path)
    texts = [s.text for s in subs]
    assert "hello world" in texts
    assert "second line" in texts
    assert len(subs) == 2
    # subtitle timing sanity: first cue starts near 0, second near 4s
    assert subs[0].start_ms < 500
    assert 3500 <= subs[1].start_ms <= 4500
    # progress ran to completion on both channels (total 200 contract)
    assert progress[-1] == (100, 100)


def test_accurate_mode_spans(video, tmp_path):
    area = SubtitleArea(ymin=190, ymax=239, xmin=0, xmax=319)
    ex = make_extractor(video, Mode.ACCURATE, sub_area=area)
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    path = ex.run()
    subs = SrtFile.open(path)
    texts = [s.text for s in subs]
    assert texts == ["hello world", "second line"]
    # span edges: cue 1 covers ~0..2s
    assert subs[0].start_ms < 500
    assert 1500 <= subs[0].end_ms <= 2500


def test_keyframe_mode_with_timeline(video, tmp_path):
    area = SubtitleArea(ymin=190, ymax=239, xmin=0, xmax=319)
    ex = make_extractor(video, Mode.FAST, sub_area=area)
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    path = ex.run()
    subs = SrtFile.open(path)
    texts = [s.text for s in subs]
    assert "hello world" in texts
    assert "second line" in texts
    assert ex.use_keyframe_timeline
    assert ex.timeline is not None and len(ex.timeline) >= 2


def test_generate_txt(video, tmp_path):
    ex = make_extractor(video, Mode.FAST, generate_txt=True)
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    ex.run()
    assert os.path.exists(str(tmp_path / "out.txt"))


def test_drop_score_gate(video, tmp_path):
    area = SubtitleArea(ymin=190, ymax=239, xmin=0, xmax=319)
    ex = make_extractor(video, Mode.ACCURATE, sub_area=area, drop_score=99)
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    path = ex.run()  # fake engine confidence 0.95 < 0.99 -> all dropped
    assert len(SrtFile.open(path)) == 0


def test_area_gate_drops_disjoint_boxes(video, tmp_path):
    # area far from the stripes: boxes are disjoint -> dropped
    area = SubtitleArea(ymin=0, ymax=50, xmin=0, xmax=319)
    ex = make_extractor(video, Mode.ACCURATE, sub_area=area)
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    path = ex.run()
    assert len(SrtFile.open(path)) == 0


def test_ab_section_limits_frame_range(video, tmp_path):
    from vse_tpu.core.subtitle_area import ABSection, SubtitleArea

    # area bound to frames 90.. (the "second line" segment starts ~frame 100)
    area = SubtitleArea(ymin=190, ymax=239, xmin=0, xmax=319,
                        ab_section=ABSection(90, -1))
    ex = make_extractor(video, Mode.ACCURATE, sub_area=area)
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    path = ex.run()
    texts = [s.text for s in SrtFile.open(path)]
    assert "hello world" not in texts  # lives in frames < 90
    assert "second line" in texts


def test_ab_section_keyframe_mode_uses_real_frame_numbers(video, tmp_path):
    """Keyframe mode records under the quirky timeline key int(ms/fps); the
    AB-section gate must use the REAL span frame number (ADVICE r1: at 25fps
    frame 250 arrives as key 400 — gating on the key includes/excludes the
    wrong spans)."""
    from vse_tpu.core.subtitle_area import ABSection, SubtitleArea

    # frames 90.. -> only "second line" (starts ~frame 100). With the old
    # key-based gating, keys are int(ms/fps)=frame*40/25=frame*1.6, so BOTH
    # segments' keys (0*1.6=0 and 100*1.6=160) land such that segment 1 is
    # wrongly dropped and segment 0's key 0 is dropped too.
    area = SubtitleArea(ymin=190, ymax=239, xmin=0, xmax=319,
                        ab_section=ABSection(90, -1))
    ex = make_extractor(video, Mode.FAST, sub_area=area)  # keyframe strategy
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    path = ex.run()
    texts = [s.text for s in SrtFile.open(path) if s.text]
    assert "hello world" not in texts
    assert "second line" in texts


def test_keyframe_spans_cover_accurate_spans(video, tmp_path):
    """Cross-strategy validation (VERDICT r2 next #6): every accurate-mode
    cue must be covered by a keyframe-scanner cue on the same video, with
    bounded boundary deltas. Scanner = real Pallas/jnp kernel; OCR text is
    scripted so the comparison isolates TIMING semantics."""
    from vse_tpu.eval import time_iou

    area = SubtitleArea(ymin=190, ymax=239, xmin=0, xmax=319)
    ex_a = make_extractor(video, Mode.ACCURATE, sub_area=area)
    ex_a.subtitle_output_path = str(tmp_path / "acc.srt")
    ex_a.run()
    ex_f = make_extractor(video, Mode.FAST, sub_area=area)
    ex_f.subtitle_output_path = str(tmp_path / "fast.srt")
    ex_f.run()
    acc = [c for c in SrtFile.open(str(tmp_path / "acc.srt")) if c.text]
    fast = list(SrtFile.open(str(tmp_path / "fast.srt")))
    assert acc and fast
    for a in acc:
        best = max(
            (time_iou(a.start_ms, a.end_ms, f.start_ms, f.end_ms), f)
            for f in fast
        )
        iou, f = best
        assert iou > 0.0, (a.start_ms, a.end_ms,
                           [(x.start_ms, x.end_ms) for x in fast])
        # scanner cue boundaries within 600 ms of the det-driven ones
        assert abs(f.start_ms - a.start_ms) <= 600, (f.start_ms, a.start_ms)
        assert abs(f.end_ms - a.end_ms) <= 600, (f.end_ms, a.end_ms)


def test_split_text_groups_fade_merge_back():
    """A multi-frame fade garble inside one cue must NOT split it: the
    garbled reads merge back into the clean group and the medoid lands on
    the repeated clean text (VERDICT r3 weak #2 — fade_960 F1 0.381 under
    the old one-frame debounce)."""
    from vse_tpu.pipeline.extractor import medoid_of, split_text_groups

    def s(fn, text, conf=0.9):
        return (fn, text, conf, [], [])

    clean = "hold on a little longer"
    fade_in = ["hnld o", "hold on a littl"]          # partial fade-in reads
    fade_out = ["hold on a litt", "hl o"]            # fade-out garbles
    run = (
        [s(i, t, 0.5) for i, t in enumerate(fade_in)]
        + [s(10 + i, clean) for i in range(6)]
        + [s(30 + i, t, 0.95) for i, t in enumerate(fade_out)]
    )
    groups = split_text_groups(run, thr=0.8)
    assert len(groups) == 1, [medoid_of(g)[1] for g in groups]
    assert medoid_of(groups[0])[1] == clean


def test_split_text_groups_real_change_still_splits():
    """Two genuinely different cues in one contiguous text run split into
    two groups (merge-back must not glue dissimilar cues)."""
    from vse_tpu.pipeline.extractor import medoid_of, split_text_groups

    def s(fn, text):
        return (fn, text, 0.9, [], [])

    a, b = "the game was over", "water under the bridge"
    run = [s(i, a) for i in range(5)] + [s(10 + i, b) for i in range(5)]
    groups = split_text_groups(run, thr=0.8)
    assert len(groups) == 2
    assert medoid_of(groups[0])[1] == a and medoid_of(groups[1])[1] == b


def test_det_span_tracker_fade_single_cue(video, tmp_path):
    """DetSpanTracker end-to-end: feed per-frame results with a mid-cue
    garble; exactly one cue's records must come out (both edges, medoid
    text)."""
    from vse_tpu.core.config import VseConfig
    from vse_tpu.core.subtitle_area import SubtitleArea
    from vse_tpu.pipeline.extractor import DetSpanTracker, SubtitleExtractor

    cfg = VseConfig()
    ex = SubtitleExtractor(
        video, sub_area=SubtitleArea(0, 100, 0, 600), config=cfg,
        engine=object.__new__(_FakeEngine) if False else None,
    ) if False else None
    # lighter: build a minimal extractor stand-in around _gate_and_record
    class _Ex:
        config = cfg
        sub_area = SubtitleArea(0, 100, 0, 600)
        recorded = []

        def _area_text(self, dt_box, rec_res):
            return "".join(t.replace(" ", "") for t, _ in rec_res)

        def _gate_lines(self, dt_box, rec_res):
            return [(b, t, p) for b, (t, p) in zip(dt_box, rec_res)]

        def _gate_and_record(self, fn, dt_box, rec_res):
            self.recorded.append((fn, rec_res[0][0]))

    ex = _Ex()
    tr = DetSpanTracker(ex)
    box = [[(10, 20), (200, 20), (200, 60), (10, 60)]]

    def feed(fn, text):
        tr.feed(fn, box if text else [], [(text, 0.9)] if text else [])

    clean = "the story ends here"
    for i in range(3):
        feed(i, clean)
    feed(3, "thc storv end")   # mid-cue garble (moving background)
    for i in range(4, 8):
        feed(i, clean)
    feed(8, "")                # text gone -> flush
    tr.finish()
    texts = {t for _, t in ex.recorded}
    assert texts == {clean}, ex.recorded
    assert {fn for fn, _ in ex.recorded} == {0, 7}


def test_det_span_tracker_fade_dropout_ghost(video, tmp_path):
    """A 1-2 frame det dropout inside a fade-out followed by a garbled
    ghost read must NOT become a spurious cue (r4 fade_960: 12 predicted
    vs 11 real). The flush grace keeps the run alive across the dropout so
    the merge-back pass can absorb the ghost; a real >= 0.5 s gap still
    splits cues."""
    from vse_tpu.core.config import VseConfig
    from vse_tpu.core.subtitle_area import SubtitleArea
    from vse_tpu.pipeline.extractor import DetSpanTracker

    class _Ex:
        config = VseConfig()
        sub_area = SubtitleArea(0, 100, 0, 600)
        recorded = []
        fps = 25.0

        def _area_text(self, dt_box, rec_res):
            return "".join(t.replace(" ", "") for t, _ in rec_res)

        def _gate_lines(self, dt_box, rec_res):
            return [(b, t, p) for b, (t, p) in zip(dt_box, rec_res)]

        def _gate_and_record(self, fn, dt_box, rec_res):
            self.recorded.append((fn, rec_res[0][0]))

    ex = _Ex()
    tr = DetSpanTracker(ex)
    box = [[(10, 20), (200, 20), (200, 60), (10, 60)]]

    def feed(fn, text):
        tr.feed(fn, box if text else [], [(text, 0.9)] if text else [])

    a, b = "hold on a little longer", "a second cue arrives now"
    for i in range(0, 8):
        feed(i, a)             # clean cue A
    feed(8, "hold on a littl")  # fade-out partial
    feed(9, "")                # det dropout (2 frames, < grace)
    feed(10, "")
    feed(11, "hl o")           # ghost fragment read
    for i in range(12, 26):
        feed(i, "")            # real gap (>= grace -> flush)
    for i in range(26, 34):
        feed(i, b)             # clean cue B
    tr.finish()
    texts = {t for _, t in ex.recorded}
    assert texts == {a, b}, ex.recorded
    # cue A's records all predate cue B's first frame
    a_frames = [fn for fn, t in ex.recorded if t == a]
    assert max(a_frames) <= 11 and min(a_frames) == 0
