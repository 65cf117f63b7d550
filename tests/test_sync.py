"""Re-timer tests: synthetic-WAV regression in the reference's
exact-expected-errors style (reference backend/sushi/regression-tests.py)."""

import argparse
import os
import struct
import wave

import numpy as np
import pytest

from vse_tpu.sync.common import format_srt_time, format_time
from vse_tpu.sync.engine import (
    detect_groups,
    fix_near_borders,
    interpolate_nones,
    merge_short_lines_into_groups,
    prepare_search_groups,
    running_median,
    smooth_events,
)
from vse_tpu.sync.events import AssScript, Event, SrtScript
from vse_tpu.sync.match import match_template_numpy
from vse_tpu.sync.timecodes import Timecodes, parse_scxvid_keyframes
from vse_tpu.sync.wav import WavStream


def write_wav(path, data_f32, rate=12000):
    pcm = np.clip(data_f32 * 32767, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def audio_pair(tmp_path_factory):
    """src = 30s of structured noise; dst = src delayed by exactly 1.7s."""
    rng = np.random.default_rng(42)
    rate = 12000
    src = rng.normal(0, 0.3, size=30 * rate).astype(np.float32)
    # give it temporal structure so matches are unambiguous
    envelope = np.abs(np.sin(np.linspace(0, 40, len(src)))) + 0.1
    src *= envelope
    delay = int(1.7 * rate)
    dst = np.concatenate([np.zeros(delay, np.float32), src])
    d = tmp_path_factory.mktemp("wav")
    src_path = str(d / "src.wav")
    dst_path = str(d / "dst.wav")
    write_wav(src_path, src, rate)
    write_wav(dst_path, dst, rate)
    return src_path, dst_path


def make_srt(path, cues):
    blocks = []
    for i, (start, end, text) in enumerate(cues):
        blocks.append(f"{i+1}\n{format_srt_time(start)} --> {format_srt_time(end)}\n{text}")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n\n".join(blocks) + "\n")


def default_args(src, dst, script, output):
    from vse_tpu.sync.cli import create_arg_parser

    return create_arg_parser().parse_args(
        ["--src", src, "--dst", dst, "--script", script, "-o", output]
    )


def test_full_retime_recovers_constant_shift(audio_pair, tmp_path):
    """Golden test: every cue must shift by exactly +1.7s (frame tolerance
    0.05s); expected_errors == 0, exact-match required."""
    src_path, dst_path = audio_pair
    script = str(tmp_path / "in.srt")
    output = str(tmp_path / "out.srt")
    cues = [(2.0 + 3 * i, 4.0 + 3 * i, f"line {i}") for i in range(8)]
    make_srt(script, cues)
    from vse_tpu.sync.runner import run

    run(default_args(src_path, dst_path, script, output))
    shifted = SrtScript.from_file(output)
    errors = 0
    for (start, end, _), e in zip(cues, shifted.events):
        if abs(e.start - (start + 1.7)) > 0.05 or abs(e.end - (end + 1.7)) > 0.05:
            errors += 1
    assert errors == 0  # exact expected_errors, reference-style


def test_wav_stream_load_perf(audio_pair):
    """Micro perf bound like the reference's run_wav_test
    (regression-tests.py:140-158)."""
    import resource
    import time

    src_path, _ = audio_pair
    t0 = time.time()
    stream = WavStream(src_path)
    elapsed = time.time() - t0
    assert elapsed < 5.0
    assert stream.duration_seconds == pytest.approx(30.0, abs=0.1)
    # uint8 quantization: values in [0, 255]
    assert stream.data.max() <= 255
    assert stream.padding_size == 10 * stream.sample_rate


def test_match_template_finds_planted_offset():
    rng = np.random.default_rng(0)
    image = rng.normal(size=4096).astype(np.float32)
    tpl = image[1000:1500].copy()
    score, offset = match_template_numpy(image, tpl)
    assert offset == 1000
    assert score < 1e-6


def test_match_template_device_agrees_with_numpy():
    from vse_tpu.sync.match import match_template_device

    rng = np.random.default_rng(1)
    image = rng.normal(size=2048).astype(np.float32)
    tpl = image[300:700].copy() + rng.normal(0, 0.01, 400).astype(np.float32)
    s_np, o_np = match_template_numpy(image, tpl)
    s_dev, o_dev = match_template_device(image, tpl)
    assert o_np == o_dev
    assert s_np == pytest.approx(s_dev, abs=1e-3)


def test_interpolate_nones():
    assert interpolate_nones([1.0, None, 3.0], [0, 1, 2]) == [1.0, 2.0, 3.0]
    assert interpolate_nones([None, None], [0, 1]) == []


def test_running_median_and_smooth():
    vals = [1.0, 1.0, 9.0, 1.0, 1.0]
    assert running_median(vals, 3) == [1.0, 1.0, 1.0, 1.0, 1.0]
    events = [Event(i, float(i), i + 1.0, "x") for i in range(5)]
    for e, v in zip(events, vals):
        e.set_shift(v, 0.1)
    smooth_events(events, radius=1)
    assert [e.shift for e in events] == [1.0, 1.0, 1.0, 1.0, 1.0]


def test_detect_groups_splits_on_jump():
    events = []
    for i, s in enumerate([0.0, 0.001, 0.002, 1.0, 1.001]):
        e = Event(i, float(i), i + 0.5, "x")
        e.set_shift(s, 0.1)
        events.append(e)
    groups = detect_groups(events)
    assert [len(g) for g in groups] == [3, 2]


def test_fix_near_borders_links_outliers():
    events = []
    for i in range(12):
        e = Event(i, float(i), i + 0.5, "x")
        e.set_shift(1.0, 0.5 if i not in (0, 11) else 50.0)  # broken borders
        events.append(e)
    fix_near_borders(events)
    assert events[0].linked and events[11].linked
    assert not events[5].linked


def test_prepare_search_groups_links_comments_zero_dur_duplicates():
    e0 = Event(0, 1.0, 2.0, "a")
    dup = Event(1, 1.0, 2.0, "a-dup")
    zero = Event(2, 3.0, 3.0, "zero")
    comment = Event(3, 4.0, 5.0, "comment")
    comment.is_comment = True
    tail = Event(4, 6.0, 8.0, "tail")
    events = [e0, dup, zero, comment, tail]
    groups = prepare_search_groups(events, source_duration=100.0,
                                   chapter_times=[], max_ts_duration=0.4,
                                   max_ts_distance=0.4)
    assert dup.linked and zero.linked and comment.linked
    assert [g[0] for g in groups] == [e0, tail]


def test_merge_short_lines():
    # three short clustered lines + one long one
    a = Event(0, 0.0, 0.1, "ts1")
    b = Event(1, 0.15, 0.25, "ts2")
    c = Event(2, 0.3, 0.4, "ts3")
    d = Event(3, 5.0, 8.0, "dialogue")
    groups = merge_short_lines_into_groups([a, b, c, d], [], 0.5, 0.5)
    assert [len(g) for g in groups] == [3, 1]


def test_timecodes_cfr_and_v2():
    tc = Timecodes.cfr(25.0)
    assert tc.get_frame_time(50) == pytest.approx(2.0)
    assert tc.get_frame_number(2.0) == 50
    assert tc.get_frame_size(1.0) == pytest.approx(0.04)
    v2 = Timecodes.parse("# timecode format v2\n0\n40\n80\n120\n")
    assert v2.get_frame_time(2) == pytest.approx(0.08)
    assert v2.get_frame_number(0.09) == 2


def test_scxvid_parse():
    text = "# XviD 2pass stat file\njunk\njunk\ni\np\ni\n"
    assert parse_scxvid_keyframes(text) == [0, 2]


def test_ass_roundtrip(tmp_path):
    src = """[Script Info]
Title: t

[V4+ Styles]
Format: Name, Fontname
Style: Default,Arial

[Events]
Format: Layer, Start, End, Style, Text
Dialogue: 0,0:00:01.00,0:00:02.50,Default,hello
Comment: 0,0:00:03.00,0:00:04.00,Default,note
"""
    p = tmp_path / "a.ass"
    p.write_text(src)
    script = AssScript.from_file(str(p))
    assert len(script.events) == 2
    assert script.events[0].start == pytest.approx(1.0)
    assert script.events[1].is_comment
    script.events[0].set_shift(1.0, 0.1)
    script.events[0].apply_shift()
    out = tmp_path / "b.ass"
    script.save_to_file(str(out))
    back = AssScript.from_file(str(out))
    assert back.events[0].start == pytest.approx(2.0)
    assert back.events[0].text == "hello"


def test_regression_harness_runner(audio_pair, tmp_path):
    """Drive the JSON harness end-to-end (reference regression-tests.py
    pattern: exact expected_errors)."""
    import json
    import subprocess
    import sys

    src_path, dst_path = audio_pair
    script = str(tmp_path / "in.srt")
    ideal = str(tmp_path / "ideal.srt")
    cues = [(2.0 + 3 * i, 4.0 + 3 * i, f"line {i}") for i in range(6)]
    make_srt(script, cues)
    make_srt(ideal, [(s + 1.7, e + 1.7, t) for s, e, t in cues])
    cfg = {
        "basepath": str(tmp_path),
        "tests": [{
            "name": "const-shift",
            "src": src_path, "dst": dst_path,
            "script": "in.srt", "ideal": "ideal.srt",
            "fps": 23.976, "expected_errors": 0,
        }],
    }
    cfg_path = tmp_path / "tests.json"
    cfg_path.write_text(json.dumps(cfg))
    r = subprocess.run(
        [sys.executable, "tools/sync_regression.py", str(cfg_path)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout


def test_regression_harness_nonzero_expected_errors(audio_pair, tmp_path):
    """Golden-tolerance semantics: a config with expected_errors=1 must PASS
    when exactly one event lands off-frame, and the same corpus with
    expected_errors=0 must FAIL (reference regression-tests.py:76-81 —
    more OR fewer failures than expected both fail)."""
    import json
    import subprocess
    import sys

    src_path, dst_path = audio_pair
    script = str(tmp_path / "in.srt")
    ideal = str(tmp_path / "ideal.srt")
    cues = [(2.0 + 3 * i, 4.0 + 3 * i, f"line {i}") for i in range(6)]
    make_srt(script, cues)
    shifted = [(s + 1.7, e + 1.7, t) for s, e, t in cues]
    # poison ONE ideal event by half a second -> exactly 1 frame mismatch
    shifted[2] = (shifted[2][0] + 0.5, shifted[2][1] + 0.5, shifted[2][2])
    make_srt(ideal, shifted)

    def run_cfg(expected):
        cfg = {
            "basepath": str(tmp_path),
            "tests": [{
                "name": f"tolerance-{expected}",
                "src": src_path, "dst": dst_path,
                "script": "in.srt", "ideal": "ideal.srt",
                "fps": 23.976, "expected_errors": expected,
            }],
        }
        cfg_path = tmp_path / f"tests_{expected}.json"
        cfg_path.write_text(json.dumps(cfg))
        return subprocess.run(
            [sys.executable, "tools/sync_regression.py", str(cfg_path)],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        )

    ok = run_cfg(1)
    assert ok.returncode == 0, ok.stdout + ok.stderr
    bad = run_cfg(0)
    assert bad.returncode != 0


def test_make_keyframes_scxvid_log(tmp_path):
    """Native SCXviD-log generation (replaces the reference's ffmpeg|SCXvid
    pipe, reference demux.py:113-135): scene cuts in a rendered video come
    back as keyframes through parse_keyframes."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from vse_tpu.sync.demux import make_keyframes
    from vse_tpu.sync.timecodes import parse_keyframes

    path = str(tmp_path / "cuts.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (320, 240))
    rng = np.random.default_rng(0)
    scenes = [rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8)
              for _ in range(3)]
    for scene_idx, scene in enumerate(scenes):
        for _ in range(40):  # 40 frames per scene
            vw.write(scene)
    vw.release()
    log = str(tmp_path / "kf.log")
    make_keyframes(path, log)
    kfs = parse_keyframes(log)
    assert 0 in kfs
    # the two scene cuts (frames 40 and 80) must be detected within +-1
    for cut in (40, 80):
        assert any(abs(k - cut) <= 1 for k in kfs), (cut, kfs)
    # steady frames are NOT keyframes
    assert len(kfs) <= 6
