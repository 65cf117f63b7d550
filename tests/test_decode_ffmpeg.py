"""Decoder.FFMPEG backend: FrameStream through an ffmpeg rawvideo pipe.

The reference exposes --open_video_ffmpeg on its scanner (reference
backend/main.py:491-495); here the knob selects the FrameStream backend.
No ffmpeg binary ships in this image, so the pipe protocol is driven by a
shim executable (cv2-decoding python script emitting bgr24 rawvideo), wired
in via $VSE_FFMPEG.
"""

import os
import stat
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

SHIM = """#!{python}
import sys
import cv2
import numpy as np

# minimal ffmpeg CLI emulation: [-nostdin -loglevel error] [-ss T] -i PATH
# -f rawvideo -pix_fmt bgr24 pipe:1
args = sys.argv[1:]
start_s = 0.0
path = None
i = 0
while i < len(args):
    if args[i] == "-ss":
        start_s = float(args[i + 1]); i += 2
    elif args[i] == "-i":
        path = args[i + 1]; i += 2
    else:
        i += 1
cap = cv2.VideoCapture(path)
fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
skip = int(round(start_s * fps))
for _ in range(skip):
    cap.grab()
out = sys.stdout.buffer
while True:
    ret, frame = cap.read()
    if not ret:
        break
    out.write(np.ascontiguousarray(frame).tobytes())
out.flush()
"""


@pytest.fixture
def video(tmp_path):
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 48))
    rng = np.random.default_rng(0)
    for i in range(20):
        f = np.full((48, 64, 3), i * 10 % 255, np.uint8)
        f[10:20, 5:40] = rng.integers(0, 255, (10, 35, 3), np.uint8)
        vw.write(f)
    vw.release()
    return path


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    shim = tmp_path / "ffmpeg"
    shim.write_text(SHIM.format(python=sys.executable), encoding="utf-8")
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("VSE_FFMPEG", str(shim))
    return str(shim)


def _flatten(stream):
    """(frames, frame_nos) of all valid rows — the native ring pops partial
    batches depending on decode timing, so batch boundaries are not
    deterministic; the frame SEQUENCE is."""
    frames, nos = [], []
    for b in stream:
        n = int(b.valid.sum())
        frames.append(b.frames[:n])
        nos.append(b.frame_nos[:n])
    return np.concatenate(frames), np.concatenate(nos)


def test_ffmpeg_stream_matches_opencv(video, fake_ffmpeg):
    from vse_tpu.video.decode import FrameStream

    rf, rn = _flatten(FrameStream(video, batch_size=4, decoder="opencv"))
    gf, gn = _flatten(FrameStream(video, batch_size=4, decoder="ffmpeg"))
    assert np.array_equal(rn, gn)
    assert np.array_equal(rf, gf)


def test_ffmpeg_stream_stride_and_enum(video, fake_ffmpeg):
    from vse_tpu.core.config import Decoder
    from vse_tpu.video.decode import FrameStream

    rf, rn = _flatten(FrameStream(video, batch_size=4, stride=3,
                                  decoder="opencv"))
    gf, gn = _flatten(FrameStream(video, batch_size=4, stride=3,
                                  decoder=Decoder.FFMPEG))
    assert np.array_equal(rn, gn)
    assert np.array_equal(rf, gf)


def test_ffmpeg_missing_binary_falls_back(video, monkeypatch):
    from vse_tpu.video.decode import FrameStream

    monkeypatch.setenv("VSE_FFMPEG", "/nonexistent/ffmpeg")
    monkeypatch.setenv("PATH", "/nonexistent")
    with pytest.warns(UserWarning, match="falling back to OpenCV"):
        s = FrameStream(video, batch_size=4, decoder="ffmpeg")
    assert s.decoder == "opencv"
    assert sum(int(b.valid.sum()) for b in s) == 20
