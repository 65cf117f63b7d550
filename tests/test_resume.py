import os

import pytest

from vse_tpu.pipeline.resume import ProgressManifest
from vse_tpu.post.records import RawRecord


def test_manifest_roundtrip(tmp_path):
    video = str(tmp_path / "v.mp4")
    open(video, "w").close()
    m = ProgressManifest(video, "fps", last_frame_no=120)
    m.records = [RawRecord(5, (1, 2, 3, 4), "héllo\tworld")]
    path = m.save()
    assert os.path.exists(path)
    back = ProgressManifest.load(video, "fps")
    assert back is not None
    assert back.last_frame_no == 120
    assert back.records == m.records
    m.clear()
    assert ProgressManifest.load(video, "fps") is None


def test_manifest_mode_mismatch_ignored(tmp_path):
    video = str(tmp_path / "v.mp4")
    open(video, "w").close()
    ProgressManifest(video, "fps", last_frame_no=50).save()
    assert ProgressManifest.load(video, "accurate") is None


def test_manifest_corrupt_file_ignored(tmp_path):
    video = str(tmp_path / "v.mp4")
    open(video, "w").close()
    with open(ProgressManifest.path_for(video), "w") as f:
        f.write("{not json")
    assert ProgressManifest.load(video, "fps") is None


def test_extractor_resume_skips_processed(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_extractor_e2e import FakeEngine, write_video

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.pipeline.extractor import SubtitleExtractor

    video = str(tmp_path / "v.mp4")
    write_video(video, ["hello world", None, "second line"])
    # pretend the first 2s (50 frames) were already processed
    m = ProgressManifest(video, "fps", last_frame_no=50)
    m.records = [RawRecord(1, (20, 300, 200, 224), "hello world")]
    m.save()
    ex = SubtitleExtractor(
        video,
        config=VseConfig(language="en", mode=Mode.FAST, word_segmentation=False),
        engine=FakeEngine(["hello world", None, "second line"]),
        resume=True,
    )
    ex.subtitle_output_path = str(tmp_path / "out.srt")
    ex.run()
    # restored record present + later content OCR'd; frames <= 50 not re-read
    texts = {r.text for r in ex.raw_records}
    assert "hello world" in texts
    assert "second line" in texts
    assert min(r.frame_no for r in ex.raw_records if r.text == "second line") > 50
    # successful run clears the manifest
    assert ProgressManifest.load(video, "fps") is None
