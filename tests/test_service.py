import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vse_tpu.core.config import Mode, VseConfig
from vse_tpu.pipeline.service import (
    Callbacks,
    ExtractionService,
    ExtractionTask,
    TaskStatus,
)
from vse_tpu.post.srt import SrtFile

from test_extractor_e2e import FakeEngine, write_video


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("svc") / "v.mp4")
    write_video(p, ["hello world", None, "second line"])
    return p


def test_service_processes_queue(video, tmp_path):
    events = {"progress": 0, "logs": [], "finished": [], "errors": []}
    svc = ExtractionService(
        config=VseConfig(language="en", mode=Mode.FAST, word_segmentation=False),
        callbacks=Callbacks(
            on_progress=lambda t, fe, ocr: events.__setitem__(
                "progress", events["progress"] + 1
            ),
            on_log=lambda t, msg: events["logs"].append(msg),
            on_finish=lambda t: events["finished"].append(t),
            on_error=lambda t, e: events["errors"].append(e),
        ),
    )
    svc._engine = FakeEngine(["hello world", None, "second line"])
    t1 = svc.add_task(video, output_path=str(tmp_path / "a.srt"))
    t2 = svc.add_task(video, output_path=str(tmp_path / "b.srt"))
    svc.run_all(block=True)
    assert t1.status == TaskStatus.COMPLETED
    assert t2.status == TaskStatus.COMPLETED
    assert len(events["finished"]) == 2
    assert events["progress"] > 0
    assert not events["errors"]
    assert len(SrtFile.open(str(tmp_path / "a.srt"))) == 2
    assert t1.progress == 100.0


def test_service_marks_failed(tmp_path):
    svc = ExtractionService(config=VseConfig(word_segmentation=False))
    t = svc.add_task(str(tmp_path / "missing.mp4"))
    svc.run_all(block=True)
    assert t.status == TaskStatus.FAILED
    assert t.error
