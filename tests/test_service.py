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


def test_stop_cancels_mid_video(tmp_path):
    """stop() interrupts the CURRENT video between batches (the reference
    kills the child process; in-process the extractor raises
    ExtractionCancelled and the task surfaces FAILED)."""
    import threading
    import time

    import numpy as np
    cv2 = pytest.importorskip("cv2")

    from vse_tpu.core.config import Mode, VseConfig
    from vse_tpu.pipeline.service import ExtractionService, TaskStatus

    video = str(tmp_path / "long.mp4")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 48))
    for _ in range(400):
        vw.write(np.zeros((48, 64, 3), np.uint8))
    vw.release()

    class SlowEngine:
        class _Spec:
            rec_family = "en"
        spec = _Spec()
        def predict_batch(self, frames, origin=(0, 0)):
            time.sleep(0.2)  # make each batch slow enough to interrupt
            return [([], []) for _ in range(len(frames))]

    svc = ExtractionService(
        config=VseConfig(language="en", mode=Mode.FAST, word_segmentation=False)
    )
    svc._engine = SlowEngine()
    t = svc.add_task(video, output_path=str(tmp_path / "o.srt"))
    svc.run_all(block=False)
    # wait until the video is actually processing, then stop mid-run
    for _ in range(100):
        if t.status == TaskStatus.PROCESSING and t.progress > 0:
            break
        time.sleep(0.05)
    svc.stop()
    svc._worker.join(timeout=30)
    assert not svc._worker.is_alive()
    assert t.status == TaskStatus.FAILED
    assert "Cancelled" in (t.error or "") or "cancel" in (t.error or "").lower()
