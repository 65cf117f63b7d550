"""Process-isolation layer (G8): per-video child process, RPC-style event
pump, terminate->kill stop escalation, exit-code failure surface
(reference backend/tools/process_manager.py:116-126,
subtitle_extractor_remote_call.py:5-67, ui/home_interface.py:368-374)."""

import os
import time

import pytest

import _isolation_helpers as helpers
from vse_tpu.pipeline.isolation import ProcessManager, ProcessRunner


def _run(target, **kw):
    events = {"progress": [], "logs": []}
    r = ProcessRunner(
        "/tmp/fake.mp4",
        on_progress=lambda fe, ocr: events["progress"].append((fe, ocr)),
        on_log=events["logs"].append,
        _target=target,
        **kw,
    )
    r.start()
    return r, events


def test_finish_and_events():
    r, events = _run(helpers.child_ok, output_path="/tmp/x.srt")
    assert r.join(timeout=30)
    assert r.srt_path == "/tmp/x.srt"
    assert r.error is None
    assert events["progress"] == [(50.0, 10.0)]
    assert events["logs"] == ["hello from child"]
    assert r.child_pid and r.child_pid != os.getpid()


def test_crash_surfaces_exitcode():
    r, _ = _run(helpers.child_crash)
    assert r.join(timeout=30)
    assert r.srt_path is None
    assert "exitcode 3" in r.error


def test_stop_escalates_to_kill():
    r, _ = _run(helpers.child_hang)
    deadline = time.time() + 10
    while r.child_pid is None and time.time() < deadline:
        time.sleep(0.05)
    t0 = time.time()
    r.stop(grace=1.0)
    assert not r._proc.is_alive()
    assert time.time() - t0 < 8
    assert r.error == "stopped"


def test_stop_cooperative_path():
    r, _ = _run(helpers.child_cooperative)
    deadline = time.time() + 10
    while r.child_pid is None and time.time() < deadline:
        time.sleep(0.05)
    r.stop(grace=5.0)
    assert not r._proc.is_alive()


def test_manager_kill_all():
    r, _ = _run(helpers.child_hang)
    deadline = time.time() + 10
    while r.child_pid is None and time.time() < deadline:
        time.sleep(0.05)
    ProcessManager.instance().kill_all()
    r._proc.join(timeout=8)
    assert not r._proc.is_alive()


@pytest.mark.slow
def test_service_process_isolation_e2e(tmp_path):
    """Full extraction in a spawned child through ExtractionService
    (isolation='process'), on a tiny rendered video."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from eval_synth import make_video

    from vse_tpu.core.config import VseConfig
    from vse_tpu.pipeline.service import ExtractionService, TaskStatus

    video = str(tmp_path / "tiny.mp4")
    make_video(video, [(0.2, 1.4, "hello world")], w=640, h=360, font_size=28,
               style="gradient")
    svc = ExtractionService(
        config=VseConfig(language="en", hardware_acceleration=False),
        isolation="process",
    )
    task = svc.add_task(video, output_path=str(tmp_path / "tiny.srt"))
    svc.run_all(block=True)
    assert task.status == TaskStatus.COMPLETED, task.error
    assert os.path.exists(task.srt_path)
    assert "hello" in open(task.srt_path, encoding="utf-8").read().lower()
