"""Web-GUI API tests: the reference's GUI surface (reference gui.py,
ui/home_interface.py, ui/component/*) rebuilt as an HTTP JSON API —
exercised headless through real HTTP requests against a live server."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_extractor_e2e import FakeEngine, write_video
from vse_tpu.gui.events import EventBus
from vse_tpu.gui.server import GuiServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        ctype = r.headers.get("Content-Type", "")
        data = r.read()
    return json.loads(data) if "json" in ctype else data


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read()), r.status
    except urllib.error.HTTPError as e:
        return json.loads(e.read()), e.code


@pytest.fixture()
def server(tmp_path):
    srv = GuiServer(port=0, config_path=str(tmp_path / "config.json"))
    srv.start()
    yield srv
    srv.shutdown()


@pytest.fixture()
def video(tmp_path):
    path = str(tmp_path / "vid.mp4")
    write_video(path, ["hello world", None, "second line"])
    return path


def test_event_bus_longpoll_and_resume():
    bus = EventBus(window=4)
    assert bus.wait(0, timeout=0.05) == []
    threading.Timer(0.05, lambda: bus.emit("log", message="x")).start()
    evts = bus.wait(0, timeout=2.0)
    assert [e["kind"] for e in evts] == ["log"]
    for i in range(6):
        bus.emit("log", message=str(i))
    # ring keeps the newest `window` events; resume from any seq works
    assert [e["message"] for e in bus.since(0)] == ["2", "3", "4", "5"]
    assert bus.since(bus.seq) == []


def test_state_snapshot(server):
    port = server.address[1]
    st = _get(port, "/api/state")
    assert st["running"] is False
    assert "language" in st["config"] and "mode" in st["config"]
    assert "en" in st["languages"] and "fast" in st["modes"]
    assert st["version"]["version"]
    assert "en" in st["locales"]


def test_config_update_persist_and_validation(server, tmp_path):
    port = server.address[1]
    r, code = _post(port, "/api/config", {"updates": {"extract_frequency": 5,
                                                      "mode": "accurate"}})
    assert code == 200 and r["ok"]
    # persisted in the reference config.json shape
    with open(tmp_path / "config.json") as f:
        saved = json.load(f)
    assert saved["Main"]["ExtractFrequency"] == 5
    assert saved["Main"]["Mode"] == "accurate"
    assert _get(port, "/api/state")["config"]["extract_frequency"] == 5
    # unknown key -> 400
    _, code = _post(port, "/api/config", {"updates": {"bogus": 1}})
    assert code == 400
    # range-validated by VseConfig.__post_init__ -> 400
    _, code = _post(port, "/api/config", {"updates": {"extract_frequency": 999}})
    assert code == 400
    # engine invalidation on model keys: seed a fake engine and flip language
    server.service._engine = object()
    _post(port, "/api/config", {"updates": {"language": "ru"}})
    assert server.service._engine is None


def test_task_lifecycle_and_events(server, video):
    port = server.address[1]
    row, code = _post(port, "/api/tasks",
                      {"video_path": video, "area": "0.8,1.0,0.0,1.0",
                       "ab": [0, 100]})
    assert code == 201 and row["status"] == "pending"
    assert row["area"] is not None  # ratios resolved to pixels
    # nonexistent file -> 400
    _, code = _post(port, "/api/tasks", {"video_path": "/nope.mp4"})
    assert code == 400
    st = _get(port, "/api/state")
    assert len(st["tasks"]) == 1
    evts = _get(port, f"/api/events?since=0&timeout=0.2")["events"]
    assert any(e["kind"] == "task_added" for e in evts)
    r, _ = _post(port, "/api/tasks/remove", {"id": row["id"]})
    assert r["removed"] is True
    assert _get(port, "/api/state")["tasks"] == []


def test_videoinfo_frame_and_browse(server, video):
    port = server.address[1]
    info = _get(port, f"/api/videoinfo?path={video}")
    assert (info["width"], info["height"]) == (320, 240)
    jpg = _get(port, f"/api/frame?path={video}&t=0.5&w=160")
    assert jpg[:2] == b"\xff\xd8"  # JPEG SOI
    listing = _get(port, f"/api/browse?dir={os.path.dirname(video)}")
    assert any(e["name"] == "vid.mp4" for e in listing["entries"])


def test_index_served(server):
    port = server.address[1]
    html = _get(port, "/")
    assert b"vse-tpu" in html and b"Timeline" in html


def test_locale_roundtrip(server):
    port = server.address[1]
    r, code = _post(port, "/api/locale", {"locale": "ch"})
    assert code == 200
    assert _get(port, "/api/state")["locale"] == "ch"
    _post(port, "/api/locale", {"locale": "en"})


def test_version_offline(monkeypatch):
    from vse_tpu.gui import version as vs

    monkeypatch.setattr(vs, "UPDATE_URLS", ["http://127.0.0.1:1/x"])
    r = vs.check_updates(timeout=0.3)
    assert r["status"] == "offline" and r["current"] == vs.VERSION
    assert vs._version_tuple("v1.2.10") > vs._version_tuple("1.2.9")


def test_run_extraction_through_api(server, video, tmp_path):
    """Full queue drive through the HTTP surface with the scripted engine
    (the reference's home-tab flow: add -> run -> progress -> finish)."""
    port = server.address[1]
    server.service._engine = FakeEngine(["hello world", None, "second line"])
    out = str(tmp_path / "out.srt")
    _post(port, "/api/tasks", {"video_path": video, "area": "0.8,1.0,0.0,1.0",
                               "output_path": out})
    r, _ = _post(port, "/api/run", {})
    assert r["started"] is True
    deadline = time.time() + 120
    status = None
    while time.time() < deadline:
        st = _get(port, "/api/state")
        status = st["tasks"][0]["status"]
        if status in ("completed", "failed") and not st["running"]:
            break
        time.sleep(0.5)
    assert status == "completed", st["tasks"][0]
    assert os.path.exists(out)
    evts = _get(port, "/api/events?since=0&timeout=0.2")["events"]
    kinds = {e["kind"] for e in evts}
    assert "finish" in kinds and "progress" in kinds
    # re-run with empty queue reports why it didn't start
    r, _ = _post(port, "/api/run", {})
    assert r["started"] is False
