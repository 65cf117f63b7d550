"""Spawn-picklable child targets for tests/test_isolation.py (spawned
children import this module by name, so the fakes cannot live inside the
test functions)."""

import os
import time


def child_ok(video_path, area_tuple, output_path, cfg, q, cancel):
    from vse_tpu.pipeline.isolation import Command

    q.put((Command.PID, os.getpid()))
    q.put((Command.PROGRESS, (50.0, 10.0)))
    q.put((Command.LOG, "hello from child"))
    q.put((Command.FINISH, output_path or "/tmp/out.srt"))


def child_crash(video_path, area_tuple, output_path, cfg, q, cancel):
    from vse_tpu.pipeline.isolation import Command

    q.put((Command.PID, os.getpid()))
    os._exit(3)  # dies without reporting


def child_hang(video_path, area_tuple, output_path, cfg, q, cancel):
    from vse_tpu.pipeline.isolation import Command

    q.put((Command.PID, os.getpid()))
    while True:  # ignores the cooperative cancel event entirely
        time.sleep(0.2)


def child_cooperative(video_path, area_tuple, output_path, cfg, q, cancel):
    from vse_tpu.pipeline.isolation import Command

    q.put((Command.PID, os.getpid()))
    cancel.wait(timeout=30)
    q.put((Command.ERROR, "cancelled cooperatively"))
